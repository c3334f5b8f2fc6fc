#!/bin/bash
# Round-2 session-9 TPU job chain: RECOVERY after the restart that wiped
# runs/ while the q5b (25.90) and q6 (25.96) flagship WEIGHTS were still
# untracked — their eval JSONs were committed, the npz files were not.
# Lesson baked in here: (a) the chain launches its OWN watchers, (b) the
# eval step copies the best weights into artifacts/ and commits weights +
# eval JSON together, immediately.
#
#   1. queueI's unfinished bench ablation (long2 vs q2 same-day) + fresh
#      default headline bench — quick, runs first so we have the record.
#   2. q6r = re-run of the q6 recipe (effective-batch-8 flow-prior via
#      accum_steps 2 + remat, EMA, cosine 1.5e-4 -> 5e-6), warm-started
#      from q5 (25.81, the best SURVIVING checkpoint; original q6 started
#      from the lost q5b at 25.90). 2-epoch hardware gate, 200 epochs.
#   3. q6r native-res eval -> secure.
#   4. q7 = 320^2-crop fine-tune (queueJ recipe) from the better of
#      {q6r, q5}; gate, 160 epochs, eval -> secure.
#   5. TTA eval of the session's best.
# Idempotent via step markers in runs/queueK/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueK
LOG=runs/queueK/queueK.log
exec >>"$LOG" 2>&1
echo "=== queueK start $(date -u +%FT%TZ) ==="

secure() {  # secure <run_name> <best_prefix> <eval_json>
  local RUN="$1" BEST="$2" EVJ="$3"
  cp "$BEST.npz" "artifacts/emavfi_${RUN}_best.npz"
  [ -f "$BEST.flow.npz" ] && cp "$BEST.flow.npz" "artifacts/emavfi_${RUN}_best.flow.npz"
  [ -f "$EVJ" ] && cp "$EVJ" "artifacts/${RUN}_eval.json"
  git add -f "artifacts/emavfi_${RUN}_best.npz" "artifacts/emavfi_${RUN}_best.flow.npz" \
          "artifacts/${RUN}_eval.json" 2>/dev/null
  git commit -q -m "Secure ${RUN} best checkpoint + eval (weights tracked)" || true
}

# --- step 1: bench ablation (queueI's unfinished work) ---------------------
if [ ! -f runs/queueK/benchlong2.done ]; then
  timeout 3600 python bench.py --ckpt artifacts/emavfi_long2_best.npz \
    > runs/queueK/bench_long2.json && touch runs/queueK/benchlong2.done
  echo "bench long2:"; cat runs/queueK/bench_long2.json
fi
if [ ! -f runs/queueK/benchq2.done ]; then
  timeout 3600 python bench.py --ckpt artifacts/emavfi_q2_best.npz \
    > runs/queueK/bench_q2.json && touch runs/queueK/benchq2.done
  echo "bench q2:"; cat runs/queueK/bench_q2.json
fi

# --- step 2: q6r train ------------------------------------------------------
QFLAGS=(--batch_size 8 --accum_steps 2 --remat true --random_rotation false
        --consistent_jitter true
        --target_unit_range true --best_metric val_psnr
        --dcn_max_offset 2 --warp_max_flow 16 --use_pallas true
        --ema_decay 0.998 --flow_prior true
        --lr_schedule cosine --learning_rate 1.5e-4 --cosine_min_lr 5e-6)

INIT=artifacts/emavfi_q5_best.npz; INITF=artifacts/emavfi_q5_best.flow.npz
if [ -f artifacts/emavfi_q6r_wip.npz ]; then
  INIT=artifacts/emavfi_q6r_wip.npz; INITF=artifacts/emavfi_q6r_wip.flow.npz
fi
echo "q6r warm start: $INIT"

bash tools/ckpt_watcher.sh q6r runs/q6r/best 600 &
W1=$!; echo "$W1" > runs/queueK/watcher_q6r.pid

if [ ! -f runs/queueK/q6rcheck.done ]; then
  timeout 3600 python train.py --config config/train_config.yaml \
    "${QFLAGS[@]}" --num-epochs 2 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q6rcheck/ckpt --best_model_path runs/q6rcheck/best \
    && touch runs/queueK/q6rcheck.done
  if [ ! -f runs/queueK/q6rcheck.done ]; then
    echo "q6r 2-epoch gate FAILED — stopping the chain"; kill "$W1"; exit 1
  fi
fi

if [ ! -f runs/queueK/q6r.done ]; then
  python train.py --config config/train_config.yaml \
    "${QFLAGS[@]}" --num-epochs 200 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q6r/ckpt --best_model_path runs/q6r/best \
    && touch runs/queueK/q6r.done
fi

# --- step 3: q6r eval + SECURE ---------------------------------------------
if [ -f runs/q6r/best.npz ] && [ ! -f runs/queueK/q6reval.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path runs/q6r/best.npz \
    --flow_model runs/q6r/best.flow.npz --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
    > runs/queueK/q6r_eval.json && touch runs/queueK/q6reval.done
  echo "q6r eval:"; cat runs/queueK/q6r_eval.json
  secure q6r runs/q6r/best runs/queueK/q6r_eval.json
fi
kill "$W1" 2>/dev/null

# --- step 4: q7 (320^2 crops) ----------------------------------------------
INIT=artifacts/emavfi_q5_best.npz; INITF=artifacts/emavfi_q5_best.flow.npz
if [ -f artifacts/q6r_eval.json ] && python - <<'EOF'
import json, sys
q5 = json.load(open("artifacts/q5_eval.json"))["mean_psnr"]
q6r = json.load(open("artifacts/q6r_eval.json"))["mean_psnr"]
sys.exit(0 if q6r > q5 else 1)
EOF
then INIT=artifacts/emavfi_q6r_best.npz; INITF=artifacts/emavfi_q6r_best.flow.npz; fi
if [ -f artifacts/emavfi_q7_wip.npz ]; then
  INIT=artifacts/emavfi_q7_wip.npz; INITF=artifacts/emavfi_q7_wip.flow.npz
fi
echo "q7 warm start: $INIT"

Q7FLAGS=(--batch_size 8 --accum_steps 4 --remat true --random_rotation false
         --consistent_jitter true --crop_size "[320,320]"
         --target_unit_range true --best_metric val_psnr
         --dcn_max_offset 2 --warp_max_flow 16 --use_pallas true
         --ema_decay 0.998 --flow_prior true
         --lr_schedule cosine --learning_rate 1e-4 --cosine_min_lr 5e-6)

bash tools/ckpt_watcher.sh q7 runs/q7/best 600 &
W2=$!; echo "$W2" > runs/queueK/watcher_q7.pid

if [ ! -f runs/queueK/q7check.done ]; then
  timeout 5400 python train.py --config config/train_config.yaml \
    "${Q7FLAGS[@]}" --num-epochs 2 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q7check/ckpt --best_model_path runs/q7check/best \
    && touch runs/queueK/q7check.done
  if [ ! -f runs/queueK/q7check.done ]; then
    echo "q7 2-epoch gate FAILED — stopping the chain"; kill "$W2"; exit 1
  fi
fi

if [ ! -f runs/queueK/q7.done ]; then
  python train.py --config config/train_config.yaml \
    "${Q7FLAGS[@]}" --num-epochs 160 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q7/ckpt --best_model_path runs/q7/best \
    && touch runs/queueK/q7.done
fi

if [ -f runs/q7/best.npz ] && [ ! -f runs/queueK/q7eval.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path runs/q7/best.npz \
    --flow_model runs/q7/best.flow.npz --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
    > runs/queueK/q7_eval.json && touch runs/queueK/q7eval.done
  echo "q7 eval:"; cat runs/queueK/q7_eval.json
  secure q7 runs/q7/best runs/queueK/q7_eval.json
fi
kill "$W2" 2>/dev/null

# --- step 5: TTA eval of the session's best --------------------------------
BESTRUN=$(python - <<'EOF'
import json, os
cands = [(json.load(open(f"artifacts/{r}_eval.json"))["mean_psnr"], r)
         for r in ("q5", "q6r", "q7") if os.path.exists(f"artifacts/{r}_eval.json")]
print(max(cands)[1])
EOF
)
if [ ! -f runs/queueK/tta.done ]; then
  timeout 7200 python eval.py --data-dir data/processed/val \
    --model_path "artifacts/emavfi_${BESTRUN}_best.npz" \
    --flow_model "artifacts/emavfi_${BESTRUN}_best.flow.npz" --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --tta --json \
    > "runs/queueK/${BESTRUN}_tta_eval.json" && touch runs/queueK/tta.done
  cp "runs/queueK/${BESTRUN}_tta_eval.json" "artifacts/${BESTRUN}_tta_eval.json"
  git add "artifacts/${BESTRUN}_tta_eval.json" && \
    git commit -q -m "TTA eval of ${BESTRUN} flagship" || true
fi

echo "=== queueK COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueK/COMPLETE
