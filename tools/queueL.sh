#!/bin/bash
# Round-2 session-10 TPU job chain: resume queueK's unfinished tail after
# another VM restart (runs/ + data/ wiped; q6r itself was secured in time:
# 25.902 dB / 0.7911 — the new shipped flagship).
#
#   1. tpu-smoke (post-restart kernel sanity, per docs/OPERATIONS.md).
#   2. queueI bench ablation re-run (long2 vs q2 back-to-back on-chip) —
#      queueK ran it but the JSONs lived in runs/ and were wiped; this
#      time they are committed to artifacts/.
#   3. q7 = 320^2-crop fine-tune (queueJ/queueK recipe) from q6r (beats
#      q5 25.902 > 25.81); 2-epoch hardware gate, 160 epochs, watcher.
#   4. q7 native-res eval -> secure (weights + eval in one commit).
#   5. TTA eval of the session's best of {q5, q6r, q7}.
#   6. Fresh default headline bench, committed.
# Idempotent via step markers in runs/queueL/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueL
LOG=runs/queueL/queueL.log
exec >>"$LOG" 2>&1
echo "=== queueL start $(date -u +%FT%TZ) ==="

secure() {  # secure <run_name> <best_prefix> <eval_json>
  local RUN="$1" BEST="$2" EVJ="$3"
  cp "$BEST.npz" "artifacts/emavfi_${RUN}_best.npz"
  [ -f "$BEST.flow.npz" ] && cp "$BEST.flow.npz" "artifacts/emavfi_${RUN}_best.flow.npz"
  [ -f "$EVJ" ] && cp "$EVJ" "artifacts/${RUN}_eval.json"
  git add -f "artifacts/emavfi_${RUN}_best.npz" "artifacts/emavfi_${RUN}_best.flow.npz" \
          "artifacts/${RUN}_eval.json" 2>/dev/null
  git commit -q -m "Secure ${RUN} best checkpoint + eval (weights tracked)" || true
}

# --- step 1: tpu-smoke -------------------------------------------------------
if [ ! -f runs/queueL/smoke.done ]; then
  timeout 900 make tpu-smoke && touch runs/queueL/smoke.done
  cp artifacts/tpu_smoke.json runs/queueL/tpu_smoke.json 2>/dev/null
  git add artifacts/tpu_smoke.json && \
    git commit -q -m "tpu-smoke refresh after session-10 restart" || true
fi

# --- step 2: bench ablation (lost queueK step-1 results, re-run) -------------
if [ ! -f runs/queueL/benchlong2.done ]; then
  timeout 3600 python bench.py --ckpt artifacts/emavfi_long2_best.npz \
    > artifacts/bench_long2.json && touch runs/queueL/benchlong2.done
  echo "bench long2:"; cat artifacts/bench_long2.json
fi
if [ ! -f runs/queueL/benchq2.done ]; then
  timeout 3600 python bench.py --ckpt artifacts/emavfi_q2_best.npz \
    > artifacts/bench_q2.json && touch runs/queueL/benchq2.done
  echo "bench q2:"; cat artifacts/bench_q2.json
  git add artifacts/bench_long2.json artifacts/bench_q2.json && \
    git commit -q -m "Headline-drift ablation: long2 vs q2 back-to-back on-chip" || true
fi

# --- step 3: q7 (320^2 crops) from q6r ---------------------------------------
INIT=artifacts/emavfi_q6r_best.npz; INITF=artifacts/emavfi_q6r_best.flow.npz
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
W2=$!; echo "$W2" > runs/queueL/watcher_q7.pid

if [ ! -f runs/queueL/q7check.done ]; then
  timeout 5400 python train.py --config config/train_config.yaml \
    "${Q7FLAGS[@]}" --num-epochs 2 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q7check/ckpt --best_model_path runs/q7check/best \
    && touch runs/queueL/q7check.done
  if [ ! -f runs/queueL/q7check.done ]; then
    echo "q7 2-epoch gate FAILED — stopping the chain"; kill "$W2"; exit 1
  fi
fi

if [ ! -f runs/queueL/q7.done ]; then
  python train.py --config config/train_config.yaml \
    "${Q7FLAGS[@]}" --num-epochs 160 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q7/ckpt --best_model_path runs/q7/best \
    && touch runs/queueL/q7.done
fi

# --- step 4: q7 eval + SECURE -------------------------------------------------
if [ -f runs/q7/best.npz ] && [ ! -f runs/queueL/q7eval.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path runs/q7/best.npz \
    --flow_model runs/q7/best.flow.npz --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
    > runs/queueL/q7_eval.json && touch runs/queueL/q7eval.done
  echo "q7 eval:"; cat runs/queueL/q7_eval.json
  secure q7 runs/q7/best runs/queueL/q7_eval.json
fi
kill "$W2" 2>/dev/null

# --- step 5: TTA eval of the session's best -----------------------------------
BESTRUN=$(python - <<'EOF'
import json, os
cands = [(json.load(open(f"artifacts/{r}_eval.json"))["mean_psnr"], r)
         for r in ("q5", "q6r", "q7") if os.path.exists(f"artifacts/{r}_eval.json")]
print(max(cands)[1])
EOF
)
if [ ! -f runs/queueL/tta.done ]; then
  timeout 7200 python eval.py --data-dir data/processed/val \
    --model_path "artifacts/emavfi_${BESTRUN}_best.npz" \
    --flow_model "artifacts/emavfi_${BESTRUN}_best.flow.npz" --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --tta --json \
    > "runs/queueL/${BESTRUN}_tta_eval.json" && touch runs/queueL/tta.done
  cp "runs/queueL/${BESTRUN}_tta_eval.json" "artifacts/${BESTRUN}_tta_eval.json"
  git add "artifacts/${BESTRUN}_tta_eval.json" && \
    git commit -q -m "TTA eval of ${BESTRUN} flagship" || true
fi

# --- step 6: fresh default headline bench --------------------------------------
if [ ! -f runs/queueL/benchfinal.done ]; then
  timeout 3600 python bench.py > artifacts/bench_session10.json \
    && touch runs/queueL/benchfinal.done
  echo "final headline:"; cat artifacts/bench_session10.json
  git add artifacts/bench_session10.json && \
    git commit -q -m "Session-10 headline bench refresh" || true
fi

echo "=== queueL COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueL/COMPLETE
