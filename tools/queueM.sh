#!/bin/bash
# Round-2 session-11 TPU job chain: runs after queueL (q7 320^2 fine-tune +
# eval + TTA + headline bench) completes.
#
#   0. Wait for runs/queueL/COMPLETE (the q7 tail is still on-chip).
#   1. Full pytest suite on CPU (proof-of-green for the session; the chip
#      is idle for these ~6 min, the 1-CPU host is not shared with a
#      trainer at that point).
#   2. q8 = the q7 recipe with crop 384^2 (next step on the measured
#      crop-size lever 256 -> 320; Grove's ceiling is the trunk's
#      receptive field, bigger crops show it bigger motion at train
#      time), warm-started from the session's best of {q5, q6r, q7}
#      by native-res eval. 2-epoch hardware gate at accum_steps 4
#      (microbatch 2); if that fails (DCN-backward padding wall,
#      PERFORMANCE.md "Flow-prior training memory"), retry the gate at
#      accum_steps 8 (microbatch 1) before committing to 200 epochs.
#   3. q8 native-res eval -> secure (weights + eval in one commit).
#   4. TTA eval of whatever checkpoint now leads.
#   5. Fresh default headline bench, committed.
# Idempotent via step markers in runs/queueM/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueM
LOG=runs/queueM/queueM.log
exec >>"$LOG" 2>&1
echo "=== queueM start $(date -u +%FT%TZ) ==="

secure() {  # secure <run_name> <best_prefix> <eval_json>
  local RUN="$1" BEST="$2" EVJ="$3"
  cp "$BEST.npz" "artifacts/emavfi_${RUN}_best.npz"
  [ -f "$BEST.flow.npz" ] && cp "$BEST.flow.npz" "artifacts/emavfi_${RUN}_best.flow.npz"
  [ -f "$EVJ" ] && cp "$EVJ" "artifacts/${RUN}_eval.json"
  git add -f "artifacts/emavfi_${RUN}_best.npz" "artifacts/emavfi_${RUN}_best.flow.npz" \
          "artifacts/${RUN}_eval.json" 2>/dev/null
  git commit -q -m "Secure ${RUN} best checkpoint + eval (weights tracked)" || true
}

# --- step 0: wait for queueL --------------------------------------------------
for i in $(seq 1 480); do   # up to 8 h
  [ -f runs/queueL/COMPLETE ] && break
  sleep 60
done
if [ ! -f runs/queueL/COMPLETE ]; then
  echo "queueL never completed - aborting queueM"; exit 1
fi
echo "queueL complete, proceeding $(date -u +%FT%TZ)"

# --- step 1: full pytest (CPU) -------------------------------------------------
if [ ! -f runs/queueM/pytest.done ]; then
  timeout 3600 python -m pytest tests/ -q > runs/queueM/pytest.log 2>&1
  RC=$?
  tail -5 runs/queueM/pytest.log
  if [ "$RC" -eq 0 ]; then touch runs/queueM/pytest.done
  else echo "PYTEST FAILED rc=$RC - continuing chain but flagging"; fi
fi

# --- step 2: q8 (384^2 crops) from the session best ---------------------------
BESTRUN=$(python - <<'EOF'
import json, os
cands = [(json.load(open(f"artifacts/{r}_eval.json"))["mean_psnr"], r)
         for r in ("q5", "q6r", "q7") if os.path.exists(f"artifacts/{r}_eval.json")]
print(max(cands)[1])
EOF
)
echo "q8 warm start source: $BESTRUN"
INIT="artifacts/emavfi_${BESTRUN}_best.npz"; INITF="artifacts/emavfi_${BESTRUN}_best.flow.npz"
if [ -f artifacts/emavfi_q8_wip.npz ]; then
  INIT=artifacts/emavfi_q8_wip.npz; INITF=artifacts/emavfi_q8_wip.flow.npz
  echo "q8 warm start: resuming from watcher-secured wip"
fi

Q8BASE=(--batch_size 8 --remat true --random_rotation false
        --consistent_jitter true --crop_size "[384,384]"
        --target_unit_range true --best_metric val_psnr
        --dcn_max_offset 2 --warp_max_flow 16 --use_pallas true
        --ema_decay 0.998 --flow_prior true
        --lr_schedule cosine --learning_rate 1e-4 --cosine_min_lr 5e-6)

bash tools/ckpt_watcher.sh q8 runs/q8/best 600 &
W8=$!; echo "$W8" > runs/queueM/watcher_q8.pid

ACCUM=4
if [ ! -f runs/queueM/q8check.done ]; then
  timeout 5400 python train.py --config config/train_config.yaml \
    "${Q8BASE[@]}" --accum_steps 4 --num-epochs 2 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q8check/ckpt --best_model_path runs/q8check/best \
    && { echo 4 > runs/queueM/q8.accum; touch runs/queueM/q8check.done; }
fi
if [ ! -f runs/queueM/q8check.done ]; then
  echo "q8 gate at accum 4 FAILED - retrying microbatch 1 (accum 8)"
  rm -rf runs/q8check
  timeout 5400 python train.py --config config/train_config.yaml \
    "${Q8BASE[@]}" --accum_steps 8 --num-epochs 2 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q8check/ckpt --best_model_path runs/q8check/best \
    && { echo 8 > runs/queueM/q8.accum; touch runs/queueM/q8check.done; }
fi
if [ ! -f runs/queueM/q8check.done ]; then
  echo "q8 2-epoch gate FAILED at both accum settings - stopping the chain"
  kill "$W8" 2>/dev/null; exit 1
fi
ACCUM=$(cat runs/queueM/q8.accum)
echo "q8 gate passed at accum_steps=$ACCUM"

if [ ! -f runs/queueM/q8.done ]; then
  python train.py --config config/train_config.yaml \
    "${Q8BASE[@]}" --accum_steps "$ACCUM" --num-epochs 200 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q8/ckpt --best_model_path runs/q8/best \
    && touch runs/queueM/q8.done
fi

# --- step 3: q8 eval + SECURE --------------------------------------------------
if [ -f runs/q8/best.npz ] && [ ! -f runs/queueM/q8eval.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path runs/q8/best.npz \
    --flow_model runs/q8/best.flow.npz --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
    > runs/queueM/q8_eval.json && touch runs/queueM/q8eval.done
  echo "q8 eval:"; cat runs/queueM/q8_eval.json
  secure q8 runs/q8/best runs/queueM/q8_eval.json
fi
kill "$W8" 2>/dev/null

# --- step 4: TTA eval of the overall best --------------------------------------
BESTRUN=$(python - <<'EOF'
import json, os
cands = [(json.load(open(f"artifacts/{r}_eval.json"))["mean_psnr"], r)
         for r in ("q5", "q6r", "q7", "q8") if os.path.exists(f"artifacts/{r}_eval.json")]
print(max(cands)[1])
EOF
)
if [ ! -f "artifacts/${BESTRUN}_tta_eval.json" ] && [ ! -f runs/queueM/tta.done ]; then
  timeout 7200 python eval.py --data-dir data/processed/val \
    --model_path "artifacts/emavfi_${BESTRUN}_best.npz" \
    --flow_model "artifacts/emavfi_${BESTRUN}_best.flow.npz" --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --tta --json \
    > "runs/queueM/${BESTRUN}_tta_eval.json" && touch runs/queueM/tta.done
  cp "runs/queueM/${BESTRUN}_tta_eval.json" "artifacts/${BESTRUN}_tta_eval.json"
  git add "artifacts/${BESTRUN}_tta_eval.json" && \
    git commit -q -m "TTA eval of ${BESTRUN} flagship" || true
fi

# --- step 5: fresh default headline bench --------------------------------------
if [ ! -f runs/queueM/benchfinal.done ]; then
  timeout 3600 python bench.py > artifacts/bench_session11.json \
    && touch runs/queueM/benchfinal.done
  echo "final headline:"; cat artifacts/bench_session11.json
  git add artifacts/bench_session11.json && \
    git commit -q -m "Session-11 headline bench refresh" || true
fi

echo "=== queueM COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueM/COMPLETE
