#!/bin/bash
# Round-2 session-11 chain #3: re-measure and (if viable) run the
# effective-batch-16 lever properly, then hand off to queueN.
#
# PERFORMANCE.md "Correction of the correction": the batch-16 recipe was
# killed off an epoch-2 reading that still contained staged compilation.
# This chain:
#   0. waits for queueM3 (q8r2 restart continuation) to finish;
#   1. runs a 4-EPOCH gate of batch 16 / accum 8 / 320^2 warm-started
#      from the best of {q7, q8r2} and reads the EPOCH-4 seconds — the
#      first number past all recompiles;
#   2. if epoch-4 <= 75 s (140 epochs <= ~3 h): runs q9 = that recipe for
#      140 epochs (cosine 1e-4 -> 5e-6), watcher-secured, eval + secure,
#      TTA if it leads; else records the measurement and skips;
#   3. execs tools/queueN.sh (config demos) — queueM3 has already touched
#      runs/queueM/COMPLETE by then so queueN proceeds immediately.
# Idempotent via step markers in runs/queueO/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueO
LOG=runs/queueO/queueO.log
exec >>"$LOG" 2>&1
echo "=== queueO start $(date -u +%FT%TZ) ==="

secure() {  # secure <run_name> <best_prefix> <eval_json>
  local RUN="$1" BEST="$2" EVJ="$3"
  cp "$BEST.npz" "artifacts/emavfi_${RUN}_best.npz"
  [ -f "$BEST.flow.npz" ] && cp "$BEST.flow.npz" "artifacts/emavfi_${RUN}_best.flow.npz"
  [ -f "$EVJ" ] && cp "$EVJ" "artifacts/${RUN}_eval.json"
  git add -f "artifacts/emavfi_${RUN}_best.npz" "artifacts/emavfi_${RUN}_best.flow.npz" \
          "artifacts/${RUN}_eval.json" 2>/dev/null
  git commit -q -m "Secure ${RUN} best checkpoint + eval (weights tracked)" || true
}

# --- step 0: wait for queueM3 ---------------------------------------------------
for i in $(seq 1 420); do   # up to 7 h
  [ -f runs/queueM3/COMPLETE ] && break
  sleep 60
done
if [ ! -f runs/queueM3/COMPLETE ]; then
  echo "queueM3 never completed - skipping q9, going straight to queueN"
  exec bash tools/queueN.sh
fi
echo "queueM3 complete, proceeding $(date -u +%FT%TZ)"

BESTRUN=$(python - <<'EOF'
import json, os
cands = [(json.load(open(f"artifacts/{r}_eval.json"))["mean_psnr"], r)
         for r in ("q7", "q8r2") if os.path.exists(f"artifacts/{r}_eval.json")]
print(max(cands)[1])
EOF
)
echo "q9 warm start source: $BESTRUN"
INIT="artifacts/emavfi_${BESTRUN}_best.npz"; INITF="artifacts/emavfi_${BESTRUN}_best.flow.npz"
if [ -f artifacts/emavfi_q9_wip.npz ]; then
  INIT=artifacts/emavfi_q9_wip.npz; INITF=artifacts/emavfi_q9_wip.flow.npz
fi

Q9FLAGS=(--batch_size 16 --accum_steps 8 --remat true --random_rotation false
         --consistent_jitter true --crop_size "[320,320]"
         --target_unit_range true --best_metric val_psnr
         --dcn_max_offset 2 --warp_max_flow 16 --use_pallas true
         --ema_decay 0.998 --flow_prior true
         --lr_schedule cosine --learning_rate 1e-4 --cosine_min_lr 5e-6)

# --- step 1: 4-epoch steady-state gate ------------------------------------------
if [ ! -f runs/queueO/gate.done ]; then
  timeout 7200 python train.py --config config/train_config.yaml \
    "${Q9FLAGS[@]}" --num-epochs 4 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q9check/ckpt --best_model_path runs/q9check/best \
    && touch runs/queueO/gate.done
fi
if [ ! -f runs/queueO/gate.done ]; then
  echo "q9 4-epoch gate FAILED - skipping q9"; exec bash tools/queueN.sh
fi
E4=$(python - <<'EOF'
import json
rows = [json.loads(l) for l in open("runs/q9check/ckpt/metrics.jsonl")]
print(int(max(r["seconds"] for r in rows if r["epoch"] >= 4)))
EOF
)
echo "q9 steady-state epoch-4 seconds: $E4"

# --- step 2: q9 main run if viable ----------------------------------------------
if [ "$E4" -le 75 ]; then
  bash tools/ckpt_watcher.sh q9 runs/q9/best 600 &
  W=$!; echo "$W" > runs/queueO/watcher.pid
  if [ ! -f runs/queueO/q9.done ]; then
    timeout 14400 python train.py --config config/train_config.yaml \
      "${Q9FLAGS[@]}" --num-epochs 140 \
      --init_model_path "$INIT" --init_flow_path "$INITF" \
      --checkpoint_path runs/q9/ckpt --best_model_path runs/q9/best \
      && touch runs/queueO/q9.done
  fi
  if [ -f runs/q9/best.npz ] && [ ! -f runs/queueO/q9eval.done ]; then
    timeout 3600 python eval.py --data-dir data/processed/val \
      --model_path runs/q9/best.npz \
      --flow_model runs/q9/best.flow.npz --flow_prior \
      --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
      > runs/queueO/q9_eval.json && touch runs/queueO/q9eval.done
    echo "q9 eval:"; cat runs/queueO/q9_eval.json
    secure q9 runs/q9/best runs/queueO/q9_eval.json
  fi
  kill "$W" 2>/dev/null
  FINALBEST=$(python - <<'EOF'
import json, os
cands = [(json.load(open(f"artifacts/{r}_eval.json"))["mean_psnr"], r)
         for r in ("q7", "q8r2", "q9") if os.path.exists(f"artifacts/{r}_eval.json")]
print(max(cands)[1])
EOF
)
  if [ ! -f "artifacts/${FINALBEST}_tta_eval.json" ] && [ ! -f runs/queueO/tta.done ]; then
    timeout 7200 python eval.py --data-dir data/processed/val \
      --model_path "artifacts/emavfi_${FINALBEST}_best.npz" \
      --flow_model "artifacts/emavfi_${FINALBEST}_best.flow.npz" --flow_prior \
      --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --tta --json \
      > "runs/queueO/${FINALBEST}_tta_eval.json" && touch runs/queueO/tta.done
    cp "runs/queueO/${FINALBEST}_tta_eval.json" "artifacts/${FINALBEST}_tta_eval.json"
    git add "artifacts/${FINALBEST}_tta_eval.json" && \
      git commit -q -m "TTA eval of ${FINALBEST} flagship" || true
  fi
else
  echo "q9 parked: epoch-4 ${E4}s > 75s budget (140 epochs too slow)"
  echo "{\"epoch4_seconds\": $E4, \"verdict\": \"parked\"}" > runs/queueO/q9_parked.json
fi

echo "=== queueO handing off to queueN $(date -u +%FT%TZ) ==="
touch runs/queueO/COMPLETE
exec bash tools/queueN.sh
