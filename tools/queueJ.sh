#!/bin/bash
# Round-2 session-8 TPU job chain #5 (overnight): runs AFTER queueI.
#
# q7 = large-crop fine-tune: 320^2 crops (vs the reference's 256^2) give
# the stride-1 trunk and the flow prior 56% more spatial context per
# sample — aimed at the large-motion (Grove) receptive-field ceiling.
# Memory: microbatch 2 via accum_steps 4 (+remat) keeps the DCN backward
# inside the chip at the bigger crop. Warm-starts from the better of
# {q6, q5b} by native-res eval; 2-epoch hardware gate first.
# Idempotent via step markers in runs/queueJ/. Watcher:
#   tools/ckpt_watcher.sh q7 runs/q7/best 600
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueJ
LOG=runs/queueJ/queueJ.log
exec >>"$LOG" 2>&1
echo "=== queueJ waiting for queueI $(date -u +%FT%TZ) ==="
while [ ! -f runs/queueI/COMPLETE ]; do sleep 120; done
echo "=== queueJ start $(date -u +%FT%TZ) ==="

INIT=artifacts/emavfi_q5b_best.npz; INITF=artifacts/emavfi_q5b_best.flow.npz
if [ -f runs/queueH/q6_eval.json ] && python - <<'EOF'
import json, sys
q5b = json.load(open("artifacts/q5b_eval.json"))["mean_psnr"]
q6 = json.load(open("runs/queueH/q6_eval.json"))["mean_psnr"]
sys.exit(0 if q6 > q5b else 1)
EOF
then INIT=runs/q6/best.npz; INITF=runs/q6/best.flow.npz; fi
if [ -f artifacts/emavfi_q7_wip.npz ]; then
  INIT=artifacts/emavfi_q7_wip.npz; INITF=artifacts/emavfi_q7_wip.flow.npz
fi
echo "q7 warm start: $INIT"

QFLAGS=(--batch_size 8 --accum_steps 4 --remat true --random_rotation false
        --consistent_jitter true --crop_size "[320,320]"
        --target_unit_range true --best_metric val_psnr
        --dcn_max_offset 2 --warp_max_flow 16 --use_pallas true
        --ema_decay 0.998 --flow_prior true
        --lr_schedule cosine --learning_rate 1e-4 --cosine_min_lr 5e-6)

# --- step 0: bounded 2-epoch hardware gate (compile + memory at 320^2) ---
if [ ! -f runs/queueJ/q7check.done ]; then
  timeout 5400 python train.py --config config/train_config.yaml \
    "${QFLAGS[@]}" --num-epochs 2 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q7check/ckpt --best_model_path runs/q7check/best \
    && touch runs/queueJ/q7check.done
  if [ ! -f runs/queueJ/q7check.done ]; then
    echo "q7 2-epoch gate FAILED — stopping the chain"
    exit 1
  fi
fi

# --- step 1: q7 train ------------------------------------------------------
if [ ! -f runs/queueJ/q7.done ]; then
  python train.py --config config/train_config.yaml \
    "${QFLAGS[@]}" --num-epochs 160 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q7/ckpt --best_model_path runs/q7/best \
    && touch runs/queueJ/q7.done
fi

# --- step 2: q7 eval -------------------------------------------------------
if [ -f runs/q7/best.npz ] && [ ! -f runs/queueJ/q7eval.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path runs/q7/best.npz \
    --flow_model runs/q7/best.flow.npz --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
    > runs/queueJ/q7_eval.json && touch runs/queueJ/q7eval.done
  echo "q7 eval:"; cat runs/queueJ/q7_eval.json
fi

echo "=== queueJ COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueJ/COMPLETE
