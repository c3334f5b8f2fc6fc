#!/bin/bash
# Round-2 session-8 TPU job chain #3: runs AFTER queueG (waits on its
# COMPLETE marker).
#
# q6 = the first effective-batch-8 flow-prior fine-tune, enabled by the
# new gradient-accumulation path (accum_steps=2 x batch 4 + remat — the
# monolithic batch-8 DCN backward OOMs the chip, docs/PERFORMANCE.md
# "Flow-prior training memory"). Warm-starts from the better of
# {q5 flagship, q5b continuation} by native-res eval.
#   0. bounded 2-epoch hardware check of the recipe (compile + memory)
#   1. 200-epoch run, cosine 1.5e-4 -> 5e-6, EMA 0.998, best on val PSNR
#   2. native-res eval (promotion to flagship is manual, only if it beats
#      the current leader)
# Idempotent: step markers in runs/queueH/. Companion watcher:
#   tools/ckpt_watcher.sh q6 runs/q6/best 600
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueH
LOG=runs/queueH/queueH.log
exec >>"$LOG" 2>&1
echo "=== queueH waiting for queueG $(date -u +%FT%TZ) ==="
while [ ! -f runs/queueG/COMPLETE ]; do sleep 120; done
echo "=== queueH start $(date -u +%FT%TZ) ==="

# Pick the warm start: q5b if its eval beat q5's 25.81, else q5.
INIT=artifacts/emavfi_q5_best.npz; INITF=artifacts/emavfi_q5_best.flow.npz
if [ -f runs/queueF/q5b_eval.json ]; then
  if python - <<'EOF'
import json, sys
q5 = json.load(open("artifacts/q5_eval.json"))["mean_psnr"]
q5b = json.load(open("runs/queueF/q5b_eval.json"))["mean_psnr"]
sys.exit(0 if q5b > q5 else 1)
EOF
  then INIT=runs/q5b/best.npz; INITF=runs/q5b/best.flow.npz; fi
fi
# a watcher-secured wip from a previous attempt trumps both
if [ -f artifacts/emavfi_q6_wip.npz ]; then
  INIT=artifacts/emavfi_q6_wip.npz; INITF=artifacts/emavfi_q6_wip.flow.npz
fi
echo "q6 warm start: $INIT"

QFLAGS=(--batch_size 8 --accum_steps 2 --remat true --random_rotation false
        --consistent_jitter true
        --target_unit_range true --best_metric val_psnr
        --dcn_max_offset 2 --warp_max_flow 16 --use_pallas true
        --ema_decay 0.998 --flow_prior true
        --lr_schedule cosine --learning_rate 1.5e-4 --cosine_min_lr 5e-6)

# --- step 0: bounded 2-epoch hardware check ------------------------------
if [ ! -f runs/queueH/q6check.done ]; then
  timeout 3600 python train.py --config config/train_config.yaml \
    "${QFLAGS[@]}" --num-epochs 2 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q6check/ckpt --best_model_path runs/q6check/best \
    && touch runs/queueH/q6check.done
  if [ ! -f runs/queueH/q6check.done ]; then
    echo "q6 2-epoch check FAILED — not committing the chain to it"
    exit 1
  fi
fi

# --- step 1: q6 train ------------------------------------------------------
if [ ! -f runs/queueH/q6.done ]; then
  python train.py --config config/train_config.yaml \
    "${QFLAGS[@]}" --num-epochs 200 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q6/ckpt --best_model_path runs/q6/best \
    && touch runs/queueH/q6.done
fi

# --- step 2: q6 eval -------------------------------------------------------
if [ -f runs/q6/best.npz ] && [ ! -f runs/queueH/q6eval.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path runs/q6/best.npz \
    --flow_model runs/q6/best.flow.npz --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
    > runs/queueH/q6_eval.json && touch runs/queueH/q6eval.done
  echo "q6 eval:"; cat runs/queueH/q6_eval.json
fi

echo "=== queueH COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueH/COMPLETE
