#!/bin/bash
# Round-2 session-7 TPU job chain (serialized — one chip).
#
# queueE finished: q5 (flow-prior + parameter EMA) is the quality flagship
# at 25.81 dB / 0.7859 (artifacts/q5_eval.json). This chain squeezes the
# remaining headroom:
#   1. TTA native-res eval of q5 (4-way symmetry averaging — inference-only
#      config, reported separately because of its 4x cost)
#   2. q5b continuation: 140 more epochs, cosine restart 1e-4 -> 5e-6,
#      warm-started from the q5 best (same recipe: batch 4 + remat — the
#      batch-8 DCN-backward padding wall still applies, see
#      docs/PERFORMANCE.md "Flow-prior training memory")
#   3. native-res eval of the q5b best; promotion to flagship happens
#      manually only if it beats 25.81.
#
# Idempotent: each step writes runs/queueF/<step>.done; after a VM restart
# rerun the script — the q5b train warm-starts from the watcher-secured
# artifacts/emavfi_q5b_wip.npz when present, and the orbax dir resumes if
# runs/ survived. Companion: tools/ckpt_watcher.sh q5b runs/q5b/best 600.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueF
LOG=runs/queueF/queueF.log
exec >>"$LOG" 2>&1
echo "=== queueF start $(date -u +%FT%TZ) ==="

QFLAGS=(--batch_size 4 --remat true --random_rotation false
        --consistent_jitter true
        --target_unit_range true --best_metric val_psnr
        --dcn_max_offset 2 --warp_max_flow 16 --use_pallas true
        --ema_decay 0.998 --flow_prior true
        --lr_schedule cosine --learning_rate 1e-4 --cosine_min_lr 5e-6)

if [ -f artifacts/emavfi_q5b_wip.npz ]; then
  INIT=artifacts/emavfi_q5b_wip.npz; INITF=artifacts/emavfi_q5b_wip.flow.npz
else
  INIT=artifacts/emavfi_q5_best.npz; INITF=artifacts/emavfi_q5_best.flow.npz
fi
echo "q5b warm start: $INIT"

# --- step 1: TTA eval of the q5 flagship ---------------------------------
if [ ! -f runs/queueF/q5tta.done ]; then
  timeout 7200 python eval.py --data-dir data/processed/val \
    --model_path artifacts/emavfi_q5_best.npz \
    --flow_model artifacts/emavfi_q5_best.flow.npz --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --tta --json \
    > runs/queueF/q5_tta_eval.json && touch runs/queueF/q5tta.done
  echo "q5 TTA eval:"; cat runs/queueF/q5_tta_eval.json
fi

# --- step 2: q5b continuation --------------------------------------------
if [ ! -f runs/queueF/q5b.done ]; then
  python train.py --config config/train_config.yaml \
    "${QFLAGS[@]}" --num-epochs 140 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q5b/ckpt --best_model_path runs/q5b/best \
    && touch runs/queueF/q5b.done
fi

# --- step 3: q5b eval ------------------------------------------------------
if [ -f runs/q5b/best.npz ] && [ ! -f runs/queueF/q5beval.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path runs/q5b/best.npz \
    --flow_model runs/q5b/best.flow.npz --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
    > runs/queueF/q5b_eval.json && touch runs/queueF/q5beval.done
  echo "q5b eval:"; cat runs/queueF/q5b_eval.json
fi

echo "=== queueF COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueF/COMPLETE
