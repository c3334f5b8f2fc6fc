#!/bin/bash
# Round-2 session-6 TPU job chain (serialized — one chip).
#
# q5 = the two measured quality levers combined: flow-prior mode (q3ft,
# 25.63 dB val) + parameter EMA (q4ema recipe: decay 0.998, cosine
# 2e-4 -> 1e-5), fine-tuned from the q3ft best checkpoint. Steps:
#   1. bounded 2-epoch hardware check of the exact q5 config
#   2. full 200-epoch q5 fine-tune (best gated on val PSNR; the
#      companion tools/ckpt_watcher.sh secures best-so-far to artifacts/)
#   3. native-res full-val eval of the q5 best
#   4. q4ema continuation (non-flow-prior EMA lineage) if time remains
#
# Idempotent-ish: each step writes runs/queueE/<step>.done; a VM restart
# wipes runs/ entirely, in which case rerunning restarts the chain with
# the q5 train warm-started from the watcher-secured artifacts wip npz
# (see INIT selection below).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueE
LOG=runs/queueE/queueE.log
exec >>"$LOG" 2>&1
echo "=== queueE start $(date -u +%FT%TZ) ==="

# batch 4 + remat, NOT the q2 recipe's batch 8: flow-prior training at
# batch 8 OOMs the 15.75G chip at ~26G via the DCN backward's 128-lane
# padding (docs/PERFORMANCE.md "Flow-prior training memory").
QFLAGS=(--batch_size 4 --remat true --random_rotation false
        --consistent_jitter true
        --target_unit_range true --best_metric val_psnr
        --dcn_max_offset 2 --warp_max_flow 16 --use_pallas true
        --ema_decay 0.998 --flow_prior true
        --lr_schedule cosine --learning_rate 2e-4 --cosine_min_lr 1e-5)

# Warm start: prefer the watcher-secured q5 wip (post-restart resume),
# else the q3ft flow-prior leader.
if [ -f artifacts/emavfi_q5_wip.npz ]; then
  INIT=artifacts/emavfi_q5_wip.npz; INITF=artifacts/emavfi_q5_wip.flow.npz
else
  INIT=artifacts/emavfi_q3ft_best.npz; INITF=artifacts/emavfi_q3ft_best.flow.npz
fi
echo "q5 warm start: $INIT"

# --- step 1: 2-epoch hardware check -------------------------------------
if [ ! -f runs/queueE/q5check.done ]; then
  timeout 3600 python train.py --config config/train_config.yaml \
    "${QFLAGS[@]}" --num-epochs 2 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q5check/ckpt --best_model_path runs/q5check/best \
    && touch runs/queueE/q5check.done
  [ -f runs/queueE/q5check.done ] || { echo "q5check FAILED — abort"; exit 1; }
fi

# --- step 2: full q5 fine-tune ------------------------------------------
if [ ! -f runs/queueE/q5.done ]; then
  python train.py --config config/train_config.yaml \
    "${QFLAGS[@]}" --num-epochs 140 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q5/ckpt --best_model_path runs/q5/best \
    && touch runs/queueE/q5.done
fi

# --- step 3: q5 eval -----------------------------------------------------
if [ -f runs/q5/best.npz ] && [ ! -f runs/queueE/q5eval.done ]; then
  cp runs/q5/best.npz artifacts/emavfi_q5_best.npz
  [ -f runs/q5/best.flow.npz ] && cp runs/q5/best.flow.npz artifacts/emavfi_q5_best.flow.npz
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path artifacts/emavfi_q5_best.npz \
    --flow_model artifacts/emavfi_q5_best.flow.npz --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
    > runs/queueE/q5_eval.json && touch runs/queueE/q5eval.done
  echo "q5 eval:"; cat runs/queueE/q5_eval.json
fi

# --- step 4: q4ema continuation (plain lineage) --------------------------
if [ ! -f runs/queueE/q4b.done ]; then
  python train.py --config config/train_config.yaml \
    --batch_size 8 --random_rotation false --consistent_jitter true \
    --target_unit_range true --best_metric val_psnr \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas true \
    --ema_decay 0.998 \
    --lr_schedule cosine --learning_rate 1e-4 --cosine_min_lr 1e-5 \
    --num-epochs 120 \
    --init_model_path artifacts/emavfi_q4ema_wip.npz \
    --init_flow_path artifacts/emavfi_q4ema_wip.flow.npz \
    --checkpoint_path runs/q4b/ckpt --best_model_path runs/q4b/best \
    && touch runs/queueE/q4b.done
fi
if [ -f runs/q4b/best.npz ] && [ ! -f runs/queueE/q4beval.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path runs/q4b/best.npz \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
    > runs/queueE/q4b_eval.json && touch runs/queueE/q4beval.done
  echo "q4b eval:"; cat runs/queueE/q4b_eval.json
fi

echo "=== queueE COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueE/COMPLETE
