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

# Warm start: q5b (promoted flagship, 25.90 dB); a watcher-secured wip
# from a previous q6 attempt trumps it after a VM restart.
INIT=artifacts/emavfi_q5b_best.npz; INITF=artifacts/emavfi_q5b_best.flow.npz
if [ -f artifacts/emavfi_q6_wip.npz ]; then
  INIT=artifacts/emavfi_q6_wip.npz; INITF=artifacts/emavfi_q6_wip.flow.npz
fi
echo "q6 warm start: $INIT"

# --- step 0a: TTA eval of the new q5b flagship ----------------------------
if [ ! -f runs/queueH/q5btta.done ]; then
  timeout 7200 python eval.py --data-dir data/processed/val \
    --model_path artifacts/emavfi_q5b_best.npz \
    --flow_model artifacts/emavfi_q5b_best.flow.npz --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --tta --json \
    > runs/queueH/q5b_tta_eval.json && touch runs/queueH/q5btta.done
  echo "q5b TTA eval:"; cat runs/queueH/q5b_tta_eval.json
fi

# --- step 0b: serve re-bench after the codec fixes ------------------------
# (raw zero-codec protocol + response PNG at compress level 1; the first
# 720p bench was host-PNG-bound: 0.635 req/s, p50 21.6 s)
if [ ! -f runs/queueH/serveraw.done ]; then
  timeout 3600 python tools/bench_serve.py --inprocess \
    --model_path artifacts/emavfi_q2_best.npz \
    --size 720x1280 --clients 16 --requests 64 --max_batch 8 \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --raw \
    > runs/queueH/serve_720p_raw.json && touch runs/queueH/serveraw.done
  echo "serve 720p raw:"; cat runs/queueH/serve_720p_raw.json
fi
if [ ! -f runs/queueH/servepng1.done ]; then
  timeout 3600 python tools/bench_serve.py --inprocess \
    --model_path artifacts/emavfi_q2_best.npz \
    --size 720x1280 --clients 16 --requests 64 --max_batch 8 \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas \
    > runs/queueH/serve_720p_png1.json && touch runs/queueH/servepng1.done
  echo "serve 720p png(level1):"; cat runs/queueH/serve_720p_png1.json
fi

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
