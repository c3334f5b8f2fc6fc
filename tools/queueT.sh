#!/bin/bash
# Round-2 continuation (session 14) chain: the self-cascade fine-tune.
#
# q12 = EMAVFI cascade_levels=2 fine-tune from the q11 flagship. The
# cascade runs the model's OWN motion stages on a 2x-downsampled copy
# (shared weights — the q11 checkpoint loads unchanged) and pre-warps
# frame2 by the upsampled coarse flow inside the jit graph: the trained,
# per-pixel counterpart of the measured auto_scale lever (+0.37 dB mean,
# docs/PERFORMANCE.md "Scale-adaptive inference"), aimed at the stride-1
# receptive-field ceiling (Grove/Mequon/Wooden/Urban).
#
#   0. Free datapoint: eval the UNTRAINED q11 weights in cascade mode.
#   1. Bounded 4-epoch hardware gate (compile + steady-state epoch time).
#   2. q12 fine-tune, sized to the session clock, watcher-secured.
#   3. Native-res eval (--cascade_levels 2); secure + TTA iff it beats q11.
# Idempotent via step markers in runs/queueT/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueT
LOG=runs/queueT/queueT.log
exec >>"$LOG" 2>&1
echo "=== queueT start $(date -u +%FT%TZ) ==="

INIT=artifacts/emavfi_q11_best.npz
INITF=artifacts/emavfi_q11_best.flow.npz
INIT_PSNR=$(python -c "import json; print(json.load(open('artifacts/q11_eval.json'))['mean_psnr'])")
# resume from the watcher-secured wip after a restart
if [ -f artifacts/emavfi_q12_wip.npz ]; then
  INIT=artifacts/emavfi_q12_wip.npz; INITF=artifacts/emavfi_q12_wip.flow.npz
  echo "resuming from watcher-secured q12 wip"
fi
echo "q12 warm start: $INIT (q11 baseline $INIT_PSNR dB)"

# --- step 0: untrained-cascade eval (free datapoint) -------------------------
if [ ! -f runs/queueT/eval0.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path artifacts/emavfi_q11_best.npz \
    --flow_model artifacts/emavfi_q11_best.flow.npz --flow_prior \
    --cascade_levels 2 --dcn_max_offset 2 --warp_max_flow 16 \
    --use_pallas --json > runs/queueT/q11_cascade_untrained_eval.json \
    && touch runs/queueT/eval0.done
  echo "q11-in-cascade-mode (untrained):"
  cat runs/queueT/q11_cascade_untrained_eval.json || true
  if [ -s runs/queueT/q11_cascade_untrained_eval.json ]; then
    cp runs/queueT/q11_cascade_untrained_eval.json \
      artifacts/q11_cascade_untrained_eval.json
    git add artifacts/q11_cascade_untrained_eval.json
    git commit -q -m "Eval q11 weights in untrained cascade mode (baseline for the q12 fine-tune)" || true
  fi
fi

# --- step 1: bounded hardware gate -------------------------------------------
if [ ! -f runs/queueT/gate.done ]; then
  rm -rf runs/q12gate
  timeout 2400 python train.py --config config/train_config.yaml \
    --batch_size 16 --accum_steps 8 --remat true \
    --random_rotation false --consistent_jitter true \
    --crop_size "[320,320]" --target_unit_range true \
    --best_metric val_psnr --dcn_max_offset 2 --warp_max_flow 16 \
    --use_pallas true --ema_decay 0.998 --flow_prior true \
    --cascade_levels 2 \
    --lr_schedule cosine --learning_rate 1e-4 --cosine_min_lr 5e-6 \
    --num-epochs 4 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q12gate/ckpt --best_model_path runs/q12gate/best \
    && touch runs/queueT/gate.done
  if [ ! -f runs/queueT/gate.done ]; then
    echo "GATE FAILED - aborting queueT (no COMPLETE marker)"; exit 1
  fi
fi

# --- session-clock guard ------------------------------------------------------
START=$(cat /tmp/session14_start 2>/dev/null || echo 0)
NOW=$(date -u +%s)
if [ "$START" -gt 0 ]; then
  REMAIN=$(( 43200 - (NOW - START) ))
else
  REMAIN=21600   # no marker (restart): assume half a session
fi
echo "session time remaining ~${REMAIN}s"
if [ "$REMAIN" -lt 5400 ]; then
  echo "not enough session time for q12 - leaving the stage for later"
  exit 0
fi
# ~40 s/epoch steady state (cascade adds ~15% to the 34 s q11 epoch);
# leave 40 min for eval + TTA + the driver's end bench
EPOCHS=$(( (REMAIN - 2400) / 40 ))
[ "$EPOCHS" -gt 300 ] && EPOCHS=300
TLIMIT=$(( REMAIN - 2400 ))
echo "q12 sized to $EPOCHS epochs (timeout ${TLIMIT}s)"

# --- step 2: q12 cascade fine-tune ---------------------------------------------
if [ ! -f runs/queueT/q12.done ]; then
  nohup bash tools/ckpt_watcher.sh q12 runs/q12/best 600 >/dev/null 2>&1 &
  echo $! > /tmp/q12_watcher.pid
  timeout "$TLIMIT" python train.py --config config/train_config.yaml \
    --batch_size 16 --accum_steps 8 --remat true \
    --random_rotation false --consistent_jitter true \
    --crop_size "[320,320]" --target_unit_range true \
    --best_metric val_psnr --dcn_max_offset 2 --warp_max_flow 16 \
    --use_pallas true --ema_decay 0.998 --flow_prior true \
    --cascade_levels 2 \
    --lr_schedule cosine --learning_rate 1e-4 --cosine_min_lr 5e-6 \
    --num-epochs "$EPOCHS" \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q12/ckpt --best_model_path runs/q12/best \
    && touch runs/queueT/q12.done
  kill "$(cat /tmp/q12_watcher.pid)" 2>/dev/null || true
fi

# --- step 3: eval + secure-if-better -------------------------------------------
if [ -f runs/q12/best.npz ] && [ ! -f runs/queueT/eval.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path runs/q12/best.npz --flow_model runs/q12/best.flow.npz \
    --flow_prior --cascade_levels 2 --dcn_max_offset 2 --warp_max_flow 16 \
    --use_pallas --json > runs/queueT/q12_eval.json && touch runs/queueT/eval.done
  echo "q12 eval:"; cat runs/queueT/q12_eval.json
fi
if [ -f runs/queueT/eval.done ] && [ ! -f runs/queueT/secured ]; then
  Q12=$(python -c "import json; print(json.load(open('runs/queueT/q12_eval.json'))['mean_psnr'])")
  if python -c "exit(0 if $Q12 > $INIT_PSNR else 1)"; then
    cp runs/q12/best.npz artifacts/emavfi_q12_best.npz
    cp runs/q12/best.flow.npz artifacts/emavfi_q12_best.flow.npz
    cp runs/queueT/q12_eval.json artifacts/q12_eval.json
    git add -f artifacts/emavfi_q12_best.npz artifacts/emavfi_q12_best.flow.npz \
        artifacts/q12_eval.json
    git commit -q -m "Secure q12 self-cascade fine-tune (beats the q11 flagship)" || true
    touch runs/queueT/secured
  else
    cp runs/queueT/q12_eval.json artifacts/q12_eval_rejected.json
    git add artifacts/q12_eval_rejected.json
    git commit -q -m "q12 cascade fine-tune did not beat q11 (eval on record)" || true
  fi
fi
# TTA outside the secured guard: retryable on re-run
if [ -f runs/queueT/secured ] && [ ! -f runs/queueT/tta.done ]; then
  timeout 7200 python eval.py --data-dir data/processed/val \
    --model_path artifacts/emavfi_q12_best.npz \
    --flow_model artifacts/emavfi_q12_best.flow.npz --flow_prior \
    --cascade_levels 2 --dcn_max_offset 2 --warp_max_flow 16 \
    --use_pallas --tta --json > runs/queueT/q12_tta_eval.json \
    && touch runs/queueT/tta.done
fi
if [ -f runs/queueT/tta.done ] && [ ! -f artifacts/q12_tta_eval.json ]; then
  cp runs/queueT/q12_tta_eval.json artifacts/q12_tta_eval.json \
    && git add artifacts/q12_tta_eval.json \
    && git commit -q -m "TTA eval of the q12 cascade flagship" || true
fi

echo "=== queueT COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueT/COMPLETE
