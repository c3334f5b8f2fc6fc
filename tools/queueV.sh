#!/bin/bash
# Session-16 follow-up chain: inference-time quality adjudication of the
# q12 cascade flagship (26.098 dB / 0.7966, artifacts/q12_eval.json).
#
#   1. TTA eval of q12 (4-way symmetry averaging, 4x cost). q11's TTA
#      delta was +0.28 dB (26.28); expected ~26.4 here.
#   2. auto_scale 7.5 composed with the cascade (+TTA): the two
#      large-motion levers were measured separately (autoscale on q9:
#      26.36 alone / 26.66 with TTA) — adjudicate whether they compose
#      on q12 or overlap (both target the stride-1 receptive field).
# Waits for queueU (smoke retry) so the chip is uncontended.
# Idempotent via step markers in runs/queueV/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueV
LOG=runs/queueV/queueV.log
exec >>"$LOG" 2>&1
echo "=== queueV start $(date -u +%FT%TZ) ==="

for i in $(seq 1 240); do   # up to 4 h
  [ -f runs/queueU/COMPLETE ] && break
  sleep 60
done
[ -f runs/queueU/COMPLETE ] || { echo "queueU never completed - proceeding anyway (smoke is optional)"; }

M=artifacts/emavfi_q12_best.npz
F=artifacts/emavfi_q12_best.flow.npz
COMMON="--data-dir data/processed/val --model_path $M --flow_model $F \
  --flow_prior --cascade_levels 2 --dcn_max_offset 2 --warp_max_flow 16 \
  --use_pallas --json"

if [ ! -f runs/queueV/tta.done ]; then
  timeout 7200 python eval.py $COMMON --tta > runs/queueV/q12_tta_eval.json \
    && touch runs/queueV/tta.done
  if [ -f runs/queueV/tta.done ] && [ -s runs/queueV/q12_tta_eval.json ]; then
    cp runs/queueV/q12_tta_eval.json artifacts/q12_tta_eval.json
    echo "q12 TTA:"; cat artifacts/q12_tta_eval.json
    git add artifacts/q12_tta_eval.json && \
      git commit -q -m "TTA eval of the q12 cascade flagship" || true
  fi
fi

if [ ! -f runs/queueV/auto.done ]; then
  timeout 7200 python eval.py $COMMON --auto_scale 7.5 \
    > runs/queueV/q12_autoscale_eval.json && touch runs/queueV/auto.done
  if [ -f runs/queueV/auto.done ] && [ -s runs/queueV/q12_autoscale_eval.json ]; then
    cp runs/queueV/q12_autoscale_eval.json artifacts/q12_autoscale_eval.json
    echo "q12 auto_scale:"; cat artifacts/q12_autoscale_eval.json
    git add artifacts/q12_autoscale_eval.json && \
      git commit -q -m "auto_scale 7.5 composed with the q12 cascade (large-motion lever overlap test)" || true
  fi
fi

if [ ! -f runs/queueV/autotta.done ]; then
  timeout 10800 python eval.py $COMMON --auto_scale 7.5 --tta \
    > runs/queueV/q12_autoscale_tta_eval.json && touch runs/queueV/autotta.done
  if [ -f runs/queueV/autotta.done ] && [ -s runs/queueV/q12_autoscale_tta_eval.json ]; then
    cp runs/queueV/q12_autoscale_tta_eval.json artifacts/q12_autoscale_tta_eval.json
    echo "q12 auto_scale+TTA:"; cat artifacts/q12_autoscale_tta_eval.json
    git add artifacts/q12_autoscale_tta_eval.json && \
      git commit -q -m "Max-quality configuration on q12: auto_scale + TTA on the cascade flagship" || true
  fi
fi

echo "=== queueV COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueV/COMPLETE
