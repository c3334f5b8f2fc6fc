#!/bin/bash
# Re-run the two queueN demo steps that died when the 1080p video demo
# crashed the TPU worker (kernel fault, runs/queueN/queueN.log 16:39-16:56):
# the 1080p upconversion artifact and the serving bench. Scheduled between
# queueR and queueS so a repeat crash costs minutes, not a training run.
#
# Mitigations vs the crashed attempt: batch_pairs 2 (halves peak HBM at
# 1080p x flow-prior), explicit dcn_tile_w 256 (the column-tiled kernel's
# working set is far smaller at 1920-wide), q9 weights.
# Serve bench runs FIRST (proven-safe config); the 1080p demo — the step
# that crashed the TPU worker — runs last so a repeat crash cannot take
# the serve bench down with it.
# Idempotent via step markers in runs/queueN2/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueN2
LOG=runs/queueN2/queueN2.log
exec >>"$LOG" 2>&1
echo "=== queueN2 start $(date -u +%FT%TZ) ==="

for i in $(seq 1 600); do   # up to 10 h
  [ -f runs/queueR/COMPLETE ] && break
  sleep 60
done
if [ ! -f runs/queueR/COMPLETE ]; then
  echo "queueR never completed - aborting queueN2"; exit 1
fi
echo "queueR complete, proceeding $(date -u +%FT%TZ)"

if [ ! -f runs/queueN2/serve.done ]; then
  timeout 3600 python tools/bench_serve.py --inprocess --raw --use_pallas \
    --model_path artifacts/emavfi_q2_best.npz --size 720x1280 \
    --clients 16 --requests 64 > runs/queueN2/serve_bench.json \
    && touch runs/queueN2/serve.done
  if [ -f runs/queueN2/serve.done ] && [ -s runs/queueN2/serve_bench.json ]; then
    cp runs/queueN2/serve_bench.json artifacts/serve_bench_session11.json
    echo "serve bench:"; cat artifacts/serve_bench_session11.json
    git add artifacts/serve_bench_session11.json && \
      git commit -q -m "Serving bench on current toolchain (720p raw, in-process; re-run)" || true
  else
    echo "serve bench failed again - leaving unmarked for a future retry"
  fi
fi

if [ ! -f runs/queueN2/video1080.done ]; then
  timeout 3600 python tools/video_demo.py \
    --height 1080 --width 1920 --frames 24 --fps 15 --target_fps 60 \
    --model_path artifacts/emavfi_q9_best.npz \
    --flow_model artifacts/emavfi_q9_best.flow.npz \
    --batch_pairs 2 --dcn_tile_w 256 \
    --out_json artifacts/video_upconv_1080p.json \
    && touch runs/queueN2/video1080.done
  if [ -f runs/queueN2/video1080.done ] && [ -s artifacts/video_upconv_1080p.json ]; then
    echo "1080p demo:"; cat artifacts/video_upconv_1080p.json
    git add artifacts/video_upconv_1080p.json && \
      git commit -q -m "BASELINE config-4 demo: 1080p clip upconversion artifact (re-run)" || true
  else
    echo "1080p demo failed again - leaving unmarked for a future retry"
  fi
fi

echo "=== queueN2 COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueN2/COMPLETE
