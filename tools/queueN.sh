#!/bin/bash
# Round-2 session-11 chain #2: north-star config demos, after queueM.
#
#   0. Wait for runs/queueM/COMPLETE.
#   1. BASELINE config-3 exact demo: batch 16, 256^2 crops, the full
#      5-term loss stack (shipped reference YAML semantics; temporal term
#      live via the jointly-trained flow estimator), 4 bounded epochs on
#      hardware via accum_steps 8 (microbatch 2). Artifact: the per-epoch
#      metrics lines, committed. Our quality runs used effective batch 8;
#      this pins the "batch 16" config verbatim.
#   2. BASELINE config-4 demo: synthesize a 1080p 15-fps clip, run
#      `infer.py video` 2x->4x (target 60 fps, scale 1.0, Pallas kernels,
#      flow-prior flagship), record wall-clock fps + output frame count.
#   3. Serving re-bench on the current toolchain (in-process, 720p, raw
#      protocol, Pallas) to refresh the session-8 1.515 req/s artifact.
# Idempotent via step markers in runs/queueN/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueN
LOG=runs/queueN/queueN.log
exec >>"$LOG" 2>&1
echo "=== queueN start $(date -u +%FT%TZ) ==="

# --- step 0: wait for queueM ---------------------------------------------------
for i in $(seq 1 600); do   # up to 10 h
  [ -f runs/queueM/COMPLETE ] && break
  sleep 60
done
if [ ! -f runs/queueM/COMPLETE ]; then
  echo "queueM never completed - aborting queueN"; exit 1
fi
echo "queueM complete, proceeding $(date -u +%FT%TZ)"

# --- step 1: config-3 exact demo (batch 16, 256^2, 5-term loss) ----------------
if [ ! -f runs/queueN/config3.done ]; then
  timeout 3600 python train.py --config config/train_config.yaml \
    --batch_size 16 --accum_steps 8 --remat true --use_pallas true \
    --num-epochs 4 \
    --checkpoint_path runs/config3/ckpt --best_model_path runs/config3/best \
    && touch runs/queueN/config3.done
  if [ -f runs/queueN/config3.done ] && [ -s runs/config3/ckpt/metrics.jsonl ]; then
    cp runs/config3/ckpt/metrics.jsonl artifacts/config3_demo_metrics.jsonl
    git add artifacts/config3_demo_metrics.jsonl && \
      git commit -q -m "BASELINE config-3 demo: batch 16, 256^2, full 5-term loss on hardware" || true
  fi
fi

# --- step 2: config-4 demo (1080p clip 2x->4x upconversion) --------------------
if [ ! -f runs/queueN/video1080.done ]; then
  timeout 3600 python tools/video_demo.py \
    --height 1080 --width 1920 --frames 24 --fps 15 --target_fps 60 \
    --model_path artifacts/emavfi_q7_best.npz \
    --flow_model artifacts/emavfi_q7_best.flow.npz \
    --out_json artifacts/video_upconv_1080p.json \
    && touch runs/queueN/video1080.done
  if [ -f runs/queueN/video1080.done ] && [ -s artifacts/video_upconv_1080p.json ]; then
    echo "1080p demo:"; cat artifacts/video_upconv_1080p.json
    git add artifacts/video_upconv_1080p.json && \
      git commit -q -m "BASELINE config-4 demo: 1080p clip 2x->4x upconversion artifact" || true
  fi
fi

# --- step 3: serving re-bench ---------------------------------------------------
if [ ! -f runs/queueN/serve.done ]; then
  timeout 3600 python tools/bench_serve.py --inprocess --raw --use_pallas \
    --model_path artifacts/emavfi_q2_best.npz --size 720x1280 \
    --clients 16 --requests 64 > runs/queueN/serve_bench.json \
    && touch runs/queueN/serve.done
  if [ -f runs/queueN/serve.done ] && [ -s runs/queueN/serve_bench.json ]; then
    cp runs/queueN/serve_bench.json artifacts/serve_bench_session11.json
    echo "serve bench:"; cat artifacts/serve_bench_session11.json
    git add artifacts/serve_bench_session11.json && \
      git commit -q -m "Serving re-bench on current toolchain (720p raw, in-process)" || true
  fi
fi

echo "=== queueN COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueN/COMPLETE
