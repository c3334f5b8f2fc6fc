#!/bin/bash
# Round-3 proof chain (VERDICT r2 #2/#3/#4 + v5 kernel adjudication), run
# uncontended after queueV. Serial steps, each idempotent via markers:
#
#   1. v5 kernel lowering bisection (bounded per stage) + v4-vs-v5
#      microbench if the full stage lowers.
#   2. tpu-smoke: all 6 cases (incl. dcn_v5 + full-model 720p composition).
#   3. bench.py full b2-b16 sweep (engine-parity HBM guard) -> artifact.
#   4. 1080p and 4K video demos to completion on hardware.
#   5. Serving launch-batch-2 A/B (transport-vs-bandwidth adjudication).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueX
LOG=runs/queueX/queueX.log
exec >>"$LOG" 2>&1
echo "=== queueX start $(date -u +%FT%TZ) ==="

queueV_running() {
  for f in /proc/[0-9]*/cmdline; do
    tr '\0' ' ' < "$f" 2>/dev/null | grep -q "tools/queueV.sh" && return 0
  done
  return 1
}
for i in $(seq 1 360); do
  [ -f runs/queueV/COMPLETE ] && break
  queueV_running || { echo "queueV gone without COMPLETE - proceeding $(date -u +%FT%TZ)"; break; }
  sleep 60
done

commit_retry() {
  local msg="$1"; shift
  for a in 1 2 3 4 5; do
    if git add -f "$@" && git commit -q -m "$msg"; then return 0; fi
    sleep $((a * 5))
  done
  echo "COMMIT FAILED after retries: $msg"
  return 1
}

# --- step 1: v5 kernel probe --------------------------------------------------
if [ ! -f runs/queueX/v5probe.done ]; then
  bash tools/v5_probe.sh 67 "empty dma noblend nodot full" \
    > runs/queueX/v5_probe.log 2>&1
  cp runs/queueX/v5_probe.log artifacts/v5_probe.log
  cat runs/queueX/v5_probe.log
  touch runs/queueX/v5probe.done
  commit_retry "v5 kernel hardware lowering probe (bisection log)" artifacts/v5_probe.log
fi
# microbench v4 vs v5 only if the full stage lowered
if grep -q "stage full: ok" runs/queueX/v5_probe.log 2>/dev/null \
    && [ ! -f runs/queueX/v5bench.done ]; then
  timeout 2400 python tools/bench_kernels.py --size 720p --channels 67 \
    --kernels v4,v5 --iters 8 > runs/queueX/v5_bench_67.log 2>&1
  timeout 2400 python tools/bench_kernels.py --size 720p --channels 64 \
    --kernels v4,v5 --iters 8 > runs/queueX/v5_bench_64.log 2>&1
  cat runs/queueX/v5_bench_67.log runs/queueX/v5_bench_64.log \
    > artifacts/v5_bench.log
  cat artifacts/v5_bench.log
  touch runs/queueX/v5bench.done
  commit_retry "v4-vs-v5 DCN kernel microbench at 67/64 channels (720p)" artifacts/v5_bench.log
fi

# --- step 2: tpu-smoke (6 cases) ---------------------------------------------
if [ ! -f runs/queueX/smoke.done ]; then
  timeout 5400 python tools/tpu_smoke.py && touch runs/queueX/smoke.done
  if [ -s artifacts/tpu_smoke.json ]; then
    commit_retry "tpu-smoke: 6-case hardware kernel+composition verdict" artifacts/tpu_smoke.json
  fi
fi

# --- step 3: bench full sweep -------------------------------------------------
if [ ! -f runs/queueX/bench.done ]; then
  timeout 3600 python bench.py > runs/queueX/bench.json 2> runs/queueX/bench.log
  if [ -s runs/queueX/bench.json ]; then
    cp runs/queueX/bench.json artifacts/bench_r3_sweep.json
    cp runs/queueX/bench.log artifacts/bench_r3_sweep.log
    cat runs/queueX/bench.log runs/queueX/bench.json
    touch runs/queueX/bench.done
    commit_retry "bench.py full b2-b16 sweep (engine-parity HBM guard)" \
      artifacts/bench_r3_sweep.json artifacts/bench_r3_sweep.log
  fi
fi

# --- step 4: 1080p + 4K demos -------------------------------------------------
if [ ! -f runs/queueX/video1080.done ]; then
  timeout 3600 python tools/video_demo.py \
    --height 1080 --width 1920 --frames 24 --fps 15 --target_fps 60 \
    --model_path artifacts/emavfi_q12_best.npz \
    --flow_model artifacts/emavfi_q12_best.flow.npz \
    --out_json artifacts/video_upconv_1080p_r3.json \
    && touch runs/queueX/video1080.done
  if [ -s artifacts/video_upconv_1080p_r3.json ]; then
    echo "1080p demo:"; cat artifacts/video_upconv_1080p_r3.json
    commit_retry "1080p video demo to completion (engine HBM guard, shipped flagship)" \
      artifacts/video_upconv_1080p_r3.json
  fi
fi
if [ ! -f runs/queueX/video4k.done ]; then
  timeout 5400 python tools/video_demo.py \
    --height 2160 --width 3840 --frames 12 --fps 15 --target_fps 30 \
    --model_path artifacts/emavfi_q12_best.npz \
    --flow_model artifacts/emavfi_q12_best.flow.npz \
    --out_json artifacts/video_upconv_4k_r3.json \
    && touch runs/queueX/video4k.done
  if [ -s artifacts/video_upconv_4k_r3.json ]; then
    echo "4K demo:"; cat artifacts/video_upconv_4k_r3.json
    commit_retry "4K video demo to completion (reference capability inference.py:156-205, engine-guarded)" \
      artifacts/video_upconv_4k_r3.json
  fi
fi

# --- step 5: serving launch-batch-2 A/B --------------------------------------
if [ ! -f runs/queueX/serveab.done ]; then
  timeout 3600 python tools/bench_serve.py --inprocess --raw --use_pallas \
    --model_path artifacts/emavfi_q2_best.npz --size 720x1280 \
    --clients 16 --requests 64 --max_px_per_launch 1900000 \
    > runs/queueX/serve_lb2.json \
    && touch runs/queueX/serveab.done
  if [ -s runs/queueX/serve_lb2.json ]; then
    cp runs/queueX/serve_lb2.json artifacts/serve_bench_lb2.json
    echo "serve A/B (launch batch 2):"; cat artifacts/serve_bench_lb2.json
    commit_retry "Serve launch-batch-2 A/B (transport fixed-cost vs bandwidth adjudication)" \
      artifacts/serve_bench_lb2.json
  fi
fi

if [ -f runs/queueX/v5probe.done ] && [ -f runs/queueX/smoke.done ] \
    && [ -f runs/queueX/bench.done ] && [ -f runs/queueX/video1080.done ] \
    && [ -f runs/queueX/video4k.done ] && [ -f runs/queueX/serveab.done ]; then
  echo "=== queueX COMPLETE $(date -u +%FT%TZ) ==="
  touch runs/queueX/COMPLETE
else
  echo "=== queueX INCOMPLETE $(date -u +%FT%TZ) (missing step markers) ==="
fi
