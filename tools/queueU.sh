#!/bin/bash
# Session-15 follow-up chain: runs after queueT (the q12 cascade
# fine-tune) releases the TPU.
#
#   1. Uncontended serve re-bench (720p raw, q2, HBM-guard defaults): the
#      22:08 session-14 reading of 0.468 req/s is 3.2x below the 1.515 on
#      record (PERFORMANCE.md "Serving") and was possibly contended or on
#      a sick worker — adjudicate before believing either number.
#   2. Fresh tpu-smoke (now retries relay timeouts once); committed
#      whatever the outcome — the JSON records flakiness honestly.
# Idempotent via step markers in runs/queueU/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueU
LOG=runs/queueU/queueU.log
exec >>"$LOG" 2>&1
echo "=== queueU start $(date -u +%FT%TZ) ==="

for i in $(seq 1 660); do   # up to 11 h
  [ -f runs/queueT/COMPLETE ] && break
  sleep 60
done
if [ ! -f runs/queueT/COMPLETE ]; then
  echo "queueT never completed - aborting queueU"; exit 1
fi
echo "queueT complete, proceeding $(date -u +%FT%TZ)"

if [ ! -f runs/queueU/serve.done ]; then
  timeout 3600 python tools/bench_serve.py --inprocess --raw --use_pallas \
    --model_path artifacts/emavfi_q2_best.npz --size 720x1280 \
    --clients 16 --requests 64 > runs/queueU/serve_bench.json \
    && touch runs/queueU/serve.done
  if [ -f runs/queueU/serve.done ] && [ -s runs/queueU/serve_bench.json ]; then
    cp runs/queueU/serve_bench.json artifacts/serve_bench_session15.json
    echo "serve bench:"; cat artifacts/serve_bench_session15.json
    git add artifacts/serve_bench_session15.json && \
      git commit -q -m "Serving re-bench, uncontended (720p raw, HBM-guard launch batch)" || true
  else
    echo "serve bench failed - leaving unmarked for retry"
  fi
fi

if [ ! -f runs/queueU/smoke.done ]; then
  timeout 4200 python tools/tpu_smoke.py && touch runs/queueU/smoke.done
  # commit the artifact either way: a flaky-relay record with the retry
  # flag is evidence, not noise
  git add artifacts/tpu_smoke.json && \
    git commit -q -m "tpu-smoke on current toolchain (with timeout retry)" || true
fi

echo "=== queueU COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueU/COMPLETE
