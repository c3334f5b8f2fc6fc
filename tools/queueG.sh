#!/bin/bash
# Round-2 session-8 TPU job chain: runs AFTER queueF (waits on its
# COMPLETE marker) so the single chip is never contended.
#
#   1. Online-serving hardware benchmark (tools/bench_serve.py --inprocess,
#      shape-bucketed micro-batching server): 720p and 1080p, 16 closed-loop
#      clients — the numbers docs/PERFORMANCE.md has been missing for the
#      serve/ subsystem.
#   2. Headline bench refresh (bench.py) so the round-end number is fresh.
#
# Idempotent: each step writes runs/queueG/<step>.done; rerun after a VM
# restart. Serve benches use the plain-EMAVFI flagship weights (q2) because
# the serving path is the non-flow-prior production config (bench.py
# rationale: apples-to-apples with the reference's model graph).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueG
LOG=runs/queueG/queueG.log
exec >>"$LOG" 2>&1
echo "=== queueG waiting for queueF $(date -u +%FT%TZ) ==="
while [ ! -f runs/queueF/COMPLETE ]; do sleep 120; done
echo "=== queueG start $(date -u +%FT%TZ) ==="

if [ ! -f runs/queueG/serve720.done ]; then
  timeout 3600 python tools/bench_serve.py --inprocess \
    --model_path artifacts/emavfi_q2_best.npz \
    --size 720x1280 --clients 16 --requests 64 --max_batch 8 \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas \
    > runs/queueG/serve_720p.json && touch runs/queueG/serve720.done
  echo "serve 720p:"; cat runs/queueG/serve_720p.json
fi

if [ ! -f runs/queueG/serve1080.done ]; then
  timeout 3600 python tools/bench_serve.py --inprocess \
    --model_path artifacts/emavfi_q2_best.npz \
    --size 1080x1920 --clients 8 --requests 32 --max_batch 4 \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas \
    > runs/queueG/serve_1080p.json && touch runs/queueG/serve1080.done
  echo "serve 1080p:"; cat runs/queueG/serve_1080p.json
fi

if [ ! -f runs/queueG/bench.done ]; then
  timeout 3600 python bench.py > runs/queueG/bench.json \
    && touch runs/queueG/bench.done
  echo "headline bench:"; cat runs/queueG/bench.json
fi

echo "=== queueG COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueG/COMPLETE
