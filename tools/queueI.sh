#!/bin/bash
# Round-2 session-8 TPU job chain #4: runs AFTER queueH (q6 train + eval).
#
#   1. Headline-bench checkpoint ablation: the round-2 headline moved
#      6.94 -> 6.10 frames/s when bench.py's preferred checkpoint switched
#      from the round-1 long2 weights to q2 (the bounded-shift DCN cost is
#      offset-data-dependent — docs/PERFORMANCE.md "Bench honesty").
#      Re-measure BOTH on the same toolchain/day to attribute the delta to
#      the checkpoint, not an environment regression.
#   2. Fresh default headline bench for the round record.
# Idempotent via step markers in runs/queueI/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueI
LOG=runs/queueI/queueI.log
exec >>"$LOG" 2>&1
echo "=== queueI waiting for queueH $(date -u +%FT%TZ) ==="
while [ ! -f runs/queueH/COMPLETE ]; do sleep 120; done
echo "=== queueI start $(date -u +%FT%TZ) ==="

if [ ! -f runs/queueI/benchlong2.done ]; then
  timeout 3600 python bench.py --ckpt artifacts/emavfi_long2_best.npz \
    > runs/queueI/bench_long2.json && touch runs/queueI/benchlong2.done
  echo "bench long2:"; cat runs/queueI/bench_long2.json
fi

if [ ! -f runs/queueI/benchq2.done ]; then
  timeout 3600 python bench.py --ckpt artifacts/emavfi_q2_best.npz \
    > runs/queueI/bench_q2.json && touch runs/queueI/benchq2.done
  echo "bench q2:"; cat runs/queueI/bench_q2.json
fi

echo "=== queueI COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueI/COMPLETE
