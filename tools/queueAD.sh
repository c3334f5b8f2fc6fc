#!/bin/bash
# Round-5 chain AD: train-step compile bisect (VERDICT r4 #4), TPU target.
# Waits until queueAC reaches its eval tail (qr1 TTA launch marker) so the
# bounded compile probes only share the remote-compile relay with cached
# eval graphs, not with AC's timing-sensitive kernel benches.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueAD
LOG=runs/queueAD/queueAD.log
exec >>"$LOG" 2>&1
echo "=== queueAD start $(date -u +%FT%TZ) ==="

for i in $(seq 1 720); do  # up to 6h
  if [ -f runs/queueAC/qr1_tta.json ] || [ -f runs/queueAC/COMPLETE ]; then
    break
  fi
  sleep 30
done
echo "=== gate passed $(date -u +%FT%TZ) ==="

if [ ! -f artifacts/train_compile_bisect.jsonl ]; then
  timeout -k 5 14400 python tools/train_step_compile_bisect.py --timeout 1500
  if [ -s artifacts/train_compile_bisect.jsonl ]; then
    for a in 1 2 3 4 5; do
      if git add -f artifacts/train_compile_bisect.jsonl \
         && git commit -q -m "Train-step compile-time bisect ladder on TPU toolchain (VERDICT r4 #4)"; then
        break
      fi
      sleep $((a * 5))
    done
  fi
fi

echo "=== queueAD COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueAD/COMPLETE
