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

# ADVICE r2: also stop waiting when the queueU process is gone (its COMPLETE
# will then never appear), and flag contention loudly if we ever proceed
# while it is still running.
queueU_running() {
  for f in /proc/[0-9]*/cmdline; do
    tr '\0' ' ' < "$f" 2>/dev/null | grep -q "tools/queueU.sh" && return 0
  done
  return 1
}
for i in $(seq 1 240); do   # up to 4 h
  [ -f runs/queueU/COMPLETE ] && break
  queueU_running || { echo "queueU process gone without COMPLETE - chip free, proceeding $(date -u +%FT%TZ)"; break; }
  sleep 60
done
if [ ! -f runs/queueU/COMPLETE ] && queueU_running; then
  echo "WARNING: CONTENDED - queueU still running; wall-times in this log are unreliable"
fi

# ADVICE r2: a detached chain can lose a commit to an index.lock race; retry
# with backoff and shout instead of swallowing the failure.
commit_retry() {  # commit_retry <msg> <file>...
  local msg="$1"; shift
  for a in 1 2 3 4 5; do
    if git add "$@" && git commit -q -m "$msg"; then return 0; fi
    sleep $((a * 5))
  done
  echo "COMMIT FAILED after retries: $msg"
  return 1
}

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
    commit_retry "TTA eval of the q12 cascade flagship" artifacts/q12_tta_eval.json
  fi
fi

if [ ! -f runs/queueV/auto.done ]; then
  timeout 7200 python eval.py $COMMON --auto_scale 7.5 \
    > runs/queueV/q12_autoscale_eval.json && touch runs/queueV/auto.done
  if [ -f runs/queueV/auto.done ] && [ -s runs/queueV/q12_autoscale_eval.json ]; then
    cp runs/queueV/q12_autoscale_eval.json artifacts/q12_autoscale_eval.json
    echo "q12 auto_scale:"; cat artifacts/q12_autoscale_eval.json
    commit_retry "auto_scale 7.5 composed with the q12 cascade (large-motion lever overlap test)" artifacts/q12_autoscale_eval.json
  fi
fi

if [ ! -f runs/queueV/autotta.done ]; then
  timeout 10800 python eval.py $COMMON --auto_scale 7.5 --tta \
    > runs/queueV/q12_autoscale_tta_eval.json && touch runs/queueV/autotta.done
  if [ -f runs/queueV/autotta.done ] && [ -s runs/queueV/q12_autoscale_tta_eval.json ]; then
    cp runs/queueV/q12_autoscale_tta_eval.json artifacts/q12_autoscale_tta_eval.json
    echo "q12 auto_scale+TTA:"; cat artifacts/q12_autoscale_tta_eval.json
    commit_retry "Max-quality configuration on q12: auto_scale + TTA on the cascade flagship" artifacts/q12_autoscale_tta_eval.json
  fi
fi

# ADVICE r2: only declare COMPLETE when every step's marker exists, so a
# relaunch retries a timed-out step instead of abandoning the adjudication.
if [ -f runs/queueV/tta.done ] && [ -f runs/queueV/auto.done ] && [ -f runs/queueV/autotta.done ]; then
  echo "=== queueV COMPLETE $(date -u +%FT%TZ) ==="
  touch runs/queueV/COMPLETE
else
  echo "=== queueV INCOMPLETE $(date -u +%FT%TZ) (missing step markers; relaunch will retry) ==="
fi
