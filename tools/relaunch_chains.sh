#!/bin/bash
# Recover the session-12 background chain after a VM/driver restart.
#
# A restart kills every chain process and deletes the untracked runs/
# tree (including the step markers the chains use for idempotence) —
# this round has eaten that failure three times. This script makes
# recovery one command:
#
#   1. Reconstructs the wiped gate markers from git-tracked artifact
#      evidence (each chain step commits its terminal artifact, so the
#      markers are derivable).
#   2. Launches the earliest incomplete TPU stage (queueO execs queueN
#      at its end, so never both), plus the pure marker-pollers
#      (queueP, queueQ) — each only if no instance is already running.
#
# Safe to run at any time, including while chains are healthy: every
# launch is guarded by a COMPLETE check and a process check, and the
# chain scripts themselves are idempotent via step markers.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueM runs/queueM3 runs/queueN runs/queueO runs/queueP \
         runs/queueQ runs/queueR runs/queueS

# --- 1. marker reconstruction from committed artifacts -----------------------
[ -f artifacts/q8r2_eval.json ] && touch runs/queueM/COMPLETE runs/queueM3/COMPLETE
[ -f artifacts/config3_demo_metrics.jsonl ] && touch runs/queueN/config3.done
[ -f artifacts/video_upconv_1080p.json ] && touch runs/queueN/video1080.done
[ -f artifacts/serve_bench_session11.json ] && touch runs/queueN/serve.done
if [ -f runs/queueN/config3.done ] && [ -f runs/queueN/video1080.done ] \
    && [ -f runs/queueN/serve.done ]; then
  touch runs/queueN/COMPLETE
fi
# q9's terminal evidence is its committed eval (the TTA step is optional
# polish; queueP/queueQ TTA the lineage best anyway)
[ -f artifacts/q9_eval.json ] && touch runs/queueO/COMPLETE
[ -f artifacts/verdict.json ] && touch runs/queueP/COMPLETE
if [ -f artifacts/q10_eval.json ] || [ -f artifacts/q10_eval_rejected.json ]; then
  touch runs/queueQ/COMPLETE
fi
[ -f artifacts/autoscale_eval.json ] && touch runs/queueR/auto.done
[ -f artifacts/autoscale_tta_eval.json ] && touch runs/queueR/autotta.done
if [ -f runs/queueR/auto.done ] && [ -f runs/queueR/autotta.done ]; then
  touch runs/queueR/COMPLETE
fi
if [ -f artifacts/q11_eval.json ] || [ -f artifacts/q11_eval_rejected.json ]; then
  touch runs/queueS/COMPLETE
fi

running() { ps -o args= -e | grep -v grep | grep -qF "tools/$1.sh"; }
launch() {
  nohup setsid bash "tools/$1.sh" >/dev/null 2>&1 &
  echo "$!" > "/tmp/$1.pid"
  echo "relaunched $1 (pid $!)"
}

# --- 2. earliest incomplete TPU stage ----------------------------------------
if [ ! -f runs/queueO/COMPLETE ]; then
  if running queueO || running queueN; then
    echo "queueO stage already running"
  else
    launch queueO   # re-gates, warm-starts q9 from the watcher-secured wip
  fi
elif [ ! -f runs/queueN/COMPLETE ]; then
  if running queueN; then echo "queueN already running"; else launch queueN; fi
else
  echo "TPU stages complete"
fi

# --- 3. marker-pollers ---------------------------------------------------------
for q in queueP queueQ queueR queueS; do
  if [ -f "runs/$q/COMPLETE" ]; then
    echo "$q complete"
  elif running "$q"; then
    echo "$q already running"
  else
    launch "$q"
  fi
done
