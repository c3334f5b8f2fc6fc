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
mkdir -p runs/queueM runs/queueM3 runs/queueN runs/queueN2 runs/queueO \
         runs/queueP runs/queueQ runs/queueR runs/queueS runs/queueT runs/queueU \
         runs/queueV runs/queueW

# --- 1. marker reconstruction from committed artifacts -----------------------
# -s (non-empty), not -f: a failed step can leave a truncated/empty artifact
# behind, and reconstructing its marker from that would permanently skip the
# retry (bitten once: the 16:58 serve bench committed a 0-byte JSON after a
# TPU worker crash)
[ -s artifacts/q8r2_eval.json ] && touch runs/queueM/COMPLETE runs/queueM3/COMPLETE
[ -s artifacts/config3_demo_metrics.jsonl ] && touch runs/queueN/config3.done
[ -s artifacts/video_upconv_1080p.json ] && touch runs/queueN/video1080.done
[ -s artifacts/serve_bench_session11.json ] && touch runs/queueN/serve.done
if [ -f runs/queueN/config3.done ] && [ -f runs/queueN/video1080.done ] \
    && [ -f runs/queueN/serve.done ]; then
  touch runs/queueN/COMPLETE
fi
# q9's terminal evidence is its committed eval (the TTA step is optional
# polish; queueP/queueQ TTA the lineage best anyway)
[ -s artifacts/q9_eval.json ] && touch runs/queueO/COMPLETE
[ -s artifacts/verdict.json ] && touch runs/queueP/COMPLETE
if [ -s artifacts/q10_eval.json ] || [ -s artifacts/q10_eval_rejected.json ]; then
  touch runs/queueQ/COMPLETE
fi
[ -s artifacts/autoscale_eval.json ] && touch runs/queueR/auto.done
[ -s artifacts/autoscale_tta_eval.json ] && touch runs/queueR/autotta.done
if [ -f runs/queueR/auto.done ] && [ -f runs/queueR/autotta.done ]; then
  touch runs/queueR/COMPLETE
fi
if [ -s artifacts/q11_eval.json ] || [ -s artifacts/q11_eval_rejected.json ]; then
  touch runs/queueS/COMPLETE
fi
[ -s artifacts/video_upconv_1080p.json ] && touch runs/queueN2/video1080.done
[ -s artifacts/serve_bench_session11.json ] && touch runs/queueN2/serve.done
if [ -f runs/queueN2/video1080.done ] && [ -f runs/queueN2/serve.done ]; then
  touch runs/queueN2/COMPLETE
fi
# queueT (q12 cascade fine-tune): step-0 eval + the hardware gate both have
# committed terminal evidence (the wip npz only exists once training — which
# the gate precedes — has started)
[ -s artifacts/q11_cascade_untrained_eval.json ] && touch runs/queueT/eval0.done
[ -s artifacts/emavfi_q12_wip.npz ] && touch runs/queueT/gate.done
if [ -s artifacts/q12_eval.json ] || [ -s artifacts/q12_eval_rejected.json ]; then
  touch runs/queueT/COMPLETE
fi
[ -s artifacts/serve_bench_session15.json ] && touch runs/queueU/serve.done
# queueV (q12 inference-time quality adjudication)
[ -s artifacts/q12_tta_eval.json ] && touch runs/queueV/tta.done
[ -s artifacts/q12_autoscale_eval.json ] && touch runs/queueV/auto.done
[ -s artifacts/q12_autoscale_tta_eval.json ] && touch runs/queueV/autotta.done
if [ -f runs/queueV/tta.done ] && [ -f runs/queueV/auto.done ] \
    && [ -f runs/queueV/autotta.done ]; then
  touch runs/queueV/COMPLETE
fi
# queueW (q13 fuse_project fine-tune)
[ -s artifacts/emavfi_q13_wip.npz ] && touch runs/queueW/gate.done
if [ -s artifacts/q13_eval.json ] || [ -s artifacts/q13_eval_rejected.json ]; then
  touch runs/queueW/q13.done runs/queueW/eval.done runs/queueW/COMPLETE
fi
# queueX (round-3 proof chain): every step's terminal artifact is committed
mkdir -p runs/queueX
[ -s artifacts/v5_probe.log ] && touch runs/queueX/v5probe.done
[ -s artifacts/v5_bench.log ] && touch runs/queueX/v5bench.done
[ -s artifacts/tpu_smoke.json ] && touch runs/queueX/smoke.done
[ -s artifacts/bench_r3_sweep.json ] && touch runs/queueX/bench.done
[ -s artifacts/video_upconv_1080p_r3.json ] && touch runs/queueX/video1080.done
[ -s artifacts/video_upconv_4k_r3.json ] && touch runs/queueX/video4k.done
[ -s artifacts/serve_bench_lb2.json ] && touch runs/queueX/serveab.done
if [ -f runs/queueX/smoke.done ] && [ -f runs/queueX/bench.done ] \
    && [ -f runs/queueX/video1080.done ] && [ -f runs/queueX/video4k.done ] \
    && [ -f runs/queueX/serveab.done ]; then
  touch runs/queueX/COMPLETE
fi

# exact argv match ("bash tools/<q>.sh"): a loose substring grep would
# count an editor/less/tail holding the script open as "running" and
# silently skip the relaunch this script exists to perform
running() { ps -eo args= | awk -v s="tools/$1.sh" '$1=="bash" && $2==s {found=1} END {exit !found}'; }
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
elif [ ! -f runs/queueT/COMPLETE ]; then
  if running queueT; then echo "queueT already running"; else launch queueT; fi
elif [ ! -f runs/queueV/COMPLETE ]; then
  if running queueV; then echo "queueV already running"; else launch queueV; fi
elif [ ! -f runs/queueW/COMPLETE ]; then
  if running queueW; then echo "queueW already running"; else launch queueW; fi
else
  echo "TPU stages complete"
fi

# --- 3. marker-pollers ---------------------------------------------------------
for q in queueP queueQ queueR queueN2 queueS queueU queueV; do
  if [ -f "runs/$q/COMPLETE" ]; then
    echo "$q complete"
  elif running "$q"; then
    echo "$q already running"
  else
    launch "$q"
  fi
done
