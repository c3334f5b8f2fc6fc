#!/bin/bash
# Checkpoint-securing watcher: periodically copies a training run's
# best-so-far exported params npz into git-tracked artifacts/ and commits,
# so a VM restart (which wipes everything untracked, incl. runs/) cannot
# lose more than one polling interval of quality progress.
#
# Usage: tools/ckpt_watcher.sh <run_name> <best_path_prefix> [interval_s]
#   e.g. tools/ckpt_watcher.sh q5 runs/q5/best 600
# Secures <best_path_prefix>.npz -> artifacts/emavfi_<run_name>_wip.npz
# (and .flow.npz alongside when present). Commits only when the best file
# actually changed (the trainer only rewrites it on val improvement).
set -u
RUN="$1"; BEST="$2"; INTERVAL="${3:-600}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DST="$REPO/artifacts/emavfi_${RUN}_wip.npz"
DSTF="$REPO/artifacts/emavfi_${RUN}_wip.flow.npz"
cd "$REPO"
while true; do
  sleep "$INTERVAL"
  if [ -f "$BEST.npz" ]; then
    if ! cmp -s "$BEST.npz" "$DST" 2>/dev/null; then
      cp "$BEST.npz" "$DST"
      [ -f "$BEST.flow.npz" ] && cp "$BEST.flow.npz" "$DSTF"
      # The trainer rewrites best.npz then best.flow.npz (atomic renames,
      # utils/convert.py save_params_npz). If a rewrite landed between the
      # two copies the pair would mix epochs — re-compare both and defer to
      # the next interval instead of committing a mismatched pair.
      if ! cmp -s "$BEST.npz" "$DST"; then continue; fi
      if [ -f "$BEST.flow.npz" ] && ! cmp -s "$BEST.flow.npz" "$DSTF"; then continue; fi
      git add -f "$DST" "$DSTF" 2>/dev/null
      git commit -q -m "Secure ${RUN} in-progress best checkpoint (watcher)" \
        -- "$DST" "$DSTF" 2>/dev/null || true
    fi
  fi
done
