#!/bin/bash
# Round-2 session-12 chain: full-val TPU adjudication of scale-adaptive
# inference (docs/PERFORMANCE.md "Scale-adaptive inference") on the final
# flagship, plus the maximal-quality headline (auto_scale + TTA).
#
#   0. Wait for runs/queueQ/COMPLETE (terminal marker of the session-12
#      chain: queueO -> queueN -> queueP -> queueQ).
#   1. Pick the best available checkpoint by native-res mean_psnr.
#   2. eval --auto_scale 7.5              -> artifacts/autoscale_eval.json
#   3. eval --auto_scale 7.5 --tta        -> artifacts/autoscale_tta_eval.json
# Idempotent via step markers in runs/queueR/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueR
LOG=runs/queueR/queueR.log
exec >>"$LOG" 2>&1
echo "=== queueR start $(date -u +%FT%TZ) ==="

for i in $(seq 1 600); do   # up to 10 h
  [ -f runs/queueQ/COMPLETE ] && break
  sleep 60
done
if [ ! -f runs/queueQ/COMPLETE ]; then
  echo "queueQ never completed - aborting queueR"; exit 1
fi
echo "queueQ complete, proceeding $(date -u +%FT%TZ)"

BEST=$(python - <<'EOF'
import json, os
cands = []
for r, npz in (("q8r2", "artifacts/emavfi_q8r2_best.npz"),
               ("q9", "artifacts/emavfi_q9_best.npz"),
               ("soup", "artifacts/emavfi_soup_best.npz"),
               ("q10", "artifacts/emavfi_q10_best.npz")):
    ev = {"soup": "artifacts/soup_eval.json"}.get(r, f"artifacts/{r}_eval.json")
    if os.path.exists(ev) and os.path.exists(npz) \
            and os.path.exists(npz.replace(".npz", ".flow.npz")):
        cands.append((json.load(open(ev))["mean_psnr"], npz))
cands.sort(reverse=True)
print(cands[0][1] if cands else "")
EOF
)
if [ -z "$BEST" ]; then echo "no flagship found - aborting"; exit 1; fi
BESTF="${BEST%.npz}.flow.npz"
echo "auto-scale adjudication on: $BEST"

if [ ! -f runs/queueR/auto.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path "$BEST" --flow_model "$BESTF" --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas \
    --auto_scale 7.5 --json > runs/queueR/autoscale_eval.json \
    && touch runs/queueR/auto.done
fi
# commit only on success: an unguarded cp after a failed/timed-out eval
# would commit a truncated artifact that relaunch_chains.sh then reads as
# step-complete, permanently skipping the retry
if [ -f runs/queueR/auto.done ] && [ ! -f artifacts/autoscale_eval.json ]; then
  echo "auto-scale eval:"; cat runs/queueR/autoscale_eval.json
  cp runs/queueR/autoscale_eval.json artifacts/autoscale_eval.json \
    && git add artifacts/autoscale_eval.json \
    && git commit -q -m "Full-val eval of scale-adaptive inference (auto_scale 7.5) on the flagship" || true
fi

if [ ! -f runs/queueR/autotta.done ]; then
  timeout 7200 python eval.py --data-dir data/processed/val \
    --model_path "$BEST" --flow_model "$BESTF" --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas \
    --auto_scale 7.5 --tta --json > runs/queueR/autoscale_tta_eval.json \
    && touch runs/queueR/autotta.done
fi
if [ -f runs/queueR/autotta.done ] && [ ! -f artifacts/autoscale_tta_eval.json ]; then
  echo "auto-scale + TTA eval:"; cat runs/queueR/autoscale_tta_eval.json
  cp runs/queueR/autoscale_tta_eval.json artifacts/autoscale_tta_eval.json \
    && git add artifacts/autoscale_tta_eval.json \
    && git commit -q -m "Full-val eval of auto_scale + TTA (maximal inference-time quality)" || true
fi

echo "=== queueR COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueR/COMPLETE
