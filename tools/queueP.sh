#!/bin/bash
# Round-2 session-12 chain: model-soup pass over the fine-tune lineage.
#
#   0. Wait for runs/queueN/COMPLETE (queueO execs queueN last, so this is
#      the terminal marker of the session-11 chain).
#   1. Uniform-average the available flow-prior flagship checkpoints
#      (tools/make_soup.py; Wortsman et al. soups — the lineage is
#      successive fine-tunes, i.e. one basin): soup_all over every
#      ingredient with an eval JSON, soup_top2 over the two best.
#   2. Native-res eval of each soup on hardware.
#   3. If a soup beats the best individual checkpoint: secure it as
#      artifacts/emavfi_soup_best.npz (+eval) and TTA it.
# Idempotent via step markers in runs/queueP/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueP
LOG=runs/queueP/queueP.log
exec >>"$LOG" 2>&1
echo "=== queueP start $(date -u +%FT%TZ) ==="

# --- step 0: wait for queueN ----------------------------------------------------
for i in $(seq 1 420); do   # up to 7 h
  [ -f runs/queueN/COMPLETE ] && break
  sleep 60
done
if [ ! -f runs/queueN/COMPLETE ]; then
  echo "queueN never completed - aborting queueP"; exit 1
fi
echo "queueN complete, proceeding $(date -u +%FT%TZ)"

# --- step 1: build soups ---------------------------------------------------------
python - <<'EOF'
import json, os, subprocess
cands = []
for r in ("q5", "q6r", "q7", "q8r2", "q9"):
    ev, npz = f"artifacts/{r}_eval.json", f"artifacts/emavfi_{r}_best.npz"
    if os.path.exists(ev) and os.path.exists(npz) \
            and os.path.exists(npz.replace(".npz", ".flow.npz")):
        cands.append((json.load(open(ev))["mean_psnr"], r, npz))
cands.sort(reverse=True)
print("soup ingredients:", [(round(p, 3), r) for p, r, _ in cands])
json.dump({"ingredients": [r for _, r, _ in cands],
           "best_individual": cands[0][0]}, open("runs/queueP/plan.json", "w"))
if len(cands) >= 2:
    subprocess.run(["python", "tools/make_soup.py", "--inputs",
                    *[n for _, _, n in cands],
                    "--out", "runs/queueP/soup_all.npz"], check=True)
    subprocess.run(["python", "tools/make_soup.py", "--inputs",
                    cands[0][2], cands[1][2],
                    "--out", "runs/queueP/soup_top2.npz"], check=True)
EOF

# --- step 2: eval each soup -------------------------------------------------------
for S in soup_all soup_top2; do
  if [ -f "runs/queueP/$S.npz" ] && [ ! -f "runs/queueP/${S}_eval.done" ]; then
    timeout 3600 python eval.py --data-dir data/processed/val \
      --model_path "runs/queueP/$S.npz" \
      --flow_model "runs/queueP/$S.flow.npz" --flow_prior \
      --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
      > "runs/queueP/${S}_eval.json" && touch "runs/queueP/${S}_eval.done"
    echo "$S eval:"; cat "runs/queueP/${S}_eval.json"
  fi
done

# --- step 3: promote if a soup leads ----------------------------------------------
WINNER=$(python - <<'EOF'
import json, os
plan = json.load(open("runs/queueP/plan.json"))
best_ind = plan["best_individual"]
rows = []
for s in ("soup_all", "soup_top2"):
    p = f"runs/queueP/{s}_eval.json"
    # only evals whose .done marker exists: a failed/timed-out eval leaves
    # a truncated json that must not crash the verdict or win promotion
    if os.path.exists(p) and os.path.exists(p.replace("_eval.json", "_eval.done")):
        try:
            rows.append((json.load(open(p))["mean_psnr"], s))
        except Exception:
            pass
rows.sort(reverse=True)
json.dump({"souped": rows, "best_individual": best_ind},
          open("runs/queueP/verdict.json", "w"))
print(rows[0][1] if rows and rows[0][0] > best_ind else "none")
EOF
)
echo "soup winner: $WINNER"
cp runs/queueP/*_eval.json runs/queueP/verdict.json artifacts/ 2>/dev/null || true
for f in artifacts/soup_all_eval.json artifacts/soup_top2_eval.json artifacts/verdict.json; do
  [ -f "$f" ] && git add "$f"
done
git commit -q -m "Model-soup evals over the fine-tune lineage (queueP)" || true

if [ "$WINNER" != "none" ] && [ ! -f runs/queueP/secured ]; then
  cp "runs/queueP/$WINNER.npz" artifacts/emavfi_soup_best.npz
  cp "runs/queueP/$WINNER.flow.npz" artifacts/emavfi_soup_best.flow.npz
  cp "runs/queueP/${WINNER}_eval.json" artifacts/soup_eval.json
  git add -f artifacts/emavfi_soup_best.npz artifacts/emavfi_soup_best.flow.npz \
      artifacts/soup_eval.json
  git commit -q -m "Secure model-soup flagship ($WINNER beats best individual)" || true
  touch runs/queueP/secured
  if [ ! -f runs/queueP/tta.done ]; then
    timeout 7200 python eval.py --data-dir data/processed/val \
      --model_path artifacts/emavfi_soup_best.npz \
      --flow_model artifacts/emavfi_soup_best.flow.npz --flow_prior \
      --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --tta --json \
      > runs/queueP/soup_tta_eval.json && touch runs/queueP/tta.done
    cp runs/queueP/soup_tta_eval.json artifacts/soup_tta_eval.json
    git add artifacts/soup_tta_eval.json && \
      git commit -q -m "TTA eval of the model-soup flagship" || true
  fi
fi

echo "=== queueP COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueP/COMPLETE
