#!/bin/bash
# Round-5 chain AA: cash the R=1 flip (VERDICT r4 #1) + soup/compose (#6).
#   1. soups (host-side): {q13,qk3,qr1} pairs + all-3
#   2. qr1 lever re-adjudication: TTA, auto_scale sweep, as_best+TTA
#   3. qk3 lever composition: k=3 + auto_scale 9.0 (+TTA)
#   4. soup evals at their matching geometries
# Artifacts committed as they land (VM restarts wipe untracked runs/).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueAA
LOG=runs/queueAA/queueAA.log
exec >>"$LOG" 2>&1
echo "=== queueAA start $(date -u +%FT%TZ) ==="

commit_retry() {
  local msg="$1"; shift
  for a in 1 2 3 4 5; do
    if git add -f "$@" && git commit -q -m "$msg"; then return 0; fi
    sleep $((a * 5))
  done
  echo "COMMIT FAILED after retries: $msg"
  return 1
}

Q13=artifacts/emavfi_q13_best.npz
QK3=artifacts/emavfi_qk3_best.npz
QR1=artifacts/emavfi_qr1_best.npz

# --- step 1: soups (pure numpy, no device) -----------------------------------
if [ ! -f runs/queueAA/soups.done ]; then
  python tools/make_soup.py --inputs $Q13 $QR1 --out artifacts/emavfi_soup_q13qr1.npz
  python tools/make_soup.py --inputs $Q13 $QK3 --out artifacts/emavfi_soup_q13qk3.npz
  python tools/make_soup.py --inputs $Q13 $QK3 $QR1 --out artifacts/emavfi_soup_r4x3.npz
  touch runs/queueAA/soups.done
fi

EVAL="timeout -k 5 2700 python eval.py --data-dir data/processed/val --json \
  --flow_prior --warp_max_flow 16 --use_pallas"

run_eval() {  # run_eval <marker> <out.json> <args...>
  local mark="$1" out="$2"; shift 2
  if [ ! -f "runs/queueAA/$mark.done" ]; then
    $EVAL "$@" > "$out" && touch "runs/queueAA/$mark.done"
    echo "== $mark:"; python -c "import json,sys;d=json.load(open('$out'));print(d['mean_psnr'],d['mean_ssim'])" 2>/dev/null || cat "$out"
  fi
}

# --- step 2: qr1 levers (the flip adjudication) ------------------------------
QR1F="--model_path $QR1 --flow_model artifacts/emavfi_qr1_best.flow.npz \
  --cascade_levels 2 --dcn_max_offset 1"
run_eval qr1_tta runs/queueAA/qr1_tta.json $QR1F --tta
for T in 7.5 9.0 10.5; do
  run_eval "qr1_as_$T" "runs/queueAA/qr1_as_$T.json" $QR1F --auto_scale "$T"
done
if [ -f runs/queueAA/qr1_as_10.5.done ] && [ ! -f runs/queueAA/qr1_asbest.done ]; then
  python - <<'PY'
import json, glob
rows = {}
for p in glob.glob("runs/queueAA/qr1_as_*.json"):
    t = p.split("_as_")[1][:-5]
    try:
        rows[t] = json.load(open(p))["mean_psnr"]
    except Exception:
        pass
best = max(rows, key=rows.get)
open("runs/queueAA/qr1_best_threshold", "w").write(best)
print("qr1 auto_scale sweep:", rows, "best:", best)
PY
  touch runs/queueAA/qr1_asbest.done
fi
if [ -f runs/queueAA/qr1_asbest.done ] && [ ! -f runs/queueAA/qr1_astta.done ]; then
  BT=$(cat runs/queueAA/qr1_best_threshold 2>/dev/null || echo 9.0)
  timeout -k 5 4200 python eval.py --data-dir data/processed/val --json \
    --flow_prior --warp_max_flow 16 --use_pallas $QR1F \
    --auto_scale "$BT" --tta > runs/queueAA/qr1_as_best_tta.json \
    && touch runs/queueAA/qr1_astta.done
  echo "== qr1 auto_scale $BT + TTA:"; cat runs/queueAA/qr1_as_best_tta.json
fi
if [ -f runs/queueAA/qr1_astta.done ] && [ ! -f runs/queueAA/qr1commit.done ]; then
  cp runs/queueAA/qr1_tta.json artifacts/qr1_tta_eval.json 2>/dev/null
  cp runs/queueAA/qr1_as_best_tta.json artifacts/qr1_autoscale_tta_eval.json 2>/dev/null
  python - <<'PY'
import json, glob
rows = {t.split("_as_")[1][:-5]: json.load(open(t))["mean_psnr"]
        for t in glob.glob("runs/queueAA/qr1_as_*.json") if "best" not in t}
best = max(rows, key=rows.get)
out = {"sweep": rows, "best_threshold": best, "best_psnr": rows[best],
       "note": "auto_scale threshold on qr1 (R=1), native composition (flow_prior+cascade2)"}
json.dump(out, open("artifacts/qr1_autoscale_sweep.json", "w"), indent=1)
print(out)
PY
  commit_retry "qr1 (R=1) lever re-adjudication: TTA, auto_scale sweep, composition (VERDICT r4 #1)" \
    artifacts/qr1_tta_eval.json artifacts/qr1_autoscale_tta_eval.json \
    artifacts/qr1_autoscale_sweep.json
  touch runs/queueAA/qr1commit.done
fi

# --- step 3: qk3 lever composition (k=3 never composed) ----------------------
QK3F="--model_path $QK3 --flow_model artifacts/emavfi_qk3_best.flow.npz \
  --cascade_levels 3 --dcn_max_offset 2"
run_eval qk3_as9 runs/queueAA/qk3_as9.json $QK3F --auto_scale 9.0
if [ -f runs/queueAA/qk3_as9.done ] && [ ! -f runs/queueAA/qk3_astta.done ]; then
  timeout -k 5 4200 python eval.py --data-dir data/processed/val --json \
    --flow_prior --warp_max_flow 16 --use_pallas $QK3F \
    --auto_scale 9.0 --tta > runs/queueAA/qk3_as9_tta.json \
    && touch runs/queueAA/qk3_astta.done
  echo "== qk3 auto_scale 9.0 + TTA:"; cat runs/queueAA/qk3_as9_tta.json
  cp runs/queueAA/qk3_as9_tta.json artifacts/qk3_autoscale_tta_eval.json 2>/dev/null
  commit_retry "qk3 (k=3) lever composition: auto_scale 9.0 + TTA (VERDICT r4 #6)" \
    artifacts/qk3_autoscale_tta_eval.json || true
fi

# --- step 4: soup evals ------------------------------------------------------
run_eval soup_q13qr1_r1 runs/queueAA/soup_q13qr1_r1.json \
  --model_path artifacts/emavfi_soup_q13qr1.npz \
  --flow_model artifacts/emavfi_soup_q13qr1.flow.npz \
  --cascade_levels 2 --dcn_max_offset 1
run_eval soup_q13qr1_r2 runs/queueAA/soup_q13qr1_r2.json \
  --model_path artifacts/emavfi_soup_q13qr1.npz \
  --flow_model artifacts/emavfi_soup_q13qr1.flow.npz \
  --cascade_levels 2 --dcn_max_offset 2
run_eval soup_q13qk3_k2 runs/queueAA/soup_q13qk3_k2.json \
  --model_path artifacts/emavfi_soup_q13qk3.npz \
  --flow_model artifacts/emavfi_soup_q13qk3.flow.npz \
  --cascade_levels 2 --dcn_max_offset 2
run_eval soup_q13qk3_k3 runs/queueAA/soup_q13qk3_k3.json \
  --model_path artifacts/emavfi_soup_q13qk3.npz \
  --flow_model artifacts/emavfi_soup_q13qk3.flow.npz \
  --cascade_levels 3 --dcn_max_offset 2
run_eval soup3_r1k2 runs/queueAA/soup3_r1k2.json \
  --model_path artifacts/emavfi_soup_r4x3.npz \
  --flow_model artifacts/emavfi_soup_r4x3.flow.npz \
  --cascade_levels 2 --dcn_max_offset 1
run_eval soup3_r2k2 runs/queueAA/soup3_r2k2.json \
  --model_path artifacts/emavfi_soup_r4x3.npz \
  --flow_model artifacts/emavfi_soup_r4x3.flow.npz \
  --cascade_levels 2 --dcn_max_offset 2
if [ ! -f runs/queueAA/soupagg.done ]; then
  python - <<'PY'
import json, glob
rows = {}
for p in sorted(glob.glob("runs/queueAA/soup*.json")):
    try:
        d = json.load(open(p))
        rows[p.split("/")[-1][:-5]] = [round(d["mean_psnr"], 4),
                                       round(d["mean_ssim"], 4)]
    except Exception:
        pass
out = {"rows": rows,
       "ingredients": {"q13": 26.2216, "qk3": 26.2517, "qr1": 26.2118},
       "note": "uniform soups of the round-4 fine-tune siblings, native "
               "composition (flow_prior + cascade) at the named geometry"}
json.dump(out, open("artifacts/soup_r5_eval.json", "w"), indent=1)
print(out)
PY
  touch runs/queueAA/soupagg.done
  commit_retry "Round-5 soups of {q13, qk3, qr1}: native evals (VERDICT r4 #6)" \
    artifacts/soup_r5_eval.json
fi

echo "=== queueAA COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueAA/COMPLETE
