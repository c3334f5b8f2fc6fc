#!/bin/bash
# Round-5 chain AF: fast-eval tail (warm caches make val evals ~5-10 min).
#   1. qocc auto_scale 9.0 + TTA — record attempt (qocc native 26.251 is
#      the best R=1 native number)
#   2. qocc TTA-only + auto_scale sweep rows (lever table on qocc)
#   3. same-lineage soup qr1+qocc: native, then levers if it leads
#   4. train-step time table incl. the old-backward reproduction (#4)
# Steps keyed on COMMITTED artifacts (restart-proof). Waits for queueAC.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueAF
LOG=runs/queueAF/queueAF.log
exec >>"$LOG" 2>&1
echo "=== queueAF start $(date -u +%FT%TZ) ==="

for i in $(seq 1 360); do
  [ -f runs/queueAC/COMPLETE ] && break
  sleep 20
done
echo "=== gate passed $(date -u +%FT%TZ) ==="

commit_retry() {
  local msg="$1"; shift
  for a in 1 2 3 4 5; do
    if git add -f "$@" && git commit -q -m "$msg"; then return 0; fi
    sleep $((a * 5))
  done
  echo "COMMIT FAILED after retries: $msg"
  return 1
}

QOCC=artifacts/emavfi_qocc_best.npz
QOCCFL=artifacts/emavfi_qocc_best.flow.npz
QOCCF="--model_path $QOCC --flow_model $QOCCFL --cascade_levels 2 --dcn_max_offset 1"
EVAL="python eval.py --data-dir data/processed/val --json --flow_prior --warp_max_flow 16 --use_pallas"

# --- step 1: qocc record attempt ---------------------------------------------
if [ ! -f artifacts/qocc_autoscale_tta_eval.json ] && [ -f $QOCC ]; then
  timeout -k 5 4800 $EVAL $QOCCF --auto_scale 9.0 --tta \
    > runs/queueAF/qocc_as9_tta.json
  if [ -s runs/queueAF/qocc_as9_tta.json ]; then
    cp runs/queueAF/qocc_as9_tta.json artifacts/qocc_autoscale_tta_eval.json
    echo "== qocc as9+TTA:"; python -c "import json;d=json.load(open('artifacts/qocc_autoscale_tta_eval.json'));print(d['mean_psnr'], d['mean_ssim'])"
    commit_retry "qocc auto_scale 9.0 + TTA: record attempt on the occlusion fine-tune (best native R=1)" \
      artifacts/qocc_autoscale_tta_eval.json
  fi
fi

# --- step 2: qocc lever rows -------------------------------------------------
if [ ! -f artifacts/qocc_levers.json ] && [ -f $QOCC ]; then
  timeout -k 5 3600 $EVAL $QOCCF --tta > runs/queueAF/qocc_tta.json
  timeout -k 5 3600 $EVAL $QOCCF --auto_scale 7.5 > runs/queueAF/qocc_as7.5.json
  timeout -k 5 3600 $EVAL $QOCCF --auto_scale 9.0 > runs/queueAF/qocc_as9.json
  timeout -k 5 3600 $EVAL $QOCCF --auto_scale 10.5 > runs/queueAF/qocc_as10.5.json
  python - <<'PY'
import json, glob
rows = {}
for p in sorted(glob.glob("runs/queueAF/qocc_*.json")):
    try:
        d = json.load(open(p))
        rows[p.split("/")[-1][5:-5]] = [round(d["mean_psnr"], 4),
                                        round(d["mean_ssim"], 4)]
    except Exception:
        pass
out = {"rows": rows, "native": 26.2509,
       "note": "lever table on qocc (occlusion fine-tune from qr1, R=1)"}
json.dump(out, open("artifacts/qocc_levers.json", "w"), indent=1)
print(out)
PY
  commit_retry "qocc lever table: TTA + auto_scale sweep" artifacts/qocc_levers.json
fi

# --- step 3: same-lineage soup qr1+qocc --------------------------------------
if [ ! -f artifacts/soup_r1occ_eval.json ] && [ -f artifacts/emavfi_soup_r1occ.npz ]; then
  timeout -k 5 2700 $EVAL \
    --model_path artifacts/emavfi_soup_r1occ.npz \
    --flow_model artifacts/emavfi_soup_r1occ.flow.npz \
    --cascade_levels 2 --dcn_max_offset 1 > runs/queueAF/soup_r1occ.json
  if [ -s runs/queueAF/soup_r1occ.json ]; then
    cp runs/queueAF/soup_r1occ.json artifacts/soup_r1occ_eval.json
    PS=$(python -c "import json;print(json.load(open('artifacts/soup_r1occ_eval.json'))['mean_psnr'])")
    echo "== soup qr1+qocc native: $PS"
    commit_retry "Same-lineage soup qr1+qocc: native eval" \
      artifacts/soup_r1occ_eval.json artifacts/emavfi_soup_r1occ.npz \
      artifacts/emavfi_soup_r1occ.flow.npz
    # levers only if the soup leads the native table (> 26.2509)
    if python -c "import json,sys;sys.exit(0 if json.load(open('artifacts/soup_r1occ_eval.json'))['mean_psnr'] > 26.2509 else 1)"; then
      timeout -k 5 4800 $EVAL \
        --model_path artifacts/emavfi_soup_r1occ.npz \
        --flow_model artifacts/emavfi_soup_r1occ.flow.npz \
        --cascade_levels 2 --dcn_max_offset 1 --auto_scale 9.0 --tta \
        > runs/queueAF/soup_r1occ_as9_tta.json
      if [ -s runs/queueAF/soup_r1occ_as9_tta.json ]; then
        cp runs/queueAF/soup_r1occ_as9_tta.json artifacts/soup_r1occ_astta_eval.json
        commit_retry "soup qr1+qocc auto_scale 9.0 + TTA (leads native table)" \
          artifacts/soup_r1occ_astta_eval.json
      fi
    fi
  fi
fi

# --- step 4: train-step time table -------------------------------------------
if [ ! -f artifacts/train_step_bench_r5.json ]; then
  timeout -k 5 7200 python tools/bench_train_step.py --crop 128 --batch 8 \
    --accum 4 --paths xla,pallas,pallas+conv,pallas_oldbwd \
    --json_out runs/queueAF/train_step_128.json \
    > runs/queueAF/train_step_128.log 2>&1
  if [ -s runs/queueAF/train_step_128.json ]; then
    cp runs/queueAF/train_step_128.json artifacts/train_step_bench_r5.json
    cat runs/queueAF/train_step_128.json
    commit_retry "Train-step time table: XLA vs pallas vs pallas+conv vs old-backward, crop 128 (VERDICT r4 #4)" \
      artifacts/train_step_bench_r5.json
  else
    echo "train_step bench failed:"; tail -8 runs/queueAF/train_step_128.log
  fi
fi

echo "=== queueAF COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueAF/COMPLETE
