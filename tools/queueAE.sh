#!/bin/bash
# Round-5 chain AE: replaces queueAC's tail after the qr1 TTA step.
#   1. qocc auto_scale 9.0 + TTA — record attempt on the new best-native
#      R=1 checkpoint (qocc 26.251 native vs qr1 26.212)
#   2. train-step time table incl. the old-backward reproduction (#4)
#   3. qk3 k=3 + auto_scale 9.0 + TTA composition (#6)
#   4. soup evals (#6)
# Steps keyed on COMMITTED artifacts (restart-proof).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueAE
LOG=runs/queueAE/queueAE.log
exec >>"$LOG" 2>&1
echo "=== queueAE start $(date -u +%FT%TZ) ==="

commit_retry() {
  local msg="$1"; shift
  for a in 1 2 3 4 5; do
    if git add -f "$@" && git commit -q -m "$msg"; then return 0; fi
    sleep $((a * 5))
  done
  echo "COMMIT FAILED after retries: $msg"
  return 1
}

QK3=artifacts/emavfi_qk3_best.npz
QOCC=artifacts/emavfi_qocc_best.npz
QOCCFL=artifacts/emavfi_qocc_best.flow.npz

# --- step 1: qocc record attempt ---------------------------------------------
if [ ! -f artifacts/qocc_autoscale_tta_eval.json ] && [ -f $QOCC ]; then
  timeout -k 5 4800 python eval.py --data-dir data/processed/val --json \
    --flow_prior --warp_max_flow 16 --use_pallas \
    --model_path $QOCC --flow_model $QOCCFL \
    --cascade_levels 2 --dcn_max_offset 1 \
    --auto_scale 9.0 --tta > runs/queueAE/qocc_as9_tta.json
  if [ -s runs/queueAE/qocc_as9_tta.json ]; then
    cp runs/queueAE/qocc_as9_tta.json artifacts/qocc_autoscale_tta_eval.json
    echo "== qocc as9+TTA:"; python -c "import json;d=json.load(open('artifacts/qocc_autoscale_tta_eval.json'));print(d['mean_psnr'], d['mean_ssim'])"
    commit_retry "qocc auto_scale 9.0 + TTA: record attempt on the occlusion fine-tune (best native R=1)" \
      artifacts/qocc_autoscale_tta_eval.json
  fi
fi

# --- step 2: train-step table incl. old-backward -----------------------------
if [ ! -f artifacts/train_step_bench_r5.json ]; then
  timeout -k 5 7200 python tools/bench_train_step.py --crop 128 --batch 8 \
    --accum 4 --paths xla,pallas,pallas+conv,pallas_oldbwd \
    --json_out runs/queueAE/train_step_128.json \
    > runs/queueAE/train_step_128.log 2>&1
  if [ -s runs/queueAE/train_step_128.json ]; then
    cp runs/queueAE/train_step_128.json artifacts/train_step_bench_r5.json
    cat runs/queueAE/train_step_128.json
    commit_retry "Train-step time table: XLA vs pallas vs pallas+conv vs old-backward, crop 128 (VERDICT r4 #4)" \
      artifacts/train_step_bench_r5.json
  else
    echo "train_step bench failed:"; tail -8 runs/queueAE/train_step_128.log
  fi
fi

# --- step 3: qk3 composition -------------------------------------------------
if [ ! -f artifacts/qk3_autoscale_tta_eval.json ]; then
  timeout -k 5 4800 python eval.py --data-dir data/processed/val --json \
    --flow_prior --warp_max_flow 16 --use_pallas \
    --model_path $QK3 --flow_model artifacts/emavfi_qk3_best.flow.npz \
    --cascade_levels 3 --dcn_max_offset 2 \
    --auto_scale 9.0 --tta > runs/queueAE/qk3_as9_tta.json
  if [ -s runs/queueAE/qk3_as9_tta.json ]; then
    cp runs/queueAE/qk3_as9_tta.json artifacts/qk3_autoscale_tta_eval.json
    commit_retry "qk3 (k=3) lever composition: auto_scale 9.0 + TTA (VERDICT r4 #6)" \
      artifacts/qk3_autoscale_tta_eval.json
  fi
fi

# --- step 4: soup evals ------------------------------------------------------
EVAL="timeout -k 5 2700 python eval.py --data-dir data/processed/val --json \
  --flow_prior --warp_max_flow 16 --use_pallas"
if [ ! -f artifacts/soup_r5_eval.json ]; then
  $EVAL --model_path artifacts/emavfi_soup_q13qr1.npz \
    --flow_model artifacts/emavfi_soup_q13qr1.flow.npz \
    --cascade_levels 2 --dcn_max_offset 1 > runs/queueAE/soup_q13qr1_r1.json
  $EVAL --model_path artifacts/emavfi_soup_r4x3.npz \
    --flow_model artifacts/emavfi_soup_r4x3.flow.npz \
    --cascade_levels 2 --dcn_max_offset 1 > runs/queueAE/soup3_r1.json
  python - <<'PY'
import json, glob
rows = {}
for p in sorted(glob.glob("runs/queueAE/soup*.json")):
    try:
        d = json.load(open(p))
        rows[p.split("/")[-1][:-5]] = [round(d["mean_psnr"], 4),
                                       round(d["mean_ssim"], 4)]
    except Exception:
        pass
out = {"rows": rows,
       "ingredients": {"q13": 26.2216, "qk3": 26.2517, "qr1": 26.2118,
                       "qocc": 26.2509},
       "note": "uniform soups of the round-4 fine-tune siblings at R=1 "
               "geometry, native composition (flow_prior + cascade 2)"}
json.dump(out, open("artifacts/soup_r5_eval.json", "w"), indent=1)
print(out)
PY
  commit_retry "Round-5 soups of {q13, qk3, qr1}: native evals at R=1 (VERDICT r4 #6)" \
    artifacts/soup_r5_eval.json
fi

echo "=== queueAE COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueAE/COMPLETE
