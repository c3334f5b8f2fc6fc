#!/bin/bash
# Round-4 closing chain: waits for queueY, then (in priority order)
#   1. bench.py full b2-b16 sweep (uncontended) -> artifacts/bench_r4.json
#   2. auto_scale sweep extension (10.5, 12 — 9.0 beat 7.5, trend is up)
#      + TTA composition at the winning threshold
#   3. serving sequence-protocol A/B (relay-bandwidth fast path)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueZ
LOG=runs/queueZ/queueZ.log
exec >>"$LOG" 2>&1
echo "=== queueZ start $(date -u +%FT%TZ) ==="

chain_running() {
  for f in /proc/[0-9]*/cmdline; do
    tr '\0' ' ' < "$f" 2>/dev/null | grep -q "tools/$1.sh" && return 0
  done
  return 1
}
for i in $(seq 1 300); do
  [ -f runs/queueY/COMPLETE ] && break
  chain_running queueY || { echo "queueY gone without COMPLETE - proceeding $(date -u +%FT%TZ)"; break; }
  sleep 60
done

commit_retry() {
  local msg="$1"; shift
  for a in 1 2 3 4 5; do
    if git add -f "$@" && git commit -q -m "$msg"; then return 0; fi
    sleep $((a * 5))
  done
  echo "COMMIT FAILED after retries: $msg"
  return 1
}

# --- step 1: final bench sweep ------------------------------------------------
if [ ! -f runs/queueZ/bench.done ]; then
  timeout -k 5 4200 python bench.py > runs/queueZ/bench.json 2> runs/queueZ/bench.log
  if [ -s runs/queueZ/bench.json ]; then
    cp runs/queueZ/bench.json artifacts/bench_r4.json
    cp runs/queueZ/bench.log artifacts/bench_r4.log
    cat runs/queueZ/bench.log runs/queueZ/bench.json
    touch runs/queueZ/bench.done
    commit_retry "Round-4 bench: full sweep with Pallas conv chains (artifacts/bench_r4)" \
      artifacts/bench_r4.json artifacts/bench_r4.log
  fi
fi

# --- step 2: auto_scale extension + TTA composition ---------------------------
M=artifacts/emavfi_q13_best.npz
F=artifacts/emavfi_q13_best.flow.npz
COMMON="--data-dir data/processed/val --model_path $M --flow_model $F \
  --flow_prior --cascade_levels 2 --dcn_max_offset 2 --warp_max_flow 16 \
  --use_pallas --json"
for T in 10.5 12.0; do
  if [ ! -f "runs/queueZ/as_$T.done" ]; then
    timeout -k 5 2400 python eval.py $COMMON --auto_scale "$T" \
      > "runs/queueZ/q13_as_$T.json" && touch "runs/queueZ/as_$T.done"
    echo "auto_scale $T:"; cat "runs/queueZ/q13_as_$T.json" 2>/dev/null
  fi
done
if [ ! -f runs/queueZ/asagg.done ] && [ -f runs/queueZ/as_12.0.done ]; then
  python - <<'PY'
import json, glob
rows = {"7.5 (round-3)": 26.468}
for p in glob.glob("runs/queueY/q13_as_*.json") + glob.glob("runs/queueZ/q13_as_*.json"):
    t = p.split("_as_")[1][:-5]
    try:
        rows[t] = json.load(open(p))["mean_psnr"]
    except Exception:
        pass
best = max(rows, key=rows.get)
out = {"sweep": rows, "best_threshold": best, "best_psnr": rows[best],
       "note": "auto_scale threshold on shipped q13, native composition (flow_prior+cascade2)"}
json.dump(out, open("artifacts/q13_autoscale_sweep.json", "w"), indent=1)
open("runs/queueZ/best_threshold", "w").write(best.split()[0])
print(out)
PY
  touch runs/queueZ/asagg.done
  commit_retry "q13 auto_scale sweep extended (10.5, 12)" artifacts/q13_autoscale_sweep.json
fi
if [ -f runs/queueZ/asagg.done ] && [ ! -f runs/queueZ/astta.done ]; then
  BT=$(cat runs/queueZ/best_threshold 2>/dev/null || echo 9.0)
  timeout -k 5 4200 python eval.py $COMMON --auto_scale "$BT" --tta \
    > runs/queueZ/q13_as_best_tta.json && touch runs/queueZ/astta.done
  if [ -s runs/queueZ/q13_as_best_tta.json ]; then
    cp runs/queueZ/q13_as_best_tta.json artifacts/q13_autoscale_tta_r4.json
    echo "auto_scale $BT + TTA:"; cat artifacts/q13_autoscale_tta_r4.json
    commit_retry "q13 auto_scale(best)+TTA composition (round-4 max-quality row)" \
      artifacts/q13_autoscale_tta_r4.json
  fi
fi

# --- step 3: serving sequence A/B ---------------------------------------------
if [ ! -f runs/queueZ/serveseq.done ]; then
  timeout -k 5 2400 python tools/bench_serve.py --inprocess --raw --use_pallas \
    --model_path artifacts/emavfi_q13_best.npz --size 720x1280 \
    --clients 4 --requests 24 > runs/queueZ/serve_raw.json
  timeout -k 5 2400 python tools/bench_serve.py --inprocess --seq 8 --use_pallas \
    --model_path artifacts/emavfi_q13_best.npz --size 720x1280 \
    --clients 4 --requests 12 > runs/queueZ/serve_seq8.json
  if [ -s runs/queueZ/serve_raw.json ] && [ -s runs/queueZ/serve_seq8.json ]; then
    python - <<'PY'
import json
raw = json.load(open("runs/queueZ/serve_raw.json"))
seq = json.load(open("runs/queueZ/serve_seq8.json"))
out = {"raw_pairs": raw, "seq8": seq,
       "midpoints_per_s_raw": raw.get("requests_per_s"),
       "midpoints_per_s_seq8": seq.get("midpoints_per_s"),
       "note": "sequence route ships each frame once over wire+relay"}
json.dump(out, open("artifacts/serve_seq_ab_r4.json", "w"), indent=1)
print(out)
PY
    touch runs/queueZ/serveseq.done
    commit_retry "Serving sequence-protocol A/B (VERDICT r3 #7)" artifacts/serve_seq_ab_r4.json
  fi
fi

echo "=== queueZ COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueZ/COMPLETE
