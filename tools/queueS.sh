#!/bin/bash
# Round-2 session-12 chain, terminal stage: wide-radius exploration run to
# use the otherwise-idle TPU tail of the round.
#
#   0. Wait for runs/queueN2/COMPLETE (the demo re-run stage after queueR).
#   1. q11 = 400-epoch cosine restart at lr 2e-4 (a much wider exploration
#      radius than queueQ's 3e-5 polish) from the best of the whole
#      lineage, at the proven batch-16/accum-8/320^2 flow-prior recipe.
#      Watcher-secured: even if the round ends mid-run, the wip checkpoint
#      ships and round 3 resumes it.
#   2. Native-res eval; secure + TTA only on improvement.
# Idempotent via step markers in runs/queueS/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueS
LOG=runs/queueS/queueS.log
exec >>"$LOG" 2>&1
echo "=== queueS start $(date -u +%FT%TZ) ==="

for i in $(seq 1 600); do   # up to 10 h
  [ -f runs/queueN2/COMPLETE ] && break
  sleep 60
done
if [ ! -f runs/queueN2/COMPLETE ]; then
  echo "queueN2 never completed - aborting queueS"; exit 1
fi
echo "queueN2 complete, proceeding $(date -u +%FT%TZ)"

# --- round-clock guard -----------------------------------------------------
# The driver benches on the real chip at round end; a training run still
# holding the TPU then would contend with (or crash) the recorded headline.
# Estimate remaining round time from the driver's PROGRESS heartbeat
# (wall_s, ~12 h budget) and size q11 to fit — or skip it entirely,
# leaving no COMPLETE marker so the round-3 relauncher re-runs this stage.
REMAIN=$(python - <<'EOF'
import json, time
rows = [json.loads(l) for l in open("PROGRESS.jsonl") if l.strip()]
last = rows[-1]
elapsed = last["wall_s"] + (time.time() - last["ts"])
print(max(0, int(43200 - elapsed)))
EOF
)
echo "round time remaining ~${REMAIN}s"
if [ "$REMAIN" -lt 5400 ]; then
  echo "not enough round time for q11 - leaving the stage for next round"
  exit 0
fi
EPOCHS=$(( (REMAIN - 2400) / 35 ))
[ "$EPOCHS" -gt 400 ] && EPOCHS=400
TLIMIT=$(( REMAIN - 2400 ))
echo "q11 sized to $EPOCHS epochs (timeout ${TLIMIT}s)"

INIT=$(python - <<'EOF'
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
json.dump({"cands": cands}, open("runs/queueS/plan.json", "w"))
print(cands[0][1] if cands else "")
EOF
)
if [ -z "$INIT" ]; then echo "no warm-start candidate - aborting"; exit 1; fi
INITF="${INIT%.npz}.flow.npz"
INIT_PSNR=$(python -c "import json; print(json.load(open('runs/queueS/plan.json'))['cands'][0][0])")
# resume from the watcher-secured wip after a restart
if [ -f artifacts/emavfi_q11_wip.npz ]; then
  INIT=artifacts/emavfi_q11_wip.npz; INITF=artifacts/emavfi_q11_wip.flow.npz
fi
echo "q11 warm start: $INIT (best individual $INIT_PSNR dB)"

if [ ! -f runs/queueS/q11.done ]; then
  nohup bash tools/ckpt_watcher.sh q11 runs/q11/best 600 >/dev/null 2>&1 &
  echo $! > /tmp/q11_watcher.pid
  timeout "$TLIMIT" python train.py --config config/train_config.yaml \
    --batch_size 16 --accum_steps 8 --remat true \
    --random_rotation false --consistent_jitter true \
    --crop_size "[320,320]" --target_unit_range true \
    --best_metric val_psnr --dcn_max_offset 2 --warp_max_flow 16 \
    --use_pallas true --ema_decay 0.998 --flow_prior true \
    --lr_schedule cosine --learning_rate 2e-4 --cosine_min_lr 5e-6 \
    --num-epochs "$EPOCHS" \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q11/ckpt --best_model_path runs/q11/best \
    && touch runs/queueS/q11.done
  kill "$(cat /tmp/q11_watcher.pid)" 2>/dev/null || true
fi

if [ -f runs/q11/best.npz ] && [ ! -f runs/queueS/eval.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path runs/q11/best.npz --flow_model runs/q11/best.flow.npz \
    --flow_prior --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
    > runs/queueS/q11_eval.json && touch runs/queueS/eval.done
  echo "q11 eval:"; cat runs/queueS/q11_eval.json
fi
if [ -f runs/queueS/eval.done ] && [ ! -f runs/queueS/secured ]; then
  Q11=$(python -c "import json; print(json.load(open('runs/queueS/q11_eval.json'))['mean_psnr'])")
  if python -c "exit(0 if $Q11 > $INIT_PSNR else 1)"; then
    cp runs/q11/best.npz artifacts/emavfi_q11_best.npz
    cp runs/q11/best.flow.npz artifacts/emavfi_q11_best.flow.npz
    cp runs/queueS/q11_eval.json artifacts/q11_eval.json
    git add -f artifacts/emavfi_q11_best.npz artifacts/emavfi_q11_best.flow.npz \
        artifacts/q11_eval.json
    git commit -q -m "Secure q11 wide-radius exploration run (beats the lineage best)" || true
    touch runs/queueS/secured
    timeout 7200 python eval.py --data-dir data/processed/val \
      --model_path artifacts/emavfi_q11_best.npz \
      --flow_model artifacts/emavfi_q11_best.flow.npz --flow_prior \
      --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --tta --json \
      > runs/queueS/q11_tta_eval.json \
      && cp runs/queueS/q11_tta_eval.json artifacts/q11_tta_eval.json \
      && git add artifacts/q11_tta_eval.json \
      && git commit -q -m "TTA eval of the q11 flagship" || true
  else
    cp runs/queueS/q11_eval.json artifacts/q11_eval_rejected.json
    git add artifacts/q11_eval_rejected.json
    git commit -q -m "q11 exploration run did not beat the lineage best (eval on record)" || true
  fi
fi

echo "=== queueS COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueS/COMPLETE
