#!/bin/bash
# Round-2 session-12 chain: final low-LR polish fine-tune from the best of
# the whole lineage (individual flagships AND the queueP soups).
#
#   0. Wait for runs/queueP/COMPLETE (terminal marker of the session-12
#      chain: queueO -> queueN -> queueP).
#   1. Pick the best available checkpoint by native-res mean_psnr over
#      {q8r2, q9, soup_best}.
#   2. q10 = 100-epoch cosine polish (lr 3e-5 -> 2e-6) at the proven
#      accum-4/320^2 flow-prior recipe, warm-started from that best.
#   3. Native-res eval; secure + TTA only if it beats its init.
# Idempotent via step markers in runs/queueQ/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueQ
LOG=runs/queueQ/queueQ.log
exec >>"$LOG" 2>&1
echo "=== queueQ start $(date -u +%FT%TZ) ==="

# --- step 0: wait for queueP ------------------------------------------------
for i in $(seq 1 540); do   # up to 9 h
  [ -f runs/queueP/COMPLETE ] && break
  sleep 60
done
if [ ! -f runs/queueP/COMPLETE ]; then
  echo "queueP never completed - aborting queueQ"; exit 1
fi
echo "queueP complete, proceeding $(date -u +%FT%TZ)"

# --- step 1: pick the warm-start source --------------------------------------
INIT=$(python - <<'EOF'
import json, os
cands = []
for r, npz in (("q8r2", "artifacts/emavfi_q8r2_best.npz"),
               ("q9", "artifacts/emavfi_q9_best.npz"),
               ("soup", "artifacts/emavfi_soup_best.npz")):
    ev = {"soup": "artifacts/soup_eval.json"}.get(r, f"artifacts/{r}_eval.json")
    if os.path.exists(ev) and os.path.exists(npz) \
            and os.path.exists(npz.replace(".npz", ".flow.npz")):
        cands.append((json.load(open(ev))["mean_psnr"], npz))
cands.sort(reverse=True)
json.dump({"cands": cands}, open("runs/queueQ/plan.json", "w"))
print(cands[0][1] if cands else "")
EOF
)
if [ -z "$INIT" ]; then echo "no warm-start candidate - aborting"; exit 1; fi
INITF="${INIT%.npz}.flow.npz"
INIT_PSNR=$(python -c "import json; print(json.load(open('runs/queueQ/plan.json'))['cands'][0][0])")
echo "q10 warm start: $INIT ($INIT_PSNR dB)"

# --- step 2: q10 polish fine-tune --------------------------------------------
if [ ! -f runs/queueQ/q10.done ]; then
  nohup bash tools/ckpt_watcher.sh q10 runs/q10/best 600 >/dev/null 2>&1 &
  echo $! > /tmp/q10_watcher.pid
  timeout 14400 python train.py --config config/train_config.yaml \
    --batch_size 8 --accum_steps 4 --remat true \
    --random_rotation false --consistent_jitter true \
    --crop_size "[320,320]" --target_unit_range true \
    --best_metric val_psnr --dcn_max_offset 2 --warp_max_flow 16 \
    --use_pallas true --ema_decay 0.998 --flow_prior true \
    --lr_schedule cosine --learning_rate 3e-5 --cosine_min_lr 2e-6 \
    --num-epochs 100 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q10/ckpt --best_model_path runs/q10/best \
    && touch runs/queueQ/q10.done
  kill "$(cat /tmp/q10_watcher.pid)" 2>/dev/null || true
fi

# --- step 3: eval + secure-if-better ------------------------------------------
if [ -f runs/q10/best.npz ] && [ ! -f runs/queueQ/eval.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path runs/q10/best.npz --flow_model runs/q10/best.flow.npz \
    --flow_prior --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
    > runs/queueQ/q10_eval.json && touch runs/queueQ/eval.done
  echo "q10 eval:"; cat runs/queueQ/q10_eval.json
fi
if [ -f runs/queueQ/eval.done ] && [ ! -f runs/queueQ/secured ]; then
  Q10=$(python -c "import json; print(json.load(open('runs/queueQ/q10_eval.json'))['mean_psnr'])")
  BETTER=$(python -c "print(1 if $Q10 > $INIT_PSNR else 0)")
  echo "q10 $Q10 vs init $INIT_PSNR -> better=$BETTER"
  if [ "$BETTER" = "1" ]; then
    cp runs/q10/best.npz artifacts/emavfi_q10_best.npz
    cp runs/q10/best.flow.npz artifacts/emavfi_q10_best.flow.npz
    cp runs/queueQ/q10_eval.json artifacts/q10_eval.json
    git add -f artifacts/emavfi_q10_best.npz artifacts/emavfi_q10_best.flow.npz \
        artifacts/q10_eval.json
    git commit -q -m "Secure q10 polish fine-tune (beats its warm-start init)" || true
    touch runs/queueQ/secured
  else
    cp runs/queueQ/q10_eval.json artifacts/q10_eval_rejected.json
    git add artifacts/q10_eval_rejected.json
    git commit -q -m "q10 polish fine-tune did not beat its init (eval on record)" || true
  fi
fi
# TTA lives OUTSIDE the secured guard so a failed/timed-out first attempt
# stays retryable on re-run; cp/commit only fire on a successful eval.
if [ -f runs/queueQ/secured ] && [ ! -f runs/queueQ/tta.done ]; then
  timeout 7200 python eval.py --data-dir data/processed/val \
    --model_path artifacts/emavfi_q10_best.npz \
    --flow_model artifacts/emavfi_q10_best.flow.npz --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --tta --json \
    > runs/queueQ/q10_tta_eval.json && touch runs/queueQ/tta.done
fi
if [ -f runs/queueQ/tta.done ] && [ ! -f artifacts/q10_tta_eval.json ]; then
  cp runs/queueQ/q10_tta_eval.json artifacts/q10_tta_eval.json \
    && git add artifacts/q10_tta_eval.json \
    && git commit -q -m "TTA eval of the q10 polish flagship" || true
fi

echo "=== queueQ COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueQ/COMPLETE
