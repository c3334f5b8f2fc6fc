#!/bin/bash
# Round-2 session-11 chain #1c: final pivot after two measured cost cliffs
# (PERFORMANCE.md "384^2 flow-prior step anomaly" + its correction: the
# length-8 accumulation scan is ~8x/microstep; both 384^2 and batch-16
# recipes are unfinishable in session wall time).
#
#   q8r2 = q7-recipe cosine-RESTART continuation: batch 8 / accum 4
#   (microbatch 2, the proven 33 s/epoch configuration), 320^2 crops,
#   cosine 1e-4 -> 5e-6 over 160 epochs, warm-started from q7 (25.93).
#   Precedent: the q5 -> q5b restart gained +0.09 dB.
#
# Then: eval + secure, TTA if it leads, headline bench, release queueN.
# Idempotent via step markers in runs/queueM3/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueM3
LOG=runs/queueM3/queueM3.log
exec >>"$LOG" 2>&1
echo "=== queueM3 start $(date -u +%FT%TZ) ==="

secure() {  # secure <run_name> <best_prefix> <eval_json>
  local RUN="$1" BEST="$2" EVJ="$3"
  cp "$BEST.npz" "artifacts/emavfi_${RUN}_best.npz"
  [ -f "$BEST.flow.npz" ] && cp "$BEST.flow.npz" "artifacts/emavfi_${RUN}_best.flow.npz"
  [ -f "$EVJ" ] && cp "$EVJ" "artifacts/${RUN}_eval.json"
  git add -f "artifacts/emavfi_${RUN}_best.npz" "artifacts/emavfi_${RUN}_best.flow.npz" \
          "artifacts/${RUN}_eval.json" 2>/dev/null
  git commit -q -m "Secure ${RUN} best checkpoint + eval (weights tracked)" || true
}

INIT=artifacts/emavfi_q7_best.npz; INITF=artifacts/emavfi_q7_best.flow.npz
if [ -f artifacts/emavfi_q8r2_wip.npz ]; then
  INIT=artifacts/emavfi_q8r2_wip.npz; INITF=artifacts/emavfi_q8r2_wip.flow.npz
fi
echo "q8r2 warm start: $INIT"

FLAGS=(--batch_size 8 --accum_steps 4 --remat true --random_rotation false
       --consistent_jitter true --crop_size "[320,320]"
       --target_unit_range true --best_metric val_psnr
       --dcn_max_offset 2 --warp_max_flow 16 --use_pallas true
       --ema_decay 0.998 --flow_prior true
       --lr_schedule cosine --learning_rate 1e-4 --cosine_min_lr 5e-6)

bash tools/ckpt_watcher.sh q8r2 runs/q8r2/best 600 &
W=$!; echo "$W" > runs/queueM3/watcher.pid

# No fresh 2-epoch gate: this exact configuration (recipe, crop, accum,
# shapes) is the one q7 just trained 160 epochs with on this toolchain.
if [ ! -f runs/queueM3/q8r2.done ]; then
  timeout 14400 python train.py --config config/train_config.yaml \
    "${FLAGS[@]}" --num-epochs 160 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q8r2/ckpt --best_model_path runs/q8r2/best \
    && touch runs/queueM3/q8r2.done
fi

if [ -f runs/q8r2/best.npz ] && [ ! -f runs/queueM3/q8r2eval.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path runs/q8r2/best.npz \
    --flow_model runs/q8r2/best.flow.npz --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
    > runs/queueM3/q8r2_eval.json && touch runs/queueM3/q8r2eval.done
  echo "q8r2 eval:"; cat runs/queueM3/q8r2_eval.json
  secure q8r2 runs/q8r2/best runs/queueM3/q8r2_eval.json
fi
kill "$W" 2>/dev/null

BESTRUN=$(python - <<'EOF'
import json, os
cands = [(json.load(open(f"artifacts/{r}_eval.json"))["mean_psnr"], r)
         for r in ("q5", "q6r", "q7", "q8r2") if os.path.exists(f"artifacts/{r}_eval.json")]
print(max(cands)[1])
EOF
)
if [ ! -f "artifacts/${BESTRUN}_tta_eval.json" ] && [ ! -f runs/queueM3/tta.done ]; then
  timeout 7200 python eval.py --data-dir data/processed/val \
    --model_path "artifacts/emavfi_${BESTRUN}_best.npz" \
    --flow_model "artifacts/emavfi_${BESTRUN}_best.flow.npz" --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --tta --json \
    > "runs/queueM3/${BESTRUN}_tta_eval.json" && touch runs/queueM3/tta.done
  cp "runs/queueM3/${BESTRUN}_tta_eval.json" "artifacts/${BESTRUN}_tta_eval.json"
  git add "artifacts/${BESTRUN}_tta_eval.json" && \
    git commit -q -m "TTA eval of ${BESTRUN} flagship" || true
fi

if [ ! -f runs/queueM3/benchfinal.done ]; then
  timeout 3600 python bench.py > artifacts/bench_session11.json \
    && touch runs/queueM3/benchfinal.done
  echo "final headline:"; cat artifacts/bench_session11.json
  git add artifacts/bench_session11.json && \
    git commit -q -m "Session-11 headline bench refresh" || true
fi

echo "=== queueM3 COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueM3/COMPLETE
touch runs/queueM/COMPLETE   # release the waiting queueN
