#!/bin/bash
# Round-2 session-11 chain #1b: replaces queueM's q8 tail after the 384^2
# recipe measured 349 s/epoch at microbatch 1 (200 epochs = ~19 h,
# unfinishable this round; see PERFORMANCE.md "384^2 flow-prior step
# anomaly"). The crop-size lever is parked; this chain runs the next
# measured lever instead:
#
#   q8r = effective-batch-16 fine-tune at 320^2 from q7 (batch 4 -> 8 gave
#   q5 25.81 -> q6 25.96; this doubles again via accum_steps 8 with the
#   proven microbatch-2 memory footprint), cosine 1e-4 -> 5e-6,
#   140 epochs, 2-epoch hardware gate, watcher securing.
#
# Then: eval + secure, TTA if it leads, headline bench, and finally
# `touch runs/queueM/COMPLETE` so the already-waiting queueN proceeds.
# Idempotent via step markers in runs/queueM2/.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueM2
LOG=runs/queueM2/queueM2.log
exec >>"$LOG" 2>&1
echo "=== queueM2 start $(date -u +%FT%TZ) ==="

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
if [ -f artifacts/emavfi_q8r_wip.npz ]; then
  INIT=artifacts/emavfi_q8r_wip.npz; INITF=artifacts/emavfi_q8r_wip.flow.npz
fi
echo "q8r warm start: $INIT"

Q8RFLAGS=(--batch_size 16 --accum_steps 8 --remat true --random_rotation false
          --consistent_jitter true --crop_size "[320,320]"
          --target_unit_range true --best_metric val_psnr
          --dcn_max_offset 2 --warp_max_flow 16 --use_pallas true
          --ema_decay 0.998 --flow_prior true
          --lr_schedule cosine --learning_rate 1e-4 --cosine_min_lr 5e-6)

bash tools/ckpt_watcher.sh q8r runs/q8r/best 600 &
W=$!; echo "$W" > runs/queueM2/watcher_q8r.pid

if [ ! -f runs/queueM2/q8rcheck.done ]; then
  timeout 5400 python train.py --config config/train_config.yaml \
    "${Q8RFLAGS[@]}" --num-epochs 2 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q8rcheck/ckpt --best_model_path runs/q8rcheck/best \
    && touch runs/queueM2/q8rcheck.done
  if [ ! -f runs/queueM2/q8rcheck.done ]; then
    echo "q8r 2-epoch gate FAILED - stopping"; kill "$W" 2>/dev/null
    touch runs/queueM/COMPLETE; exit 1
  fi
fi

if [ ! -f runs/queueM2/q8r.done ]; then
  timeout 18000 python train.py --config config/train_config.yaml \
    "${Q8RFLAGS[@]}" --num-epochs 140 \
    --init_model_path "$INIT" --init_flow_path "$INITF" \
    --checkpoint_path runs/q8r/ckpt --best_model_path runs/q8r/best \
    && touch runs/queueM2/q8r.done
fi

if [ -f runs/q8r/best.npz ] && [ ! -f runs/queueM2/q8reval.done ]; then
  timeout 3600 python eval.py --data-dir data/processed/val \
    --model_path runs/q8r/best.npz \
    --flow_model runs/q8r/best.flow.npz --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --json \
    > runs/queueM2/q8r_eval.json && touch runs/queueM2/q8reval.done
  echo "q8r eval:"; cat runs/queueM2/q8r_eval.json
  secure q8r runs/q8r/best runs/queueM2/q8r_eval.json
fi
kill "$W" 2>/dev/null

BESTRUN=$(python - <<'EOF'
import json, os
cands = [(json.load(open(f"artifacts/{r}_eval.json"))["mean_psnr"], r)
         for r in ("q5", "q6r", "q7", "q8r") if os.path.exists(f"artifacts/{r}_eval.json")]
print(max(cands)[1])
EOF
)
if [ ! -f "artifacts/${BESTRUN}_tta_eval.json" ] && [ ! -f runs/queueM2/tta.done ]; then
  timeout 7200 python eval.py --data-dir data/processed/val \
    --model_path "artifacts/emavfi_${BESTRUN}_best.npz" \
    --flow_model "artifacts/emavfi_${BESTRUN}_best.flow.npz" --flow_prior \
    --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --tta --json \
    > "runs/queueM2/${BESTRUN}_tta_eval.json" && touch runs/queueM2/tta.done
  cp "runs/queueM2/${BESTRUN}_tta_eval.json" "artifacts/${BESTRUN}_tta_eval.json"
  git add "artifacts/${BESTRUN}_tta_eval.json" && \
    git commit -q -m "TTA eval of ${BESTRUN} flagship" || true
fi

if [ ! -f runs/queueM2/benchfinal.done ]; then
  timeout 3600 python bench.py > artifacts/bench_session11.json \
    && touch runs/queueM2/benchfinal.done
  echo "final headline:"; cat artifacts/bench_session11.json
  git add artifacts/bench_session11.json && \
    git commit -q -m "Session-11 headline bench refresh" || true
fi

echo "=== queueM2 COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueM2/COMPLETE
touch runs/queueM/COMPLETE   # release the waiting queueN
