#!/bin/bash
# Round-4 fine-tune/eval chain (VERDICT r3 #4/#5/#6), serialized on the
# single TPU. Steps, each idempotent via markers in runs/queueY/:
#
#   1. auto_scale threshold sweep on the SHIPPED q13 flagship (eval-only):
#      re-tune the 7.5 threshold that was inherited from the q9 lineage.
#   2. dcn_max_offset=1 fine-tune from q13 (two rounds overdue): offsets
#      p99 ~1.2 px; R=1 cuts blend pairs 25 -> 9. Bounded; eval at R=1.
#   3. cascade_levels=3 fine-tune from q13 (previously only evaluated
#      UNTRAINED, -0.14 dB). Bounded; eval at k=3.
#   4. flow_levels=4 fine-tune (Urban large-displacement EPE fix): flow
#      params remapped via tools/remap_flow_levels.py. Bounded; EPE eval.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueY
LOG=runs/queueY/queueY.log
exec >>"$LOG" 2>&1
echo "=== queueY start $(date -u +%FT%TZ) ==="

commit_retry() {
  local msg="$1"; shift
  for a in 1 2 3 4 5; do
    if git add -f "$@" && git commit -q -m "$msg"; then return 0; fi
    sleep $((a * 5))
  done
  echo "COMMIT FAILED after retries: $msg"
  return 1
}

M=artifacts/emavfi_q13_best.npz
F=artifacts/emavfi_q13_best.flow.npz
COMMON="--data-dir data/processed/val --model_path $M --flow_model $F \
  --flow_prior --cascade_levels 2 --dcn_max_offset 2 --warp_max_flow 16 \
  --use_pallas --json"

# --- step 1: auto_scale threshold sweep (q13) --------------------------------
for T in 5.5 6.5 9.0; do
  if [ ! -f "runs/queueY/as_$T.done" ]; then
    timeout -k 5 2400 python eval.py $COMMON --auto_scale "$T" \
      > "runs/queueY/q13_as_$T.json" && touch "runs/queueY/as_$T.done"
    echo "auto_scale $T:"; cat "runs/queueY/q13_as_$T.json" 2>/dev/null
  fi
done
if [ ! -f runs/queueY/assweep.done ] && [ -f runs/queueY/as_9.0.done ]; then
  python - <<'PY'
import json, glob, shutil
rows = {}
for p in glob.glob("runs/queueY/q13_as_*.json"):
    t = p.split("_as_")[1][:-5]
    try:
        rows[t] = json.load(open(p))["mean_psnr"]
    except Exception:
        pass
rows["7.5 (round-3)"] = 26.468
out = {"sweep": rows, "note": "auto_scale threshold on shipped q13, native composition (flow_prior+cascade2)"}
json.dump(out, open("artifacts/q13_autoscale_sweep.json", "w"), indent=1)
print(out)
PY
  touch runs/queueY/assweep.done
  commit_retry "q13 auto_scale threshold sweep (VERDICT r3 #5)" artifacts/q13_autoscale_sweep.json
fi

RECIPE="--batch_size 16 --accum_steps 8 --remat true \
  --random_rotation false --consistent_jitter true \
  --crop_size [320,320] --target_unit_range true \
  --best_metric val_psnr --warp_max_flow 16 \
  --use_pallas true --ema_decay 0.998 --flow_prior true \
  --flow_photo_pyramid true --fuse_project true \
  --lr_schedule cosine --learning_rate 5e-5 --cosine_min_lr 5e-6"

# --- step 3: cascade k=3 fine-tune + eval ------------------------------------
if [ ! -f runs/queueY/k3.done ]; then
  timeout -k 5 2700 python train.py --config config/train_config.yaml \
    $RECIPE --dcn_max_offset 2 --cascade_levels 3 --num-epochs 30 \
    --init_model_path $M --init_flow_path $F \
    --checkpoint_path runs/qk3/ckpt --best_model_path runs/qk3/best
  touch runs/queueY/k3.done
fi
if [ -f runs/qk3/best.npz ] && [ ! -f runs/queueY/k3eval.done ]; then
  timeout -k 5 2400 python eval.py --data-dir data/processed/val \
    --model_path runs/qk3/best.npz --flow_model runs/qk3/best.flow.npz \
    --flow_prior --cascade_levels 3 --dcn_max_offset 2 --warp_max_flow 16 \
    --use_pallas --json > runs/queueY/qk3_eval.json \
    && touch runs/queueY/k3eval.done
  if [ -s runs/queueY/qk3_eval.json ]; then
    cp runs/queueY/qk3_eval.json artifacts/qk3_eval.json
    cp runs/qk3/best.npz artifacts/emavfi_qk3_best.npz
    cp runs/qk3/best.flow.npz artifacts/emavfi_qk3_best.flow.npz
    echo "cascade3 eval:"; cat artifacts/qk3_eval.json
    commit_retry "cascade_levels=3 fine-tune + eval (VERDICT r3 #5)" \
      artifacts/qk3_eval.json artifacts/emavfi_qk3_best.npz artifacts/emavfi_qk3_best.flow.npz
  fi
fi

# --- step 4: flow_levels=4 fine-tune + EPE eval --------------------------------
if [ ! -f runs/queueY/fl4init.done ]; then
  python tools/remap_flow_levels.py $F runs/queueY/q13_flow4_init.npz --add 1 \
    && touch runs/queueY/fl4init.done
fi
if [ -f runs/queueY/fl4init.done ] && [ ! -f runs/queueY/fl4.done ]; then
  timeout -k 5 2700 python train.py --config config/train_config.yaml \
    $RECIPE --dcn_max_offset 2 --cascade_levels 2 --flow_levels 4 \
    --num-epochs 30 \
    --init_model_path $M --init_flow_path runs/queueY/q13_flow4_init.npz \
    --checkpoint_path runs/qfl4/ckpt --best_model_path runs/qfl4/best
  touch runs/queueY/fl4.done
fi
if [ -f runs/qfl4/best.flow.npz ] && [ ! -f runs/queueY/fl4eval.done ]; then
  timeout -k 5 1800 python eval.py --data-dir data/processed/val \
    --flow_model runs/qfl4/best.flow.npz --flow_levels 4 \
    --gt_flow_dir data/processed/other-gt-flow --json \
    > runs/queueY/qfl4_epe.json \
  && timeout -k 5 2400 python eval.py --data-dir data/processed/val \
    --model_path runs/qfl4/best.npz --flow_model runs/qfl4/best.flow.npz \
    --flow_levels 4 --flow_prior --cascade_levels 2 --dcn_max_offset 2 \
    --warp_max_flow 16 --use_pallas --json > runs/queueY/qfl4_eval.json \
    && touch runs/queueY/fl4eval.done
  if [ -s runs/queueY/qfl4_epe.json ]; then
    cp runs/queueY/qfl4_epe.json artifacts/qfl4_epe.json
    cp runs/queueY/qfl4_eval.json artifacts/qfl4_eval.json 2>/dev/null
    cp runs/qfl4/best.npz artifacts/emavfi_qfl4_best.npz 2>/dev/null
    cp runs/qfl4/best.flow.npz artifacts/emavfi_qfl4_best.flow.npz
    echo "flow4 EPE:"; cat artifacts/qfl4_epe.json
    echo "flow4 PSNR:"; cat artifacts/qfl4_eval.json 2>/dev/null
    commit_retry "flow_levels=4 fine-tune: EPE + PSNR eval (VERDICT r3 #4)" \
      artifacts/qfl4_epe.json artifacts/emavfi_qfl4_best.flow.npz
  fi
fi

# --- step 2: R=1 fine-tune + eval --------------------------------------------
if [ ! -f runs/queueY/r1.done ]; then
  timeout -k 5 2700 python train.py --config config/train_config.yaml \
    $RECIPE --dcn_max_offset 1 --cascade_levels 2 --num-epochs 30 \
    --init_model_path $M --init_flow_path $F \
    --checkpoint_path runs/qr1/ckpt --best_model_path runs/qr1/best
  touch runs/queueY/r1.done
fi
if [ -f runs/qr1/best.npz ] && [ ! -f runs/queueY/r1eval.done ]; then
  timeout -k 5 2400 python eval.py --data-dir data/processed/val \
    --model_path runs/qr1/best.npz --flow_model runs/qr1/best.flow.npz \
    --flow_prior --cascade_levels 2 --dcn_max_offset 1 --warp_max_flow 16 \
    --use_pallas --json > runs/queueY/qr1_eval.json \
    && touch runs/queueY/r1eval.done
  if [ -s runs/queueY/qr1_eval.json ]; then
    cp runs/queueY/qr1_eval.json artifacts/qr1_eval.json
    cp runs/qr1/best.npz artifacts/emavfi_qr1_best.npz
    cp runs/qr1/best.flow.npz artifacts/emavfi_qr1_best.flow.npz
    echo "R=1 eval:"; cat artifacts/qr1_eval.json
    commit_retry "dcn_max_offset=1 fine-tune + eval (VERDICT r3 #6)" \
      artifacts/qr1_eval.json artifacts/emavfi_qr1_best.npz artifacts/emavfi_qr1_best.flow.npz
  fi
fi

echo "=== queueY COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueY/COMPLETE
