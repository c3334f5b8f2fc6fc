#!/bin/bash
# Round-5 chain AC: kernel/perf measurements + flow fine-tune, then the
# remaining quality evals. Runs after queueAB's bench + serving steps.
#   1. v5 column-tiled predicate kernel bench at R=1 (VERDICT r4 #2)
#   2. tpu_smoke (incl. the new dcn_v5_tiled bit-identity case)
#   3. wall-accurate xplane timeline at the b8 R=1 operating point (#7)
#   4. flow occlusion-masked fine-tune from qr1 + EPE + native eval (#5)
#   5. qr1 TTA-only eval (empty-artifact hygiene)
#   6. train-step time table, crop 128 then 256, bounded (#4)
#   7. qk3 k=3 + auto_scale 9.0 + TTA composition (#6)
#   8. soup evals (#6)
# Steps keyed on COMMITTED artifacts (restart-proof).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p runs/queueAC
LOG=runs/queueAC/queueAC.log
exec >>"$LOG" 2>&1
echo "=== queueAC start $(date -u +%FT%TZ) ==="

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
QR1FL=artifacts/emavfi_qr1_best.flow.npz

# --- step 0: finish the serving A/B (seq8 leg died on a transient -----------
# remote-compile-relay disconnect in queueAB; raw leg completed clean) -------
if [ ! -f artifacts/serve_seq_ab_r5.json ]; then
  if [ ! -s runs/queueAB/serve_raw.json ]; then
    timeout -k 5 2400 python tools/bench_serve.py --inprocess --raw --use_pallas \
      --model_path $QR1 --dcn_max_offset 1 --warp_max_flow 16 --size 720x1280 \
      --clients 4 --requests 24 > runs/queueAB/serve_raw.json
  fi
  for attempt in 1 2 3; do
    timeout -k 5 2400 python tools/bench_serve.py --inprocess --seq 8 --use_pallas \
      --model_path $QR1 --dcn_max_offset 1 --warp_max_flow 16 --size 720x1280 \
      --clients 4 --requests 12 > runs/queueAC/serve_seq8.json && break
    echo "seq8 attempt $attempt failed (relay flake?); retrying"
    sleep 30
  done
  if [ -s runs/queueAB/serve_raw.json ] && [ -s runs/queueAC/serve_seq8.json ]; then
    python - <<'PY'
import json
raw = json.load(open("runs/queueAB/serve_raw.json"))
seq = json.load(open("runs/queueAC/serve_seq8.json"))
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
    echo "serve A/B still failing; continuing with the rest of the queue"
  fi
fi

# --- step 1: v5t kernel bench at R=1 -----------------------------------------
if [ ! -f artifacts/v5t_bench_r5.log ]; then
  {
    echo "== synthetic regimes (zero/trained/worst), R=1, 720p, C=67 =="
    timeout -k 5 2400 python tools/bench_kernels.py --size 720p --radius 1 \
      --channels 67 --kernels v5,v5t --tile_w 128,256 --iters 16
    if [ -f runs/offsets_qr1_urban_720p.npz ]; then
      echo "== real qr1 offsets (Urban 720p), R=1 =="
      timeout -k 5 2400 python tools/bench_kernels.py --size 720p --radius 1 \
        --channels 67 --kernels v5,v5t --tile_w 128,256 --iters 16 \
        --offsets runs/offsets_qr1_urban_720p.npz
    else
      echo "== real-offsets npz missing; synthetic only =="
    fi
  } > runs/queueAC/v5t_bench.log 2>&1
  cp runs/queueAC/v5t_bench.log artifacts/v5t_bench_r5.log
  commit_retry "v5 tiled-predicate kernel bench at R=1 (VERDICT r4 #2)" \
    artifacts/v5t_bench_r5.log
fi

# --- step 2: tpu_smoke (8 cases incl. dcn_v5_tiled) --------------------------
if ! grep -q dcn_v5_tiled artifacts/tpu_smoke.json 2>/dev/null; then
  timeout -k 5 3600 python tools/tpu_smoke.py
  commit_retry "tpu-smoke round 5: dcn_v5_tiled bit-identity on hardware" \
    artifacts/tpu_smoke.json
fi

# --- step 3: timeline xplane attribution at b8 R=1 ---------------------------
if [ ! -f artifacts/profile_b8_r1_timeline.log ]; then
  timeout -k 5 1800 python tools/profile_forward.py --b 8 --iters 4 \
    --ckpt $QR1 --dcn_kernel v5 --radius 1 --conv_kernel pallas \
    > runs/queueAC/profile_b8_r1.log 2>&1
  cp runs/queueAC/profile_b8_r1.log artifacts/profile_b8_r1_timeline.log
  commit_retry "Wall-accurate xplane timeline attribution at b8 R=1 (VERDICT r4 #7)" \
    artifacts/profile_b8_r1_timeline.log
fi

# --- step 4: flow occlusion fine-tune + EPE ----------------------------------
RECIPE="--batch_size 16 --accum_steps 8 --remat true \
  --random_rotation false --consistent_jitter true \
  --crop_size [320,320] --target_unit_range true \
  --best_metric val_psnr --warp_max_flow 16 \
  --use_pallas true --ema_decay 0.998 --flow_prior true \
  --flow_photo_pyramid true --fuse_project true \
  --lr_schedule cosine --learning_rate 5e-5 --cosine_min_lr 5e-6"
if [ ! -f artifacts/qocc_epe.json ]; then
  if [ ! -f runs/qocc/best.flow.npz ]; then
    timeout -k 5 2700 python train.py --config config/train_config.yaml \
      $RECIPE --dcn_max_offset 1 --cascade_levels 2 \
      --flow_photo_occlusion true --num-epochs 30 \
      --init_model_path $QR1 --init_flow_path $QR1FL \
      --checkpoint_path runs/qocc/ckpt --best_model_path runs/qocc/best
  fi
  if [ -f runs/qocc/best.flow.npz ]; then
    timeout -k 5 1800 python eval.py --data-dir data/processed/val \
      --flow_model runs/qocc/best.flow.npz \
      --gt_flow_dir data/processed/other-gt-flow --json \
      > runs/queueAC/qocc_epe.json
    timeout -k 5 2700 python eval.py --data-dir data/processed/val --json \
      --model_path runs/qocc/best.npz --flow_model runs/qocc/best.flow.npz \
      --flow_prior --cascade_levels 2 --dcn_max_offset 1 \
      --warp_max_flow 16 --use_pallas > runs/queueAC/qocc_eval.json
    if [ -s runs/queueAC/qocc_epe.json ]; then
      cp runs/queueAC/qocc_epe.json artifacts/qocc_epe.json
      cp runs/queueAC/qocc_eval.json artifacts/qocc_eval.json 2>/dev/null
      cp runs/qocc/best.npz artifacts/emavfi_qocc_best.npz 2>/dev/null
      cp runs/qocc/best.flow.npz artifacts/emavfi_qocc_best.flow.npz
      echo "qocc EPE:"; cat artifacts/qocc_epe.json
      echo "qocc PSNR:"; cat artifacts/qocc_eval.json 2>/dev/null
      commit_retry "Occlusion-masked flow fine-tune from qr1: EPE + PSNR (VERDICT r4 #5)" \
        artifacts/qocc_epe.json artifacts/emavfi_qocc_best.flow.npz \
        artifacts/emavfi_qocc_best.npz artifacts/qocc_eval.json
    fi
  else
    echo "qocc fine-tune produced no best.flow.npz"
  fi
fi

# --- step 5: qr1 TTA-only (recommit the empty artifact) ----------------------
if [ ! -s artifacts/qr1_tta_eval.json ]; then
  timeout -k 5 4200 python eval.py --data-dir data/processed/val --json \
    --flow_prior --warp_max_flow 16 --use_pallas \
    --model_path $QR1 --flow_model $QR1FL \
    --cascade_levels 2 --dcn_max_offset 1 --tta \
    > runs/queueAC/qr1_tta.json
  if [ -s runs/queueAC/qr1_tta.json ]; then
    cp runs/queueAC/qr1_tta.json artifacts/qr1_tta_eval.json
    commit_retry "qr1 TTA eval (replaces empty artifact from interrupted queueAA)" \
      artifacts/qr1_tta_eval.json
  fi
fi

# --- step 6: train-step time table (bounded) ---------------------------------
if [ ! -f artifacts/train_step_bench_r5.json ]; then
  timeout -k 5 5400 python tools/bench_train_step.py --crop 128 --batch 8 \
    --accum 4 --json_out runs/queueAC/train_step_128.json \
    > runs/queueAC/train_step_128.log 2>&1
  if [ -s runs/queueAC/train_step_128.json ]; then
    cp runs/queueAC/train_step_128.json artifacts/train_step_bench_r5.json
    commit_retry "Train-step time table: XLA vs pallas vs pallas+conv, crop 128 (VERDICT r4 #4)" \
      artifacts/train_step_bench_r5.json
  else
    echo "train_step bench failed:"; tail -5 runs/queueAC/train_step_128.log
  fi
fi

# --- step 7: qk3 composition -------------------------------------------------
if [ ! -f artifacts/qk3_autoscale_tta_eval.json ]; then
  timeout -k 5 4200 python eval.py --data-dir data/processed/val --json \
    --flow_prior --warp_max_flow 16 --use_pallas \
    --model_path $QK3 --flow_model artifacts/emavfi_qk3_best.flow.npz \
    --cascade_levels 3 --dcn_max_offset 2 \
    --auto_scale 9.0 --tta > runs/queueAC/qk3_as9_tta.json
  if [ -s runs/queueAC/qk3_as9_tta.json ]; then
    cp runs/queueAC/qk3_as9_tta.json artifacts/qk3_autoscale_tta_eval.json
    commit_retry "qk3 (k=3) lever composition: auto_scale 9.0 + TTA (VERDICT r4 #6)" \
      artifacts/qk3_autoscale_tta_eval.json
  fi
fi

# --- step 8: soup evals ------------------------------------------------------
EVAL="timeout -k 5 2700 python eval.py --data-dir data/processed/val --json \
  --flow_prior --warp_max_flow 16 --use_pallas"
if [ ! -f artifacts/soup_r5_eval.json ]; then
  $EVAL --model_path artifacts/emavfi_soup_q13qr1.npz \
    --flow_model artifacts/emavfi_soup_q13qr1.flow.npz \
    --cascade_levels 2 --dcn_max_offset 1 > runs/queueAC/soup_q13qr1_r1.json
  $EVAL --model_path artifacts/emavfi_soup_r4x3.npz \
    --flow_model artifacts/emavfi_soup_r4x3.flow.npz \
    --cascade_levels 2 --dcn_max_offset 1 > runs/queueAC/soup3_r1.json
  $EVAL --model_path artifacts/emavfi_soup_q13qk3.npz \
    --flow_model artifacts/emavfi_soup_q13qk3.flow.npz \
    --cascade_levels 3 --dcn_max_offset 2 > runs/queueAC/soup_q13qk3_k3.json
  python - <<'PY'
import json, glob
rows = {}
for p in sorted(glob.glob("runs/queueAC/soup*.json")):
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

echo "=== queueAC COMPLETE $(date -u +%FT%TZ) ==="
touch runs/queueAC/COMPLETE
