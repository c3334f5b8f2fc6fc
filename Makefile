# Convenience entry points (pure-Python package; no build step required —
# the native loader compiles on demand via vfi_tpu/native/build.py).

.PHONY: test native bench train eval verify-multichip tpu-smoke

# Hardware-in-the-loop Pallas kernel regression (real TPU, bounded
# subprocess per case; writes artifacts/tpu_smoke.json)
tpu-smoke:
	python tools/tpu_smoke.py

test:
	python -m pytest tests/ -q

native:
	python vfi_tpu/native/build.py

bench:
	python bench.py

train:
	python train.py --config config/train_config.yaml

eval:
	python eval.py --data-dir data/processed/val --model_path best_ema_vfi.npz

verify-multichip:
	python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
