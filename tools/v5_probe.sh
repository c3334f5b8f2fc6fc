#!/bin/bash
# Bounded bisection of the v5 kernel's Mosaic lowering on real hardware.
# Each stage compiles in a KILL-enforced subprocess (a TERM-ignoring
# wedged RPC must die too). Usage: tools/v5_probe.sh [channels] [stages]
set -u
cd "$(dirname "$0")/.."
C="${1:-67}"
STAGES="${2:-empty dma noblend nodot full}"
for dbg in $STAGES; do
  echo "=== v5 stage $dbg (C=$C) $(date -u +%T) ==="
  timeout -k 5 420 python - "$C" "$dbg" <<'PY'
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from vfi_tpu.ops.pallas.sampling import deform_conv2d_pallas_v5
cin = int(sys.argv[1]); dbg = sys.argv[2]
b,h,w,k,R = 1,16,256,3,2
rng = np.random.default_rng(0); dt = jnp.bfloat16
x  = jnp.asarray(rng.standard_normal((b,h,w,cin)), dt)
off= jnp.asarray(np.clip(rng.standard_normal((b,h,w,18))*1.2,-R+.01,R-.01), dt)
msk= jnp.asarray(rng.uniform(0,1,(b,h,w,9)), dt)
wt = jnp.asarray(rng.standard_normal((k,k,cin,cin))*0.1, dt)
t0=time.time()
out = np.asarray(deform_conv2d_pallas_v5(x, off, msk, wt, None, max_offset=R, _dbg=dbg))
dtc = time.time()-t0
if dbg == "full":
    from vfi_tpu.ops.deform_conv_shifts import deform_conv2d_shifts
    ref = np.asarray(deform_conv2d_shifts(x, off, msk, wt, None, max_offset=R))
    print(f"stage {dbg}: ok {dtc:.1f}s max_err {np.abs(out.astype(np.float32)-ref.astype(np.float32)).max():.5f}")
else:
    print(f"stage {dbg}: ok {dtc:.1f}s")
PY
  rc=$?
  [ $rc -ne 0 ] && echo "stage $dbg FAILED rc=$rc"
done
