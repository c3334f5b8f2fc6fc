import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from jax.experimental.pallas import tpu as pltpu
from vfi_tpu.parallel.mesh import make_mesh
from vfi_tpu.models.ema_vfi import EMAVFI
from vfi_tpu.infer.pair import FrameInterpolator
mesh = make_mesh(data=-1, spatial=1)
model = EMAVFI(mid_channels=16, num_blocks=1, dcn_max_offset=1, warp_max_flow=2)
x = jnp.zeros((1, 16, 16, 3), jnp.float32)
params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
f0 = np.random.RandomState(0).rand(8, 16, 16, 3).astype(np.float32)
f1 = np.random.RandomState(1).rand(8, 16, 16, 3).astype(np.float32)
kw = dict(bf16=False, mesh=mesh, mid_channels=16, num_blocks=1,
          dcn_max_offset=1, warp_max_flow=2)
fi_x = FrameInterpolator(params, **kw)
ref = np.asarray(fi_x.midpoints(f0, f1))
fi_p = FrameInterpolator(params, use_pallas=True, **kw)
with pltpu.force_tpu_interpret_mode():
    got = np.asarray(fi_p.midpoints(f0, f1))
print("max diff DP pallas vs xla:", np.abs(ref-got).max())
assert np.abs(ref-got).max() < 5e-2
print("DP_PALLAS_OK")

# Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 python tools/verify_dp_pallas.py
# Validates the shard_map DP path with Pallas kernels on 8 virtual devices
# (interpret mode; slow — minutes on this 1-core host, not a pytest test).
