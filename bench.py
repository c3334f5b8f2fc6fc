"""Benchmark: interpolated frames/sec/chip at 720p (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline divides by the measured reference CPU throughput (generous
upper bound 0.0238 frames/s — torch reconstruction with the DCN layers
replaced by plain convs, single-core fp32 at 1280x720; see BASELINE.md
"CPU baseline"). The north-star target is >= 10x.

The flagship TPU configuration (round 5) is R=1 bounded-offset sampling
(DCN offsets clamped to 1 px, warp flow to 16 px — architecture-level
design choices of the TPU build, see EMAVFI docstring) with the fused
Pallas kernels and the shipped qr1 checkpoint, which was fine-tuned at
R=1 and adjudicated across the full lever table: native composition
26.212 dB (vs R=2 q13 26.222), auto_scale 9.0 + TTA composition
26.806 dB vs the R=2 record 26.729 (artifacts/qr1_autoscale_tta_eval
.json) — better quality AND a ~2x smaller DCN blend window (9 vs 25
(tap, shift) pairs). Offset-data-dependent kernel cost; see
docs/PERFORMANCE.md "Bench honesty". If a kernel fails to compile on
the current toolchain the bench degrades R=1 -> R=2 -> XLA
shift-decomposition -> exact gather, and reports which configuration
actually ran.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPU_BASELINE_FPS = 0.0238  # see BASELINE.md "CPU baseline"

B, H, W = 4, 720, 1280
ITERS = 10


def _measure(model_kwargs: dict, b=B, h=H, w=W, iters=ITERS) -> float:
    """Steady-state throughput: `iters` forwards chained inside ONE jit
    (frame0 of step k+1 = prediction of step k — the data dependence keeps
    XLA from collapsing the chain), so the host<->device relay round-trip
    (~25 ms here) and per-dispatch gaps are amortized away. This is the
    pipelined-serving number; single-call latency is strictly worse by one
    relay round-trip."""
    import jax
    import jax.numpy as jnp

    from vfi_tpu.models import EMAVFI

    # Trained weights, not init: the bounded-shift DCN formulation's cost
    # is offset-data-dependent (init offsets are exactly zero = best case,
    # ~29% faster than trained), while the reference's gather-based DCN is
    # offset-independent — the honest cross-framework number uses a real
    # checkpoint. Fall back to init params if the artifact is absent.
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
    if "--ckpt" in sys.argv:  # ablation override (offset-data-dependent cost)
        i = sys.argv.index("--ckpt")
        if i + 1 >= len(sys.argv) or sys.argv[i + 1].startswith("--"):
            sys.exit("bench.py: --ckpt requires a checkpoint path argument")
        ckpt = sys.argv[i + 1]
    else:
        # R=1 flagship checkpoint first (its offsets were TRAINED under
        # the R=1 clamp, so the R=1 configs below measure the real
        # deployed regime). qocc is the shipped quality flagship
        # (native 26.251; composed record 26.857 — artifacts/
        # qocc_autoscale_tta_eval.json); qr1 and the R=2 checkpoints
        # remain as fallbacks.
        ckpt = next((p for p in (os.path.join(art, "emavfi_qocc_best.npz"),
                                 os.path.join(art, "emavfi_qr1_best.npz"),
                                 os.path.join(art, "emavfi_q2_best.npz"),
                                 os.path.join(art, "emavfi_long2_best.npz"))
                     if os.path.exists(p)), None)
    extra = {}
    if ckpt:
        from vfi_tpu.utils.convert import infer_model_dims, load_params_npz

        params = load_params_npz(ckpt)
        # checkpoint topology (e.g. the q13 fuse_project lane-aligned
        # fusion) is auto-detected off the tree, like the engine does
        extra["fuse_project"] = infer_model_dims(params).get(
            "fuse_project", False)
    model = EMAVFI(dtype=jnp.bfloat16, **model_kwargs, **extra)
    if not ckpt:
        small = jnp.zeros((1, 64, 64, 3), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), small, small)

    # Engine-parity HBM guard (infer/pair.py `max_px_per_launch`): batches
    # over the pixel budget run as sequential sub-launches inside the same
    # graph (a zero-valued data dependence forces XLA to schedule them
    # one at a time, bounding peak HBM to one chunk's working set) — so the
    # sweep measures what a production batch of this size actually does
    # instead of dying in an XLA OOM (the round-2 b16 failure).
    MAX_PX = 8_000_000
    cap = max(1, MAX_PX // (h * w))
    n_chunks = -(-b // cap) if b > cap else 1
    chunk = -(-b // n_chunks)

    def chain(p, a, b_):
        def body(x, _):
            if n_chunks == 1:
                return model.apply(p, x, b_), None
            outs, carry = [], jnp.zeros((), x.dtype)
            for i in range(n_chunks):
                xi = x[i * chunk:(i + 1) * chunk] + carry
                oi = model.apply(p, xi, b_[i * chunk:(i + 1) * chunk])
                outs.append(oi)
                carry = 0.0 * oi.mean().astype(x.dtype)
            return jnp.concatenate(outs, axis=0), None

        y, _ = jax.lax.scan(body, a, None, length=iters)
        return y.mean()  # scalar: real completion through the async relay

    fwd = jax.jit(chain)
    f0 = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 3), jnp.float32)
    f1 = jax.random.uniform(jax.random.PRNGKey(2), (b, h, w, 3), jnp.float32)
    float(fwd(params, f0, f1))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(fwd(params, f0, f1))
        best = min(best, time.time() - t0)
    return b * iters / best


def main() -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # sitecustomize pins the TPU backend; re-apply the env override so
        # `JAX_PLATFORMS=cpu python bench.py --smoke` really runs on CPU.
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    smoke = "--smoke" in sys.argv  # tiny-shape CPU validation of the harness
    shape = dict(b=1, h=64, w=128, iters=2) if smoke else {}

    # Order: proven-fastest first. The v4 Pallas DCN kernel beats the XLA
    # shifts path at every offset regime (docs/PERFORMANCE.md); XLA shifts
    # and exact-gather remain as degradation rungs if Mosaic fails.
    configs = [
        # round 5: R=1 flagship (qr1 checkpoint trained at this clamp).
        # The DCN blend window shrinks 25 -> 9 (tap, shift) pairs on a
        # stack that is ~60% of the R=2 frame (docs/PERFORMANCE.md
        # "dcn_max_offset=1").
        ("pallas-v5+conv-r1", dict(dcn_max_offset=1, warp_max_flow=16,
                                   use_pallas=True, dcn_kernel="v5",
                                   conv_kernel="pallas")),
        ("pallas-v5-r1", dict(dcn_max_offset=1, warp_max_flow=16,
                              use_pallas=True, dcn_kernel="v5")),
        # R=2 rungs (round-4 flagship family) — degradation fallbacks
        ("pallas-v5+conv", dict(dcn_max_offset=2, warp_max_flow=16,
                                use_pallas=True, dcn_kernel="v5",
                                conv_kernel="pallas")),
        # v5 (transposed layout, dot_nhwc orientation): C in sublanes ->
        # lane-dense blends; measured 25.9 ms/layer trained vs v4-tw256's
        # ~30 and untiled v4's 32.7 at 720p (docs/PERFORMANCE.md round 3)
        ("pallas-v5", dict(dcn_max_offset=2, warp_max_flow=16,
                           use_pallas=True, dcn_kernel="v5")),
        # tw256: per-tile skip predicates beat full-width ones on trained
        # offsets (~8-18%/layer at 720p, bit-identical output —
        # docs/PERFORMANCE.md "Column-tiled predicates on trained offsets")
        ("pallas-v4-tw256", dict(dcn_max_offset=2, warp_max_flow=16,
                                 use_pallas=True, dcn_tile_w=256)),
        ("pallas-v4", dict(dcn_max_offset=2, warp_max_flow=16,
                           use_pallas=True)),
        ("xla-shifts", dict(dcn_max_offset=2, warp_max_flow=16)),
        ("exact", dict()),
    ]
    if smoke:  # CPU: Pallas needs interpret mode; just validate the harness
        configs = [c for c in configs if not c[1].get("use_pallas")]
    fps, used, used_kwargs, best_b = None, None, None, shape.get("b", B)
    # The two Pallas generations trade places between the per-layer
    # microbench and the full-model composition (v5's host-side shifted
    # copies cost HBM the kernel saves back — round 3), so the top TWO
    # configs are MEASURED at the base batch and the faster one wins;
    # later rungs still only run if everything above them fails.
    measured = 0
    for name, kwargs in configs:
        try:
            f_try = _measure(kwargs, **shape)
            measured += 1
            print(f"# bench config {name}: {f_try:.3f} frames/s",
                  file=sys.stderr)
            if fps is None or f_try > fps:
                fps, used, used_kwargs = f_try, name, kwargs
            if measured >= 2:
                break
        except Exception as e:  # compile/OOM on this toolchain -> degrade
            print(f"# bench config {name} failed: {type(e).__name__}",
                  file=sys.stderr)
    if fps is None:
        return 1

    if not smoke:
        # Throughput/chip is maximized over batch: full b2-b16 sweep on the
        # winning config (over-budget batches run chunked via the engine-
        # parity HBM guard in _measure, so the sweep completes instead of
        # OOMing), keep the best.
        sweep = {B: fps}
        # b6 included: the v5-stage curve peaks between b4 and b8
        # (measured 7.49 / 7.81 / 7.11 at b4/b6/b8, round 3)
        for b_try in (2, 6, 8, 16):
            try:
                sweep[b_try] = _measure(used_kwargs, b=b_try)
            except Exception as e:
                print(f"# bench batch {b_try} failed: {type(e).__name__}",
                      file=sys.stderr)
                continue
            print(f"# bench batch {b_try}: {sweep[b_try]:.3f} frames/s",
                  file=sys.stderr)
        best_b, fps = max(sweep.items(), key=lambda kv: kv[1])

    res = "smoke" if smoke else "720p"
    print(json.dumps({
        "metric": f"interpolated_frames_per_sec_per_chip_{res}"
                  f"_b{best_b}_{used}",
        "value": round(fps, 3),
        "unit": "frames/s",
        # smoke runs a tiny shape on CPU: dividing by the 720p CPU baseline
        # would print a meaningless ratio, so report null there
        "vs_baseline": None if smoke else round(fps / CPU_BASELINE_FPS, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
