"""Hardware-in-the-loop Pallas kernel regression smoke (`make tpu-smoke`).

The Pallas unit tests run in interpret mode (CPU), so a Mosaic/toolchain
bump could silently break the production kernels' lowering or numerics on
the real chip between benches. This drives each production kernel at a
small shape ON THE REAL TPU, asserts numerics against the XLA reference
ops, and writes `artifacts/tpu_smoke.json`. It plays the role torchvision's
CI plays for the reference's DeformConv2d (reference
src/models/ema_vfi.py:45-51): an executable guarantee that the native
sampling kernels still work.

Every case runs in a BOUNDED SUBPROCESS: a kernel structure Mosaic loops on
can wedge this environment's remote compile relay for 45+ minutes (see
docs/PERFORMANCE.md "Operational hazard"), so a hung compile must die by
timeout without taking the parent with it.

Usage:
    python tools/tpu_smoke.py              # all cases, ~2-4 min total
    python tools/tpu_smoke.py --case dcn_v4   # one case, in-process
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CASES = ("dcn_v4_f32", "dcn_v4", "dcn_v4_tiled", "dcn_v5", "dcn_v5_tiled",
         "conv_chain", "warp_v2",
         "model_720p")
# model_720p compiles TWO full-model graphs (Pallas + XLA) in one
# subprocess; everything else is a single small kernel.
CASE_TIMEOUT_S = {"model_720p": 900}
PER_CASE_TIMEOUT_S = 420  # first compile 20-40s; relay may queue behind other work


def _dcn_inputs(h, w, c, cout, R, dtype, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((1, h, w, c)).astype(np.float32)
    # trained-regime offsets (|d| ~ 0.3 px straddling zero — representative
    # of real serving, docs/PERFORMANCE.md offset_stats finding)
    off = rng.uniform(-0.3, 0.3, (1, h, w, 2 * 9)).astype(np.float32)
    msk = rng.uniform(0.2, 1.0, (1, h, w, 9)).astype(np.float32)
    wgt = (rng.standard_normal((3, 3, c, cout)) / np.sqrt(9 * c)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    return x, off, msk, wgt, bias


def run_case(case: str) -> dict:
    import jax.numpy as jnp
    import numpy as np

    from vfi_tpu.ops.deform_conv_shifts import deform_conv2d_shifts
    from vfi_tpu.ops.pallas.sampling import (bounded_warp_pallas_v2,
                                             deform_conv2d_pallas_v4)
    from vfi_tpu.ops.warp import warp

    t0 = time.time()
    if case == "dcn_v4_f32":
        # LOGIC check: untiled kernel in f32. NOT round-off-free on TPU:
        # both paths' dots run on the MXU at DEFAULT precision, which
        # truncates f32 operands to bf16 passes — the two paths structure
        # those passes differently, so the floor is bf16-ulp-scale relative
        # error even with f32 storage (measured 0.0068 at |out|~4 on
        # 2026-08-17 hardware, ~= scale * 2^-9). tol = 4 bf16 ulp of the
        # reference's max magnitude; a wrongly-skipped (tap, shift) pair or
        # wrong predicate is an O(0.3) error, ~5x above tol, and blend
        # weight-math bugs land in between — this case still pins logic
        # where the bf16 case's looser reorder-noise tol cannot.
        x, off, msk, wgt, bias = _dcn_inputs(32, 256, 67, 67, 2, "f32")
        args = [jnp.asarray(a) for a in (x, off, msk, wgt, bias)]
        got = np.asarray(deform_conv2d_pallas_v4(*args, max_offset=2),
                         np.float32)
        ref = np.asarray(deform_conv2d_shifts(*args, max_offset=2), np.float32)
        tol = 4 * float(np.max(np.abs(ref))) * 2.0 ** -8
    elif case == "dcn_v4":
        # PRECISION check: production serving dtype (bf16). The kernel
        # accumulates 9 tap matmuls into a bf16 out block and blends in
        # bf16 (by design, matching the XLA shifts op's compute dtype),
        # but the two paths ORDER the ~18 roundings differently, so the
        # max elementwise gap is a few bf16 ulp at the output scale —
        # measured 0.078 ~ 2.5 ulp at |out|~4 on 2026-08-17 hardware.
        # tol = 8 ulp of the reference's max magnitude: loose enough for
        # reorder noise, far below any real logic break (~0.3, see the f32
        # case which pins logic at a tighter 4-ulp tol).
        x, off, msk, wgt, bias = _dcn_inputs(32, 256, 67, 67, 2, "bf16")
        args = [jnp.asarray(a, jnp.bfloat16) for a in (x, off, msk, wgt, bias)]
        got = np.asarray(deform_conv2d_pallas_v4(*args, max_offset=2),
                         np.float32)
        ref = np.asarray(deform_conv2d_shifts(*args, max_offset=2), np.float32)
        scale = float(np.max(np.abs(ref)))
        tol = 8 * scale * 2.0 ** -8  # 8 bf16 ulp at output scale
    elif case == "dcn_v4_tiled":
        # column-tiled variant at its hardware-validated small shape, f32:
        # must match the untiled kernel bit-for-bit
        x, off, msk, wgt, bias = _dcn_inputs(16, 256, 67, 67, 2, "f32")
        args = [jnp.asarray(a) for a in (x, off, msk, wgt, bias)]
        got = np.asarray(deform_conv2d_pallas_v4(*args, max_offset=2,
                                                 tile_w=128), np.float32)
        ref = np.asarray(deform_conv2d_pallas_v4(*args, max_offset=2),
                         np.float32)
        tol = 1e-5
    elif case == "dcn_v5":
        # v5 transposed-layout kernel (C in sublanes): logic + lowering
        # check at the flagship channel count, f32, vs the XLA shifts op.
        from vfi_tpu.ops.pallas.sampling import deform_conv2d_pallas_v5

        x, off, msk, wgt, bias = _dcn_inputs(16, 256, 67, 67, 2, "f32")
        args = [jnp.asarray(a) for a in (x, off, msk, wgt, bias)]
        got = np.asarray(deform_conv2d_pallas_v5(*args, max_offset=2),
                         np.float32)
        ref = np.asarray(deform_conv2d_shifts(*args, max_offset=2), np.float32)
        tol = 4 * float(np.max(np.abs(ref))) * 2.0 ** -8
    elif case == "dcn_v5_tiled":
        # round 5: v5 column-tiled predicates at the flagship R=1
        # geometry — must match the untiled v5 kernel bit-for-bit (a
        # skipped (tap, shift, tile) term contributes exactly zero).
        # Offsets zeroed over half the width so tiles really do retire
        # shifts on hardware, not just in interpret mode.
        import numpy as _np

        from vfi_tpu.ops.pallas.sampling import deform_conv2d_pallas_v5

        x, off, msk, wgt, bias = _dcn_inputs(16, 256, 67, 67, 1, "f32")
        off = _np.clip(off, -0.99, 0.99)
        off[:, :, :128, :] = 0.0
        args = [jnp.asarray(a) for a in (x, off, msk, wgt, bias)]
        got = np.asarray(deform_conv2d_pallas_v5(*args, max_offset=1,
                                                 tile_w=128), np.float32)
        ref = np.asarray(deform_conv2d_pallas_v5(*args, max_offset=1),
                         np.float32)
        tol = 0.0
    elif case == "conv_chain":
        # round-4 fused conv chain (rotation staging, packed lanes):
        # 3-layer 64ch chain + the 128-ch motion shape, f32, vs the XLA
        # conv sequence — logic + lowering check of the production trunk
        # kernel (ops/pallas/conv.py).
        import jax

        from vfi_tpu.ops.pallas.conv import conv_chain_pallas

        rng = np.random.default_rng(3)
        errs = []
        for chans, acts in (((64, 64, 64, 64), (True, True, True)),
                            ((128, 64, 64, 2), (True, True, False))):
            x = jnp.asarray(rng.standard_normal((1, 16, 256, chans[0])),
                            jnp.float32)
            ws = tuple(jnp.asarray(
                rng.standard_normal((3, 3, chans[l], chans[l + 1])) * 0.1,
                jnp.float32) for l in range(len(chans) - 1))
            bs = tuple(jnp.asarray(rng.standard_normal((c,)) * 0.1,
                                   jnp.float32) for c in chans[1:])
            o = x
            for w_, b_, a_ in zip(ws, bs, acts):
                o = jax.lax.conv_general_dilated(
                    o, w_, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32) + b_
                if a_:
                    o = jnp.maximum(o, 0.0)
            ref_c = np.asarray(o, np.float32)
            got_c = np.asarray(conv_chain_pallas(x, ws, bs, acts),
                               np.float32)
            errs.append((got_c, ref_c))
        got = np.concatenate([np.ravel(g) for g, _ in errs])
        ref = np.concatenate([np.ravel(r) for _, r in errs])
        # MXU default precision truncates f32 operands to bf16 passes on
        # both paths; 8 ulp at output scale (see dcn_v4 rationale)
        tol = 8 * float(np.max(np.abs(ref))) * 2.0 ** -8
    elif case == "model_720p":
        # COMPOSITION check (VERDICT r2 #4): one full flagship forward at
        # 720p — Pallas kernels + tw256 + cascade — against the XLA-ops
        # path of the same model. Covers what the isolated kernel cases
        # cannot: the kernels embedded in the real graph (layout
        # transitions, bf16 policy, cascade pre-warp). Uses the shipped
        # checkpoint when present so offsets are the trained regime.
        import jax

        from vfi_tpu.models import EMAVFI
        from vfi_tpu.utils.convert import load_params_npz

        ck = os.path.join(REPO, "artifacts", "emavfi_q12_best.npz")
        kw = dict(dtype=jnp.bfloat16, dcn_max_offset=2, warp_max_flow=16,
                  cascade_levels=2)
        # round 4: the production composition adds the v5 DCN kernel and
        # the fused Pallas conv chains
        m_pal = EMAVFI(use_pallas=True, dcn_kernel="v5",
                       conv_kernel="pallas", **kw)
        m_xla = EMAVFI(use_pallas=False, **kw)
        if os.path.exists(ck):
            params = load_params_npz(ck)
        else:
            z = jnp.zeros((1, 64, 64, 3), jnp.float32)
            params = jax.jit(m_xla.init)(jax.random.PRNGKey(0), z, z)
        rng = np.random.default_rng(3)
        f0 = jnp.asarray(rng.random((1, 720, 1280, 3)), jnp.float32)
        f1 = jnp.asarray(rng.random((1, 720, 1280, 3)), jnp.float32)
        got = np.asarray(jax.jit(m_pal.apply)(params, f0, f1), np.float32)
        ref = np.asarray(jax.jit(m_xla.apply)(params, f0, f1), np.float32)
        # outputs are [0,1]; the paths share blend formulation, so the gap
        # is bf16 reorder noise through 3 DCNs + warp + tanh
        tol = 0.04
    elif case == "warp_v2":
        import numpy as np_

        rng = np_.random.default_rng(1)
        img = rng.random((1, 32, 256, 3)).astype(np_.float32)
        flow = (rng.random((1, 32, 256, 2)).astype(np_.float32) - 0.5) * 12.0
        got = np.asarray(bounded_warp_pallas_v2(
            jnp.asarray(img, jnp.bfloat16), jnp.asarray(flow, jnp.bfloat16),
            max_flow=16), np.float32)
        ref = np.asarray(warp(jnp.asarray(img, jnp.bfloat16),
                              jnp.asarray(flow, jnp.bfloat16)), np.float32)
        tol = 3e-2  # bf16 coordinate weights
    else:
        raise ValueError(f"unknown case {case!r}")

    err = float(np.max(np.abs(got - ref)))
    return {"case": case, "ok": bool(err <= tol), "max_err": err, "tol": tol,
            "seconds": round(time.time() - t0, 1)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", choices=CASES, default=None,
                    help="run ONE case in-process (subprocess entry)")
    ap.add_argument("--timeout", type=int, default=PER_CASE_TIMEOUT_S)
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "tpu_smoke.json"))
    args = ap.parse_args(argv)

    if args.case:
        res = run_case(args.case)
        print(json.dumps(res))
        return 0 if res["ok"] else 1

    # Warm the TPU runtime/tunnel in a throwaway subprocess first: after a
    # VM restart the first device touch can take minutes (relay init), which
    # once ate the whole first case's timeout and reported a false kernel
    # failure (session 10). Untimed against the cases; bounded on its own.
    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.numpy.ones(8).block_until_ready()"],
            capture_output=True, text=True, timeout=900, cwd=REPO)
    except subprocess.TimeoutExpired:
        print("  warmup: TPU runtime did not come up in 900s", flush=True)

    def run_bounded(case: str) -> dict:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--case", case],
                capture_output=True, text=True,
                timeout=CASE_TIMEOUT_S.get(case, args.timeout),
                cwd=REPO)
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("{")]
            if line:
                return json.loads(line[-1])
            return {"case": case, "ok": False,
                    "error": f"rc={proc.returncode}",
                    "stderr_tail": proc.stderr[-500:],
                    "seconds": round(time.time() - t0, 1)}
        except subprocess.TimeoutExpired:
            return {"case": case, "ok": False,
                    "error": f"timeout after "
                             f"{CASE_TIMEOUT_S.get(case, args.timeout)}s "
                             "(compile hang? see docs/PERFORMANCE.md)",
                    "seconds": round(time.time() - t0, 1)}

    results = []
    for case in CASES:
        res = run_bounded(case)
        # The remote compile relay intermittently hangs individual FRESH
        # Mosaic compiles (measured 2026-08-19: the same case compiles in
        # 40-70 s or wedges past 500 s across back-to-back runs, while the
        # production full-model compile succeeds in between — see
        # docs/PERFORMANCE.md "tpu-smoke relay flakiness"). A numerics
        # break is deterministic; a relay hang is not — retry a TIMEOUT
        # once so flakiness doesn't masquerade as a kernel regression.
        # Genuine failures (ok=False with a measured max_err) never retry.
        if not res["ok"] and "timeout" in res.get("error", ""):
            print(f"  {res}  -> retrying once (relay flakiness)", flush=True)
            retry = run_bounded(case)
            retry["retried_after_timeout"] = True
            res = retry
        results.append(res)
        print(f"  {results[-1]}", flush=True)

    import datetime

    report = {"when": datetime.datetime.now().isoformat(timespec="seconds"),
              "all_ok": all(r["ok"] for r in results), "cases": results}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"tpu-smoke: {'OK' if report['all_ok'] else 'FAILED'} -> {args.out}")
    return 0 if report["all_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
