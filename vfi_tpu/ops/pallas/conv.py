"""Pallas TPU kernels for the stride-1 3x3 conv trunk (fused bias + ReLU).

Why this exists: the flagship model is 10 nearly identical full-resolution
3x3 stride-1 convs (reference src/models/ema_vfi.py:73-76, 89-93, 102-107 —
feature extraction, motion estimation, reconstruction), and this
toolchain's XLA conv emitter lowers 720p NHWC convs into windowed
while-loops with layout-transposed intermediates running at ~8% MFU
(~4.3 ms/frame for a 64ch layer vs ~0.35 ideal; docs/PERFORMANCE.md
"Flagship forward roofline"). A conv is the EASY case of the proven DCN
row-slab structure (ops/pallas/sampling.py): k*k static shifts and MXU
dots — no offsets, no masks, no predicates.

Two generations live here:

`conv2d_pallas` (v1): host-padded NHWC input, one slab DMA per row slab,
in-VMEM im2col (9 static relayout copies -> (TH, W, 9*C) patches) or
9 accumulated direct dots, one MXU contraction. Correct and general
(any odd k, any channels), but only ~equal to the XLA conv at 720p: on
this stack the EFFECTIVE HBM bandwidth measures ~180 GB/s (one
elementwise pass over a 118 MB activation = 1.31 ms, tools/bench_conv.py
round 4), so v1's host-side pad (a full-array rewrite) and its
128-lane-padded slab DMA (2x bytes at C=64) dominate.

`conv2d_pallas_v2`: the packed-lane redesign that removes both overheads —
see its block comment below. This is the production path; v1 remains the
fallback for channel counts v2 does not support and as the
structure-of-record for tests.

Both accumulate in f32 (matching XLA's conv with
preferred_element_type=f32) and fuse bias + optional ReLU; numerics track
`lax.conv_general_dilated` to bf16 rounding of the inputs.

Forward-only; vfi_tpu/ops/pallas/wrappers.py provides the differentiable
custom_vjp (hand-written XLA backward — no forward recompute).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vfi_tpu.ops.pallas.sampling import _pad128, _round8


def _pick_th_conv(h: int, w: int, cs: int, cout: int, k: int,
                  itemsize: int = 2, variant: str = "im2col",
                  budget: int = 24 * 1024 * 1024) -> int:
    """Largest row-slab height whose VMEM footprint (v1 buffer set) fits
    the budget. Footprint counts Mosaic's (8, 128) tiling of the last two
    dims: the NHWC slab pays pad128(C) lanes, the patch buffer
    pad128(k*k*cs)."""
    m = k // 2
    wp = _round8(8 + w + m)
    cp = _pad128(cs)
    for b in (budget, 48 * 1024 * 1024):
        for th in (32, 16, 8, 4, 2) + ((h,) if h < 8 else ()):
            if h % th != 0:
                continue
            slab = (th + 2 * m) * wp * cp * itemsize
            if variant == "im2col":
                work = th * _round8(w) * _pad128(k * k * cs) * itemsize
            else:
                work = th * _round8(w) * _pad128(cs) * 4          # f32 acc
            blocks = 2 * th * _round8(w) * _pad128(cout) * itemsize
            if slab + work + blocks <= b:
                return th
    raise ValueError(
        f"no VMEM-feasible conv row slab for h={h} w={w} cs={cs}")


def pallas_conv_feasible(h: int, w: int, c: int, cout: int, k: int = 3,
                         itemsize: int = 2,
                         variant: str = "im2col") -> bool:
    """Static check: does a conv kernel generation have a VMEM-feasible
    plan for this shape? Prefers v2 (packed layout); falls back to the v1
    plan. Callers fall back to the XLA conv when False."""
    if variant == "v2":
        return pallas_conv_v2_feasible(h, w, c, cout, k, itemsize)
    try:
        _pick_th_conv(h, w, _round8(c), cout, k, itemsize=itemsize,
                      variant=variant)
        return True
    except ValueError:
        return False


def _conv_kernel(w_ref, b_ref, x_hbm, out_ref, x_tile, work_ref, sem, *,
                 k: int, TH: int, W: int, C: int, cout: int, act: bool,
                 variant: str, _dbg: str = "full"):
    """One (batch, row-slab) grid step of the v1 kernel.

    w_ref: im2col (k*k*C, cout) | direct (k*k, C, cout). b_ref: (1, cout).
    x_hbm: (B, H + 2m, Wp, pad128(C)) host-padded input, ANY memory space.
    x_tile: (TH + 2m, Wp, pad128(C)) VMEM slab (the DMA needs 128-aligned
    lanes; the C-lane reads below slice the dense prefix).
    work_ref: im2col (TH, W, k*k*C) patches | direct (TH, W, cout) f32 acc.
    """
    m = k // 2
    b = pl.program_id(0)
    r = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * TH, TH + 2 * m)], x_tile, sem)
    cp.start()
    cp.wait()

    if variant == "im2col":
        if _dbg != "nocopy":
            for t in range(k * k):
                i, j = divmod(t, k)
                # static sublane-shifted source, static lane-offset dest
                work_ref[:, :, t * C:(t + 1) * C] = \
                    x_tile[i:i + TH, 8 - m + j:8 - m + j + W, :C]
        if _dbg == "nodot":
            out_ref[0] = work_ref[:, :, :cout].astype(out_ref.dtype)
            return
        o = jax.lax.dot_general(
            work_ref[...], w_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        for t in range(k * k):
            i, j = divmod(t, k)
            contrib = jax.lax.dot_general(
                x_tile[i:i + TH, 8 - m + j:8 - m + j + W, :C], w_ref[t],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if t == 0:
                work_ref[...] = contrib
            else:
                work_ref[...] += contrib
        o = work_ref[...]

    o = o + b_ref[0].astype(jnp.float32)
    if act:
        o = jnp.maximum(o, 0.0)
    out_ref[0] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "variant", "_dbg"))
def conv2d_pallas(x: jnp.ndarray, weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None, act: bool = False,
                  variant: str = "im2col", _dbg: str = "full") -> jnp.ndarray:
    """Stride-1 odd-k conv (+ bias + optional ReLU), NHWC, zeros padding
    k//2 — the semantics of the model's ConvBlock trunk layers
    (models/layers.py; reference src/models/ema_vfi.py:7-14). v1 kernel.

    Args:
      x: (B, H, W, C). weight: (k, k, C, cout) HWIO. bias: (cout,) or None.
      act: fuse a ReLU. variant: "im2col" | "direct" (see module docstring).
    """
    b, h, w, cin = x.shape
    kh, kw, cin_w, cout = weight.shape
    if kh != kw or kh % 2 != 1:
        raise ValueError("square odd kernels only")
    if cin_w != cin:
        raise ValueError("groups == 1 only")
    k = kh
    m = k // 2
    dtype = x.dtype
    isz = jnp.dtype(dtype).itemsize
    cs = _round8(cin)
    TH = _pick_th_conv(h, w, cs, cout, k, itemsize=isz, variant=variant)

    wp = _round8(8 + w + m)
    # columns: [8 - m zeros][m-col halo][w real at offset 8][m-col halo]
    # [round8 fill] — the center tap's slice lands sublane-aligned at 8.
    # Channels pad to 128 for the slab DMA's minor-dim alignment.
    xp = jnp.pad(x, ((0, 0), (m, m), (8, wp - w - 8),
                     (0, _pad128(cs) - cin)))

    if variant == "im2col":
        wk = jnp.pad(weight, ((0, 0), (0, 0), (0, cs - cin), (0, 0))
                     ).reshape(k * k * cs, cout).astype(dtype)
        work = pltpu.VMEM((TH, w, k * k * cs), dtype)
    else:
        wk = jnp.pad(weight, ((0, 0), (0, 0), (0, cs - cin), (0, 0))
                     ).reshape(k * k, cs, cout).astype(dtype)
        work = pltpu.VMEM((TH, w, cout), jnp.float32)

    kern = functools.partial(_conv_kernel, k=k, TH=TH, W=w, C=cs, cout=cout,
                             act=act, variant=variant, _dbg=_dbg)
    out = pl.pallas_call(
        kern,
        grid=(b, h // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),       # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias (1, cout)
            pl.BlockSpec(memory_space=pl.ANY),           # padded x in HBM
        ],
        out_specs=pl.BlockSpec((1, TH, w, cout),
                               lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * m, wp, _pad128(cs)), dtype),
            work,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(wk,
      (bias if bias is not None else jnp.zeros((cout,), dtype)
       ).reshape(1, cout).astype(dtype),
      xp)
    return out


# --------------------------------------------------------------------------
# v2: packed-lane layout, zero host prep, double-buffered slab DMA.
#
# The v1 kernel above (and the XLA conv) are bound by HBM traffic on this
# stack, whose EFFECTIVE bandwidth measures ~180 GB/s (one elementwise pass
# over a 720p 64ch bf16 activation = 1.31 ms; tools/bench_conv.py round 4):
# v1's host-side pad rewrites the whole array (+2 passes) and its slab DMA
# carries 128-padded lanes at C=64 (2x bytes). v2 removes both:
#
# - the input is VIEWED as (B, H, W/P, 128) with P = 128//C pixels packed
#   per lane row — a free reshape, no data movement;
# - the slab DMA carries exactly the real bytes, double-buffered across
#   row-slab grid steps so it overlaps the MXU dot;
# - H edges: the first/last slab DMA copies m rows less (conditioned on
#   the slab index) and the missing halo rows are zero-filled in VMEM;
# - W edges: the two boundary patch sub-blocks are zero-filled (the only
#   pixels whose tap column falls outside the image);
# - patches are built packed, (TH, W/P, 9*128), each tap = at most 2
#   static copies (a lane-offset slice + a sublane-shifted lane slice —
#   the flat-shift decomposition of a packed column shift);
# - ONE dot contracts K = 9*128 against a (9*128, P*cout) parity-block
#   weight matrix (host-built, tiny): for P=1 this is the plain im2col
#   GEMM; for P=2 the zero parity blocks double the nominal FLOPs but the
#   N=128 result packs two pixels per lane row (the MXU's N=64
#   inefficiency cancels the waste — tools/conv_gemm_probe.py measured
#   (576,128) GEMMs at the same wall time as (576,64));
# - bias + ReLU fused; the packed output (B, H, W/P, P*cout) reshapes back
#   to NHWC for free.
#
# Supported: C in {64, 128} — i.e. P in {2, 1}; these cover 8 of the
# model's 10 stride-1 trunk convs (the 6-channel first conv and the
# 256-channel ctx_conv3 keep other paths).
# --------------------------------------------------------------------------


def _pick_th_conv_v2(h: int, w2: int, k: int, pcout: int,
                     itemsize: int = 2,
                     budget: int = 24 * 1024 * 1024) -> int:
    """Row-slab height for the v2 buffer set: two packed slabs (double
    buffer), the packed patch buffer, double-buffered out blocks. Needs
    h % TH == 0 and at least two slabs (the H-edge DMA variants assume
    first != last)."""
    for b in (budget, 48 * 1024 * 1024):
        for th in (16, 8, 4, 2):
            if h % th != 0 or h // th < 2:
                continue
            slabs = 2 * (th + 2 * (k // 2)) * w2 * 128 * itemsize
            patches = th * w2 * _pad128(k * k * 128) * itemsize
            blocks = 2 * th * w2 * _pad128(pcout) * itemsize
            if slabs + patches + blocks <= b:
                return th
    raise ValueError(f"no VMEM-feasible v2 conv row slab for h={h} w2={w2}")


def pallas_conv_v2_feasible(h: int, w: int, c: int, cout: int, k: int = 3,
                            itemsize: int = 2) -> bool:
    """Static check for the v2 packed conv kernel."""
    if c not in (64, 128):
        return False
    p = 128 // c
    if w % p != 0 or (w // p) % 8 != 0 or p * cout > 512:
        return False
    try:
        _pick_th_conv_v2(h, w // p, k, p * cout, itemsize=itemsize)
        return True
    except ValueError:
        return False


def _conv_kernel_v2(w_ref, b_ref, x_hbm, out_ref, slab_ref, patch_ref,
                    sems, *, k: int, TH: int, W2: int, CS: int, P: int,
                    NCOL: int, act: bool, _dbg: str = "full"):
    """One (batch, row-slab) grid step of the packed conv (v2).

    w_ref: (k*k*128, NCOL) parity-block weights. b_ref: (1, NCOL).
    x_hbm: (B, H, W2, 128) packed input view, ANY memory space.
    slab_ref: (2, TH + 2m, W2, 128) double-buffered VMEM slabs.
    patch_ref: (TH, W2, k*k*128).
    """
    m = k // 2
    b = pl.program_id(0)
    r = pl.program_id(1)
    nrows = pl.num_programs(1)
    H = nrows * TH

    def emit_dma(rr, slot, wait):
        """The (conditional) slab DMA for row-slab rr in buffer `slot`.
        Interior slabs copy TH + 2m rows starting at rr*TH - m; the first
        slab starts at input row 0 into slab row m, the last ends at H
        into slab row 0. Exactly one branch fires per rr; `wait` re-emits
        the matching descriptor and waits its semaphore."""

        def go(cp):
            cp.wait() if wait else cp.start()

        @pl.when(jnp.logical_and(rr > 0, rr < nrows - 1))
        def _():
            go(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(rr * TH - m, TH + 2 * m)],
                slab_ref.at[slot], sems.at[slot]))

        @pl.when(rr == 0)
        def _():
            go(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(0, TH + m)],
                slab_ref.at[slot, pl.ds(m, TH + m)], sems.at[slot]))

        @pl.when(rr == nrows - 1)
        def _():
            go(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(H - TH - m, TH + m)],
                slab_ref.at[slot, pl.ds(0, TH + m)], sems.at[slot]))

    # Double buffer: step r waits on slot r%2 (started by step r-1) and
    # prefetches r+1 into the other slot. The grid iterates rows minor,
    # so the r==0 start below also covers the first step of every batch.
    slot = jax.lax.rem(r, 2)

    @pl.when(r == 0)
    def _():
        emit_dma(r, slot, wait=False)

    @pl.when(r + 1 < nrows)
    def _():
        emit_dma(r + 1, 1 - slot, wait=False)

    emit_dma(r, slot, wait=True)

    # Zero-fill the missing halo rows of edge slabs.
    @pl.when(r == 0)
    def _():
        slab_ref[slot, 0:m] = jnp.zeros((m, W2, 128), slab_ref.dtype)

    @pl.when(r == nrows - 1)
    def _():
        slab_ref[slot, TH + m:TH + 2 * m] = jnp.zeros((m, W2, 128),
                                                      slab_ref.dtype)

    if _dbg == "dma":
        out_ref[0] = slab_ref[slot, :TH, :, :NCOL].astype(out_ref.dtype)
        return

    if _dbg != "nocopy":
        # Packed patch build: tap (i, j), flat pixel shift dx = j - m.
        # Destination lane block p of tap t holds the channels of source
        # pixel u*P + p + dx; the P blocks split into at most two
        # contiguous copies (same-row lane-offset slice + neighbor-row
        # wrap via a sublane-shifted lane slice), plus a zero fill for the
        # boundary sub-block whose tap column falls outside the image.
        for t in range(k * k):
            i, j = divmod(t, k)
            dx = j - m
            base = t * 128
            if dx == 0:
                patch_ref[:, :, base:base + 128] = slab_ref[slot, i:i + TH]
            elif dx > 0:
                lo = (P - dx) * CS
                if lo:  # same-row blocks: src lanes [dx*CS, P*CS)
                    patch_ref[:, :, base:base + lo] = \
                        slab_ref[slot, i:i + TH, :, dx * CS:P * CS]
                # next-col wrap: dest col u <- src col u+1, lanes [0,dx*CS)
                patch_ref[:, :W2 - 1, base + lo:base + 128] = \
                    slab_ref[slot, i:i + TH, 1:W2, :dx * CS]
                patch_ref[:, W2 - 1:W2, base + lo:base + 128] = \
                    jnp.zeros((TH, 1, dx * CS), patch_ref.dtype)
            else:
                hi = (-dx) * CS
                # prev-col wrap: dest col u <- src col u-1, src lane tail
                patch_ref[:, 1:W2, base:base + hi] = \
                    slab_ref[slot, i:i + TH, :W2 - 1, (P + dx) * CS:P * CS]
                patch_ref[:, 0:1, base:base + hi] = \
                    jnp.zeros((TH, 1, hi), patch_ref.dtype)
                if hi < 128:  # same-row blocks: src lanes [0, (P+dx)*CS)
                    patch_ref[:, :, base + hi:base + 128] = \
                        slab_ref[slot, i:i + TH, :, :(P + dx) * CS]
    if _dbg == "nodot":
        out_ref[0] = patch_ref[:, :, :NCOL].astype(out_ref.dtype)
        return

    o = jax.lax.dot_general(
        patch_ref[...], w_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o = o + b_ref[0].astype(jnp.float32)
    if act:
        o = jnp.maximum(o, 0.0)
    out_ref[0] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "_dbg"))
def conv2d_pallas_v2(x: jnp.ndarray, weight: jnp.ndarray,
                     bias: Optional[jnp.ndarray] = None, act: bool = False,
                     _dbg: str = "full") -> jnp.ndarray:
    """Stride-1 odd-k conv (+ bias + optional ReLU) in the packed-lane
    layout (see the v2 block comment): zero host prep, real-byte DMA,
    double-buffered slabs. Same contract and numerics as `conv2d_pallas`;
    feasibility gate: `pallas_conv_v2_feasible` (C in {64, 128}).
    """
    b, h, w, cin = x.shape
    kh, kw, cin_w, cout = weight.shape
    if kh != kw or kh % 2 != 1:
        raise ValueError("square odd kernels only")
    if cin_w != cin:
        raise ValueError("groups == 1 only")
    if cin not in (64, 128):
        raise ValueError("v2 packed conv supports C in {64, 128}")
    k = kh
    m = k // 2
    dtype = x.dtype
    isz = jnp.dtype(dtype).itemsize
    cs = cin
    p = 128 // cs
    w2 = w // p
    ncol = p * cout
    TH = _pick_th_conv_v2(h, w2, k, ncol, itemsize=isz)

    xpk = x.reshape(b, h, w2, 128)  # free: row-major lane packing

    # Parity-block weight matrix (k*k*128, P*cout): block (t, p) -> p's
    # output columns; cross-parity blocks are zero.
    w_tap = weight.astype(jnp.float32).reshape(k * k, cs, cout)
    w2m = jnp.zeros((k * k, p, cs, p, cout), jnp.float32)
    idx = jnp.arange(p)
    w2m = w2m.at[:, idx, :, idx, :].set(
        jnp.broadcast_to(w_tap[:, None], (k * k, p, cs, cout))
        .transpose(1, 0, 2, 3))
    w2m = w2m.reshape(k * k * 128, ncol).astype(dtype)

    bias_p = (bias if bias is not None else jnp.zeros((cout,), dtype))
    bias_p = jnp.tile(bias_p.reshape(1, cout), (1, p)).reshape(1, ncol)

    kern = functools.partial(_conv_kernel_v2, k=k, TH=TH, W2=w2, CS=cs,
                             P=p, NCOL=ncol, act=act, _dbg=_dbg)
    out = pl.pallas_call(
        kern,
        grid=(b, h // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),       # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias (1, ncol)
            pl.BlockSpec(memory_space=pl.ANY),           # packed x in HBM
        ],
        out_specs=pl.BlockSpec((1, TH, w2, ncol),
                               lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w2, ncol), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2 * m, w2, 128), dtype),
            pltpu.VMEM((TH, w2, k * k * 128), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(w2m, bias_p.astype(dtype), xpk)
    return out.reshape(b, h, w, cout)


# --------------------------------------------------------------------------
# Fused conv chains: L stride-1 convs in ONE kernel.
#
# At ~180 GB/s effective HBM bandwidth, a single 720p 64ch layer's floor is
# its own I/O (~236 MB); the model's trunk runs 3-layer chains back to back
# (feature blocks, motion estimation, reconstruction — reference
# src/models/ema_vfi.py:73-76, 89-93, 102-107), so fusing a chain divides
# the HBM traffic by L: one slab DMA in, one output write, intermediate
# activations entirely in VMEM with shrinking row halos.
#
# Uniform internal convention — "pair-packed": every buffer is
# (rows, W/2, 2*c): one lane row = the channels of TWO adjacent pixels.
# The input arrives this way by a free reshape; each layer's dot emits the
# next layer's pair-packed input directly (no repacking between layers);
# the final output reshapes back to NHWC for free. Per layer:
#   patches (rows_out, W/2, 9*2*c_l) built by <= 2 static copies per tap
#   (the flat-shift decomposition, as conv2d_pallas_v2) + W-edge zeros;
#   one dot against the (9*2*c_l, 2*cout_l) parity-block weights
#   (FLOPs 2x nominal, cancelled by the MXU's N<=64 inefficiency);
#   bias + ReLU fused; H-edge rows of intermediates re-zeroed on the
#   first/last slab (a conv of a zero halo is relu(bias), but the unfused
#   semantics would have zero-padded the NEXT layer with exact zeros).
#
# Supported: first-layer channels with 2*c % 128 == 0 (64, 128);
# intermediate/final couts % 4 == 0 plus any final cout (lane offsets stay
# 8-aligned); 3x3 kernels.
# --------------------------------------------------------------------------


def _chain_dims(h: int, w: int, chans: tuple) -> tuple:
    """(W2, per-layer K, per-layer N) for a pair-packed chain;
    chans = (c0, c1, ..., cL)."""
    w2 = w // 2
    ks = tuple(9 * 2 * c for c in chans[:-1])
    ns = tuple(2 * c for c in chans[1:])
    return w2, ks, ns


def _pick_th_chain(h: int, w2: int, chans: tuple, itemsize: int = 2,
                   budget: int = 30 * 1024 * 1024) -> int:
    L = len(chans) - 1
    cmax = max(chans[:-1])
    for b in (budget, 48 * 1024 * 1024):
        for th in (16, 8, 4, 2):
            if h % th != 0 or h // th < 2:
                continue
            slabs = 2 * (th + 2 * L) * w2 * 2 * chans[0] * itemsize
            inters = sum((th + 2 * (L - l)) * w2 *
                         _pad128(2 * chans[l]) * itemsize
                         for l in range(1, L))
            rots = 2 * (th + 2 * L) * w2 * _pad128(2 * cmax) * itemsize
            blocks = 2 * th * w2 * _pad128(2 * chans[-1]) * itemsize
            if slabs + inters + rots + blocks <= b:
                return th
    raise ValueError(f"no VMEM-feasible chain row slab for h={h} w2={w2} "
                     f"chans={chans}")


def pallas_conv_chain_feasible(h: int, w: int, chans: tuple,
                               itemsize: int = 2) -> bool:
    """Static check for the fused chain: chans = (c_in, cout_1, ...,
    cout_L)."""
    if 2 * chans[0] % 128 != 0:
        return False
    if any(c % 4 != 0 for c in chans[1:-1]):
        return False
    if w % 2 != 0 or (w // 2) % 8 != 0:
        return False
    try:
        _pick_th_chain(h, w // 2, tuple(chans), itemsize=itemsize)
        return True
    except ValueError:
        return False


def _chain_kernel(*refs, k: int, TH: int, W2: int, chans: tuple,
                  acts: tuple, _dbg: str = "full"):
    """One (batch, row-slab) grid step of the fused chain.

    refs layout: w_0..w_{L-1}, b_0..b_{L-1}, x_hbm, out_ref, slab_ref,
    rot_p, rot_m, inter_1..inter_{L-1}, sems.
    """
    L = len(chans) - 1
    w_refs = refs[:L]
    b_refs = refs[L:2 * L]
    x_hbm = refs[2 * L]
    out_ref = refs[2 * L + 1]
    slab_ref = refs[2 * L + 2]
    rot_p = refs[2 * L + 3]
    rot_m = refs[2 * L + 4]
    inters = refs[2 * L + 5:2 * L + 5 + (L - 1)]
    sems = refs[2 * L + 5 + (L - 1)]

    b = pl.program_id(0)
    r = pl.program_id(1)
    nrows = pl.num_programs(1)
    H = nrows * TH

    def emit_dma(rr, slot, wait):
        def go(cp):
            cp.wait() if wait else cp.start()

        @pl.when(jnp.logical_and(rr > 0, rr < nrows - 1))
        def _():
            go(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(rr * TH - L, TH + 2 * L)],
                slab_ref.at[slot], sems.at[slot]))

        @pl.when(rr == 0)
        def _():
            go(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(0, TH + L)],
                slab_ref.at[slot, pl.ds(L, TH + L)], sems.at[slot]))

        @pl.when(rr == nrows - 1)
        def _():
            go(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(H - TH - L, TH + L)],
                slab_ref.at[slot, pl.ds(0, TH + L)], sems.at[slot]))

    slot = jax.lax.rem(r, 2)

    @pl.when(r == 0)
    def _():
        emit_dma(r, slot, wait=False)

    @pl.when(r + 1 < nrows)
    def _():
        emit_dma(r + 1, 1 - slot, wait=False)

    emit_dma(r, slot, wait=True)

    @pl.when(r == 0)
    def _():
        slab_ref[slot, 0:L] = jnp.zeros((L, W2, 2 * chans[0]),
                                        slab_ref.dtype)

    @pl.when(r == nrows - 1)
    def _():
        slab_ref[slot, TH + L:TH + 2 * L] = jnp.zeros(
            (L, W2, 2 * chans[0]), slab_ref.dtype)

    if _dbg == "dma":
        out_ref[0] = slab_ref[slot, :TH, :, :2 * chans[-1]].astype(
            out_ref.dtype)
        return

    # Per layer: stage TWO lane-rotated copies of the source (all pixels
    # shifted +-1 — the flat-shift decomposition, 2 sub-copies + a W-edge
    # zero each), then accumulate NINE direct dots whose operands are
    # leading-dim row windows of {rot_m, src, rot_p} — no per-tap copies,
    # no patch buffer: VPU traffic is 4 full passes/layer instead of ~18
    # (the im2col build measured 1.7 ms/layer of copies at 720p).
    for l in range(L):
        cs = chans[l]
        rows_out = TH + 2 * (L - l - 1)
        rows_in = rows_out + 2
        if l == 0:
            src = slab_ref.at[slot]
        else:
            src = inters[l - 1]

        if _dbg != "nocopy":
            # rot_p: pixel w <- w+1; rot_m: pixel w <- w-1
            rot_p[:rows_in, :, 0:cs] = src[0:rows_in, :, cs:2 * cs]
            rot_p[:rows_in, :W2 - 1, cs:2 * cs] = \
                src[0:rows_in, 1:W2, 0:cs]
            rot_p[:rows_in, W2 - 1:W2, cs:2 * cs] = \
                jnp.zeros((rows_in, 1, cs), rot_p.dtype)
            rot_m[:rows_in, :, cs:2 * cs] = src[0:rows_in, :, 0:cs]
            rot_m[:rows_in, 1:W2, 0:cs] = src[0:rows_in, :W2 - 1, cs:2 * cs]
            rot_m[:rows_in, 0:1, 0:cs] = \
                jnp.zeros((rows_in, 1, cs), rot_m.dtype)

        srcs = (rot_m, src, rot_p)
        acc = None
        for t in range(9):
            i, j = divmod(t, 3)
            if j == 1:
                op = src[i:i + rows_out, :, 0:2 * cs]
            else:
                op = srcs[j][i:i + rows_out, :, 0:2 * cs]
            if _dbg == "nodot":
                continue
            d = jax.lax.dot_general(
                op, w_refs[l][t],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        if _dbg == "nodot":
            if l == L - 1:
                out_ref[0] = rot_p[:TH, :, :2 * chans[-1]].astype(
                    out_ref.dtype)
            continue

        o = acc + b_refs[l][0].astype(jnp.float32)
        if acts[l]:
            o = jnp.maximum(o, 0.0)
        if l == L - 1:
            out_ref[0] = o.astype(out_ref.dtype)
        else:
            inters[l][...] = o.astype(inters[l].dtype)
            edge = L - l - 1

            @pl.when(r == 0)
            def _(l=l, edge=edge):
                inters[l][0:edge] = jnp.zeros(
                    (edge, W2, inters[l].shape[-1]), inters[l].dtype)

            @pl.when(r == nrows - 1)
            def _(l=l, edge=edge, rows_out=rows_out):
                inters[l][rows_out - edge:rows_out] = jnp.zeros(
                    (edge, W2, inters[l].shape[-1]), inters[l].dtype)


def _blockdiag_weights(weight, dtype):
    """(k, k, c, cout) HWIO -> per-tap pair-packed block-diagonal
    (9, 2c, 2*cout)."""
    k = weight.shape[0]
    cs, cout = weight.shape[2], weight.shape[3]
    w_tap = weight.astype(jnp.float32).reshape(k * k, cs, cout)
    m = jnp.zeros((k * k, 2, cs, 2, cout), jnp.float32)
    idx = jnp.arange(2)
    m = m.at[:, idx, :, idx, :].set(
        jnp.broadcast_to(w_tap[:, None], (k * k, 2, cs, cout))
        .transpose(1, 0, 2, 3))
    return m.reshape(k * k, 2 * cs, 2 * cout).astype(dtype)


@functools.partial(jax.jit, static_argnames=("acts", "_dbg"))
def conv_chain_pallas(x: jnp.ndarray, weights: tuple, biases: tuple,
                      acts: tuple, _dbg: str = "full") -> jnp.ndarray:
    """L fused stride-1 3x3 convs (+ bias + per-layer optional ReLU) in one
    Pallas kernel (see the chain block comment). `weights` HWIO per layer,
    `biases` (cout_l,) or None, `acts` bools. Gate with
    `pallas_conv_chain_feasible` first.
    """
    b, h, w, cin = x.shape
    chans = (cin,) + tuple(wt.shape[3] for wt in weights)
    L = len(weights)
    for l, wt in enumerate(weights):
        if wt.shape[0] != 3 or wt.shape[1] != 3:
            raise ValueError("3x3 kernels only")
        if wt.shape[2] != chans[l]:
            raise ValueError("chain channel mismatch")
    dtype = x.dtype
    isz = jnp.dtype(dtype).itemsize
    w2 = w // 2
    TH = _pick_th_chain(h, w2, chans, itemsize=isz)

    xpk = x.reshape(b, h, w2, 2 * cin)

    w_ops = [_blockdiag_weights(wt, dtype) for wt in weights]
    b_ops = []
    for l, bs in enumerate(biases):
        v = bs if bs is not None else jnp.zeros((chans[l + 1],), dtype)
        b_ops.append(jnp.tile(v.reshape(1, chans[l + 1]), (1, 2))
                     .reshape(1, 2 * chans[l + 1]).astype(dtype))

    cmax = max(chans[:-1])
    rmax = TH + 2 * L
    scratch = [
        pltpu.VMEM((2, TH + 2 * L, w2, 2 * cin), dtype),
        pltpu.VMEM((rmax, w2, 2 * cmax), dtype),   # rot_p
        pltpu.VMEM((rmax, w2, 2 * cmax), dtype),   # rot_m
    ]
    for l in range(1, L):
        scratch.append(pltpu.VMEM((TH + 2 * (L - l), w2, 2 * chans[l]),
                                  dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    kern = functools.partial(_chain_kernel, k=3, TH=TH, W2=w2,
                             chans=chans, acts=tuple(acts), _dbg=_dbg)
    out = pl.pallas_call(
        kern,
        grid=(b, h // TH),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * L)
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, TH, w2, 2 * chans[-1]),
                               lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w2, 2 * chans[-1]), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*w_ops, *b_ops, xpk)
    return out.reshape(b, h, w, chans[-1])
