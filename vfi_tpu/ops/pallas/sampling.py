"""Pallas TPU kernels for bounded per-pixel fractional sampling.

The two native ops the reference leans on (torchvision DeformConv2d and
grid_sample backward warping, reference src/models/ema_vfi.py:45-60,
149-170) both reduce to: bilinear-sample a feature map at per-pixel
positions `p + d(p)`, weight, and (for DCN) matmul with the kernel tap.
TPUs have no fast random gather, so these kernels implement sampling as a
bounded shift decomposition executed entirely in VMEM:

    sample(x, p + d) = sum_{v} tri(d_y - v_y) tri(d_x - v_x) x[p + v]

with the displacement clamped to [-R, R]. Two DCN kernel generations live
here: `_sampling_kernel` (v3, the original proven structure) and
`_sampling_kernel_v4` (the production forward — hoisted column staging,
scalar SMEM predicates, all-bf16 blends; 2-3x v3, see its docstring and
docs/PERFORMANCE.md for measured numbers). Both:

- DMA one full-width row slab (+ halo) of the pre-padded input from HBM
  into VMEM once per grid step — x is read ~once per layer;
- decompose sampling into the bounded integer shifts, skipping shifts no
  pixel in the slab uses so smooth/trained displacement fields cost far
  less than the worst case;
- compute tri-weights and blends on the VPU, tap contractions on the MXU.

Hardware constraints encoded here (each cost a failed compile to learn):
dynamic sublane offsets must be 8-aligned, dynamic_rotate needs 32-bit
data, minor-dim insertion (`w[:, :, None]`) needs 32-bit dtypes (insert in
f32, then cast), manual HBM DMA slices need 128-aligned minor dims (hence
channel padding), VMEM sublane extents must be multiples of 8, bf16 cannot
represent pixel coordinates > 256 (all coordinate math in f32), and VMEM
stack slots are NOT reused across statically-unrolled `pl.when` regions
(big temporaries belong inside fori_loop bodies). Tiling is row-slab
first; widths whose full-width slab cannot fit VMEM (4K) are column-tiled
with HOST-pre-gathered tile windows — an in-kernel column slice (two
dynamic-start DMA dims) hangs the Mosaic compiler on this toolchain.
Tile widths are capped at 384 (compile time explodes toward full width;
see `_pick_th_tw_v4`). Truly infeasible problems report so via
`pallas_sampling_feasible` and callers fall back to the XLA shifts op.

Semantics match `deform_conv2d` / `warp` (zeros padding, align_corners
backward warp) whenever |d| <= R; beyond that the displacement saturates.
The kernels are forward-only; `deform_conv2d_shifts` (numerically identical)
provides the differentiable path, wired up as a custom_vjp in
vfi_tpu/ops/pallas/wrappers.py.

Supported: stride 1, dilation 1, one offset/weight group, square kernels —
the flagship model's configuration.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(v: int) -> int:
    return ((v + 7) // 8) * 8


def _pad128(v: int) -> int:
    return ((v + 127) // 128) * 128


def _pick_th(h: int, w: int, cpad: int, cout: int, m: int,
             itemsize: int = 2, budget: int = 12 * 1024 * 1024,
             tile_itemsize: int | None = None) -> int:
    """Largest row-slab height whose VMEM footprint (x-tile + staging copy +
    f32 accumulator + double-buffered offset/mask/out blocks) fits the
    budget. Raises ValueError when even TH=1 does not fit (fallback to the
    XLA op). `tile_itemsize` is the slab/staging dtype size (the DCN kernel
    keeps the input dtype; the warp kernel needs f32 for its rotate)."""
    wp = _round8(w + 2 * m)
    tsz = tile_itemsize if tile_itemsize is not None else itemsize
    for th in (32, 16, 8, 4, 2, 1):
        if h % th != 0:
            continue
        tile = (th + 2 * m) * wp * cpad * tsz     # slab
        xs = (th + 2 * m) * w * cpad * tsz        # column-shift staging copy
        acc = th * w * cpad * 4
        blocks = 2 * th * w * (_pad128(27) * 2 + _pad128(cout)) * itemsize
        if tile + xs + acc + blocks <= budget:
            return th
    raise ValueError(
        f"no VMEM-feasible row slab for h={h} w={w} cpad={cpad} halo={m}")


def pallas_backend_supported() -> bool:
    """Can the current default backend execute these Mosaic TPU kernels?

    Pallas-TPU lowers only on TPU backends (including this environment's
    experimental 'axon' tunnel platform); on CPU/GPU `pallas_call` raises
    at lowering time ("Only interpret mode is supported on CPU backend").
    Production call sites (ModulatedDeformConv, EMAVFI's warp) AND this
    into their `use_pallas` gates so `use_pallas=True` degrades to the
    XLA shift-decomposition op off-TPU instead of crashing mid-pipeline —
    the same degradation ladder bench.py documents. Kept separate from
    `pallas_sampling_feasible`, which is pure shape/VMEM math and remains
    platform-agnostic (its CPU-run unit tests check the 4K tiling plan)."""
    return jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")


def pallas_sampling_feasible(h: int, w: int, c: int, cout: int, R: int,
                             itemsize: int = 2,
                             tile_w: Optional[int] = None) -> bool:
    """Static check: does the v4 kernel have a VMEM-feasible configuration
    — an untiled full-width row slab, or (large widths, e.g. 4K W=3840) a
    column-tiled plan from the bounded-compile candidate set (tw <= 384,
    see `_pick_th_tw_v4`)? Callers fall back to the XLA shifts op when
    False. Gates on the same picker `deform_conv2d_pallas_v4` uses for its
    tile_w=None default, so a True here means the production configuration
    actually lowers (round-1's untiled-only gate retired 2026-08-17 after
    the real-4K compile bisect + runtime win, docs/PERFORMANCE.md)."""
    try:
        if tile_w is not None:
            # Explicit column tile (tile_w= on the kernel): feasible iff it
            # divides w, is lane-aligned (or the full width), and its slab
            # fits VMEM.
            if w % tile_w != 0 or (tile_w != w and tile_w % 128 != 0):
                return False
            _pick_th_v4(h, tile_w, _pad128(c), _pad128(cout), R + 1, 3,
                        itemsize=itemsize)
        else:
            _pick_th_tw_v4(h, w, _pad128(c), _pad128(cout), R + 1, 3,
                           itemsize=itemsize)
        return True
    except ValueError:
        return False


def _sampling_kernel(off_ref, msk_ref, w_ref, b_ref, x_hbm, out_ref,
                     x_tile, xs_ref, acc_ref, sem, *, kh: int, kw: int,
                     R: int, TH: int, W: int, C: int, cout: int,
                     padding: int, use_matmul: bool):
    """One (batch, row-slab) grid step.

    Loop structure chosen for what this toolchain's Mosaic can lower
    (2-D-tiled DMAs hang it; 400+ unrolled conditional regions crash it):
    per tap, the (2R+1) column shifts unroll STATICALLY (a static
    sublane-misaligned slice is a plain relayout copy into `xs_ref`), and
    the (2R+1) row shifts run in a `fori_loop` of dynamic slices on the
    untiled leading dim — both proven-safe primitives. A `@pl.when` guard
    skips column shifts no pixel in the slab uses, so smooth/trained
    offsets cost far less than the worst case.

    x_hbm: (B, Hp, Wp8, C) padded input, ANY memory space.
    off_ref: (1, TH, W, 2*kh*kw) block. msk_ref: (1, TH, W, kh*kw).
    w_ref: (kh*kw, C, cout). b_ref: (1, cout). out_ref: (1, TH, W, cout).
    x_tile/xs_ref: VMEM scratch (TH + 2M, Wp8|W, C). acc_ref: (TH, W, C) f32.
    """
    M = R + 1
    b = pl.program_id(0)
    r = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * TH, TH + 2 * M)], x_tile, sem)
    cp.start()
    cp.wait()

    for t in range(kh * kw):
        i, j = divmod(t, kw)
        dy = jnp.clip(off_ref[0, :, :, 2 * t].astype(jnp.float32), -R, R) \
            + (i - padding)
        dx = jnp.clip(off_ref[0, :, :, 2 * t + 1].astype(jnp.float32), -R, R) \
            + (j - padding)

        acc_ref[...] = jnp.zeros((TH, W, C), jnp.float32)

        for vx in range(j - padding - R, j - padding + R + 1):
            ax = jnp.maximum(1.0 - jnp.abs(dx - vx), 0.0)

            @pl.when(jnp.max(ax) > 0.0)
            def _(vx=vx, ax=ax, i=i):
                # static column shift: relayout copy of the slab
                xs_ref[...] = x_tile[:, vx + M:vx + M + W, :]

                def vy_body(k, _, ax=ax, i=i):
                    vy = k + (i - padding - R)
                    ay = jnp.maximum(
                        1.0 - jnp.abs(dy - vy.astype(jnp.float32)), 0.0)
                    wgt = ay * ax

                    @pl.when(jnp.max(wgt) > 0.0)
                    def _():
                        rows = xs_ref[pl.ds(vy + M, TH), :, :]
                        acc_ref[...] += wgt[:, :, None] * rows.astype(jnp.float32)

                    return 0

                jax.lax.fori_loop(0, 2 * R + 1, vy_body, 0)

        sampled = acc_ref[...]
        if msk_ref is not None:
            sampled = sampled * msk_ref[0, :, :, t].astype(jnp.float32)[:, :, None]
        if use_matmul:
            contrib = jax.lax.dot_general(
                sampled.reshape(TH * W, C), w_ref[t].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(TH, W, cout)
        else:
            contrib = sampled
        if t == 0:
            out_ref[0] = contrib.astype(out_ref.dtype)
        else:
            out_ref[0] += contrib.astype(out_ref.dtype)

    if b_ref is not None:
        out_ref[0] += jnp.broadcast_to(
            b_ref[0].astype(out_ref.dtype), (TH, W, cout))


def _pad_input(x, m: int, cpad: int, dtype=None):
    """Zero-pad NHWC input: halo m on H/W (width rounded to the 8-sublane
    tiling), channels to cpad. The warp kernel requires f32 (its dynamic
    rotate only supports 32-bit data); the DCN kernel slices statically and
    keeps the input dtype."""
    b, h, w, c = x.shape
    wp8 = _round8(w + 2 * m)
    out = jnp.pad(x, ((0, 0), (m, m), (m, wp8 - w - m), (0, cpad - c)))
    return out.astype(dtype) if dtype is not None else out


@functools.partial(jax.jit, static_argnames=("max_offset", "padding"))
def deform_conv2d_pallas(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    max_offset: int = 3,
    padding: int = 1,
) -> jnp.ndarray:
    """Fused bounded-offset DCNv2 (see module docstring). NHWC, stride 1.

    Args mirror `vfi_tpu.ops.deform_conv2d`; offsets clamp to
    [-max_offset, max_offset].
    """
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    if cin_g != cin:
        raise ValueError("groups == 1 only")
    R = int(max_offset)
    M = R + 1
    dtype = x.dtype
    cpad = _pad128(cin)
    TH = _pick_th(h, w, cpad, cout, M, itemsize=jnp.dtype(dtype).itemsize,
                  tile_itemsize=jnp.dtype(dtype).itemsize)

    xp = _pad_input(x, M, cpad)  # stays in input dtype (static slices only)
    w_taps = jnp.pad(weight.reshape(kh * kw, cin, cout),
                     ((0, 0), (0, cpad - cin), (0, 0)))

    kern = functools.partial(
        _sampling_kernel, kh=kh, kw=kw, R=R, TH=TH, W=w, C=cpad,
        cout=cout, padding=padding, use_matmul=True)

    grid = (b, h // TH)
    in_specs = [
        pl.BlockSpec((1, TH, w, offset.shape[-1]),
                     lambda bi, ri: (bi, ri, 0, 0)),
        pl.BlockSpec((1, TH, w, kh * kw), lambda bi, ri: (bi, ri, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.VMEM),       # weights
        pl.BlockSpec(memory_space=pltpu.VMEM),       # bias (1, cout)
        pl.BlockSpec(memory_space=pl.ANY),           # padded x in HBM
    ]
    operands = [offset, mask if mask is not None else
                jnp.ones((b, h, w, kh * kw), dtype),
                w_taps.astype(dtype),
                (bias if bias is not None else jnp.zeros((cout,), dtype)
                 ).reshape(1, cout).astype(dtype),
                xp]

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TH, w, cout), lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * M, _round8(w + 2 * M), cpad), dtype),
            pltpu.VMEM((TH + 2 * M, w, cpad), dtype),
            pltpu.VMEM((TH, w, cpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(*operands)
    return out


def _pick_th_v4(h: int, w: int, cpad: int, coutp: int, m: int, kh: int,
                itemsize: int = 2, budget: int = 24 * 1024 * 1024,
                stage_columns: bool = True, samp_bufs: int = 1) -> int:
    """Row-slab height for the v4 kernel's buffer set: bf16 slab
    (+ optionally one staged column-shift copy) + `samp_bufs` kh-tap-group
    sample buffers + f32 output accumulator + double-buffered
    offset/mask/out blocks.

    TH must be a multiple of 8: the planes/out BlockSpecs put TH in the
    second-minor dim, which Pallas requires divisible by 8 (observed hard
    lowering error at 1080p with TH=4). When nothing fits the preferred
    budget, the budget is relaxed stepwise toward the 64 MB compiler limit
    (large widths, e.g. 1920, need ~29 MB at TH=8) — preferring the small
    budget first keeps the measured 720p/VGA picks unchanged."""
    wp = _round8(8 + w + m)  # left pad 8 so the ux=0 slice is sublane-aligned
    # th == h is also always legal (a block equal to the whole dim lowers
    # regardless of divisibility) — the tiny-shape escape hatch.
    cands = (32, 16, 8) + ((h,) if h < 8 else ())
    for b in (budget, 34 * 1024 * 1024, 48 * 1024 * 1024):
        for th in cands:
            if h % th != 0:
                continue
            slab = (th + 2 * m) * wp * cpad * itemsize
            xs = (th + 2 * m) * w * cpad * itemsize if stage_columns else 0
            samp = samp_bufs * th * w * cpad * itemsize
            planes = 2 * 3 * kh * kh * _round8(th) * w * 4  # dbl-buffered f32
            blocks = 2 * th * w * coutp * itemsize          # out
            if slab + xs + samp + planes + blocks <= b:
                return th
    raise ValueError(
        f"no VMEM-feasible v4 row slab for h={h} w={w} cpad={cpad} halo={m}")


def _pick_th_tw_v4(h: int, w: int, cpad: int, coutp: int, m: int, kh: int,
                   itemsize: int = 2, budget: int = 24 * 1024 * 1024,
                   stage_columns: bool = True,
                   samp_bufs: int = 1) -> tuple:
    """(row-slab height, column-tile width) for the v4 kernel. Full width
    is preferred (one DMA per slab, no halo re-reads); when its slab
    cannot fit VMEM (e.g. 4K, W=3840), the width is tiled into equal
    columns — candidates must divide W and be lane-tile multiples (the
    planes/out BlockSpecs put TW in the minor dim). Per-tile VMEM math is
    exactly `_pick_th_v4` at width TW.

    Tile candidates are capped at 384: compile time grows with TW (real-4K
    h=2160 bisect, artifacts/compile_bisect.jsonl 2026-08-17: tw128 24 s,
    tw256 26 s, tw384 40 s — vs the round-1 >25 min hang at tw1920), and
    tw128 already matches the untiled kernel's per-pixel throughput on
    hardware (4K trained regime 312 ms/layer ~= 9x the untiled 720p 33 ms;
    2.9x zero-regime / 1.55x trained over XLA shifts), so wider tiles buy
    nothing measurable. Smallest-first: fastest compile, measured runtime.

    Untiled full width is preferred only up to W=1280 (the widest
    hardware-VALIDATED untiled shape, 720p): the round-3 1080p demo
    kernel-faulted the TPU worker mid-run with the auto plan's untiled
    (TH=8, TW=1920) — the same width family whose compile the round-1
    bisect flagged as pathological — while the tiled 4K path ran clean;
    round 2's "1080p demo killed a TPU worker" (docs/ROUND2_STATUS.md
    session 12) was this, misattributed to HBM pressure. Wider images
    tile (at no measured per-pixel cost, see above)."""
    cands = ([w] if w <= 1280 else []) \
        + [t for t in (128, 256, 384) if t < w and w % t == 0]
    if not cands:
        # Non-tileable width wider than 1280 (e.g. 1366, 1600): the only
        # plan left would be the untiled-wide compile family that kernel-
        # faulted the TPU worker at 1920 (see docstring). Report infeasible
        # so the layer degrades to the numerically identical XLA shifts
        # path instead of risking a hard worker fault.
        raise ValueError(
            f"width {w} > 1280 has no 128/256/384 column tiling; refusing "
            "the untiled-wide plan (kernel-fault risk) — use the XLA "
            "shifts fallback")
    for tw in cands:
        try:
            th = _pick_th_v4(h, tw, cpad, coutp, m, kh, itemsize=itemsize,
                             budget=budget, stage_columns=stage_columns,
                             samp_bufs=samp_bufs)
            return th, tw
        except ValueError:
            continue
    raise ValueError(
        f"no VMEM-feasible v4 (row-slab, column-tile) for h={h} w={w} "
        f"cpad={cpad} halo={m}")


def _sampling_kernel_v4(pm_ref, bd_ref, w_ref, b_ref, x_hbm, out_ref,
                        x_tile, xs_ref, samp_ref, sem, *, kh: int,
                        kw: int, R: int, TH: int, W: int, C: int, cout: int,
                        padding: int, stage_columns: bool,
                        samp_bufs: int = 1, _dbg: str = "full"):
    """v4: absolute-column-shift hoisting, fused row windows inside a
    fori_loop, scalar SMEM predicates, top-level matmuls.

    Differences vs `_sampling_kernel` (v3), each addressing a measured
    cost (tools/bench_kernels.py):
      - column staging is hoisted to the ABSOLUTE shift `ux` and shared by
        every tap that uses it: <= 2(R+padding)+1 staging copies per slab
        (7 for R=2) instead of kh*kw*(2R+1) (45); the ux=0 slice is
        sublane-aligned by construction (left pad 8) and never staged;
      - ALL skip predicates are scalar compares against per-slab offset
        min/max bounds precomputed on the host and delivered via SMEM
        (`bd_ref`), replacing v3's per-(tap, shift) (TH, W) max-reductions
        whose scalar results serialized the pipeline;
      - offsets arrive as PRE-CLIPPED f32 planes (`pm_ref`, (1, 3*taps,
        TH, W): dy*9, dx*9, mask*9), so no per-lane channel extraction
        happens in the kernel;
      - per (tap, ux) pair the row-shift window is a FUSED expression of
        leading-dim slices writing one sample-buffer slot (one store
        instead of 2R+1 accumulator read-modify-write passes), split into
        a 3-term core + individually bound-guarded |offset|>1 extras;
      - matmuls accumulate straight into the bf16 out block at top level
        (no f32 accumulator scratch, halving accumulation traffic; the
        XLA shifts op accumulates in the compute dtype too).

    Mosaic constraint that shaped all of this: VMEM stack slots are NOT
    reused across statically-unrolled `pl.when` regions — any (TH, W, C)
    temporary inside the 45 per-(tap, ux) guards overflows the 16 MB
    scoped-vmem stack (observed 63-69 MB at a 32x128 toy size), whether
    from a dot or a fused elementwise blend. Loop bodies get ONE reused
    frame, so the per-tap blends run inside a `fori_loop` over the
    kernel-row index i. Guarded regions outside loops contain only
    relayout copies (stack-safe, v3-proven).

    bd_ref (SMEM): (1, 1, 1, 4, taps) = rows (dymin, dymax, dxmin, dxmax)
    of the CLIPPED offsets over this (row-slab, column-tile). w_ref:
    (kh*kw, C, cout). samp_ref: (TH, W, C) — one blended-sample buffer,
    written and consumed within a single (tap, ux) fori iteration.

    W here is the COLUMN-TILE width (== the full image width when the
    image fits untiled). The grid is (batch, row-slabs, column-tiles).
    When tiled (ncols > 1), x_hbm arrives as (B, ncols, Hp, wp_t, C):
    the host pre-gathers each tile's column window (tile columns + the 8
    left-pad + M halo from the neighbor tile / global zero padding), so
    the slab DMA keeps a SINGLE dynamic-start dim — a column slice in the
    DMA itself (two dynamic-start dims) hangs this toolchain's Mosaic
    compiler, re-confirmed 2026-08-17. Slab column s maps to image
    column ci*W + s - 8 either way.
    """
    M = R + 1
    b = pl.program_id(0)
    r = pl.program_id(1)
    ci = pl.program_id(2)

    if len(x_hbm.shape) == 5:   # column-tiled: tile index is an array dim
        src_rows = x_hbm.at[b, ci, pl.ds(r * TH, TH + 2 * M)]
    else:
        src_rows = x_hbm.at[b, pl.ds(r * TH, TH + 2 * M)]
    cp = pltpu.make_async_copy(src_rows, x_tile, sem)
    cp.start()
    cp.wait()

    n_taps = kh * kw
    out_ref[0] = jnp.broadcast_to(b_ref[0], (TH, W, cout)).astype(
        out_ref.dtype)
    if _dbg == "empty":   # DMA + block pipeline + init only
        return

    # samp_bufs > 1: alternate sample buffers between consecutive
    # (tap, ux) iterations so the VPU blend of iteration k+1 has no WAR
    # hazard against the MXU dot still reading iteration k's samples —
    # the hardware can overlap them. samp_bufs == 1 keeps the proven
    # single-buffer codegen byte-identical.
    if samp_bufs == 1:
        def samp_set(d, v):
            samp_ref[...] = v

        def samp_add(d, v):
            samp_ref[...] += v

        def samp_get(d):
            return samp_ref[...]
    else:
        def samp_set(d, v):
            samp_ref[d] = v

        def samp_add(d, v):
            samp_ref[d] += v

        def samp_get(d):
            return samp_ref[d]

    pair_idx = 0  # static count of (tap-column, ux) fori instances emitted

    for ux in range(-(padding + R), (kw - 1 - padding) + R + 1):
        rel_j = [j for j in range(kw) if abs(ux - (j - padding)) <= R]
        aligned = (ux == 0)  # left pad 8 => slice offset 8 is aligned

        if stage_columns and not aligned:
            preds = []
            for j in rel_j:
                sx = ux - (j - padding)
                for i in range(kh):
                    t = i * kw + j
                    preds.append(jnp.logical_and(
                        bd_ref[0, 0, 0, 3, t] > sx - 1,
                        bd_ref[0, 0, 0, 2, t] < sx + 1))
            any_pred = functools.reduce(jnp.logical_or, preds)

            @pl.when(any_pred)
            def _(ux=ux):
                xs_ref[...] = x_tile[:, 8 + ux:8 + ux + W, :]

        if stage_columns:
            src, c0 = (x_tile, 8) if aligned else (xs_ref, 0)
        else:
            src, c0 = x_tile, 8 + ux

        for j in rel_j:
            sx = ux - (j - padding)
            phase = (pair_idx * kh) % samp_bufs
            pair_idx += 1

            def blend(i, _, j=j, sx=sx, src=src, c0=c0, phase=phase):
                t = i * kw + j
                d = (i + phase) % samp_bufs if samp_bufs > 1 else 0
                pred = jnp.logical_and(bd_ref[0, 0, 0, 3, t] > sx - 1,
                                       bd_ref[0, 0, 0, 2, t] < sx + 1)
                # Row slice for relative shift v-R in [-R, R]:
                # start = M + (i - padding) + (v - R).
                base = M - padding - R + i

                # Inactive pairs skip EVERYTHING — blend, extras and
                # matmul (a skipped pair contributes exactly zero). This
                # is legal here because a fori body is a single codegen
                # frame: the dot's temporaries do not multiply per tap.
                @pl.when(pred)
                def _():
                    if _dbg == "noblend":
                        samp_set(d, src[pl.ds(base + R, TH),
                                        c0:c0 + W, :])
                    elif _dbg == "nowgt":
                        expr = None
                        for v in range(R - 1, R + 2):
                            rows = src[pl.ds(base + v, TH), c0:c0 + W, :]
                            expr = (rows if expr is None
                                    else expr + rows.astype(samp_ref.dtype))
                        samp_set(d, expr)
                    else:
                        # Weight math in f32 (coordinates), then CAST THE
                        # FINAL WEIGHT TO THE BLEND DTYPE: an all-bf16
                        # blend halves VMEM traffic and avoids f32 temp
                        # materialization of the converted rows (the XLA
                        # shifts op casts its weights to the compute
                        # dtype the same way, so numerics match).
                        #
                        # NOTE (measured, do not "optimize"): hoisting the
                        # [:, :, None] insertions of dy/axm out of the
                        # per-v terms and deriving ay in the transposed
                        # space is 1.7-1.9x SLOWER (trained 33->55 ms at
                        # 720p): Mosaic fuses the exact
                        # `(plane2d)[:, :, None] * rows` pattern into a
                        # native broadcast-multiply, and arithmetic on the
                        # transposed value forces a materialized (TH, W, 1)
                        # layout instead.
                        dy = pm_ref[0, t]
                        axm = jnp.maximum(
                            1.0 - jnp.abs(pm_ref[0, n_taps + t] - sx), 0.0
                        ) * pm_ref[0, 2 * n_taps + t]
                        expr = None
                        for v in range(R - 1, R + 2):  # core: |shift| <= 1
                            ay = jnp.maximum(1.0 - jnp.abs(dy - (v - R)),
                                             0.0)
                            wgt = (ay * axm)[:, :, None].astype(
                                samp_ref.dtype)
                            rows = src[pl.ds(base + v, TH), c0:c0 + W, :]
                            term = wgt * rows
                            expr = term if expr is None else expr + term
                        samp_set(d, expr)

                        for v in (list(range(R - 1)) +
                                  list(range(R + 2, 2 * R + 1))):
                            predv = jnp.logical_and(
                                bd_ref[0, 0, 0, 1, t] > (v - R) - 1,
                                bd_ref[0, 0, 0, 0, t] < (v - R) + 1)

                            @pl.when(predv)
                            def _(v=v):
                                ay = jnp.maximum(
                                    1.0 - jnp.abs(dy - (v - R)), 0.0)
                                wgt = (ay * axm)[:, :, None].astype(
                                    samp_ref.dtype)
                                rows = src[pl.ds(base + v, TH),
                                           c0:c0 + W, :]
                                samp_add(d, wgt * rows)

                    if _dbg != "nodot":
                        out_ref[0] += jax.lax.dot_general(
                            samp_get(d).reshape(TH * W, C),
                            w_ref[t],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).reshape(TH, W, cout).astype(out_ref.dtype)

                return 0

            jax.lax.fori_loop(0, kh, blend, 0)


@functools.partial(jax.jit, static_argnames=("max_offset", "padding",
                                             "stage_columns", "samp_bufs",
                                             "tile_w", "_dbg"))
def deform_conv2d_pallas_v4(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    max_offset: int = 3,
    padding: int = 1,
    stage_columns: bool = True,
    samp_bufs: int = 1,
    tile_w: Optional[int] = None,
    _dbg: str = "full",
) -> jnp.ndarray:
    """Fused bounded-offset DCNv2, v4 inner structure (see
    `_sampling_kernel_v4`). Same contract as `deform_conv2d_pallas`.

    stage_columns=False reads column-shifted slices directly from the slab
    (a sublane relayout per load) instead of staging one shifted copy per
    absolute shift — frees the staging buffer (bigger row slabs) at the
    price of misaligned loads; which wins is shape-dependent, measure with
    tools/bench_kernels.py.
    """
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    if cin_g != cin:
        raise ValueError("groups == 1 only")
    R = int(max_offset)
    M = R + 1
    dtype = x.dtype
    cpad = _pad128(cin)
    coutp = _pad128(cout)
    isz = jnp.dtype(dtype).itemsize
    if tile_w is not None:  # explicit column-tile width (tests/tuning)
        if w % tile_w != 0 or (tile_w != w and tile_w % 128 != 0):
            raise ValueError(f"tile_w={tile_w} must divide w={w} and be a "
                             "lane-tile multiple")
        TW = tile_w
        TH = _pick_th_v4(h, TW, cpad, coutp, M, kh, itemsize=isz,
                         stage_columns=stage_columns, samp_bufs=samp_bufs)
    else:
        # Auto plan: untiled when its slab fits VMEM, else the smallest
        # bounded-compile column tile (see _pick_th_tw_v4 — this is what
        # makes 4K run the Pallas path instead of falling back to shifts).
        TH, TW = _pick_th_tw_v4(h, w, cpad, coutp, M, kh, itemsize=isz,
                                stage_columns=stage_columns,
                                samp_bufs=samp_bufs)
    ncols = w // TW

    # Slab: halo M on H; per column tile the window is 8 (left, aligns
    # ux=0) + TW + M + rounding columns starting at xp column ci*TW —
    # neighbor-tile pixels provide the column halo, the global
    # 8-left/right zero padding the image edges. When tiled, the windows
    # are pre-gathered into a leading tile dim so the kernel's slab DMA
    # keeps one dynamic-start dim (see _sampling_kernel_v4 docstring).
    wp_t = _round8(8 + TW + M)
    xp_w = (ncols - 1) * TW + wp_t
    xp = jnp.pad(x, ((0, 0), (M, M), (8, xp_w - w - 8), (0, cpad - cin)))
    if ncols > 1:
        xp = jnp.stack([xp[:, :, ci * TW:ci * TW + wp_t]
                        for ci in range(ncols)], axis=1)
    w_taps = jnp.pad(weight.reshape(kh * kw, cin, cout),
                     ((0, 0), (0, cpad - cin), (0, 0)))

    # Planar pre-clipped offset/mask planes (B, 3*taps, H, W) f32: the
    # kernel reads whole (TH, TW) planes by leading index instead of
    # extracting single lanes, and coordinates must be f32 anyway.
    n_taps = kh * kw
    msk = mask if mask is not None else jnp.ones((b, h, w, n_taps), dtype)
    planes = jnp.concatenate([
        jnp.clip(offset[..., 0::2].astype(jnp.float32), -R, R),
        jnp.clip(offset[..., 1::2].astype(jnp.float32), -R, R),
        msk.astype(jnp.float32)], axis=-1).transpose(0, 3, 1, 2)

    # Per-(row-slab, column-tile) offset bounds -> SMEM: rows
    # (dymin, dymax, dxmin, dxmax).
    nrows = h // TH
    r6 = planes[:, :2 * n_taps].reshape(b, 2 * n_taps, nrows, TH, ncols, TW)
    mn = r6.min(axis=(3, 5)).transpose(0, 2, 3, 1)  # (B, nr, nc, 2*taps)
    mx = r6.max(axis=(3, 5)).transpose(0, 2, 3, 1)
    bounds = jnp.stack([mn[..., :n_taps], mx[..., :n_taps],
                        mn[..., n_taps:], mx[..., n_taps:]], axis=3)

    base = functools.partial(
        _sampling_kernel_v4, kh=kh, kw=kw, R=R, TH=TH, W=TW, C=cpad,
        cout=cout, padding=padding, stage_columns=stage_columns,
        samp_bufs=samp_bufs, _dbg=_dbg)
    if stage_columns:
        kern = base
        scratch = [pltpu.VMEM((TH + 2 * M, wp_t, cpad), dtype),
                   pltpu.VMEM((TH + 2 * M, TW, cpad), dtype)]
    else:
        def kern(pm, bd, wr, br, xh, o, slab, samp, sem):
            return base(pm, bd, wr, br, xh, o, slab, None, samp, sem)
        scratch = [pltpu.VMEM((TH + 2 * M, wp_t, cpad), dtype)]
    samp_shape = ((TH, TW, cpad) if samp_bufs == 1
                  else (samp_bufs, TH, TW, cpad))
    scratch += [
        pltpu.VMEM(samp_shape, dtype),
        pltpu.SemaphoreType.DMA,
    ]

    out = pl.pallas_call(
        kern,
        grid=(b, h // TH, ncols),
        in_specs=[
            pl.BlockSpec((1, 3 * n_taps, TH, TW),
                         lambda bi, ri, ci: (bi, 0, ri, ci)),
            pl.BlockSpec((1, 1, 1, 4, n_taps),
                         lambda bi, ri, ci: (bi, ri, ci, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),       # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias (1, cout)
            pl.BlockSpec(memory_space=pl.ANY),           # padded x in HBM
        ],
        out_specs=pl.BlockSpec((1, TH, TW, cout),
                               lambda bi, ri, ci: (bi, ri, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), dtype),
        scratch_shapes=scratch,
        # v5e VMEM is 128 MiB/core; the default 16 MiB scoped limit is a
        # portability guideline this single-kernel model does not need.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(planes,
      bounds,
      w_taps.astype(dtype),
      (bias if bias is not None else jnp.zeros((cout,), dtype)
       ).reshape(1, cout).astype(dtype),
      xp)
    return out


def pallas_warp_v2_feasible(h: int, w: int, c: int, R: int,
                            itemsize: int = 2,
                            budget: int = 24 * 1024 * 1024) -> bool:
    """Static check for the strip-packed warp kernel: slab fits VMEM.
    Cheap for few-channel images (the model's C=3 case is always
    feasible); wide-channel inputs should use the XLA path."""
    m = R + 1
    sw = -(-w // 128)
    win = _round8(sw + 2 * _round8(m))
    th = next((t for t in (64, 48, 32, 16, 8, 4, 2, 1) if h % t == 0), 1)
    return (th + 2 * m) * win * c * 128 * itemsize <= budget


def _warp_kernel_v2(pm_ref, bd_ref, x_hbm, out_ref, x_tile, sem, *,
                    R: int, TH: int, SW: int, WIN: int, G: int, C: int,
                    PAD0: int):
    """Strip-packed bounded warp (v2).

    Layout trick that makes a C=3 warp TPU-shaped: the image is packed
    into G=128 column strips living on the LANE dimension (channel index
    c*G + g = color c of strip g), so
      - every (TH, SW, G) per-pixel weight field is naturally full-lane
        (the flow planes are packed the same way): the weight multiply is
        a plain same-shape elementwise op — NO minor-dim broadcast, no
        sublane transpose (the cost that dominated the DCN kernel work);
      - VMEM traffic carries 384 real channels per vreg instead of 3 of
        128 (a 42x padding tax in the naive layout).
    Cost: the packed representation duplicates R+1 halo columns per strip
    (~1.5-3x HBM for the packed copy — ~0.1 ms at 720p) and the column
    shift becomes a small misaligned sublane read of a (TH, SW, 3G) tile.

    Shift sparsity: scalar per-slab flow min/max bounds from SMEM guard
    each column shift (static unroll, 2R+1 regions whose temps are only
    (TH, SW, G)) and each row shift (inside a fori, branch per step).
    Smooth real flow fields activate (range+2)^2 of the (2R+1)^2 shifts.
    """
    M = R + 1
    b = pl.program_id(0)
    r = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * TH, TH + 2 * M)], x_tile, sem)
    cp.start()
    cp.wait()

    dxp = pm_ref[0, 0]  # (TH, SW, G) f32, pre-clipped
    dyp = pm_ref[0, 1]
    dymin = bd_ref[0, 0, 0, 0]
    dymax = bd_ref[0, 0, 0, 1]
    dxmin = bd_ref[0, 0, 0, 2]
    dxmax = bd_ref[0, 0, 0, 3]

    out_ref[0] = jnp.zeros((TH, SW, C * G), out_ref.dtype)

    for ux in range(-R, R + 1):
        pred = jnp.logical_and(dxmax > ux - 1, dxmin < ux + 1)

        @pl.when(pred)
        def _(ux=ux):
            ax = jnp.maximum(1.0 - jnp.abs(dxp - ux), 0.0)

            def vy_body(k, _, ax=ax, ux=ux):
                vy = k - R
                predy = jnp.logical_and(
                    dymax > vy.astype(jnp.float32) - 1,
                    dymin < vy.astype(jnp.float32) + 1)

                @pl.when(predy)
                def _():
                    ay = jnp.maximum(
                        1.0 - jnp.abs(dyp - vy.astype(jnp.float32)), 0.0)
                    wgt = (ax * ay).astype(out_ref.dtype)
                    rows = x_tile[pl.ds(vy + M, TH),
                                  PAD0 + ux:PAD0 + ux + SW, :]
                    for c in range(C):
                        out_ref[0, :, :, c * G:(c + 1) * G] += (
                            wgt * rows[:, :, c * G:(c + 1) * G])

                return 0

            jax.lax.fori_loop(0, 2 * R + 1, vy_body, 0)


@functools.partial(jax.jit, static_argnames=("max_flow",))
def bounded_warp_pallas_v2(image: jnp.ndarray, flow: jnp.ndarray,
                           max_flow: int = 16) -> jnp.ndarray:
    """Backward-warp via the strip-packed kernel (see `_warp_kernel_v2`).
    Same contract as `bounded_warp_pallas`: bilinear, zeros padding,
    flow channels (dx, dy) in pixels, clipped to [-max_flow, max_flow]."""
    b, h, w, c = image.shape
    R = int(max_flow)
    M = R + 1
    G = 128
    SW = -(-w // G)          # strip width (output columns per strip)
    wp = SW * G              # padded width (zeros; flow there irrelevant)
    PAD0 = _round8(M)
    WIN = _round8(SW + 2 * PAD0)
    dtype = image.dtype

    # Pick TH (multiple-of-8 slab heights that divide H preferred).
    TH = 1
    for th in (64, 48, 32, 16, 8, 4, 2, 1):
        if h % th == 0:
            TH = th
            break

    # Pack image into per-strip windows: window g covers image columns
    # [g*SW - PAD0, g*SW - PAD0 + WIN); channel layout color-major
    # (c*G + g) so the kernel's color slices are 128-aligned.
    xpad = jnp.pad(image, ((0, 0), (M, M),
                           (PAD0, PAD0 + (wp - w) + (WIN - SW - 2 * PAD0)),
                           (0, 0)))
    wins = jnp.stack([xpad[:, :, g * SW:g * SW + WIN, :]
                      for g in range(G)], axis=-1)   # (B, Hp, WIN, C, G)
    xpk = wins.reshape(b, h + 2 * M, WIN, c * G)

    fl = jnp.clip(flow.astype(jnp.float32), -R, R)
    fl = jnp.pad(fl, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
    # (B, H, W, 2) -> (B, 2, H, SW, G)
    pk = jnp.stack([fl[:, :, g * SW:(g + 1) * SW, :]
                    for g in range(G)], axis=-1)     # (B, H, SW, 2, G)
    planes = pk.transpose(0, 3, 1, 2, 4)

    nrows = h // TH
    r5 = planes.reshape(b, 2, nrows, TH, SW, G)
    mn = r5.min(axis=(3, 4, 5))                       # (B, 2, nrows)
    mx = r5.max(axis=(3, 4, 5))
    bounds = jnp.stack([mn[:, 1], mx[:, 1], mn[:, 0], mx[:, 0]],
                       axis=-1)[:, :, None, :]        # (B, nrows, 1, 4)

    kern = functools.partial(_warp_kernel_v2, R=R, TH=TH, SW=SW, WIN=WIN,
                             G=G, C=c, PAD0=PAD0)
    out = pl.pallas_call(
        kern,
        grid=(b, nrows),
        in_specs=[
            pl.BlockSpec((1, 2, TH, SW, G), lambda bi, ri: (bi, 0, ri, 0, 0)),
            pl.BlockSpec((1, 1, 1, 4), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, TH, SW, c * G),
                               lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, SW, c * G), dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * M, WIN, c * G), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(planes, bounds, xpk)

    # Unpack: (B, H, SW, C, G) -> (B, H, G, SW, C) -> (B, H, wp, C)
    out = out.reshape(b, h, SW, c, G).transpose(0, 1, 4, 2, 3)
    return out.reshape(b, h, wp, c)[:, :, :w, :]


def _warp_kernel(flow_ref, x_hbm, out_ref, x_tile, acc_ref, sem, *,
                 R: int, TH: int, W: int, C: int):
    """Backward warp as the k=1 special case (flow = (dx, dy) like the
    reference, reference ema_vfi.py:153-162)."""
    M = R + 1
    b = pl.program_id(0)
    r = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * TH, TH + 2 * M)], x_tile, sem)
    cp.start()
    cp.wait()

    dx = jnp.clip(flow_ref[0, :, :, 0].astype(jnp.float32), -R, R)
    dy = jnp.clip(flow_ref[0, :, :, 1].astype(jnp.float32), -R, R)
    nsh = 2 * R + 1
    acc_ref[...] = jnp.zeros((TH, W, C), jnp.float32)

    def body(k, _):
        vy = k // nsh - R
        vx = jax.lax.rem(k, nsh) - R
        ay = jnp.maximum(1.0 - jnp.abs(dy - vy.astype(jnp.float32)), 0.0)
        ax = jnp.maximum(1.0 - jnp.abs(dx - vx.astype(jnp.float32)), 0.0)
        wgt = ay * ax

        @pl.when(jnp.max(wgt) > 0.0)
        def _():
            rows = x_tile[pl.ds(vy + M, TH), :, :]
            rolled = pltpu.roll(rows, -(vx + M), axis=1)
            acc_ref[...] += wgt[:, :, None] * rolled[:, :W, :]

        return 0

    jax.lax.fori_loop(0, nsh * nsh, body, 0)
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_flow",))
def bounded_warp_pallas(image: jnp.ndarray, flow: jnp.ndarray,
                        max_flow: int = 16) -> jnp.ndarray:
    """Backward-warp `image` by `flow` (pixel units, channels (dx, dy)),
    bilinear with zeros padding — `vfi_tpu.ops.warp` semantics for
    |flow| <= max_flow (saturating beyond).

    Args:
      image: (B, H, W, C); flow: (B, H, W, 2).
    """
    b, h, w, c = image.shape
    R = int(max_flow)
    M = R + 1
    dtype = image.dtype
    cpad = _pad128(c)
    TH = _pick_th(h, w, cpad, cpad, M, itemsize=jnp.dtype(dtype).itemsize,
                  tile_itemsize=4)  # warp tile is f32 (dynamic rotate)
    xp = _pad_input(image, M, cpad, dtype=jnp.float32)  # rotate needs f32

    kern = functools.partial(_warp_kernel, R=R, TH=TH, W=w, C=cpad)
    out = pl.pallas_call(
        kern,
        grid=(b, h // TH),
        in_specs=[
            pl.BlockSpec((1, TH, w, 2), lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, TH, w, cpad), lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cpad), dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * M, _round8(w + 2 * M), cpad), jnp.float32),
            pltpu.VMEM((TH, w, cpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(flow, xp)
    return out[..., :c]


# --------------------------------------------------------------------------
# v5: transposed compute layout — C in SUBLANES, W in LANES.
#
# v4's structural ceiling is lane padding: every (TH, W, C) sample buffer,
# blend term and tap matmul runs at cpad = pad128(C) lanes — 1.9x wasted
# VPU/MXU work at the model's C=67 (and still 2x at a lane-dense C=64,
# since 64 also pads to 128 in isolation). v5 transposes the compute
# layout to (TH, C, W): the channel dim sits in SUBLANES (padded only to
# the 8-sublane tile: 67 -> 72, a 7% tax instead of 91%) and the image
# width provides dense 128-lane tiles. Per blend term the VPU touches
# C_pad8/128ths of v4's vregs.
#
# Column shifts (the reason v4 stages shifted copies in-kernel) become
# LANE shifts in this layout — instead of risking lane-rotate relayouts,
# the HOST precomputes one transposed, column-shifted, zero-padded copy of
# the input per absolute shift ux (<= 2(R+padding)+1 = 7 copies at R=2):
# XLA emits them as fused pad/slice/transpose passes (~1 ms of HBM traffic
# at 720p against a ~33 ms/layer kernel), and the kernel's only dynamic
# slicing is in the leading (row) dim — always free. The per-ux slab DMA
# is skipped entirely when the SMEM offset bounds prove no tap uses that
# shift. Bias is added on the host (a fused elementwise pass over the
# output) so the kernel never broadcasts from a leading dim.
#
# The tap matmul contracts over sublane-resident C with cout in the
# result's LEADING dim — so cout needs no 128-padding either:
#     out[cout, TH, W] += w_tap[C, cout]^T . samp[TH, C, W]
# --------------------------------------------------------------------------


def _pick_th_v5(h: int, wl: int, cs: int, cout: int, m: int, n_taps: int,
                itemsize: int = 2, budget: int = 24 * 1024 * 1024,
                slabs: int = 2) -> int:
    """Row-slab height for the v5 buffer set: one (TH + 2m, Cs, Wl) slab,
    one (TH, Cs, Wl) sample buffer, double-buffered f32 plane blocks and
    out blocks. TH must divide h and be a multiple of 8 (TH is the
    second-minor dim of the plane/out blocks)."""
    cands = (64, 48, 32, 16, 8) + ((h,) if h < 8 else ())
    for b in (budget, 48 * 1024 * 1024):
        for th in cands:
            if h % th != 0:
                continue
            slab = slabs * (th + 2 * m) * cs * wl * itemsize
            samp = th * cs * wl * itemsize
            planes = 2 * 3 * n_taps * _round8(th) * wl * 4
            blocks = 2 * cout * th * wl * itemsize
            if slab + samp + planes + blocks <= b:
                return th
    raise ValueError(
        f"no VMEM-feasible v5 row slab for h={h} wl={wl} cs={cs} halo={m}")


def pallas_sampling_v5_feasible(h: int, w: int, c: int, cout: int, R: int,
                                itemsize: int = 2,
                                tile_w: Optional[int] = None) -> bool:
    """Static feasibility of the v5 kernel for this shape (and, when
    tile_w is given, of its column-tiled predicate plan — the tile must
    evenly split the lane-padded width into lane-tile multiples)."""
    if not pallas_backend_supported():
        return False
    wl = -(-w // 128) * 128
    if tile_w is not None and (wl % tile_w != 0 or tile_w % 128 != 0):
        return False
    try:
        _pick_th_v5(h, wl, _round8(c), cout, R + 1, 9,
                    itemsize=itemsize)
        return True
    except ValueError:
        return False


def _sampling_kernel_v5(pm_ref, bd_ref, w_ref, x_hbm, out_ref,
                        x_tile, xs_ref, samp_ref, sem, sem2, *, kh: int,
                        kw: int, R: int, TH: int, W: int, C: int,
                        cout: int, padding: int, ux_list: tuple,
                        variant: str = "dot_nhwc", prefetch: bool = True,
                        prep: str = "stage", TW_t: Optional[int] = None,
                        _dbg: str = "full"):
    """Transposed-layout DCN forward (see the v5 block comment).

    pm_ref: (1, 3*taps, TH, W) f32 pre-clipped planes (dy*9, dx*9, mask*9).
    bd_ref: (1, 1, 4, taps) SMEM clipped-offset bounds for this row slab —
        or, with TW_t set (column-tiled predicates, the v4 tw-plan ported
        to this layout), (1, 1, ntiles, 4, taps) bounds per (row slab,
        column tile): the W lanes split into W // TW_t static tiles and
        every (tap, shift) pair is predicated PER TILE, so regions of the
        image whose offsets never reach a shift skip its blend + matmul
        even when some other region needs it. Proven 8-18%/layer on v4
        trained offsets (docs/PERFORMANCE.md); layout-independent.
    w_ref: (taps, Cs, cout) tap weights (C sublane-padded with zeros).
    x_hbm: (B, n_ux, Hp, Cs, Wl) — per-absolute-shift transposed copies.
    out_ref: (1, cout, TH, W) block of the (B, cout, H, W) output.
    x_tile: (TH + 2M, Cs, Wl) VMEM slab. samp_ref: (TH, Cs, Wl).
    """
    M = R + 1
    b = pl.program_id(0)
    r = pl.program_id(1)
    n_taps = kh * kw

    out_shape = ((TH, W, cout) if variant == "dot_nhwc"
                 else (cout, TH, W))
    out_ref[0] = jnp.zeros(out_shape, out_ref.dtype)
    if _dbg == "empty":   # block pipeline + init only
        return

    sems = (sem, sem2)

    if prep == "stage":
        # ONE wide transposed slab per row-slab (x_hbm is (B, Hp, Cs,
        # WL_wide)); per-ux windows are staged in-VMEM by a static
        # lane-offset copy — no per-shift HBM copies at all.
        cpw = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(r * TH, TH + 2 * M)], x_tile, sem)
        cpw.start()
        cpw.wait()

    def _copy(ui2):
        dst = x_tile.at[ui2 % 2] if prefetch else x_tile
        return pltpu.make_async_copy(
            x_hbm.at[b, ui2, pl.ds(r * TH, TH + 2 * M)], dst,
            sems[ui2 % 2] if prefetch else sem)

    if prep == "copies" and prefetch:
        # Double-buffered slab DMA: ui+1's copy runs while ui blends.
        # Copies are unconditional (the compute skip predicates remain) —
        # hiding the ~6 ms/layer of serialized DMA waits measured in the
        # single-buffer split (artifacts/v5_split.log) costs at most the
        # few extra copies the skip would have avoided, off the critical
        # path.
        _copy(0).start()

    for ui, ux in enumerate(ux_list):
        rel_j = [j for j in range(kw) if abs(ux - (j - padding)) <= R]

        # Skip the slab DMA when no tap can use this absolute shift.
        preds = []
        for j in rel_j:
            sx = ux - (j - padding)
            for i in range(kh):
                t = i * kw + j
                if TW_t is None:
                    preds.append(jnp.logical_and(
                        bd_ref[0, 0, 3, t] > sx - 1,
                        bd_ref[0, 0, 2, t] < sx + 1))
                else:
                    for ci in range(W // TW_t):
                        preds.append(jnp.logical_and(
                            bd_ref[0, 0, ci, 3, t] > sx - 1,
                            bd_ref[0, 0, ci, 2, t] < sx + 1))
        any_pred = functools.reduce(jnp.logical_or, preds)

        if prep == "copies" and prefetch:
            if ui + 1 < len(ux_list):
                _copy(ui + 1).start()
            _copy(ui).wait()

        @pl.when(any_pred)
        def _(ui=ui, ux=ux, rel_j=rel_j):
            side = padding + R
            if prep == "stage":
                # static lane-offset staging copy from the wide slab
                xs_ref[...] = x_tile[:, :, side + ux:side + ux + W]
                tile = xs_ref
            elif prefetch:
                tile = x_tile.at[ui % 2]
            else:
                tile = x_tile
                cp = _copy(ui)
                cp.start()
                cp.wait()
            if _dbg == "dma":   # DMA loop only, no compute
                return

            for j in rel_j:
                sx = ux - (j - padding)

                def blend_tiled(i, _, j=j, sx=sx):
                    # Column-tiled predicates: every (tap, shift) pair is
                    # guarded per static lane tile, so image regions whose
                    # offsets never reach this shift skip its blend AND
                    # matmul (a skipped tile's contribution is exactly
                    # zero — all its mask-weighted axm terms vanish — so
                    # output is bit-identical to untiled). dot_nhwc
                    # orientation only (enforced at the wrapper).
                    t = i * kw + j
                    base = M - padding - R + i
                    for ci in range(W // TW_t):
                        lo = ci * TW_t
                        pred = jnp.logical_and(
                            bd_ref[0, 0, ci, 3, t] > sx - 1,
                            bd_ref[0, 0, ci, 2, t] < sx + 1)

                        @pl.when(pred)
                        def _(ci=ci, lo=lo, t=t, base=base):
                            if _dbg == "noblend":
                                samp_ref[:, :, lo:lo + TW_t] = tile[
                                    pl.ds(M, TH), :, lo:lo + TW_t]
                            else:
                                dy = pm_ref[0, t, :, lo:lo + TW_t]
                                axm = jnp.maximum(
                                    1.0 - jnp.abs(
                                        pm_ref[0, n_taps + t, :,
                                               lo:lo + TW_t] - sx), 0.0
                                ) * pm_ref[0, 2 * n_taps + t, :,
                                           lo:lo + TW_t]
                                expr = None
                                for v in range(R - 1, R + 2):
                                    ay = jnp.maximum(
                                        1.0 - jnp.abs(dy - (v - R)), 0.0)
                                    wgt = (ay * axm)[:, None, :].astype(
                                        samp_ref.dtype)
                                    rows = tile[pl.ds(base + v, TH), :,
                                                lo:lo + TW_t]
                                    term = wgt * rows
                                    expr = (term if expr is None
                                            else expr + term)
                                samp_ref[:, :, lo:lo + TW_t] = expr

                                for v in (list(range(R - 1)) +
                                          list(range(R + 2, 2 * R + 1))):
                                    predv = jnp.logical_and(
                                        bd_ref[0, 0, ci, 1, t]
                                        > (v - R) - 1,
                                        bd_ref[0, 0, ci, 0, t]
                                        < (v - R) + 1)

                                    @pl.when(predv)
                                    def _(v=v):
                                        ay = jnp.maximum(
                                            1.0 - jnp.abs(dy - (v - R)),
                                            0.0)
                                        samp_ref[:, :, lo:lo + TW_t] += (
                                            (ay * axm)[:, None, :].astype(
                                                samp_ref.dtype)
                                            * tile[pl.ds(base + v, TH), :,
                                                   lo:lo + TW_t])

                            if _dbg != "nodot":
                                out_ref[0, :, lo:lo + TW_t, :] += (
                                    jax.lax.dot_general(
                                        samp_ref[:, :, lo:lo + TW_t],
                                        w_ref[t],
                                        dimension_numbers=(
                                            ((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                    ).astype(out_ref.dtype))
                    return 0

                def blend(i, _, j=j, sx=sx):
                    t = i * kw + j
                    pred = jnp.logical_and(bd_ref[0, 0, 3, t] > sx - 1,
                                           bd_ref[0, 0, 2, t] < sx + 1)
                    base = M - padding - R + i

                    def do_dot(t=t):
                        if _dbg == "nodot":
                            return
                        if variant == "dot_nhwc":
                            # contraction over sublane C of lhs; result in
                            # the v4-style NHWC block orientation
                            out_ref[0] += jax.lax.dot_general(
                                samp_ref[...], w_ref[t],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            ).astype(out_ref.dtype)
                        else:
                            out_ref[0] += jax.lax.dot_general(
                                w_ref[t], samp_ref[...],
                                dimension_numbers=(((0,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            ).astype(out_ref.dtype)

                    def mkwgt(plane2d):
                        # (TH, W) f32 -> (TH, 1-or-C, W) multiplier
                        if variant == "bcast":
                            return jax.lax.broadcast_in_dim(
                                plane2d.astype(samp_ref.dtype),
                                (TH, C, W), (0, 2))
                        return plane2d[:, None, :].astype(samp_ref.dtype)

                    @pl.when(pred)
                    def _():
                        if _dbg == "noblend":
                            samp_ref[...] = tile[pl.ds(M, TH)]
                            do_dot()
                            return
                        dy = pm_ref[0, t]                       # (TH, W) f32
                        axm = jnp.maximum(
                            1.0 - jnp.abs(pm_ref[0, n_taps + t] - sx), 0.0
                        ) * pm_ref[0, 2 * n_taps + t]
                        expr = None
                        for v in range(R - 1, R + 2):  # core |shift| <= 1
                            ay = jnp.maximum(
                                1.0 - jnp.abs(dy - (v - R)), 0.0)
                            wgt = mkwgt(ay * axm)
                            rows = tile[pl.ds(base + v, TH)]  # (TH, Cs, W)
                            term = wgt * rows
                            expr = term if expr is None else expr + term
                        samp_ref[...] = expr

                        for v in (list(range(R - 1)) +
                                  list(range(R + 2, 2 * R + 1))):
                            predv = jnp.logical_and(
                                bd_ref[0, 0, 1, t] > (v - R) - 1,
                                bd_ref[0, 0, 0, t] < (v - R) + 1)

                            @pl.when(predv)
                            def _(v=v):
                                ay = jnp.maximum(
                                    1.0 - jnp.abs(dy - (v - R)), 0.0)
                                samp_ref[...] += mkwgt(ay * axm) * tile[
                                    pl.ds(base + v, TH)]

                        do_dot()

                    return 0

                jax.lax.fori_loop(
                    0, kh, blend_tiled if TW_t is not None else blend, 0)


@functools.partial(jax.jit, static_argnames=("max_offset", "padding",
                                             "variant", "prefetch",
                                             "prep", "tile_w", "_dbg"))
def deform_conv2d_pallas_v5(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    max_offset: int = 3,
    padding: int = 1,
    variant: str = "dot_nhwc",
    prefetch: bool = True,
    prep: str = "stage",
    tile_w: Optional[int] = None,
    _dbg: str = "full",
) -> jnp.ndarray:
    """Fused bounded-offset DCNv2, transposed compute layout (v5).

    Same contract and numerics as `deform_conv2d_pallas_v4` /
    `deform_conv2d_shifts` (NHWC in/out, stride 1, og=1, groups=1);
    internally C rides the sublane dim so the VPU blend and tap matmuls
    run lane-dense at any channel count.

    tile_w: optional static column-tile width for the skip predicates
    (the v4 tw plan ported to this layout — bounds are computed per
    (row slab, lane tile) and every (tap, shift) pair is guarded per
    tile; output bit-identical, see `_sampling_kernel_v5`). Unlike v4's,
    this tiling adds NO extra DMA traffic — the slab stays one wide
    transposed copy; only the predicate granularity changes. Requires
    the production dot_nhwc/stage configuration.
    """
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    if cin_g != cin:
        raise ValueError("groups == 1 only")
    R = int(max_offset)
    M = R + 1
    dtype = x.dtype
    cs = _round8(cin)
    wl = -(-w // 128) * 128
    isz = jnp.dtype(dtype).itemsize
    TH = _pick_th_v5(h, wl, cs, cout, M, kh * kw, itemsize=isz,
                     slabs=2 if prefetch else 1)

    ux_list = tuple(range(-(padding + R), (kw - 1 - padding) + R + 1))
    # (B, Hp, Cs, W + pad): transpose once; then either one shifted
    # zero-padded copy per absolute column shift (prep="copies") or a
    # single wide array the kernel lane-stages from (prep="stage").
    xt = jnp.pad(x, ((0, 0), (M, M), (0, 0), (0, cs - cin))
                 ).transpose(0, 1, 3, 2)                   # (B, Hp, Cs, W)
    side = padding + R
    if prep == "stage":
        wide = -(-(2 * side + wl) // 128) * 128
        xs = jnp.pad(xt, ((0, 0), (0, 0), (0, 0),
                          (side, wide - side - w)))        # (B, Hp, Cs, wide)
    else:
        xt_wide = jnp.pad(xt, ((0, 0), (0, 0), (0, 0),
                               (side, side + wl - w)))
        xs = jnp.stack([
            jax.lax.slice_in_dim(xt_wide, side + ux, side + ux + wl, axis=3)
            for ux in ux_list], axis=1)                    # (B, n_ux, Hp, Cs, Wl)

    w_taps = jnp.pad(weight.reshape(kh * kw, cin, cout),
                     ((0, 0), (0, cs - cin), (0, 0)))

    n_taps = kh * kw
    msk = mask if mask is not None else jnp.ones((b, h, w, n_taps), dtype)
    planes = jnp.concatenate([
        jnp.clip(offset[..., 0::2].astype(jnp.float32), -R, R),
        jnp.clip(offset[..., 1::2].astype(jnp.float32), -R, R),
        msk.astype(jnp.float32)], axis=-1).transpose(0, 3, 1, 2)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (0, wl - w)))

    nrows = h // TH
    if tile_w is None:
        r6 = planes[:, :2 * n_taps, :, :w].reshape(
            b, 2 * n_taps, nrows, TH, w)
        mn = r6.min(axis=(3, 4)).transpose(0, 2, 1)        # (B, nr, 2*taps)
        mx = r6.max(axis=(3, 4)).transpose(0, 2, 1)
        bounds = jnp.stack([mn[..., :n_taps], mx[..., :n_taps],
                            mn[..., n_taps:], mx[..., n_taps:]], axis=2)
        # (B, nr, 4, taps)
        bounds_spec = pl.BlockSpec((1, 1, 4, n_taps),
                                   lambda bi, ri: (bi, ri, 0, 0),
                                   memory_space=pltpu.SMEM)
    else:
        if variant != "dot_nhwc" or prep != "stage":
            raise ValueError("tile_w requires the production dot_nhwc/"
                             "stage v5 configuration")
        if wl % tile_w != 0 or tile_w % 128 != 0:
            raise ValueError(
                f"tile_w={tile_w} must divide the lane-padded width {wl} "
                "and be a lane-tile multiple")
        ntl = wl // tile_w
        # Bounds over the PADDED planes: the zero lanes past w only add
        # (dy=dx=0) to the last tile's range — conservative (keeps the
        # center pairs live there), never skips a needed term.
        r6 = planes[:, :2 * n_taps].reshape(
            b, 2 * n_taps, nrows, TH, ntl, tile_w)
        mn = r6.min(axis=(3, 5)).transpose(0, 2, 3, 1)     # (B,nr,ntl,2t)
        mx = r6.max(axis=(3, 5)).transpose(0, 2, 3, 1)
        bounds = jnp.stack([mn[..., :n_taps], mx[..., :n_taps],
                            mn[..., n_taps:], mx[..., n_taps:]], axis=3)
        # (B, nr, ntl, 4, taps)
        bounds_spec = pl.BlockSpec((1, 1, ntl, 4, n_taps),
                                   lambda bi, ri: (bi, ri, 0, 0, 0),
                                   memory_space=pltpu.SMEM)

    kern = functools.partial(
        _sampling_kernel_v5, kh=kh, kw=kw, R=R, TH=TH, W=wl, C=cs,
        cout=cout, padding=padding, ux_list=ux_list, variant=variant,
        prefetch=prefetch, prep=prep, TW_t=tile_w, _dbg=_dbg)
    if variant == "dot_nhwc":
        out_spec = pl.BlockSpec((1, TH, wl, cout),
                                lambda bi, ri: (bi, ri, 0, 0))
        out_sds = jax.ShapeDtypeStruct((b, h, wl, cout), dtype)
    else:
        out_spec = pl.BlockSpec((1, cout, TH, wl),
                                lambda bi, ri: (bi, 0, ri, 0))
        out_sds = jax.ShapeDtypeStruct((b, cout, h, wl), dtype)

    out = pl.pallas_call(
        kern,
        grid=(b, nrows),
        in_specs=[
            pl.BlockSpec((1, 3 * n_taps, TH, wl),
                         lambda bi, ri: (bi, 0, ri, 0)),
            bounds_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),         # weights
            pl.BlockSpec(memory_space=pl.ANY),             # xs in HBM
        ],
        out_specs=out_spec,
        out_shape=out_sds,
        scratch_shapes=[
            (pltpu.VMEM((TH + 2 * M, cs,
                         -(-(2 * side + wl) // 128) * 128), dtype)
             if prep == "stage" else
             pltpu.VMEM(((2, TH + 2 * M, cs, wl) if prefetch
                         else (TH + 2 * M, cs, wl)), dtype)),
            pltpu.VMEM((TH + 2 * M, cs, wl), dtype),
            pltpu.VMEM((TH, cs, wl), dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(planes, bounds, w_taps.astype(dtype), xs)

    if variant == "dot_nhwc":
        out = out[:, :, :w, :]                             # already NHWC
    else:
        out = out[..., :w].transpose(0, 2, 3, 1)           # NHWC
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, cout).astype(dtype)
    return out
