"""Pallas TPU kernel for multi-level ROIAlign (inference hot path).

The XLA gather formulation of ROIAlign reads 4 feature rows per bilinear
sample — ~784 row-gathers per RoI — and TPU gathers sustain only ~130 GB/s,
making the box pooler the single most expensive stage of Cube R-CNN inference
(stage ablation: ~8.4 ms of a 15 ms step for 1000 RoIs @512px).

Key property of FPN level assignment: a box routed to level l satisfies
sqrt(area)/2^l <= 28 cells, so extent_x * extent_y <= 28^2 — at most ONE axis
can exceed a 32-cell window. Per RoI we therefore DMA TWO (PATCH, PATCH, C)
sub-patches tiled along the box's longer axis (the second degenerates to a
zero-weight duplicate for compact boxes), and bilinear interpolation over the
sample grid becomes per-sub-patch matmul pairs with 1-hot-pair weight
matrices built outside the kernel:

    S = sum_q  Wx_q @ (Wy_q @ B_q)        (MXU work, no gathers)

followed by SxS average pooling to the 7x7 output. Sub-patch DMAs are
double-buffered across the sequential grid so copy overlaps compute. HBM
traffic: ~2 contiguous patches/RoI instead of ~784 scattered rows.

MXU packing: a per-box (P, PATCH) x (PATCH, PATCH_X*C) matmul runs at ~5%
MXU utilization (M=7, K=32 both pad to the 128x128 systolic tile). The
y-contraction of all K boxes in a grid step is therefore fused into ONE
block-diagonal matmul — lhs (K*8, K*PATCH) with box k's (P, PATCH) weight
block on the diagonal, rhs the K patches stacked along the contraction dim —
filling the full 128-deep contraction. The q=1 (split) matmul is predicated
on any box in the step actually needing it. The x-contraction stays per-box
but contracts a 2-strip (q0|q1) buffer in one dot. Net: ~34 MXU tiles per
box instead of ~160.

Layout: the pyramid is staged in HBM as 2D (rows, W*C) so a patch DMA lands
directly in the (PATCH, PATCH_X*C) operand layout of the y-matmul — the
(PATCH_X, C) -> PATCH_X*C lane merge would otherwise be a full VMEM relayout
per sub-patch (sublane<->lane traffic comparable to the matmul itself). A
2D source slice [y:y+PATCH, x*C:(x*C + PATCH_X*C)] is x-contiguous, so x
origins need no sublane alignment and the x window shrinks to PATCH cells.

Covers boxes up to ~62 cells on the long axis at their assigned level
(aspect ~4.8 at the FPN envelope); rarer, longer boxes lose their outermost
taps (treated as out-of-bounds zeros, like the boundary rule).

Replaces the same op as ops/roi_align.py (reference ROIAlignV2 binding,
SURVEY §2.3 N1); the XLA version remains the autodiff/training path and the
test oracle.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _sample_coords_1d, assign_fpn_levels

PATCH = 32      # y window (free DMA offset alignment)
PATCH_X = 32    # x window: origins are lane offsets in the 2D (rows, W*C)
                # pyramid staging, so no alignment slack is needed


def _taps(pos, limit):
    """Bilinear taps with torchvision boundary semantics.

    pos: (PS,) global feature coords; limit: scalar float extent.
    Returns (lo, hi int32 (PS,), w_lo, w_hi f32 (PS,))."""
    inside = (pos >= -1.0) & (pos <= limit)
    p = jnp.clip(pos, 0.0, None)
    lo = jnp.floor(p).astype(jnp.int32)
    at_edge = lo >= limit - 1
    lo = jnp.where(at_edge, (limit - 1).astype(jnp.int32), lo)
    hi = jnp.where(at_edge, lo, lo + 1)
    frac = jnp.where(at_edge, 0.0, p - lo.astype(p.dtype))
    w_lo = jnp.where(inside, 1.0 - frac, 0.0)
    w_hi = jnp.where(inside, frac, 0.0)
    return lo, hi, w_lo, w_hi


def _axis_weights(pos, limit, origins, patch):
    """(2, PS, patch) sub-patch weight matrices for one axis of one box.

    origins: (2,) sub-patch origins along this axis. Every tap contributes to
    the sub-patch that contains it (q=0 preferred when both do).
    """
    lo, hi, w_lo, w_hi = _taps(pos, limit)
    cells = jnp.arange(patch)[None, None, :]  # (1, 1, patch)

    def place(t, w):
        # local coords per quadrant: (2, PS)
        local = t[None, :] - origins[:, None]
        in_q = (local >= 0) & (local < patch)
        # q0 wins when a tap lies in both (overlapping clipped windows)
        in_q = in_q & jnp.concatenate(
            [jnp.ones((1,) + t.shape, bool), ~in_q[:1]], axis=0
        )
        return (cells == local[:, :, None]) * (w[None, :, None] * in_q[:, :, None])

    return place(lo, w_lo) + place(hi, w_hi)


def _last_tap(pos, limit):
    lim = jnp.maximum(limit.astype(jnp.int32), 1)
    return jnp.minimum(
        jnp.floor(jnp.clip(pos[:, -1], 0.0, None)).astype(jnp.int32) + 1,
        lim - 1,
    )


def _plan(boxes, strides, level_shapes, out_size, sampling_ratio, min_level):
    """Per-box plan: level, 2 sub-patch origins (y rows / x cells), y phase,
    weights (2, P*S, PATCH)."""
    n_levels = len(strides)
    lvl = assign_fpn_levels(boxes, min_level, min_level + n_levels - 1) - min_level
    # coverage bump: extremely elongated boxes (aspect beyond ~4.8 at the FPN
    # envelope) cannot fit 2 sub-patches at their assigned level; pool them
    # from the smallest coarser level where the long side fits 2*PATCH-2
    # cells. Only such outliers deviate from reference level routing.
    max_side = jnp.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1])
    fit_lvl = jnp.ceil(
        jnp.log2(jnp.maximum(max_side, 1.0) / (strides[0] * (2.0 * PATCH - 2.0)))
    ).astype(jnp.int32)
    lvl = jnp.clip(jnp.maximum(lvl, fit_lvl), 0, n_levels - 1)
    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)[lvl]
    Hs = jnp.asarray([s[0] for s in level_shapes], jnp.float32)[lvl]
    Ws = jnp.asarray([s[1] for s in level_shapes], jnp.float32)[lvl]

    b = boxes * scales[:, None] - 0.5
    ys = jax.vmap(lambda lo, sz: _sample_coords_1d(lo, sz, out_size, sampling_ratio))(
        b[:, 1], b[:, 3] - b[:, 1]
    )
    xs = jax.vmap(lambda lo, sz: _sample_coords_1d(lo, sz, out_size, sampling_ratio))(
        b[:, 0], b[:, 2] - b[:, 0]
    )

    split_x = (b[:, 2] - b[:, 0]) >= (b[:, 3] - b[:, 1])

    # --- y origins: rows of the 2D staging are sublane-tiled, so DMA row
    # offsets must be 8-aligned. The staging holds TWO phase copies of the
    # pyramid (rows 0.. and rows 4..), so rounding t0 down to its nearest
    # phase leaves <= 3 rows of slack — extent (<28) + 2 boundary taps + 3
    # slack still fits the 32-row window. `oy` is the level-local aligned
    # row in the chosen copy; `oy_cells` feeds the weight builder.
    t0y = jnp.clip(jnp.floor(jnp.clip(ys[:, 0], 0.0, None)).astype(jnp.int32),
                   0, jnp.maximum(Hs.astype(jnp.int32) - 1, 0))
    r8 = t0y % 8
    phase_y = (r8 >= 4).astype(jnp.int32)
    oy0_cells = t0y - r8 + 4 * phase_y
    oy0_mem = t0y - r8
    overflow_y = _last_tap(ys, Hs) >= oy0_cells + PATCH
    split_y = (~split_x) & overflow_y
    oy_cells = jnp.stack([oy0_cells, oy0_cells + split_y * PATCH], axis=1)
    oy_mem = jnp.stack([oy0_mem, oy0_mem + split_y * PATCH], axis=1)

    # --- x origins: lane offsets in the 2D staging, no alignment needed;
    # clip to the staging width (reads past a level's true width hit padding
    # or neighbor cells whose tap weights are zero)
    Wmax = max(max(s[1] for s in level_shapes), PATCH_X)
    t0x = jnp.clip(jnp.floor(jnp.clip(xs[:, 0], 0.0, None)).astype(jnp.int32),
                   0, jnp.maximum(Ws.astype(jnp.int32) - 1, 0))
    ox0 = jnp.clip(t0x, 0, Wmax - PATCH_X)
    overflow_x = _last_tap(xs, Ws) >= ox0 + PATCH_X
    sx = split_x & overflow_x
    ox1 = jnp.where(sx, jnp.clip(ox0 + PATCH_X, 0, Wmax - PATCH_X), ox0)
    ox = jnp.stack([ox0, ox1], axis=1)

    wy = jax.vmap(_axis_weights, in_axes=(0, 0, 0, None))(ys, Hs, oy_cells, PATCH)
    wx = jax.vmap(_axis_weights, in_axes=(0, 0, 0, None))(xs, Ws, ox, PATCH_X)

    # unsplit axis: both quadrants share the origin; q-ownership in
    # _axis_weights routes all taps to q0 there. Combine so that
    # S = sum_q Wx[q] @ (Wy[q] @ B_q):
    #   split on x: B_q differ in x -> Wy must be full for both q
    #   split on y: B_q differ in y -> Wx must be full for both q
    wy_full = wy.sum(axis=1, keepdims=True)
    wx_full = wx.sum(axis=1, keepdims=True)
    wy = jnp.where(split_x[:, None, None, None], jnp.tile(wy_full, (1, 2, 1, 1)), wy)
    wx = jnp.where(split_x[:, None, None, None], wx, jnp.tile(wx_full, (1, 2, 1, 1)))
    return (lvl.astype(jnp.int32), oy_mem.astype(jnp.int32),
            phase_y.astype(jnp.int32), ox.astype(jnp.int32), wy, wx)


def multilevel_roi_align_pallas(features, boxes, strides, out_size: int = 7,
                                sampling_ratio: int = 2, min_level: int = 2,
                                interpret: bool | None = None):
    """Single-image entry: features list of (H_l, W_l, C); boxes (N, 4)."""
    return multilevel_roi_align_pallas_batched(
        [f[None] for f in features], boxes[None], strides, out_size,
        sampling_ratio, min_level, interpret,
    )[0]


def stage_pyramid(features):
    """Stack every level of every image into ONE 2D (rows, Wmax*C) buffer so
    the kernel needs a single unconditional DMA per sub-patch (dynamic row
    offset) instead of per-level predicated branches, and so each patch
    arrives in the y-matmul's (PATCH, PATCH_X*C) operand layout (see module
    docstring). Two phase copies (rows 0.., rows 4..) keep the y-DMA slack
    under the 8-row tile alignment; 64 tail rows absorb window overreads
    (their tap weights are zero). ~3x padded memory on the pyramid.

    Callers pooling the same pyramid more than once per step (box + cube
    pooler) should stage once and pass the result via `staged=`.

    Returns (flat, row_off int32 (L,), rows_per_img, total_rows).
    """
    C = features[0].shape[-1]
    Wmax = max(max(f.shape[2] for f in features), PATCH_X)
    feats = []
    row_off, off = [], 0
    for f in features:
        ph = -(-f.shape[1] // 8) * 8 - f.shape[1]
        f = jnp.pad(f, ((0, 0), (0, ph), (0, Wmax - f.shape[2]), (0, 0)))
        row_off.append(off)
        off += f.shape[1]
        feats.append(f)
    rows_per_img = off
    base = jnp.concatenate(feats, axis=1).reshape(-1, Wmax * C)  # (B*rows, Wmax*C)
    total_rows = base.shape[0]
    shifted = jnp.pad(base[4:], ((0, 4), (0, 0)))
    flat = jnp.concatenate(
        [base, shifted, jnp.zeros((2 * PATCH, Wmax * C), base.dtype)], axis=0
    )
    return flat, np.asarray(row_off, np.int32), rows_per_img, total_rows


def multilevel_roi_align_pallas_batched(features, boxes, strides,
                                        out_size: int = 7,
                                        sampling_ratio: int = 2,
                                        min_level: int = 2,
                                        interpret: bool | None = None,
                                        out_dtype=None,
                                        staged=None):
    """Batched pallas ROIAlign over an FPN pyramid.

    NOTE: do NOT jax.vmap the single-image version — the kernel drives its own
    sequential grid and DMA pipeline, so batching is handled natively here via
    a per-box image index. features: list of (B, H_l, W_l, C); boxes
    (B, N, 4). Returns (B, N, out_size, out_size, C) in `out_dtype`
    (default float32; pass the feature dtype to halve the output-store
    traffic when the consumer casts anyway). `staged` takes a previous
    `stage_pyramid(features)` result to share the staging between calls.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = boxes.shape[:2]
    C = features[0].shape[-1]
    P, S = out_size, sampling_ratio
    level_shapes = [f.shape[1:3] for f in features]

    lvl, oy, phase_y, ox, wy, wx = jax.vmap(
        lambda bx: _plan(bx, strides, level_shapes, P, S, min_level)
    )(boxes)
    img = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, N))

    # flatten batch into one box list
    NB = B * N
    img = img.reshape(NB)
    lvl = lvl.reshape(NB)
    phase_y = phase_y.reshape(NB)
    oy, ox = oy.reshape(-1), ox.reshape(-1)  # (2*NB,) interleaved per box
    wy = wy.reshape(NB, 2, P * S, PATCH)
    wx = wx.reshape(NB, 2, P * S, PATCH_X)

    # fold the SxS average pool into the weight matrices: the bilinear sample
    # grid and the mean are both linear, so out = (mean_S W_y) B (mean_S W_x)^T
    wy = wy.reshape(NB, 2, P, S, PATCH).mean(axis=3)
    wx = wx.reshape(NB, 2, P, S, PATCH_X).mean(axis=3)
    N = NB

    flat, row_off, rows_per_img, total_rows = staged or stage_pyramid(features)
    dtype = flat.dtype

    # per-box absolute row origin: phase section + img block + level offset
    oy = (oy.reshape(NB, 2)
          + (img[:, None] * rows_per_img
             + jnp.asarray(row_off)[lvl][:, None]
             + phase_y[:, None] * total_rows))
    # pack (row, x-cell) into one int32 per (box, q): rows in bits [0,18),
    # x cell in [18,31). One scalar read replaces two, and sub-patch
    # equality (the q1 test) becomes word equality.
    n_flat_rows = 2 * (rows_per_img * B) + 2 * PATCH
    assert n_flat_rows < (1 << 18), n_flat_rows
    Wmax_cells = flat.shape[1] // C
    assert Wmax_cells <= (1 << 13), Wmax_cells
    pk = (oy + (ox.reshape(NB, 2) << 18)).reshape(-1)

    # K boxes per grid step to amortize per-step control overhead; bounded by
    # VMEM (patch scratch = 2 slots * K * 2 sub-patches * PATCH*PATCH_X*C)
    K = 4 if jnp.dtype(dtype).itemsize <= 2 else 2
    pad_n = (-N) % K
    if pad_n:
        lvl = jnp.pad(lvl, (0, pad_n))
        pk = jnp.pad(pk, (0, 2 * pad_n))
        wy = jnp.pad(wy, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
    Np = N + pad_n
    n_steps = Np // K

    # round the per-box output rows up to the f32 sublane tile so box k's
    # strip of the block-diagonal result starts 8-aligned
    P8 = -(-P // 8) * 8
    # q1 strip origin in the 2-strip y-buffer: 16-aligned for bf16 stores
    XPAD = -(-PATCH_X // 16) * 16
    XW = XPAD + PATCH_X  # y-buffer width (q0 strip | q1 strip)

    # block-diagonal y-contraction weights, one (K*P8, K*PATCH) lhs per grid
    # step and q: box k's (P, PATCH) block sits at rows k*P8, cols k*PATCH
    wy_pad = jnp.pad(wy, ((0, 0), (0, 0), (0, P8 - P), (0, 0)))  # (Np,2,P8,PATCH)
    wy_g = wy_pad.reshape(n_steps, K, 2, P8, PATCH)
    eye = jnp.eye(K, dtype=wy.dtype)
    bd = jnp.einsum("skqpc,kj->sqkpjc", wy_g, eye).reshape(
        n_steps, 2, K * P8, K * PATCH
    )
    # 2-strip x weights: [wx_q0 | 0pad | wx_q1]
    wx_cat = jnp.zeros((Np, P, XW), wx.dtype)
    wx_cat = wx_cat.at[:, :, :PATCH_X].set(wx[:, 0])
    wx_cat = wx_cat.at[:, :, XPAD:XPAD + PATCH_X].set(wx[:, 1])

    if jnp.dtype(dtype).itemsize <= 2:
        bd = bd.astype(dtype)
        wx_cat = wx_cat.astype(dtype)

    def kernel(*args):
        pk_ref = args[0]
        flat_ref = args[1]
        bd_ref, wx_ref, out_ref, patch_buf, ybuf, sem_q0, sem_q1 = args[2:]
        i = pl.program_id(0)
        num = pl.num_programs(0)
        prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)

        def unpack(w):
            # row (phase+img+level folded) 8-aligned by construction; x lane
            # offset is cell * C
            yy = pl.multiple_of(w & ((1 << 18) - 1), 8)
            xx = pl.multiple_of((w >> 18) * C, math.gcd(C, 128))
            return yy, xx

        def start_dma(step, slot):
            for k in range(K):
                box = step * K + k
                w0 = pk_ref[2 * box]
                w1 = pk_ref[2 * box + 1]

                yy, xx = unpack(w0)
                # all K q0 copies share one byte-counting semaphore; the
                # compute side waits once for all of them
                pltpu.make_async_copy(
                    flat_ref.at[pl.ds(yy, PATCH), pl.ds(xx, PATCH_X * C)],
                    patch_buf.at[slot, 0, k], sem_q0.at[slot]
                ).start()

                # compact boxes skip the split sub-patch (its block in
                # bd/wx_cat is zero; the scratch holds finite values)
                @pl.when(w0 != w1)
                def _():
                    yy1, xx1 = unpack(w1)
                    pltpu.make_async_copy(
                        flat_ref.at[pl.ds(yy1, PATCH), pl.ds(xx1, PATCH_X * C)],
                        patch_buf.at[slot, 1, k],
                        sem_q1.at[slot, k],
                    ).start()

        @pl.when(i == 0)
        def _():
            # zero both slots once: skipped q1 DMAs leave their patch slot
            # untouched, and 0-weight x finite stale data is 0, but
            # uninitialized VMEM can hold NaN/Inf bit patterns (0*NaN=NaN —
            # the intermittent-NaN bug of record); ybuf's strip-alignment gap
            # (cols PATCH_X..XPAD) is never written afterwards
            patch_buf[...] = jnp.zeros_like(patch_buf)
            ybuf[...] = jnp.zeros_like(ybuf)
            start_dma(0, 0)

        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < num)
        def _():
            start_dma(i + 1, next_slot)

        q1_here = [pk_ref[2 * (i * K + k)] != pk_ref[2 * (i * K + k) + 1]
                   for k in range(K)]
        any_q1 = q1_here[0]
        for k in range(1, K):
            any_q1 = any_q1 | q1_here[k]

        # one merged wait for the K q0 patches (the wait amount is the byte
        # size of the ref, so a (K, PATCH, PATCH_X*C)-shaped wait object
        # consumes all K completions on the shared semaphore)
        pltpu.make_async_copy(
            patch_buf.at[slot, 0], patch_buf.at[slot, 0], sem_q0.at[slot]
        ).wait()
        for k in range(K):
            @pl.when(q1_here[k])
            def _():
                pltpu.make_async_copy(
                    flat_ref.at[pl.ds(0, PATCH), pl.ds(0, PATCH_X * C)],
                    patch_buf.at[slot, 1, k],
                    sem_q1.at[slot, k],
                ).wait()

        # fused y-contraction: (K*P8, K*PATCH) @ (K*PATCH, PATCH_X*C); the
        # (K, PATCH) -> K*PATCH sublane merge is layout-free (PATCH is a
        # whole number of sublane tiles)
        def y_pass(q):
            pt = patch_buf[slot, q].reshape(K * PATCH, PATCH_X * C)
            y = jax.lax.dot_general(
                bd_ref[0, q], pt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(dtype)
            return y.reshape(K * P8, PATCH_X, C)

        ybuf[:, :PATCH_X, :] = y_pass(0)

        @pl.when(any_q1)
        def _():
            ybuf[:, XPAD:, :] = y_pass(1)

        @pl.when(jnp.logical_not(any_q1))
        def _():
            # stale strip-1 rows would meet nonzero wx halves of y-split
            # boxes from other steps; keep the strip zero when unused
            ybuf[:, XPAD:, :] = jnp.zeros((K * P8, PATCH_X, C), dtype)

        # x-contraction for all K boxes in ONE batched dot — per-dot issue
        # overhead on the scalar core is comparable to the dot itself at
        # these shapes (measured ~0.56us per (P,XW)x(P,XW,C) issue)
        a = ybuf[...].reshape(K, P8, XW, C)[:, :P]  # (K, P, XW, C)
        b = jax.lax.dot_general(
            wx_ref[...], a, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (K, P_x, P_y, C)
        out_ref[...] = jnp.transpose(b, (0, 2, 1, 3)).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 2, K * P8, K * PATCH), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, P, XW), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, P, P, C), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, K, PATCH, PATCH_X * C), dtype),
            pltpu.VMEM((K * P8, XW, C), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, K)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, P, P, C), out_dtype or jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pk, flat, bd, wx_cat)
    return out[:N].reshape(B, N // B, P, P, C)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def multilevel_roi_align_fast(features, boxes, strides, out_size=7,
                              sampling_ratio=2, min_level=2):
    """Differentiable pooler: pallas kernel forward, XLA-transpose backward.

    RoI pooling is linear in the features, so the backward pass reuses the
    XLA gather formulation's VJP (a scatter-add); the hot forward runs the
    patch-DMA kernel. `strides` must be a tuple (static).
    """
    return multilevel_roi_align_pallas_batched(
        list(features), boxes, list(strides), out_size, sampling_ratio, min_level
    )


def _fast_fwd(features, boxes, strides, out_size, sampling_ratio, min_level):
    out = multilevel_roi_align_pallas_batched(
        list(features), boxes, list(strides), out_size, sampling_ratio, min_level
    )
    return out, (features, boxes)


def _fast_bwd(strides, out_size, sampling_ratio, min_level, res, g):
    from .roi_align import multilevel_roi_align

    features, boxes = res

    if jax.default_backend() == "tpu":
        from .roi_align_bwd_pallas import roi_align_bwd_pallas

        d_feats = roi_align_bwd_pallas(
            features, boxes, g.astype(jnp.float32), list(strides), out_size,
            sampling_ratio, min_level,
        )
        return tuple(d_feats), None

    def xla_pool(feats):
        return jax.vmap(
            lambda fl, bx: multilevel_roi_align(
                list(fl), bx, list(strides), out_size, sampling_ratio, min_level
            )
        )(feats, boxes)

    # pooling is linear in the features (boxes carry no gradient, matching
    # torchvision ROIAlign): the unused primal forward is dead code under
    # jit, so this costs one transposed gather (a scatter-add)
    _, vjp = jax.vjp(xla_pool, list(features))
    (d_feats,) = vjp(g.astype(jnp.float32))
    d_feats = [d.astype(f.dtype) for d, f in zip(d_feats, features)]
    return tuple(d_feats), None


multilevel_roi_align_fast.defvjp(
    _fast_fwd, _fast_bwd,
)
