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

Covers boxes up to ~62 cells on the long axis at their assigned level
(aspect ~4.8 at the FPN envelope); rarer, longer boxes lose their outermost
taps (treated as out-of-bounds zeros, like the boundary rule).

Replaces the same op as ops/roi_align.py (reference ROIAlignV2 binding,
SURVEY §2.3 N1); the XLA version remains the autodiff/training path and the
test oracle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _sample_coords_1d, assign_fpn_levels

PATCH = 32      # y window (free DMA offset alignment)
PATCH_X = 40    # x window: origins must be 8-aligned (Mosaic sublane tiling),
                # so cover the worst 7-cell alignment slack


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


def _plan(boxes, strides, level_shapes, out_size, sampling_ratio, min_level):
    """Per-box plan: level, 2 sub-patch origins (y/x), weights (2, PS, PATCH)."""
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
    Hpad = jnp.asarray([max(s[0], PATCH) for s in level_shapes], jnp.int32)[lvl]
    Wpad = jnp.asarray(
        [max(-(-s[1] // 8) * 8, PATCH_X) for s in level_shapes], jnp.int32
    )[lvl]

    b = boxes * scales[:, None] - 0.5
    ys = jax.vmap(lambda lo, sz: _sample_coords_1d(lo, sz, out_size, sampling_ratio))(
        b[:, 1], b[:, 3] - b[:, 1]
    )
    xs = jax.vmap(lambda lo, sz: _sample_coords_1d(lo, sz, out_size, sampling_ratio))(
        b[:, 0], b[:, 2] - b[:, 0]
    )

    split_x = (b[:, 2] - b[:, 0]) >= (b[:, 3] - b[:, 1])

    def origins(pos, limit, pad_limit, split, patch, align):
        t0 = jnp.clip(jnp.floor(jnp.clip(pos[:, 0], 0.0, None)).astype(jnp.int32),
                      0, jnp.maximum(limit.astype(jnp.int32) - 1, 0))
        t0 = (t0 // align) * align
        o0 = jnp.clip(t0, 0, pad_limit - patch)
        # split only when the box's taps actually overflow the first window —
        # boxes at their canonical FPN level (extent <= ~29 cells + alignment
        # slack) always fit, so the second 655KB patch DMA is skipped for the
        # vast majority of RoIs (the kernel tests oy0!=oy1 | ox0!=ox1)
        lim = jnp.maximum(limit.astype(jnp.int32), 1)
        t_last = jnp.minimum(
            jnp.floor(jnp.clip(pos[:, -1], 0.0, None)).astype(jnp.int32) + 1,
            lim - 1,
        )
        overflow = t_last >= o0 + patch
        o1 = jnp.where(split & overflow,
                       jnp.clip(o0 + patch, 0, pad_limit - patch), o0)
        return jnp.stack([o0, o1], axis=1)  # (N, 2)

    oy = origins(ys, Hs, Hpad, ~split_x, PATCH, 1)
    ox = origins(xs, Ws, Wpad, split_x, PATCH_X, 8)

    wy = jax.vmap(_axis_weights, in_axes=(0, 0, 0, None))(ys, Hs, oy, PATCH)
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
    return lvl.astype(jnp.int32), oy.astype(jnp.int32), ox.astype(jnp.int32), wy, wx


def multilevel_roi_align_pallas(features, boxes, strides, out_size: int = 7,
                                sampling_ratio: int = 2, min_level: int = 2,
                                interpret: bool | None = None):
    """Single-image entry: features list of (H_l, W_l, C); boxes (N, 4)."""
    return multilevel_roi_align_pallas_batched(
        [f[None] for f in features], boxes[None], strides, out_size,
        sampling_ratio, min_level, interpret,
    )[0]


def multilevel_roi_align_pallas_batched(features, boxes, strides,
                                        out_size: int = 7,
                                        sampling_ratio: int = 2,
                                        min_level: int = 2,
                                        interpret: bool | None = None):
    """Batched pallas ROIAlign over an FPN pyramid.

    NOTE: do NOT jax.vmap the single-image version — the kernel drives its own
    sequential grid and DMA pipeline, so batching is handled natively here via
    a per-box image index. features: list of (B, H_l, W_l, C); boxes
    (B, N, 4). Returns (B, N, out_size, out_size, C) float32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = boxes.shape[:2]
    C = features[0].shape[-1]
    P, S = out_size, sampling_ratio
    level_shapes = [f.shape[1:3] for f in features]

    lvl, oy, ox, wy, wx = jax.vmap(
        lambda bx: _plan(bx, strides, level_shapes, P, S, min_level)
    )(boxes)
    img = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, N))

    # flatten batch into one box list
    NB = B * N
    img = img.reshape(NB)
    lvl = lvl.reshape(NB)
    oy, ox = oy.reshape(-1), ox.reshape(-1)  # (2*NB,) interleaved per box
    wy = wy.reshape(NB, 2, P * S, PATCH)
    wx = wx.reshape(NB, 2, P * S, PATCH_X)

    # fold the SxS average pool into the weight matrices: the bilinear sample
    # grid and the mean are both linear, so out = (mean_S W_y) B (mean_S W_x)^T
    wy = wy.reshape(NB, 2, P, S, PATCH).mean(axis=3)
    wx = wx.reshape(NB, 2, P, S, PATCH_X).mean(axis=3)
    N = NB

    # Stack every level of every image into ONE (rows, Wmax, C) buffer so the
    # kernel needs a single unconditional DMA per sub-patch (dynamic row
    # offset) instead of per-level predicated branches. ~1.5x padded memory;
    # removes 5x2xK @pl.when blocks of control overhead per grid step.
    Wmax = max(max(-(-f.shape[2] // 8) * 8, PATCH_X) for f in features)
    feats = []
    row_off, off = [], 0
    for f in features:
        ph = max(PATCH - f.shape[1], 0)
        f = jnp.pad(f, ((0, 0), (0, ph), (0, Wmax - f.shape[2]), (0, 0)))
        row_off.append(off)
        off += f.shape[1]
        feats.append(f)
    rows_per_img = off
    flat = jnp.concatenate(feats, axis=1).reshape(-1, Wmax, C)  # (B*rows, Wmax, C)
    dtype = flat.dtype
    row_off = np.asarray(row_off, np.int32)

    # per-box absolute row origin: img * rows_per_img + level offset + y0
    oy = (oy.reshape(NB, 2)
          + img[:, None] * rows_per_img
          + jnp.asarray(row_off)[lvl][:, None]).reshape(-1)

    # K boxes per grid step to amortize per-step control overhead; bounded by
    # VMEM (patch scratch = 2 slots * K * 2 sub-patches * PATCH*PATCH_X*C)
    K = 4 if jnp.dtype(dtype).itemsize <= 2 else 2
    pad_n = (-N) % K
    if pad_n:
        lvl = jnp.pad(lvl, (0, pad_n))
        oy = jnp.pad(oy, (0, 2 * pad_n))
        ox = jnp.pad(ox, (0, 2 * pad_n))
        wy = jnp.pad(wy, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
    Np = N + pad_n
    n_steps = Np // K

    def kernel(*args):
        oy_ref, ox_ref = args[:2]
        flat_ref = args[2]
        wy_ref, wx_ref, out_ref, patch_buf, sems = args[3:]
        i = pl.program_id(0)
        num = pl.num_programs(0)

        def needs_q1(box):
            return (oy_ref[2 * box] != oy_ref[2 * box + 1]) | (
                ox_ref[2 * box] != ox_ref[2 * box + 1]
            )

        def start_dma(step, slot):
            for k in range(K):
                box = step * K + k
                q1 = needs_q1(box)
                for q in range(2):
                    yy = oy_ref[2 * box + q]  # absolute row (img+level folded)
                    # origins are 8-aligned in _plan; Mosaic needs the proof
                    xx = pl.multiple_of(ox_ref[2 * box + q], 8)

                    # compact boxes skip the split sub-patch (its
                    # contribution is masked to zero in the compute)
                    @pl.when((q == 0) | q1)
                    def _():
                        pltpu.make_async_copy(
                            flat_ref.at[pl.ds(yy, PATCH), pl.ds(xx, PATCH_X), :],
                            patch_buf.at[slot, k, q],
                            sems.at[slot, k, q],
                        ).start()

        @pl.when(i == 0)
        def _():
            start_dma(0, 0)

        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < num)
        def _():
            start_dma(i + 1, next_slot)

        for k in range(K):
            box = i * K + k
            q1_here = needs_q1(box)
            for q in range(2):
                @pl.when((q == 0) | q1_here)
                def _():
                    pltpu.make_async_copy(
                        flat_ref.at[pl.ds(0, PATCH), pl.ds(0, PATCH_X), :],
                        patch_buf.at[slot, k, q],
                        sems.at[slot, k, q],
                    ).wait()

            acc = jnp.zeros((P, P, C), jnp.float32)
            for q in range(2):
                pt = patch_buf[slot, k, q]  # (PATCH, PATCH_X, C)
                wy_b = wy_ref[k, q].astype(pt.dtype)  # (P, PATCH)
                wx_b = wx_ref[k, q].astype(pt.dtype)  # (P, PATCH_X)
                prec = (jax.lax.Precision.HIGHEST if pt.dtype == jnp.float32
                        else jax.lax.Precision.DEFAULT)
                a = jax.lax.dot_general(
                    wy_b, pt.reshape(PATCH, PATCH_X * C),
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                    precision=prec,
                ).astype(pt.dtype).reshape(P, PATCH_X, C)
                b = jax.lax.dot_general(
                    wx_b, a, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (P_x, P_y, C)
                contrib = jnp.transpose(b, (1, 0, 2))
                if q == 1:
                    # skipped sub-patches read stale scratch: even with zero
                    # weights, 0 * NaN/Inf garbage = NaN — mask, don't rely
                    # on the weights (the intermittent-NaN bug of record)
                    contrib = jnp.where(q1_here, contrib, 0.0)
                acc = acc + contrib
            out_ref[k] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((K, 2, P, PATCH), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 2, P, PATCH_X), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, P, P, C), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, K, 2, PATCH, PATCH_X, C), dtype),
            pltpu.SemaphoreType.DMA((2, K, 2)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, P, P, C), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oy, ox, flat, wy, wx)
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

    def xla_pool(feats):
        return jax.vmap(
            lambda fl, bx: multilevel_roi_align(
                list(fl), bx, list(strides), out_size, sampling_ratio, min_level
            )
        )(feats, boxes)

    _, vjp = jax.vjp(xla_pool, list(features))
    (d_feats,) = vjp(g.astype(jnp.float32))
    d_feats = [d.astype(f.dtype) for d, f in zip(d_feats, features)]
    return tuple(d_feats), None


multilevel_roi_align_fast.defvjp(
    _fast_fwd, _fast_bwd,
)
