"""Pallas TPU kernels for multi-level ROIAlign (inference + training fwd).

The XLA gather formulation of ROIAlign reads 4 feature rows per bilinear
sample — ~784 row-gathers per RoI — and TPU gathers sustain only ~130 GB/s,
making the box pooler the single most expensive stage of Cube R-CNN inference
(stage ablation: ~8.4 ms of a 15 ms step for 1000 RoIs @512px).

Key property of FPN level assignment: a box routed to level l satisfies
sqrt(area)/2^l <= 28 cells. Per RoI we take up to TWO (PATCH_X, BY) windows
tiled along the axis whose taps overflow a single window (the second
collapses to a duplicate of the first for compact boxes — the majority —
and its weight block is exactly zero); boxes whose taps fit neither a
2-window x split nor a 2-window y split at their assigned level are bumped
to the first coarser level where they do (FIT_* caps below — a documented
routing deviation, PARITY.md). The WHOLE separable bilinear pooling
collapses to ONE clean 2D matmul per window:

    S[py*8+px, c] = sum_{x,y} A[py*8+px, x*BY+y] * B[(x,y), c]
    A[r, x*BY+y]  = wy[r//8, y] * wx[r%8, x]     (rank-1 in (y, x) per row)

The pyramid is staged TRANSPOSED in HBM as (rows=(img, level, x), Hp, C):
x is the outer dim (free offsets), y the sublane dim (align-rounded origins,
the <= align-1 cells of slack absorbed by the BY-row window), c the lane
dim. A window then lands as (PATCH_X, BY, C) whose free 2D view ((x, y), C)
is directly the matmul rhs — no intermediate buffer, no transpose. (Earlier
designs: a two-matmul separable form lowered to ~64 mostly-padding MXU ops;
a 32-row window needed TWO +4-shifted phase copies of the staging to get
8-aligned origins — folding the slack into a 40/48-row window instead
halves the staging memory AND traffic and makes splits rare: y coverage per
window is BY-align+1-2 >= 31 cells vs 28 for the old phased 32-row window.)

Two kernel modes share the plan and the staging layout:

* DMA mode (`mode="dma"`): per-window async copies HBM->VMEM,
  double-buffered across a sequential grid; compute hides entirely under
  the patch DMA, which is HBM-bandwidth-bound (~1.2 us/RoI at bs=32x1000).
* Plane-resident mode (`mode="res"`): grid (image, box-step); the whole
  staged per-image pyramid (one contiguous (rows_blk, Hp, C) block,
  ~25 MB at 512px/C=256/bf16) is pipeline-revisited in VMEM across the
  image's box steps, so windows are VMEM reads — HBM traffic drops from
  ~2 windows/RoI (~1 MB) to the plane once per image (~25x less), leaving
  the per-box pooling matmul as the floor. Windows read at align-rounded
  sublane offsets, so bf16 (sublane tile 16) uses align=16/BY=48 and f32
  (tile 8) align=8/BY=40. Auto-selected when the plane fits the VMEM
  budget (RESIDENT_MAX_BYTES).

The A matrix is built in-kernel from compact per-box factors (wy, wx
shipped as one packed (K*2*64, 128) block per step): the wy factor lands on
the (x, y) lane grid by lane-tiling (y is lane-minor), the wx factor by one
small shared one-hot matmul (EL[x, x*BY+y] = 1).

PATCH_X=16 (not 32) keys the arithmetic: the pooling matmul contracts over
XY = PATCH_X*BY cells, ~99% of which are zero-weight padding for typical
RoIs, so halving PATCH_X halves the MXU passes per box. The cost is a wider
level-bump class: boxes needing >30 x-cells or both axes past a single
window pool one level coarser (the reference routes them canonically) —
measured as the right trade because post-NMS RoIs are dominated by compact
boxes that fit ONE 16-cell window.

Replaces the same op as ops/roi_align.py (reference ROIAlignV2 binding,
SURVEY §2.3 N1); the XLA version remains the oracle.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _num_samples, _sample_grid_1d, assign_fpn_levels

PATCH_X = 16    # x window: origins are outer-dim offsets, no alignment slack
BY_DMA = 40     # y window for DMA mode: 8-aligned origins (HBM sublane
                # granularity), <=7 slack + <=31-cell extent + 2 taps
CHUNK_Y = 32    # resident-mode y base chunk: windows are read as a 32-row
                # base + conditional (BY-32)-row tail; a multiple of both
                # sublane aligns (8/16) so the tail offset stays aligned

# Level-routing fit caps in tap-extent CELLS at the pooled level,
# deliberately GEOMETRY-INDEPENDENT (min over the (40,8)/(48,16) window
# geometries) so DMA/resident forwards and the backward route every box to
# the SAME level regardless of dtype/mode:
FIT_X1 = PATCH_X - 2        # single x window
FIT_X2 = 2 * PATCH_X - 2    # split-x pair
FIT_Y1 = 31                 # single y window: BY - align - 1 (40-8-1 = 48-16-1)
FIT_Y2 = 71                 # split-y pair: 2*BY - align - 1, min over geoms
# largest per-image staged plane the resident kernel will keep in VMEM
# (double-buffered by the pipeline; budget leaves room for weights, the A
# build and the f32 accumulator inside vmem_limit_bytes=100MB)
RESIDENT_MAX_BYTES = 40 * 2 ** 20


def _window_geom(dtype):
    """(BY, align) for VMEM-resident window reads: dynamic sublane slices
    must respect the dtype's tile — 8 rows for 4-byte, 16 for 2-byte.
    1-byte dtypes have a 32-row sublane tile, which these geometries do NOT
    satisfy; callers route them to the XLA oracle instead."""
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize >= 4:
        return 40, 8
    if itemsize == 2:
        return 48, 16
    raise NotImplementedError(
        f"{jnp.dtype(dtype)} has a 32-row sublane tile; the pallas pooler "
        "supports 2- and 4-byte feature dtypes (1-byte falls back to XLA)")


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
    """(2, PS, patch) sub-window weight matrices for one axis of one box.

    origins: (2,) sub-window origins along this axis. Every tap contributes
    to the sub-window that contains it (q=0 preferred when both do).
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


def _plan(boxes, strides, level_shapes, out_size, sampling_ratio, min_level,
          BY=BY_DMA, align=8):
    """Per-box plan: level, 2 sub-window origins (y rows align-rounded /
    x cells free), sample-reduced weights wy (2, P, BY) / wx (2, P, PATCH_X).

    The y origin is the first tap rounded DOWN to `align` (DMA sublane
    granularity is 8; VMEM-resident bf16 reads need 16); the <= align-1
    rows of slack live inside the BY window, so no phase copies of the
    staging are needed and a window covers BY-align+1 cells of taps. A
    second window (origin +BY on y or +PATCH_X on x, along the overflowing
    axis only) extends coverage to ~2x; for compact boxes both windows
    coincide and the q1 weight block is exactly zero (kernels skip its
    matmul/DMA via word equality).

    sampling_ratio=0 reproduces torchvision's per-box adaptive grid exactly
    (see roi_align._sample_grid_1d) — the adaptive count only changes the
    per-sample weights folded in here; the tap footprint, window geometry and
    the kernels are untouched."""
    n_levels = len(strides)
    lvl = assign_fpn_levels(boxes, min_level, min_level + n_levels - 1) - min_level
    # coverage bump: the 2 sub-windows split along ONE axis, so a box fits
    # at a level iff (x <= FIT_X2 cells AND y <= FIT_Y1) — split on x —
    # or (x <= FIT_X1 AND y <= FIT_Y2) — split on y. Boxes fitting neither
    # pool from the first coarser level where they do (documented routing
    # deviation, PARITY.md; the caps are geometry-independent so every
    # kernel mode and the backward route identically).
    sx_px = boxes[:, 2] - boxes[:, 0]
    sy_px = boxes[:, 3] - boxes[:, 1]

    def _need(side, cap):
        return jnp.ceil(jnp.log2(jnp.maximum(side, 1.0) / (strides[0] * cap)))

    l_split_x = jnp.maximum(_need(sx_px, FIT_X2), _need(sy_px, FIT_Y1))
    l_split_y = jnp.maximum(_need(sx_px, FIT_X1), _need(sy_px, FIT_Y2))
    fit_lvl = jnp.minimum(l_split_x, l_split_y).astype(jnp.int32)
    lvl = jnp.clip(jnp.maximum(lvl, fit_lvl), 0, n_levels - 1)
    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)[lvl]
    Hs = jnp.asarray([s[0] for s in level_shapes], jnp.float32)[lvl]
    Ws = jnp.asarray([s[1] for s in level_shapes], jnp.float32)[lvl]

    b = boxes * scales[:, None] - 0.5
    ys, wys = jax.vmap(
        lambda lo, sz: _sample_grid_1d(lo, sz, out_size, sampling_ratio)
    )(b[:, 1], b[:, 3] - b[:, 1])
    xs, wxs = jax.vmap(
        lambda lo, sz: _sample_grid_1d(lo, sz, out_size, sampling_ratio)
    )(b[:, 0], b[:, 2] - b[:, 0])

    # --- x origins first: outer-dim offsets in the staging, no alignment;
    # clip to the staging width (reads past a level's true width hit padding
    # or neighbor cells whose tap weights are zero). The split axis is the
    # axis whose taps overflow a single window (the fit bump above
    # guarantees at most one axis overflows, except at the top-level clip
    # where oversized boxes truncate like the boundary rule).
    Wmax = max(max(s[1] for s in level_shapes), PATCH_X)
    t0x = jnp.clip(jnp.floor(jnp.clip(xs[:, 0], 0.0, None)).astype(jnp.int32),
                   0, jnp.maximum(Ws.astype(jnp.int32) - 1, 0))
    ox0 = jnp.clip(t0x, 0, Wmax - PATCH_X)
    split_x = _last_tap(xs, Ws) >= ox0 + PATCH_X
    ox1 = jnp.where(split_x, jnp.clip(ox0 + PATCH_X, 0, Wmax - PATCH_X), ox0)
    ox = jnp.stack([ox0, ox1], axis=1)

    # --- y origins: first tap rounded down to `align`
    t0y = jnp.clip(jnp.floor(jnp.clip(ys[:, 0], 0.0, None)).astype(jnp.int32),
                   0, jnp.maximum(Hs.astype(jnp.int32) - 1, 0))
    oy0 = t0y - t0y % align
    overflow_y = _last_tap(ys, Hs) >= oy0 + BY
    split_y = (~split_x) & overflow_y
    oy = jnp.stack([oy0, oy0 + split_y * BY], axis=1)

    wy = jax.vmap(_axis_weights, in_axes=(0, 0, 0, None))(ys, Hs, oy, BY)
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

    # fold the per-sample weights (1/count normalization + adaptive tail
    # mask) and the sample-axis reduction into the weight matrices: the
    # bilinear grid and the (weighted) mean are both linear
    Se = _num_samples(sampling_ratio)
    P = out_size
    wy = (wy * wys[:, None, :, None]).reshape(-1, 2, P, Se, BY).sum(axis=3)
    wx = (wx * wxs[:, None, :, None]).reshape(-1, 2, P, Se, PATCH_X).sum(axis=3)
    return (lvl.astype(jnp.int32), oy.astype(jnp.int32), ox.astype(jnp.int32),
            wy, wx)


def staging_extent(level_shapes, BY):
    """(col_off, rows_per_img, rows_blk, Hp) of the staged/accumulator
    layout: outer rows = levels' x cells stacked (exact widths) + PATCH_X
    zero tail rows absorbing x-window overhang; sublane dim Hp covers the
    deepest window reach Hmax-1+BY (a split q1 window origin is <= Hs-1)."""
    col_off, off = [], 0
    for (_, w) in level_shapes:
        col_off.append(off)
        off += w
    rows_per_img = off
    rows_blk = off + PATCH_X
    Hmax = max(h for (h, _) in level_shapes)
    Hp = -(-(Hmax - 1 + BY) // 8) * 8
    return np.asarray(col_off, np.int32), rows_per_img, rows_blk, Hp


class Staged(NamedTuple):
    mode: str           # "dma" | "res"
    flat: jax.Array     # dma: (B*rows_blk, Hp, C); res: (B, rows_blk, Hp, C)
    col_off: np.ndarray
    rows_blk: int


def default_mode(features):
    """Resident when on TPU and the per-image plane fits the VMEM budget."""
    if jax.default_backend() != "tpu":
        return "dma"
    BY, _ = _window_geom(features[0].dtype)
    _, _, rows_blk, Hp = staging_extent([f.shape[1:3] for f in features], BY)
    C = features[0].shape[-1]
    plane = rows_blk * Hp * C * jnp.dtype(features[0].dtype).itemsize
    return "res" if plane <= RESIDENT_MAX_BYTES else "dma"


def stage_pyramid(features, mode: str | None = None):
    """Stack every level of every image TRANSPOSED into ONE buffer with
    rows=(img, level, x), sublanes=y, lanes=c: a window then lands as
    (PATCH_X, BY, C) whose free 2D view ((x, y), C) is directly the rhs of
    the kernel's ONE pooling matmul per sub-window (see module docstring).

    The layout is IMAGE-MAJOR — each image owns one contiguous
    rows_blk = rows_per_img + PATCH_X slice ([level rows | zero tail]) —
    so one image's whole staged pyramid is a single block the resident
    kernel keeps in VMEM; the tail absorbs x-window overreads (zero tap
    weights). ~1.3x padded memory.

    Callers pooling the same pyramid more than once per step (box + cube
    pooler) should stage once and pass the result via `staged=`.
    """
    mode = mode or default_mode(features)
    BY = BY_DMA if mode == "dma" else _window_geom(features[0].dtype)[0]
    col_off, _, rows_blk, Hp = staging_extent([f.shape[1:3] for f in features],
                                              BY)
    C = features[0].shape[-1]
    B = features[0].shape[0]
    cols = []
    for f in features:
        ft = jnp.transpose(f, (0, 2, 1, 3))  # (B, W, H, C)
        ft = jnp.pad(ft, ((0, 0), (0, 0), (0, Hp - ft.shape[2]), (0, 0)))
        cols.append(ft)
    cols.append(jnp.zeros((B, PATCH_X, Hp, C), cols[0].dtype))
    flat = jnp.concatenate(cols, axis=1)  # (B, rows_blk, Hp, C)
    if mode == "dma":
        flat = flat.reshape(B * rows_blk, Hp, C)
    return Staged(mode, flat, col_off, rows_blk)


def multilevel_roi_align_pallas(features, boxes, strides, out_size: int = 7,
                                sampling_ratio: int = 2, min_level: int = 2,
                                interpret: bool | None = None, mode=None):
    """Single-image entry: features list of (H_l, W_l, C); boxes (N, 4)."""
    return multilevel_roi_align_pallas_batched(
        [f[None] for f in features], boxes[None], strides, out_size,
        sampling_ratio, min_level, interpret, mode=mode,
    )[0]


def _expand_pack(wy, wx, BY, P, K, dtype):
    """Pack per-box factors for the in-kernel A build: (n/K, 2*K*P8*P8, 128)
    with lanes [0:BY) holding wy_exp[r, y] = wy[r // P8, y] and lanes
    [BY:BY+PATCH_X) wx_exp[r, x] = wx[r % P8, x].

    Rows are Q-MAJOR per step — all K boxes' q0 rows first, then all q1 —
    so kernels can build the q0 half of A unconditionally and the q1 half
    only when the step actually contains a split box (compact boxes — the
    vast majority — carry an exactly-zero q1 block that is never read)."""
    P8 = -(-P // 8) * 8
    wy8 = jnp.pad(wy, ((0, 0), (0, 0), (0, P8 - P), (0, 0)))
    wx8 = jnp.pad(wx, ((0, 0), (0, 0), (0, P8 - P), (0, 0)))
    wy_exp = jnp.repeat(wy8, P8, axis=2)            # (n, 2, P8*P8, BY)
    wx_exp = jnp.tile(wx8, (1, 1, P8, 1))           # (n, 2, P8*P8, PATCH_X)
    lanes = -(-(BY + PATCH_X) // 128) * 128
    wboth = jnp.concatenate(
        [wy_exp, wx_exp,
         jnp.zeros(wy_exp.shape[:3] + (lanes - BY - PATCH_X,), wy_exp.dtype)],
        -1)
    n = wy.shape[0]
    wboth = wboth.reshape(n // K, K, 2, P8 * P8, lanes)
    wboth = wboth.transpose(0, 2, 1, 3, 4).reshape(n // K, 2 * K * P8 * P8,
                                                   lanes)
    if jnp.dtype(dtype).itemsize <= 2:
        wboth = wboth.astype(dtype)
    return wboth, lanes


def _one_hot_expander(BY, dtype, chunk=None):
    """Stacked one-hot lifts onto the (x, y) lane grid, both via one small
    MXU dot each: rows [0:BY) are ELy[y, lane(x, y)] = 1 (the wy factor is
    tile-repeated across x), rows [BY:BY+PATCH_X) are ELx[x, lane(x, y)] = 1
    (the wx factor broadcasts along y). MXU expansion replaces the previous
    16-way lane concatenate of the wy factor, which cost ~1.5 MB of VPU
    writes per grid step.

    lane(x, y) = x*BY + y by default (matches an (PATCH_X, BY, C) window
    read flattened to ((x, y), C)). With `chunk`=Y0 the lanes are
    CHUNK-PARTITIONED: lanes [0, PATCH_X*Y0) hold the y<Y0 sub-block in
    x*Y0+y order and the rest the y>=Y0 tail in x*(BY-Y0)+(y-Y0) order —
    each block then matches a separate chunked window read, letting the
    resident kernel skip the tail read+matmul for y-compact boxes whose
    tail weight block is exactly zero."""
    XY = PATCH_X * BY

    def lane(x, y):
        if chunk is None:
            return x * BY + y
        if y < chunk:
            return x * chunk + y
        return PATCH_X * chunk + x * (BY - chunk) + (y - chunk)

    el = np.zeros((BY + PATCH_X, XY), np.float32)
    for x in range(PATCH_X):
        for y in range(BY):
            el[y, lane(x, y)] = 1.0
            el[BY + x, lane(x, y)] = 1.0
    return jnp.asarray(el, dtype)


def _build_A_rows(w_rows, el_ref, BY, XY, dtype, prec):
    """A rows (R, XY) from packed factors: A[r, x*BY+y] = wy[r, y]*wx[r, x].

    Both factors are lifted by one-hot dots (exact selection — accumulation
    in f32 touches single products only), so the build is two MXU passes
    plus one elementwise multiply; no lane concatenates."""
    t1 = lax.dot_general(
        w_rows[:, :BY], el_ref[:BY], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(dtype)                                 # [x*BY+y] = wy[y]
    wxl = lax.dot_general(
        w_rows[:, BY:BY + PATCH_X], el_ref[BY:BY + PATCH_X],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(dtype)                                 # [x*BY+y] = wx[x]
    return t1 * wxl


def multilevel_roi_align_pallas_batched(features, boxes, strides,
                                        out_size: int = 7,
                                        sampling_ratio: int = 2,
                                        min_level: int = 2,
                                        interpret: bool | None = None,
                                        out_dtype=None,
                                        staged: Staged | None = None,
                                        boxes_per_step: int | None = None,
                                        mode: str | None = None,
                                        exact_routing: bool = False):
    """Batched pallas ROIAlign over an FPN pyramid.

    NOTE: do NOT jax.vmap the single-image version — the kernels drive their
    own sequential grid and pipeline, so batching is handled natively here
    via a per-box image index. features: list of (B, H_l, W_l, C); boxes
    (B, N, 4). Returns (B, N, out_size, out_size, C) in `out_dtype`
    (default float32; pass the feature dtype to halve the output-store
    traffic when the consumer casts anyway). `staged` takes a previous
    `stage_pyramid(features)` result to share the staging between calls;
    its mode selects the kernel (see module docstring), overriding `mode`.
    """
    on_tpu = jax.default_backend() == "tpu"
    auto = interpret is None
    if auto:
        interpret = not on_tpu
    B, N = boxes.shape[:2]
    C = features[0].shape[-1]
    if (exact_routing or (auto and not on_tpu) or (not interpret and C % 128)
            or jnp.dtype(features[0].dtype).itemsize < 2):
        # `exact_routing` (cfg TPU.POOLER_EXACT_ROUTING) forces the oracle:
        # canonical detectron2 level assignment with no level-bump routing
        # deviation (PARITY.md #2) — slower, for parity runs.
        # Fallbacks to the XLA-gather oracle: (a) auto-dispatch off-TPU —
        # interpret-mode pallas re-runs the grid in Python and is orders of
        # magnitude slower than the compiled oracle (tests opt back in with
        # interpret=True); (b) Mosaic rejects lane dims off the 128 grid;
        # production FPN width is 256, so odd widths only appear in ad-hoc
        # use — route them to the oracle rather than fail hardware compile;
        # (c) 1-byte dtypes need 32-row sublane tiles the window geometries
        # don't satisfy (_window_geom).
        from .roi_align import multilevel_roi_align

        out = jax.vmap(
            lambda fl, bx: multilevel_roi_align(
                list(fl), bx, list(strides), out_size, sampling_ratio,
                min_level)
        )(list(features), boxes)
        return out.astype(out_dtype or jnp.float32)

    if staged is None:
        staged = stage_pyramid(features, mode)
    if staged.mode == "res":
        return _pool_resident(features, boxes, strides, out_size,
                              sampling_ratio, min_level, interpret, out_dtype,
                              staged, boxes_per_step)
    return _pool_dma(features, boxes, strides, out_size, sampling_ratio,
                     min_level, interpret, out_dtype, staged, boxes_per_step)


def _pool_dma(features, boxes, strides, out_size, sampling_ratio, min_level,
              interpret, out_dtype, staged, boxes_per_step):
    """Patch-DMA kernel: per-window HBM->VMEM async copies, double-buffered
    across a 1D sequential grid; compute hides under the DMA (HBM-bound)."""
    B, N = boxes.shape[:2]
    C = features[0].shape[-1]
    P, S = out_size, sampling_ratio
    BY = BY_DMA
    level_shapes = [f.shape[1:3] for f in features]

    lvl, oy, ox, wy, wx = jax.vmap(
        lambda bx: _plan(bx, strides, level_shapes, P, S, min_level, BY, 8)
    )(boxes)
    img = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, N))

    # flatten batch into one box list
    NB = B * N
    img = img.reshape(NB)
    lvl = lvl.reshape(NB)
    oy, ox = oy.reshape(NB, 2), ox.reshape(NB, 2)
    wy = wy.reshape(NB, 2, P, BY)   # sample-reduced in _plan
    wx = wx.reshape(NB, 2, P, PATCH_X)
    N = NB

    flat, col_off, rows_blk = staged.flat, staged.col_off, staged.rows_blk
    dtype = flat.dtype
    Hp = flat.shape[1]

    # per-box absolute outer (x) origin: img block + level column offset
    # (image-major staging). _plan's oy is 8-aligned (sublane dim in this
    # layout) and ox is slack-free (outer dim, free offsets).
    ox = (ox + img[:, None] * rows_blk + jnp.asarray(col_off)[lvl][:, None])
    # pack (x-row, y-sublane) into one int32 per (box, q): outer rows in bits
    # [0,18), y in [18,31). One scalar read replaces two, and sub-window
    # equality (the q1 test) becomes word equality.
    assert rows_blk * B < (1 << 18), rows_blk * B
    assert Hp <= (1 << 13), Hp
    pk = (ox + (oy << 18)).reshape(-1)

    # K boxes per grid step to amortize per-step control overhead; bounded by
    # VMEM (patch scratch = 2 slots * 2 sub-windows * K * PATCH_X*BY*C)
    K = boxes_per_step or (4 if jnp.dtype(dtype).itemsize <= 2 else 2)
    pad_n = (-N) % K
    if pad_n:
        pk = jnp.pad(pk, (0, 2 * pad_n))
        wy = jnp.pad(wy, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
    Np = N + pad_n
    n_steps = Np // K

    P8 = -(-P // 8) * 8  # output rows r = py*P8 + px, one sublane tile per py
    wboth, lanes = _expand_pack(wy, wx, BY, P, K, dtype)
    XY = PATCH_X * BY
    EL = _one_hot_expander(BY, dtype)

    def kernel(*args):
        pk_ref = args[0]
        flat_ref = args[1]
        w_ref, el_ref, out_ref, patch_buf, a1_buf, sem_q0, sem_q1 = args[2:]
        i = pl.program_id(0)
        num = pl.num_programs(0)
        prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)

        def unpack(w):
            xx = w & ((1 << 18) - 1)          # outer (x) row, free offset
            yy = pl.multiple_of(w >> 18, 8)   # y sublane offset, 8-aligned
            return xx, yy

        def start_dma(step, slot):
            for k in range(K):
                box = step * K + k
                w0 = pk_ref[2 * box]
                w1 = pk_ref[2 * box + 1]

                xx, yy = unpack(w0)
                # all K q0 copies share one byte-counting semaphore; the
                # compute side waits once for all of them
                pltpu.make_async_copy(
                    flat_ref.at[pl.ds(xx, PATCH_X), pl.ds(yy, BY), :],
                    patch_buf.at[slot, 0, k], sem_q0.at[slot]
                ).start()

                # compact boxes skip the split sub-window (its A block is
                # zero; the scratch holds finite values)
                @pl.when(w0 != w1)
                def _():
                    xx1, yy1 = unpack(w1)
                    pltpu.make_async_copy(
                        flat_ref.at[pl.ds(xx1, PATCH_X), pl.ds(yy1, BY), :],
                        patch_buf.at[slot, 1, k],
                        sem_q1.at[slot, k],
                    ).start()

        @pl.when(i == 0)
        def _():
            # zero both slots once: skipped q1 DMAs leave their patch slot
            # untouched, and 0-weight x finite stale data is 0, but
            # uninitialized VMEM can hold NaN/Inf bit patterns (0*NaN=NaN)
            patch_buf[...] = jnp.zeros_like(patch_buf)
            start_dma(0, 0)

        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < num)
        def _():
            start_dma(i + 1, next_slot)

        q1_here = [pk_ref[2 * (i * K + k)] != pk_ref[2 * (i * K + k) + 1]
                   for k in range(K)]

        # one merged wait for the K q0 patches (the wait amount is the byte
        # size of the ref, so a (K, ...)-shaped wait object consumes all K
        # completions on the shared semaphore)
        pltpu.make_async_copy(
            patch_buf.at[slot, 0], patch_buf.at[slot, 0], sem_q0.at[slot]
        ).wait()
        for k in range(K):
            @pl.when(q1_here[k])
            def _():
                pltpu.make_async_copy(
                    flat_ref.at[pl.ds(0, PATCH_X), pl.ds(0, BY), :],
                    patch_buf.at[slot, 1, k],
                    sem_q1.at[slot, k],
                ).wait()

        # q0 half of A always; q1 half only when this step has a split box
        RK = K * P8 * P8
        A0 = _build_A_rows(w_ref[0, :RK], el_ref, BY, XY, dtype, prec
                           ).reshape(K, P8 * P8, XY)
        any_q1 = functools.reduce(jnp.logical_or, q1_here)

        @pl.when(any_q1)
        def _():
            a1_buf[...] = _build_A_rows(w_ref[0, RK:], el_ref, BY, XY, dtype,
                                        prec).reshape(K, P8 * P8, XY)

        # ONE clean 2D matmul per (box, sub-window): the window's free
        # ((x, y), C) view is the rhs, A the lhs; compact boxes skip the
        # q1 matmul (their A1 block is exactly zero and never built)
        for k in range(K):
            pq0 = patch_buf[slot, 0, k].reshape(XY, C)
            acc = jax.lax.dot_general(
                A0[k], pq0, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

            def with_q1(acc=acc, k=k):
                pq1 = patch_buf[slot, 1, k].reshape(XY, C)
                return acc + jax.lax.dot_general(
                    a1_buf[k], pq1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )

            acc = jax.lax.cond(q1_here[k], with_q1, lambda acc=acc, k=k: acc)
            r = acc.reshape(P8, P8, C)  # rows r=(py, px): free sublane split
            out_ref[k] = r[:P, :P, :].astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, K * 2 * P8 * P8, lanes), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BY + PATCH_X, XY), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, P, P, C), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, K, PATCH_X, BY, C), dtype),
            pltpu.VMEM((K, P8 * P8, XY), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, K)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, P, P, C), out_dtype or jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(pk, flat, wboth, EL)
    return out[:N].reshape(B, N // B, P, P, C)


def _pool_resident(features, boxes, strides, out_size, sampling_ratio,
                   min_level, interpret, out_dtype, staged, boxes_per_step):
    """Plane-resident kernel: grid (image, box-step); the whole staged
    per-image pyramid block is pipeline-revisited in VMEM across the image's
    box steps, so sub-windows are VMEM reads at align-rounded sublane
    offsets — no per-box HBM traffic at all. Compact boxes (the vast
    majority under the BY-row window) skip the q1 matmul entirely.
    (Measured dead ends, kept out: async VMEM->VMEM window prefetch into a
    double-buffered patch scratch ran 11% SLOWER than the synchronous
    dynamic-slice read — local-DMA issue/wait overhead exceeds the relayout
    it hides; jnp.repeat / broadcast-reshape builds of the wx lane
    expansion fail to lower in Mosaic, so the one-hot EL matmul stays.)"""
    B, N = boxes.shape[:2]
    C = features[0].shape[-1]
    P, S = out_size, sampling_ratio
    level_shapes = [f.shape[1:3] for f in features]
    plane = staged.flat                      # (B, rows_blk, Hp, C)
    dtype = plane.dtype
    rows_blk = staged.rows_blk
    Hp = plane.shape[2]
    BY, align = _window_geom(dtype)

    lvl, oy, ox, wy, wx = jax.vmap(
        lambda bx: _plan(bx, strides, level_shapes, P, S, min_level, BY, align)
    )(boxes)

    NB = B * N
    lvl = lvl.reshape(NB)
    oy, ox = oy.reshape(NB, 2), ox.reshape(NB, 2)
    wy = wy.reshape(NB, 2, P, BY)
    wx = wx.reshape(NB, 2, P, PATCH_X)

    # y-chunk tail flags: windows are read as a CHUNK_Y-row base + a
    # conditional (BY-CHUNK_Y)-row tail per sub-window. The tail flag is 1
    # exactly when that sub-window's tail weight block (local y >= CHUNK_Y)
    # is nonzero, so skipping the tail read+matmul is exact — the same
    # zero-block argument as the q1 skip. Saves 1/3 of the copied VMEM
    # bytes and MXU work for y-compact boxes (tap rows fit the base chunk
    # after align rounding — the majority of post-NMS RoIs).
    tails = (jnp.abs(wy[:, :, :, CHUNK_Y:]).sum(axis=(2, 3)) > 0
             ).astype(jnp.int32)                  # (NB, 2)

    # plane-LOCAL outer (x) row origin: level column offset only
    xx = ox + jnp.asarray(staged.col_off)[lvl][:, None]
    assert rows_blk < (1 << 15) and Hp <= (1 << 13)
    # BOTH tail bits ride in BOTH words (bits 15/16) so that the q1-skip
    # word-equality test still holds for geometrically-coincident
    # sub-windows (a compact box's q0 may need a tail while its zero-weight
    # q1 does not — per-q bits would make the words differ spuriously)
    tbits = (tails[:, 0] << 15) + (tails[:, 1] << 16)
    pk = (xx + tbits[:, None] + (oy << 17)).reshape(-1)

    K = boxes_per_step or 4
    pad_n = (-N) % K
    Np = N + pad_n
    if pad_n:  # pad per image so each grid step stays within one image
        def padN(t):
            t = t.reshape(B, N, *t.shape[1:])
            pw = [(0, 0), (0, pad_n)] + [(0, 0)] * (t.ndim - 2)
            return jnp.pad(t, pw)
        pk = padN(pk.reshape(NB, 2)).reshape(-1)
        wy = padN(wy).reshape(B * Np, 2, P, BY)
        wx = padN(wx).reshape(B * Np, 2, P, PATCH_X)
    steps = Np // K

    P8 = -(-P // 8) * 8
    wboth, lanes = _expand_pack(wy, wx, BY, P, K, dtype)
    wboth = wboth.reshape(B, steps, K * 2 * P8 * P8, lanes)
    XY = PATCH_X * BY
    XY0 = PATCH_X * CHUNK_Y          # base-chunk lanes (chunk-partitioned EL)
    TY = BY - CHUNK_Y                # tail rows
    EL = _one_hot_expander(BY, dtype, chunk=CHUNK_Y)
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def kernel(pk_ref, plane_ref, w_ref, el_ref, out_ref, acc_ref, a1_buf):
        b = pl.program_id(0)
        s = pl.program_id(1)

        RK = K * P8 * P8
        base0 = 2 * (b * steps + s) * K
        q1_here = [pk_ref[base0 + 2 * k] != pk_ref[base0 + 2 * k + 1]
                   for k in range(K)]

        # q0 half of A always; q1 half only when this step has a split box
        A0 = _build_A_rows(w_ref[0, 0, :RK], el_ref, BY, XY, dtype, prec
                           ).reshape(K, P8 * P8, XY)
        any_q1 = functools.reduce(jnp.logical_or, q1_here)

        @pl.when(any_q1)
        def _():
            a1_buf[...] = _build_A_rows(w_ref[0, 0, RK:], el_ref, BY, XY,
                                        dtype, prec).reshape(K, P8 * P8, XY)

        for k in range(K):
            w0 = pk_ref[base0 + 2 * k]
            w1 = pk_ref[base0 + 2 * k + 1]
            # per-q tail flags: q0 reads bit 15, q1 bit 16 (both bits ride
            # in both words; see the packing comment above)
            t0 = ((w0 >> 15) & 1) == 1
            t1 = ((w1 >> 16) & 1) == 1

            def base(word):
                xc = word & ((1 << 15) - 1)
                row = pl.multiple_of(word >> 17, align)
                return plane_ref[
                    pl.ds(xc, PATCH_X), pl.ds(row, CHUNK_Y), :
                ].reshape(XY0, C)

            def tail(word):
                xc = word & ((1 << 15) - 1)
                row = pl.multiple_of((word >> 17) + CHUNK_Y, align)
                return plane_ref[
                    pl.ds(xc, PATCH_X), pl.ds(row, TY), :
                ].reshape(XY - XY0, C)

            def dot(A, win):
                return lax.dot_general(
                    A, win, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )

            # y-chunked reads: base chunk always; tail chunk only when its
            # weight block is nonzero (y-compact boxes — in the REAL
            # post-NMS distribution 100% of proposals, tools/bench_pooler
            # extent histogram r5 — skip 1/3 of the window copy and
            # matmul). A lax.cond value-carried accumulator (registers, no
            # scratch round-trips) measured 0.5 ms SLOWER at 32x1000 than
            # this pl.when/scratch form — kept out.
            acc_ref[k] = dot(A0[k][:, :XY0], base(w0))

            @pl.when(t0)
            def _():
                acc_ref[k] = acc_ref[k] + dot(A0[k][:, XY0:], tail(w0))

            # compact boxes carry a zero q1 weight block — skip its matmul
            @pl.when(q1_here[k])
            def _():
                acc_ref[k] = acc_ref[k] + dot(a1_buf[k][:, :XY0], base(w1))

            @pl.when(q1_here[k] & t1)
            def _():
                acc_ref[k] = acc_ref[k] + dot(a1_buf[k][:, XY0:], tail(w1))

            r = acc_ref[k].reshape(P8, P8, C)
            out_ref[0, 0, k] = r[:P, :P, :].astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, steps),
        in_specs=[
            # one image's whole staged plane, revisited across its box steps
            pl.BlockSpec((rows_blk, Hp, C), lambda b, s, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K * 2 * P8 * P8, lanes),
                         lambda b, s, *_: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BY + PATCH_X, XY), lambda b, s, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, K, P, P, C),
                               lambda b, s, *_: (b, s, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, P8 * P8, C), jnp.float32),
                        pltpu.VMEM((K, P8 * P8, XY), dtype)],
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, steps, K, P, P, C),
                                       out_dtype or jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(pk, plane.reshape(B * rows_blk, Hp, C), wboth, EL)
    return out.reshape(B, Np, P, P, C)[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def multilevel_roi_align_fast(features, boxes, strides, out_size=7,
                              sampling_ratio=2, min_level=2):
    """Differentiable pooler: pallas kernel forward, pallas transpose
    backward (XLA scatter off-TPU).

    RoI pooling is linear in the features, so the backward applies the
    transposed plan; `strides` must be a tuple (static).
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
