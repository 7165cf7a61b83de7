"""ROIAlign (V2 / `aligned=True`) for TPU.

TPU-native replacement for the detectron2/torchvision ROIAlignV2 CUDA kernel
(reference binding: cubercnn/config/config.py:45 POOLER_TYPE='ROIAlignV2',
roi_heads.py:166-171 cube_pooler and the StandardROIHeads box_pooler;
SURVEY §2.3 N1).

Semantics match torchvision's `roi_align(..., aligned=True)`:
  * box coords scaled by `spatial_scale`, then shifted by -0.5 (pixel-center
    alignment),
  * each of the `out_size x out_size` bins is sampled on an `S x S` sub-grid,
  * samples are bilinear with zero outside [-1, H] and edge-clamped inside,
  * bin value = mean of its samples.

`sampling_ratio=0` reproduces torchvision's adaptive grid — ceil(roi/bin)
samples per bin-axis *per box* — under static shapes: the sample grid is
materialized at the static bound `ADAPTIVE_SMAX` with the trailing samples
past a box's own count carrying zero weight, so the pooled value equals
torchvision's exactly whenever the per-axis count fits the bound (always
true for FPN-routed boxes; see `_sample_grid_1d`). A fixed S > 0 is also
supported. Differentiable (pure gather+arith, so JAX autodiff gives the
exact VJP for free).

Implementation notes: the sample grid of a bin is separable in y/x, so the
(N, P, P, S, S) sample field reduces to per-box y-coords (N, P*S) and x-coords
(N, P*S). We gather the 4 bilinear taps from a flattened (H*W, C) view with
fused weights; boxes are processed in chunks via `lax.map` to bound the
materialized gather to chunk*P*S*P*S*4*C elements.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


# static bound on the adaptive samples-per-bin-axis. The pallas pooler's
# level routing caps a box's extent at 2*PATCH-2 = 62 cells, so the adaptive
# count ceil(extent/7) never exceeds 9 for any box it pools.
ADAPTIVE_SMAX = 9


def _num_samples(sampling_ratio: int, smax: int = ADAPTIVE_SMAX) -> int:
    """Static samples-per-bin-axis of the materialized grid."""
    return sampling_ratio if sampling_ratio > 0 else smax


def _sample_grid_1d(lo, size, out_size: int, sampling_ratio: int,
                    smax: int = ADAPTIVE_SMAX):
    """Sample positions + per-sample weights along one axis of one box.

    lo: scalar roi start; size: scalar roi extent (feature cells).
    sampling_ratio > 0: S fixed samples/bin at weight 1/S (static grid).
    sampling_ratio == 0: torchvision's adaptive grid — g = ceil(size/out_size)
      samples/bin — materialized at the static bound `smax`: samples past g
      duplicate the last valid position with zero weight, so the weighted sum
      equals torchvision's mean exactly whenever g <= smax (g is clamped to
      smax beyond, degrading to a static smax grid).

    Returns (pos, w), both (out_size * _num_samples(sampling_ratio),);
    bin value = sum_i w_i * bilinear(pos_i), and the y/x axis weights
    multiply so the 1/(gh*gw) count division is separable.
    """
    bin_sz = size / out_size
    ph = jnp.arange(out_size, dtype=lo.dtype)
    if sampling_ratio > 0:
        S = sampling_ratio
        iy = jnp.arange(S, dtype=lo.dtype)
        pos = lo + ph[:, None] * bin_sz + (iy[None, :] + 0.5) * (bin_sz / S)
        w = jnp.full((out_size * S,), 1.0 / S, lo.dtype)
        return pos.reshape(-1), w
    g = jnp.ceil(size / out_size).astype(jnp.int32)
    gc = jnp.clip(g, 1, smax).astype(lo.dtype)
    iy = jnp.minimum(jnp.arange(smax, dtype=lo.dtype), gc - 1.0)
    pos = lo + ph[:, None] * bin_sz + (iy[None, :] + 0.5) * (bin_sz / gc)
    w = jnp.where(jnp.arange(smax) < g, 1.0 / gc, 0.0).astype(lo.dtype)
    w = jnp.broadcast_to(w[None, :], (out_size, smax))
    return pos.reshape(-1), w.reshape(-1)


def _bilinear_1d(pos, limit: int):
    """1-D bilinear tap indices + weights with torchvision boundary rules.

    Returns (idx_lo, idx_hi, w_lo, w_hi, inside) where `inside` is 0 for
    positions outside [-1, limit].
    """
    inside = (pos >= -1.0) & (pos <= limit)
    p = jnp.clip(pos, 0.0, None)
    lo = jnp.floor(p).astype(jnp.int32)
    at_edge = lo >= limit - 1
    lo = jnp.where(at_edge, limit - 1, lo)
    hi = jnp.where(at_edge, limit - 1, lo + 1)
    frac = jnp.where(at_edge, 0.0, p - lo.astype(p.dtype))
    return lo, hi, 1.0 - frac, frac, inside.astype(p.dtype)


def roi_align(features: jnp.ndarray, boxes: jnp.ndarray, out_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              chunk: int = 128) -> jnp.ndarray:
    """ROIAlign over a single feature map.

    Args:
      features: (H, W, C).
      boxes: (N, 4) XYXY in input-image coordinates.
      out_size: pooled resolution P.
      spatial_scale: feature stride reciprocal.
      sampling_ratio: samples-per-bin axis S; 0 = torchvision adaptive.
      chunk: boxes per lax.map step (bounds peak memory).

    Returns: (N, P, P, C).
    """
    H, W, C = features.shape
    N = boxes.shape[0]
    P, S = out_size, _num_samples(sampling_ratio)
    flat = features.reshape(H * W, C)

    def one_chunk(boxes_c):
        b = boxes_c * spatial_scale - 0.5  # aligned=True
        x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        ys, wys = jax.vmap(
            lambda lo, sz: _sample_grid_1d(lo, sz, P, sampling_ratio))(y1, y2 - y1)
        xs, wxs = jax.vmap(
            lambda lo, sz: _sample_grid_1d(lo, sz, P, sampling_ratio))(x1, x2 - x1)
        ylo, yhi, wy0, wy1, yin = _bilinear_1d(ys, H)  # (n, P*S)
        xlo, xhi, wx0, wx1, xin = _bilinear_1d(xs, W)

        def tap(yi, xi, wgt_y, wgt_x):
            idx = yi[:, :, None] * W + xi[:, None, :]          # (n, PS, PS)
            vals = flat[idx.reshape(-1)].reshape(idx.shape + (C,))
            w = (wgt_y[:, :, None] * wgt_x[:, None, :])[..., None]
            return vals * w

        acc = (
            tap(ylo, xlo, wy0, wx0)
            + tap(ylo, xhi, wy0, wx1)
            + tap(yhi, xlo, wy1, wx0)
            + tap(yhi, xhi, wy1, wx1)
        )
        # per-sample weights carry the 1/count normalization (and the
        # adaptive tail mask); the inside mask rides along
        acc = acc * ((yin * wys)[:, :, None] * (xin * wxs)[:, None, :])[..., None]
        acc = acc.reshape(-1, P, S, P, S, C).sum(axis=(2, 4))
        return acc

    if N <= chunk:
        return one_chunk(boxes)
    pad = (-N) % chunk
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))
    out = lax.map(one_chunk, boxes_p.reshape(-1, chunk, 4))
    return out.reshape(-1, P, P, features.shape[-1])[:N]


def assign_fpn_levels(boxes: jnp.ndarray, min_level: int = 2, max_level: int = 6,
                      canonical_size: float = 224.0, canonical_level: int = 4):
    """FPN level per box (detectron2 assign_boxes_to_levels):
    floor(canonical_level + log2(sqrt(area)/canonical_size + 1e-8)),
    clamped to [min_level, max_level]. Returns int32 (N,)."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lvl = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(area) / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(features: list, boxes: jnp.ndarray, strides: list,
                         out_size: int = 7, sampling_ratio: int = 2,
                         min_level: int = 2, chunk: int = 128) -> jnp.ndarray:
    """ROIAlign over an FPN pyramid with per-box level assignment.

    The pyramid is flattened to one (sum H_l*W_l, C) buffer; each box gathers
    from its assigned level through a single unified index space, so the whole
    pooler is one static gather program (no dynamic partitioning, reference
    ROIPooler semantics without the per-level scatter/gather round trip).

    Args:
      features: list of (H_l, W_l, C) maps, ordered min_level..max_level.
      boxes: (N, 4) XYXY image coords.
      strides: list of int strides matching `features`.
    Returns: (N, P, P, C).
    """
    C = features[0].shape[-1]
    P, S = out_size, _num_samples(sampling_ratio)
    n_levels = len(features)
    levels = assign_fpn_levels(boxes, min_level, min_level + n_levels - 1)
    lvl_idx = levels - min_level

    shapes = [f.shape for f in features]
    offsets, off = [], 0
    for (h, w, _) in shapes:
        offsets.append(off)
        off += h * w
    flat = jnp.concatenate([f.reshape(-1, C) for f in features], axis=0)
    offsets = jnp.asarray(offsets, jnp.int32)
    Hs = jnp.asarray([s[0] for s in shapes], jnp.int32)
    Ws = jnp.asarray([s[1] for s in shapes], jnp.int32)
    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)

    N = boxes.shape[0]

    def one_chunk(args):
        boxes_c, lvl_c = args
        scale = scales[lvl_c]                      # (n,)
        Hc, Wc = Hs[lvl_c], Ws[lvl_c]
        base = offsets[lvl_c]
        b = boxes_c * scale[:, None] - 0.5
        x1, y1 = b[:, 0], b[:, 1]
        ys, wys = jax.vmap(
            lambda lo, sz: _sample_grid_1d(lo, sz, P, sampling_ratio))(y1, b[:, 3] - y1)
        xs, wxs = jax.vmap(
            lambda lo, sz: _sample_grid_1d(lo, sz, P, sampling_ratio))(x1, b[:, 2] - x1)

        def bilinear_dyn(pos, limit):
            lim = limit[:, None].astype(pos.dtype)
            inside = (pos >= -1.0) & (pos <= lim)
            p = jnp.clip(pos, 0.0, None)
            lo = jnp.floor(p).astype(jnp.int32)
            at_edge = lo >= limit[:, None] - 1
            lo = jnp.where(at_edge, limit[:, None] - 1, lo)
            hi = jnp.where(at_edge, lo, lo + 1)
            frac = jnp.where(at_edge, 0.0, p - lo.astype(p.dtype))
            return lo, hi, 1.0 - frac, frac, inside.astype(p.dtype)

        ylo, yhi, wy0, wy1, yin = bilinear_dyn(ys, Hc)
        xlo, xhi, wx0, wx1, xin = bilinear_dyn(xs, Wc)

        def tap(yi, xi, wgt_y, wgt_x):
            idx = base[:, None, None] + yi[:, :, None] * Wc[:, None, None] + xi[:, None, :]
            vals = flat[idx.reshape(-1)].reshape(idx.shape + (C,))
            w = (wgt_y[:, :, None] * wgt_x[:, None, :])[..., None]
            return vals * w

        acc = (
            tap(ylo, xlo, wy0, wx0)
            + tap(ylo, xhi, wy0, wx1)
            + tap(yhi, xlo, wy1, wx0)
            + tap(yhi, xhi, wy1, wx1)
        )
        acc = acc * ((yin * wys)[:, :, None] * (xin * wxs)[:, None, :])[..., None]
        return acc.reshape(-1, P, S, P, S, C).sum(axis=(2, 4))

    if N <= chunk:
        return one_chunk((boxes, lvl_idx))
    pad = (-N) % chunk
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))
    lvl_p = jnp.pad(lvl_idx, (0, pad))
    out = lax.map(one_chunk, (boxes_p.reshape(-1, chunk, 4), lvl_p.reshape(-1, chunk)))
    return out.reshape(-1, P, P, C)[:N]
