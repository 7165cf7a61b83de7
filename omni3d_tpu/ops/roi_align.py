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

One deliberate deviation: torchvision's `sampling_ratio=0` chooses
ceil(roi/bin) samples *per box* (data-dependent shapes). TPUs need static
shapes, so we use a fixed S (default 2, the adaptive value for the canonical
RoI scale under FPN level assignment). Differentiable (pure gather+arith, so
JAX autodiff gives the exact VJP for free).

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


def _sample_coords_1d(lo, size, out_size: int, sampling_ratio: int):
    """Sample coordinates along one axis for one box.

    lo: scalar roi start; size: scalar roi extent. Returns (out_size*S,)
    positions: y = lo + ph*bin + (iy+0.5)*bin/S.
    """
    bin_sz = size / out_size
    ph = jnp.arange(out_size, dtype=lo.dtype)
    iy = jnp.arange(sampling_ratio, dtype=lo.dtype)
    pos = lo + ph[:, None] * bin_sz + (iy[None, :] + 0.5) * (bin_sz / sampling_ratio)
    return pos.reshape(-1)


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
      sampling_ratio: static samples-per-bin axis S.
      chunk: boxes per lax.map step (bounds peak memory).

    Returns: (N, P, P, C).
    """
    H, W, C = features.shape
    N = boxes.shape[0]
    P, S = out_size, sampling_ratio
    flat = features.reshape(H * W, C)

    def one_chunk(boxes_c):
        b = boxes_c * spatial_scale - 0.5  # aligned=True
        x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        ys = jax.vmap(lambda lo, sz: _sample_coords_1d(lo, sz, P, S))(y1, y2 - y1)
        xs = jax.vmap(lambda lo, sz: _sample_coords_1d(lo, sz, P, S))(x1, x2 - x1)
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
        acc = acc * (yin[:, :, None] * xin[:, None, :])[..., None]
        # (n, P, S, P, S, C) -> mean over the S x S sub-grid
        acc = acc.reshape(-1, P, S, P, S, C).mean(axis=(2, 4))
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
    P, S = out_size, sampling_ratio
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
        ys = jax.vmap(lambda lo, sz: _sample_coords_1d(lo, sz, P, S))(y1, b[:, 3] - y1)
        xs = jax.vmap(lambda lo, sz: _sample_coords_1d(lo, sz, P, S))(x1, b[:, 2] - x1)

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
        acc = acc * (yin[:, :, None] * xin[:, None, :])[..., None]
        return acc.reshape(-1, P, S, P, S, C).mean(axis=(2, 4))

    if N <= chunk:
        return one_chunk((boxes, lvl_idx))
    pad = (-N) % chunk
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))
    lvl_p = jnp.pad(lvl_idx, (0, pad))
    out = lax.map(one_chunk, (boxes_p.reshape(-1, chunk, 4), lvl_p.reshape(-1, chunk)))
    return out.reshape(-1, P, P, C)[:N]
