"""Pallas TPU kernel for the multi-level ROIAlign backward (feature grads).

The XLA autodiff transpose of the gather-based pooler is a row scatter-add —
~6M near-serial updates for one training step, measured at 58% of the whole
step (91 of 158 ms at bs=8/512px). A window-scatter variant (one
lax.scatter_add of (PATCH, PATCH*C) windows) is even slower: XLA serializes
overlapping-window RMW. This kernel accumulates instead in VMEM:

  grid (image, C-chunk, box-step); the out block — one image's staged
  (rows, Wmax, Cc) gradient plane — is revisited across all box steps, so
  the pallas pipeline keeps it resident in VMEM and flushes it to HBM when
  the (image, chunk) index changes. Per box the transposed separable
  interpolation is two small MXU contractions

      dY = Wx^T-contraction of G   (40x, P, Cc)
      dP = Wy^T-contraction of dY  (40r, 40x, Cc)

  followed by a read-modify-write of the (40, 40, Cc) window at the box's
  origin. The sequential grid makes overlapping-window RMW race-free by
  construction — the thing neither XLA scatter path can exploit.

Window origins are 8-aligned on BOTH axes here (rows and x-cells are sublane
/ major dims of the accumulator), leaving <= 7 cells of slack per axis, so
the backward windows are 40x40 cells; y windows clamp to the image's staged
rows. Rows/x beyond a box's taps carry zero weights, so window overhang into
a neighboring level block adds exact zeros (validated against autodiff of
the XLA pooler). Coverage asymmetry: these 40-cell windows are a superset
of the forward kernel's 32-cell windows, so for the rare extremely
elongated boxes whose outermost taps the pallas FORWARD drops (see
roi_align_pallas.py's documented deviation) this VJP still includes those
taps — it is the exact transpose of the XLA-oracle forward, not of the
pallas forward's truncation.

Gradient accumulation is float32 at full channel width — the accumulator
block is ~32 MB at 512px/C=256, within VMEM once the compiler's default
16 MB scoped limit is raised via vmem_limit_bytes (v5e VMEM is 128 MB).

Reference: torchvision ROIAlign backward (CUDA atomicAdd splatting), bound
at cubercnn/modeling/roi_heads/roi_heads.py:166-171 via the poolers
(SURVEY §2.3 N1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _sample_coords_1d, assign_fpn_levels
from .roi_align_pallas import PATCH, _axis_weights, _last_tap

PATCH_B = 40  # backward window (y and x): 8-aligned origins, <=7 slack


def _plan_bwd(boxes, strides, level_shapes, out_size, sampling_ratio,
              min_level, Wmax8, row_off, rows_per_img):
    """Backward per-box plan: level, 8-aligned y/x origins, weights.

    Level routing (incl. the elongated-box coverage bump) matches the
    forward plan in roi_align_pallas._plan — the backward must transpose the
    same linear map.
    """
    n_levels = len(strides)
    lvl = assign_fpn_levels(boxes, min_level, min_level + n_levels - 1) - min_level
    max_side = jnp.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1])
    fit_lvl = jnp.ceil(
        jnp.log2(jnp.maximum(max_side, 1.0) / (strides[0] * (2.0 * PATCH - 2.0)))
    ).astype(jnp.int32)
    lvl = jnp.clip(jnp.maximum(lvl, fit_lvl), 0, n_levels - 1)
    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)[lvl]
    Hs = jnp.asarray([s[0] for s in level_shapes], jnp.float32)[lvl]
    Ws = jnp.asarray([s[1] for s in level_shapes], jnp.float32)[lvl]

    b = boxes * scales[:, None] - 0.5
    P, S = out_size, sampling_ratio
    ys = jax.vmap(lambda lo, sz: _sample_coords_1d(lo, sz, P, S))(
        b[:, 1], b[:, 3] - b[:, 1])
    xs = jax.vmap(lambda lo, sz: _sample_coords_1d(lo, sz, P, S))(
        b[:, 0], b[:, 2] - b[:, 0])
    split_x = (b[:, 2] - b[:, 0]) >= (b[:, 3] - b[:, 1])

    def origins8(pos, limit, split, lo_clip, hi_clip):
        t0 = jnp.clip(jnp.floor(jnp.clip(pos[:, 0], 0.0, None)).astype(jnp.int32),
                      0, jnp.maximum(limit.astype(jnp.int32) - 1, 0))
        o0 = jnp.clip(t0 - t0 % 8, lo_clip, hi_clip)
        overflow = _last_tap(pos, limit) >= o0 + PATCH_B
        o1 = jnp.where(split & overflow,
                       jnp.clip(o0 + PATCH_B, lo_clip, hi_clip), o0)
        return jnp.stack([o0, o1], axis=1)

    # y origins are clamped in ABSOLUTE staged rows so windows stay inside
    # the accumulator; the (possibly negative) level-local value feeds the
    # weight builder so weights and memory agree. x windows clamp to the
    # staging width. All clamp bounds are multiples of 8.
    base = row_off[lvl]
    oy_abs = (origins8(ys, Hs, ~split_x, -base,
                       rows_per_img - PATCH_B - base)
              + base[:, None])
    oy_loc = oy_abs - base[:, None]
    zeros = jnp.zeros_like(lvl)
    ox = origins8(xs, Ws, split_x, zeros, jnp.full_like(lvl, Wmax8 - PATCH_B))

    wy = jax.vmap(_axis_weights, in_axes=(0, 0, 0, None))(ys, Hs, oy_loc, PATCH_B)
    wx = jax.vmap(_axis_weights, in_axes=(0, 0, 0, None))(xs, Ws, ox, PATCH_B)
    wy_full = wy.sum(axis=1, keepdims=True)
    wx_full = wx.sum(axis=1, keepdims=True)
    wy = jnp.where(split_x[:, None, None, None], jnp.tile(wy_full, (1, 2, 1, 1)), wy)
    wx = jnp.where(split_x[:, None, None, None], wx, jnp.tile(wx_full, (1, 2, 1, 1)))
    return (lvl.astype(jnp.int32), oy_abs.astype(jnp.int32),
            ox.astype(jnp.int32), wy, wx)


def roi_align_bwd_pallas(features, boxes, g, strides, out_size: int = 7,
                         sampling_ratio: int = 2, min_level: int = 2,
                         interpret: bool | None = None):
    """Feature gradients of multilevel_roi_align_pallas_batched.

    Args:
      features: list of (B, H_l, W_l, C) primal feature maps (shapes/dtypes
        only are used).
      boxes: (B, N, 4).
      g: (B, N, P, P, C) output cotangent (float32).
    Returns: list of per-level gradients with `features` shapes/dtypes.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = boxes.shape[:2]
    C = features[0].shape[-1]
    P, S = out_size, sampling_ratio
    level_shapes = [f.shape[1:3] for f in features]

    Wmax8 = max(-(-max(s[1] for s in level_shapes) // 8) * 8, PATCH_B)
    row_off, off = [], 0
    for (h, w) in level_shapes:
        row_off.append(off)
        off += -(-h // 8) * 8
    rows_per_img = max(off, PATCH_B)
    rows_tot = rows_per_img

    row_off_j = jnp.asarray(np.asarray(row_off, np.int32))
    lvl, oy, ox, wy, wx = jax.vmap(
        lambda bx: _plan_bwd(bx, strides, level_shapes, P, S, min_level, Wmax8,
                             row_off_j, rows_per_img)
    )(boxes)

    NB = B * N
    lvl = lvl.reshape(NB)
    oy = oy.reshape(NB, 2)  # absolute staged rows, window-clamped in-plan
    ox = ox.reshape(NB, 2)
    wy = wy.reshape(NB, 2, P * S, PATCH_B).reshape(NB, 2, P, S, PATCH_B).mean(3)
    wx = wx.reshape(NB, 2, P * S, PATCH_B).reshape(NB, 2, P, S, PATCH_B).mean(3)

    assert rows_tot < (1 << 16)
    assert Wmax8 <= (1 << 13)
    pk = (oy + (ox << 16)).reshape(-1)  # (2*NB,) rows [0,16), x cell [16,30)

    K = 4
    pad_n = (-N) % K
    Np = N + pad_n
    if pad_n:  # pad per image so each grid step stays within one image
        def padN(t, fill=0):
            t = t.reshape(B, N, *t.shape[1:])
            pw = [(0, 0), (0, pad_n)] + [(0, 0)] * (t.ndim - 2)
            return jnp.pad(t, pw, constant_values=fill)
        pk = padN(pk.reshape(NB, 2)).reshape(-1)
        wy = padN(wy)
        wx = padN(wx)
        g = padN(g.reshape(B * N, P, P, C))
        wy = wy.reshape(B * Np, 2, P, PATCH_B)
        wx = wx.reshape(B * Np, 2, P, PATCH_B)
    steps = Np // K

    g6 = g.reshape(B, steps, K, P, P, C).astype(jnp.float32)
    wy6 = wy.reshape(B, steps, K, 2, P, PATCH_B).astype(jnp.float32)
    wx6 = wx.reshape(B, steps, K, 2, P, PATCH_B).astype(jnp.float32)

    def kernel(pk_ref, g_ref, wy_ref, wx_ref, out_ref):
        b = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        for k in range(K):
            base = 2 * ((b * steps + s) * K + k)
            w0 = pk_ref[base]
            w1 = pk_ref[base + 1]
            G_k = g_ref[0, 0, k]  # (P, P, C) f32

            def accum(word, q):
                row = pl.multiple_of(word & ((1 << 16) - 1), 8)
                xc = pl.multiple_of(word >> 16, 8)
                # dY (40x, P_y, Cc) = sum_px wx[px, x] G[py, px, c]
                dy = lax.dot_general(
                    wx_ref[0, 0, k, q], G_k, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
                # dP (40r, 40x, Cc) = sum_py wy[py, r] dY[x, py, c]
                dp = lax.dot_general(
                    wy_ref[0, 0, k, q], dy, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
                cur = out_ref[0, pl.ds(row, PATCH_B), pl.ds(xc, PATCH_B), :]
                out_ref[0, pl.ds(row, PATCH_B), pl.ds(xc, PATCH_B), :] = (
                    cur + dp
                )

            accum(w0, 0)

            @pl.when(w0 != w1)
            def _():
                accum(w1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, steps),
        in_specs=[
            pl.BlockSpec((1, 1, K, P, P, C), lambda b, s, *_: (b, s, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K, 2, P, PATCH_B),
                         lambda b, s, *_: (b, s, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K, 2, P, PATCH_B),
                         lambda b, s, *_: (b, s, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_tot, Wmax8, C),
                               lambda b, s, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    acc = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, rows_tot, Wmax8, C), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(pk, g6, wy6, wx6)
    grads = []
    off = 0
    for (h, w), f in zip(level_shapes, features):
        grads.append(acc[:, off:off + h, :w, :].astype(f.dtype))
        off += -(-h // 8) * 8
    return grads
