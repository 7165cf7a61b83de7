"""Pallas TPU kernel for the multi-level ROIAlign backward (feature grads).

The XLA autodiff transpose of the gather-based pooler is a row scatter-add —
~6M near-serial updates for one training step; XLA serializes the
overlapping-window read-modify-writes. This kernel accumulates instead in
VMEM, as the EXACT transpose of the pallas forward's one-matmul design
(roi_align_pallas.py): it reuses the forward's per-box windowed plan (level
routing, align-rounded sub-window origins, bilinear weight factors), so the
VJP transposes precisely the linear map the forward applies — including the
forward's documented elongated-box truncation.

  grid (image, box-step); the out block — one image's TRANSPOSED gradient
  plane (rows=(level, x), Hp=y, C) — is revisited across the box steps, so
  the pallas pipeline keeps it resident in VMEM and flushes it to HBM when
  the image index changes. Per (box, sub-window) the transposed pooling is
  ONE matmul

      dP[(x, y), c] = sum_r A[r, x*BY + y] * G[r, c]

  with the SAME pooling matrix A the forward builds (wy factor lane-tiled,
  wx factor lifted by a one-hot expander), followed by a read-modify-write
  of the (PATCH_X, BY, C) window at the box's origin. The sequential grid
  makes overlapping-window RMW race-free by construction — the thing
  neither XLA scatter path can exploit. Window overhang past a level's
  extent lands on zero-weight cells (exact zeros added into a neighbor
  block or the PATCH_X-row tail). (A DMA-mode bf16 forward uses 40-row/
  8-aligned windows vs this kernel's 48/16; level routing is
  geometry-independent so only the beyond-fit truncation boundary can
  differ there.)

The window geometry is derived from the FEATURE dtype (the resident
forward's rule) so the backward transposes the exact plan the forward ran,
widened to the accumulator dtype's sublane tile when that is stricter.
Gradient accumulation is float32 by default (~44 MB block at 512px/C=256;
v5e VMEM is 128 MB, raised via vmem_limit_bytes); f32 features' matmuls run
at HIGHEST, matching the forward kernel's precision rule. An `acc_dtype`
override keeps a bf16-accumulator variant — measured SLOWER on v5e (the
RMW's bf16 pack/unpack costs more than the halved VMEM bytes save) but
parity-tested for hardware where that trade flips.

Reference: torchvision ROIAlign backward (CUDA atomicAdd splatting), bound
at cubercnn/modeling/roi_heads/roi_heads.py:166-171 via the poolers
(SURVEY §2.3 N1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align_pallas import (CHUNK_Y, PATCH_X, _build_A_rows, _expand_pack,
                               _one_hot_expander, _plan, _window_geom,
                               staging_extent)


def roi_align_bwd_pallas(features, boxes, g, strides, out_size: int = 7,
                         sampling_ratio: int = 2, min_level: int = 2,
                         interpret: bool | None = None, acc_dtype=None):
    """Feature gradients of multilevel_roi_align_pallas_batched.

    Args:
      features: list of (B, H_l, W_l, C) primal feature maps (shapes/dtypes
        only are used).
      boxes: (B, N, 4).
      g: (B, N, P, P, C) output cotangent.
      acc_dtype: accumulator dtype, default float32. A bf16 accumulator was
        measured SLOWER on v5e (53.5 vs 34.5 ms at B=32 N=640): the RMW's
        bf16 pack/unpack costs more than the halved VMEM bytes save, so f32
        stays the default; the bf16 path is kept (and parity-tested) for
        hardware where the trade flips.
    Returns: list of per-level gradients with `features` shapes/dtypes.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = boxes.shape[:2]
    C = features[0].shape[-1]
    P, S = out_size, sampling_ratio
    level_shapes = [f.shape[1:3] for f in features]
    dtype = features[0].dtype
    # keep lane dim on the Mosaic grid (cf. forward fallback); interpret mode
    # has no lane constraint, so tests exercise the kernel at any C
    if C % 128 and not interpret:
        from .roi_align import multilevel_roi_align

        def pool(feats):
            return jax.vmap(
                lambda fl, bx: multilevel_roi_align(
                    list(fl), bx, list(strides), out_size, sampling_ratio,
                    min_level)
            )(list(feats), boxes)

        _, vjp = jax.vjp(pool, list(features))
        (d,) = vjp(g.astype(jnp.float32))
        return [x.astype(f.dtype) for x, f in zip(d, features)]

    acc_dtype = jnp.dtype(acc_dtype or jnp.float32)
    # window geometry follows the FEATURE dtype — the same rule the resident
    # forward uses — so the backward applies the transpose of the exact plan
    # the forward ran (same origins, same truncation boundary), rather than
    # a merely-coinciding-within-coverage one. The accumulator RMW adds its
    # own constraint: origins must also respect the ACC dtype's sublane tile
    # (8 rows f32, 16 bf16); take the stricter of the two (a 16-aligned
    # origin slices f32 tiles cleanly, so widening is always safe).
    BY, ALIGN = _window_geom(dtype)
    acc_BY, acc_ALIGN = _window_geom(acc_dtype)
    if acc_ALIGN > ALIGN:
        BY, ALIGN = acc_BY, acc_ALIGN
    xoff, _, rows_tot, Hp = staging_extent(level_shapes, BY)

    lvl, oy, ox, wy, wx = jax.vmap(
        lambda bx: _plan(bx, strides, level_shapes, P, S, min_level, BY, ALIGN)
    )(boxes)

    NB = B * N
    lvl = lvl.reshape(NB)
    oy = oy.reshape(NB, 2)
    ox = ox.reshape(NB, 2)
    wy = wy.reshape(NB, 2, P, BY)   # sample-reduced in _plan
    wx = wx.reshape(NB, 2, P, PATCH_X)

    # y-chunk tail flags, mirroring the forward kernel: the gradient window
    # RMW is split into a CHUNK_Y-row base + conditional (BY-CHUNK_Y)-row
    # tail; a sub-window whose tail weight block is exactly zero adds
    # exactly zero there, so skipping its matmul AND its read-modify-write
    # is exact. Real post-NMS/foreground boxes are y-compact (r5 extent
    # histogram: ~100% tail-free), cutting 1/3 of the f32 accumulator
    # traffic — the bwd kernel's dominant cost.
    tails = (jnp.abs(wy[:, :, :, CHUNK_Y:]).sum(axis=(2, 3)) > 0
             ).astype(jnp.int32)                  # (NB, 2)

    xx = ox + jnp.asarray(xoff)[lvl][:, None]
    assert rows_tot < (1 << 15) and Hp <= (1 << 13)
    # BOTH tail bits in BOTH words (bits 15/16) so q1-skip word equality
    # still holds for coincident sub-windows (see the forward's comment)
    tbits = (tails[:, 0] << 15) + (tails[:, 1] << 16)
    pk = (xx + tbits[:, None] + (oy << 17)).reshape(-1)

    K = 8  # swept {2, 4, 8} at 32x640: 31.7/31.1/30.6 ms (r5)
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
        g = padN(g.reshape(NB, P, P, C))
    steps = Np // K

    P8 = -(-P // 8) * 8
    g6 = jnp.pad(g.reshape(B, steps, K, P, P, C),
                 ((0, 0), (0, 0), (0, 0), (0, P8 - P), (0, P8 - P), (0, 0))
                 ).astype(dtype)

    wboth, lanes = _expand_pack(wy, wx, BY, P, K, dtype)
    wboth = wboth.reshape(B, steps, K * 2 * P8 * P8, lanes).astype(dtype)

    XY = PATCH_X * BY  # flattened (x, y) window length
    XY0 = PATCH_X * CHUNK_Y
    TY = BY - CHUNK_Y
    EL = _one_hot_expander(BY, dtype, chunk=CHUNK_Y)

    prec = (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)

    def kernel(pk_ref, g_ref, w_ref, el_ref, out_ref, a1_buf):
        b = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

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
            # per-q tail flags: q0 reads bit 15, q1 bit 16
            t0 = ((w0 >> 15) & 1) == 1
            t1 = ((w1 >> 16) & 1) == 1
            G_k = g_ref[0, 0, k].reshape(P8 * P8, C)

            def accum_base(word, A_k):
                xc = word & ((1 << 15) - 1)
                row = pl.multiple_of(word >> 17, ALIGN)
                dp = lax.dot_general(
                    A_k[:, :XY0], G_k, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ).reshape(PATCH_X, CHUNK_Y, C)
                cur = out_ref[0, pl.ds(xc, PATCH_X), pl.ds(row, CHUNK_Y), :]
                out_ref[0, pl.ds(xc, PATCH_X), pl.ds(row, CHUNK_Y), :] = (
                    cur + dp
                ).astype(out_ref.dtype)

            def accum_tail(word, A_k):
                xc = word & ((1 << 15) - 1)
                row = pl.multiple_of((word >> 17) + CHUNK_Y, ALIGN)
                dp = lax.dot_general(
                    A_k[:, XY0:], G_k, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ).reshape(PATCH_X, TY, C)
                cur = out_ref[0, pl.ds(xc, PATCH_X), pl.ds(row, TY), :]
                out_ref[0, pl.ds(xc, PATCH_X), pl.ds(row, TY), :] = (
                    cur + dp
                ).astype(out_ref.dtype)

            # y-chunked accumulation: base RMW always; the tail's matmul
            # AND read-modify-write only when its weight block is nonzero
            accum_base(w0, A0[k])

            @pl.when(t0)
            def _():
                accum_tail(w0, A0[k])

            # compact boxes carry a zero q1 weight block — skip its matmul
            # and RMW entirely
            @pl.when(q1_here[k])
            def _():
                accum_base(w1, a1_buf[k])

            @pl.when(q1_here[k] & t1)
            def _():
                accum_tail(w1, a1_buf[k])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, steps),
        in_specs=[
            pl.BlockSpec((1, 1, K, P8, P8, C),
                         lambda b, s, *_: (b, s, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K * 2 * P8 * P8, lanes),
                         lambda b, s, *_: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BY + PATCH_X, XY), lambda b, s, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_tot, Hp, C),
                               lambda b, s, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, P8 * P8, XY), dtype)],
    )

    acc = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, rows_tot, Hp, C), acc_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(pk, g6, wboth, EL)

    grads = []
    for (h, w), o, f in zip(level_shapes, xoff, features):
        grads.append(
            jnp.transpose(acc[:, o:o + w, :h, :], (0, 2, 1, 3)).astype(f.dtype))
    return grads
