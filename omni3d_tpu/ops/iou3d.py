"""Exact oriented-3D-box overlap (IoU3D) on TPU.

TPU-native replacement for pytorch3d's `_C.iou_box3d` CUDA kernel, the eval
hot loop of the reference (binding: cubercnn/evaluation/omni3d_evaluation.py:37
`box3d_overlap`, guards at :65-166; SURVEY §2.3 N3).

Same mathematical construction as the CUDA kernel — Sutherland-Hodgman clip
each box's faces against the other's 6 half-spaces, then integrate the closed
intersection boundary with the divergence theorem — but laid out for the VPU
instead of translated thread-per-pair:

  * structure-of-arrays: polygons live as (K, 3, B) with the full
    B = N*M*6-face batch in the minor (lane) axis, so every clip step is a
    handful of full-width elementwise ops instead of N*M scalar programs;
  * quad faces (6 per box), not 12 triangles — half the polygon batch and
    one fewer clip-survivor slot class;
  * a pad-with-v0 invariant (slots >= m replicate vertex 0) turns the
    polygon wrap edge into a plain `roll` along the slot axis;
  * compaction of clip survivors via cumsum positions + a one-hot matmul
    (pinned f32) — no argsort/gather, which lower poorly on TPU;
  * all distance arithmetic is elementwise f32 on the VPU (the previous
    per-pair kernel used `verts @ normal`, which TPU lowers to a bf16
    matvec by default).

Everything is static-shape, so one `jit` call evaluates an entire
(image, category) cross product on-device. Coplanar-face double counting is
avoided by clipping the B-in-A pass strictly inside (-eps) while A-in-B
keeps coplanar faces (+eps); the tolerance is scale-relative because the
f32 rounding of a plane distance grows with the coordinate magnitude (an
absolute eps collapsed self-pair IoU to 0 a few metres from the origin).

Known edge case (shared with the previous kernel and the reference's CUDA
construction): two boxes touching exactly on a full face report the flux of
that single open quad (e.g. unit cubes -> vol 1/6) instead of 0, because
the coplanar cap is counted once but the intersection is degenerate. This
configuration is measure-zero for real detections.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# max polygon vertices: quad (4) + one per clip plane (6)
_K = 10
# scale-relative coplanarity tolerance, ~100x accumulated f32 rounding
_REL_EPS = 1e-5

# Quad faces of the canonical box (geometry.UNIT_CUBE layout), wound so the
# cross-product normal of each face points OUTWARD — required so the summed
# origin-flux of the clipped boundary is consistently signed.
_QUADS_OUT = np.array(
    [
        [0, 3, 2, 1],  # z-
        [4, 5, 6, 7],  # z+
        [0, 4, 7, 3],  # x-
        [1, 2, 6, 5],  # x+
        [0, 1, 5, 4],  # y-
        [3, 7, 6, 2],  # y+
    ],
    dtype=np.int32,
)


def box_planes(verts: jnp.ndarray):
    """Outward half-space (normal, offset) per face of a box.

    verts: (..., 8, 3). Returns normals (..., 6, 3) unit, offsets (..., 6)
    with inside(x) := dot(n, x) - d <= 0. Exact for parallelepipeds: the
    outward normal of a face is the direction face-center - box-center.
    """
    center = jnp.mean(verts, axis=-2)  # (..., 3)
    fc = jnp.mean(verts[..., _QUADS_OUT, :], axis=-2)  # (..., 6, 3)
    n = fc - center[..., None, :]
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.where(norm < 1e-12, 1.0, norm)
    d = jnp.sum(n * fc, axis=-1)
    return n, d


def box_volume(verts: jnp.ndarray) -> jnp.ndarray:
    """Volume of a parallelepiped from its 8 vertices: |det(e1, e2, e3)|
    using the edges at vertex 0 (neighbors 1, 3, 4 in the canonical layout)."""
    e1 = verts[..., 1, :] - verts[..., 0, :]
    e2 = verts[..., 3, :] - verts[..., 0, :]
    e3 = verts[..., 4, :] - verts[..., 0, :]
    return jnp.abs(jnp.sum(e1 * jnp.cross(e2, e3), axis=-1))


def _flux_soa(v, nrm, off, eps):
    """Core SoA Sutherland-Hodgman + divergence flux over a flat lane batch.

    v: (4, 3, B) quad vertices; nrm: (P, 3, B), off: (P, B) clip half-spaces
    dot(n, x) <= d; eps: (B,) signed coplanarity tolerance (+ keeps coplanar
    faces, - drops them). Returns (B,) signed origin-flux contributions.
    """
    B = v.shape[-1]
    P = nrm.shape[0]
    # Invariant: slots >= m hold a copy of vertex 0, so the wrap edge
    # (v_{m-1} -> v_0) is a plain roll along the slot axis.
    verts = jnp.concatenate(
        [v, jnp.broadcast_to(v[0:1], (_K - 4, 3, B))], axis=0)  # (K,3,B)
    m = jnp.full((B,), 4, jnp.int32)

    slot = jnp.arange(_K)[:, None]  # (K,1)
    for _p in range(P):
        valid = slot < m  # (K,B)
        dist = (verts[:, 0] * nrm[_p, 0] + verts[:, 1] * nrm[_p, 1]
                + verts[:, 2] * nrm[_p, 2]) - off[_p]  # (K,B)
        in_raw = dist <= eps  # unmasked: invalid slots hold v0 -> wrap flag
        nxt_v = jnp.roll(verts, -1, axis=0)
        nxt_d = jnp.roll(dist, -1, axis=0)
        nxt_in = jnp.roll(in_raw, -1, axis=0)

        denom = dist - nxt_d
        t = dist / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        ipt = verts + t[:, None, :] * (nxt_v - verts)  # (K,3,B)

        emit_v = in_raw & valid
        emit_i = (in_raw != nxt_in) & valid

        # interleave [v_0, ipt_0, v_1, ipt_1, ...] to keep boundary order
        cand = jnp.stack([verts, ipt], axis=1).reshape(2 * _K, 3, B)
        flags = jnp.stack([emit_v, emit_i], axis=1).reshape(2 * _K, B)

        # stable compaction: cumsum positions + one-hot matmul (no argsort)
        pos = jnp.cumsum(flags.astype(jnp.int32), axis=0) - 1  # (2K,B)
        sel = ((pos[None] == jnp.arange(_K)[:, None, None]) & flags[None]
               ).astype(verts.dtype)  # (K,2K,B)
        verts = jnp.einsum("kib,icb->kcb", sel, cand,
                           precision=jax.lax.Precision.HIGHEST)
        m = jnp.minimum(flags.astype(jnp.int32).sum(0), _K)
        # restore the pad-with-v0 invariant
        verts = jnp.where((slot < m)[:, None, :], verts,
                          jnp.broadcast_to(verts[0:1], verts.shape))

    # fan triangulation (v0, v_i, v_{i+1}), 1 <= i <= m-2: no wrap needed
    v0, vi = verts[0], verts
    vi1 = jnp.roll(verts, -1, axis=0)
    cx = vi[:, 1] * vi1[:, 2] - vi[:, 2] * vi1[:, 1]
    cy = vi[:, 2] * vi1[:, 0] - vi[:, 0] * vi1[:, 2]
    cz = vi[:, 0] * vi1[:, 1] - vi[:, 1] * vi1[:, 0]
    contrib = (v0[0] * cx + v0[1] * cy + v0[2] * cz) / 6.0  # (K,B)
    tri_valid = (slot >= 1) & (slot + 1 < m)
    return jnp.where(tri_valid, contrib, 0.0).sum(0)  # (B,)


def _rel_eps(v, off, eps_sign):
    """Scale-relative coplanarity tolerance per lane.

    dist = n.x - d is a true world distance (|n| = 1); its f32 rounding
    grows with the coordinate/offset magnitude, so an absolute eps
    mis-classifies coplanar faces for boxes a few metres from the origin.
    v: (4, 3, B), off: (P, B), eps_sign: (B,) or scalar. Returns (B,).
    """
    vmax = jnp.max(jnp.abs(v), axis=(0, 1))  # (B,)
    omax = jnp.max(jnp.abs(off), axis=0)  # (B,)
    return eps_sign * _REL_EPS * (1.0 + vmax + omax)


def _pair_flux(quads1, quads2, n1, d1, n2, d2):
    """Both clip passes of the pairwise grid in ONE flat flux batch.

    quads*: (..., F, 4, 3) outward-wound faces; n*: (..., P, 3); d*: (..., P)
    where quads1/n1/d1 carry an N axis and quads2/n2/d2 an M axis arranged so
    broadcasting (..., N, M, ...) works (callers pre-insert singleton axes).
    Stacks [A-faces-in-B (+eps), B-faces-in-A (-eps)] along the lane axis so
    the whole intersection volume is one kernel invocation.
    Returns summed flux with shape broadcast(...): (N, M) or (T, N, M).
    """
    F, P = quads1.shape[-3], n1.shape[-2]

    def lanes(quads, normals, offsets):
        # quads (..., F, 4, 3) x planes (..., P, 3)/(...) -> flat SoA lanes
        shape = jnp.broadcast_shapes(quads.shape[:-3], normals.shape[:-2])
        B = int(np.prod(shape)) * F
        q = jnp.broadcast_to(quads, shape + quads.shape[-3:])
        v = jnp.moveaxis(q.reshape(-1, 4, 3), 0, -1)  # (4,3,B)
        nrm = jnp.broadcast_to(normals[..., None, :, :], shape + (F, P, 3))
        nrm = jnp.moveaxis(nrm.reshape(-1, P, 3), 0, -1)  # (P,3,B)
        off = jnp.broadcast_to(offsets[..., None, :], shape + (F, P))
        off = jnp.moveaxis(off.reshape(-1, P), 0, -1)  # (P,B)
        return v, nrm, off, shape

    va, na, oa, sa = lanes(quads1, n2, d2)  # A faces in B half-spaces
    vb, nb, ob, sb = lanes(quads2, n1, d1)  # B faces in A half-spaces
    assert sa == sb
    v = jnp.concatenate([va, vb], axis=-1)
    nrm = jnp.concatenate([na, nb], axis=-1)
    off = jnp.concatenate([oa, ob], axis=-1)
    Bh = va.shape[-1]
    sign = jnp.concatenate([jnp.ones(Bh), -jnp.ones(Bh)])
    eps = _rel_eps(v, off, sign)
    flux = _flux_soa(v, nrm, off, eps)  # (2*Bh,)
    fa = flux[:Bh].reshape(sa + (F,)).sum(-1)
    fb = flux[Bh:].reshape(sb + (F,)).sum(-1)
    return fa + fb


def box3d_overlap(verts1: jnp.ndarray, verts2: jnp.ndarray):
    """Pairwise intersection volume and IoU of oriented 3D boxes.

    Args:
      verts1: (N, 8, 3) box corners in the canonical layout.
      verts2: (M, 8, 3).

    Returns:
      (vol (N, M), iou (N, M)) float32, matching pytorch3d box3d_overlap
      (reference omni3d_evaluation.py:106-166 wraps it with degeneracy
      guards, reproduced in the evaluation suite).
    """
    verts1 = jnp.asarray(verts1, jnp.float32)
    verts2 = jnp.asarray(verts2, jnp.float32)
    n1, d1 = box_planes(verts1)
    n2, d2 = box_planes(verts2)
    q1 = verts1[:, _QUADS_OUT]  # (N,6,4,3)
    q2 = verts2[:, _QUADS_OUT]
    inter = jnp.abs(_pair_flux(
        q1[:, None], q2[None, :], n1[:, None], d1[:, None],
        n2[None, :], d2[None, :]))
    vol1 = box_volume(verts1)[:, None]
    vol2 = box_volume(verts2)[None, :]
    union = vol1 + vol2 - inter
    iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
    return inter, jnp.clip(iou, 0.0, 1.0)


def box3d_overlap_tiled(verts1: jnp.ndarray, verts2: jnp.ndarray):
    """Per-tile pairwise IoU3D: (T, N, 8, 3) x (T, M, 8, 3) -> (T, N, M).

    The block-diagonal batched form of `box3d_overlap`: tile t's N boxes are
    intersected with tile t's M boxes only. This is the eval-path workhorse —
    the AP evaluator packs every (image, category) group (split into fixed
    N x M tiles) into ONE fixed-shape call instead of one device roundtrip
    and one compile-cache entry per group (reference computeIoU loop,
    omni3d_evaluation.py:1359-1431, issues one CUDA launch per group; a
    35 ms host<->device tunnel latency makes that layout untenable on TPU).

    Returns (vol (T, N, M), iou (T, N, M)) float32.
    """
    verts1 = jnp.asarray(verts1, jnp.float32)
    verts2 = jnp.asarray(verts2, jnp.float32)
    n1, d1 = box_planes(verts1)
    n2, d2 = box_planes(verts2)
    q1 = verts1[:, :, _QUADS_OUT]  # (T,N,6,4,3)
    q2 = verts2[:, :, _QUADS_OUT]
    inter = jnp.abs(_pair_flux(
        q1[:, :, None], q2[:, None, :], n1[:, :, None], d1[:, :, None],
        n2[:, None, :], d2[:, None, :]))
    vol1 = box_volume(verts1)[:, :, None]
    vol2 = box_volume(verts2)[:, None, :]
    union = vol1 + vol2 - inter
    iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
    return inter, jnp.clip(iou, 0.0, 1.0)
