"""Exact oriented-3D-box overlap (IoU3D) on TPU.

TPU-native replacement for pytorch3d's `_C.iou_box3d` CUDA kernel, the eval
hot loop of the reference (binding: cubercnn/evaluation/omni3d_evaluation.py:37
`box3d_overlap`, guards at :65-166; SURVEY §2.3 N3).

Algorithm (same mathematical construction as the CUDA kernel, vectorized for
the VPU instead of translated):
  1. Triangulate each box into 12 triangles (shared face table from the
     geometry core).
  2. Sutherland-Hodgman clip box A's triangles against B's 6 half-spaces and
     vice versa, over fixed-size padded polygon buffers (a triangle clipped by
     6 planes has <= 9 vertices).
  3. The two clipped surface sets form the closed boundary of the
     intersection; its volume follows from the divergence theorem
     (sum of signed origin-tetra volumes over a fan triangulation).

Everything is static-shape and vmapped over the full N x M pair grid, so one
`jit` call evaluates an entire (image, category) cross product on-device.
Coplanar-face double counting is avoided by clipping the B-in-A pass with a
strictly-inside epsilon.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.geometry import CUBOID_FACES

# max polygon vertices: triangle (3) + one per clip plane (6)
_K = 10
_EPS = 1e-6

# Quad faces of the box in the canonical vertex layout (see geometry.UNIT_CUBE)
_QUADS = np.array(
    [
        [0, 1, 2, 3],  # z- (front)
        [4, 5, 6, 7],  # z+ (back)
        [0, 3, 7, 4],  # x- (left)
        [1, 2, 6, 5],  # x+ (right)
        [0, 1, 5, 4],  # y- (top)
        [3, 2, 6, 7],  # y+ (bottom)
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
    fc = jnp.mean(verts[..., _QUADS, :], axis=-2)  # (..., 6, 3)
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


def _clip_polygon(verts, m, normal, offset, eps_inside):
    """One Sutherland-Hodgman step over a padded polygon.

    verts: (K, 3); m: valid count (traced scalar); half-space
    inside(x) = dot(normal, x) - offset <= eps_inside.
    Returns (new_verts (K, 3), new_m).
    """
    K = verts.shape[0]
    idx = jnp.arange(K)
    valid = idx < m
    dist = verts @ normal - offset
    inside = (dist <= eps_inside) & valid

    m_safe = jnp.maximum(m, 1)
    nxt = jnp.where(idx + 1 >= m_safe, 0, idx + 1)
    v_next = verts[nxt]
    dist_next = dist[nxt]
    inside_next = inside[nxt]

    denom = dist - dist_next
    t = dist / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    ipt = verts + t[:, None] * (v_next - verts)

    emit_v = inside
    emit_i = (inside != inside_next) & valid

    # interleave [v_0, ipt_0, v_1, ipt_1, ...] to preserve boundary order
    cand = jnp.stack([verts, ipt], axis=1).reshape(2 * K, 3)
    flags = jnp.stack([emit_v, emit_i], axis=1).reshape(2 * K)

    # stable compaction of flagged rows to the front
    key = jnp.where(flags, jnp.arange(2 * K), 2 * K + jnp.arange(2 * K))
    order = jnp.argsort(key)[:K]
    new_verts = cand[order]
    new_m = jnp.sum(flags.astype(jnp.int32))
    return new_verts, jnp.minimum(new_m, K)


def _clipped_surface_volume(tris, normals, offsets, eps_inside):
    """Signed origin-flux volume of `tris` clipped to a convex region.

    tris: (T, 3, 3); normals (6, 3); offsets (6,).
    Returns scalar: sum over clipped polygons of fan signed tetra volumes.
    """

    def per_tri(tri):
        verts = jnp.zeros((_K, 3), tri.dtype).at[:3].set(tri)
        m = jnp.int32(3)
        for p in range(normals.shape[0]):
            verts, m = _clip_polygon(verts, m, normals[p], offsets[p], eps_inside)
        # fan triangulation (v0, v_i, v_{i+1}), i in [1, m-2]
        i = jnp.arange(_K)
        tri_valid = (i >= 1) & (i + 1 < m)
        v0 = verts[0]
        vi = verts
        vi1 = verts[jnp.minimum(i + 1, _K - 1)]
        contrib = jnp.sum(v0 * jnp.cross(vi, vi1), axis=-1) / 6.0
        return jnp.sum(jnp.where(tri_valid, contrib, 0.0))

    return jnp.sum(jax.vmap(per_tri)(tris))


def _pair_intersection_volume(verts1, verts2):
    """Intersection volume of two oriented boxes given (8, 3) vertex sets."""
    faces = jnp.asarray(CUBOID_FACES)
    tris1 = verts1[faces]  # (12, 3, 3)
    tris2 = verts2[faces]
    n1, d1 = box_planes(verts1)
    n2, d2 = box_planes(verts2)
    # A-in-B inclusive; B-in-A strictly inside to count coplanar caps once
    vol = _clipped_surface_volume(tris1, n2, d2, _EPS) + _clipped_surface_volume(
        tris2, n1, d1, -_EPS
    )
    return jnp.abs(vol)


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
    inter = jax.vmap(
        lambda v1: jax.vmap(lambda v2: _pair_intersection_volume(v1, v2))(verts2)
    )(verts1)
    vol1 = box_volume(verts1)[:, None]
    vol2 = box_volume(verts2)[None, :]
    union = vol1 + vol2 - inter
    iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
    return inter, jnp.clip(iou, 0.0, 1.0)
