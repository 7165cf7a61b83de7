"""Minimal z-buffer cuboid rasterizer + visibility/truncation estimators.

Replaces the pytorch3d mesh rasterizer the reference uses for dataset
preprocessing (reference cubercnn/util/math_util.py:707-758
render_depth_map / estimate_visibility / estimate_truncation; SURVEY §2.3 N5:
"needed only for vis + dataset preprocessing; simple JAX z-buffer
rasterizer"). Pure jnp: rasterizes the 12 triangles of each cuboid with
barycentric tests, vectorized over (pixels x triangles).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry as G
from .boxes import iou_np


def render_depth_map(K, boxes3d, poses, width: int, height: int):
    """Per-instance silhouettes and a joint depth map.

    Args:
      K: (3, 3) intrinsics; boxes3d: (N, 6); poses: (N, 3, 3).
    Returns:
      silhouettes (N, H, W) bool, depth_map (H, W) float (inf = empty),
      depth_inds (H, W) int32 — nearest instance per pixel (like the
      reference's zbuf argmin, math_util.py:722-726).
    """
    boxes3d = jnp.asarray(boxes3d, jnp.float32)
    poses = jnp.asarray(poses, jnp.float32)
    K = jnp.asarray(K, jnp.float32)
    N = boxes3d.shape[0]

    verts = G.cuboid_verts(boxes3d, poses)  # (N, 8, 3)
    tris = verts[:, G.CUBOID_FACES]  # (N, 12, 3, 3)
    tris = tris.reshape(N * 12, 3, 3)

    proj = G.project_points(K[None], tris.reshape(1, -1, 3))[0].reshape(-1, 3, 3)
    uv = proj[:, :, :2]  # (T, 3, 2)
    z = jnp.maximum(proj[:, :, 2], 1e-6)

    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    px, py = jnp.meshgrid(xs, ys)  # (H, W)
    pix = jnp.stack([px, py], -1).reshape(-1, 2)  # (P, 2)

    a, b, c = uv[:, 0], uv[:, 1], uv[:, 2]

    def edge(p0, p1, p):
        return ((p1[:, None, 0] - p0[:, None, 0]) * (p[None, :, 1] - p0[:, None, 1])
                - (p1[:, None, 1] - p0[:, None, 1]) * (p[None, :, 0] - p0[:, None, 0]))

    w0 = edge(b, c, pix)
    w1 = edge(c, a, pix)
    w2 = edge(a, b, pix)
    area = w0 + w1 + w2  # == 2 * signed triangle area, constant over pixels
    inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
    safe_area = jnp.where(jnp.abs(area) < 1e-9, 1e-9, area)
    l0, l1, l2 = w0 / safe_area, w1 / safe_area, w2 / safe_area
    # perspective-correct depth via 1/z interpolation
    inv_z = l0 * (1.0 / z[:, 0:1]) + l1 * (1.0 / z[:, 1:2]) + l2 * (1.0 / z[:, 2:3])
    depth = 1.0 / jnp.maximum(inv_z, 1e-9)
    # cull triangles behind the camera
    front = jnp.all(z > 1e-5, axis=1)[:, None]
    valid = inside & front
    depth = jnp.where(valid, depth, jnp.inf)  # (T, P)

    depth_inst = depth.reshape(N, 12, -1).min(axis=1)  # (N, P)
    sil = jnp.isfinite(depth_inst)
    depth_map = depth_inst.min(axis=0)
    inds = jnp.argmin(depth_inst, axis=0)
    H, W = height, width
    return (sil.reshape(N, H, W), depth_map.reshape(H, W),
            inds.astype(jnp.int32).reshape(H, W))


def estimate_visibility(K, boxes3d, poses, width: int, height: int):
    """Fraction of each instance's silhouette it wins in the z-buffer
    (reference math_util.py:728-743)."""
    sil, _, inds = render_depth_map(K, boxes3d, poses, width, height)
    sil = np.asarray(sil)
    inds = np.asarray(inds)
    out = []
    for i in range(sil.shape[0]):
        area = sil[i].sum()
        visible = ((inds == i) & sil[i]).sum()
        out.append(float(visible / area) if area > 0 else 0.0)
    return out


def estimate_truncation(K, box3d, R, imW: int, imH: int) -> float:
    """1 - IoA of the projected box with the image window
    (reference math_util.py:745-758)."""
    box2d, _, fully_behind = G.box3d_to_box2d(
        jnp.asarray(K, jnp.float32), jnp.asarray(box3d, jnp.float32),
        jnp.asarray(R, jnp.float32), clipw=imW, cliph=imH, xywh=False,
    )
    if bool(fully_behind):
        return 1.0
    image_box = np.array([[0, 0, imW - 1, imH - 1]], np.float64)
    iou = iou_np(np.asarray(box2d, np.float64)[None], image_box, ign_area_b=True)
    return float(1.0 - iou[0, 0])
