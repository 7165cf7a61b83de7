"""Visualization: 2D boxes, 3D wireframes with z-clipping, BEV (host, cv2).

Re-implementation of the reference visualization essentials
(cubercnn/vis/vis.py): `draw_3d_box` wireframes with near-plane clipping
(:571-645), `draw_scene_view` front rendering (:210-538, wireframe mode),
`draw_bev` (:26-55). The mesh-rasterized novel view is replaced by a simple
painter's-order wireframe overlay (the rasterizer served visualization only,
SURVEY §2.3 N5).
"""
from __future__ import annotations

import cv2
import numpy as np

from ..utils import geometry as G

# edges of the canonical cuboid (pairs of vertex indices)
_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def get_color(idx: int) -> tuple:
    """Deterministic distinct colors (reference util.get_color equivalent)."""
    rng = np.random.default_rng(idx * 9781 + 3)
    return tuple(int(v) for v in rng.integers(60, 255, 3))


def _project_clip_segment(K, p0, p1, min_z=0.05):
    """Clip a 3D segment against z=min_z then project; returns None if fully
    behind (reference draw_3d_box clipping, vis.py:571-645)."""
    z0, z1 = p0[2], p1[2]
    if z0 < min_z and z1 < min_z:
        return None
    if z0 < min_z or z1 < min_z:
        t = (min_z - z0) / (z1 - z0)
        pc = p0 + t * (p1 - p0)
        if z0 < min_z:
            p0 = pc
        else:
            p1 = pc
    a = K @ p0
    b = K @ p1
    return (a[:2] / a[2]).astype(int), (b[:2] / b[2]).astype(int)


def draw_3d_box(image, K, box3d, R=None, color=(0, 200, 255), thickness=2):
    """Draw a cuboid wireframe; box3d [x,y,z,w,h,l] + rotation."""
    import jax.numpy as jnp

    verts = np.asarray(G.cuboid_verts(jnp.asarray(box3d, jnp.float32),
                                      None if R is None else jnp.asarray(R, jnp.float32)))
    K = np.asarray(K, np.float64)
    for i, j in _EDGES:
        seg = _project_clip_segment(K, verts[i].astype(np.float64), verts[j].astype(np.float64))
        if seg is None:
            continue
        cv2.line(image, tuple(seg[0]), tuple(seg[1]), color, thickness)
    return image


def draw_2d_box(image, box, color=(0, 255, 0), thickness=2, label=None):
    x1, y1, x2, y2 = [int(v) for v in box]
    cv2.rectangle(image, (x1, y1), (x2, y2), color, thickness)
    if label:
        cv2.putText(image, label, (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1, cv2.LINE_AA)
    return image


def draw_scene_view(image, K, centers, dims, poses, labels=None, colors=None,
                    thickness=2):
    """Front-view wireframe overlay of detections sorted far-to-near."""
    img = image.copy()
    n = len(centers)
    order = np.argsort([-c[2] for c in centers])
    for rank, i in enumerate(order):
        color = colors[i] if colors is not None else get_color(int(i))
        box3d = list(centers[i]) + list(dims[i])
        draw_3d_box(img, K, box3d, poses[i], color, thickness)
        if labels is not None:
            p = np.asarray(K) @ np.asarray(centers[i], np.float64)
            if p[2] > 0.05:
                cv2.putText(img, str(labels[i]), (int(p[0] / p[2]), int(p[1] / p[2])),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1, cv2.LINE_AA)
    return img


def visualize_training_sample(batch, det, pixel_mean, pixel_std, thing_classes,
                              max_vis: int = 20, score_thresh: float = 0.25):
    """GT-vs-prediction panels for one training image (host side).

    Reimplements the reference's training-time visualization
    (meta_arch/rcnn3d.py:114-245): a 2D panel (GT boxes | predicted boxes,
    standing in for RPN proposals) and a 3D panel (GT cuboids | predicted
    cuboids). `batch` is the collated training batch (numpy), `det` the
    inference outputs for image 0. Returns {"2d": img, "3d": img} in RGB.

    Unlike the reference (which pulls proposals/instances out of the
    training-mode forward), predictions come from a separate eval-mode
    inference pass — the jitted train step only returns losses.
    """
    h, w = (int(v) for v in batch["hw"][0])
    mean = np.asarray(pixel_mean, np.float32)
    std = np.asarray(pixel_std, np.float32)
    img = np.clip(batch["images"][0, :h, :w] * std + mean, 0, 255).astype(np.uint8)
    img = np.ascontiguousarray(img[..., ::-1])  # stored BGR-normalized -> RGB

    ratio = float(batch["ratios"][0])
    K_net = np.asarray(batch["Ks"][0], np.float64) / ratio
    K_net[2, 2] = 1.0
    fx, sx = K_net[0, 0], K_net[0, 2]
    fy, sy = K_net[1, 1], K_net[1, 2]

    # ---- GT: back-project (u, v, z) to camera XYZ (rcnn3d.py:188-199) ----
    gvalid = batch["gt_valid"][0].astype(bool)
    g3d = batch["gt_boxes3D"][0][gvalid]
    gz = g3d[:, 2]
    gt_centers = np.stack([gz * (g3d[:, 0] - sx) / fx,
                           gz * (g3d[:, 1] - sy) / fy, gz], axis=1)
    gt_dims = g3d[:, 3:6]
    gt_poses = batch["gt_poses"][0][gvalid]
    gt_classes = batch["gt_classes"][0][gvalid]
    gt_labels = [thing_classes[int(c)] if 0 <= int(c) < len(thing_classes)
                 else str(int(c)) for c in gt_classes]

    # ---- predictions: top-scoring valid detections ----
    keep = np.asarray(det["valid"], bool) & (np.asarray(det["scores"]) > score_thresh)
    order = np.argsort(-np.asarray(det["scores"]))[:max_vis]
    order = order[keep[order]]
    pr_centers = np.asarray(det["center_cam"])[order]
    pr_dims = np.asarray(det["dims"])[order]
    pr_poses = np.asarray(det["pose"])[order]
    pr_labels = [
        f"{thing_classes[int(c)] if 0 <= int(c) < len(thing_classes) else int(c)}"
        f" {s:.2f}"
        for c, s in zip(np.asarray(det["classes"])[order],
                        np.asarray(det["scores"])[order])
    ]

    img_gt2d = img.copy()
    for b in batch["gt_boxes"][0][gvalid]:
        draw_2d_box(img_gt2d, b, color=(0, 255, 0))
    img_pr2d = img.copy()
    for b in np.asarray(det["boxes"])[order]:
        draw_2d_box(img_pr2d, b, color=(0, 200, 255))
    vis2d = np.concatenate([img_gt2d, img_pr2d], axis=1)

    img_gt3d = draw_scene_view(img, K_net, gt_centers, gt_dims, gt_poses,
                               labels=gt_labels)
    img_pr3d = draw_scene_view(img, K_net, pr_centers, pr_dims, pr_poses,
                               labels=pr_labels)
    vis3d = np.concatenate([img_gt3d, img_pr3d], axis=1)
    return {"2d": vis2d, "3d": vis3d}


def draw_bev(centers, dims, poses, canvas_hw=(400, 400), max_range=40.0,
             colors=None):
    """Bird's-eye-view footprint plot (reference vis.py:26-55)."""
    H, W = canvas_hw
    canvas = np.full((H, W, 3), 32, np.uint8)
    scale = H / max_range

    def to_px(x, z):
        return int(W / 2 + x * scale), int(H - z * scale)

    for i, (c, d, R) in enumerate(zip(centers, dims, poses)):
        w3d, _, l3d = d
        # footprint corners in object frame (x spans l, z spans w)
        corners = np.array([
            [-l3d / 2, 0, -w3d / 2], [l3d / 2, 0, -w3d / 2],
            [l3d / 2, 0, w3d / 2], [-l3d / 2, 0, w3d / 2],
        ])
        world = corners @ np.asarray(R).T + np.asarray(c)
        pts = np.asarray([to_px(p[0], p[2]) for p in world], np.int32)
        color = colors[i] if colors is not None else get_color(int(i))
        cv2.polylines(canvas, [pts], True, color, 2)
    return canvas
