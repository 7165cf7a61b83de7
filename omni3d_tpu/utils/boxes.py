"""2D box math: IoU/IoA, delta encode/decode, clipping — pure jnp.

TPU-native replacement for the detectron2 Boxes/Box2BoxTransform machinery the
reference binds to (SURVEY §2.2; detectron2 box_regression + structures.Boxes)
and for the repo-local IoU helpers (reference cubercnn/util/math_util.py:850-966).
Boxes are plain (..., 4) arrays in XYXY pixel coordinates; invalid/padded rows
are handled by callers via masks.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

# detectron2 Box2BoxTransform default scale clamp.
SCALE_CLAMP = math.log(1000.0 / 16)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )


def pairwise_intersection(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas between all pairs. a: (M, 4), b: (N, 4) -> (M, N).

    Computed coordinate-by-coordinate: broadcasting to (M, N, 2) puts 2 on
    the TPU lane dimension (2/128 utilization, ~40x slower at detector scale).
    """
    ix1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    return jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between all pairs; (M, 4) x (N, 4) -> (M, N). Zero-area pairs -> 0."""
    inter = pairwise_intersection(a, b)
    union = area(a)[:, None] + area(b)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def pairwise_ioa(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Intersection over the area of `b` (how much of b lies inside a);
    (M, 4) x (N, 4) -> (M, N). Matches detectron2 pairwise_ioa used for
    ignore-region tests (reference rpn.py:100, roi_heads.py:892)."""
    inter = pairwise_intersection(a, b)
    area_b = area(b)[None, :]
    return jnp.where(area_b > 0, inter / jnp.where(area_b > 0, area_b, 1.0), 0.0)


def matched_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of matched box lists, both (..., 4)
    (reference rpn.py:330-354 matched_pairwise_iou)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(a) + area(b) - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def encode_deltas(src: jnp.ndarray, target: jnp.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Box -> regression deltas (dx, dy, dw, dh), detectron2
    Box2BoxTransform.get_deltas semantics."""
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    scx = src[..., 0] + 0.5 * sw
    scy = src[..., 1] + 0.5 * sh
    tw = target[..., 2] - target[..., 0]
    th = target[..., 3] - target[..., 1]
    tcx = target[..., 0] + 0.5 * tw
    tcy = target[..., 1] + 0.5 * th
    wx, wy, ww, wh = weights
    sw = jnp.where(sw <= 0, 1e-6, sw)
    sh = jnp.where(sh <= 0, 1e-6, sh)
    dx = wx * (tcx - scx) / sw
    dy = wy * (tcy - scy) / sh
    dw = ww * jnp.log(jnp.maximum(tw, 1e-6) / sw)
    dh = wh * jnp.log(jnp.maximum(th, 1e-6) / sh)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_deltas(deltas: jnp.ndarray, boxes: jnp.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Regression deltas + source boxes -> boxes, detectron2
    Box2BoxTransform.apply_deltas semantics (incl. SCALE_CLAMP)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, SCALE_CLAMP)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
    )


def clip_boxes(boxes: jnp.ndarray, h, w) -> jnp.ndarray:
    """Clip boxes to [0, w] x [0, h] (detectron2 Boxes.clip)."""
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Mask of boxes with width and height > threshold (detectron2 Boxes.nonempty)."""
    return ((boxes[..., 2] - boxes[..., 0]) > threshold) & (
        (boxes[..., 3] - boxes[..., 1]) > threshold
    )


# ------------------------- numpy host-side versions -------------------------

def iou_np(box_a: np.ndarray, box_b: np.ndarray, ign_area_b: bool = False) -> np.ndarray:
    """Cross IoU, numpy, (M,4) x (N,4) -> (M,N); optionally ignore b's area
    (reference math_util.py:850-906 iou(mode='cross'))."""
    lt = np.maximum(box_a[:, None, :2], box_b[None, :, :2])
    rb = np.minimum(box_a[:, None, 2:4], box_b[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (box_a[:, 2] - box_a[:, 0]) * (box_a[:, 3] - box_a[:, 1])
    if ign_area_b:
        union = area_a[:, None]
    else:
        area_b = (box_b[:, 2] - box_b[:, 0]) * (box_b[:, 3] - box_b[:, 1])
        union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.where(union > 0, union, 1.0)
