"""Fixed-shape greedy NMS for TPU.

TPU-native replacement for torchvision's CUDA `nms` / detectron2 `batched_nms`
(reference binding sites: cubercnn/modeling/roi_heads/fast_rcnn.py:105,
meta_arch/rcnn3d.py:207, and detectron2 find_top_rpn_proposals; SURVEY §2.3 N2).

Exact sequential-greedy semantics are preserved (a box is suppressed only by a
*kept* higher-scoring box), but over padded, static-size inputs: callers pass
score = -inf (or valid=False) for padding and get back a fixed-size keep set.

A naive greedy pass is an N-step sequential loop — latency death on TPU
(~10us/step control overhead x 1000 candidates). Instead we iterate the
self-suppression fixpoint: with K the candidate keep set and S the strict
upper-triangular (score-ordered) overlap matrix,

    F(K)_i = valid_i and not exists j<i: K_j and IoU(j,i) > t.

The greedy solution is the unique fixpoint of F; F is antitone, and induction
over score rank shows iterate m is already exact for every box whose
suppression-chain depth is <= m, so a while_loop on "changed" terminates in
O(chain depth) iterations (single digits on real detections, N worst case).
Each iteration is one (1,N)x(N,N) matvec — MXU work, no serial scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..utils import boxes as box_ops

NEG_INF = -1e10


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
             valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS; returns a boolean keep mask aligned with the inputs.

    Args:
      boxes: (N, 4) XYXY.
      scores: (N,). Padding rows should carry score <= NEG_INF or valid=False.
      iou_threshold: suppress boxes with IoU > threshold vs a kept box.
      valid: optional (N,) bool; invalid rows are never kept.
    """
    n = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)

    order = jnp.argsort(-scores)  # descending, stable
    boxes_s = jnp.take(boxes, order, axis=0)
    valid_s = scores[order] > NEG_INF / 2

    iou = box_ops.pairwise_iou(boxes_s, boxes_s)
    idx = jnp.arange(n)
    # S[j, i]: higher-scored valid j suppresses i when kept
    sup = (
        (iou > iou_threshold)
        & (idx[:, None] < idx[None, :])
        & valid_s[:, None]
    ).astype(jnp.float32)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        keep, _ = state
        hit = (keep.astype(jnp.float32) @ sup) > 0.0
        new = valid_s & ~hit
        return new, jnp.any(new != keep)

    keep_sorted, _ = lax.while_loop(cond, body, (valid_s, jnp.bool_(True)))

    # back to input order via the inverse permutation (argsort of argsort:
    # TPU scatters serialize and are ~1000x slower than a second sort)
    inv = jnp.argsort(order)
    return keep_sorted[inv]


def nms_indices(boxes, scores, iou_threshold, max_out: int,
                valid=None):
    """Greedy NMS returning the top `max_out` kept indices in score order.

    Returns (indices (max_out,) int32, keep_valid (max_out,) bool). Padding
    slots point at index 0 with keep_valid False.
    """
    n = boxes.shape[0]
    keep = nms_mask(boxes, scores, iou_threshold, valid)
    masked = jnp.where(keep, scores, NEG_INF)
    k = min(max_out, n)
    top_scores, top_idx = lax.top_k(masked, k)
    out_valid = top_scores > NEG_INF / 2
    top_idx = jnp.where(out_valid, top_idx, 0)
    if k < max_out:
        top_idx = jnp.pad(top_idx, (0, max_out - k))
        out_valid = jnp.pad(out_valid, (0, max_out - k))
    return top_idx.astype(jnp.int32), out_valid


def batched_nms_mask(boxes, scores, idxs, iou_threshold, valid=None):
    """Class/level-aware NMS via the coordinate-offset trick
    (detectron2 batched_nms): boxes of different `idxs` never suppress
    each other. Shapes as `nms_mask`, idxs (N,) int."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold, valid)


def batched_nms_indices(boxes, scores, idxs, iou_threshold, max_out, valid=None):
    """Class/level-aware NMS returning top `max_out` kept indices."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_indices(shifted, scores, iou_threshold, max_out, valid)
