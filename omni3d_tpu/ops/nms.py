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


BLOCK = 256


def _fixpoint_keep(sup, valid):
    """Greedy keep set on a (n, n) strict-upper suppression matrix via the
    antitone fixpoint iteration (see module docstring)."""

    def cond(state):
        return state[1]

    def body(state):
        keep, _ = state
        hit = (keep.astype(jnp.float32) @ sup) > 0.0
        new = valid & ~hit
        return new, jnp.any(new != keep)

    keep, _ = lax.while_loop(cond, body, (valid, jnp.bool_(True)))
    return keep


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
             valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS; returns a boolean keep mask aligned with the inputs.

    Blocked evaluation: boxes are sorted by score and processed in BLOCK-row
    chunks — an in-block fixpoint resolves the chunk's own suppression
    chains, then one (BLOCK, N) pass removes every later box overlapping the
    chunk's kept set. Exact sequential-greedy semantics at O(N^2/2) IoU work,
    without materializing the (N, N) matrix the fixpoint would otherwise
    re-read every iteration (deep suppression chains made that the single
    hottest op of the training step at 2000 RPN candidates).

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

    if n <= BLOCK:
        idx = jnp.arange(n)
        sup = (
            (box_ops.pairwise_iou(boxes_s, boxes_s) > iou_threshold)
            & (idx[:, None] < idx[None, :])
            & valid_s[:, None]
        ).astype(jnp.float32)
        keep_sorted = _fixpoint_keep(sup, valid_s)
        return keep_sorted[jnp.argsort(order)]

    pad = (-n) % BLOCK
    if pad:
        boxes_s = jnp.pad(boxes_s, ((0, pad), (0, 0)))
        valid_s = jnp.pad(valid_s, (0, pad))
    np_ = n + pad
    nb = np_ // BLOCK
    ridx = jnp.arange(BLOCK)
    cidx = jnp.arange(np_)

    def outer(i, keep):
        base = i * BLOCK
        blk = lax.dynamic_slice(boxes_s, (base, 0), (BLOCK, 4))
        keep_blk = lax.dynamic_slice(keep, (base,), (BLOCK,))
        sup = (
            (box_ops.pairwise_iou(blk, blk) > iou_threshold)
            & (ridx[:, None] < ridx[None, :])
            & keep_blk[:, None]
        ).astype(jnp.float32)
        keep_blk = _fixpoint_keep(sup, keep_blk)
        # one pass: kept rows of this block suppress every later box
        cross = box_ops.pairwise_iou(blk, boxes_s) > iou_threshold  # (BLOCK, np)
        hit = (keep_blk.astype(jnp.float32) @ cross.astype(jnp.float32)) > 0.0
        later = cidx >= base + BLOCK
        keep = keep & ~(hit & later)
        return lax.dynamic_update_slice(keep, keep_blk, (base,))

    keep_sorted = lax.fori_loop(0, nb, outer, valid_s)[:n]

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
