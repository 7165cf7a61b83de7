"""Detection heads: 2D box head/predictor and the 3D cube head.

TPU-native equivalents of:
  * detectron2 FastRCNNConvFCHead + FastRCNNOutputLayers as bound by the
    reference (cubercnn/modeling/roi_heads/fast_rcnn.py:16-260, SURVEY §2.2),
  * the reference CubeHead (cubercnn/modeling/roi_heads/cube_head.py:19-197)
    and the cube decode logic of ROIHeads3D._forward_cube
    (cubercnn/modeling/roi_heads/roi_heads.py:326-525).

All per-class selection (`cube_z[i, class_i]` style indexing) is done with
`take_along_axis` on padded tensors — no dynamic shapes.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..utils import boxes as box_ops
from ..utils import geometry as G
from ..ops import nms as nms_ops

NEG_INF = -1e10


class BoxHead(nn.Module):
    """FastRCNNConvFCHead with NUM_FC=2: flatten -> fc1 -> relu -> fc2 -> relu."""

    fc_dim: int = 1024
    num_fc: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fc):
            x = nn.Dense(self.fc_dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc{i + 1}")(x)
            x = nn.relu(x)
        return x


class FastRCNNPredictor(nn.Module):
    """cls_score (C+1) + per-class bbox_pred (C*4)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          param_dtype=jnp.float32, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          param_dtype=jnp.float32, name="bbox_pred")(x)
        return scores, deltas


def fast_rcnn_inference(scores, deltas, proposal_boxes, proposal_valid, image_hw,
                        num_classes: int, score_thresh: float = 0.01,
                        nms_thresh: float = 0.5, topk: int = 100,
                        nms_candidates: int = 1024,
                        bbox_reg_weights=(10.0, 10.0, 5.0, 5.0)):
    """Static-shape fast_rcnn_inference_single_image (reference
    fast_rcnn.py:57-116): score threshold -> per-class NMS -> top-k.

    Args (single image):
      scores: (P, C+1) raw logits; deltas: (P, C*4); proposal_boxes: (P, 4).
    Returns dict of fixed-size detections:
      boxes (K, 4), scores (K,), classes (K,), valid (K,),
      scores_full (K, C) softmax row of each kept detection,
      all padded to K = topk.
    """
    P = scores.shape[0]
    probs = jax.nn.softmax(scores, axis=-1)[:, :num_classes]  # drop background
    # Decode is written over ALL P*C boxes, but only the top-k gather below
    # consumes it: XLA pushes the 1024-row gather through the elementwise
    # decode (gather-of-elementwise -> elementwise-of-gather), so the
    # compiled graph decodes only the survivors. A hand-written lazy decode
    # (gather 4-wide delta rows by top_idx, then decode k boxes) measured
    # +2.0 ms SLOWER end-to-end at bs=32 (r5 A/B) — the explicit (P*C, 4)
    # reshape+gather has a 4/128-lane layout XLA's pushed-down form avoids.
    # Keep the vectorized form and let the compiler specialize it.
    boxes_pc = box_ops.decode_deltas(
        deltas.reshape(P, num_classes, 4),
        proposal_boxes[:, None, :],
        bbox_reg_weights,
    )
    boxes_pc = box_ops.clip_boxes(boxes_pc, image_hw[0], image_hw[1])

    cand_scores = jnp.where(proposal_valid[:, None], probs, 0.0)
    flat_scores = cand_scores.reshape(-1)
    flat_mask = flat_scores > score_thresh

    k = min(nms_candidates, flat_scores.shape[0])
    top_scores, top_idx = lax.top_k(jnp.where(flat_mask, flat_scores, NEG_INF), k)
    cand_valid = top_scores > NEG_INF / 2
    prop_idx = top_idx // num_classes
    cls_idx = top_idx % num_classes
    cand_boxes = boxes_pc.reshape(-1, 4)[top_idx]

    keep_idx, keep_valid = nms_ops.batched_nms_indices(
        cand_boxes, top_scores, cls_idx, nms_thresh, topk, cand_valid
    )
    det_boxes = cand_boxes[keep_idx]
    det_scores = jnp.where(keep_valid, top_scores[keep_idx], 0.0)
    det_classes = jnp.where(keep_valid, cls_idx[keep_idx], 0)
    det_scores_full = probs[prop_idx[keep_idx]]
    return {
        "boxes": det_boxes,
        "scores": det_scores,
        "classes": det_classes.astype(jnp.int32),
        "valid": keep_valid,
        "scores_full": det_scores_full,
    }


def scale_proposals(boxes: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Zoom RoIs about their centers before cube pooling
    (reference roi_heads.py:306-324 scale_proposals; the reference computes
    heights from the x-extent — an apparent bug we do not reproduce since the
    option defaults off)."""
    if factor <= 0:
        return boxes
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w = (boxes[..., 2] - boxes[..., 0]) * factor * 0.5
    h = (boxes[..., 3] - boxes[..., 1]) * factor * 0.5
    return jnp.stack([cx - w, cy - h, cx + w, cy + h], axis=-1)


class CubeHead(nn.Module):
    """3D cuboid regression head (reference cube_head.py:19-197).

    Shared (or per-branch) 2xFC-1024 trunk + per-class linear outputs:
    2D center deltas (C*2), dims (C*3), pose (C*6|4|3 -> rotation matrices),
    depth (C*bins), uncertainty (C, clipped >= 0.01).
    """

    num_classes: int
    pose_type: str = "6d"
    cluster_bins: int = 1
    shared_fc: bool = True
    use_conf: bool = True
    num_fc: int = 2
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    def _trunk(self, x, name):
        for i in range(self.num_fc):
            x = nn.Dense(self.fc_dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"{name}_fc{i + 1}")(x)
            x = nn.relu(x)
        return x

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        C = self.num_classes
        x = x.reshape(n, -1)

        if self.shared_fc:
            feat = self._trunk(x, "feature_generator")
            f_xy = f_dims = f_pose = f_z = f_conf = feat
        else:
            f_xy = self._trunk(x, "feature_generator_XY")
            f_dims = self._trunk(x, "feature_generator_dims")
            f_pose = self._trunk(x, "feature_generator_pose")
            f_z = self._trunk(x, "feature_generator_Z")
            f_conf = self._trunk(x, "feature_generator_conf") if self.use_conf else None

        small = nn.initializers.normal(0.001)
        deltas = nn.Dense(C * 2, kernel_init=small, dtype=self.dtype,
                          param_dtype=jnp.float32, name="bbox_3D_center_deltas")(f_xy)
        dims = nn.Dense(C * 3, kernel_init=small, dtype=self.dtype,
                        param_dtype=jnp.float32, name="bbox_3D_dims")(f_dims)
        pose_dim = {"6d": 6, "quaternion": 4, "euler": 3}[self.pose_type]
        pose_raw = nn.Dense(C * pose_dim, kernel_init=small, dtype=self.dtype,
                            param_dtype=jnp.float32, name="bbox_3D_pose")(f_pose)
        bins = max(self.cluster_bins, 1)
        z = nn.Dense(C * bins, kernel_init=small, dtype=self.dtype,
                     param_dtype=jnp.float32, name="bbox_3D_center_depth")(f_z)

        uncert = None
        if self.use_conf:
            uncert = nn.Dense(
                C, kernel_init=small, bias_init=nn.initializers.constant(5.0),
                dtype=self.dtype, param_dtype=jnp.float32, name="bbox_3D_uncertainty",
            )(f_conf)
            uncert = jnp.clip(uncert, 0.01)

        # pose parametrization -> rotation matrices
        p = pose_raw.reshape(n * C, pose_dim).astype(jnp.float32)
        if self.pose_type == "6d":
            R = G.rotation_6d_to_matrix(p)
        elif self.pose_type == "quaternion":
            R = G.quaternion_to_matrix(G.normalize_quaternion(p))
        else:
            R = G.euler_angles_to_matrix(p, "XYZ")
        R = R.reshape(n, C, 3, 3)

        deltas = deltas.reshape(n, C, 2)
        dims = dims.reshape(n, C, 3)
        if self.cluster_bins > 1:
            z = z.reshape(n, self.cluster_bins, C)
        else:
            z = z.reshape(n, C)
        return deltas, z, dims, R, uncert


def select_per_class(t: jnp.ndarray, classes: jnp.ndarray) -> jnp.ndarray:
    """t[i, classes[i], ...] for t of shape (N, C, ...)."""
    idx = classes.reshape(classes.shape[0], *([1] * (t.ndim - 1)))
    return jnp.take_along_axis(t, idx, axis=1).squeeze(1)


def decode_cube(outputs, classes, src_boxes, Ks_scaled, fy_net, priors_dims,
                z_type: str = "direct", virtual_depth: bool = True,
                virtual_focal: float = 512.0, dims_priors_enabled: bool = True,
                dims_priors_func: str = "exp", allocentric: bool = True,
                priors_z_stats=None, priors_z_scales=None, cluster_bins: int = 1):
    """Decode raw cube-head outputs into camera-space cuboids.

    Vectorized equivalent of roi_heads.py:426-525 for one image worth of
    padded boxes.

    Args:
      outputs: (deltas (N,C,2), z, dims (N,C,3), pose (N,C,3,3), uncert (N,C)).
      classes: (N,) int — class per box.
      src_boxes: (N, 4) boxes the 2D deltas are relative to.
      Ks_scaled: (N, 3, 3) intrinsics at network resolution.
      fy_net: (N,) focal length (network resolution pixels).
      priors_dims: (C, 2, 3) per-class dims mean/std.

    Returns dict: xy (N,2 net-res), z (N,), dims (N,3), pose (N,3,3) egocentric,
      pose_allo (N,3,3), uncert (N,), x3d/y3d backprojected center (N,3),
      corners (N,8,3), z_norm & dims_norm (pre-decode, for losses),
      virtual_to_real (N,).
    """
    deltas_all, z_all, dims_all, pose_all, uncert_all = outputs
    n = classes.shape[0]

    deltas = select_per_class(deltas_all, classes)
    dims_norm = select_per_class(dims_all, classes)
    pose = select_per_class(pose_all, classes)
    uncert = select_per_class(uncert_all, classes) if uncert_all is not None else None

    w = src_boxes[:, 2] - src_boxes[:, 0]
    h = src_boxes[:, 3] - src_boxes[:, 1]
    cx = src_boxes[:, 0] + 0.5 * w
    cy = src_boxes[:, 1] + 0.5 * h
    x = cx + w * deltas[:, 0]
    y = cy + h * deltas[:, 1]
    xy = jnp.stack([x, y], axis=-1)

    # depth bin selection by 2D scale proximity (roi_heads.py:432-442)
    if cluster_bins > 1:
        scales = jnp.sqrt(h**2 + w**2)
        # priors_z_scales: (C, B); assignment per (box, class of box)
        pz = priors_z_scales[classes]  # (N, B)
        assign = jnp.argmin(jnp.abs(pz - scales[:, None]), axis=1)  # (N,)
        z_cls = z_all[:, :, :]  # (N, B, C)
        z_sel = jnp.take_along_axis(z_cls, classes[:, None, None], axis=2).squeeze(2)  # (N, B)
        z_raw = jnp.take_along_axis(z_sel, assign[:, None], axis=1).squeeze(1)
    else:
        z_raw = select_per_class(z_all, classes)
        assign = None

    # dims decode (roi_heads.py:465-483)
    if dims_priors_enabled:
        prior = priors_dims[classes]  # (N, 2, 3)
        p_mean, p_std = prior[:, 0], prior[:, 1]
        if dims_priors_func == "sigmoid":
            lo = jnp.clip(p_mean - 3 * p_std, 0.0)
            hi = p_mean + 3 * p_std
            dims = G.scaled_sigmoid(dims_norm, lo, hi)
        else:
            dims = jnp.exp(jnp.clip(dims_norm, None, 5.0)) * p_mean
    else:
        dims = jnp.exp(jnp.clip(dims_norm, None, 5.0))

    # allocentric -> egocentric (roi_heads.py:485-489)
    pose_allo = pose
    if allocentric:
        pose = G.R_from_allocentric(
            Ks_scaled, pose_allo, lax.stop_gradient(x), lax.stop_gradient(y)
        )

    # z decode (roi_heads.py:491-522)
    z_norm = z_raw
    z_mean = z_std = None
    if z_type == "sigmoid":
        z_norm = jax.nn.sigmoid(z_raw)
        z = z_norm * 100.0
    elif z_type == "log":
        z = jnp.exp(z_raw)
    elif z_type == "clusters":
        # cluster stats are parameters but never learned (reference detaches
        # them, roi_heads.py:509-511)
        zm = lax.stop_gradient(priors_z_stats)[classes]  # (N, B, 2)
        z_mean = jnp.take_along_axis(zm[..., 0], assign[:, None], axis=1).squeeze(1)
        z_std = jnp.take_along_axis(zm[..., 1], assign[:, None], axis=1).squeeze(1)
        z = G.scaled_sigmoid(z_raw, jnp.clip(z_mean - 3 * z_std, 0.0), z_mean + 3 * z_std)
    else:
        z = z_raw

    if virtual_depth:
        virtual_to_real = fy_net / virtual_focal
        z = z * virtual_to_real
    else:
        virtual_to_real = jnp.ones_like(z)

    # backproject (roi_heads.py:778-780)
    fx, fy = Ks_scaled[:, 0, 0], Ks_scaled[:, 1, 1]
    sx, sy = Ks_scaled[:, 0, 2], Ks_scaled[:, 1, 2]
    x3d = z * (x - sx) / fx
    y3d = z * (y - sy) / fy
    center = jnp.stack([x3d, y3d, z], axis=-1)
    corners = G.cuboid_verts(jnp.concatenate([center, dims], axis=-1), pose)

    return {
        "xy": xy,
        "z": z,
        "z_norm": z_norm,
        "dims": dims,
        "dims_norm": dims_norm,
        "pose": pose,
        "pose_allo": pose_allo,
        "uncert": uncert,
        "center": center,
        "corners": corners,
        "virtual_to_real": virtual_to_real,
        "deltas": deltas,
        "bin_assign": assign,
        "z_mean": z_mean,
        "z_std": z_std,
    }
