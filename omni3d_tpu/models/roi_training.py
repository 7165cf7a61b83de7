"""Training-time ROI logic: proposal labeling/sampling and 2D/3D losses.

Static-shape re-design of the reference training halves:
  * label_and_sample_proposals with ignore regions + IoU-weighted multinomial
    (reference roi_heads.py:826-929) — padded proposals + GT, Gumbel-top-k
    sampling, fixed 512 sampled slots with foreground compacted to the front,
  * FastRCNN classification/regression losses (reference fast_rcnn.py:145-260),
  * the disentangled cuboid corner losses with chamfer pose and uncertainty
    scaling (reference roi_heads.py:527-768).

Every reduction is a masked mean/sum over fixed-size tensors; the reference's
`safely_reduce_losses` NaN/Inf filtering (roi_heads.py:932-940) is reproduced
with masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..utils import boxes as box_ops
from ..utils import geometry as G
from .rpn import NEG_INF, gumbel_topk_mask, smooth_l1

SQRT_2 = 1.41421356
E_CONSTANT = 2.71828183
GT_LOGIT = 23.02585  # log((1-1e-10)/1e-10), detectron2 add_ground_truth_to_proposals


def label_and_sample_proposals(rng, proposals, proposal_valid, gt_boxes, gt_classes,
                               gt_valid, num_classes: int, batch_size: int = 512,
                               positive_fraction: float = 0.25,
                               iou_thresh: float = 0.5, ignore_thresh: float = 0.5,
                               append_gt: bool = True, eps: float = 1e-4):
    """Single-image proposal labeling and sampling.

    Args:
      proposals: (P, 4); proposal_valid: (P,).
      gt_boxes: (Gmax, 4) padded; gt_classes: (Gmax,) with -1 rows = ignore
        regions; gt_valid: (Gmax,).

    Returns dict (S = batch_size slots, foreground compacted first):
      idx (S,) int32 into the (P+Gmax) candidate list,
      boxes (S, 4) candidate boxes,
      classes (S,) in [0, num_classes] (bg = num_classes),
      gt_idx (S,) matched gt row,
      fg (S,) bool, valid (S,) bool, num_fg scalar.
    """
    is_ignore_gt = gt_valid & (gt_classes < 0)
    is_real_gt = gt_valid & (gt_classes >= 0)

    if append_gt:
        cand_boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
        cand_valid = jnp.concatenate([proposal_valid, is_real_gt], axis=0)
    else:
        cand_boxes, cand_valid = proposals, proposal_valid
    N = cand_boxes.shape[0]

    iou = box_ops.pairwise_iou(jnp.where(is_real_gt[:, None], gt_boxes, 0.0), cand_boxes)
    iou = jnp.where(is_real_gt[:, None], iou, -1.0)
    matched_idx = jnp.argmax(iou, axis=0).astype(jnp.int32)
    matched_iou = jnp.maximum(jnp.max(iou, axis=0), 0.0)
    has_gt = jnp.any(is_real_gt)

    fg = (matched_iou >= iou_thresh) & cand_valid & has_gt
    classes = jnp.where(fg, gt_classes[matched_idx], num_classes)

    # ignore regions: background candidates covered by an ignore gt -> dropped
    ioa = box_ops.pairwise_ioa(jnp.where(is_ignore_gt[:, None], gt_boxes, 0.0), cand_boxes)
    ioa = jnp.where(is_ignore_gt[:, None], ioa, 0.0)
    in_ignore = jnp.max(ioa, axis=0) >= ignore_thresh
    bg = (~fg) & cand_valid & ~in_ignore

    # IoU-weighted sampling (reference rpn.py:275-328 via roi_heads.py:855)
    rng_pos, rng_neg = jax.random.split(rng)
    max_pos = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(fg), max_pos)
    num_neg = jnp.minimum(jnp.sum(bg), batch_size - num_pos)
    logw = jnp.log(matched_iou + eps)
    pos_sel = gumbel_topk_mask(rng_pos, logw, num_pos, fg, max_k=max_pos)
    neg_sel = gumbel_topk_mask(rng_neg, logw, num_neg, bg, max_k=batch_size)

    # compact: positives first, then negatives, then the rest
    key = jnp.where(pos_sel, 2.0, jnp.where(neg_sel, 1.0, 0.0))
    order = jnp.argsort(-key, stable=True)
    take = min(batch_size, N)
    idx = order[:take].astype(jnp.int32)
    if take < batch_size:  # fewer candidates than sample slots: pad
        idx = jnp.pad(idx, (0, batch_size - take))
    slot = jnp.arange(batch_size)
    out_fg = slot < num_pos
    out_valid = slot < (num_pos + num_neg)

    return {
        "idx": idx,
        "boxes": cand_boxes[idx],
        "classes": jnp.where(out_valid, classes[idx], num_classes).astype(jnp.int32),
        "gt_idx": matched_idx[idx],
        "fg": out_fg,
        "valid": out_valid,
        "num_fg": num_pos,
    }


def fast_rcnn_losses(scores, deltas, sampled_boxes, sampled_classes, sampled_valid,
                     gt_boxes_matched, num_classes: int,
                     bbox_reg_weights=(10.0, 10.0, 5.0, 5.0)):
    """FastRCNN losses (reference fast_rcnn.py:145-260), masked static form.

    Args:
      scores: (S, C+1) logits; deltas: (S, C*4).
      sampled_*: outputs of label_and_sample_proposals for this image/batch
        flattened to (S, ...); gt_boxes_matched: (S, 4).
    """
    S = scores.shape[0]
    valid = sampled_valid
    norm = jnp.maximum(jnp.sum(valid), 1.0)

    # cross entropy, mean over valid sampled (bg included)
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, sampled_classes[:, None], axis=1).squeeze(1)
    loss_cls = jnp.sum(jnp.where(valid, ce, 0.0)) / norm

    # per-class box regression on foreground, sum / total sampled
    fg = valid & (sampled_classes < num_classes)
    cls_safe = jnp.minimum(sampled_classes, num_classes - 1)
    fg_deltas = jnp.take_along_axis(
        deltas.reshape(S, num_classes, 4), cls_safe[:, None, None], axis=1
    ).squeeze(1)
    gt_deltas = box_ops.encode_deltas(sampled_boxes, gt_boxes_matched, bbox_reg_weights)
    reg = smooth_l1(fg_deltas, lax.stop_gradient(gt_deltas)).sum(-1)
    loss_reg = jnp.sum(jnp.where(fg, reg, 0.0)) / norm
    return {"BoxHead/loss_cls": loss_cls, "BoxHead/loss_box_reg": loss_reg}


def l1_corner_loss(pred_corners, gt_corners):
    """Mean |.| over the 24 corner coordinates per box (roi_heads.py:295-296)."""
    return jnp.abs(pred_corners - gt_corners).reshape(pred_corners.shape[0], -1).mean(-1)


def chamfer_corner_loss(pred_corners, gt_corners):
    """Symmetric L1 chamfer over the 8 corners (roi_heads.py:298-304)."""
    d = jnp.abs(pred_corners[:, :, None, :] - gt_corners[:, None, :, :]).sum(-1)
    return d.min(axis=1).mean(-1) + d.min(axis=2).mean(-1)


def masked_mean(x, mask):
    """safely_reduce_losses (roi_heads.py:932-940): mean over valid & finite."""
    ok = mask & jnp.isfinite(x)
    denom = jnp.sum(ok)
    s = jnp.sum(jnp.where(ok, x, 0.0))
    return jnp.where(denom > 0, s / jnp.maximum(denom, 1), 0.0)


def cube_losses(cube, fg_mask, gt_boxes3D, gt_poses, Ks_scaled, cfg_head,
                src_boxes):
    """Disentangled 3D losses (reference roi_heads.py:527-768).

    Args:
      cube: decode_cube output for the fg slots (already per-class selected):
        xy, z, z_norm, dims, dims_norm, pose (egocentric), pose_allo, uncert,
        virtual_to_real, deltas.
      fg_mask: (F,) valid foreground slots.
      gt_boxes3D: (F, 6) [u, v, z, w, h, l] (projected center, depth, dims).
      gt_poses: (F, 3, 3) egocentric GT rotations.
      Ks_scaled: (F, 3, 3) network-res intrinsics.
      cfg_head: StaticCfg MODEL.ROI_CUBE_HEAD node.
      src_boxes: (F, 4) proposal boxes (2D delta reference frame).

    Returns (losses dict, metrics dict).
    """
    gt_2d = gt_boxes3D[:, :2]
    gt_z = gt_boxes3D[:, 2]
    gt_dims = gt_boxes3D[:, 3:6]

    fx, fy = Ks_scaled[:, 0, 0], Ks_scaled[:, 1, 1]
    sx, sy = Ks_scaled[:, 0, 2], Ks_scaled[:, 1, 2]

    def backproject(u, v, z):
        return jnp.stack([z * (u - sx) / fx, z * (v - sy) / fy, z], axis=-1)

    gt_3d = backproject(gt_2d[:, 0], gt_2d[:, 1], gt_z)
    gt_box3d = jnp.concatenate([gt_3d, gt_dims], axis=-1)
    gt_corners = G.cuboid_verts(gt_box3d, gt_poses)

    x, y = cube["xy"][:, 0], cube["xy"][:, 1]
    z = cube["z"]
    dims = cube["dims"]
    pose = cube["pose"]

    if cfg_head.DISENTANGLED_LOSS:
        # disentangled substitutions (roi_heads.py:567-603)
        dis_z = jnp.concatenate([backproject(gt_2d[:, 0], gt_2d[:, 1], z), gt_dims], -1)
        loss_z = l1_corner_loss(G.cuboid_verts(dis_z, gt_poses), gt_corners)

        dis_xy = jnp.concatenate([backproject(x, y, gt_z), gt_dims], -1)
        loss_xy = l1_corner_loss(G.cuboid_verts(dis_xy, gt_poses), gt_corners)

        dis_dims = jnp.concatenate([gt_3d, dims], -1)
        loss_dims = l1_corner_loss(G.cuboid_verts(dis_dims, gt_poses), gt_corners)

        pose_corners = G.cuboid_verts(gt_box3d, pose)
        if cfg_head.CHAMFER_POSE:
            loss_pose = chamfer_corner_loss(pose_corners, gt_corners)
        else:
            loss_pose = l1_corner_loss(pose_corners, gt_corners)
    else:
        # non-disentangled variants (roi_heads.py:606-649)
        sw = src_boxes[:, 2] - src_boxes[:, 0]
        sh = src_boxes[:, 3] - src_boxes[:, 1]
        scx = src_boxes[:, 0] + 0.5 * sw
        scy = src_boxes[:, 1] + 0.5 * sh
        gt_deltas = (gt_2d - jnp.stack([scx, scy], -1)) / jnp.stack(
            [jnp.maximum(sw, 1e-6), jnp.maximum(sh, 1e-6)], -1
        )
        loss_xy = jnp.abs(cube["deltas"] - gt_deltas).mean(-1)

        if cfg_head.DIMS_PRIORS_ENABLED:
            # dims_norm compared to log(gt/prior_mean) (roi_heads.py:620-622)
            prior_mean = dims / jnp.exp(jnp.clip(cube["dims_norm"], None, 5.0))
            tgt = jnp.log(jnp.maximum(gt_dims, 1e-6) / jnp.maximum(prior_mean, 1e-6))
            loss_dims = jnp.abs(cube["dims_norm"] - tgt).mean(-1)
        else:
            loss_dims = jnp.abs(
                cube["dims_norm"] - jnp.log(jnp.maximum(gt_dims, 1e-6))
            ).mean(-1)

        if cfg_head.ALLOCENTRIC_POSE:
            gt_allo = G.R_to_allocentric(
                Ks_scaled, gt_poses, lax.stop_gradient(x), lax.stop_gradient(y)
            )
            loss_pose = 1.0 - G.so3_relative_angle(
                cube["pose_allo"], gt_allo, eps=0.1, cos_angle=True
            )
        else:
            loss_pose = 1.0 - G.so3_relative_angle(pose, gt_poses, eps=0.1, cos_angle=True)

        r2v = 1.0 / jnp.maximum(cube["virtual_to_real"], 1e-8)
        zt = cfg_head.Z_TYPE
        if zt == "direct":
            loss_z = jnp.abs(z - gt_z)
        elif zt == "sigmoid":
            loss_z = jnp.abs(cube["z_norm"] - jnp.clip(gt_z * r2v / 100.0, 0, 1))
        elif zt == "log":
            loss_z = jnp.abs(cube["z_norm"] - jnp.log(jnp.clip(gt_z * r2v, 0.01)))
        else:  # clusters: raw logit vs standardized virtual depth
            # (reference roi_heads.py:648-649: ((gt_z*r2v) - z_mean) / z_std)
            z_std = jnp.maximum(jnp.abs(cube["z_std"]), 1e-6)
            loss_z = jnp.abs(cube["z_norm"] - (gt_z * r2v - cube["z_mean"]) / z_std)

    losses = {}
    metrics = {}
    w3d = cfg_head.LOSS_W_3D

    # joint entangled loss (roi_heads.py:665-683)
    loss_joint = None
    if cfg_head.LOSS_W_JOINT > 0:
        joint_box = jnp.concatenate([backproject(x, y, z), dims], -1)
        joint_corners = G.cuboid_verts(joint_box, pose)
        if cfg_head.CHAMFER_POSE and cfg_head.DISENTANGLED_LOSS:
            loss_joint = chamfer_corner_loss(joint_corners, gt_corners)
        else:
            loss_joint = l1_corner_loss(joint_corners, gt_corners)

    # inverse-z weighting (roi_heads.py:697-719)
    if cfg_head.INVERSE_Z_WEIGHT:
        inv_w = 1.0 / jnp.log(jnp.clip(gt_z, E_CONSTANT, None))
        loss_xy, loss_z = loss_xy * inv_w, loss_z * inv_w
        loss_dims, loss_pose = loss_dims * inv_w, loss_pose * inv_w
        if loss_joint is not None:
            loss_joint = loss_joint * inv_w

    # uncertainty scaling (roi_heads.py:721-740)
    if cube["uncert"] is not None and cfg_head.USE_CONFIDENCE > 0:
        u = cube["uncert"]
        sf = SQRT_2 * jnp.exp(-u)
        loss_xy, loss_z = loss_xy * sf, loss_z * sf
        loss_dims, loss_pose = loss_dims * sf, loss_pose * sf
        if loss_joint is not None:
            loss_joint = loss_joint * sf
        losses["Cube/uncert"] = cfg_head.USE_CONFIDENCE * masked_mean(u, fg_mask)
        metrics["Cube/conf"] = masked_mean(jnp.exp(-u), fg_mask)

    losses["Cube/loss_dims"] = masked_mean(loss_dims, fg_mask) * cfg_head.LOSS_W_DIMS * w3d
    losses["Cube/loss_xy"] = masked_mean(loss_xy, fg_mask) * cfg_head.LOSS_W_XY * w3d
    losses["Cube/loss_z"] = masked_mean(loss_z, fg_mask) * cfg_head.LOSS_W_Z * w3d
    losses["Cube/loss_pose"] = masked_mean(loss_pose, fg_mask) * cfg_head.LOSS_W_POSE * w3d
    if loss_joint is not None:
        losses["Cube/loss_joint"] = masked_mean(loss_joint, fg_mask) * cfg_head.LOSS_W_JOINT * w3d

    metrics["Cube/z_error"] = masked_mean(jnp.abs(z - gt_z), fg_mask)
    metrics["Cube/dims_error"] = masked_mean(jnp.abs(dims - gt_dims).mean(-1), fg_mask)
    metrics["Cube/xy_error"] = masked_mean(
        jnp.abs(cube["xy"] - gt_2d).mean(-1), fg_mask
    )
    metrics["Cube/z_close"] = masked_mean((jnp.abs(z - gt_z) < 0.2).astype(jnp.float32), fg_mask)
    return losses, metrics
