"""Cube R-CNN meta-architecture, TPU-native.

Functional equivalent of the reference RCNN3D
(cubercnn/modeling/meta_arch/rcnn3d.py:25-272) with the detectron2 plumbing it
inherits (preprocess/postprocess, proposal flow). Re-designed for XLA:

  * one linen module holds all parameters (backbone, FPN, RPN head, box head,
    box predictor, cube head, prior buffers),
  * the inference pipeline is a single pure function over padded static-shape
    batches — proposals, detections and cubes are fixed-size masked tensors,
  * per-image intrinsics ride through the graph as a (B, 3, 3) tensor
    (reference threads python lists of K, rcnn3d.py:50-53).
"""
from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.roi_align import multilevel_roi_align
from ..ops.roi_align_pallas import (multilevel_roi_align_pallas_batched,
                                    stage_pyramid)
from ..utils import boxes as box_ops
from . import anchors as anchor_lib
from .dla import DLA, dla_out_channels
from .fpn import FPN
from .heads import (BoxHead, CubeHead, FastRCNNPredictor, decode_cube,
                    fast_rcnn_inference, scale_proposals, select_per_class)
from .resnet import ResNet, resnet_out_channels
from .rpn import RPNHead, select_proposals

FEATURE_NAMES = ("p2", "p3", "p4", "p5", "p6")
FEATURE_STRIDES = (4, 8, 16, 32, 64)


def build_bottom_up(cfg, train: bool, dtype):
    """Backbone registry keyed by the reference builder names
    (reference rcnn3d.py:259-272 build_backbone + BACKBONE_REGISTRY)."""
    name = cfg.MODEL.BACKBONE.NAME
    if name == "build_dla_from_vision_fpn_backbone":
        variant = cfg.MODEL.DLA.TYPE
        return DLA(variant=variant, train=train, dtype=dtype), dla_out_channels(variant)
    if name == "build_resnet_from_vision_fpn_backbone":
        depth = cfg.MODEL.RESNETS.DEPTH
        return ResNet(depth=depth, train=train, dtype=dtype), resnet_out_channels(depth)
    if name == "build_densenet_fpn_backbone":
        from .extra_backbones import DenseNet121, densenet_out_channels

        return DenseNet121(train=train, dtype=dtype), densenet_out_channels()
    if name == "build_mnasnet_fpn_backbone":
        from .extra_backbones import MNASNet10, mnasnet_out_channels

        return MNASNet10(train=train, dtype=dtype), mnasnet_out_channels()
    if name == "build_shufflenet_fpn_backbone":
        from .extra_backbones import ShuffleNetV2, shufflenet_out_channels

        return ShuffleNetV2(train=train, dtype=dtype), shufflenet_out_channels()
    raise ValueError(f"Unknown backbone builder {name}")


def build_model(cfg, train_mode: bool = False):
    """Reference `build_model(cfg, priors)` analogue (rcnn3d.py:247-256).

    Returns the flax module; parameters are created separately
    (`model.init` / `engine.train.create_train_state(..., priors=...)`,
    which is where the reference's `priors` argument lands in the
    model/param split of JAX).
    """
    import jax.numpy as jnp

    from ..config.cfg import StaticCfg

    scfg = cfg if not hasattr(cfg, "clone") else StaticCfg(cfg.clone())
    dtype = (jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
             else jnp.float32)
    return CubeRCNN(cfg=scfg, train_mode=train_mode, dtype=dtype)


class CubeRCNN(nn.Module):
    """All Cube R-CNN parameters in one module.

    `priors` (dims mean/std per class, z cluster stats) become parameters,
    matching the reference which registers them as nn.Parameters
    (roi_heads.py:117-143) so they travel with checkpoints.
    """

    cfg: Any
    train_mode: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        C = cfg.MODEL.ROI_HEADS.NUM_CLASSES
        self.num_classes = C
        # MODEL.USE_BN=False freezes BN (running stats even in training) —
        # the reference's freeze_bn path (solver/build.py:73-78 applied via
        # config.py:82); without this, a train-mode model with immutable
        # batch_stats crashes in flax
        train_bn = self.train_mode and bool(cfg.MODEL.USE_BN)
        bottom_up, _ = build_bottom_up(cfg, train_bn, self.dtype)
        self.backbone = bottom_up
        self.fpn = FPN(
            in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
            out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
            fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
            dtype=self.dtype,
        )
        num_anchors = len(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0]) * len(
            cfg.MODEL.ANCHOR_GENERATOR.SIZES[0]
        )
        self.rpn_head = RPNHead(num_anchors=num_anchors, conv_dim=cfg.MODEL.FPN.OUT_CHANNELS,
                                dtype=self.dtype)
        self.box_head = BoxHead(fc_dim=cfg.MODEL.ROI_BOX_HEAD.FC_DIM,
                                num_fc=cfg.MODEL.ROI_BOX_HEAD.NUM_FC, dtype=self.dtype)
        self.box_predictor = FastRCNNPredictor(num_classes=C, dtype=self.dtype)
        self.cube_head = CubeHead(
            num_classes=C,
            pose_type=cfg.MODEL.ROI_CUBE_HEAD.POSE_TYPE,
            cluster_bins=cfg.MODEL.ROI_CUBE_HEAD.CLUSTER_BINS,
            shared_fc=cfg.MODEL.ROI_CUBE_HEAD.SHARED_FC,
            use_conf=cfg.MODEL.ROI_CUBE_HEAD.USE_CONFIDENCE > 0,
            num_fc=cfg.MODEL.ROI_CUBE_HEAD.NUM_FC,
            fc_dim=cfg.MODEL.ROI_CUBE_HEAD.FC_DIM,
            dtype=self.dtype,
        )
        # prior buffers (reference roi_heads.py:117-143)
        self.priors_dims_per_cat = self.param(
            "priors_dims_per_cat", lambda k: jnp.ones((C, 2, 3), jnp.float32)
        )
        bins = max(cfg.MODEL.ROI_CUBE_HEAD.CLUSTER_BINS, 1)
        self.priors_z_scales = self.param(
            "priors_z_scales", lambda k: jnp.ones((C, bins), jnp.float32)
        )
        self.priors_z_stats = self.param(
            "priors_z_stats", lambda k: jnp.ones((C, bins, 2), jnp.float32)
        )

    # ---- sub-forward methods (each usable via model.apply(..., method=...)) ----
    def features(self, images):
        return self.fpn(self.backbone(images))

    def rpn(self, feats: Sequence[jnp.ndarray]):
        return self.rpn_head(feats)

    def box_branch(self, pooled):
        return self.box_predictor(self.box_head(pooled))

    def cube_branch(self, pooled):
        return self.cube_head(pooled)

    def prior_params(self):
        return self.priors_dims_per_cat, self.priors_z_scales, self.priors_z_stats

    def __call__(self, images):
        # init-time touch of every submodule so init() creates all params
        feats = self.features(images)
        flist = [feats[f] for f in FEATURE_NAMES]
        self.rpn(flist)
        c = self.fpn.out_channels
        dummy = jnp.zeros((1, 7, 7, c), self.dtype)
        self.box_branch(dummy)
        self.cube_branch(dummy)
        self.prior_params()
        return feats


def preprocess(images_bgr: jnp.ndarray, pixel_mean, pixel_std) -> jnp.ndarray:
    """(B, H, W, 3) BGR uint8/float -> normalized float (reference inherits
    GeneralizedRCNN.preprocess_image; means/std configs/Base.yaml:35-36)."""
    mean = jnp.asarray(pixel_mean, jnp.float32)
    std = jnp.asarray(pixel_std, jnp.float32)
    return (images_bgr.astype(jnp.float32) - mean) / std


def inference_kwargs(cfg) -> dict:
    """Static inference knobs from the config (reference test-time keys:
    ROI_HEADS.SCORE_THRESH_TEST/NMS_THRESH_TEST, RPN.*_NMS_TOPK_TEST,
    TEST.DETECTIONS_PER_IMAGE; TPU.NMS_CANDIDATES bounds the padded
    candidate set fed to class-NMS). Pass as **inference_kwargs(cfg) to
    inference_step/inference_impl so config overrides actually take effect."""
    return dict(
        score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
        nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
        topk=cfg.TEST.DETECTIONS_PER_IMAGE,
        nms_candidates=cfg.TPU.NMS_CANDIDATES,
        pre_nms_topk=cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
        post_nms_topk=cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
        rpn_nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
        sampling_ratio=cfg.TPU.ROI_SAMPLING_RATIO,
    )


def inference_impl(params, model: CubeRCNN, images, Ks, im_scales_ratio,
                   hw=None,
                   score_thresh=0.01, nms_thresh=0.5, topk=100, nms_candidates=1024,
                   pre_nms_topk=1000, post_nms_topk=1000, rpn_nms_thresh=0.7,
                   sampling_ratio=2, oracle=None):
    """End-to-end Cube R-CNN inference on a padded batch.

    Args:
      params: model variables ({'params': ..., 'batch_stats': ...}).
      images: (B, H, W, 3) normalized BGR at network resolution.
      Ks: (B, 3, 3) ORIGINAL-resolution intrinsics.
      im_scales_ratio: (B,) original_height / network_height.
      hw: optional (B, 2) per-image net (height, width) BEFORE padding —
        proposals/detections clip to each image's own extent instead of the
        padded bucket (detectron2 clips per image; matters for mixed-size
        batches where a box could otherwise leak into a neighbor's padding).
      oracle: optional (boxes (B, K, 4) net-res, classes (B, K), valid (B, K))
        — bypasses the RPN + 2D box branch and runs only the cube branch on
        the given GT 2D boxes with score 1 (reference rcnn3d.py:98-101,
        roi_heads.py:229-240).

    Returns dict of per-image padded detections (see fast_rcnn_inference) plus
      center_cam (B,K,3), dims (B,K,3), pose (B,K,3,3), corners (B,K,8,3),
      center_2D (B,K,2 original-res), boxes_orig (B,K,4 original-res),
      fused scores (reference roi_heads.py:796-819).
    """
    cfg = model.cfg
    B, H, W, _ = images.shape
    C = cfg.MODEL.ROI_HEADS.NUM_CLASSES

    feats = model.apply(params, images, method=CubeRCNN.features)
    flist = [feats[f] for f in FEATURE_NAMES]  # stays in model dtype: pooling gathers are HBM-bound

    if oracle is not None:
        o_boxes, o_classes, o_valid = oracle
        topk = o_boxes.shape[1]
        dets = {
            "boxes": o_boxes,
            "scores": jnp.where(o_valid, 1.0, 0.0),
            "classes": o_classes.astype(jnp.int32),
            "valid": o_valid,
            "scores_full": jnp.zeros((B, topk, C), jnp.float32),
        }
        prop_boxes = o_boxes
        prop_valid = o_valid
        return _cube_branch_outputs(params, model, flist, dets, Ks,
                                    im_scales_ratio, sampling_ratio,
                                    prop_boxes, prop_valid,
                                    staged=stage_pyramid(flist))

    logits, deltas = model.apply(params, flist, method=CubeRCNN.rpn)

    anchors = [
        jnp.asarray(a)
        for a in anchor_lib.pyramid_anchors(
            [(f.shape[1], f.shape[2]) for f in flist],
            FEATURE_STRIDES,
            cfg.MODEL.ANCHOR_GENERATOR.SIZES,
            cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
            cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
        )
    ]
    image_hw = (jnp.broadcast_to(jnp.asarray([H, W], jnp.float32), (B, 2))
                if hw is None else jnp.asarray(hw, jnp.float32))

    def per_image_proposals(args):
        lg, dl, ihw = args
        return select_proposals(anchors, lg, dl, ihw, pre_nms_topk,
                                post_nms_topk, rpn_nms_thresh)

    prop_boxes, prop_scores, prop_valid = jax.vmap(per_image_proposals)(
        ([l.astype(jnp.float32) for l in logits],
         [d.astype(jnp.float32) for d in deltas], image_hw)
    )

    # ---- box branch ----
    staged = stage_pyramid(flist)  # shared with the cube pooler

    def pool_box(feats_b, boxes_b):
        # batched pallas kernel (do not vmap it: it drives its own grid)
        return multilevel_roi_align_pallas_batched(
            feats_b, boxes_b, list(FEATURE_STRIDES),
            cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION, sampling_ratio,
            out_dtype=feats_b[0].dtype, staged=staged,
            exact_routing=cfg.TPU.POOLER_EXACT_ROUTING,
        )

    pooled = pool_box(flist, prop_boxes)
    scores2d, deltas2d = model.apply(
        params, pooled.reshape(B * post_nms_topk, *pooled.shape[2:]),
        method=CubeRCNN.box_branch,
    )
    scores2d = scores2d.reshape(B, post_nms_topk, C + 1).astype(jnp.float32)
    deltas2d = deltas2d.reshape(B, post_nms_topk, C * 4).astype(jnp.float32)

    dets = jax.vmap(
        lambda s, d, b, v, ihw: fast_rcnn_inference(
            s, d, b, v, ihw, C, score_thresh, nms_thresh, topk, nms_candidates,
            tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
        )
    )(scores2d, deltas2d, prop_boxes, prop_valid, image_hw)

    return _cube_branch_outputs(params, model, flist, dets, Ks, im_scales_ratio,
                                sampling_ratio, prop_boxes, prop_valid,
                                staged=staged)


def _cube_branch_outputs(params, model, flist, dets, Ks, im_scales_ratio,
                         sampling_ratio, prop_boxes, prop_valid, staged=None):
    """Cube branch + output packing shared by normal and oracle inference."""
    cfg = model.cfg
    det_boxes = dets["boxes"]  # (B, K, 4) network-res
    B, topk = det_boxes.shape[:2]
    cube_boxes = scale_proposals(det_boxes, cfg.MODEL.ROI_CUBE_HEAD.SCALE_ROI_BOXES)
    pooled_cube = multilevel_roi_align_pallas_batched(
        flist, cube_boxes, list(FEATURE_STRIDES),
        cfg.MODEL.ROI_CUBE_HEAD.POOLER_RESOLUTION, sampling_ratio,
        out_dtype=flist[0].dtype, staged=staged,
        exact_routing=cfg.TPU.POOLER_EXACT_ROUTING,
    )
    cube_out = model.apply(
        params, pooled_cube.reshape(B * topk, *pooled_cube.shape[2:]),
        method=CubeRCNN.cube_branch,
    )
    cube_out = jax.tree.map(lambda t: t.astype(jnp.float32), cube_out)

    priors_dims, priors_z_scales, priors_z_stats = model.apply(
        params, method=CubeRCNN.prior_params
    )

    # per-box network-res intrinsics (reference roi_heads.py:374-396)
    Ks_scaled = Ks / im_scales_ratio[:, None, None]
    Ks_scaled = Ks_scaled.at[:, 2, 2].set(1.0)
    Ks_per_box = jnp.broadcast_to(Ks_scaled[:, None], (B, topk, 3, 3)).reshape(-1, 3, 3)
    fy_net = Ks_per_box[:, 1, 1]

    ch_cfg = cfg.MODEL.ROI_CUBE_HEAD
    cube = decode_cube(
        cube_out,
        dets["classes"].reshape(-1),
        det_boxes.reshape(-1, 4),
        Ks_per_box,
        fy_net,
        priors_dims,
        z_type=ch_cfg.Z_TYPE,
        virtual_depth=ch_cfg.VIRTUAL_DEPTH,
        virtual_focal=ch_cfg.VIRTUAL_FOCAL,
        dims_priors_enabled=ch_cfg.DIMS_PRIORS_ENABLED,
        dims_priors_func=ch_cfg.DIMS_PRIORS_FUNC,
        allocentric=ch_cfg.ALLOCENTRIC_POSE,
        priors_z_stats=priors_z_stats,
        priors_z_scales=priors_z_scales,
        cluster_bins=ch_cfg.CLUSTER_BINS,
    )

    def r(t, shape):
        return t.reshape((B, topk) + shape)

    conf = jnp.exp(-cube["uncert"]) if cube["uncert"] is not None else jnp.ones(B * topk)
    fused = jnp.sqrt(jnp.clip(dets["scores"] * r(conf, ()), 0.0))

    ratio = im_scales_ratio[:, None, None]
    out = {
        "boxes": det_boxes,
        "boxes_orig": dets["boxes"] * ratio,
        "scores_2d": dets["scores"],
        "scores": jnp.where(dets["valid"], fused, 0.0),
        "classes": dets["classes"],
        "valid": dets["valid"],
        "scores_full": dets["scores_full"],
        "center_cam": r(cube["center"], (3,)),
        "dims": r(cube["dims"], (3,)),
        "pose": r(cube["pose"], (3, 3)),
        "corners": r(cube["corners"], (8, 3)),
        "center_2D": r(cube["xy"], (2,)) * im_scales_ratio[:, None, None],
        "proposal_boxes": prop_boxes,
        "proposal_valid": prop_valid,
    }
    return out


inference_step = jax.jit(
    inference_impl,
    static_argnames=(
        "model", "score_thresh", "nms_thresh", "topk", "nms_candidates",
        "pre_nms_topk", "post_nms_topk", "rpn_nms_thresh", "sampling_ratio",
    ),
)
