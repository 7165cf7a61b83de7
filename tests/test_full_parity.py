"""Full-model forward parity: converted reference weights reproduce the torch
stack end-to-end, pre-NMS.

Chain checked (VERDICT r2 task 3): backbone -> FPN -> RPN logits/deltas ->
multilevel ROIAlign pooled features -> box head/predictor -> cube head raw
outputs, each compared at fp32 tolerance against independent torch fixtures
(tests/torch_full_model.py) carrying the SAME state dict through
`convert_reference_checkpoint`. Boxes are fixed (NMS bypassed) so the
comparison is deterministic.

This is the strongest checkpoint-fidelity proxy available without a real
reference .pth in this environment: if a real checkpoint's tensors load, the
network computes what the reference computes.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from omni3d_tpu.config.cfg import StaticCfg
from omni3d_tpu.config.defaults import get_default_cfg
from omni3d_tpu.models.rcnn3d import CubeRCNN, FEATURE_NAMES, FEATURE_STRIDES
from omni3d_tpu.ops.roi_align import multilevel_roi_align
from omni3d_tpu.utils import checkpoint as ckpt

from test_pretrained import cubercnn_head_state_dict, DLA_CH, RESNET34_CH
from torch_full_model import (TorchBoxHead, TorchCubeHead, TorchFPN,
                              TorchPredictor, TorchRPNHead, load_prefixed,
                              multilevel_pool_oracle)

C = 3
# Fixed RoIs on a 128x128 image chosen to span FPN levels 2..6 (level =
# floor(4 + log2(sqrt(area)/224)), so large boxes may exceed the image —
# ROIAlignV2 zero-pads outside samples).
BOXES = np.array(
    [
        [4.0, 4.0, 28.0, 30.0],      # level 2
        [10.0, 8.0, 80.0, 90.0],     # level 2
        [0.0, 0.0, 126.0, 126.0],    # level 3
        [0.0, 0.0, 250.0, 260.0],    # level 4
        [-5.0, 3.0, 500.0, 480.0],   # level 5
        [0.0, 0.0, 950.0, 900.0],    # level 6
    ],
    np.float32,
)


def _full_state_dict(backbone_sd: dict, ch_map) -> dict:
    sd = {"backbone.bottom_up." + k: v for k, v in backbone_sd.items()}
    sd.update(cubercnn_head_state_dict(C, np.random.default_rng(7), ch_map=ch_map))
    return sd


def _flax_forward(cfg, sd, x_nchw):
    model = CubeRCNN(cfg=StaticCfg(cfg))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    new_p, new_s, report = ckpt.convert_reference_checkpoint(
        sd, variables["params"], variables["batch_stats"], strict=False
    )
    assert report["missing"] == ["roi_heads.priors_z_stats"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]
    v = {"params": new_p, "batch_stats": new_s}

    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    feats = model.apply(v, x, method=CubeRCNN.features)
    flist = [feats[f] for f in FEATURE_NAMES]
    logits, deltas = model.apply(v, flist, method=CubeRCNN.rpn)
    pooled = multilevel_roi_align(
        [f[0] for f in flist], jnp.asarray(BOXES), list(FEATURE_STRIDES), 7, 0
    )
    scores2d, deltas2d = model.apply(v, pooled, method=CubeRCNN.box_branch)
    cube = model.apply(v, pooled, method=CubeRCNN.cube_branch)
    return feats, logits, deltas, pooled, (scores2d, deltas2d), cube


def _torch_forward(backbone, sd, x_nchw, ch_map):
    bu = {k: v for k, v in backbone(torch.as_tensor(x_nchw)).items()}
    fpn = load_prefixed(
        TorchFPN(tuple(ch_map[s] for s in range(2, 7))),
        {k: v for k, v in sd.items() if k.startswith("backbone.fpn_")},
        "backbone.")
    rpn = load_prefixed(TorchRPNHead(), sd, "proposal_generator.rpn_head.")
    box_head = load_prefixed(TorchBoxHead(), sd, "roi_heads.box_head.")
    predictor = load_prefixed(TorchPredictor(C), sd, "roi_heads.box_predictor.")
    cube_head = load_prefixed(TorchCubeHead(C), sd, "roi_heads.cube_head.")

    with torch.no_grad():
        tf = fpn(bu)
        t_logits, t_deltas = rpn([tf[f"p{s}"] for s in range(2, 7)])
        feats_np = {k: v.numpy() for k, v in tf.items()}
        pooled = multilevel_pool_oracle(feats_np, BOXES, 7, 0)  # (N,7,7,C) HWC
        # detectron2 heads consume NCHW; flatten order is CHW
        pooled_t = torch.as_tensor(pooled.transpose(0, 3, 1, 2).astype(np.float32))
        t_scores, t_box_deltas = predictor(box_head(pooled_t))
        t_cube = cube_head(pooled_t)
    return tf, t_logits, t_deltas, pooled, (t_scores, t_box_deltas), t_cube


def _compare(feats, logits, deltas, pooled, box_out, cube,
             tf, t_logits, t_deltas, t_pooled, t_box, t_cube):
    for s, name in zip(range(2, 7), FEATURE_NAMES):
        np.testing.assert_allclose(
            np.asarray(feats[name][0]), tf[f"p{s}"][0].numpy().transpose(1, 2, 0),
            atol=3e-4, err_msg=f"FPN {name}")
    for i, s in enumerate(range(2, 7)):
        tl = t_logits[i]  # (1, A, H, W)
        n, A, H, W = tl.shape
        np.testing.assert_allclose(
            np.asarray(logits[i][0]),
            tl.permute(0, 2, 3, 1).reshape(n, -1)[0].numpy(),
            atol=3e-4, err_msg=f"RPN logits p{s}")
        td = t_deltas[i].permute(0, 2, 3, 1).reshape(n, H * W * A, 4)
        np.testing.assert_allclose(
            np.asarray(deltas[i][0]), td[0].numpy(), atol=3e-4,
            err_msg=f"RPN deltas p{s}")
    np.testing.assert_allclose(np.asarray(pooled), t_pooled, atol=3e-4,
                               err_msg="pooled features")
    np.testing.assert_allclose(np.asarray(box_out[0]), t_box[0].numpy(),
                               atol=2e-3, err_msg="cls_score")
    np.testing.assert_allclose(np.asarray(box_out[1]), t_box[1].numpy(),
                               atol=2e-3, err_msg="bbox_pred")
    c_deltas, c_z, c_dims, c_pose, c_uncert = cube
    t_d, t_z, t_dims, t_pose, t_unc = t_cube
    np.testing.assert_allclose(np.asarray(c_deltas), t_d.numpy(), atol=2e-3,
                               err_msg="cube deltas")
    np.testing.assert_allclose(np.asarray(c_z), t_z.numpy(), atol=2e-3,
                               err_msg="cube z")
    np.testing.assert_allclose(np.asarray(c_dims), t_dims.numpy(), atol=2e-3,
                               err_msg="cube dims")
    np.testing.assert_allclose(np.asarray(c_pose), t_pose.numpy(), atol=2e-3,
                               err_msg="cube pose")
    np.testing.assert_allclose(np.asarray(c_uncert), t_unc.numpy(), atol=2e-3,
                               err_msg="cube uncertainty")


@pytest.mark.heavy
def test_dla34_full_forward_parity():
    from torch_dla34 import TorchDLA34, imagenet_state_dict

    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = C
    sd = _full_state_dict(imagenet_state_dict(seed=11), DLA_CH)

    tm = TorchDLA34()
    tm.load_state_dict({k[len("backbone.bottom_up."):]: torch.as_tensor(np.asarray(v))
                        for k, v in sd.items()
                        if k.startswith("backbone.bottom_up.")})
    tm.eval()

    x = torch.randn(1, 3, 128, 128).numpy()
    flax_out = _flax_forward(cfg, sd, x)
    torch_out = _torch_forward(tm, sd, x, DLA_CH)
    _compare(*flax_out, *torch_out)


@pytest.mark.heavy
def test_resnet34_full_forward_parity():
    from torch_resnet import TorchResNet34
    from torch_resnet import imagenet_state_dict as resnet_sd

    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = C
    cfg.MODEL.BACKBONE.NAME = "build_resnet_from_vision_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 34
    sd = _full_state_dict(
        {k: v for k, v in resnet_sd(seed=12).items() if not k.startswith("fc.")},
        RESNET34_CH,
    )

    tm = TorchResNet34()
    tm.load_state_dict({k[len("backbone.bottom_up."):]: torch.as_tensor(np.asarray(v))
                        for k, v in sd.items()
                        if k.startswith("backbone.bottom_up.")})
    tm.eval()

    x = torch.randn(1, 3, 128, 128).numpy()
    flax_out = _flax_forward(cfg, sd, x)
    torch_out = _torch_forward(tm, sd, x, RESNET34_CH)
    _compare(*flax_out, *torch_out)
