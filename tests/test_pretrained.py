"""Pretrained-weight initialization tests (non-circular).

Validates the two torch namespaces the training path loads from:
  * flat ImageNet DLA weights (reference dla.py:300-309,494),
  * the full cubercnn/detectron2 model namespace (MODEL.WEIGHTS /
    MODEL.WEIGHTS_PRETRAIN, reference train_net.py:139-145).

Key names come from `tests/torch_dla34.py` — an independent torch module tree
transcribing the PUBLISHED checkpoint layout — and from hand-derived
detectron2 attribute names (SURVEY §2.2), NOT from the `flax_path_to_torch`
mapping under test. Also checks full-backbone activation parity of converted
weights against the torch fixture's forward.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from omni3d_tpu.config.cfg import StaticCfg
from omni3d_tpu.config.defaults import get_default_cfg
from omni3d_tpu.models.dla import DLA
from omni3d_tpu.utils import checkpoint as ckpt

from torch_dla34 import TorchDLA34, imagenet_state_dict


# ------------------------- hand-derived manifests -------------------------

def resnet_imagenet_keys(depth: int) -> set:
    """torchvision ResNet state-dict keys (public torchvision namespace used
    by reference resnet.py:66-96), ex-fc."""
    blocks = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3],
              101: [3, 4, 23, 3]}[depth]
    bottleneck = depth >= 50
    bn = lambda p: [f"{p}.weight", f"{p}.bias", f"{p}.running_mean",
                    f"{p}.running_var", f"{p}.num_batches_tracked"]
    keys = ["conv1.weight"] + bn("bn1")
    for stage, n in enumerate(blocks, start=1):
        for b in range(n):
            p = f"layer{stage}.{b}"
            ncv = 3 if bottleneck else 2
            for c in range(1, ncv + 1):
                keys += [f"{p}.conv{c}.weight"] + bn(f"{p}.bn{c}")
            # first block of stages 2-4 (and stage 1 for bottleneck) has a
            # projection downsample
            if b == 0 and (stage > 1 or bottleneck):
                keys += [f"{p}.downsample.0.weight"] + bn(f"{p}.downsample.1")
    return set(keys)


DLA_CH = {2: 64, 3: 128, 4: 256, 5: 512, 6: 512}
RESNET34_CH = {2: 64, 3: 128, 4: 256, 5: 512, 6: 512}


def cubercnn_head_state_dict(C: int, rng, ch_map=None) -> dict:
    """detectron2/cubercnn head tensors: FPN laterals/outputs (stage number =
    log2 stride), StandardRPNHead, FastRCNNConvFCHead, FastRCNNOutputLayers,
    CubeHead (reference cube_head.py:51-144), prior buffers
    (roi_heads.py:117-143, z_type='direct' so no priors_z_stats)."""
    F = 12544  # 256 * 7 * 7 pooled features
    sd = {}

    def t(key, *shape):
        sd[key] = rng.standard_normal(shape).astype(np.float32) * 0.05

    dla_ch = ch_map or DLA_CH
    for s in range(2, 7):
        t(f"backbone.fpn_lateral{s}.weight", 256, dla_ch[s], 1, 1)
        t(f"backbone.fpn_lateral{s}.bias", 256)
        t(f"backbone.fpn_output{s}.weight", 256, 256, 3, 3)
        t(f"backbone.fpn_output{s}.bias", 256)
    t("proposal_generator.rpn_head.conv.weight", 256, 256, 3, 3)
    t("proposal_generator.rpn_head.conv.bias", 256)
    t("proposal_generator.rpn_head.objectness_logits.weight", 3, 256, 1, 1)
    t("proposal_generator.rpn_head.objectness_logits.bias", 3)
    t("proposal_generator.rpn_head.anchor_deltas.weight", 12, 256, 1, 1)
    t("proposal_generator.rpn_head.anchor_deltas.bias", 12)
    t("roi_heads.box_head.fc1.weight", 1024, F)
    t("roi_heads.box_head.fc1.bias", 1024)
    t("roi_heads.box_head.fc2.weight", 1024, 1024)
    t("roi_heads.box_head.fc2.bias", 1024)
    t("roi_heads.box_predictor.cls_score.weight", C + 1, 1024)
    t("roi_heads.box_predictor.cls_score.bias", C + 1)
    t("roi_heads.box_predictor.bbox_pred.weight", 4 * C, 1024)
    t("roi_heads.box_predictor.bbox_pred.bias", 4 * C)
    t("roi_heads.cube_head.feature_generator.fc1.weight", 1024, F)
    t("roi_heads.cube_head.feature_generator.fc1.bias", 1024)
    t("roi_heads.cube_head.feature_generator.fc2.weight", 1024, 1024)
    t("roi_heads.cube_head.feature_generator.fc2.bias", 1024)
    for name, width in (("bbox_3D_center_deltas", 2 * C), ("bbox_3D_dims", 3 * C),
                        ("bbox_3D_pose", 6 * C), ("bbox_3D_center_depth", C),
                        ("bbox_3D_uncertainty", C)):
        t(f"roi_heads.cube_head.{name}.weight", width, 1024)
        t(f"roi_heads.cube_head.{name}.bias", width)
    t("roi_heads.priors_dims_per_cat", 1, C, 2, 3)
    t("roi_heads.priors_z_scales", C, 1)
    return sd


# ------------------------------ tests ------------------------------

@pytest.fixture(scope="module")
def dla_flax():
    model = DLA(variant="dla34", train=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, variables


class TestImageNetDLA:
    def test_keys_load_exactly(self, dla_flax):
        """Every ImageNet key consumed, every flax backbone leaf filled."""
        _, variables = dla_flax
        sd = imagenet_state_dict()
        params = {"backbone": variables["params"]}
        stats = {"backbone": variables["batch_stats"]}
        new_p, new_s, report = ckpt.convert_imagenet_backbone(
            sd, params, stats, "build_dla_from_vision_fpn_backbone"
        )
        assert not report["missing"], report["missing"][:8]
        assert not report["unused"], report["unused"][:8]
        # spot-check one tensor landed with the OIHW->HWIO transpose
        got = np.asarray(
            new_p["backbone"]["level2"]["tree1"]["conv1"]["c"]["conv"]["kernel"])
        want = sd["level2.tree1.conv1.weight"].numpy().transpose(2, 3, 1, 0)
        np.testing.assert_allclose(got, want, atol=0)

    def test_backbone_only(self, dla_flax):
        """ImageNet init must not disturb non-backbone params."""
        _, variables = dla_flax
        params = {"backbone": variables["params"],
                  "other": {"w": jnp.ones((3,))}}
        new_p, _, _ = ckpt.convert_imagenet_backbone(
            imagenet_state_dict(), params, {"backbone": variables["batch_stats"]},
            "build_dla_from_vision_fpn_backbone",
        )
        np.testing.assert_array_equal(np.asarray(new_p["other"]["w"]), 1.0)

    @pytest.mark.heavy
    def test_activation_parity(self, dla_flax):
        """Converted ImageNet weights reproduce the torch forward (p2..p6)."""
        model, variables = dla_flax
        sd = imagenet_state_dict(seed=3)
        tm = TorchDLA34()
        tm.load_state_dict(sd)
        tm.eval()

        x = torch.randn(1, 3, 64, 64)
        with torch.no_grad():
            ref = {k: v.numpy().transpose(0, 2, 3, 1) for k, v in tm(x).items()}

        new_p, new_s, report = ckpt.convert_imagenet_backbone(
            sd, {"backbone": variables["params"]},
            {"backbone": variables["batch_stats"]},
            "build_dla_from_vision_fpn_backbone",
        )
        assert not report["missing"] and not report["unused"]
        out = model.apply(
            {"params": new_p["backbone"], "batch_stats": new_s["backbone"]},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        )
        for k in ("p2", "p3", "p4", "p5", "p6"):
            np.testing.assert_allclose(
                np.asarray(out[k]), ref[k], atol=2e-4,
                err_msg=f"level {k} diverges from torch forward")


class TestFullModelManifest:
    def test_dla34_fpn_manifest_noncircular(self):
        """Full-model conversion against a state dict whose keys come from
        the torch fixture + hand-derived detectron2 names (NOT from the
        mapping under test)."""
        C = 3
        cfg = get_default_cfg()
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = C
        from omni3d_tpu.models.rcnn3d import CubeRCNN

        model = CubeRCNN(cfg=StaticCfg(cfg))
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

        rng = np.random.default_rng(0)
        sd = {"backbone.bottom_up." + k: v
              for k, v in imagenet_state_dict(seed=1).items()}
        sd.update(cubercnn_head_state_dict(C, rng))

        new_p, new_s, report = ckpt.convert_reference_checkpoint(
            sd, variables["params"], variables["batch_stats"], strict=False
        )
        # the reference registers priors_z_stats only for z_type='clusters'
        # (roi_heads.py:133-143); with the default 'direct' it is absent.
        assert report["missing"] == ["roi_heads.priors_z_stats"], report["missing"][:8]
        assert not report["unused"], report["unused"][:8]


class TestExtraBackboneParity:
    """DenseNet/MNASNet/ShuffleNet: converted torchvision ImageNet weights
    reproduce the torch forward at the reference backbone's p2..p6 split
    points (non-circular key names from tests/torch_extra_backbones.py)."""

    @pytest.mark.heavy
    @pytest.mark.parametrize("builder,flax_cls", [
        ("build_densenet_fpn_backbone", "DenseNet121"),
        ("build_mnasnet_fpn_backbone", "MNASNet10"),
        ("build_shufflenet_fpn_backbone", "ShuffleNetV2"),
    ])
    def test_activation_parity(self, builder, flax_cls):
        from torch_extra_backbones import FIXTURES, imagenet_state_dict

        from omni3d_tpu.models import extra_backbones as eb

        model = getattr(eb, flax_cls)(train=False)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

        sd = imagenet_state_dict(builder, seed=6)
        tm = FIXTURES[builder]()
        tm.load_state_dict(sd)
        tm.eval()
        x = torch.randn(1, 3, 64, 64)
        with torch.no_grad():
            ref = {k: v.numpy().transpose(0, 2, 3, 1) for k, v in tm(x).items()}

        new_p, new_s, report = ckpt.convert_imagenet_backbone(
            sd, {"backbone": variables["params"]},
            {"backbone": variables["batch_stats"]}, builder,
        )
        assert not report["missing"], (builder, report["missing"][:8])
        assert not report["unused"], (builder, report["unused"][:8])
        out = model.apply(
            {"params": new_p["backbone"], "batch_stats": new_s["backbone"]},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        )
        for k in ("p2", "p3", "p4", "p5", "p6"):
            np.testing.assert_allclose(
                np.asarray(out[k]), ref[k], atol=2e-4,
                err_msg=f"{builder} level {k} diverges from torch forward")


class TestResNetImageNet:
    @pytest.mark.heavy
    def test_resnet34_activation_parity(self):
        """Converted torchvision ImageNet weights reproduce the torch
        ResNet-34 forward on every pyramid level."""
        from torch_resnet import TorchResNet34
        from torch_resnet import imagenet_state_dict as resnet_sd

        from omni3d_tpu.models.resnet import ResNet

        model = ResNet(depth=34, train=False)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

        sd = resnet_sd(seed=4)
        tm = TorchResNet34()
        tm.load_state_dict({k: v for k, v in sd.items()
                            if not k.startswith("fc.")})
        tm.eval()
        x = torch.randn(1, 3, 64, 64)
        with torch.no_grad():
            ref = {k: v.numpy().transpose(0, 2, 3, 1) for k, v in tm(x).items()}

        new_p, new_s, report = ckpt.convert_imagenet_backbone(
            sd, {"backbone": variables["params"]},
            {"backbone": variables["batch_stats"]},
            "build_resnet_from_vision_fpn_backbone",
        )
        assert not report["missing"], report["missing"][:8]
        assert not report["unused"], report["unused"][:8]
        out = model.apply(
            {"params": new_p["backbone"], "batch_stats": new_s["backbone"]},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        )
        for k in ("p2", "p3", "p4", "p5", "p6"):
            np.testing.assert_allclose(
                np.asarray(out[k]), ref[k], atol=2e-4,
                err_msg=f"level {k} diverges from torch forward")

    def test_resnet34_manifest(self):
        """Flax ResNet34 maps exactly onto the torchvision ImageNet keys."""
        from omni3d_tpu.models.resnet import ResNet

        model = ResNet(depth=34, train=False)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

        want = resnet_imagenet_keys(34)
        rng = np.random.default_rng(0)
        sd = {}
        # shapes don't matter for the coverage assertion path we test first;
        # build them from the flax tree via the torch layouts
        flat = jax.tree_util.tree_flatten_with_path(
            {"backbone": variables["params"]})[0]
        produced = set()
        for path, leaf in flat:
            keys = tuple(getattr(k, "key", str(k)) for k in path)
            prefix = ckpt.flax_path_to_torch(keys[:-1])
            assert prefix is not None, keys
            assert prefix.startswith("backbone.bottom_up.")
            flatkey = prefix[len("backbone.bottom_up."):]
            leafname = keys[-1]
            if leafname == "kernel":
                produced.add(flatkey + ".weight")
            elif leafname == "scale":
                produced.add(flatkey + ".weight")
            else:
                produced.add(flatkey + "." + leafname)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                {"backbone": variables["batch_stats"]})[0]:
            keys = tuple(getattr(k, "key", str(k)) for k in path)
            prefix = ckpt.flax_path_to_torch(keys[:-1])
            flatkey = prefix[len("backbone.bottom_up."):]
            suffix = ".running_mean" if keys[-1] == "mean" else ".running_var"
            produced.add(flatkey + suffix)

        want_no_nbt = {k for k in want if not k.endswith("num_batches_tracked")}
        assert produced == want_no_nbt, (
            sorted(want_no_nbt - produced)[:8], sorted(produced - want_no_nbt)[:8])
