"""Checkpoint system tests: torch layout conversions + full-model key coverage."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from omni3d_tpu.config.cfg import StaticCfg
from omni3d_tpu.config.defaults import get_default_cfg
from omni3d_tpu.models.layers import BatchNorm, Conv
from omni3d_tpu.models.rcnn3d import CubeRCNN
from omni3d_tpu.utils import checkpoint as ckpt


class TestLayoutConversions:
    def test_conv_matches_torch(self):
        torch.manual_seed(0)
        tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
        x = torch.randn(1, 3, 16, 16)
        with torch.no_grad():
            ref = tconv(x).numpy().transpose(0, 2, 3, 1)  # NCHW->NHWC

        m = Conv(features=8, kernel=3, stride=2)
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        variables = {"params": {"conv": {"kernel": jnp.asarray(
            ckpt._conv_kernel(tconv.weight.detach().numpy())
        )}}}
        out = m.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_batchnorm_matches_torch_eval(self):
        torch.manual_seed(1)
        tbn = torch.nn.BatchNorm2d(4)
        with torch.no_grad():
            tbn.weight.mul_(1.7).add_(0.1)
            tbn.bias.add_(0.3)
            tbn.running_mean.add_(0.5)
            tbn.running_var.mul_(2.0)
        tbn.eval()
        x = torch.randn(2, 4, 5, 5)
        with torch.no_grad():
            ref = tbn(x).numpy().transpose(0, 2, 3, 1)

        m = BatchNorm(use_running_average=True)
        variables = {
            "params": {"bn": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                              "bias": jnp.asarray(tbn.bias.detach().numpy())}},
            "batch_stats": {"bn": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                                   "var": jnp.asarray(tbn.running_var.numpy())}},
        }
        out = m.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_first_fc_chw_permute(self):
        """torch flattens pooled RoI features C,H,W; we flatten H,W,C — the
        converted fc must produce identical outputs on the same feature."""
        torch.manual_seed(2)
        C, H, W = 6, 7, 7
        lin = torch.nn.Linear(C * H * W, 10)
        feat = torch.randn(3, C, H, W)
        with torch.no_grad():
            ref = lin(feat.flatten(1)).numpy()

        k = ckpt._linear_kernel_chw(lin.weight.detach().numpy(), C, H, W)
        feat_hwc = jnp.asarray(feat.numpy().transpose(0, 2, 3, 1)).reshape(3, -1)
        out = feat_hwc @ jnp.asarray(k) + jnp.asarray(lin.bias.detach().numpy())
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def synthesize_torch_state_dict(params, batch_stats, pooled_chw=(256, 7, 7)):
    """Build a torch-layout state dict covering every flax leaf (random values
    in torch shapes), to exercise the converter end-to-end."""
    rng = np.random.default_rng(0)
    sd = {}
    C, H, W = pooled_chw

    def walk(tree, is_stats):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            keys = tuple(getattr(k, "key", str(k)) for k in path)
            leafname = keys[-1]
            prefix = ckpt.flax_path_to_torch(
                keys[:-1] if leafname in ("kernel", "bias", "scale", "mean", "var") else keys
            )
            assert prefix is not None, keys
            shape = leaf.shape
            if is_stats:
                tk = prefix + (".running_mean" if leafname == "mean" else ".running_var")
                sd[tk] = rng.standard_normal(shape).astype(np.float32) ** 2 + 0.5
            elif leafname == "kernel" and len(shape) == 4:
                sd[prefix + ".weight"] = rng.standard_normal(
                    (shape[3], shape[2], shape[0], shape[1])).astype(np.float32)
            elif leafname == "kernel":
                sd[prefix + ".weight"] = rng.standard_normal(
                    (shape[1], shape[0])).astype(np.float32)
            elif leafname in ("scale", "bias"):
                sd[prefix + (".weight" if leafname == "scale" else ".bias")] = (
                    rng.standard_normal(shape).astype(np.float32))
            else:  # priors
                sd[prefix] = rng.standard_normal((1,) + shape).astype(np.float32)

    walk(params, False)
    if batch_stats:
        walk(batch_stats, True)
    return sd


class TestFullModelConversion:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        cfg = get_default_cfg()
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
        model = CubeRCNN(cfg=StaticCfg(cfg))
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        return model, variables

    # extra backbones cost ~30-70s of model.init each on CPU; the flagship
    # DLA + resnet runs stay in the fast gate, the rest in the heavy tier
    @pytest.mark.parametrize("backbone,extra", [
        pytest.param("build_dla_from_vision_fpn_backbone", {},
                     marks=pytest.mark.heavy),  # 47 s full-model init
        ("build_resnet_from_vision_fpn_backbone", {"MODEL.RESNETS.DEPTH": 34}),
        pytest.param("build_densenet_fpn_backbone", {},
                     marks=pytest.mark.heavy),
        pytest.param("build_mnasnet_fpn_backbone", {},
                     marks=pytest.mark.heavy),
        pytest.param("build_shufflenet_fpn_backbone", {},
                     marks=pytest.mark.heavy),
    ])
    def test_every_param_maps_and_loads_all_backbones(self, backbone, extra):
        cfg = get_default_cfg()
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
        cfg.MODEL.BACKBONE.NAME = backbone
        for k, v in extra.items():
            cfg.merge_from_list([k, str(v)])
        model = CubeRCNN(cfg=StaticCfg(cfg))
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        sd = synthesize_torch_state_dict(variables["params"], variables["batch_stats"])
        new_params, new_stats, report = ckpt.convert_reference_checkpoint(
            sd, variables["params"], variables["batch_stats"]
        )
        assert not report["missing"], (backbone, report["missing"][:5])
        assert not report["unused"], (backbone, report["unused"][:5])

    def test_every_param_maps_and_loads(self, model_and_vars):
        model, variables = model_and_vars
        sd = synthesize_torch_state_dict(variables["params"], variables["batch_stats"])
        new_params, new_stats, report = ckpt.convert_reference_checkpoint(
            sd, variables["params"], variables["batch_stats"]
        )
        assert not report["missing"], report["missing"][:5]
        assert not report["unused"], report["unused"][:5]
        # spot check a conv round trip
        tk = "backbone.bottom_up.level2.tree1.conv1.weight"
        assert tk in sd
        got = np.asarray(
            new_params["backbone"]["level2"]["tree1"]["conv1"]["c"]["conv"]["kernel"]
        )
        np.testing.assert_allclose(got, sd[tk].transpose(2, 3, 1, 0), atol=0)

    def test_save_load_round_trip(self, model_and_vars, tmp_path):
        _, variables = model_and_vars
        path = str(tmp_path / "state.ckpt")
        ckpt.save_checkpoint(path, variables, {"iteration": 42})
        tree, extra = ckpt.load_checkpoint(path)
        assert extra["iteration"] == 42
        a = jax.tree.leaves(variables)[0]
        b = jax.tree.leaves(tree)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_periodic_checkpointer(self, model_and_vars, tmp_path):
        import os
        _, variables = model_and_vars
        pc = ckpt.PeriodicCheckpointer(str(tmp_path), period=5, max_iter=10)
        for it in range(10):
            pc.step(it, {"x": jnp.ones(2)})
        assert os.path.exists(tmp_path / "model_recent.ckpt")
        assert os.path.exists(tmp_path / "model_final.ckpt")
        assert ckpt.resume_or_load(str(tmp_path)) is not None
