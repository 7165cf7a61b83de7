"""Pallas patch-DMA ROIAlign vs the XLA gather oracle.

Runs the kernel in interpret mode on the CPU mesh; the same code path
(including the plan: level routing, sub-patch origins, conditional split)
is exercised as on hardware.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omni3d_tpu.ops import roi_align as ra_ops
from omni3d_tpu.ops.roi_align_pallas import (
    multilevel_roi_align_pallas, multilevel_roi_align_pallas_batched)

STRIDES = [4, 8, 16, 32, 64]


def _pyramid(rng, img=256, C=8, B=None):
    shapes = [(img // s, img // s, C) for s in STRIDES]
    if B is None:
        return [jnp.asarray(rng.standard_normal(s).astype(np.float32)) for s in shapes]
    return [
        jnp.asarray(rng.standard_normal((B,) + s).astype(np.float32)) for s in shapes
    ]


class TestPallasVsOracle:
    def test_random_boxes(self):
        rng = np.random.default_rng(0)
        feats = _pyramid(rng)
        xy = rng.uniform(0, 200, (32, 2)).astype(np.float32)
        wh = rng.uniform(4, 55, (32, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        got = multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, 2, interpret=True)
        want = ra_ops.multilevel_roi_align(feats, boxes, STRIDES, 7, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_large_and_edge_boxes(self):
        rng = np.random.default_rng(1)
        feats = _pyramid(rng)
        boxes = jnp.asarray([
            [0, 0, 255, 255],        # whole image -> top level
            [0, 0, 30, 30],          # p2, split never needed
            [200, 200, 255, 255],    # corner box
            [0, 0, 4, 4],            # tiny
            [250, 250, 256, 256],    # edge-touching
        ], jnp.float32)
        got = multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, 2, interpret=True)
        want = ra_ops.multilevel_roi_align(feats, boxes, STRIDES, 7, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_adaptive_sampling_matches_oracle(self):
        """sampling_ratio=0 (torchvision adaptive, the reference default)
        only reweights the plan — values must equal the XLA oracle, which is
        itself loop-oracle-validated in test_ops."""
        rng = np.random.default_rng(5)
        feats = _pyramid(rng)
        xy = rng.uniform(0, 180, (24, 2)).astype(np.float32)
        wh = rng.uniform(4, 70, (24, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        got = multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, 0, interpret=True)
        want = ra_ops.multilevel_roi_align(feats, boxes, STRIDES, 7, 0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_elongated_boxes_route_coarser(self):
        """Documented deviation (PARITY.md): boxes whose taps fit neither a
        2-window x split (FIT_X2 x FIT_Y1 cells) nor a 2-window y split
        (FIT_X1 x FIT_Y2) at their assigned level pool from the first
        coarser level where they do; the values must exactly match a
        single-level oracle there. The tall box fits a split-y pair at p2
        (FIT_Y2=71 > 62.5 cells) so it routes CANONICALLY."""
        rng = np.random.default_rng(1)
        feats = _pyramid(rng)
        wide = jnp.asarray([[0, 0, 255, 40]], jnp.float32)   # 63x10 p2 cells -> p4
        tall = jnp.asarray([[10, 0, 40, 250]], jnp.float32)  # 7x62 p2 cells: split-y, no bump
        got_w = multilevel_roi_align_pallas(feats, wide, STRIDES, 7, 2, interpret=True)
        want_w = ra_ops.roi_align(feats[2], wide, 7, 1.0 / 16, 2)
        np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w), atol=2e-4)
        got_t = multilevel_roi_align_pallas(feats, tall, STRIDES, 7, 2, interpret=True)
        want_t = ra_ops.multilevel_roi_align(feats, tall, STRIDES, 7, 2)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), atol=2e-4)

    def test_split_is_skipped_for_canonical_boxes(self):
        """Canonical-level boxes must plan a single sub-patch (oy0==oy1 and
        ox0==ox1) — the 2nd patch DMA is the pooler's HBM bottleneck."""
        from omni3d_tpu.ops.roi_align_pallas import _plan

        rng = np.random.default_rng(2)
        xy = rng.uniform(0, 120, (64, 2)).astype(np.float32)
        # sides <= 54px = 13.5 p2 cells <= FIT_X1: single window on both axes
        side = rng.uniform(16, 54, (64, 1)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + side * rng.uniform(0.8, 1.25, (64, 1)), ], -1))
        boxes = jnp.concatenate([boxes[:, :2], boxes[:, :2] + side], -1)
        level_shapes = [(256 // s, 256 // s) for s in STRIDES]
        lvl, oy, ox, wy, wx = _plan(boxes, STRIDES, level_shapes, 7, 2, 2)
        assert bool(jnp.all(oy[:, 0] == oy[:, 1]))
        assert bool(jnp.all(ox[:, 0] == ox[:, 1]))

    def test_batched_matches_per_image(self):
        rng = np.random.default_rng(3)
        B = 3
        feats = _pyramid(rng, B=B)
        xy = rng.uniform(0, 200, (B, 5, 2)).astype(np.float32)
        wh = rng.uniform(8, 50, (B, 5, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        got = multilevel_roi_align_pallas_batched(
            feats, boxes, STRIDES, 7, 2, interpret=True)
        for b in range(B):
            want = ra_ops.multilevel_roi_align(
                [f[b] for f in feats], boxes[b], STRIDES, 7, 2)
            np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want), atol=2e-4)


class TestResidentKernel:
    """Plane-resident mode: the per-image staged pyramid stays in VMEM and
    sub-windows are VMEM reads. Same plan machinery, different kernel —
    must match the oracle bit-for-tolerance like the DMA mode."""

    def test_matches_oracle_f32(self):
        rng = np.random.default_rng(7)
        B = 2
        feats = _pyramid(rng, B=B)
        xy = rng.uniform(0, 200, (B, 9, 2)).astype(np.float32)
        wh = rng.uniform(4, 60, (B, 9, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        got = multilevel_roi_align_pallas_batched(
            feats, boxes, STRIDES, 7, 2, interpret=True, mode="res")
        for b in range(B):
            want = ra_ops.multilevel_roi_align(
                [f[b] for f in feats], boxes[b], STRIDES, 7, 2)
            np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want),
                                       atol=2e-4)

    def test_bf16_window_geometry(self):
        """bf16 features use 16-aligned origins + 48-row windows; values
        must match the f32 oracle within bf16 rounding."""
        rng = np.random.default_rng(8)
        feats = _pyramid(rng)
        xy = rng.uniform(0, 180, (12, 2)).astype(np.float32)
        wh = rng.uniform(6, 70, (12, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        got = multilevel_roi_align_pallas(
            [f.astype(jnp.bfloat16) for f in feats], boxes, STRIDES, 7, 2,
            interpret=True, mode="res")
        want = ra_ops.multilevel_roi_align(feats, boxes, STRIDES, 7, 2)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=3e-2)

    def test_split_and_edge_boxes(self):
        """Elongated boxes exercise the second sub-window (conditional q1
        matmul) and the level bump; edge boxes the boundary/tail rules."""
        rng = np.random.default_rng(9)
        feats = _pyramid(rng)
        boxes = jnp.asarray([
            [0, 0, 255, 255],        # whole image -> p4, canonical x-split
            [0, 0, 255, 40],         # 64x10 p2 cells: bumped to p4
            [10, 0, 40, 250],        # 7x62 p2 cells: split-y, CANONICAL
            [200, 200, 255, 255],    # corner box
            [250, 250, 256, 256],    # edge-touching
            [0, 0, 4, 4],            # tiny
            [20, 60, 220, 100],      # 50x10 p2 cells: bumped to p3, x-split
        ], jnp.float32)
        got = multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, 2,
                                          interpret=True, mode="res")
        want = np.array(ra_ops.multilevel_roi_align(feats, boxes, STRIDES, 7, 2))
        # documented level bumps (PARITY.md): wide boxes past FIT_X2 cells
        want[1] = np.asarray(ra_ops.roi_align(feats[2], boxes[1:2], 7, 1.0 / 16, 2))[0]
        want[6] = np.asarray(ra_ops.roi_align(feats[1], boxes[6:7], 7, 1.0 / 8, 2))[0]
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_ychunk_tail_boundary(self):
        """r5 y-chunked reads: the 32-row base chunk + conditional tail.
        Boxes engineered to straddle the tail boundary — y tap footprints
        just inside and just beyond CHUNK_Y rows after align rounding —
        must all match the oracle (tail skipped vs taken is exact either
        way because the tail weight block is zero iff skipped)."""
        rng = np.random.default_rng(11)
        feats = _pyramid(rng)
        rows = []
        # y0 sweeps the align phase (slack 0..15 cells at p2, stride 4);
        # heights sweep tap extents ~12..34 cells across the 32-row chunk
        for y0 in (0.0, 6.0, 30.0, 62.0):
            for h_cells in (12, 18, 26, 30, 34):
                rows.append([40.0, y0, 90.0, y0 + 4.0 * h_cells])
        boxes = jnp.asarray(rows, jnp.float32)
        for dtype, atol in ((jnp.float32, 2e-4), (jnp.bfloat16, 3e-2)):
            got = multilevel_roi_align_pallas(
                [f.astype(dtype) for f in feats], boxes, STRIDES, 7, 2,
                interpret=True, mode="res")
            want = ra_ops.multilevel_roi_align(feats, boxes, STRIDES, 7, 2)
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(want), atol=atol)

    def test_n_not_multiple_of_step(self):
        """N % K != 0 exercises the per-image zero-weight padding."""
        rng = np.random.default_rng(10)
        B = 2
        feats = _pyramid(rng, B=B)
        xy = rng.uniform(0, 200, (B, 7, 2)).astype(np.float32)
        wh = rng.uniform(8, 50, (B, 7, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        got = multilevel_roi_align_pallas_batched(
            feats, boxes, STRIDES, 7, 2, interpret=True, mode="res")
        for b in range(B):
            want = ra_ops.multilevel_roi_align(
                [f[b] for f in feats], boxes[b], STRIDES, 7, 2)
            np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want),
                                       atol=2e-4)


class TestExactRouting:
    """TPU.POOLER_EXACT_ROUTING (r5): forces the XLA-gather oracle with
    canonical detectron2 level routing — no level-bump deviation — for
    parity runs (PARITY.md #2)."""

    def test_exact_routing_matches_oracle_on_bump_prone_boxes(self):
        rng = np.random.default_rng(12)
        B = 1
        feats = _pyramid(rng, B=B)
        # wide boxes that the pallas plan would bump one level coarser
        boxes = jnp.asarray([[
            [0, 0, 255, 40],         # 64x10 p2 cells: pallas bumps to p4
            [20, 60, 220, 100],      # 50x10 p2 cells: pallas bumps to p3
            [10, 10, 60, 60],        # canonical either way
        ]], jnp.float32)
        got = multilevel_roi_align_pallas_batched(
            feats, boxes, STRIDES, 7, 2, interpret=True, exact_routing=True)
        want = ra_ops.multilevel_roi_align(
            [f[0] for f in feats], boxes[0], STRIDES, 7, 2)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want),
                                   atol=1e-5)

    def test_config_knob_reaches_inference(self, monkeypatch):
        """TPU.POOLER_EXACT_ROUTING must reach BOTH pooler invocations of
        the inference path as exact_routing=True. (On CPU the auto
        dispatch already falls back to the oracle, so a value-based check
        cannot distinguish the knob off-TPU — assert the plumbing.)"""
        from omni3d_tpu.config.cfg import StaticCfg
        from omni3d_tpu.config.defaults import get_default_cfg
        from omni3d_tpu.models import rcnn3d as rc

        seen = []
        real = rc.multilevel_roi_align_pallas_batched

        def spy(*args, **kwargs):
            seen.append(kwargs.get("exact_routing", False))
            return real(*args, **kwargs)

        monkeypatch.setattr(rc, "multilevel_roi_align_pallas_batched", spy)

        cfg = get_default_cfg()
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
        cfg.TPU.POOLER_EXACT_ROUTING = True
        scfg = StaticCfg(cfg)
        model = rc.CubeRCNN(cfg=scfg)
        H = W = 128
        imgs = rc.preprocess(
            jnp.asarray(np.random.default_rng(0).integers(
                0, 255, (1, H, W, 3))),
            cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD)
        variables = model.init(jax.random.PRNGKey(0), imgs)
        Ks = jnp.asarray([[[200.0, 0, 64], [0, 200.0, 64], [0, 0, 1]]])
        oracle = (jnp.asarray([[[2.0, 40.0, 126.0, 56.0]]]),
                  jnp.zeros((1, 1), jnp.int32),
                  jnp.ones((1, 1), bool))
        out = rc.inference_impl(variables, model, imgs, Ks, jnp.ones(1),
                                oracle=oracle)
        assert np.all(np.isfinite(np.asarray(out["dims"])))
        assert seen and all(seen), seen
