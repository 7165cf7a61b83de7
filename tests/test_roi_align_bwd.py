"""Pallas ROIAlign backward vs autodiff of the XLA gather pooler.

The backward kernel transposes the same linear map as the forward plan
(including the elongated-box level bump), so its gradients must match
jax.grad of the XLA formulation except on bumped boxes.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omni3d_tpu.ops.roi_align import multilevel_roi_align
from omni3d_tpu.ops.roi_align_bwd_pallas import roi_align_bwd_pallas

STRIDES = (4, 8, 16, 32, 64)


def _ref_grads(feats, boxes, g):
    def pooled(fs):
        return jax.vmap(
            lambda fl, bx: multilevel_roi_align(list(fl), bx, list(STRIDES))
        )(list(fs), boxes)

    _, vjp = jax.vjp(pooled, feats)
    return vjp(g)[0]


def _case(seed, B, N, img=256, C=8):
    rng = np.random.default_rng(seed)
    feats = tuple(
        jnp.asarray(rng.standard_normal(
            (B, max(img // s, 1), max(img // s, 1), C)).astype(np.float32))
        for s in STRIDES
    )
    xy = rng.uniform(0, img - 40, (B, N, 2)).astype(np.float32)
    wh = rng.uniform(4, 100, (B, N, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh, img - 1)], -1))
    g = jnp.asarray(rng.standard_normal((B, N, 7, 7, C)).astype(np.float32))
    return feats, boxes, g


class TestBwdKernel:
    @pytest.mark.heavy  # largest interpret-mode case; the transpose/adaptive
    # cases below keep kernel coverage in the fast gate
    def test_vs_autodiff_random(self):
        feats, boxes, g = _case(0, B=2, N=13)
        got = roi_align_bwd_pallas(feats, boxes, g, list(STRIDES), interpret=True)
        want = _ref_grads(feats, boxes, g)
        for gt, wt in zip(got, want):
            np.testing.assert_allclose(np.asarray(gt), np.asarray(wt), atol=2e-4)

    @pytest.mark.heavy
    def test_edge_and_large_boxes(self):
        feats, boxes, g = _case(1, B=1, N=6)
        boxes = boxes.at[0, 0].set(jnp.asarray([0., 0., 255., 255.]))  # whole img
        boxes = boxes.at[0, 1].set(jnp.asarray([250., 250., 256., 256.]))  # corner
        boxes = boxes.at[0, 2].set(jnp.asarray([0., 0., 2., 2.]))  # tiny
        # bottom strip: 29.5x6.9 p3 cells — x-split, inside the fit envelope
        # (wider strips now level-bump, covered by the transpose test below)
        boxes = boxes.at[0, 3].set(jnp.asarray([0., 200., 236., 255.]))
        got = roi_align_bwd_pallas(feats, boxes, g, list(STRIDES), interpret=True)
        want = _ref_grads(feats, boxes, g)
        for gt, wt in zip(got, want):
            np.testing.assert_allclose(np.asarray(gt), np.asarray(wt), atol=2e-4)

    def test_zero_grad_gives_zero(self):
        feats, boxes, g = _case(2, B=1, N=5)
        got = roi_align_bwd_pallas(
            feats, boxes, jnp.zeros_like(g), list(STRIDES), interpret=True)
        for gt in got:
            assert float(jnp.abs(gt).max()) == 0.0

    def test_exact_transpose_of_pallas_forward(self):
        """<bwd(g), f> == <g, fwd(f)> — the defining transpose identity of
        the pair of linear maps, checked against the PALLAS forward itself
        (not the oracle), so it holds even for boxes whose outermost taps
        the forward's documented elongated-box routing drops."""
        from omni3d_tpu.ops.roi_align_pallas import (
            multilevel_roi_align_pallas_batched)

        feats, boxes, g = _case(3, B=2, N=9)
        # include elongated boxes that trigger the level bump
        boxes = boxes.at[0, 0].set(jnp.asarray([0., 0., 255., 40.]))
        boxes = boxes.at[1, 1].set(jnp.asarray([10., 0., 40., 250.]))
        fwd = multilevel_roi_align_pallas_batched(
            list(feats), boxes, STRIDES, 7, 2, interpret=True)
        lhs = sum(
            float(jnp.vdot(d, f))
            for d, f in zip(
                roi_align_bwd_pallas(feats, boxes, g, list(STRIDES),
                                     interpret=True),
                feats)
        )
        rhs = float(jnp.vdot(g, fwd))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-5)

    def test_adaptive_sampling_vs_autodiff(self):
        """sampling_ratio=0 backward must match autodiff of the adaptive
        XLA oracle."""
        feats, boxes, g = _case(5, B=1, N=8)
        got = roi_align_bwd_pallas(
            feats, boxes, g, list(STRIDES), sampling_ratio=0, interpret=True)

        def pooled(fs):
            return jax.vmap(
                lambda fl, bx: multilevel_roi_align(
                    list(fl), bx, list(STRIDES), 7, 0)
            )(list(fs), boxes)

        want = jax.vjp(pooled, feats)[1](g)[0]
        for gt, wt in zip(got, want):
            np.testing.assert_allclose(np.asarray(gt), np.asarray(wt), atol=2e-4)

    def test_n_not_multiple_of_step(self):
        """N % K != 0 exercises the per-image zero-weight padding."""
        feats, boxes, g = _case(4, B=2, N=7)
        got = roi_align_bwd_pallas(feats, boxes, g, list(STRIDES), interpret=True)
        want = _ref_grads(feats, boxes, g)
        for gt, wt in zip(got, want):
            np.testing.assert_allclose(np.asarray(gt), np.asarray(wt), atol=2e-4)

    def test_bf16_accumulator_matches_f32(self):
        """The bf16-accumulator path (16-aligned origins, 48-row window)
        transposes the same linear map: vs forced-f32 accumulation the
        difference is bounded by bf16 rounding of the accumulated grads."""
        feats, boxes, g = _case(5, B=1, N=9)
        feats = tuple(f.astype(jnp.bfloat16) for f in feats)
        g = g.astype(jnp.bfloat16)
        got = roi_align_bwd_pallas(feats, boxes, g, list(STRIDES),
                                   interpret=True, acc_dtype=jnp.bfloat16)
        want = roi_align_bwd_pallas(feats, boxes, g, list(STRIDES),
                                    interpret=True, acc_dtype=jnp.float32)
        for gt, wt in zip(got, want):
            gt = np.asarray(gt, np.float32)
            wt = np.asarray(wt, np.float32)
            # bf16 rounding error is relative to the largest accumulated
            # contribution (cancelled cells keep ULP-scale residue); a
            # placement bug would show diffs at the magnitude of wt itself
            tol = np.abs(wt).max() * 2 ** -6 + 2 ** -10
            assert np.abs(gt - wt).max() <= tol, (
                float(np.abs(gt - wt).max()), float(np.abs(wt).max()))
