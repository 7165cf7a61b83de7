"""Cluster-bin depth decode and its non-disentangled loss.

Covers the `z_type='clusters'` path (reference roi_heads.py:432-442 bin
assignment, 501-522 scaled-sigmoid decode, 648-649 standardized z target)
which the main model tests leave at the default `direct` config.
"""
import numpy as np
import jax.numpy as jnp

from omni3d_tpu.models.heads import decode_cube
from omni3d_tpu.models.roi_training import cube_losses
from omni3d_tpu.utils import geometry as G


def _outputs(n, C, bins, seed=0):
    rng = np.random.default_rng(seed)
    deltas = jnp.asarray(rng.normal(0, 0.01, (n, C, 2)), jnp.float32)
    z = jnp.asarray(rng.normal(0, 1.0, (n, bins, C)), jnp.float32)
    dims = jnp.asarray(rng.normal(0, 0.01, (n, C, 3)), jnp.float32)
    pose = jnp.broadcast_to(jnp.eye(3), (n, C, 3, 3))
    uncert = jnp.full((n, C), 1.0, jnp.float32)
    return deltas, z, dims, pose, uncert


def _decode(n=6, C=3, bins=4, z_seed=1):
    rng = np.random.default_rng(z_seed)
    boxes = jnp.asarray(
        np.stack([
            rng.uniform(0, 100, n), rng.uniform(0, 100, n),
            rng.uniform(150, 400, n), rng.uniform(150, 400, n),
        ], axis=1), jnp.float32)
    classes = jnp.asarray(rng.integers(0, C, n), jnp.int32)
    Ks = jnp.broadcast_to(
        jnp.asarray([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]]), (n, 3, 3))
    priors_dims = jnp.ones((C, 2, 3), jnp.float32)
    z_scales = jnp.asarray(rng.uniform(50, 500, (C, bins)), jnp.float32)
    z_stats = jnp.stack([
        jnp.asarray(rng.uniform(5, 30, (C, bins)), jnp.float32),
        jnp.asarray(rng.uniform(1, 5, (C, bins)), jnp.float32),
    ], axis=-1)  # (C, bins, 2) mean/std
    outputs = _outputs(n, C, bins)
    cube = decode_cube(
        outputs, classes, boxes, Ks, Ks[:, 1, 1], priors_dims,
        z_type="clusters", virtual_depth=True, virtual_focal=512.0,
        priors_z_stats=z_stats, priors_z_scales=z_scales, cluster_bins=bins,
    )
    return cube, outputs, classes, boxes, Ks, z_scales, z_stats


class TestClusterZDecode:
    def test_bin_assignment_and_range(self):
        cube, outputs, classes, boxes, Ks, z_scales, z_stats = _decode()
        n = classes.shape[0]
        # bin = argmin |prior_scale - 2D diagonal| (reference roi_heads.py:432-441)
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        diag = jnp.sqrt(w**2 + h**2)
        for i in range(n):
            c = int(classes[i])
            expect = int(jnp.argmin(jnp.abs(z_scales[c] - diag[i])))
            assert int(cube["bin_assign"][i]) == expect
            mean = float(z_stats[c, expect, 0])
            std = float(z_stats[c, expect, 1])
            assert float(cube["z_mean"][i]) == mean
            assert float(cube["z_std"][i]) == std
            # virtual z within scaled-sigmoid range, then * fy/virtual_focal
            v2r = 500.0 / 512.0
            lo, hi = max(mean - 3 * std, 0.0) * v2r, (mean + 3 * std) * v2r
            assert lo - 1e-4 <= float(cube["z"][i]) <= hi + 1e-4
            # z_norm stays the raw logit (reference roi_heads.py:519)
            raw = outputs[1][i, expect, c]
            np.testing.assert_allclose(float(cube["z_norm"][i]), float(raw), rtol=1e-6)

    def test_nondisentangled_cluster_z_loss_target(self):
        cube, outputs, classes, boxes, Ks, z_scales, z_stats = _decode()
        n = classes.shape[0]

        class CH:  # minimal cfg node
            DISENTANGLED_LOSS = False
            DIMS_PRIORS_ENABLED = True
            ALLOCENTRIC_POSE = False
            CHAMFER_POSE = False
            Z_TYPE = "clusters"
            LOSS_W_3D = 1.0
            LOSS_W_XY = 1.0
            LOSS_W_Z = 1.0
            LOSS_W_DIMS = 1.0
            LOSS_W_POSE = 1.0
            LOSS_W_JOINT = 0.0
            INVERSE_Z_WEIGHT = False
            USE_CONFIDENCE = 0.0

        cube = dict(cube, uncert=None)
        gt_z = jnp.asarray(np.random.default_rng(3).uniform(5, 40, n), jnp.float32)
        gt_boxes3D = jnp.concatenate(
            [jnp.full((n, 2), 256.0), gt_z[:, None], jnp.ones((n, 3))], axis=1)
        gt_poses = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
        fg = jnp.ones(n, bool)
        losses, _ = cube_losses(cube, fg, gt_boxes3D, gt_poses, Ks, CH, boxes)

        # loss_z == mean |z_raw - (gt_z*real_to_virtual - mean)/std|
        r2v = 512.0 / 500.0
        tgt = (gt_z * r2v - cube["z_mean"]) / cube["z_std"]
        expect = jnp.mean(jnp.abs(cube["z_norm"] - tgt))
        np.testing.assert_allclose(float(losses["Cube/loss_z"]), float(expect), rtol=1e-5)
