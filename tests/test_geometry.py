"""Golden-value and round-trip tests for the geometry core.

The reference validates geometry only operationally (SURVEY §4); here every
function gets a unit test, several against independent numpy oracles.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omni3d_tpu.utils import geometry as G
from omni3d_tpu.utils import boxes as B


def rand_rot(rng):
    """Random rotation via QR of a gaussian matrix."""
    q, r = np.linalg.qr(rng.standard_normal((3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


class TestCuboidVerts:
    def test_unit_cube_matches_reference_vertex_order(self):
        # box at origin with w=h=l=1 and no rotation must give UNIT_CUBE,
        # accounting for the reference axis layout: X<-l, Y<-h, Z<-w.
        v = np.asarray(G.cuboid_verts(jnp.array([0, 0, 0, 1, 1, 1.0])))
        assert v.shape == (8, 3)
        np.testing.assert_allclose(v, G.UNIT_CUBE, atol=1e-6)

    def test_translation(self):
        v = np.asarray(G.cuboid_verts(jnp.array([1.0, 2.0, 3.0, 1, 1, 1])))
        np.testing.assert_allclose(v, G.UNIT_CUBE + np.array([1, 2, 3]), atol=1e-6)

    def test_dims_axes(self):
        # l scales X, h scales Y, w scales Z
        v = np.asarray(G.cuboid_verts(jnp.array([0, 0, 0, 2.0, 4.0, 6.0])))
        assert np.isclose(v[:, 0].max(), 3.0)  # l/2
        assert np.isclose(v[:, 1].max(), 2.0)  # h/2
        assert np.isclose(v[:, 2].max(), 1.0)  # w/2

    def test_rotation_about_center(self):
        rng = np.random.default_rng(0)
        R = rand_rot(rng)
        box = jnp.array([1.0, -2.0, 5.0, 1.5, 2.5, 0.5])
        v = np.asarray(G.cuboid_verts(box, jnp.asarray(R)))
        v0 = np.asarray(G.cuboid_verts(box.at[:3].set(0.0)))
        np.testing.assert_allclose(v, v0 @ R.T + np.array([1, -2, 5]), atol=1e-5)

    def test_batched(self):
        boxes = jnp.zeros((4, 6)).at[:, 3:].set(1.0)
        v = G.cuboid_verts(boxes)
        assert v.shape == (4, 8, 3)


class TestProjection:
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)

    def test_center_point(self):
        pts = jnp.array([[[0.0, 0.0, 2.0]]])
        out = np.asarray(G.project_points(jnp.asarray(self.K)[None], pts))
        np.testing.assert_allclose(out[0, 0], [320, 240, 2.0], atol=1e-5)

    def test_off_center(self):
        pts = jnp.array([[[1.0, -1.0, 5.0]]])
        out = np.asarray(G.project_points(jnp.asarray(self.K)[None], pts))
        np.testing.assert_allclose(out[0, 0], [320 + 100, 240 - 100, 5.0], atol=1e-4)

    def test_box3d_to_box2d_xywh(self):
        box = jnp.array([0.0, 0.0, 10.0, 2.0, 2.0, 2.0])
        box2d, behind, fully = G.box3d_to_box2d(jnp.asarray(self.K), box, xywh=False)
        box2d = np.asarray(box2d)
        # front face at z=9 is the widest: half-extent 1m -> 500/9 px
        assert not bool(behind) and not bool(fully)
        np.testing.assert_allclose(box2d[0], 320 - 500 / 9, atol=1e-3)
        np.testing.assert_allclose(box2d[2], 320 + 500 / 9, atol=1e-3)

    def test_fully_behind(self):
        box = jnp.array([0.0, 0.0, -10.0, 1.0, 1.0, 1.0])
        _, behind, fully = G.box3d_to_box2d(jnp.asarray(self.K), box)
        assert bool(behind) and bool(fully)


class TestRotations:
    def test_6d_round_trip(self):
        rng = np.random.default_rng(1)
        Rs = np.stack([rand_rot(rng) for _ in range(16)])
        d6 = G.matrix_to_rotation_6d(jnp.asarray(Rs))
        back = np.asarray(G.rotation_6d_to_matrix(d6))
        np.testing.assert_allclose(back, Rs, atol=1e-5)

    def test_6d_gram_schmidt(self):
        # arbitrary (non-orthogonal) 6d input must still give a valid rotation
        d6 = jnp.array([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0]])
        R = np.asarray(G.rotation_6d_to_matrix(d6))[0]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.isclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_quaternion_identity(self):
        R = np.asarray(G.quaternion_to_matrix(jnp.array([1.0, 0, 0, 0])))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_quaternion_z90(self):
        s = np.sqrt(0.5)
        R = np.asarray(G.quaternion_to_matrix(jnp.array([s, 0, 0, s])))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_euler_round_trip_host(self):
        rng = np.random.default_rng(2)
        for _ in range(10):
            R = rand_rot(rng)
            np.testing.assert_allclose(G.euler2mat(G.mat2euler(R)), R, atol=1e-5)

    def test_axis_angle_round_trip(self):
        rng = np.random.default_rng(3)
        aa = rng.standard_normal((8, 3)).astype(np.float32)
        R = G.axis_angle_to_matrix(jnp.asarray(aa))
        back = np.asarray(G.matrix_to_axis_angle(R))
        R2 = np.asarray(G.axis_angle_to_matrix(jnp.asarray(back)))
        np.testing.assert_allclose(np.asarray(R), R2, atol=1e-4)

    def test_axis_angle_zero(self):
        R = np.asarray(G.axis_angle_to_matrix(jnp.zeros(3)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-7)

    def test_so3_relative_angle(self):
        rng = np.random.default_rng(4)
        R1 = rand_rot(rng)
        aa = np.array([0.0, 0.5, 0.0], np.float32)
        R2 = np.asarray(G.axis_angle_to_matrix(jnp.asarray(aa))) @ R1
        ang = float(G.so3_relative_angle(jnp.asarray(R1)[None], jnp.asarray(R2)[None])[0])
        assert np.isclose(ang, 0.5, atol=1e-3)


class TestAllocentric:
    K = np.array([[500.0, 0, 320], [0, 480.0, 240], [0, 0, 1]], np.float32)

    def test_round_trip(self):
        rng = np.random.default_rng(5)
        n = 16
        Rs = jnp.asarray(np.stack([rand_rot(rng) for _ in range(n)]))
        K = jnp.broadcast_to(jnp.asarray(self.K), (n, 3, 3))
        u = jnp.asarray(rng.uniform(0, 640, n).astype(np.float32))
        v = jnp.asarray(rng.uniform(0, 480, n).astype(np.float32))
        allo = G.R_to_allocentric(K, Rs, u, v)
        back = G.R_from_allocentric(K, allo, u, v)
        np.testing.assert_allclose(np.asarray(back), np.asarray(Rs), atol=1e-4)

    def test_principal_point_identity(self):
        # looking straight down the optical axis: allocentric == egocentric
        R = jnp.asarray(rand_rot(np.random.default_rng(6)))[None]
        K = jnp.asarray(self.K)[None]
        out = G.R_to_allocentric(K, R, jnp.array([320.0]), jnp.array([240.0]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(R), atol=1e-5)


class TestVirtualDepth:
    def test_identity(self):
        assert float(G.virtual_scale(512.0, 512.0, 512.0, 512.0)) == 1.0

    def test_formula(self):
        # (H0 * f) / (f0 * H)
        assert np.isclose(float(G.virtual_scale(512.0, 512.0, 600.0, 480.0)), (480 * 512) / (600 * 512))


class TestScaledSigmoid:
    def test_bounds(self):
        out = np.asarray(G.scaled_sigmoid(jnp.array([-100.0, 0.0, 100.0]), 2.0, 6.0))
        np.testing.assert_allclose(out, [2.0, 4.0, 6.0], atol=1e-4)


class TestBoxes2D:
    def test_pairwise_iou_known(self):
        a = jnp.array([[0, 0, 2, 2], [0, 0, 1, 1.0]])
        b = jnp.array([[1, 1, 3, 3.0]])
        iou = np.asarray(B.pairwise_iou(a, b))
        np.testing.assert_allclose(iou[:, 0], [1 / 7, 0.0], atol=1e-6)

    def test_pairwise_ioa(self):
        a = jnp.array([[0, 0, 2, 2.0]])
        b = jnp.array([[1, 1, 3, 3.0]])
        # intersection 1, area of b = 4
        np.testing.assert_allclose(np.asarray(B.pairwise_ioa(a, b))[0, 0], 0.25, atol=1e-6)

    def test_deltas_round_trip(self):
        rng = np.random.default_rng(7)
        xy = rng.uniform(0, 100, (32, 2))
        wh = rng.uniform(1, 50, (32, 2))
        src = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        xy2 = rng.uniform(0, 100, (32, 2))
        wh2 = rng.uniform(1, 50, (32, 2))
        tgt = np.concatenate([xy2, xy2 + wh2], -1).astype(np.float32)
        for w in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
            d = B.encode_deltas(jnp.asarray(src), jnp.asarray(tgt), w)
            back = np.asarray(B.decode_deltas(d, jnp.asarray(src), w))
            np.testing.assert_allclose(back, tgt, atol=1e-3)

    def test_matched_iou(self):
        a = jnp.array([[0, 0, 2, 2.0]])
        out = np.asarray(B.matched_iou(a, a))
        np.testing.assert_allclose(out, [1.0], atol=1e-6)

    def test_iou_np_matches_jnp(self):
        rng = np.random.default_rng(8)
        a = rng.uniform(0, 50, (10, 2))
        a = np.concatenate([a, a + rng.uniform(1, 30, (10, 2))], -1).astype(np.float32)
        b = rng.uniform(0, 50, (7, 2))
        b = np.concatenate([b, b + rng.uniform(1, 30, (7, 2))], -1).astype(np.float32)
        np.testing.assert_allclose(
            B.iou_np(a, b), np.asarray(B.pairwise_iou(jnp.asarray(a), jnp.asarray(b))), atol=1e-5
        )


def test_everything_jits():
    K = jnp.eye(3) * 100
    K = K.at[2, 2].set(1.0)

    @jax.jit
    def f(box, R):
        v = G.cuboid_verts(box, R)
        b2, _, _ = G.box3d_to_box2d(K, box, R)
        allo = G.R_to_allocentric(K[None], R[None], jnp.array([5.0]), jnp.array([5.0]))
        return v.sum() + b2.sum() + allo.sum()

    out = f(jnp.array([0, 0, 5.0, 1, 1, 1]), jnp.eye(3))
    assert np.isfinite(float(out))
