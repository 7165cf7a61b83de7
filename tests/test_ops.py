"""Ops pack tests vs independent numpy oracles.

No torchvision/pytorch3d in this environment, so the oracles implement the
published CUDA-kernel semantics directly in numpy (greedy NMS, bilinear
ROIAlign-aligned, analytic 3D overlaps).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omni3d_tpu.ops import nms as nms_ops
from omni3d_tpu.ops import roi_align as ra_ops
from omni3d_tpu.ops import iou3d as iou3d_ops
from omni3d_tpu.utils import geometry as G


# ------------------------------ oracles ------------------------------

def nms_oracle(boxes, scores, thresh):
    """Sequential greedy NMS (torchvision semantics: suppress IoU > thresh)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        bi = boxes[i]
        for j in order:
            if suppressed[j] or j == i:
                continue
            bj = boxes[j]
            ix1, iy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
            ix2, iy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            a = (bi[2] - bi[0]) * (bi[3] - bi[1])
            b = (bj[2] - bj[0]) * (bj[3] - bj[1])
            if scores[j] <= scores[i] and inter / max(a + b - inter, 1e-12) > thresh:
                # only lower-scored boxes can be suppressed by i; equal-score
                # ties follow sort order, handled by iterating `order`
                if np.where(order == j)[0][0] > np.where(order == i)[0][0]:
                    suppressed[j] = True
    return np.array(keep)


def bilinear_oracle(feat, y, x):
    """torchvision bilinear_interpolate semantics."""
    H, W = feat.shape[:2]
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(feat.shape[-1])
    y, x = max(y, 0.0), max(x, 0.0)
    y0, x0 = int(y), int(x)
    if y0 >= H - 1:
        y0 = y1 = H - 1
        y = float(y0)
    else:
        y1 = y0 + 1
    if x0 >= W - 1:
        x0 = x1 = W - 1
        x = float(x0)
    else:
        x1 = x0 + 1
    ly, lx = y - y0, x - x0
    return (
        feat[y0, x0] * (1 - ly) * (1 - lx)
        + feat[y0, x1] * (1 - ly) * lx
        + feat[y1, x0] * ly * (1 - lx)
        + feat[y1, x1] * ly * lx
    )


def roi_align_oracle(feat, boxes, out_size, scale, sampling_ratio):
    """torchvision roi_align(aligned=True) semantics; 0 = adaptive grid
    (roi_bin_grid = ceil(roi_extent / pooled), per box per axis)."""
    N = len(boxes)
    C = feat.shape[-1]
    out = np.zeros((N, out_size, out_size, C))
    for n in range(N):
        x1, y1, x2, y2 = boxes[n] * scale - 0.5
        rh, rw = y2 - y1, x2 - x1
        bh, bw = rh / out_size, rw / out_size
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rh / out_size))
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rw / out_size))
        count = max(gh * gw, 1)
        for ph in range(out_size):
            for pw in range(out_size):
                acc = np.zeros(C)
                for iy in range(gh):
                    yy = y1 + ph * bh + (iy + 0.5) * bh / gh
                    for ix in range(gw):
                        xx = x1 + pw * bw + (ix + 0.5) * bw / gw
                        acc += bilinear_oracle(feat, yy, xx)
                out[n, ph, pw] = acc / count
    return out


# ------------------------------ NMS ------------------------------

class TestNMS:
    def test_vs_oracle_random(self):
        rng = np.random.default_rng(0)
        for trial in range(5):
            n = 64
            xy = rng.uniform(0, 80, (n, 2))
            wh = rng.uniform(5, 40, (n, 2))
            boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
            scores = rng.uniform(0, 1, n).astype(np.float32)
            for thresh in (0.3, 0.5, 0.7):
                expected = set(nms_oracle(boxes, scores, thresh))
                keep = np.asarray(
                    nms_ops.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), thresh)
                )
                assert set(np.where(keep)[0]) == expected, (trial, thresh)

    def test_vs_oracle_blocked_path(self):
        """N > BLOCK exercises the blocked (chunked) evaluation with deep
        suppression chains crossing block boundaries."""
        rng = np.random.default_rng(7)
        n = 1000
        xy = rng.uniform(0, 300, (n, 2))
        wh = rng.uniform(5, 120, (n, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        for thresh in (0.3, 0.6):
            expected = set(nms_oracle(boxes, scores, thresh))
            keep = np.asarray(
                nms_ops.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), thresh)
            )
            assert set(np.where(keep)[0]) == expected, thresh

    def test_indices_ordering_and_padding(self):
        boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10.1, 10], [50, 50, 60, 60.0]])
        scores = jnp.array([0.9, 0.8, 0.7])
        idx, valid = nms_ops.nms_indices(boxes, scores, 0.5, max_out=5)
        assert idx.shape == (5,)
        np.testing.assert_array_equal(np.asarray(idx[:2]), [0, 2])
        np.testing.assert_array_equal(np.asarray(valid), [True, True, False, False, False])

    def test_invalid_rows_never_kept(self):
        boxes = jnp.array([[0, 0, 10, 10], [20, 20, 30, 30.0]])
        scores = jnp.array([0.9, 0.8])
        keep = nms_ops.nms_mask(boxes, scores, 0.5, valid=jnp.array([True, False]))
        np.testing.assert_array_equal(np.asarray(keep), [True, False])

    def test_batched_nms_classes_dont_interact(self):
        boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10.0]])
        scores = jnp.array([0.9, 0.8])
        # same class: one suppressed; different class: both kept
        k_same = nms_ops.batched_nms_mask(boxes, scores, jnp.array([0, 0]), 0.5)
        k_diff = nms_ops.batched_nms_mask(boxes, scores, jnp.array([0, 1]), 0.5)
        assert np.asarray(k_same).sum() == 1
        assert np.asarray(k_diff).sum() == 2

    def test_jit(self):
        f = jax.jit(lambda b, s: nms_ops.nms_mask(b, s, 0.5))
        out = f(jnp.zeros((16, 4)), jnp.zeros(16))
        assert out.shape == (16,)


# ------------------------------ ROIAlign ------------------------------

class TestROIAlign:
    def test_vs_oracle(self):
        rng = np.random.default_rng(1)
        feat = rng.standard_normal((24, 32, 3)).astype(np.float32)
        boxes = np.array(
            [
                [4.0, 4.0, 60.0, 44.0],
                [0.0, 0.0, 8.0, 8.0],
                [30.0, 10.0, 100.0, 80.0],   # extends past the map
                [-5.0, -5.0, 20.0, 20.0],    # negative start
            ],
            np.float32,
        )
        out = np.asarray(
            ra_ops.roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 0.5, 2)
        )
        expected = roi_align_oracle(feat, boxes, 7, 0.5, 2)
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_adaptive_vs_oracle(self):
        """sampling_ratio=0: per-box adaptive grid must equal the loop oracle
        exactly across bin sizes from <1 cell (g=1) up to g=8."""
        rng = np.random.default_rng(4)
        feat = rng.standard_normal((64, 64, 3)).astype(np.float32)
        boxes = np.array(
            [
                [2.0, 2.0, 6.0, 6.0],        # g=1 (bin < 1 cell)
                [0.0, 0.0, 14.0, 14.0],      # g=2
                [5.0, 3.0, 40.0, 60.0],      # gx=5, gy=9 asymmetric... -> gy=ceil(57/7)=9
                [1.0, 1.0, 57.0, 29.0],      # gx=8, gy=4
                [-3.0, -3.0, 20.0, 20.0],    # negative start
                [10.0, 10.0, 63.0, 63.0],    # near-full map
            ],
            np.float32,
        )
        out = np.asarray(
            ra_ops.roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 1.0, 0)
        )
        expected = roi_align_oracle(feat, boxes, 7, 1.0, 0)
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_degenerate_boxes_zero_adaptive(self):
        """sampling_ratio=0 with zero/negative-extent boxes: torchvision's
        adaptive loop is EMPTY (grid = ceil(extent/out) <= 0, count clamped
        to 1) so the output is exactly 0; the static-grid transcription must
        reproduce that via its all-false weight mask (ORACLES.md)."""
        rng = np.random.default_rng(6)
        feat = rng.standard_normal((32, 32, 3)).astype(np.float32)
        boxes = np.array(
            [
                [10.0, 10.0, 10.0, 20.0],   # zero width
                [10.0, 10.0, 20.0, 10.0],   # zero height
                [20.0, 20.0, 12.0, 28.0],   # negative width
                [20.0, 20.0, 28.0, 12.0],   # negative height
            ],
            np.float32,
        )
        out = np.asarray(
            ra_ops.roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 1.0, 0)
        )
        expected = roi_align_oracle(feat, boxes, 7, 1.0, 0)
        np.testing.assert_array_equal(expected, np.zeros_like(expected))
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_adaptive_multilevel_vs_oracle(self):
        rng = np.random.default_rng(5)
        feats = [
            jnp.asarray(rng.standard_normal((64, 64, 4)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((32, 32, 4)).astype(np.float32)),
        ]
        strides = [4, 8]
        xy = rng.uniform(0, 100, (10, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + 30], -1))
        ml = ra_ops.multilevel_roi_align(feats, boxes, strides, 7, 0, min_level=2)
        expected = roi_align_oracle(
            np.asarray(feats[0]), np.asarray(boxes), 7, 1.0 / 4, 0)
        np.testing.assert_allclose(np.asarray(ml), expected, atol=1e-4)

    def test_chunked_matches_unchunked(self):
        rng = np.random.default_rng(2)
        feat = jnp.asarray(rng.standard_normal((16, 16, 4)).astype(np.float32))
        xy = rng.uniform(0, 10, (37, 2))
        boxes = jnp.asarray(
            np.concatenate([xy, xy + rng.uniform(2, 6, (37, 2))], -1).astype(np.float32)
        )
        a = ra_ops.roi_align(feat, boxes, 7, 1.0, 2, chunk=8)
        b = ra_ops.roi_align(feat, boxes, 7, 1.0, 2, chunk=512)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_level_assignment(self):
        # canonical 224^2 box -> level 4; tiny -> clamp at 2; huge -> clamp 6
        boxes = jnp.array(
            [
                [0, 0, 224, 224.0],
                [0, 0, 8, 8.0],
                [0, 0, 2000, 2000.0],
                [0, 0, 112, 112.0],
            ]
        )
        lv = np.asarray(ra_ops.assign_fpn_levels(boxes))
        np.testing.assert_array_equal(lv, [4, 2, 6, 3])

    def test_multilevel_matches_single_level(self):
        rng = np.random.default_rng(3)
        feats = [
            jnp.asarray(rng.standard_normal((64, 64, 4)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((32, 32, 4)).astype(np.float32)),
        ]
        strides = [4, 8]
        # small boxes (level 2) must match plain roi_align on feats[0]
        xy = rng.uniform(0, 100, (10, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + 30], -1))  # sqrt(900)<224*2^-1
        ml = ra_ops.multilevel_roi_align(feats, boxes, strides, 7, 2, min_level=2)
        sl = ra_ops.roi_align(feats[0], boxes, 7, 1.0 / 4, 2)
        np.testing.assert_allclose(np.asarray(ml), np.asarray(sl), atol=1e-4)

    def test_gradients_flow(self):
        feat = jnp.ones((8, 8, 2))
        boxes = jnp.array([[1.0, 1.0, 6.0, 6.0]])

        def loss(f):
            return ra_ops.roi_align(f, boxes, 7, 1.0, 2).sum()

        g = jax.grad(loss)(feat)
        assert float(jnp.abs(g).sum()) > 0


# ------------------------------ IoU3D ------------------------------

def aa_box_verts(cx, cy, cz, w, h, l):
    return np.asarray(G.cuboid_verts(jnp.array([cx, cy, cz, w, h, l], jnp.float32)))


class TestIoU3D:
    def test_identical_boxes(self):
        v = aa_box_verts(0, 0, 5, 2, 3, 4)[None]
        vol, iou = iou3d_ops.box3d_overlap(v, v)
        np.testing.assert_allclose(np.asarray(vol), [[24.0]], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(iou), [[1.0]], atol=1e-4)

    def test_disjoint(self):
        a = aa_box_verts(0, 0, 0, 1, 1, 1)[None]
        b = aa_box_verts(10, 0, 0, 1, 1, 1)[None]
        vol, iou = iou3d_ops.box3d_overlap(a, b)
        np.testing.assert_allclose(np.asarray(vol), [[0.0]], atol=1e-5)

    def test_axis_aligned_partial(self):
        # unit cubes offset by 0.5 in x: inter = 0.5, union = 1.5
        a = aa_box_verts(0, 0, 0, 1, 1, 1)[None]
        b = aa_box_verts(0.5, 0, 0, 1, 1, 1)[None]
        vol, iou = iou3d_ops.box3d_overlap(a, b)
        np.testing.assert_allclose(np.asarray(vol), [[0.5]], atol=1e-4)
        np.testing.assert_allclose(np.asarray(iou), [[1 / 3]], atol=1e-4)

    def test_contained_box(self):
        a = aa_box_verts(0, 0, 0, 4, 4, 4)[None]
        b = aa_box_verts(0, 0, 0, 2, 2, 2)[None]
        vol, iou = iou3d_ops.box3d_overlap(a, b)
        np.testing.assert_allclose(np.asarray(vol), [[8.0]], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(iou), [[8.0 / 64.0]], rtol=1e-4)

    def test_rotated_45_known_overlap(self):
        # two unit squares (extruded) at 45 degrees share a known 2D area:
        # square vs same square rotated 45deg about center:
        # intersection area = 2*(sqrt(2)-1) = 0.8284271
        Rz = np.asarray(G.axis_angle_to_matrix(jnp.array([0.0, np.pi / 4, 0.0])))
        a = aa_box_verts(0, 0, 0, 1, 1, 1)[None]
        b = np.asarray(
            G.cuboid_verts(jnp.array([0, 0, 0, 1, 1, 1.0]), jnp.asarray(Rz))
        )[None]
        vol, iou = iou3d_ops.box3d_overlap(a, b)
        expected = 2 * (np.sqrt(2) - 1)
        np.testing.assert_allclose(np.asarray(vol), [[expected]], rtol=1e-3)

    def test_rotation_invariance(self):
        rng = np.random.default_rng(4)
        q, r = np.linalg.qr(rng.standard_normal((3, 3)))
        q *= np.sign(np.diag(r))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        R = jnp.asarray(q.astype(np.float32))
        a = jnp.array([0, 0, 0, 1, 2, 3.0])
        b = jnp.array([0.3, 0.2, 0.4, 2, 1, 2.0])
        va, vb = G.cuboid_verts(a), G.cuboid_verts(b)
        _, iou_orig = iou3d_ops.box3d_overlap(va[None], vb[None])
        # rotate both boxes by the same R: IoU must be invariant
        var = jnp.einsum("ij,vj->vi", R, va)
        vbr = jnp.einsum("ij,vj->vi", R, vb)
        _, iou_rot = iou3d_ops.box3d_overlap(var[None], vbr[None])
        np.testing.assert_allclose(np.asarray(iou_orig), np.asarray(iou_rot), atol=1e-3)

    def test_pairwise_grid_shape(self):
        rng = np.random.default_rng(5)
        a = jnp.asarray(
            np.stack([aa_box_verts(*rng.uniform(0, 5, 3), *rng.uniform(1, 3, 3)) for _ in range(4)])
        )
        b = jnp.asarray(
            np.stack([aa_box_verts(*rng.uniform(0, 5, 3), *rng.uniform(1, 3, 3)) for _ in range(6)])
        )
        vol, iou = jax.jit(iou3d_ops.box3d_overlap)(a, b)
        assert vol.shape == (4, 6) and iou.shape == (4, 6)
        assert np.all(np.asarray(iou) >= 0) and np.all(np.asarray(iou) <= 1)

    def test_volume_from_faces_winding(self):
        # divergence-theorem volume over the shared face table must be exact
        v = jnp.asarray(aa_box_verts(3, -2, 7, 2, 3, 4))
        faces = jnp.asarray(G.CUBOID_FACES)
        tris = v[faces]
        contrib = jnp.sum(
            tris[:, 0] * jnp.cross(tris[:, 1], tris[:, 2]), axis=-1
        ) / 6.0
        assert np.isclose(abs(float(contrib.sum())), 24.0, rtol=1e-4)

    def test_self_pairs_far_from_origin(self):
        # Regression: the coplanarity tolerance must scale with coordinate
        # magnitude. With an absolute eps, f32 rounding on plane distances
        # at z~40 exceeded it and self-pair IoU collapsed to 0.
        rng = np.random.default_rng(7)
        boxes = []
        for _ in range(8):
            dims = rng.uniform(0.3, 3.0, 3)
            ang = rng.uniform(0, 2 * np.pi, 3)
            R = np.asarray(G.axis_angle_to_matrix(jnp.asarray(ang, jnp.float32)))
            c = np.r_[rng.uniform(-4, 4, 2), rng.uniform(30, 45)]
            boxes.append(
                np.asarray(
                    G.cuboid_verts(jnp.asarray(np.r_[c, dims], jnp.float32),
                                   jnp.asarray(R))
                )
            )
        v = jnp.asarray(np.stack(boxes))
        _, iou = iou3d_ops.box3d_overlap(v, v)
        diag = np.asarray(iou).diagonal()
        np.testing.assert_allclose(diag, 1.0, atol=1e-3)

    def test_batched_matches_pairwise(self):
        # the SoA batched grid must agree with independent 1x1 evaluations
        rng = np.random.default_rng(8)
        mk = lambda: aa_box_verts(*rng.uniform(-2, 2, 3), *rng.uniform(0.5, 3, 3))
        a = jnp.asarray(np.stack([mk() for _ in range(5)]))
        b = jnp.asarray(np.stack([mk() for _ in range(4)]))
        _, grid = iou3d_ops.box3d_overlap(a, b)
        for i in range(5):
            for j in range(4):
                _, one = iou3d_ops.box3d_overlap(a[i : i + 1], b[j : j + 1])
                np.testing.assert_allclose(
                    np.asarray(grid)[i, j], np.asarray(one)[0, 0], atol=1e-5
                )
