"""Evaluation suite tests: GT-echo gives AP=100, controlled degradations."""
import os

import numpy as np
import pytest

from omni3d_tpu.evaluation.omni3d_eval import (
    Omni3DEval,
    Omni3DEvaluationHelper,
    Omni3DParams,
    box3d_overlap,
    gts_from_api,
)
from omni3d_tpu.utils import geometry as G

import jax.numpy as jnp


def make_gt_dt(n_images=4, cats=(1, 2), seed=0, perturb=0.0, drop=0):
    """Synthetic GT + echo DT (optionally perturbed / dropped)."""
    rng = np.random.default_rng(seed)
    gts, dts = [], []
    gid = did = 1
    for img in range(n_images):
        for cat in cats:
            for _ in range(rng.integers(1, 3)):
                x, y = rng.uniform(0, 80, 2)
                w, h = rng.uniform(10, 40, 2)
                z = rng.uniform(2, 40)
                dims = rng.uniform(0.5, 2.0, 3)
                c3d = [rng.uniform(-1, 1), rng.uniform(-1, 1), z]
                verts = np.asarray(G.cuboid_verts(
                    jnp.asarray([*c3d, *dims], jnp.float32)))
                gts.append({
                    "id": gid, "image_id": img, "category_id": cat,
                    "bbox": [x, y, w, h], "area": w * h, "depth": z,
                    "ignore2D": False, "ignore3D": False,
                    "bbox3D": verts.tolist(),
                })
                gid += 1
                if drop and (gid % drop == 0):
                    continue
                verts_d = verts + perturb * rng.standard_normal(3)[None]
                dts.append({
                    "id": did, "image_id": img, "category_id": cat,
                    "bbox": [x + perturb, y, w, h], "area": w * h,
                    "score": float(rng.uniform(0.5, 1.0)),
                    "depth": z, "bbox3D": verts_d.tolist(),
                })
                did += 1
    return gts, dts


class TestParams:
    def test_thresholds(self):
        p2 = Omni3DParams("2D")
        np.testing.assert_allclose(p2.iouThrs, np.linspace(0.5, 0.95, 10))
        p3 = Omni3DParams("3D")
        np.testing.assert_allclose(p3.iouThrs, np.linspace(0.05, 0.5, 10))
        assert p3.areaRng[1:] == [[0, 10], [10, 35], [35, 1e5]]


class TestBox3DOverlap:
    def test_identity(self):
        v = np.asarray(G.cuboid_verts(jnp.asarray([0, 0, 5, 1, 1, 1.0])))[None]
        iou = box3d_overlap(v, v)
        np.testing.assert_allclose(iou, [[1.0]], atol=1e-4)

    def test_degenerate_dt_zeroed(self):
        v = np.asarray(G.cuboid_verts(jnp.asarray([0, 0, 5, 1, 1, 1.0])))[None]
        flat = v.copy()
        flat[0, :, 1] = 0.0  # zero height -> zero volume
        iou = box3d_overlap(flat, v)
        np.testing.assert_allclose(iou, [[0.0]], atol=1e-6)

    def test_empty(self):
        assert box3d_overlap(np.zeros((0, 8, 3)), np.zeros((3, 8, 3))).shape == (0, 3)

    def test_precompute_matches_wrapper_path(self):
        # The batched tiled precompute (one fixed-shape call for all
        # (image, category) groups, groups split across 8x8 tiles) must give
        # bit-identical evaluation results to the per-group wrapper path.
        # Groups are sized PAST the tile edge (12 dets x 10 gts) so the
        # tile-splitting and score-sort/truncation logic is exercised.
        rng = np.random.default_rng(3)
        gts, dts = [], []
        gid = did = 1
        for img in range(3):
            for cat in (1, 2):
                gverts = []
                for _ in range(10):
                    z = rng.uniform(2, 30)
                    c = [rng.uniform(-3, 3), rng.uniform(-2, 2), z]
                    dims = rng.uniform(0.5, 2.5, 3)
                    v = np.asarray(G.cuboid_verts(
                        jnp.asarray([*c, *dims], jnp.float32)))
                    gverts.append(v)
                    x, y, w, h = rng.uniform(0, 80), rng.uniform(0, 80), 20, 20
                    gts.append({
                        "id": gid, "image_id": img, "category_id": cat,
                        "bbox": [x, y, w, h], "area": w * h, "depth": z,
                        "ignore2D": False, "ignore3D": False,
                        "bbox3D": v.tolist(),
                    })
                    gid += 1
                for d in range(12):
                    v = (gverts[d % 10]
                         + rng.normal(0, 0.1, 3)[None]).astype(np.float32)
                    dts.append({
                        "id": did, "image_id": img, "category_id": cat,
                        "bbox": [rng.uniform(0, 80), rng.uniform(0, 80), 20, 20],
                        "area": 400.0, "depth": float(v[:, 2].mean()),
                        "score": float(rng.uniform(0.05, 1.0)),
                        "bbox3D": v.tolist(),
                    })
                    did += 1

        ev_pre = Omni3DEval([dict(g) for g in gts], [dict(d) for d in dts],
                            mode="3D")
        ev_pre.evaluate()
        ev_pre.accumulate()
        res_pre = ev_pre.summarize()

        ev_wrap = Omni3DEval([dict(g) for g in gts], [dict(d) for d in dts],
                             mode="3D")
        ev_wrap._precompute_iou3d = lambda: None  # force the wrapper path
        ev_wrap.evaluate()
        ev_wrap.accumulate()
        res_wrap = ev_wrap.summarize()

        for k, a in res_pre.items():
            b = res_wrap[k]
            if isinstance(a, float) and np.isnan(a):
                assert np.isnan(b), k
            else:
                assert a == b, (k, a, b)


class TestOmni3DEval:
    def test_perfect_predictions_ap100(self):
        gts, dts = make_gt_dt()
        for mode in ("2D", "3D"):
            ev = Omni3DEval(gts, dts, mode=mode)
            ev.evaluate()
            ev.accumulate()
            stats = ev.summarize()
            key = "AP2D" if mode == "2D" else "AP3D"
            assert stats[key] == pytest.approx(100.0, abs=0.5), stats

    def test_dropped_predictions_reduce_recall(self):
        gts, dts = make_gt_dt(drop=2)
        ev = Omni3DEval(gts, dts, mode="2D")
        ev.evaluate()
        ev.accumulate()
        stats = ev.summarize()
        assert stats["AP2D"] < 90.0
        assert stats["AR2D@100"] < 90.0

    def test_perturbed_3d_lowers_high_iou_ap(self):
        gts, dts = make_gt_dt(perturb=0.15)
        ev = Omni3DEval(gts, dts, mode="3D")
        ev.evaluate()
        ev.accumulate()
        stats = ev.summarize()
        # low-threshold AP (0.05-0.15) stays high, strict AP@50 drops more
        assert stats["AP3D@15"] > stats["AP3D@50"] - 1e-6

    def test_ignored_gts_dont_count(self):
        gts, dts = make_gt_dt()
        for g in gts:
            g["ignore2D"] = True
            g["ignore3D"] = True
        ev = Omni3DEval(gts, [], mode="2D")
        ev.evaluate()
        ev.accumulate()
        stats = ev.summarize()
        assert stats["AP2D"] == -1.0  # nothing evaluable

    def test_depth_ranges(self):
        # one near gt (z=5) one far (z=50); echo predictions
        gts, dts = [], []
        for i, z in enumerate([5.0, 50.0]):
            verts = np.asarray(G.cuboid_verts(jnp.asarray([0, 0, z, 1, 1, 1.0])))
            gts.append({"id": i + 1, "image_id": 0, "category_id": 1,
                        "bbox": [0, 0, 10, 10], "area": 100, "depth": z,
                        "ignore2D": False, "ignore3D": False, "bbox3D": verts.tolist()})
            dts.append({"id": i + 1, "image_id": 0, "category_id": 1,
                        "bbox": [0, 0, 10, 10], "score": 0.9, "depth": z,
                        "bbox3D": verts.tolist()})
        ev = Omni3DEval(gts, dts, mode="3D")
        ev.evaluate()
        ev.accumulate()
        stats = ev.summarize()
        assert stats["AP3D-near"] == pytest.approx(100.0, abs=0.5)
        assert stats["AP3D-far"] == pytest.approx(100.0, abs=0.5)

    def test_proximity_mode_ignores_far_detections(self):
        gts, dts = make_gt_dt(n_images=2)
        # add spurious detections far away from any gt box
        extra = []
        for i, d in enumerate(dts[:3]):
            e = dict(d)
            e["id"] = 9000 + i
            e["bbox"] = [500.0, 500.0, 20.0, 20.0]
            e["score"] = 0.99
            v = np.asarray(e["bbox3D"]) + 100.0
            e["bbox3D"] = v.tolist()
            extra.append(e)
        # without proximity: spurious dts are false positives -> AP drops
        ev = Omni3DEval(gts, dts + extra, mode="2D", eval_prox=False)
        ev.evaluate(); ev.accumulate()
        ap_plain = ev.summarize()["AP2D"]
        # with proximity: they're outside all gt neighborhoods -> ignored
        ev2 = Omni3DEval(gts, dts + extra, mode="2D", eval_prox=True)
        ev2.evaluate(); ev2.accumulate()
        ap_prox = ev2.summarize()["AP2D"]
        assert ap_prox == pytest.approx(100.0, abs=0.5)
        assert ap_plain < ap_prox

    def test_per_category(self):
        gts, dts = make_gt_dt()
        ev = Omni3DEval(gts, dts, mode="2D")
        ev.evaluate(); ev.accumulate(); ev.summarize()
        pc = ev.per_category_ap()
        assert set(pc) == {1, 2}
        for v in pc.values():
            assert v == pytest.approx(100.0, abs=0.5)


class TestHelper:
    def test_concat_reaccumulation(self):
        helper = Omni3DEvaluationHelper(["A_test", "B_test"], {})

        class FakeAPI:
            def __init__(self, gts):
                self.dataset = {"annotations": gts}

        for i, name in enumerate(["A_test", "B_test"]):
            gts, dts = make_gt_dt(seed=i)
            anns = [{
                "id": g["id"] + 100 * i, "image_id": g["image_id"] + 100 * i,
                "category_id": g["category_id"], "bbox": g["bbox"],
                "area": g["area"], "center_cam": [0, 0, g["depth"]],
                "ignore": False, "bbox3D_cam": g["bbox3D"],
            } for g in gts]
            preds = [{**d, "id": d["id"] + 100 * i, "image_id": d["image_id"] + 100 * i}
                     for d in dts]
            helper.add_predictions(name, preds, FakeAPI(anns))
            res = helper.evaluate(name)
            assert res["AP2D"] == pytest.approx(100.0, abs=0.5)
            assert res["AP3D"] == pytest.approx(100.0, abs=0.5)

        allres = helper.summarize_all()
        assert allres["Concat/AP2D"] == pytest.approx(100.0, abs=0.5)
        assert allres["Concat/AP3D"] == pytest.approx(100.0, abs=0.5)

    def test_prox_dataset_detection(self):
        assert Omni3DEvaluationHelper.eval_prox_for("SUNRGBD_test")
        assert Omni3DEvaluationHelper.eval_prox_for("Objectron_val")
        assert not Omni3DEvaluationHelper.eval_prox_for("KITTI_test")

    @staticmethod
    def _fake_api(gts, cat_names):
        class FakeAPI:
            def __init__(self):
                self.dataset = {
                    "annotations": gts,
                    "categories": [{"id": i, "name": n}
                                   for i, n in cat_names.items()],
                }
        return FakeAPI()

    @staticmethod
    def _register(helper, name, gts, dts, cat_names, shift):
        anns = [{
            "id": g["id"] + shift, "image_id": g["image_id"] + shift,
            "category_id": g["category_id"], "bbox": g["bbox"],
            "area": g["area"], "center_cam": [0, 0, g["depth"]],
            "ignore": False, "bbox3D_cam": g["bbox3D"],
        } for g in gts]
        preds = [{**d, "id": d["id"] + shift, "image_id": d["image_id"] + shift}
                 for d in dts]
        helper.add_predictions(name, preds, TestHelper._fake_api(anns, cat_names))
        helper.evaluate(name)

    def test_summary_is_mean_of_per_category_aps(self):
        """Reference semantics (:443-459): Concat AP = mean of per-category
        APs from ONE overall re-accumulation — hand-checked against the
        per-category values."""
        helper = Omni3DEvaluationHelper(["A_test", "B_test"], {})
        # dataset A: only 'car' (echo -> AP 100); B: only 'chair', degraded
        gts_a, dts_a = make_gt_dt(cats=(1,), seed=0)
        gts_b, dts_b = make_gt_dt(cats=(2,), seed=1, drop=2)
        self._register(helper, "A_test", gts_a, dts_a, {1: "car"}, 0)
        self._register(helper, "B_test", gts_b, dts_b, {2: "chair"}, 1000)
        s = helper.summarize_all()

        ap_car = s["Concat/AP2D-car"]
        ap_chair = s["Concat/AP2D-chair"]
        assert ap_car == pytest.approx(100.0, abs=0.5)
        assert ap_chair < 99.0  # dropped detections -> recall gap
        assert s["Concat/AP2D"] == pytest.approx((ap_car + ap_chair) / 2, abs=1e-6)
        ap3_car, ap3_chair = s["Concat/AP3D-car"], s["Concat/AP3D-chair"]
        assert s["Concat/AP3D"] == pytest.approx((ap3_car + ap3_chair) / 2, abs=1e-6)
        # {car, chair} does not cover the omni3d_out category set -> nan
        assert np.isnan(s["Omni3D_Out/AP2D"])
        assert np.isnan(s["Omni3D_In/AP3D"])

    def test_omni3d_out_split_when_covered(self):
        """Out split = mean per-cat AP over get_omni3d_categories('omni3d_out')
        once the evaluated categories cover it (reference :477-488)."""
        from omni3d_tpu.data.builtin import get_omni3d_categories

        out_cats = sorted(get_omni3d_categories("omni3d_out"))
        ids = {i + 1: n for i, n in enumerate(out_cats)}
        helper = Omni3DEvaluationHelper(["A_test"], {})
        gts, dts = make_gt_dt(n_images=2, cats=tuple(ids), seed=0)
        self._register(helper, "A_test", gts, dts, ids, 0)
        s = helper.summarize_all()
        assert s["Omni3D_Out/AP2D"] == pytest.approx(100.0, abs=0.5)
        per_cat = [s[f"Concat/AP3D-{n}"] for n in out_cats]
        assert s["Omni3D_Out/AP3D"] == pytest.approx(np.mean(per_cat), abs=1e-6)
        # indoor categories absent -> nan
        assert np.isnan(s["Omni3D_In/AP2D"])


class TestNativeMatcher:
    def test_native_matches_python(self):
        """The C++ matcher must agree with the python loop bit-for-bit."""
        from omni3d_tpu.evaluation import native
        if not native.available():
            pytest.skip("native matcher unavailable")
        rng = np.random.default_rng(0)
        for trial in range(20):
            D, G = rng.integers(1, 12, 2)
            ious = rng.uniform(0, 1, (D, G)).astype(np.float32)
            thrs = np.linspace(0.05, 0.5, 10)
            gtIg = rng.integers(0, 2, G).astype(np.uint8)
            # sort gts ignore-last like _evaluate_img does
            order = np.argsort(gtIg, kind="mergesort")
            gtIg = gtIg[order]
            ious = ious[:, order]
            use_prox = trial % 2 == 0
            prox = rng.random((D, G)) > 0.3 if use_prox else None
            dt_ids = np.arange(1, D + 1, dtype=np.int64)
            gt_ids = np.arange(101, 101 + G, dtype=np.int64)

            dtm_c, gtm_c, dtig_c = native.greedy_match(
                ious, thrs, gtIg, prox, dt_ids, gt_ids)

            T = len(thrs)
            dtm = np.zeros((T, D)); gtm = np.zeros((T, G)); dtIg = np.zeros((T, D))
            for t_i, t in enumerate(thrs):
                for d in range(D):
                    iou = min(t, 1 - 1e-10); m = -1
                    for g in range(G):
                        if use_prox and not prox[d, g]:
                            continue
                        if gtm[t_i, g] > 0:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[g] == 1:
                            break
                        if ious[d, g] < iou:
                            continue
                        iou = ious[d, g]; m = g
                    if m == -1:
                        continue
                    dtIg[t_i, d] = gtIg[m]
                    dtm[t_i, d] = gt_ids[m]
                    gtm[t_i, m] = dt_ids[d]
            np.testing.assert_array_equal(dtm_c, dtm, err_msg=f"trial {trial}")
            np.testing.assert_array_equal(gtm_c, gtm)
            np.testing.assert_array_equal(dtig_c.astype(np.float64), dtIg)

    def test_available(self):
        from omni3d_tpu.evaluation import native
        assert native.available()  # g++ is part of the baked toolchain


class TestRenderAndErrorStats:
    def test_zbuffer_visibility(self):
        import jax.numpy as jnp
        from omni3d_tpu.utils.render import estimate_visibility, render_depth_map
        K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
        # box B directly behind box A: A fully visible, B mostly occluded
        boxes = np.array([[0, 0, 5, 2, 2, 2], [0, 0, 9, 2, 2, 2.0]])
        poses = np.tile(np.eye(3), (2, 1, 1))
        vis = estimate_visibility(K, boxes, poses, 64, 64)
        assert vis[0] > 0.99
        assert vis[1] < 0.2
        sil, depth, inds = render_depth_map(K, boxes, poses, 64, 64)
        d = np.asarray(depth)
        assert np.isfinite(d).any()
        # nearest face of box A is at z=4
        assert abs(d[32, 32] - 4.0) < 0.1

    def test_truncation(self):
        from omni3d_tpu.utils.render import estimate_truncation
        K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
        # centered box: no truncation
        t0 = estimate_truncation(K, [0, 0, 10, 1, 1, 1], np.eye(3), 64, 64)
        assert t0 < 0.05
        # box far off to the side: heavily truncated
        t1 = estimate_truncation(K, [5.0, 0, 10, 1, 1, 1], np.eye(3), 64, 64)
        assert t1 > 0.5

    def test_error_stats(self):
        from omni3d_tpu.evaluation.error_stats import compute_error_stats
        gts, dts = make_gt_dt()
        for g in gts:
            g["center_cam"] = [0.0, 0.0, g["depth"]]
            g["dimensions"] = [1.0, 1.0, 1.0]
            g["pose"] = np.eye(3).tolist()
            g["ignore"] = False
        for d in dts:
            d["center_cam"] = [0.1, 0.0, d["depth"] + 0.5]
            d["dimensions"] = [1.2, 1.0, 1.0]
            d["pose"] = np.eye(3).tolist()
        stats = compute_error_stats(dts, gts, score_thresh=0.0)
        assert stats["n_matched"] > 0
        assert abs(stats["mean_z_error"] - 0.5) < 1e-5
        assert abs(stats["mean_xy_error"] - 0.1) < 1e-5
        assert abs(stats["mean_whl_error"] - 0.2 / 3) < 1e-5
        assert stats["mean_rot_deg_error"] < 1.0


class TestTrainingVisualization:
    @pytest.mark.heavy  # runs an eval-mode model pass (41 s compile on CPU)
    def test_visualize_training_sample(self, tmp_path):
        from omni3d_tpu.utils.events import EventStorage
        from omni3d_tpu.vis.vis import visualize_training_sample

        B, G, K_det = 1, 4, 8
        rng = np.random.default_rng(0)
        batch = {
            "images": rng.normal(size=(B, 64, 96, 3)).astype(np.float32),
            "hw": np.array([[64.0, 96.0]], np.float32),
            "Ks": np.array([[[100.0, 0, 48], [0, 100.0, 32], [0, 0, 1]]], np.float32),
            "ratios": np.ones(B, np.float32),
            "gt_boxes": np.array([[[10, 10, 40, 40]] * G], np.float32),
            "gt_boxes3D": np.tile(
                np.array([30.0, 25.0, 5.0, 1.0, 1.0, 1.0], np.float32), (B, G, 1)),
            "gt_poses": np.tile(np.eye(3, dtype=np.float32), (B, G, 1, 1)),
            "gt_classes": np.zeros((B, G), np.int32),
            "gt_valid": np.array([[True, True, False, False]]),
        }
        det = {
            "boxes": rng.uniform(5, 60, (K_det, 4)).astype(np.float32),
            "scores": np.linspace(0.9, 0.1, K_det).astype(np.float32),
            "classes": np.zeros(K_det, np.float32),
            "valid": np.ones(K_det, np.float32),
            "center_cam": np.tile([0.0, 0.0, 5.0], (K_det, 1)).astype(np.float32),
            "dims": np.ones((K_det, 3), np.float32),
            "pose": np.tile(np.eye(3, dtype=np.float32), (K_det, 1, 1)),
        }
        panels = visualize_training_sample(batch, det, [103.5, 116.3, 123.7],
                                           [57.4, 57.1, 58.4], ["chair", "table"])
        assert panels["2d"].shape == (64, 192, 3)
        assert panels["3d"].shape == (64, 192, 3)
        # GT panel differs from pred panel (boxes drawn in different places)
        assert not np.array_equal(panels["3d"][:, :96], panels["3d"][:, 96:])

        storage = EventStorage(str(tmp_path))
        path = storage.put_image("gt_vs_pred_3d", panels["3d"])
        assert path is not None and os.path.exists(path)

    def test_put_image_no_output_dir(self):
        from omni3d_tpu.utils.events import EventStorage
        assert EventStorage().put_image("x", np.zeros((4, 4, 3), np.uint8)) is None


def test_render_scene_view_front_and_novel():
    """Shaded front render + auto-zoom novel view produce sane images
    (reference vis.py:210-538)."""
    import numpy as np

    from omni3d_tpu.vis.vis import render_scene_view

    img = np.full((120, 160, 3), 90, np.uint8)
    K = np.array([[150.0, 0, 80], [0, 150.0, 60], [0, 0, 1]])
    centers = [[0.0, 0.5, 5.0], [1.0, 0.5, 8.0]]
    dims = [[1.0, 1.0, 1.0], [0.5, 2.0, 0.5]]
    poses = [np.eye(3), np.eye(3)]
    out = render_scene_view(img, K, centers, dims, poses, labels=["a", "b"],
                            scale=128)
    front, novel = out["front"], out["novel"]
    assert front.shape == img.shape and front.dtype == np.uint8
    assert novel.shape == (128, 128, 3)
    # front view must differ from the input where the boxes project
    assert (front != img).any()
    # novel view: ground grid (gray 175ish lines over 225 bg) + colored boxes
    assert (novel != 225).any()
    # a rendered box silhouette exists (some saturated color pixels)
    assert (novel.astype(int).max(-1) - novel.astype(int).min(-1) > 30).any()


def test_render_scene_view_empty():
    import numpy as np

    from omni3d_tpu.vis.vis import render_scene_view

    img = np.zeros((60, 80, 3), np.uint8)
    K = np.eye(3)
    out = render_scene_view(img, K, [], [], [], scale=64)
    assert out["front"].shape == img.shape
    assert (out["novel"] == 225).all()
