"""Per-dataset prediction-vs-GT error statistics.

Equivalent of the reference's eval-time error logging
(cubercnn/vis/vis.py:76-196 visualize_from_instances): match confident
predictions to GTs by 2D IoU and report mean absolute errors of the 3D
variables (xy center, depth, dimensions, rotation angle).
"""
from __future__ import annotations

import numpy as np

from ..utils.boxes import iou_np
from ..utils import geometry as G

import jax.numpy as jnp


def compute_error_stats(predictions: list, gts: list, iou_thresh: float = 0.5,
                        score_thresh: float = 0.5) -> dict:
    """Args are Omni3DEval-style dict lists (predictions need center_cam /
    dimensions / pose; gts need the matching raw annotation fields)."""
    by_img: dict = {}
    for g in gts:
        by_img.setdefault(g["image_id"], []).append(g)

    errs = {"xy": [], "z": [], "whl": [], "rot_deg": []}
    n_matched = 0
    for p in predictions:
        if p["score"] < score_thresh:
            continue
        cands = [g for g in by_img.get(p["image_id"], [])
                 if g["category_id"] == p["category_id"] and not g.get("ignore", False)]
        if not cands:
            continue
        pb = np.asarray(p["bbox"], np.float64)
        pb = np.array([[pb[0], pb[1], pb[0] + pb[2], pb[1] + pb[3]]])
        gb = np.array([[g["bbox"][0], g["bbox"][1],
                        g["bbox"][0] + g["bbox"][2], g["bbox"][1] + g["bbox"][3]]
                       for g in cands])
        ious = iou_np(pb, gb)[0]
        j = int(np.argmax(ious))
        if ious[j] < iou_thresh:
            continue
        g = cands[j]
        n_matched += 1
        pc = np.asarray(p["center_cam"])
        gc = np.asarray(g["center_cam"])
        errs["xy"].append(float(np.linalg.norm(pc[:2] - gc[:2])))
        errs["z"].append(abs(float(pc[2] - gc[2])))
        errs["whl"].append(float(np.abs(
            np.asarray(p["dimensions"]) - np.asarray(g["dimensions"])).mean()))
        ang = G.so3_relative_angle(
            jnp.asarray(p["pose"], jnp.float32)[None],
            jnp.asarray(g["pose"], jnp.float32)[None],
        )
        errs["rot_deg"].append(float(np.degrees(np.asarray(ang)[0])))

    out = {"n_matched": n_matched}
    for k, v in errs.items():
        out[f"mean_{k}_error"] = float(np.mean(v)) if v else float("nan")
    return out
