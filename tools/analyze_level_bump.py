"""Quantify the pooler level-bump routing deviation (PARITY.md #2).

The pallas pooler bumps boxes whose bilinear tap footprint fits neither a
2-window x split nor a 2-window y split at their canonically-assigned FPN
level to the first coarser level where it fits (ops/roi_align_pallas.py
_plan; reference canonical assignment: detectron2 level routing as bound at
/root/reference/cubercnn/modeling/roi_heads/roi_heads.py:166-171). This
tool bounds the deviation on synthetic box distributions:

  1. fraction of boxes bumped, per distribution scenario;
  2. pooled-value delta for bumped boxes: pallas (bumped level) vs the
     XLA oracle (canonical level) on random features — relative L1 and
     cosine similarity of the 7x7xC pooled tensors.

Scenarios approximate realistic Omni3D detection statistics at 512px: a
log-normal sqrt(area) (median ~64-96px) crossed with log-normal aspect
ratios of increasing spread (indoor objects are near-boxy; outdoor scenes
add wide vehicles up to ~4:1). No real annotations ship in this
environment — when Omni3D jsons are present, re-run with --from-json to
use measured 2D GT statistics instead.

Usage: JAX_PLATFORMS=cpu python tools/analyze_level_bump.py [out.json]
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def synth_boxes(rng, n, med_sqrt_area, sigma_area, sigma_aspect,
                img=512.0):
    """(n, 4) xyxy boxes: log-normal sqrt(area) and aspect, clipped to the
    image; centers uniform."""
    s = med_sqrt_area * np.exp(rng.normal(0, sigma_area, n))
    a = np.exp(rng.normal(0, sigma_aspect, n))  # w/h
    w = np.clip(s * np.sqrt(a), 4, img - 1)
    h = np.clip(s / np.sqrt(a), 4, img - 1)
    cx = rng.uniform(w / 2, img - w / 2)
    cy = rng.uniform(h / 2, img - h / 2)
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def main():
    import jax
    import jax.numpy as jnp

    from omni3d_tpu.ops import roi_align_pallas as rap
    from omni3d_tpu.ops.roi_align import (assign_fpn_levels,
                                          multilevel_roi_align, roi_align)

    STRIDES = [4, 8, 16, 32, 64]
    IMG = 512
    level_shapes = [(IMG // s, IMG // s) for s in STRIDES]
    rng = np.random.default_rng(0)

    scenarios = [
        # (label, median sqrt(area) px, sigma_area, sigma_aspect)
        ("indoor-boxy", 80.0, 0.5, 0.25),
        ("mixed", 80.0, 0.6, 0.45),
        ("outdoor-wide", 96.0, 0.6, 0.65),
        ("extreme-aspect", 80.0, 0.5, 0.9),
    ]

    results = {}
    N = 20000
    for label, med, sa, sasp in scenarios:
        boxes = jnp.asarray(synth_boxes(rng, N, med, sa, sasp),
                            jnp.float32)
        canon = np.asarray(assign_fpn_levels(boxes, 2, 6)) - 2
        for geom in (("bf16", 48, 16), ("f32", 40, 8)):
            gname, BY, align = geom
            lvl = np.asarray(rap._plan(
                boxes, STRIDES, level_shapes, 7, 2, 2, BY, align)[0])
            bumped = lvl != canon
            key = f"{label}/{gname}"
            results[key] = {
                "n": N,
                "bumped_frac": float(bumped.mean()),
                "bump_by_delta": {
                    str(d): int((lvl - canon == d).sum())
                    for d in range(1, 5) if (lvl - canon == d).any()
                },
                "bumped_frac_per_canon_level": {
                    str(l): float(bumped[canon == l].mean())
                    for l in range(5) if (canon == l).any()
                },
            }
            print(f"{key:>24}: bumped {bumped.mean()*100:5.2f}%  "
                  f"per-level "
                  + " ".join(f"p{l+2}:{bumped[canon==l].mean()*100:.1f}%"
                             for l in range(5) if (canon == l).any()),
                  flush=True)

    # ---- pooled-value delta for bumped boxes (bf16 geometry, f32 math:
    # isolates the routing deviation from dtype rounding) ----
    C = 64
    feats = [jnp.asarray(rng.standard_normal((1,) + s + (C,)),
                         jnp.float32) for s in level_shapes]
    boxes = jnp.asarray(synth_boxes(rng, 4000, 80.0, 0.6, 0.45), jnp.float32)
    canon = np.asarray(assign_fpn_levels(boxes, 2, 6)) - 2
    lvl = np.asarray(rap._plan(boxes, STRIDES, level_shapes, 7, 2, 2,
                               48, 16)[0])
    bumped = np.where(lvl != canon)[0][:256]
    if bumped.size:
        bb = boxes[jnp.asarray(bumped)]
        want = multilevel_roi_align([f[0] for f in feats], bb, STRIDES, 7, 2)
        # pallas values at the bumped level == single-level oracle there
        # (exactness tested in tests/test_roi_align_pallas.py); use the
        # oracle to avoid interpret-mode cost at this scale
        got = np.stack([
            np.asarray(roi_align(feats[l][0], bb[i:i + 1], 7,
                                 1.0 / STRIDES[l], 2))[0]
            for i, l in enumerate(lvl[bumped])
        ])
        want = np.asarray(want)
        rel_l1 = np.abs(got - want).sum(axis=(1, 2, 3)) / (
            np.abs(want).sum(axis=(1, 2, 3)) + 1e-9)
        cos = (got * want).sum(axis=(1, 2, 3)) / (
            np.linalg.norm(got.reshape(len(got), -1), axis=1)
            * np.linalg.norm(want.reshape(len(want), -1), axis=1) + 1e-9)
        results["value_delta_bumped"] = {
            "n": int(bumped.size),
            "rel_l1_mean": float(rel_l1.mean()),
            "rel_l1_p90": float(np.percentile(rel_l1, 90)),
            "cosine_mean": float(cos.mean()),
            "cosine_min": float(cos.min()),
        }
        print(f"value delta on {bumped.size} bumped boxes (random feats): "
              f"rel-L1 mean {rel_l1.mean():.3f} p90 "
              f"{np.percentile(rel_l1, 90):.3f}, cosine mean {cos.mean():.3f}"
              f" min {cos.min():.3f}")

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {sys.argv[1]}", file=sys.stderr)


if __name__ == "__main__":
    main()
