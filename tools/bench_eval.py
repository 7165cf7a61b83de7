"""AP-evaluation hot-loop benchmark (SURVEY §3.2: eval-time IoU3D N x M +
greedy matching is the reference's eval bottleneck,
omni3d_evaluation.py:1359-1431 / inference_on_dataset timing split :598-631).

Synthesizes a dataset at realistic per-image det/GT counts, then times the
full dual-mode evaluation (2D + 3D: computeIoU -> evaluateImg greedy
matching -> accumulate -> summarize) plus the isolated on-device IoU3D
kernel and the C++ greedy matcher, and writes EVAL_BENCH.json.

Usage: python tools/bench_eval.py [n_images] [out.json]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def synth(n_images=200, n_cats=20, gts_per_img=12, dets_per_img=35, seed=0):
    """COCO-style GT/pred dict lists with 9-DoF cuboids (jittered GTs +
    false positives, several categories per image)."""
    rng = np.random.default_rng(seed)
    gts, dts = [], []
    gid = did = 1
    for img in range(n_images):
        cats = rng.choice(n_cats, size=max(2, n_cats // 4), replace=False)
        boxes3d = []
        for g in range(gts_per_img):
            cat = int(rng.choice(cats))
            x, y = rng.uniform(50, 450, 2)
            w, h = rng.uniform(20, 120, 2)
            z = rng.uniform(2, 45)
            dims = rng.uniform(0.3, 3.0, 3)
            c = np.array([(x - 256) * z / 500, (y - 256) * z / 500, z])
            verts = _cuboid(c, dims)
            gts.append({
                "id": gid, "image_id": img, "category_id": cat,
                "bbox": [x, y, w, h], "area": w * h, "depth": z,
                "ignore2D": g % 7 == 6, "ignore3D": g % 7 == 6,
                "bbox3D": verts.tolist(),
            })
            boxes3d.append((cat, x, y, w, h, c, dims))
            gid += 1
        for d in range(dets_per_img):
            if d < len(boxes3d) and rng.random() < 0.75:  # jittered TP
                cat, x, y, w, h, c, dims = boxes3d[d]
                c = c + rng.normal(0, 0.15, 3)
                dims = dims * rng.uniform(0.9, 1.1, 3)
                x += rng.normal(0, 3)
                y += rng.normal(0, 3)
            else:  # FP
                cat = int(rng.choice(n_cats))
                x, y = rng.uniform(50, 450, 2)
                w, h = rng.uniform(20, 120, 2)
                z = rng.uniform(2, 45)
                dims = rng.uniform(0.3, 3.0, 3)
                c = np.array([(x - 256) * z / 500, (y - 256) * z / 500, z])
            dts.append({
                "id": did, "image_id": img, "category_id": cat,
                "bbox": [x, y, w, h], "area": w * h, "depth": float(c[2]),
                "score": float(rng.uniform(0.05, 1.0)),
                "bbox3D": _cuboid(c, dims).tolist(),
            })
            did += 1
    return gts, dts


def _cuboid(c, dims):
    sx, sy, sz = np.asarray(dims) / 2
    corners = np.array([[dx, dy, dz] for dx in (-sx, sx)
                        for dy in (-sy, sy) for dz in (-sz, sz)], np.float32)
    # reference vertex order is handled inside box3d_overlap's quad table;
    # any consistent axis-aligned order works for timing purposes
    order = [0, 1, 3, 2, 4, 5, 7, 6]
    return (corners[order] + np.asarray(c, np.float32))


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    from omni3d_tpu.evaluation import native
    from omni3d_tpu.evaluation.omni3d_eval import Omni3DEval, box3d_overlap

    gts, dts = synth(n_images)
    print(f"{n_images} images, {len(gts)} GTs, {len(dts)} dets, "
          f"native matcher: {native.available()}", flush=True)

    # warm the batched-IoU3D tiled kernel BEFORE timing: the first call
    # compiles (~20-30 s through the axon tunnel), which otherwise lands
    # inside the 3D evaluate() timing and dominates it (r5: 26 s of which
    # ~24 s was this compile)
    from omni3d_tpu.evaluation.omni3d_eval import Omni3DEval as _E
    from omni3d_tpu.evaluation.omni3d_eval import _tiled_iou3d_fn
    _fn = _tiled_iou3d_fn(_E._TILE_D, _E._TILE_G, _E._TILE_CHUNK)
    _d = np.zeros((_E._TILE_CHUNK, _E._TILE_D, 8, 3), np.float32) + \
        _cuboid([0, 0, 10], [1, 1, 1])
    _g = np.zeros((_E._TILE_CHUNK, _E._TILE_G, 8, 3), np.float32) + \
        _cuboid([0, 0, 10], [1, 1, 1])
    np.asarray(_fn(_d, _g))

    timings = {}
    results = {}
    for mode in ("2D", "3D"):
        ev = Omni3DEval(
            [dict(g) for g in gts], [dict(d) for d in dts], mode=mode)
        t0 = time.perf_counter()
        ev.evaluate()
        t_eval = time.perf_counter() - t0
        t0 = time.perf_counter()
        ev.accumulate()
        t_acc = time.perf_counter() - t0
        res = ev.summarize()
        timings[mode] = {"evaluate_s": t_eval, "accumulate_s": t_acc,
                         "s_per_img": (t_eval + t_acc) / n_images}
        results[mode] = res
        print(f"{mode}: evaluate {t_eval:.2f}s  accumulate {t_acc:.2f}s  "
              f"({(t_eval + t_acc) / n_images * 1e3:.2f} ms/img)  "
              f"AP{mode}={res.get(f'AP{mode}', float('nan')):.2f}", flush=True)

    # isolated kernel splits at a realistic per-(img,cat) size
    D, G = 50, 50
    rng = np.random.default_rng(1)
    dv = np.stack([_cuboid(rng.uniform(-5, 5, 3) + [0, 0, 10],
                           rng.uniform(0.3, 3, 3)) for _ in range(D)])
    gv = np.stack([_cuboid(rng.uniform(-5, 5, 3) + [0, 0, 10],
                           rng.uniform(0.3, 3, 3)) for _ in range(G)])
    box3d_overlap(dv.astype(np.float32), gv.astype(np.float32))  # compile
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        ious = box3d_overlap(dv.astype(np.float32), gv.astype(np.float32))
    t_iou = (time.perf_counter() - t0) / n
    # per-dispatch wall time includes the fixed ~26 ms axon-tunnel RTT; the
    # device-only kernel time (what batched eval pays per extra pair block)
    # is the RTT-subtracted figure (utils/benchtime.py)
    import jax as _jax
    rtt = 0.0
    if _jax.default_backend() == "tpu":
        from omni3d_tpu.utils.benchtime import calibrate_rtt
        rtt = calibrate_rtt()
    print(f"IoU3D {D}x{G}: {t_iou*1e3:.2f} ms/call "
          f"({max(t_iou-rtt,0)*1e3:.2f} ms device, rtt {rtt*1e3:.1f})",
          flush=True)
    timings["iou3d_50x50_ms"] = t_iou * 1e3
    timings["iou3d_50x50_device_ms"] = max(t_iou - rtt, 0.0) * 1e3

    if native.available():
        thrs = np.linspace(0.05, 0.5, 10)
        gt_ig = np.zeros(G, np.uint8)
        dt_ids = np.arange(1, D + 1, dtype=np.int64)
        gt_ids = np.arange(1, G + 1, dtype=np.int64)
        native.greedy_match(ious.astype(np.float32), thrs, gt_ig, None,
                            dt_ids, gt_ids)
        t0 = time.perf_counter()
        for _ in range(200):
            native.greedy_match(ious.astype(np.float32), thrs, gt_ig, None,
                                dt_ids, gt_ids)
        t_match = (time.perf_counter() - t0) / 200
        print(f"C++ greedy match {D}x{G}x10thr: {t_match*1e6:.1f} us/call",
              flush=True)
        timings["greedy_match_us"] = t_match * 1e6

    if len(sys.argv) > 2:
        import json
        import subprocess

        import jax

        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                capture_output=True, text=True).stdout.strip()
        out = {
            "n_images": n_images, "n_gts": len(gts), "n_dts": len(dts),
            "backend": jax.default_backend(),
            "native_matcher": native.available(),
            "timings": timings,
            "ap": {m: results[m].get(f"AP{m}") for m in ("2D", "3D")},
            "git_commit": commit,
        }
        with open(sys.argv[2], "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {sys.argv[2]}")


if __name__ == "__main__":
    main()
