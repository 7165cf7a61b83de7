"""Shared synthetic Omni3D-format dataset fixture (jsons + images on disk)."""
import json
import os

import cv2
import numpy as np


def make_synthetic_omni3d(root: str, name: str = "Synth_train", n_images: int = 6,
                          categories=("chair", "table", "car"), seed: int = 0,
                          dataset_id: int = 7):
    """Write a tiny Omni3D-format json + images; returns (json_path, image_root).

    Geometry is self-consistent: boxes are projections of the 3D cuboids
    through K, so eval on model-free GT-echo predictions gives AP == 100.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "Omni3D"), exist_ok=True)
    img_dir = os.path.join(root, "images", name)
    os.makedirs(img_dir, exist_ok=True)

    cats = [{"id": 10 + i, "name": c, "supercategory": ""} for i, c in enumerate(categories)]
    images, annotations = [], []
    ann_id = 1
    W, H = 160, 120
    K = [[140.0, 0.0, W / 2], [0.0, 140.0, H / 2], [0.0, 0.0, 1.0]]

    for i in range(n_images):
        file_path = f"images/{name}/{i:04d}.jpg"
        cv2.imwrite(os.path.join(root, file_path),
                    rng.integers(0, 255, (H, W, 3), np.uint8))
        img_id = 1000 + i
        images.append({
            "id": img_id, "dataset_id": dataset_id, "width": W, "height": H,
            "file_path": file_path, "K": K, "src_90_rotate": 0, "src_flagged": 0,
        })
        for j in range(rng.integers(1, 4)):
            cat = cats[rng.integers(len(cats))]
            z = float(rng.uniform(3.0, 8.0))
            x = float(rng.uniform(-1.0, 1.0))
            y = float(rng.uniform(-0.5, 0.5))
            w3d, h3d, l3d = [float(v) for v in rng.uniform(0.5, 1.4, 3)]
            center = [x, y, z]
            R = np.eye(3)
            # project the cuboid for a consistent 2D box
            from omni3d_tpu.utils import geometry as G
            import jax.numpy as jnp
            verts = np.asarray(G.cuboid_verts(
                jnp.asarray([x, y, z, w3d, h3d, l3d]), jnp.asarray(R)))
            proj = (np.asarray(K) @ verts.T).T
            uv = proj[:, :2] / proj[:, 2:3]
            x1, y1 = np.clip(uv.min(0), 0, [W - 1, H - 1])
            x2, y2 = np.clip(uv.max(0), 0, [W - 1, H - 1])
            annotations.append({
                "id": ann_id, "image_id": img_id, "dataset_id": dataset_id,
                "category_id": cat["id"], "category_name": cat["name"],
                "valid3D": True, "behind_camera": False,
                "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                "bbox2D_proj": [float(x1), float(y1), float(x2), float(y2)],
                "bbox2D_trunc": [float(x1), float(y1), float(x2), float(y2)],
                "bbox2D_tight": [-1, -1, -1, -1],
                "bbox3D_cam": verts.tolist(),
                "center_cam": center, "dimensions": [w3d, h3d, l3d],
                "pose": R.tolist(), "R_cam": R.tolist(),
                "truncation": 0.0, "visibility": 1.0, "segmentation_pts": 100,
                "lidar_pts": 100, "depth_error": 0.0,
            })
            ann_id += 1

    data = {
        "info": {"id": dataset_id, "source": name.split("_")[0], "name": name,
                 "split": name.split("_")[-1], "version": "0.1", "url": ""},
        "images": images,
        "categories": cats,
        "annotations": annotations,
    }
    json_path = os.path.join(root, "Omni3D", f"{name}.json")
    with open(json_path, "w") as f:
        json.dump(data, f)

    stats = {
        "category_names": [c["name"] for c in cats],
        "categories": cats,
    }
    with open(os.path.join(root, "Omni3D", "stats.json"), "w") as f:
        json.dump(stats, f)
    return json_path, root
