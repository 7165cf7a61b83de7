#!/usr/bin/env python
"""Folder-of-images Cube R-CNN inference demo.

Reference-compatible surface (reference demo/demo.py:159-203):
  python demo/demo.py --config-file configs/cubercnn_DLA34_FPN.yaml \
      --input-folder imgs/ [--focal-length f] [--principal-point px py] \
      [--threshold t] [--weights ckpt] [OPTS KEY VALUE ...]

Without --focal-length, the reference default f = 4*H/2 = 2*H is used
(demo.py:66-68). Writes <name>_boxes.jpg (2D+3D overlay), <name>_novel.jpg
(shaded top-down novel view, reference demo.py:123-124) and <name>_bev.jpg.
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="omni3d_tpu demo")
    p.add_argument("--config-file", required=True)
    p.add_argument("--input-folder", required=True)
    p.add_argument("--focal-length", type=float, default=0)
    p.add_argument("--principal-point", type=float, nargs=2, default=None)
    p.add_argument("--threshold", type=float, default=0.25)
    p.add_argument("--display", action="store_true",
                   help="show each result in a window (reference demo.py:169;"
                        " ignored on headless systems)")
    p.add_argument("--weights", default=None)
    p.add_argument("--output-dir", default=None)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    args = parse_args()

    import os

    import cv2
    import jax

    # honor JAX_PLATFORMS even when a device plugin ignores the env var
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from omni3d_tpu.config.cfg import StaticCfg
    from omni3d_tpu.config.defaults import get_default_cfg
    from omni3d_tpu.data.mapper import (pad_to_bucket, resize_image_bilinear,
                                        resize_shortest_edge)
    from omni3d_tpu.models.rcnn3d import (CubeRCNN, inference_kwargs,
                                          inference_step, preprocess)
    from omni3d_tpu.vis.vis import (draw_2d_box, draw_bev, get_color,
                                    render_scene_view)

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    scfg = StaticCfg(cfg)

    model = CubeRCNN(cfg=scfg, dtype=jnp.bfloat16)
    variables = None

    out_dir = args.output_dir or os.path.join(cfg.OUTPUT_DIR, "demo")
    os.makedirs(out_dir, exist_ok=True)

    paths = sorted(
        p for p in glob.glob(os.path.join(args.input_folder, "*"))
        if p.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    assert paths, f"no images in {args.input_folder}"

    # category names if available
    meta_path = os.path.join(cfg.OUTPUT_DIR, "category_meta.json")
    cats = None
    if os.path.exists(meta_path):
        import json

        with open(meta_path) as f:
            cats = json.load(f)["thing_classes"]

    for path in paths:
        img = cv2.imread(path)
        h, w = img.shape[:2]
        net_h, net_w = resize_shortest_edge(h, w, cfg.INPUT.MIN_SIZE_TEST,
                                            cfg.INPUT.MAX_SIZE_TEST)
        Hp, Wp = pad_to_bucket(net_h, net_w)
        resized = resize_image_bilinear(img, net_w, net_h)
        canvas = np.zeros((Hp, Wp, 3), np.uint8)
        canvas[:net_h, :net_w] = resized

        # intrinsics (reference demo.py:54-79): default f = 2*h, pp = center
        f = args.focal_length or 4 * h / 2
        px, py = args.principal_point or (w / 2, h / 2)
        K = np.array([[f, 0, px], [0, f, py], [0, 0, 1]], np.float32)

        images = preprocess(jnp.asarray(canvas[None]), cfg.MODEL.PIXEL_MEAN,
                            cfg.MODEL.PIXEL_STD)
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), images)
            if args.weights or cfg.MODEL.WEIGHTS:
                from tools.train_net import load_weights

                variables = load_weights(args, cfg, model, variables)

        ratio = h / net_h
        out = inference_step(variables, model, images, jnp.asarray(K[None]),
                             jnp.asarray([ratio]),
                             hw=jnp.asarray([[net_h, net_w]], jnp.float32),
                             **inference_kwargs(cfg))
        out = jax.tree.map(lambda t: np.asarray(t, np.float32)[0], out)

        keep = (out["valid"] > 0) & (out["scores"] >= args.threshold)
        idx = np.where(keep)[0]
        name = os.path.splitext(os.path.basename(path))[0]
        vis_img = img.copy()
        centers, dims, poses, labels, colors = [], [], [], [], []
        for rank, i in enumerate(idx):
            color = get_color(rank)
            label = (cats[int(out["classes"][i])] if cats else str(int(out["classes"][i])))
            label = f"{label} {out['scores'][i]:.2f}"
            draw_2d_box(vis_img, out["boxes_orig"][i], color, 2, label)
            centers.append(out["center_cam"][i])
            dims.append(out["dims"][i])
            poses.append(out["pose"][i])
            labels.append(label)
            colors.append(color)
        if centers:
            views = render_scene_view(vis_img, K, centers, dims, poses,
                                      colors=colors, mode="front_and_novel")
            vis_img = views["front"]
            # reference demo writes <name>_novel.jpg (demo/demo.py:123-124)
            cv2.imwrite(os.path.join(out_dir, f"{name}_novel.jpg"),
                        views["novel"])
            bev = draw_bev(centers, dims, poses, colors=colors)
            cv2.imwrite(os.path.join(out_dir, f"{name}_bev.jpg"), bev)
        cv2.imwrite(os.path.join(out_dir, f"{name}_boxes.jpg"), vis_img)
        if args.display:
            try:
                cv2.imshow(name, vis_img)
                cv2.waitKey(0)
            except cv2.error:
                print("[demo] --display unavailable (headless cv2)")
        print(f"[demo] {name}: {len(idx)} detections -> {out_dir}")


if __name__ == "__main__":
    main()
