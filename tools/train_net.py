#!/usr/bin/env python
"""Train/eval CLI, reference-compatible surface.

Usage (same flags as reference tools/train_net.py:500-510):
  python tools/train_net.py --config-file configs/Base_Omni3D.yaml [--eval-only]
      [--resume] [--num-machines N] [OPTS KEY VALUE ...]

The reference's per-GPU process `launch()` is replaced by JAX SPMD: one
process per host, the train step sharded over every local+remote device via a
1-D data mesh (jax.distributed handles multi-host rendezvous).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _pin_platform():
    """Honor JAX_PLATFORMS even when a device plugin ignores the env var
    (observed with the axon TPU plugin): pin via jax.config before any
    backend initialization."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


_pin_platform()


def parse_args():
    p = argparse.ArgumentParser(description="omni3d_tpu training")
    p.add_argument("--config-file", required=True)
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max-steps", type=int, default=None,
                   help="override SOLVER.MAX_ITER (smoke runs)")
    p.add_argument("--datasets-root", default=None,
                   help="root containing Omni3D/*.json (default ./datasets/Omni3D)")
    p.add_argument("--weights", default=None,
                   help="checkpoint to load: native .ckpt or reference .pth "
                        "(cubercnn:// URIs supported)")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of training steps here")
    p.add_argument("--dist-init", default=None,
                   help="jax.distributed coordinator address for multi-host")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="config overrides: KEY VALUE ...")
    return p.parse_args()


def setup(args):
    from omni3d_tpu.config.cfg import StaticCfg
    from omni3d_tpu.config.defaults import get_default_cfg
    from omni3d_tpu.data import datasets as data_lib

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    from omni3d_tpu.config.defaults import validate_cfg

    validate_cfg(cfg)
    filter_settings = data_lib.get_filter_settings_from_cfg(cfg)
    root = args.datasets_root or os.path.join("datasets", "Omni3D")
    for name in list(cfg.DATASETS.TRAIN) + list(cfg.DATASETS.TEST):
        data_lib.simple_register(name, filter_settings, filter_empty=False,
                                 datasets_root_path=root)
    cfg.freeze()
    return cfg, StaticCfg(cfg), filter_settings, root


def load_weights(args, cfg, model, variables):
    from omni3d_tpu.utils import checkpoint as ckpt_lib
    from omni3d_tpu.utils import model_zoo

    path = args.weights or cfg.MODEL.WEIGHTS
    if not path:
        return variables
    if path.endswith((".pth", ".pkl")) or path.startswith("cubercnn://"):
        sd = model_zoo.load_reference_weights(path)
        params, stats, report = ckpt_lib.convert_reference_checkpoint(
            sd, variables["params"], variables.get("batch_stats", {}), strict=False
        )
        print(f"[weights] loaded {report['loaded']} tensors from {path}; "
              f"missing={len(report['missing'])} unused={len(report['unused'])}")
        return {"params": params, "batch_stats": stats}
    tree, extra = ckpt_lib.load_checkpoint(path)
    print(f"[weights] resumed native checkpoint {path} @ iter {extra.get('iteration')}")
    import jax

    tree = jax.tree.map(np.asarray, tree)
    if isinstance(tree, dict):
        return {"params": tree.get("params", tree),
                "batch_stats": tree.get("batch_stats", {})}
    # TrainState dataclass
    return {"params": tree.params, "batch_stats": tree.batch_stats}


def make_train_init_fn(args, cfg):
    """Training-path weight initialization, reference precedence:

      1. MODEL.WEIGHTS_PRETRAIN: full-model weights, no optimizer state
         (reference train_net.py:139-142),
      2. --weights / MODEL.WEIGHTS: full-model load when not resuming
         (checkpointer.resume_or_load(cfg.MODEL.WEIGHTS), train_net.py:145),
      3. neither set: ImageNet backbone init (reference dla.py:494
         `imagenet_pretrain = WEIGHTS_PRETRAIN + WEIGHTS == ''`,
         resnet.py:66-96 torchvision pretrained=True).

    Returns a {'params','batch_stats'} -> same callable for engine.do_train.
    """
    from omni3d_tpu.utils import checkpoint as ckpt_lib
    from omni3d_tpu.utils import model_zoo

    explicit = args.weights or cfg.MODEL.WEIGHTS
    pretrain = cfg.MODEL.WEIGHTS_PRETRAIN

    def load_full(variables, path):
        if path.endswith((".pth", ".pkl")) or path.startswith("cubercnn://"):
            sd = model_zoo.load_reference_weights(path)
            params, stats, report = ckpt_lib.convert_reference_checkpoint(
                sd, variables["params"], variables.get("batch_stats", {}),
                strict=False,
            )
            print(f"[weights] train init from {path}: {report['loaded']} tensors"
                  f" missing={len(report['missing'])}"
                  f" unused={len(report['unused'])}")
            return {"params": params, "batch_stats": stats}
        tree, extra = ckpt_lib.load_checkpoint(path)
        import jax

        tree = jax.tree.map(np.asarray, tree)
        print(f"[weights] train init from native checkpoint {path}")
        if isinstance(tree, dict):
            return {"params": tree.get("params", tree),
                    "batch_stats": tree.get("batch_stats", {})}
        return {"params": tree.params, "batch_stats": tree.batch_stats}

    def init_fn(variables):
        if pretrain:
            variables = load_full(variables, pretrain)
        if explicit:
            variables = load_full(variables, explicit)
        elif not pretrain:
            path = model_zoo.find_imagenet_weights(cfg)
            if path is None:
                print("[weights] no ImageNet weights found "
                      f"(TPU.IMAGENET_WEIGHTS_DIR={cfg.TPU.IMAGENET_WEIGHTS_DIR!r})"
                      " — training the backbone from scratch")
                return variables
            sd = model_zoo.load_reference_weights(path)
            params, stats, report = ckpt_lib.convert_imagenet_backbone(
                sd, variables["params"], variables.get("batch_stats", {}),
                cfg.MODEL.BACKBONE.NAME,
            )
            print(f"[weights] ImageNet backbone init from {path}: "
                  f"{report['loaded']} tensors missing={len(report['missing'])}"
                  f" unused={len(report['unused'])}")
            variables = {"params": params, "batch_stats": stats}
        return variables

    return init_fn


def main():
    args = parse_args()
    if args.dist_init:
        import jax

        jax.distributed.initialize(args.dist_init, args.num_processes, args.process_id)

    import jax

    from omni3d_tpu.data import datasets as data_lib
    from omni3d_tpu.data.build import get_detection_dataset_dicts
    from omni3d_tpu.engine.loop import build_eval_model, do_test, train_with_retries
    from omni3d_tpu.engine.train import make_mesh
    from omni3d_tpu.utils.priors import compute_priors, priors_to_params
    from omni3d_tpu.vis.logperf import print_ap_analysis_table, print_cross_dataset_table

    cfg, scfg, filter_settings, root = setup(args)
    output_dir = cfg.OUTPUT_DIR
    os.makedirs(output_dir, exist_ok=True)

    # model category metadata (reference main:384)
    stats_path = os.path.join(root, "stats.json")
    data_lib.register_and_store_model_metadata(output_dir, filter_settings, stats_path)

    if args.eval_only:
        import jax.numpy as jnp

        model = build_eval_model(cfg)
        dummy = jnp.zeros((1, 128, 128, 3))
        variables = model.init(jax.random.PRNGKey(0), dummy)
        variables = load_weights(args, cfg, model, variables)
        results = do_test(cfg, model, variables, output_dir,
                          datasets_root=root, iteration="final")
        print_ap_analysis_table({k: v for k, v in results.items() if k != "summary"})
        if results["summary"]:
            print_cross_dataset_table(results["summary"])
        return results

    # priors from the merged train annotations (reference main:380-424)
    train_jsons = [os.path.join(root, n + ".json") for n in cfg.DATASETS.TRAIN]
    api = data_lib.Omni3D(train_jsons, dict(filter_settings))
    thing_classes = data_lib.metadata("omni3d_model")["thing_classes"]
    priors = compute_priors(cfg, api, thing_classes)
    prior_params = priors_to_params(priors, cfg.MODEL.ROI_HEADS.NUM_CLASSES,
                                    cfg.MODEL.ROI_CUBE_HEAD.CLUSTER_BINS)

    records = get_detection_dataset_dicts(cfg.DATASETS.TRAIN,
                                          cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS)
    mesh = make_mesh(None if cfg.TPU.MESH_DATA <= 0 else cfg.TPU.MESH_DATA)

    def eval_fn(state, iteration):
        model = build_eval_model(cfg)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        results = do_test(cfg, model, variables, output_dir,
                          datasets_root=root, iteration=iteration)
        print_ap_analysis_table({k: v for k, v in results.items() if k != "summary"})

    state = train_with_retries(
        cfg, scfg, output_dir, resume=args.resume, max_steps=args.max_steps,
        mesh=mesh, records=records, priors=prior_params, eval_fn=eval_fn,
        profile_dir=args.profile_dir, seed=max(cfg.SEED, 0),
        init_variables_fn=make_train_init_fn(args, cfg),
    )
    print("[train] finished")
    return state


if __name__ == "__main__":
    main()
