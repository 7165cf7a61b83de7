"""Training/eval driver loops (host orchestration around the jitted steps).

Equivalent of the reference engine (tools/train_net.py do_train:117-316,
do_test:56-114, retry loop main:431-467) redesigned for TPU SPMD:

  * DDP/NCCL bookkeeping disappears — the jitted train step is already
    globally sharded (engine/train.py),
  * the stabilizer's NaN/Inf skip happens in-graph; the host tracks the
    rolling-mean loss spike protocol (GAMMA/TOLERANCE, train_net.py:159-210)
    and the exploded-iteration budget that triggers restart-from-checkpoint
    (train_net.py:253-285, MODEL.STABILIZE),
  * evaluation shards the test set per process and funnels predictions into
    the Omni3D evaluation helper.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import build as data_build
from ..data import datasets as data_lib
from ..evaluation.omni3d_eval import (
    Omni3DEvaluationHelper,
    instances_to_predictions,
)
from ..models.rcnn3d import CubeRCNN, inference_kwargs, inference_step, preprocess
from .. import parallel
from ..solver.build import build_lr_schedule, build_optimizer
from ..utils import checkpoint as ckpt
from ..utils.events import EventStorage
from .train import TrainState, create_train_state, make_mesh, make_train_step

LOG_PERIOD = 20    # host<->device sync cadence (loss fetch + retry check)
MAX_TRAINING_ATTEMPTS = 10


def visualize_training(cfg, eval_model, state, batch, storage):
    """Write GT-vs-prediction panels for the first image of `batch`
    (reference meta_arch/rcnn3d.py:70-72,114-245; runs an eval-mode
    inference pass since the jitted train step only returns losses)."""
    from ..vis.vis import visualize_training_sample

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = inference_step(
        variables, eval_model,
        batch["images"][0:1], batch["Ks"][0:1], batch["ratios"][0:1],
        hw=batch["hw"][0:1],
        **inference_kwargs(cfg),
    )
    det = {k: np.asarray(v[0], np.float32) for k, v in out.items()}
    host_batch = {k: np.asarray(v) for k, v in batch.items()}
    try:
        thing_classes = data_lib.metadata("omni3d_model")["thing_classes"]
    except KeyError:
        thing_classes = [str(i) for i in range(cfg.MODEL.ROI_HEADS.NUM_CLASSES)]
    panels = visualize_training_sample(host_batch, det, cfg.MODEL.PIXEL_MEAN,
                                       cfg.MODEL.PIXEL_STD, thing_classes)
    storage.put_image("gt_vs_pred_2d", panels["2d"])
    storage.put_image("gt_vs_pred_3d", panels["3d"])


def build_eval_model(cfg):
    from ..config.cfg import StaticCfg

    scfg = cfg if not hasattr(cfg, "clone") else StaticCfg(cfg.clone())
    return CubeRCNN(cfg=scfg, train_mode=False,
                    dtype=jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32)


def run_inference_dataset(cfg, model, variables, dataset_name, id_map,
                          storage=None):
    """Inference over one test dataset -> the FULL prediction list on every
    process (reference inference_on_dataset, omni3d_evaluation.py:522-641):
    the loader is rank-sharded like detectron2's InferenceSampler and the
    per-process lists are merged with parallel.gather_objects — the
    TPU-native stand-in for `comm.gather(predictions, dst=0)` :633-639."""
    loader, n_total = data_build.build_detection_test_loader(
        cfg, dataset_name, batch_size=cfg.TPU.EVAL_BATCH_SIZE,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    contig_to_dataset = {v: k for k, v in id_map.items()}
    predictions = []
    next_id = 1
    t_data = t_compute = 0.0
    done = 0
    start = t_last_log = time.perf_counter()
    t0 = start
    for batch, records in loader:
        t_data += time.perf_counter() - t0
        t0 = time.perf_counter()
        out = inference_step(
            variables, model,
            jnp.asarray(batch["images"]), jnp.asarray(batch["Ks"]),
            jnp.asarray(batch["ratios"]), hw=jnp.asarray(batch["hw"]),
            **inference_kwargs(cfg),
        )
        out = jax.tree.map(lambda t: np.asarray(t, np.float32), out)
        t_compute += time.perf_counter() - t0
        for b, rec in enumerate(records):
            det = {k: v[b] for k, v in out.items()}
            preds = instances_to_predictions(det, rec["image_id"],
                                             contig_to_dataset, next_id)
            next_id += len(preds)
            predictions.extend(preds)
        done += len(records)
        now = time.perf_counter()
        # periodic progress + ETA (reference inference_on_dataset logs
        # data/compute s/iter + ETA every 5s, omni3d_evaluation.py:596-631);
        # per-IMAGE seconds here since the loader batches
        if now - t_last_log > 5.0 and done < n_total:
            per_img = (now - start) / done
            eta = int(per_img * (n_total - done))
            print(f"[eval] {dataset_name}: {done}/{n_total} images  "
                  f"data {t_data / done:.4f} s/img  "
                  f"compute {t_compute / done:.4f} s/img  "
                  f"total {per_img:.4f} s/img  ETA {eta // 60}m{eta % 60:02d}s")
            t_last_log = now
        t0 = time.perf_counter()
    if storage is not None:
        storage.put_scalar(f"eval/{dataset_name}/data_s", t_data)
        storage.put_scalar(f"eval/{dataset_name}/compute_s", t_compute)
    predictions = parallel.gather_objects(predictions)
    # per-process id counters collide after the merge: re-assign globally
    for i, p in enumerate(predictions):
        p["id"] = i + 1
    return predictions


def do_test(cfg, model, variables, output_dir=None, storage=None,
            datasets_root=None, iteration="final"):
    """Evaluate every cfg.DATASETS.TEST dataset (reference do_test:56-114).

    Predictions/results/vis land under <output_dir>/inference/iter_<N>/
    per the reference folder layout (train_net.py:66); after each dataset
    the per-instance error stats (xy/z/whl/ry vs matched GT) are logged and
    sample images with drawn detections are dumped (train_net.py:96-107,
    vis.py:76-196)."""
    from ..evaluation.error_stats import (compute_error_stats,
                                          error_log_string,
                                          visualize_from_predictions)

    filter_settings = data_lib.get_filter_settings_from_cfg(cfg)
    id_map = data_lib.metadata("omni3d_model")["thing_dataset_id_to_contiguous_id"]
    inference_dir = (os.path.join(output_dir, "inference", f"iter_{iteration}")
                     if output_dir else None)
    helper = Omni3DEvaluationHelper(list(cfg.DATASETS.TEST), filter_settings,
                                    inference_dir)
    try:
        thing_classes = data_lib.metadata("omni3d_model")["thing_classes"]
    except KeyError:
        thing_classes = [str(i) for i in range(cfg.MODEL.ROI_HEADS.NUM_CLASSES)]
    results = {}
    for name in cfg.DATASETS.TEST:
        preds = run_inference_dataset(cfg, model, variables, name, id_map, storage)
        json_file = data_lib.metadata(name).get("json_file")
        gt_api = data_lib.Omni3D([json_file], dict(filter_settings))
        helper.add_predictions(name, preds, gt_api)
        if jax.process_index() == 0:
            path = helper.save_predictions(name)
            if path:
                print(f"[eval] saved predictions -> {path}")
        results[name] = helper.evaluate(name)
        print(f"[eval] {name}: " + "  ".join(
            f"{k}={v:.2f}" for k, v in results[name].items()
            if k in ("AP2D", "AP3D")))
        if jax.process_index() == 0:
            # per-dataset 3D error stats + sample dumps (reference
            # train_net.py:102-107 -> vis.visualize_from_instances)
            anns = [dict(a) for a in gt_api.dataset.get("annotations", [])]
            for a in anns:  # raw Omni3D jsons carry the pose as R_cam
                a.setdefault("pose", a.get("R_cam"))
            Ks = {img["id"]: img["K"]
                  for img in gt_api.dataset.get("images", []) if "K" in img}
            n_cats = max(len(thing_classes), 1)
            stats = compute_error_stats(
                preds, anns, score_thresh=float(np.sqrt(1.0 / n_cats)), Ks=Ks)
            print("[eval] " + error_log_string(name, stats, iteration))
            results[name]["error_stats"] = stats
            if storage is not None:
                for k, v in stats.items():
                    if np.isfinite(v):
                        storage.put_scalar(f"eval/{name}/{k}", float(v))
            if inference_dir is not None:
                n_vis = visualize_from_predictions(
                    preds, gt_api, os.path.join(inference_dir, name),
                    thing_classes, datasets_root=datasets_root or "")
                if n_vis:
                    print(f"[eval] wrote {n_vis} vis samples -> "
                          f"{os.path.join(inference_dir, name, 'vis')}")
    results["summary"] = helper.summarize_all()
    if jax.process_index() == 0 and inference_dir is not None:
        helper.save_results()
    if results["summary"]:
        from ..vis.logperf import print_per_category_table

        print_per_category_table(results["summary"])
        print("[eval] " + "  ".join(
            f"{k}={v:.2f}" for k, v in results["summary"].items()
            if k.endswith(("AP2D", "AP3D"))))
    return results


def do_train(cfg, scfg, output_dir: str, resume: bool = False,
             max_steps: int | None = None, mesh=None, records=None,
             priors=None, eval_fn=None, seed: int = 0,
             profile_dir: str | None = None, init_variables_fn=None):
    """One training attempt; returns (success, state).

    success=False signals the retry protocol to restart from the last
    checkpoint (reference do_train returning False, train_net.py:258-285).

    init_variables_fn: optional {'params', 'batch_stats'} -> same, applied to
    the fresh init when NOT resuming from a native checkpoint — this is where
    MODEL.WEIGHTS / MODEL.WEIGHTS_PRETRAIN / ImageNet backbone weights enter
    the training path (reference train_net.py:139-145, dla.py:494).
    """
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    model = CubeRCNN(cfg=scfg, train_mode=True, dtype=dtype)
    tx = build_optimizer(cfg)
    schedule = build_lr_schedule(cfg)

    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(seed),
                               priors=priors)
    start_iter = 0
    loaded = ckpt.resume_or_load(output_dir) if resume else None
    if loaded is not None:
        tree, extra = loaded
        state = jax.tree.map(jnp.asarray, tree)
        start_iter = int(extra.get("iteration", 0)) + 1
    elif init_variables_fn is not None:
        v = init_variables_fn(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        if v is not None:
            state = state.replace(
                params=v["params"],
                batch_stats=v.get("batch_stats", state.batch_stats),
                opt_state=tx.init(v["params"]),
            )

    step_fn = make_train_step(scfg, model, tx, mesh=mesh)
    loader = data_build.build_detection_train_loader(
        cfg, records=records,
        process_index=jax.process_index(), process_count=jax.process_count(),
        seed=seed,
    )

    max_iter = max_steps or cfg.SOLVER.MAX_ITER
    period = cfg.SOLVER.CHECKPOINT_PERIOD
    checkpointer = ckpt.PeriodicCheckpointer(output_dir, period, max_iter)
    storage = EventStorage(output_dir, start_iter=start_iter)
    rng = jax.random.PRNGKey(seed + 100)

    vis_model = build_eval_model(cfg) if cfg.VIS_PERIOD > 0 else None

    # the divergence protocol (rolling mean, spike/NaN skip) lives IN the
    # jitted step (engine/train.py) — the host only reads the cumulative
    # skipped counter every LOG_PERIOD steps, so the loop dispatches
    # asynchronously instead of syncing on the loss each iteration
    # (reference train_net.py:186-252 syncs 3x per step).
    skipped0 = int(state.skipped)

    # each process loads IMS_PER_BATCH / process_count images; the sharded
    # step consumes the GLOBAL batch (see parallel.globalize_batch)
    assert cfg.SOLVER.IMS_PER_BATCH % jax.process_count() == 0, (
        f"IMS_PER_BATCH={cfg.SOLVER.IMS_PER_BATCH} not divisible by "
        f"process_count={jax.process_count()}")

    for iteration in range(start_iter, max_iter):
        # profile steps 10-14 (past compilation) when requested (SURVEY §5.1)
        if profile_dir and iteration == start_iter + 10:
            jax.profiler.start_trace(profile_dir)
        if profile_dir and iteration == start_iter + 15:
            jax.profiler.stop_trace()
        batch = parallel.globalize_batch(next(loader), mesh)
        state, logs = step_fn(state, batch, rng)

        last = iteration == max_iter - 1
        if iteration % LOG_PERIOD == 0 or last:
            host_logs = {k: float(v) for k, v in logs.items()}  # device sync
            for k, v in host_logs.items():
                storage.put_scalar(k, v)
            print("[train] " + storage.log_line(max_iter, lr=host_logs["lr"]))
            storage.write()

            # exploded-iteration budget -> restart from checkpoint
            # (reference train_net.py:253-285: cumulative per attempt, armed
            # after half a checkpoint period)
            exploded = int(state.skipped) - skipped0
            done = iteration - start_iter + 1
            if (done > period // 2
                    and exploded / done >= cfg.MODEL.STABILIZE > 0):
                print(f"[train] unstable: {exploded}/{done} exploded "
                      f"iterations; restarting from checkpoint")
                storage.close()
                return False, state
        storage.step()

        if (vis_model is not None and iteration > 0
                and iteration % cfg.VIS_PERIOD == 0
                and jax.process_index() == 0):
            try:
                visualize_training(cfg, vis_model, state, batch, storage)
            except Exception as e:  # vis must never kill a training run
                print(f"[train] visualization failed: {e}")

        if jax.process_index() == 0:
            checkpointer.step(iteration, state, {"iteration": iteration})
        if eval_fn is not None and (iteration + 1) % cfg.TEST.EVAL_PERIOD == 0:
            eval_fn(state, iteration)

    storage.close()
    return True, state


def train_with_retries(cfg, scfg, output_dir, **kwargs):
    """Retry-on-divergence wrapper (reference main:431-467)."""
    for attempt in range(MAX_TRAINING_ATTEMPTS):
        ok, state = do_train(cfg, scfg, output_dir,
                             resume=(attempt > 0) or kwargs.pop("resume", False),
                             **kwargs)
        if ok:
            return state
        print(f"[train] attempt {attempt + 1} failed; retrying")
    raise RuntimeError("Training diverged in all attempts")
