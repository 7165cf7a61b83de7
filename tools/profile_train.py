"""Stage-level timing of the TRAINING step on the real chip.

Ablation ladder (each jitted lax.scan with carry dependence, bench.py
methodology): backbone fwd, full loss fwd, fwd+bwd with/without pooler
gradients, full step with optimizer. Differences between rungs attribute
wall time to the backward pieces that XLA fuses out of reach of a tracer.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, args, n=10):
    """Shared DCE-proof harness (utils/benchtime.timed_scan)."""
    from omni3d_tpu.utils.benchtime import calibrate_rtt, timed_scan

    global _RTT
    if _RTT is None:
        _RTT = calibrate_rtt()
        print(f"calibrated per-call RTT: {_RTT*1e3:.2f} ms", file=sys.stderr)
    return timed_scan(fn, args, n, _RTT)


_RTT = None


def main():
    import jax
    import jax.numpy as jnp

    from omni3d_tpu.config.cfg import StaticCfg
    from omni3d_tpu.config.defaults import get_default_cfg
    from omni3d_tpu.engine.train import compute_losses, create_train_state
    from omni3d_tpu.models.rcnn3d import CubeRCNN, preprocess
    from omni3d_tpu.solver.build import build_optimizer

    cfg = get_default_cfg()
    cfg.merge_from_file("configs/cubercnn_DLA34_FPN.yaml")
    scfg = StaticCfg(cfg)
    model = CubeRCNN(cfg=scfg, train_mode=True, dtype=jnp.bfloat16)
    tx = build_optimizer(cfg, None)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H = W = 512
    G = 64
    rng = np.random.default_rng(0)
    imgs = preprocess(
        jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.int32)),
        cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD,
    )
    xy = rng.uniform(0, 380, (B, G, 2)).astype(np.float32)
    wh = rng.uniform(16, 120, (B, G, 2)).astype(np.float32)
    batch = {
        "images": imgs,
        "Ks": jnp.tile(jnp.asarray([[[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]]]), (B, 1, 1)),
        "ratios": jnp.ones(B),
        "hw": jnp.tile(jnp.asarray([[512, 512]]), (B, 1)),
        "gt_boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1)),
        "gt_classes": jnp.asarray(rng.integers(0, scfg.MODEL.ROI_HEADS.NUM_CLASSES, (B, G)), jnp.int32),
        "gt_valid": jnp.asarray(rng.random((B, G)) < 0.3),
        "gt_boxes3D": jnp.asarray(
            np.concatenate([
                xy + wh / 2, rng.uniform(2, 40, (B, G, 1)), rng.uniform(0.2, 3, (B, G, 3)),
            ], -1).astype(np.float32)),
        "gt_poses": jnp.broadcast_to(jnp.eye(3), (B, G, 3, 3)),
    }
    key = jax.random.PRNGKey(1)
    train_bn = bool(cfg.MODEL.USE_BN)
    params, bs = state.params, state.batch_stats

    print(f"B={B} backend={jax.default_backend()}", file=sys.stderr)
    stages = {}

    def rec(name, t, extra=""):
        stages[name] = t * 1e3
        print(f"{name:<23}: {t*1e3:8.2f} ms{extra}", flush=True)

    # 1. backbone forward alone
    feats_fn = lambda p, im: model.apply(
        {"params": p, "batch_stats": bs}, im,
        method=CubeRCNN.features, mutable=["batch_stats"])[0]["p2"]
    t = timed(feats_fn, (params, imgs))
    rec("backbone fwd (train BN)", t)

    # 2. full loss forward
    def loss_fwd(p, batch):
        total, (losses, metrics, new_bs) = compute_losses(
            p, bs, batch, key, model, scfg, train_bn)
        return total

    t = timed(loss_fwd, (params, batch))
    rec("loss forward", t)

    # 2b. forward sub-rungs: where the fwd - inference gap lives
    from omni3d_tpu.models import anchors as anchor_lib
    from omni3d_tpu.models.rcnn3d import FEATURE_NAMES, FEATURE_STRIDES
    from omni3d_tpu.models.roi_training import label_and_sample_proposals
    from omni3d_tpu.models.rpn import (label_and_sample_anchors,
                                       select_proposals)

    feats = jax.jit(lambda p, im: model.apply(
        {"params": p, "batch_stats": bs}, im, method=CubeRCNN.features,
        mutable=["batch_stats"])[0])(params, imgs)
    flist = [feats[f] for f in FEATURE_NAMES]
    logits, deltas = jax.jit(lambda p, f: model.apply(
        {"params": p, "batch_stats": bs}, f, method=CubeRCNN.rpn))(params, flist)
    logits = [l.astype(jnp.float32) for l in logits]
    deltas = [d.astype(jnp.float32) for d in deltas]
    anchors = [jnp.asarray(a) for a in anchor_lib.pyramid_anchors(
        [(f.shape[1], f.shape[2]) for f in flist], FEATURE_STRIDES,
        scfg.MODEL.ANCHOR_GENERATOR.SIZES,
        scfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
        scfg.MODEL.ANCHOR_GENERATOR.OFFSET)]
    anchors_cat = jnp.concatenate(anchors, axis=0)

    def lab_fn(gb, gc, gv):
        rngs = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
        return jax.vmap(lambda r, b_, c_, v_: label_and_sample_anchors(
            r, anchors_cat, b_, c_, v_,
            batch_size=scfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            positive_fraction=scfg.MODEL.RPN.POSITIVE_FRACTION,
            fg_thresh=scfg.MODEL.RPN.IOU_THRESHOLDS[0],
            ignore_thresh=scfg.MODEL.RPN.IGNORE_THRESHOLD,
        ))(rngs, gb, gc, gv)
    t = timed(lab_fn, (batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"]))
    rec("  anchor label+sample", t)

    def props_fn(logits, deltas, hw):
        return jax.vmap(lambda lg, dl, h: select_proposals(
            anchors, lg, dl, h,
            scfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
            scfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
            scfg.MODEL.RPN.NMS_THRESH))(logits, deltas, hw)
    t = timed(props_fn, (logits, deltas, batch["hw"].astype(jnp.float32)))
    rec("  proposal select (train topk)", t)
    prop_boxes, _, prop_valid = jax.jit(props_fn)(
        logits, deltas, batch["hw"].astype(jnp.float32))

    Csz = scfg.MODEL.ROI_HEADS.NUM_CLASSES

    def samp_fn(prop_boxes, prop_valid, gb, gc, gv):
        rngs = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
        return jax.vmap(lambda r, pb, pv, b_, c_, v_: label_and_sample_proposals(
            r, pb, pv, b_, c_, v_, Csz,
            batch_size=scfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            positive_fraction=scfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            iou_thresh=scfg.MODEL.ROI_HEADS.IOU_THRESHOLDS[0],
            ignore_thresh=scfg.MODEL.RPN.IGNORE_THRESHOLD,
            append_gt=scfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT,
        ))(rngs, prop_boxes, prop_valid, gb, gc, gv)
    t = timed(samp_fn, (prop_boxes, prop_valid, batch["gt_boxes"],
                        batch["gt_classes"], batch["gt_valid"]))
    rec("  proposal sample (ROI)", t)

    # every weight-grad must be consumed or XLA DCEs its matmul and the
    # rung under-reports (grad leaf0 alone keeps only the dgrad chain)
    def _consume(tree):
        return sum(leaf.ravel()[0].astype(jnp.float32)
                   for leaf in jax.tree.leaves(tree))

    # 3. forward + backward (no optimizer)
    grad_fn = jax.grad(loss_fwd)
    t = timed(lambda p, b: _consume(grad_fn(p, b)), (params, batch))
    rec("loss fwd+bwd", t)

    # 4. fwd+bwd with pooler gradient stopped (isolates ROIAlign backward)
    import omni3d_tpu.engine.train as T
    from jax import lax as jlax

    def loss_fwd_nopool(p, batch):
        import omni3d_tpu.ops.roi_align_pallas as RA

        orig = RA.multilevel_roi_align_fast

        def stopped(*a, **k):
            return jlax.stop_gradient(orig(*a, **k))

        RA.multilevel_roi_align_fast = stopped
        T.multilevel_roi_align_fast = stopped
        try:
            total, _ = compute_losses(p, bs, batch, key, model, scfg, train_bn)
        finally:
            RA.multilevel_roi_align_fast = orig
            T.multilevel_roi_align_fast = orig
        return total

    t = timed(lambda p, b: _consume(jax.grad(loss_fwd_nopool)(p, b)),
              (params, batch))
    rec("fwd+bwd, pool grad off", t)

    # 5. full train step (from bench_train): fwd+bwd+optimizer
    from omni3d_tpu.engine.train import make_train_step

    step_fn = make_train_step(scfg, model, tx)

    def full_step(s, b):
        # consume the UPDATED params, not just the loss: the loss alone
        # depends only on the forward, and XLA DCEs the whole backward
        # (observed: "full step" == "loss forward" to 0.2 ms)
        new_state, logs = step_fn(s, b, key)
        return (logs["total_loss"]
                + jax.tree.leaves(new_state.params)[0].ravel()[0])

    t = timed(full_step, (state, batch))
    rec("full train step", t, f"  ({B/t:7.1f} img/s)")

    # derived attribution: bwd = (fwd+bwd) - fwd; pooler bwd = (fwd+bwd) -
    # (fwd+bwd w/ pool grad stopped); optimizer+overhead = full - (fwd+bwd)
    stages["  bwd (derived)"] = stages["loss fwd+bwd"] - stages["loss forward"]
    stages["  pooler bwd (derived)"] = (stages["loss fwd+bwd"]
                                        - stages["fwd+bwd, pool grad off"])
    stages["  optimizer+overhead (derived)"] = (stages["full train step"]
                                                - stages["loss fwd+bwd"])
    for k in ("  bwd (derived)", "  pooler bwd (derived)",
              "  optimizer+overhead (derived)"):
        print(f"{k:<23}: {stages[k]:8.2f} ms", flush=True)

    if len(sys.argv) > 2:
        import json

        try:
            cost = jax.jit(loss_fwd).lower(params, batch).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            fwd_flops = float(cost.get("flops", 0.0))
        except Exception:
            fwd_flops = 0.0
        # rule of thumb: bwd ~ 2x fwd FLOPs (dgrad + wgrad)
        step_flops = 3.0 * fwd_flops
        peak = 197.0 if "v5 lite" in jax.devices()[0].device_kind else 0.0
        full_s = stages["full train step"] / 1e3
        out = {
            "batch": B, "image_hw": [H, W],
            "backend": jax.default_backend(),
            "device_kind": jax.devices()[0].device_kind,
            "stage_ms": stages,
            "full_step_ms": stages["full train step"],
            "img_per_s": B / full_s,
            "fwd_flops_cost_analysis": fwd_flops,
            "step_flops_est_3x_fwd": step_flops,
            "tflops_per_s": step_flops / full_s / 1e12,
            "mfu_vs_bf16_peak": (step_flops / full_s / 1e12 / peak) if peak else None,
            "peak_tflops_assumed": peak,
            "rtt_ms_subtracted": _RTT * 1e3,
        }
        with open(sys.argv[2], "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {sys.argv[2]}", file=sys.stderr)


if __name__ == "__main__":
    main()
