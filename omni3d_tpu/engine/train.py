"""The jitted Cube R-CNN training step and SPMD wiring.

Replaces the reference's explicit GPU loop + DDP (tools/train_net.py:117-316,
SURVEY §2.4/§2.5): one pure function computes every loss of the model
(RPN IoUness, FastRCNN cls/reg, disentangled cube losses), takes the gradient,
and applies the optimizer — compiled once per input shape and sharded over a
1-D `data` mesh with `jax.jit` + NamedSharding. DDP's gradient all-reduce and
the reference's loss-dict all-reduce / cluster-wide skip protocol
(train_net.py:237-252, 471-498) all become XLA collectives inside the step:
losses/grads are computed on globally-sharded batches, and the in-graph
stabilizer (finite check -> skip update) is consistent across devices by
construction.
"""
from __future__ import annotations

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import anchors as anchor_lib
from ..models.rcnn3d import FEATURE_NAMES, FEATURE_STRIDES, CubeRCNN
from ..models.heads import decode_cube, select_per_class
from ..models.roi_training import (
    cube_losses,
    fast_rcnn_losses,
    label_and_sample_proposals,
)
from ..models.rpn import label_and_sample_anchors, rpn_losses, select_proposals
from ..ops.roi_align_pallas import multilevel_roi_align_fast
from ..parallel import make_mesh  # re-export: train entry points use it
from ..solver.build import build_lr_schedule


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    skipped: jnp.ndarray       # cumulative stabilizer-skipped updates
    recent_loss: jnp.ndarray   # rolling loss mean (reference recent_loss,
                               # train_net.py:168; < 0 means uninitialized)


def create_train_state(cfg, model: CubeRCNN, tx, rng, input_hw=(512, 512),
                       priors=None) -> TrainState:
    images = jnp.zeros((1, *input_hw, 3), jnp.float32)
    variables = model.init(rng, images)
    params = variables["params"]
    if priors is not None:
        params = dict(params)
        params["priors_dims_per_cat"] = jnp.asarray(priors["priors_dims_per_cat"], jnp.float32)
        if "priors_z_scales" in priors:
            params["priors_z_scales"] = jnp.asarray(priors["priors_z_scales"], jnp.float32)
        if "priors_z_stats" in priors:
            params["priors_z_stats"] = jnp.asarray(priors["priors_z_stats"], jnp.float32)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        skipped=jnp.zeros((), jnp.int32),
        recent_loss=-jnp.ones((), jnp.float32),
    )


def compute_losses(params, batch_stats, batch, rng, model: CubeRCNN, cfg,
                   train_bn: bool = True, img_offset=0):
    """All Cube R-CNN losses for one globally-batched step.

    batch: images (B,H,W,3) normalized, hw (B,2), Ks (B,3,3), ratios (B,),
      gt_boxes (B,G,4) net-res XYXY, gt_classes (B,G) (-1 rows = ignore
      regions), gt_valid (B,G) bool, gt_boxes3D (B,G,6), gt_poses (B,G,3,3).

    img_offset: index of batch[0] in the GLOBAL batch. Per-image sampling
    RNGs are derived by folding the global image index into the step rng, so
    the random draws are identical under ANY data-parallel layout (1 chip,
    an 8-device shard_map shard, a pod slice) — the property the
    DP-equivalence test asserts (tests/test_train.py).

    Returns (total_loss, (losses, metrics, new_batch_stats)).
    """
    images = batch["images"]
    B = images.shape[0]
    C = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    variables = {"params": params, "batch_stats": batch_stats}

    def features_fn(p, bs, im):
        if train_bn:
            return model.apply({"params": p, "batch_stats": bs}, im,
                               method=CubeRCNN.features, mutable=["batch_stats"])
        return (model.apply({"params": p, "batch_stats": bs}, im,
                            method=CubeRCNN.features), {"batch_stats": bs})

    if cfg.TPU.REMAT_BACKBONE:
        # trade backbone activation memory for recompute in the backward
        # (HBM is the constraint at large per-chip batch; conv FLOPs are not)
        features_fn = jax.checkpoint(features_fn)
    feats, mutated = features_fn(params, batch_stats, images)
    new_bs = mutated["batch_stats"] if train_bn else batch_stats
    # keep features in model dtype: upcasting here makes XLA hoist the
    # convert into the convs (conv_f32 runs ~1000x slower on this backend)
    flist = [feats[f] for f in FEATURE_NAMES]
    logits, deltas = model.apply(variables, flist, method=CubeRCNN.rpn)
    logits = [l.astype(jnp.float32) for l in logits]
    deltas = [d.astype(jnp.float32) for d in deltas]

    anchors = [
        jnp.asarray(a)
        for a in anchor_lib.pyramid_anchors(
            [(f.shape[1], f.shape[2]) for f in flist],
            FEATURE_STRIDES,
            cfg.MODEL.ANCHOR_GENERATOR.SIZES,
            cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
            cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
        )
    ]
    anchors_cat = jnp.concatenate(anchors, axis=0)

    # ---- RPN labels + losses ----
    rng, rng_anchor, rng_prop = jax.random.split(rng, 3)
    global_idx = img_offset + jnp.arange(B)
    anchor_rngs = jax.vmap(lambda i: jax.random.fold_in(rng_anchor, i))(global_idx)
    lab = jax.vmap(
        lambda r, gb, gc, gv: label_and_sample_anchors(
            r, anchors_cat, gb, gc, gv,
            batch_size=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
            fg_thresh=cfg.MODEL.RPN.IOU_THRESHOLDS[0],
            ignore_thresh=cfg.MODEL.RPN.IGNORE_THRESHOLD,
        )
    )(anchor_rngs, batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"])

    logits_cat = jnp.concatenate(logits, axis=1)
    deltas_cat = jnp.concatenate(deltas, axis=1)
    losses = rpn_losses(
        anchors_cat, lab["labels"], lab["matched_gt"], logits_cat, deltas_cat,
        batch_size=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
        objectness=cfg.MODEL.RPN.OBJECTNESS_UNCERTAINTY,
    )
    if cfg.MODEL.RPN.LOSS_WEIGHT != 1.0:
        losses = {k: v * cfg.MODEL.RPN.LOSS_WEIGHT for k, v in losses.items()}

    # ---- proposals (detached, reference RPN.predict_proposals no_grad) ----
    def per_image_proposals(lg, dl, hw):
        return select_proposals(
            anchors, lg, dl, hw,
            cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN, cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
            cfg.MODEL.RPN.NMS_THRESH,
        )

    prop_boxes, _, prop_valid = jax.vmap(per_image_proposals)(
        [lax.stop_gradient(l) for l in logits],
        [lax.stop_gradient(d) for d in deltas],
        batch["hw"].astype(jnp.float32),
    )

    # ---- sample proposals for the ROI heads ----
    S = cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
    F = int(S * cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION)
    prop_rngs = jax.vmap(lambda i: jax.random.fold_in(rng_prop, i))(global_idx)
    sampled = jax.vmap(
        lambda r, pb, pv, gb, gc, gv: label_and_sample_proposals(
            r, pb, pv, gb, gc, gv, C,
            batch_size=S,
            positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            iou_thresh=cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS[0],
            ignore_thresh=cfg.MODEL.RPN.IGNORE_THRESHOLD,
            append_gt=cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT,
        )
    )(prop_rngs, prop_boxes, prop_valid, batch["gt_boxes"], batch["gt_classes"],
      batch["gt_valid"])

    # ---- box branch ----
    def pool(boxes_b):
        if cfg.TPU.POOLER_EXACT_ROUTING:
            # XLA-gather oracle with canonical level routing; pooling is
            # linear in the features so plain autodiff gives the exact
            # transpose (scatter-add) backward — slower, for parity runs
            from ..ops.roi_align import multilevel_roi_align

            return jax.vmap(
                lambda fl, bx: multilevel_roi_align(
                    list(fl), bx, list(FEATURE_STRIDES),
                    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
                    cfg.TPU.ROI_SAMPLING_RATIO)
            )(list(flist), boxes_b)
        # pallas forward + pallas/XLA-transpose backward (linear op, exact VJP)
        return multilevel_roi_align_fast(
            tuple(flist), boxes_b, FEATURE_STRIDES,
            cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION, cfg.TPU.ROI_SAMPLING_RATIO,
        )

    # pool the box branch and (when enabled) the cube branch in ONE kernel
    # launch over the concatenated RoI set — the pyramid staging and the
    # backward scatter-add are shared instead of duplicated per pooler
    with_cube = cfg.MODEL.ROI_CUBE_HEAD.LOSS_W_3D > 0
    if with_cube:
        from ..models.heads import scale_proposals

        fg_boxes = sampled["boxes"][:, :F]
        cube_boxes = scale_proposals(fg_boxes, cfg.MODEL.ROI_CUBE_HEAD.SCALE_ROI_BOXES)
        pooled_all = pool(jnp.concatenate([sampled["boxes"], cube_boxes], axis=1))
        pooled, pooled_cube = pooled_all[:, :S], pooled_all[:, S:]
    else:
        pooled = pool(sampled["boxes"])
    scores2d, deltas2d = model.apply(
        variables, pooled.reshape(B * S, *pooled.shape[2:]), method=CubeRCNN.box_branch
    )
    gt_matched = jnp.take_along_axis(
        batch["gt_boxes"], sampled["gt_idx"][..., None], axis=1
    )
    losses.update(
        fast_rcnn_losses(
            scores2d.astype(jnp.float32).reshape(B * S, C + 1),
            deltas2d.astype(jnp.float32).reshape(B * S, C * 4),
            sampled["boxes"].reshape(B * S, 4),
            sampled["classes"].reshape(B * S),
            sampled["valid"].reshape(B * S),
            gt_matched.reshape(B * S, 4),
            C,
            tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
        )
    )

    metrics = {
        "roi/num_fg": jnp.mean(sampled["num_fg"].astype(jnp.float32)),
        "rpn/num_pos_anchors": jnp.mean(jnp.sum(lab["labels"] == 1, axis=1).astype(jnp.float32)),
        "rpn/num_neg_anchors": jnp.mean(jnp.sum(lab["labels"] == 0, axis=1).astype(jnp.float32)),
    }

    # ---- cube branch on the foreground slots ----
    if with_cube:
        fg_classes = jnp.clip(sampled["classes"][:, :F], 0, C - 1)
        fg_mask = sampled["fg"][:, :F]
        cube_out = model.apply(
            variables, pooled_cube.reshape(B * F, *pooled_cube.shape[2:]),
            method=CubeRCNN.cube_branch,
        )
        cube_out = jax.tree.map(lambda t: t.astype(jnp.float32), cube_out)
        priors_dims, priors_z_scales, priors_z_stats = model.apply(
            variables, method=CubeRCNN.prior_params
        )

        Ks_scaled = batch["Ks"] / batch["ratios"][:, None, None]
        Ks_scaled = Ks_scaled.at[:, 2, 2].set(1.0)
        Ks_per_box = jnp.broadcast_to(Ks_scaled[:, None], (B, F, 3, 3)).reshape(-1, 3, 3)

        ch = cfg.MODEL.ROI_CUBE_HEAD
        cube = decode_cube(
            cube_out, fg_classes.reshape(-1), fg_boxes.reshape(-1, 4),
            Ks_per_box, Ks_per_box[:, 1, 1],
            lax.stop_gradient(priors_dims),
            z_type=ch.Z_TYPE, virtual_depth=ch.VIRTUAL_DEPTH,
            virtual_focal=ch.VIRTUAL_FOCAL,
            dims_priors_enabled=ch.DIMS_PRIORS_ENABLED,
            dims_priors_func=ch.DIMS_PRIORS_FUNC, allocentric=ch.ALLOCENTRIC_POSE,
            priors_z_stats=lax.stop_gradient(priors_z_stats),
            priors_z_scales=lax.stop_gradient(priors_z_scales),
            cluster_bins=ch.CLUSTER_BINS,
        )
        gt_idx_fg = sampled["gt_idx"][:, :F]
        gt_b3d = jnp.take_along_axis(batch["gt_boxes3D"], gt_idx_fg[..., None], axis=1)
        gt_pose = jnp.take_along_axis(
            batch["gt_poses"], gt_idx_fg[..., None, None], axis=1
        )
        closs, cmetrics = cube_losses(
            cube, fg_mask.reshape(-1), gt_b3d.reshape(-1, 6),
            gt_pose.reshape(-1, 3, 3), Ks_per_box, ch, fg_boxes.reshape(-1, 4),
        )
        losses.update(closs)
        metrics.update(cmetrics)

    total = sum(losses.values())
    return total, (losses, metrics, new_bs)


def make_train_step(cfg, model: CubeRCNN, tx, mesh: Mesh | None = None,
                    stabilize: bool = True):
    """Build the jitted, sharded train step.

    Returns step_fn(state, batch, rng) -> (state, logs). With a mesh, the
    per-image pipeline is wrapped in `jax.shard_map` over the `data` axis:
    each device runs value_and_grad on ITS batch shard only (so the
    batch-sharded top_k / NMS fixpoint / dynamic-slice ops stay device-local
    and the SPMD partitioner never inserts all-to-alls/all-gathers around
    them), then loss/metrics/grads/batch-stats are pmean'd once. This is
    exactly the reference's DDP contract (train_net.py:451-454, SURVEY §2.4):
    local-batch BN (broadcast_buffers=False => per-GPU BN), per-rank loss
    normalization, gradient all-reduce. The stabilizer + optimizer run on the
    replicated post-pmean values, so the skip decision is all-device
    consistent by construction.
    """
    schedule = build_lr_schedule(cfg)
    train_bn = bool(cfg.MODEL.USE_BN)

    stabilize_on = stabilize and cfg.MODEL.STABILIZE > 0
    TOLERANCE = 4.0  # loss-spike skip threshold (reference train_net.py:164)
    GAMMA = 0.02     # rolling-mean gain (train_net.py:166)

    def local_value_and_grad(params, batch_stats, batch, rng, img_offset=0):
        grad_fn = jax.value_and_grad(compute_losses, has_aux=True)
        return grad_fn(params, batch_stats, batch, rng, model, cfg, train_bn,
                       img_offset)

    if mesh is not None:
        def sharded_value_and_grad(params, batch_stats, batch, rng):
            # per-image RNG derivation keyed by GLOBAL image index: shard d
            # of local size b holds global images [d*b, (d+1)*b), so every
            # image draws the same anchor/proposal samples as it would on
            # any other layout (tested: DP-equivalence, tests/test_train.py)
            offset = lax.axis_index("data") * batch["images"].shape[0]
            out = local_value_and_grad(params, batch_stats, batch, rng, offset)
            # one fused pmean = DDP grad all-reduce + the reference's
            # loss-dict all-reduce (train_net.py:471-498); XLA's
            # all-reduce combiner merges the per-leaf psums.
            return jax.tree.map(lambda t: lax.pmean(t, "data"), out)

        value_and_grad_fn = jax.shard_map(
            sharded_value_and_grad, mesh=mesh,
            in_specs=(P(), P(), P("data"), P()), out_specs=P(),
            check_vma=False,  # pallas_call inside; outputs pmean'd explicitly
        )
    else:
        value_and_grad_fn = local_value_and_grad

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        (total, (losses, metrics, new_bs)), grads = value_and_grad_fn(
            state.params, state.batch_stats, batch, rng
        )

        if stabilize_on:
            # full in-graph stabilizer (reference train_net.py:192-252):
            # skip the update on (a) a loss spike vs the rolling mean,
            # (b) a non-finite loss, (c) any non-finite gradient. The loss
            # here is already the global-batch loss under SPMD, so the
            # decision is all-device-consistent by construction (the
            # reference needs two all-reduces + syncs per step for this).
            finite_loss = jnp.isfinite(total)
            has_recent = state.recent_loss >= 0
            spiking = has_recent & (total > TOLERANCE * state.recent_loss)
            loss_diverging = spiking | ~finite_loss
            grad_finite = jnp.bool_(True)
            for g in jax.tree.leaves(grads):
                grad_finite &= jnp.all(jnp.isfinite(g))
            diverging = loss_diverging | ~grad_finite
            # rolling mean updates when the loss is not spiking/NaN
            # (train_net.py:193-210: init at 2x the first finite loss)
            new_recent = jnp.where(
                loss_diverging, state.recent_loss,
                jnp.where(has_recent,
                          (1 - GAMMA) * state.recent_loss + GAMMA * total,
                          2.0 * total))
            grads = jax.tree.map(
                lambda g: jnp.where(diverging, jnp.zeros_like(g), g), grads)
        else:
            diverging = jnp.bool_(False)
            new_recent = state.recent_loss

        ok = ~diverging
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        sel = lambda a, b: jax.tree.map(lambda x, y: jnp.where(ok, x, y), a, b)
        new_state = TrainState(
            step=state.step + 1,
            params=sel(new_params, state.params),
            batch_stats=sel(new_bs, state.batch_stats) if train_bn else state.batch_stats,
            opt_state=sel(new_opt, state.opt_state),
            skipped=state.skipped + diverging.astype(jnp.int32),
            recent_loss=new_recent,
        )
        logs = dict(losses)
        logs.update(metrics)
        logs["total_loss"] = total
        logs["lr"] = schedule(state.step)
        logs["finite"] = ok.astype(jnp.float32)
        return new_state, logs

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)

    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


