"""Stage-level timing of the inference pipeline on the real chip.

Times each pipeline stage inside a jitted lax.scan (same methodology as
bench.py: amortizes the axon tunnel RTT) so the per-stage costs sum to
roughly the end-to-end step cost. The FIXED ~26 ms per-device-call tunnel
RTT is calibrated once (empty scan) and subtracted from every measurement —
at n=10 the uncorrected inflation is ~2.6 ms/stage, which swamps small
stages (utils/benchtime.py). All arrays are passed as jit arguments
(closing over device arrays bakes them into the HLO as literals, which the
axon remote-compile endpoint rejects at >100MB).
"""
import sys

import numpy as np

sys.path.insert(0, ".")

from omni3d_tpu.utils.benchtime import calibrate_rtt, timed_call  # noqa: E402

_RTT = None


def timed(fn, args, n=10):
    """Per-call seconds of fn(*args), RTT-subtracted. Stages that land
    near/below the RTT noise floor (jitter ~0.3 ms / n) are re-measured
    at n=100 so the subtraction error shrinks 10x instead of silently
    reporting 0.0 (advisor r4 findings on benchtime clamping)."""
    t = _timed_n(fn, args, n)
    if t < 0.3e-3:  # below/near the n=10 noise floor (~30 us resolution)
        t = _timed_n(fn, args, 100)
    return max(t, 0.0)


def _timed_n(fn, args, n):
    import jax
    import jax.numpy as jnp
    from jax import lax

    global _RTT
    if _RTT is None:
        _RTT = calibrate_rtt()
        print(f"calibrated per-call RTT: {_RTT*1e3:.2f} ms", file=sys.stderr)

    @jax.jit
    def run(args):
        def body(carry, _):
            # perturb EVERY inexact input by the carry so every iteration
            # depends on the previous one — with only one perturbed leaf,
            # XLA hoists all compute not downstream of it out of the scan
            # (e.g. the deltas decode of the NMS stage) and the stage
            # under-reports. Costs one elementwise add per input.
            perturbed = jax.tree.map(
                lambda leaf: leaf + carry.astype(leaf.dtype) * 1e-12
                if jnp.issubdtype(leaf.dtype, jnp.inexact) else leaf,
                args,
            )
            out = fn(*perturbed)
            # consume ONE element of EVERY output leaf: forcing only the
            # first leaf lets XLA dead-code-eliminate sibling outputs (e.g.
            # 4 of 5 RPN levels, or the whole cube branch of the full step
            # whose outputs don't feed "boxes") and under-report the stage
            acc = jnp.float32(0)
            for leaf in jax.tree.leaves(out):
                acc = acc + leaf.ravel()[0].astype(jnp.float32)
            return carry + acc * 1e-12, ()

        c, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return c

    return timed_call(run, args, n, _RTT)


def flops_of(fn, args):
    """XLA cost-analysis FLOPs of the jitted fn (0 if unavailable)."""
    import jax

    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    import jax
    import jax.numpy as jnp

    from omni3d_tpu.config.cfg import StaticCfg
    from omni3d_tpu.config.defaults import get_default_cfg
    from omni3d_tpu.models import anchors as anchor_lib
    from omni3d_tpu.models.rcnn3d import (FEATURE_NAMES, FEATURE_STRIDES,
                                          CubeRCNN, inference_impl, preprocess)
    from omni3d_tpu.models.rpn import select_proposals
    from omni3d_tpu.models.heads import fast_rcnn_inference, scale_proposals
    from omni3d_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_pallas_batched, stage_pyramid)

    cfg = get_default_cfg()
    cfg.merge_from_file("configs/cubercnn_DLA34_FPN.yaml")
    scfg = StaticCfg(cfg)
    model = CubeRCNN(cfg=scfg, dtype=jnp.bfloat16)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    H = W = 512
    rng = np.random.default_rng(0)
    imgs = preprocess(
        jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.int32)),
        cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD,
    )
    params = model.init(jax.random.PRNGKey(0), imgs[:1])
    Ks = jnp.tile(jnp.asarray([[[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]]]), (B, 1, 1))
    ratios = jnp.ones(B)
    C = scfg.MODEL.ROI_HEADS.NUM_CLASSES

    print(f"B={B} backend={jax.default_backend()}", file=sys.stderr)

    stages = {}

    def rec(name, t, extra=""):
        stages[name] = t * 1e3
        print(f"{name:<19}: {t*1e3:8.2f} ms{extra}", flush=True)

    full_fn = lambda params, imgs: inference_impl(params, model, imgs, Ks, ratios)
    full = timed(full_fn, (params, imgs))
    rec("full step", full, f"  ({B/full:7.1f} img/s)")
    step_flops = flops_of(full_fn, (params, imgs))

    feats_fn = lambda params, imgs: model.apply(params, imgs, method=CubeRCNN.features)
    t = timed(feats_fn, (params, imgs))
    rec("backbone+FPN", t)
    feats = jax.jit(feats_fn)(params, imgs)
    flist = [feats[f] for f in FEATURE_NAMES]

    rpn_fn = lambda params, flist: model.apply(params, flist, method=CubeRCNN.rpn)
    t = timed(rpn_fn, (params, flist))
    rec("RPN head convs", t)
    logits, deltas = jax.jit(rpn_fn)(params, flist)

    anchors = [jnp.asarray(a) for a in anchor_lib.pyramid_anchors(
        [(f.shape[1], f.shape[2]) for f in flist], FEATURE_STRIDES,
        scfg.MODEL.ANCHOR_GENERATOR.SIZES, scfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
        scfg.MODEL.ANCHOR_GENERATOR.OFFSET)]
    image_hw = jnp.asarray([H, W], jnp.float32)

    def props_fn(logits, deltas):
        def per_image(args):
            lg, dl = args
            return select_proposals(anchors, lg, dl, image_hw, 1000, 1000, 0.7)
        return jax.vmap(per_image)((
            [l.astype(jnp.float32) for l in logits],
            [d.astype(jnp.float32) for d in deltas]))

    t = timed(props_fn, (logits, deltas))
    rec("proposal select/NMS", t)
    prop_boxes, prop_scores, prop_valid = jax.jit(props_fn)(logits, deltas)

    # mirror the model's pooler invocation (rcnn3d.py inference_impl): ONE
    # staging shared by box + cube pooler, outputs in the feature dtype
    stage_fn = lambda flist: stage_pyramid(flist).flat  # .flat: jax leaf for timed()
    t = timed(stage_fn, (flist,))
    rec("pyramid staging", t)

    def pool_fn(flist, prop_boxes):
        staged = stage_pyramid(flist)
        return multilevel_roi_align_pallas_batched(
            flist, prop_boxes, list(FEATURE_STRIDES), 7, 2,
            out_dtype=flist[0].dtype, staged=staged)
    # the pooler measurement includes the staging; subtract the separately
    # measured staging stage, clamped at 0 — at small batch the staging
    # measurement can sit below the RTT noise floor while the staging cost
    # inside this measurement is real (advisor r4), in which case the
    # pooler rows absorb it (noted in the artifact via below-noise flags)
    t = max(timed(pool_fn, (flist, prop_boxes))
            - stages["pyramid staging"] / 1e3, 0.0)
    rec("box pooler (1000)", t)
    pooled = jax.jit(pool_fn)(flist, prop_boxes)

    box_fn = lambda params, pooled: model.apply(
        params, pooled.reshape(B * 1000, *pooled.shape[2:]), method=CubeRCNN.box_branch)
    t = timed(box_fn, (params, pooled))
    rec("box head FCs", t)
    scores2d, deltas2d = jax.jit(box_fn)(params, pooled)
    scores2d = scores2d.reshape(B, 1000, C + 1).astype(jnp.float32)
    deltas2d = deltas2d.reshape(B, 1000, C * 4).astype(jnp.float32)

    def dets_fn(scores2d, deltas2d, prop_boxes, prop_valid):
        return jax.vmap(lambda s, d, b, v: fast_rcnn_inference(
            s, d, b, v, image_hw, C, 0.01, 0.5, 100, 1024,
            tuple(scfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
        ))(scores2d, deltas2d, prop_boxes, prop_valid)

    t = timed(dets_fn, (scores2d, deltas2d, prop_boxes, prop_valid))
    rec("per-class NMS", t)
    dets = jax.jit(dets_fn)(scores2d, deltas2d, prop_boxes, prop_valid)

    # --- sub-stage split of the two NMS-bearing stages (where does the
    # time go: top_k, decode, or the NMS fixpoint itself?) ---
    import jax.numpy as _jnp
    from omni3d_tpu.ops import nms as nms_ops
    from omni3d_tpu.utils import boxes as box_ops

    def topk_flat_fn(scores2d):
        # the (P*C,) candidate top-k inside fast_rcnn_inference
        probs = jax.nn.softmax(scores2d, axis=-1)[..., :C]
        flat = probs.reshape(B, -1)
        return jax.vmap(lambda f: jax.lax.top_k(f, 1024))(flat)
    t = timed(topk_flat_fn, (scores2d,))
    rec("  nms: flat top_k", t)
    top_scores, top_idx = jax.jit(topk_flat_fn)(scores2d)

    def decode_fn(deltas2d, prop_boxes, top_idx):
        # decode-all + top-k gather, consuming ONLY the gathered rows — the
        # as-scheduled pipeline cost: XLA pushes the gather through the
        # elementwise decode so only survivors are decoded. (PROFILE_r04's
        # 'decode all' sub-stage consumed all P*C decoded boxes, which
        # BLOCKED that pushdown and over-reported the stage at 2.5 ms; a
        # hand-written lazy decode measured +2 ms slower end-to-end, r5 A/B.)
        w = tuple(scfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS)

        def per_img(dl, pb, ti):
            bx = box_ops.decode_deltas(dl.reshape(1000, C, 4), pb[:, None, :], w)
            bx = box_ops.clip_boxes(bx, image_hw[0], image_hw[1])
            return bx.reshape(-1, 4)[ti]
        return jax.vmap(per_img)(deltas2d, prop_boxes, top_idx)
    t = timed(decode_fn, (deltas2d, prop_boxes, top_idx))
    rec("  nms: decode+gather", t)
    cand_boxes = jax.jit(decode_fn)(deltas2d, prop_boxes, top_idx)

    def nms_only_fn(cand_boxes, top_scores, top_idx):
        cls = top_idx % C
        return jax.vmap(lambda b, s, c: nms_ops.batched_nms_indices(
            b, s, c, 0.5, 100, s > 0.01))(cand_boxes, top_scores, cls)
    t = timed(nms_only_fn, (cand_boxes, top_scores, top_idx))
    rec("  nms: batched NMS", t)

    def rpn_topk_fn(logits):
        # per-level pre-NMS top_k inside select_proposals
        outs = []
        for lg in logits:
            flat = lg.astype(_jnp.float32).reshape(B, -1)
            k = min(1000, flat.shape[1])
            outs.append(jax.vmap(lambda f: jax.lax.top_k(f, k))(flat)[0])
        return outs
    t = timed(rpn_topk_fn, (logits,))
    rec("  rpn: level top_k", t)

    cube_boxes = scale_proposals(dets["boxes"], scfg.MODEL.ROI_CUBE_HEAD.SCALE_ROI_BOXES)

    def poolc_fn(flist, cube_boxes):
        staged = stage_pyramid(flist)
        return multilevel_roi_align_pallas_batched(
            flist, cube_boxes, list(FEATURE_STRIDES), 7, 2,
            out_dtype=flist[0].dtype, staged=staged)
    t = max(timed(poolc_fn, (flist, cube_boxes))
            - stages["pyramid staging"] / 1e3, 0.0)
    rec("cube pooler (100)", t)
    pooled_cube = jax.jit(poolc_fn)(flist, cube_boxes)

    cube_fn = lambda params, pooled_cube: model.apply(
        params, pooled_cube.reshape(B * 100, *pooled_cube.shape[2:]),
        method=CubeRCNN.cube_branch)
    t = timed(cube_fn, (params, pooled_cube))
    rec("cube head", t)

    if len(sys.argv) > 2:
        import json

        peak = PEAK_TFLOPS.get(jax.devices()[0].device_kind, 0.0)
        out = {
            "batch": B, "image_hw": [H, W],
            "backend": jax.default_backend(),
            "device_kind": jax.devices()[0].device_kind,
            "stage_ms": stages,
            "full_step_ms": stages["full step"],
            "img_per_s": B / full,
            "flops_per_step": step_flops,
            "tflops_per_s": step_flops / full / 1e12 if full else 0.0,
            "mfu_vs_bf16_peak": (step_flops / full / 1e12 / peak) if peak else None,
            "peak_tflops_assumed": peak,
            "rtt_ms_subtracted": _RTT * 1e3,
        }
        with open(sys.argv[2], "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {sys.argv[2]}", file=sys.stderr)


PEAK_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v4": 275.0,
               "TPU v5": 459.0, "TPU v6 lite": 918.0}

if __name__ == "__main__":
    main()
