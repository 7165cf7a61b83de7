"""Benchmark harness: DLA34-FPN Cube R-CNN 512px inference throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Measurement notes: the axon TPU tunnel has ~26 ms host<->device round-trip
latency, so a dispatch-per-step loop measures the tunnel, not the chip. We
instead run N inference steps inside ONE jitted `lax.scan` with a
data-dependent carry (so XLA cannot hoist or elide iterations) and fetch a
single scalar at the end; the FIXED per-call RTT is calibrated once with an
empty scan and subtracted (utils/benchtime.py) — at N=30 the uncorrected
residual would still be ~0.9 ms/step, a 16% error on a ~5 ms bs=1 step.

Baseline context: the reference (facebookresearch/omni3d) publishes no
throughput numbers (BASELINE.md). The north star is >=5x an A100 running the
reference PyTorch/detectron2 stack; we anchor the A100 reference at
A100_REF_IMG_S (typical detectron2 two-stage bs=1 fp32 inference rate for a
DLA34-FPN-class model), so the 5x target reads as vs_baseline >= 5.
"""
import json
import os
import sys
import time

import numpy as np

A100_REF_IMG_S = 50.0  # estimated reference A100 img/s (no published number)
N_ITER = 30


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    # when another process holds the TPU, jax silently falls back to CPU —
    # refuse to publish CPU numbers as chip throughput
    if jax.default_backend() != "tpu" and not os.environ.get("BENCH_ALLOW_CPU"):
        print(json.dumps({
            "metric": "DLA34-FPN 512px inference throughput",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
            "error": f"TPU unavailable (backend={jax.default_backend()})",
        }))
        sys.exit(1)

    from omni3d_tpu.config.cfg import StaticCfg
    from omni3d_tpu.config.defaults import get_default_cfg
    from omni3d_tpu.models.rcnn3d import CubeRCNN, inference_impl, preprocess
    from omni3d_tpu.utils.benchtime import calibrate_rtt

    rtt = calibrate_rtt()
    print(f"# calibrated per-call RTT: {rtt*1e3:.2f} ms", file=sys.stderr)

    cfg = get_default_cfg()
    cfg.merge_from_file("configs/cubercnn_DLA34_FPN.yaml")
    scfg = StaticCfg(cfg)
    model = CubeRCNN(cfg=scfg, dtype=jnp.bfloat16)

    H = W = 512
    rng = np.random.default_rng(0)

    best = 0.0
    best_bs = 1
    params = None
    for bs in (1, 8, 32):
        imgs = preprocess(
            jnp.asarray(rng.integers(0, 255, (bs, H, W, 3), dtype=np.int32)),
            cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD,
        )
        if params is None:
            params = model.init(jax.random.PRNGKey(0), imgs[:1])
        Ks = jnp.tile(jnp.asarray([[[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]]]), (bs, 1, 1))
        ratios = jnp.ones(bs)

        @jax.jit
        def run_n(params, imgs):
            def body(carry, _):
                out = inference_impl(params, model, carry, Ks, ratios)
                # data-dependent carry defeats CSE/hoisting across iterations;
                # consume one element of EVERY output (scores alone lets XLA
                # dead-code-eliminate the pose/dims/corners decode tails)
                chk = out["scores"].sum()
                for leaf in jax.tree.leaves(out):
                    chk = chk + leaf.ravel()[0].astype(jnp.float32)
                carry = carry + chk * 1e-12
                return carry, chk

            carry, sums = lax.scan(body, imgs, None, length=N_ITER)
            return sums.sum()

        float(run_n(params, imgs))  # compile + 1 run
        t0 = time.perf_counter()
        s = float(run_n(params, imgs))
        dt = max(time.perf_counter() - t0 - rtt, 1e-9) / N_ITER
        ips = bs / dt
        print(f"# bs={bs}: {dt * 1e3:.2f} ms/step, {ips:.1f} img/s (checksum {s:.3f})",
              file=sys.stderr)
        if ips > best:
            best, best_bs = ips, bs

    print(json.dumps({
        "metric": f"DLA34-FPN 512px inference throughput (bs={best_bs}, bf16, 1 chip)",
        "value": round(best, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / A100_REF_IMG_S, 2),
        "baseline_note": ("vs an ESTIMATED A100 anchor of "
                          f"{A100_REF_IMG_S} img/s — the reference publishes "
                          "no throughput number (BASELINE.md)"),
        # auditability across rounds (advisor r4): r01-r03 BENCH numbers did
        # NOT subtract the tunnel RTT (~0.9 ms/step at N_ITER=30: ~1% at
        # bs=32, ~16% at bs=1); r04+ numbers do, by this amount
        "rtt_ms_subtracted": round(rtt * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
