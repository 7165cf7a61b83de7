"""Training-step throughput on the real chip (single-chip data point).

Times the full jitted train step (forward, all losses, backward, optimizer)
on synthetic batches at 512px with padded GT, using the carry-dependent
scan methodology of bench.py.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from omni3d_tpu.config.cfg import StaticCfg
    from omni3d_tpu.config.defaults import get_default_cfg
    from omni3d_tpu.engine.train import create_train_state, make_train_step
    from omni3d_tpu.models.rcnn3d import CubeRCNN, preprocess
    from omni3d_tpu.solver.build import build_optimizer

    cfg = get_default_cfg()
    cfg.merge_from_file("configs/cubercnn_DLA34_FPN.yaml")
    scfg = StaticCfg(cfg)
    model = CubeRCNN(cfg=scfg, train_mode=True, dtype=jnp.bfloat16)
    tx = build_optimizer(cfg, None)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, model, tx)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H = W = 512
    G = 64  # padded GT slots
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

    n = 10

    @jax.jit
    def run(state, batch, key):
        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            st, logs = step_fn(st, batch, sub)
            return (st, k), logs["total_loss"]

        (st, _), losses = lax.scan(body, (state, key), None, length=n)
        return st, losses

    from omni3d_tpu.utils.benchtime import calibrate_rtt

    rtt = calibrate_rtt()
    st, losses = run(state, batch, key)
    float(losses[-1])  # device->host forces completion (axon tunnel)
    t0 = time.perf_counter()
    st, losses = run(state, batch, key)
    float(losses[-1])
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / n
    print(f"train step B={B}: {dt*1e3:.2f} ms/step, {B/dt:.1f} img/s "
          f"(loss {float(losses[-1]):.3f})")

    if len(sys.argv) > 2:  # JSON artifact (end-of-round capture ritual)
        import json
        import subprocess

        try:
            flops = run.lower(state, batch, key).compile().cost_analysis()
            if isinstance(flops, list):
                flops = flops[0]
            # XLA cost analysis counts a scan/while body ONCE, not n times
            # (verified r5: the 10-step scan reports ~the single-step FLOPs
            # of profile_train's ladder) — so no division by n
            flops_per_step = float(flops.get("flops", 0.0))
        except Exception:
            flops_per_step = 0.0
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                capture_output=True, text=True).stdout.strip()
        out = {
            "batch": B, "image_hw": [H, W],
            "ms_per_step": dt * 1e3, "img_per_s": B / dt,
            "flops_per_step": flops_per_step,
            "tflops_per_s": flops_per_step / dt / 1e12,
            "device_kind": jax.devices()[0].device_kind,
            "git_commit": commit,
        }
        with open(sys.argv[2], "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {sys.argv[2]}")


if __name__ == "__main__":
    main()
