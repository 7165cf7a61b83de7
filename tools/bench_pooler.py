"""Pooler-only TPU microbenchmark (carry-dependent scan, tunnel-amortized)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from omni3d_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas_batched

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    mode = sys.argv[3] if len(sys.argv) > 3 else None  # dma | res | auto
    K = int(sys.argv[4]) if len(sys.argv) > 4 else None  # boxes_per_step
    C = 256
    STRIDES = [4, 8, 16, 32, 64]
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.standard_normal((B, 512 // s, 512 // s, C)).astype(np.float32),
                    jnp.bfloat16)
        for s in STRIDES
    ]
    xy = rng.uniform(0, 400, (B, N, 2)).astype(np.float32)
    whmax = float(sys.argv[6]) if len(sys.argv) > 6 else 100.0
    wh = rng.uniform(8, whmax, (B, N, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh, 511)], -1))

    n = 10
    # kernel-only mode reproduces the r4 harness: boxes NOT perturbed, so
    # the plan/A-pack XLA prologue hoists out of the scan and only the
    # pallas kernel is timed. Default perturbs boxes too (full pooler cost
    # as the pipeline pays it).
    kernel_only = len(sys.argv) > 5 and sys.argv[5] == "kernel"

    @jax.jit
    def run(feats, boxes):
        def body(carry, _):
            f0 = [feats[0] + carry.astype(feats[0].dtype) * 1e-12] + feats[1:]
            bx = boxes if kernel_only else boxes + carry * 1e-12
            out = multilevel_roi_align_pallas_batched(f0, bx, STRIDES, 7, 2,
                                                      mode=mode,
                                                      boxes_per_step=K)
            return carry + out.ravel()[0] * 1e-12, ()

        c, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return c

    float(run(feats, boxes))
    from omni3d_tpu.utils.benchtime import calibrate_rtt

    rtt = calibrate_rtt()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(feats, boxes))
        best = min(best, time.perf_counter() - t0)
    dt = max(best - rtt, 1e-9) / n
    print(f"pooler B={B} N={N} mode={mode or 'auto'} K={K or 'def'}"
          f"{' kernel-only' if kernel_only else ''}: "
          f"{dt*1e3:.2f} ms/call ({B*N/dt/1e6:.2f} Mboxes/s)")


if __name__ == "__main__":
    main()
