"""Backward-pooler-only TPU microbenchmark (carry-dependent scan).

Times roi_align_bwd_pallas in isolation at training shapes (512px pyramid,
S+F RoIs per image) so kernel iterations can be attributed separately from
the rest of the train-step backward.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from omni3d_tpu.ops.roi_align_bwd_pallas import roi_align_bwd_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    C = 256
    P = 7
    STRIDES = [4, 8, 16, 32, 64]
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.standard_normal((B, 512 // s, 512 // s, C)).astype(np.float32),
                    jnp.bfloat16)
        for s in STRIDES
    ]
    xy = rng.uniform(0, 400, (B, N, 2)).astype(np.float32)
    wh = rng.uniform(8, 100, (B, N, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh, 511)], -1))
    g = jnp.asarray(rng.standard_normal((B, N, P, P, C)).astype(np.float32),
                    jnp.bfloat16)

    n = 10

    @jax.jit
    def run(feats, boxes, g):
        def body(carry, _):
            g0 = g + carry.astype(g.dtype) * 1e-12
            grads = roi_align_bwd_pallas(feats, boxes, g0, STRIDES, P, 2)
            return carry + grads[0].ravel()[0].astype(jnp.float32) * 1e-12, ()

        c, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return c

    float(run(feats, boxes, g))
    from omni3d_tpu.utils.benchtime import calibrate_rtt

    rtt = calibrate_rtt()
    t0 = time.perf_counter()
    float(run(feats, boxes, g))
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / n
    print(f"bwd pooler B={B} N={N}: {dt*1e3:.2f} ms/call "
          f"({B*N/dt/1e6:.2f} Mboxes/s)")


if __name__ == "__main__":
    main()
