"""Capture a jax.profiler trace of the batched pallas pooler and dump op stats."""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from omni3d_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas_batched

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    C = 256
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

    fn = jax.jit(lambda f, b: multilevel_roi_align_pallas_batched(
        f, b, STRIDES, 7, 2))
    out = fn(feats, boxes)
    out.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(feats, boxes)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 5
    print(f"pooler B={B} N={N}: {dt*1e3:.2f} ms/call", flush=True)

    trace_dir = "/tmp/pooler_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = fn(feats, boxes)
        out.block_until_ready()

    # locate xplane and dump op stats
    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files, flush=True)


if __name__ == "__main__":
    main()
