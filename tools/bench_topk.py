"""Microbenchmark: exact lax.top_k vs approx_max_k vs two-stage exact top-k.

The stage profile (PROFILE_r04_bs32.json) shows ~7.7 ms of standalone top_k
across the RPN per-level pre-NMS selection and the per-class NMS candidate
pick at bs=32 — comparable to the whole NMS fixpoint. XLA's TopK on TPU
lowers to a variadic sort; `lax.approx_max_k` lowers to the hardware
PartialReduce op. With `recall_target=1.0` the partial reduce is still
approximate in general, but an EXACT top-k can be built from it when k is
small relative to n: per-group exact top-k + a final exact top-k over group
winners (every global top-k element is within the top-k of its group).

Usage: python tools/bench_topk.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")


def timed(fn, args, n=20):
    """Shared DCE-proof harness (utils/benchtime.timed_scan): perturbs
    every inexact input and consumes one element of EVERY output leaf —
    with only the first leaf consumed, the index path of two_stage is dead
    w.r.t. the values leaf and XLA eliminates it (advisor r4)."""
    from omni3d_tpu.utils.benchtime import calibrate_rtt, timed_scan

    global _RTT
    if _RTT is None:
        _RTT = calibrate_rtt()
    return max(timed_scan(fn, args, n, _RTT), 1e-9)


_RTT = None


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    # (label, B, n, k) — the two hot shapes from the profile
    shapes = [
        ("nms flat cand", 32, 16000, 1024),
        ("rpn L2", 32, 49152, 1000),
        ("rpn L3", 32, 12288, 1000),
    ]
    for label, B, n, k in shapes:
        x = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)

        t = timed(lambda x: jax.vmap(lambda f: lax.top_k(f, k))(x), (x,))
        print(f"{label:>14} ({B}x{n} k={k})  top_k          : {t*1e3:7.2f} ms")

        t = timed(lambda x: lax.approx_max_k(x, k), (x,))
        print(f"{label:>14} ({B}x{n} k={k})  approx_max_k   : {t*1e3:7.2f} ms")

        t = timed(lambda x: lax.approx_max_k(x, k, recall_target=0.99), (x,))
        print(f"{label:>14} ({B}x{n} k={k})  approx r=.99   : {t*1e3:7.2f} ms")

        # exact two-stage: G groups of m, per-group top_k(min(k, m)) by
        # sort, then global top_k over the G*min(k,m) winners. Exact
        # because each global winner is a winner of its group.
        def two_stage(x, G):
            m = x.shape[-1] // G
            xg = x.reshape(B, G, m)
            kk = min(k, m)
            vg, ig = jax.vmap(lambda f: lax.top_k(f, kk))(
                xg.reshape(B * G, m))
            vg = vg.reshape(B, G * kk)
            ig = (ig.reshape(B, G, kk)
                  + (jnp.arange(G, dtype=jnp.int32) * m)[None, :, None]
                  ).reshape(B, G * kk)
            v, j = jax.vmap(lambda f: lax.top_k(f, k))(vg)
            idx = jnp.take_along_axis(ig, j, axis=1)
            return v, idx

        for G in (4, 8, 16):
            if n % G:
                continue
            t = timed(lambda x, G=G: two_stage(x, G), (x,))
            # verify exactness once
            v_ref = jax.vmap(lambda f: lax.top_k(f, k))(x)[0]
            v_two = two_stage(x, G)[0]
            ok = bool(jnp.allclose(v_ref, v_two))
            print(f"{label:>14} ({B}x{n} k={k})  two-stage G={G:<3}: "
                  f"{t*1e3:7.2f} ms  exact={ok}")


if __name__ == "__main__":
    main()
