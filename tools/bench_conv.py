"""Conv channel-width microbenchmark: the realistic MXU ceiling per block.

The backbone per-block profile (tools/profile_backbone.py) scores blocks
against the NOMINAL bf16 peak; this tool measures what a bare XLA conv of
each channel width actually sustains, which is the honest per-block
ceiling — narrow-channel convs (the DLA level2 problem: C=64 out of 128
lanes) cap at roughly half the wide-conv rate, and conv+BN+relu chains pay
an elementwise-epilogue overhead on top.

Measurement note: consumption must be the FULL output sum. Consuming one
output element lets XLA push the 1-element slice INTO the conv and compute
a k x k dot instead of the conv (observed: "2332 TFLOP/s"); chains of ops
are less susceptible but single ops are fully elided.

Measured r5 (TPU v5 lite, bs=32, bf16), committed in PERF.md:
  3x3  64->64  @128^2 :  89.6 TFLOP/s   (50% lane fill -> ~40% of wide rate)
  3x3 128->128 @128^2 : 204.1 TFLOP/s
  3x3 256->256 @64^2  : 224.6 TFLOP/s   (the wide-conv ceiling)
  chain conv-bn-relu x2 + add, 64ch: 1.44 ms vs 0.86 ms bare convs
  chain with BN pre-folded into conv weights: 1.68 ms — SLOWER; XLA already
  fuses the affine+relu epilogue, folding buys nothing (measured dead end).

Usage: python tools/bench_conv.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax as jlax

    from omni3d_tpu.utils.benchtime import calibrate_rtt, timed_scan

    rtt = calibrate_rtt()
    print(f"backend={jax.default_backend()} rtt={rtt*1e3:.1f}ms",
          file=sys.stderr)

    def timed_sum(f, args, n=10):
        # consume="sum": single ops need FULL output consumption or the
        # slice pushdown shrinks them (module docstring)
        return max(timed_scan(f, args, n, rtt, consume="sum"), 1e-9)

    B = 32
    rng = np.random.default_rng(0)

    def conv(x, w, s=1):
        k = w.shape[0]
        return jlax.conv_general_dilated(
            x, w, (s, s), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    shapes = [
        ("3x3 64->64 @128^2", (B, 128, 128, 64), 64),
        ("3x3 96->96 @128^2", (B, 128, 128, 96), 96),
        ("3x3 128->128 @128^2", (B, 128, 128, 128), 128),
        ("3x3 256->256 @128^2", (B, 128, 128, 256), 256),
        ("3x3 256->256 @64^2", (B, 64, 64, 256), 256),
    ]
    for label, ishape, cout in shapes:
        x = jnp.asarray(rng.standard_normal(ishape), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ishape[-1], cout)) * 0.05,
                        jnp.bfloat16)
        t = timed_sum(conv, (x, w))
        fl = float(np.prod(ishape)) * 9 * cout * 2
        print(f"{label:22}: {t*1e3:6.2f} ms  {fl/1e9:7.1f} GFLOP  "
              f"{fl/t/1e12:6.1f} TFLOP/s")

    # conv-bn-relu x2 + residual (the DLA basic-block shape), and the
    # BN-folded variant (measured dead end, kept as the regression probe)
    x = jnp.asarray(rng.standard_normal((B, 128, 128, 64)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    sc = jnp.ones(64, jnp.bfloat16)
    bi = jnp.zeros(64, jnp.bfloat16)

    def chain_bn(x, w1, w2, sc, bi):
        o = jax.nn.relu(conv(x, w1) * sc + bi)
        o = conv(o, w2) * sc + bi
        return jax.nn.relu(o + x)

    def chain_folded(x, w1, w2, sc, bi):
        o = jax.nn.relu(conv(x, w1 * sc) + bi)
        o = conv(o, w2 * sc) + bi
        return jax.nn.relu(o + x)

    fl = 2 * float(np.prod(x.shape)) * 9 * 64 * 2
    for label, f in (("chain conv-bn-relu", chain_bn),
                     ("chain BN-folded", chain_folded)):
        t = timed_sum(f, (x, w1, w2, sc, bi))
        print(f"{label:22}: {t*1e3:6.2f} ms  ({fl/t/1e12:6.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
