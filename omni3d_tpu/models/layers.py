"""Shared NN layers for the TPU model stack (flax.linen, NHWC).

Conventions:
  * all feature maps are NHWC (TPU-native layout; XLA tiles C onto lanes),
  * params stay float32; `dtype` selects the conv/matmul compute dtype
    (bfloat16 by default on TPU, the MXU-native format),
  * BatchNorm follows torch semantics (eps 1e-5, running-stat momentum 0.1)
    so converted reference checkpoints reproduce to fp32 fidelity.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


class Conv(nn.Module):
    """2D convolution with torch-compatible SAME-style explicit padding.

    `s2d > 1` evaluates the SAME convolution in space-to-depth form: tiny
    channel counts (the detector stem: C=3..16 at full resolution) run at
    2-7 TFLOP/s on the MXU because they underfill the 128-lane registers;
    folding an FxF pixel block into channels turns the op into an equivalent
    dense conv at FxF-fold channels (~matmul-peak rates). The parameter keeps
    its original (k, k, Cin, Cout) shape/name — the polyphase kernel is built
    from it in-graph, so checkpoints convert unchanged and the transform is
    numerically exact. Requires stride 1, no groups, H and W divisible by F.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | None = None  # default: (kernel-1)//2, torch-style
    groups: int = 1
    use_bias: bool = False
    s2d: int = 1
    in_packed: bool = False
    out_packed: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2 if self.padding is None else self.padding
        if (self.s2d > 1 and self.s2d % self.stride == 0 and self.groups == 1
                and not self.use_bias
                and (self.in_packed
                     or (x.shape[1] % self.s2d == 0 and x.shape[2] % self.s2d == 0))):
            return _S2DConvInner(self.features, self.kernel, pad, self.s2d,
                                 self.dtype, stride=self.stride,
                                 in_packed=self.in_packed,
                                 out_packed=self.out_packed, name="conv")(x)
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class _S2DConvInner(nn.Module):
    """Space-to-depth evaluation of a stride-1 conv. Param layout matches
    nn.Conv ('kernel', (k, k, Cin, Cout)) for checkpoint compatibility.

    `in_packed` / `out_packed` skip the space-to-depth (un)pack transposes on
    either side so consecutive stem convs chain in packed form — the packed
    channel order is (alpha, beta, Cin) for input and (a, b, Cout) for
    output, i.e. real channels fastest. Per-channel ops (BN affine, relu)
    remain valid on packed tensors when their (C,) vectors are tiled F*F
    times (see ConvBN).

    `stride` s (with F % s == 0) evaluates a STRIDED conv in packed form:
    the output keeps the same block grid at F_out = F // s phases per axis
    (F_out == 1 degenerates to a plain unpacked stride-s output), which is
    how the detector stem's stride-2 convs chain without leaving the packed
    domain: out pixel F_out*i + a reads input pixel F*i + (s*a + u - pad).
    """

    features: int
    kernel: int
    pad: int
    factor: int
    dtype: Any
    stride: int = 1
    in_packed: bool = False
    out_packed: bool = False

    @nn.compact
    def __call__(self, x):
        k, F, pad, s = self.kernel, self.factor, self.pad, self.stride
        assert F % s == 0
        Fo = F // s
        Cin = x.shape[-1] // (F * F) if self.in_packed else x.shape[-1]
        Cout = self.features
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, Cin, Cout), jnp.float32
        )

        # polyphase kernel: output phase a reads input phase alpha at s2d-cell
        # offset d where F*d + alpha = s*a + u - pad, u in [0, k)
        import numpy as onp

        dmin = int(onp.floor((0 - pad) / F))
        dmax = int(onp.floor((s * (Fo - 1) + (k - 1) - pad) / F))
        kd = dmax - dmin + 1
        d_idx = onp.arange(dmin, dmax + 1)
        alpha = onp.arange(F)
        a = onp.arange(Fo)
        # u[d, alpha, a] = F*d + alpha + pad - s*a
        u = (F * d_idx[:, None, None] + alpha[None, :, None] + pad
             - s * a[None, None, :])
        valid = (u >= 0) & (u < k)
        u_c = onp.clip(u, 0, k - 1)

        wq = w.astype(self.dtype)
        # gather to (kd, kd, alpha, beta, a, b, Cin, Cout)
        w2 = wq[u_c[:, None, :, None, :, None], u_c[None, :, None, :, None, :]]
        m = (valid[:, None, :, None, :, None] & valid[None, :, None, :, None, :])
        w2 = w2 * jnp.asarray(m[..., None, None], self.dtype)
        # -> (kd, kd, (alpha, beta, Cin), (a, b, Cout))
        w2 = jnp.transpose(w2, (0, 1, 2, 3, 6, 4, 5, 7)).reshape(
            kd, kd, F * F * Cin, Fo * Fo * Cout
        )

        if self.in_packed:
            xs = x
            Hp, Wp = x.shape[1], x.shape[2]
        else:
            B, H, W, _ = x.shape
            Hp, Wp = H // F, W // F
            xs = x.reshape(B, Hp, F, Wp, F, Cin)
            xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(B, Hp, Wp, F * F * Cin)
        ys = jax.lax.conv_general_dilated(
            xs.astype(self.dtype), w2, (1, 1), [(-dmin, dmax), (-dmin, dmax)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.out_packed and Fo > 1:
            return ys
        B = ys.shape[0]
        if Fo == 1:
            return ys
        ys = ys.reshape(B, Hp, Wp, Fo, Fo, Cout)
        return jnp.transpose(ys, (0, 1, 3, 2, 4, 5)).reshape(
            B, Hp * Fo, Wp * Fo, Cout)


class _EvalBN(nn.Module):
    """Inference BatchNorm as a per-channel fused multiply-add.

    flax's nn.BatchNorm promotes the activation to float32 for the
    normalization math even with running stats — at the stem that costs
    layout-conversion copies worth ~25% of the whole backbone (profiled at
    bs=32). With frozen stats BN is the affine x*a + b with
    a = scale*rsqrt(var+eps), b = bias - mean*a, computed on (C,) in f32 and
    applied in the compute dtype, which XLA fuses into the conv epilogue.
    Variable names/collections mirror nn.BatchNorm so checkpoints and
    train-mode inits interchange.

    Numerical scope: this replaces nn.BatchNorm for ALL inference BNs, not
    just the packed stem. At f32 the whole eval backbone matches a torch
    forward within 2e-4 (tests/test_pretrained.py::test_activation_parity);
    at bf16 the affine's rounding is at the activation dtype's own noise
    floor, so no separate opt-in is kept.
    """

    dtype: Any = jnp.float32
    packed_tile: int = 1  # input is s2d-packed: tile the (C,) affine F*F times

    @nn.compact
    def __call__(self, x):
        t2 = self.packed_tile * self.packed_tile
        C = x.shape[-1] // t2
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda *_: jnp.zeros((C,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda *_: jnp.ones((C,), jnp.float32)
        ).value
        a = scale * jax.lax.rsqrt(var + 1e-5)
        b = bias - mean * a
        if t2 > 1:
            a = jnp.tile(a, t2)
            b = jnp.tile(b, t2)
        return x * a.astype(x.dtype) + b.astype(x.dtype)


class _TrainPackedBN(nn.Module):
    """Train-mode BatchNorm on an s2d-PACKED tensor.

    The packed channel order is (alpha, beta, C) with real channels
    fastest, so per-real-channel batch statistics are the reduction over
    (batch, space, phases) of the (..., F*F, C) view — mathematically the
    same mean/var the unpacked layout yields (the packed tensor is a
    permutation of the same values). Running stats follow the flax/torch
    convention of the unpacked path (momentum 0.9 flax = 0.1 torch,
    biased batch variance, eps 1e-5); normalization is applied as the
    per-channel affine x*a + b with a,b derived from the BATCH stats, so
    autodiff produces the exact BatchNorm gradient. Variable names/shapes
    match nn.BatchNorm/_EvalBN — checkpoints interchange and the packed
    and unpacked stem paths share parameters."""

    dtype: Any = jnp.float32
    packed_tile: int = 1

    @nn.compact
    def __call__(self, x):
        t2 = self.packed_tile * self.packed_tile
        C = x.shape[-1] // t2
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda *_: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda *_: jnp.ones((C,), jnp.float32))

        xr = x.astype(jnp.float32).reshape(x.shape[:-1] + (t2, C))
        mean = jnp.mean(xr, axis=(0, 1, 2, 3))
        mean2 = jnp.mean(jnp.square(xr), axis=(0, 1, 2, 3))
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        if not self.is_initializing():
            ra_mean.value = (0.9 * ra_mean.value
                             + 0.1 * jax.lax.stop_gradient(mean))
            ra_var.value = (0.9 * ra_var.value
                            + 0.1 * jax.lax.stop_gradient(var))

        a = scale * jax.lax.rsqrt(var + 1e-5)
        b = bias - mean * a
        if t2 > 1:
            a = jnp.tile(a, t2)
            b = jnp.tile(b, t2)
        return x * a.astype(x.dtype) + b.astype(x.dtype)


class BatchNorm(nn.Module):
    """torch-semantics BatchNorm2d: eps=1e-5, momentum=0.1 (flax 0.9)."""

    use_running_average: bool = True
    dtype: Any = jnp.float32
    packed_tile: int = 1

    @nn.compact
    def __call__(self, x):
        if self.use_running_average:
            return _EvalBN(dtype=self.dtype, packed_tile=self.packed_tile,
                           name="bn")(x)
        if self.packed_tile > 1:
            # train-mode stats on the packed stem layout (r5: the packed
            # stem previously fell back to the unpacked path in training,
            # costing ~8.7 ms/step fwd+bwd at bs=32)
            return _TrainPackedBN(dtype=self.dtype,
                                  packed_tile=self.packed_tile, name="bn")(x)
        return nn.BatchNorm(
            use_running_average=False,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)


class ConvBN(nn.Module):
    """conv -> BN (-> optional relu), the backbone workhorse."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | None = None
    groups: int = 1
    relu: bool = True
    train: bool = False
    s2d: int = 1
    in_packed: bool = False
    out_packed: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(
            self.features, self.kernel, self.stride, self.padding,
            groups=self.groups, s2d=self.s2d, in_packed=self.in_packed,
            out_packed=self.out_packed, dtype=self.dtype, name="c",
        )(x)
        tile = self.s2d // self.stride if self.out_packed else 1
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                      packed_tile=max(tile, 1), name="n")(x)
        if self.relu:
            x = nn.relu(x)
        return x


def max_pool_packed(x, factor: int, window: int, stride: int):
    """MaxPool2d on an s2d-packed tensor. Supported case: window == stride ==
    factor -> the pool is exactly the max over each block's phases, i.e. a
    channel-group reduction with no spatial movement."""
    assert window == stride == factor
    B, H, W, FC = x.shape
    C = FC // (factor * factor)
    return x.reshape(B, H, W, factor * factor, C).max(axis=3)


def max_pool(x, window: int, stride: int, padding: int = 0):
    """torch MaxPool2d semantics on NHWC."""
    return nn.max_pool(
        x,
        (window, window),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
    )


def upsample_nearest_2x(x):
    """Nearest 2x upsample (torch F.interpolate(scale_factor=2) semantics),
    used by the FPN top-down path."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
