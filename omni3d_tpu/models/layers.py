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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2 if self.padding is None else self.padding
        if (self.s2d > 1 and self.stride == 1 and self.groups == 1
                and not self.use_bias
                and x.shape[1] % self.s2d == 0 and x.shape[2] % self.s2d == 0):
            return _S2DConvInner(self.features, self.kernel, pad, self.s2d,
                                 self.dtype, name="conv")(x)
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
    nn.Conv ('kernel', (k, k, Cin, Cout)) for checkpoint compatibility."""

    features: int
    kernel: int
    pad: int
    factor: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        k, F, pad = self.kernel, self.factor, self.pad
        Cin = x.shape[-1]
        Cout = self.features
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, Cin, Cout), jnp.float32
        )

        # polyphase kernel: output phase a reads input phase alpha at s2d-cell
        # offset d where F*d + alpha = a + u - pad, u in [0, k)
        import numpy as onp

        dmin = int(onp.floor((0 - pad) / F))
        dmax = int(onp.floor(((F - 1) + (k - 1) - pad) / F))
        kd = dmax - dmin + 1
        d_idx = onp.arange(dmin, dmax + 1)
        alpha = onp.arange(F)
        a = onp.arange(F)
        # u[d, alpha, a] = F*d + alpha + pad - a
        u = (F * d_idx[:, None, None] + alpha[None, :, None] + pad - a[None, None, :])
        valid = (u >= 0) & (u < k)
        u_c = onp.clip(u, 0, k - 1)

        wq = w.astype(self.dtype)
        # gather to (kd, kd, alpha, beta, a, b, Cin, Cout)
        w2 = wq[u_c[:, None, :, None, :, None], u_c[None, :, None, :, None, :]]
        m = (valid[:, None, :, None, :, None] & valid[None, :, None, :, None, :])
        w2 = w2 * jnp.asarray(m[..., None, None], self.dtype)
        # -> (kd, kd, (alpha, beta, Cin), (a, b, Cout))
        w2 = jnp.transpose(w2, (0, 1, 2, 3, 6, 4, 5, 7)).reshape(
            kd, kd, F * F * Cin, F * F * Cout
        )

        B, H, W, _ = x.shape
        xs = x.reshape(B, H // F, F, W // F, F, Cin)
        xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(B, H // F, W // F, F * F * Cin)
        ys = jax.lax.conv_general_dilated(
            xs.astype(self.dtype), w2, (1, 1), [(-dmin, dmax), (-dmin, dmax)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        ys = ys.reshape(B, H // F, W // F, F, F, Cout)
        return jnp.transpose(ys, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, Cout)


class BatchNorm(nn.Module):
    """torch-semantics BatchNorm2d: eps=1e-5, momentum=0.1 (flax 0.9)."""

    use_running_average: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(
            self.features, self.kernel, self.stride, self.padding,
            groups=self.groups, s2d=self.s2d, dtype=self.dtype, name="c",
        )(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="n")(x)
        if self.relu:
            x = nn.relu(x)
        return x


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
