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
import jax.numpy as jnp


class Conv(nn.Module):
    """2D convolution with torch-compatible SAME-style explicit padding."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | None = None  # default: (kernel-1)//2, torch-style
    groups: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2 if self.padding is None else self.padding
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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(
            self.features, self.kernel, self.stride, self.padding,
            groups=self.groups, dtype=self.dtype, name="c",
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
