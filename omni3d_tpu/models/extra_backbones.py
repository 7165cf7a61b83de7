"""DenseNet-121, MNASNet-1.0, ShuffleNetV2-x1.0 backbones (flax, NHWC).

TPU-native re-implementations of the torchvision architectures the reference
wraps as alternative FPN bottom-ups (reference cubercnn/modeling/backbone/
{densenet,mnasnet,shufflenet}.py), with the same p2..p6 tap points:

  densenet: p2..p5 = denseblock outputs at strides 4..32 (densenet.py:26-37)
  mnasnet:  p2..p5 = inverted-residual stack outputs, channels 24/40/96/320
            (mnasnet.py:25-37)
  shufflenet: p2 = post-stem maxpool, p3..p5 = stages 2..4 (shufflenet.py:27-43)

All emit p6 = stride-2 maxpool of p5, like the reference.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv, ConvBN, max_pool


# ------------------------------ DenseNet-121 ------------------------------

class DenseLayer(nn.Module):
    growth: int = 32
    bn_size: int = 4
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="norm1")(x)
        h = nn.relu(h)
        h = Conv(self.bn_size * self.growth, 1, 1, padding=0, dtype=self.dtype, name="conv1")(h)
        h = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="norm2")(h)
        h = nn.relu(h)
        h = Conv(self.growth, 3, 1, dtype=self.dtype, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class DenseBlock(nn.Module):
    num_layers: int
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = DenseLayer(train=self.train, dtype=self.dtype, name=f"denselayer{i + 1}")(x)
        return x


class Transition(nn.Module):
    features: int
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="norm")(x)
        x = nn.relu(x)
        x = Conv(self.features, 1, 1, padding=0, dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet121(nn.Module):
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = dict(train=self.train, dtype=self.dtype)
        x = Conv(64, 7, 2, padding=3, dtype=self.dtype, name="conv0")(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="norm0")(x)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, padding=1)
        p2 = DenseBlock(6, **t, name="denseblock1")(x)           # 64+6*32=256, s4
        x = Transition(128, **t, name="transition1")(p2)
        p3 = DenseBlock(12, **t, name="denseblock2")(x)          # 128+384=512, s8
        x = Transition(256, **t, name="transition2")(p3)
        p4 = DenseBlock(24, **t, name="denseblock3")(x)          # 256+768=1024, s16
        x = Transition(512, **t, name="transition3")(p4)
        x = DenseBlock(16, **t, name="denseblock4")(x)           # 512+512=1024, s32
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="norm5")(x)
        p5 = x
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5, "p6": max_pool(p5, 1, 2)}


# ------------------------------ MNASNet-1.0 ------------------------------

class InvertedResidual(nn.Module):
    features: int
    kernel: int
    stride: int
    expansion: int
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = in_ch * self.expansion
        h = ConvBN(mid, 1, 1, padding=0, train=self.train, dtype=self.dtype, name="expand")(x)
        h = ConvBN(mid, self.kernel, self.stride, groups=mid, train=self.train,
                   dtype=self.dtype, name="dw")(h)
        h = ConvBN(self.features, 1, 1, padding=0, relu=False, train=self.train,
                   dtype=self.dtype, name="project")(h)
        if self.stride == 1 and in_ch == self.features:
            h = h + x
        return h


class MNASNet10(nn.Module):
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = dict(train=self.train, dtype=self.dtype)
        x = ConvBN(32, 3, 2, **t, name="stem0")(x)
        x = ConvBN(32, 3, 1, groups=32, **t, name="stem_dw")(x)
        x = ConvBN(16, 1, 1, padding=0, relu=False, **t, name="stem_pw")(x)

        def stack(x, ch, k, s, exp, n, name):
            for i in range(n):
                x = InvertedResidual(ch, k, s if i == 0 else 1, exp, **t,
                                     name=f"{name}_{i}")(x)
            return x

        p2 = stack(x, 24, 3, 2, 3, 3, "stack1")     # s4, 24
        p3 = stack(p2, 40, 5, 2, 3, 3, "stack2")    # s8, 40
        x = stack(p3, 80, 5, 2, 6, 3, "stack3")     # s16
        p4 = stack(x, 96, 3, 1, 6, 2, "stack4")     # s16, 96
        x = stack(p4, 192, 5, 2, 6, 4, "stack5")    # s32
        p5 = stack(x, 320, 3, 1, 6, 1, "stack6")    # s32, 320
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5, "p6": max_pool(p5, 1, 2)}


# ------------------------------ ShuffleNetV2-x1.0 ------------------------------

def channel_shuffle(x, groups: int = 2):
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


class ShuffleUnit(nn.Module):
    features: int  # total output channels
    stride: int = 1
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = dict(train=self.train, dtype=self.dtype)
        half = self.features // 2
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            b = ConvBN(half, 1, 1, padding=0, **t, name="b2_pw1")(x2)
            b = ConvBN(half, 3, 1, groups=half, relu=False, **t, name="b2_dw")(b)
            b = ConvBN(half, 1, 1, padding=0, **t, name="b2_pw2")(b)
            out = jnp.concatenate([x1, b], axis=-1)
        else:
            a = ConvBN(x.shape[-1], 3, self.stride, groups=x.shape[-1], relu=False,
                       **t, name="b1_dw")(x)
            a = ConvBN(half, 1, 1, padding=0, **t, name="b1_pw")(a)
            b = ConvBN(half, 1, 1, padding=0, **t, name="b2_pw1")(x)
            b = ConvBN(half, 3, self.stride, groups=half, relu=False, **t, name="b2_dw")(b)
            b = ConvBN(half, 1, 1, padding=0, **t, name="b2_pw2")(b)
            out = jnp.concatenate([a, b], axis=-1)
        return channel_shuffle(out)


class ShuffleNetV2(nn.Module):
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = dict(train=self.train, dtype=self.dtype)
        x = ConvBN(24, 3, 2, **t, name="conv1")(x)
        p2 = max_pool(x, 3, 2, padding=1)  # s4, 24

        def stage(x, ch, n, name):
            x = ShuffleUnit(ch, 2, **t, name=f"{name}_0")(x)
            for i in range(1, n):
                x = ShuffleUnit(ch, 1, **t, name=f"{name}_{i}")(x)
            return x

        p3 = stage(p2, 116, 4, "stage2")   # s8
        p4 = stage(p3, 232, 8, "stage3")   # s16
        p5 = stage(p4, 464, 4, "stage4")   # s32
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5, "p6": max_pool(p5, 1, 2)}


def densenet_out_channels():
    return {"p2": 256, "p3": 512, "p4": 1024, "p5": 1024, "p6": 1024}


def mnasnet_out_channels():
    return {"p2": 24, "p3": 40, "p4": 96, "p5": 320, "p6": 320}


def shufflenet_out_channels():
    return {"p2": 24, "p3": 116, "p4": 232, "p5": 464, "p6": 464}
