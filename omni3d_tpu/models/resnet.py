"""Torchvision-style ResNet backbones (18/34/50/101), TPU-native NHWC.

Equivalent of the reference's torchvision-backed ResNet feature extractor
(reference cubercnn/modeling/backbone/resnet.py:12-63): stem conv7x7/s2 +
maxpool, layer1..layer4 emitting p2..p5 at strides 4..32, p6 = stride-2
maxpool of p5. Standard torchvision block definitions re-expressed in flax;
module names line up with torchvision state-dict keys for the converter.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN, max_pool

# depth -> (block, blocks-per-stage, stage base channels, expansion)
RESNET_SPECS = {
    18: ("basic", [2, 2, 2, 2], [64, 128, 256, 512], 1),
    34: ("basic", [3, 4, 6, 3], [64, 128, 256, 512], 1),
    50: ("bottleneck", [3, 4, 6, 3], [64, 128, 256, 512], 4),
    101: ("bottleneck", [3, 4, 23, 3], [64, 128, 256, 512], 4),
}


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = ConvBN(self.features, 3, self.stride, train=self.train, dtype=self.dtype, name="conv1")(x)
        out = ConvBN(self.features, 3, 1, relu=False, train=self.train, dtype=self.dtype, name="conv2")(out)
        if self.downsample:
            identity = ConvBN(self.features, 1, self.stride, padding=0, relu=False,
                              train=self.train, dtype=self.dtype, name="downsample")(x)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # output channels (already expanded)
    stride: int = 1
    downsample: bool = False
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        mid = self.features // 4
        out = ConvBN(mid, 1, 1, padding=0, train=self.train, dtype=self.dtype, name="conv1")(x)
        out = ConvBN(mid, 3, self.stride, train=self.train, dtype=self.dtype, name="conv2")(out)
        out = ConvBN(self.features, 1, 1, padding=0, relu=False, train=self.train,
                     dtype=self.dtype, name="conv3")(out)
        if self.downsample:
            identity = ConvBN(self.features, 1, self.stride, padding=0, relu=False,
                              train=self.train, dtype=self.dtype, name="downsample")(x)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    depth: int = 34
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block_kind, layers, channels, expansion = RESNET_SPECS[self.depth]
        Block = BasicBlock if block_kind == "basic" else Bottleneck
        t = dict(train=self.train, dtype=self.dtype)

        x = ConvBN(64, 7, 2, padding=3, **t, name="stem")(x)
        x = max_pool(x, 3, 2, padding=1)

        outs = {}
        in_ch = 64
        for stage, (n_blocks, ch) in enumerate(zip(layers, channels)):
            out_ch = ch * expansion
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                ds = b == 0 and (s != 1 or in_ch != out_ch)
                x = Block(out_ch, s, downsample=ds, **t, name=f"layer{stage + 1}_{b}")(x)
                in_ch = out_ch
            outs[f"p{stage + 2}"] = x
        outs["p6"] = max_pool(outs["p5"], 1, 2)
        return outs


def resnet_out_channels(depth: int) -> dict:
    _, _, channels, expansion = RESNET_SPECS[depth]
    ch = [c * expansion for c in channels]
    return {"p2": ch[0], "p3": ch[1], "p4": ch[2], "p5": ch[3], "p6": ch[3]}
