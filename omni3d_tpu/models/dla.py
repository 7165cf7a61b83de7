"""Deep Layer Aggregation backbones (DLA-34 family), TPU-native.

Re-implementation of the DLA architecture (Yu et al., CVPR 2018) as flax
modules in NHWC, covering the variants the reference exposes
(reference cubercnn/modeling/backbone/dla.py:417-482 DLABackbone; the
architecture itself is the public ucbdrive/dla design). The backbone emits a
{p2..p6} pyramid at strides {4..64} where p6 is a stride-2 maxpool of p5
(reference dla.py:463-482).

Module names are chosen so the torch->flax checkpoint converter
(utils/checkpoint.py) can map reference state dicts key-for-key.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv, ConvBN, max_pool, max_pool_packed

# variant -> (levels per stage, channels per stage, block)
# (reference dla.py:312-415 model builders; _r = residual roots, x = grouped
# BottleneckX with cardinality 32, x2 = cardinality 64)
DLA_SPECS = {
    "dla34":    ([1, 1, 1, 2, 2, 1], [16, 32, 64, 128, 256, 512], "basic"),
    "dla46_c":  ([1, 1, 1, 2, 2, 1], [16, 32, 64, 64, 128, 256], "bottleneck"),
    "dla46x_c": ([1, 1, 1, 2, 2, 1], [16, 32, 64, 64, 128, 256], "bottleneckx"),
    "dla60x_c": ([1, 1, 1, 2, 3, 1], [16, 32, 64, 64, 128, 256], "bottleneckx"),
    "dla60":    ([1, 1, 1, 2, 3, 1], [16, 32, 128, 256, 512, 1024], "bottleneck"),
    "dla60x":   ([1, 1, 1, 2, 3, 1], [16, 32, 128, 256, 512, 1024], "bottleneckx"),
    "dla102":   ([1, 1, 1, 3, 4, 1], [16, 32, 128, 256, 512, 1024], "bottleneck_r"),
    "dla102x":  ([1, 1, 1, 3, 4, 1], [16, 32, 128, 256, 512, 1024], "bottleneckx_r"),
    "dla102x2": ([1, 1, 1, 3, 4, 1], [16, 32, 128, 256, 512, 1024], "bottleneckx2_r"),
    "dla169":   ([1, 1, 2, 3, 5, 1], [16, 32, 128, 256, 512, 1024], "bottleneck_r"),
}


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block; the residual is supplied by the caller
    (DLA trees pass the projected/downsampled input).

    `in_packed` > 1: x arrives s2d-packed at that factor (eval-only stem
    fast path); conv1 consumes it in packed polyphase form."""

    features: int
    stride: int = 1
    train: bool = False
    in_packed: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is None:
            residual = x
        out = ConvBN(self.features, 3, self.stride, s2d=self.in_packed or 1,
                     in_packed=bool(self.in_packed), train=self.train,
                     dtype=self.dtype, name="conv1")(x)
        out = ConvBN(self.features, 3, 1, relu=False, train=self.train, dtype=self.dtype, name="conv2")(out)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (expansion 2)."""

    features: int
    stride: int = 1
    train: bool = False
    in_packed: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        assert not self.in_packed, "packed stem path is basic-block only"
        if residual is None:
            residual = x
        mid = self.features // 2
        out = ConvBN(mid, 1, 1, train=self.train, dtype=self.dtype, name="conv1")(x)
        out = ConvBN(mid, 3, self.stride, train=self.train, dtype=self.dtype, name="conv2")(out)
        out = ConvBN(self.features, 1, 1, relu=False, train=self.train, dtype=self.dtype, name="conv3")(out)
        return nn.relu(out + residual)


class BottleneckX(nn.Module):
    """Grouped (ResNeXt-style) bottleneck: 1x1 -> grouped 3x3 -> 1x1
    (reference dla.py:112-153; bottle planes = features * cardinality / 32)."""

    features: int
    stride: int = 1
    cardinality: int = 32
    train: bool = False
    in_packed: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        assert not self.in_packed, "packed stem path is basic-block only"
        if residual is None:
            residual = x
        mid = self.features * self.cardinality // 32
        out = ConvBN(mid, 1, 1, train=self.train, dtype=self.dtype, name="conv1")(x)
        out = ConvBN(mid, 3, self.stride, groups=self.cardinality,
                     train=self.train, dtype=self.dtype, name="conv2")(out)
        out = ConvBN(self.features, 1, 1, relu=False, train=self.train,
                     dtype=self.dtype, name="conv3")(out)
        return nn.relu(out + residual)


class BottleneckX2(BottleneckX):
    cardinality: int = 64


_BLOCKS = {
    "basic": BasicBlock,
    "bottleneck": Bottleneck,
    "bottleneck_r": Bottleneck,
    "bottleneckx": BottleneckX,
    "bottleneckx_r": BottleneckX,
    "bottleneckx2_r": BottleneckX2,
}


class Root(nn.Module):
    """Aggregation node: 1x1 conv over concatenated children + BN (+res) + relu."""

    features: int
    residual: bool = False
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children: Sequence[jnp.ndarray]):
        x = jnp.concatenate(children, axis=-1)
        x = Conv(self.features, 1, 1, padding=0, dtype=self.dtype, name="conv")(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="bn")(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive DLA aggregation tree (reference dla.py:177-230 semantics)."""

    levels: int
    block: str
    in_features: int
    features: int
    stride: int = 1
    level_root: bool = False
    root_residual: bool = False
    train: bool = False
    in_packed: int = 0  # s2d factor of a packed input (eval stem fast path)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, children=None):
        children = list(children) if children is not None else []
        Block = _BLOCKS[self.block]

        if self.in_packed:
            # packed input: stride == factor, so the downsample is the max
            # over each block's phases and leaves the packed domain
            assert self.levels == 1 and self.stride == self.in_packed
            bottom = max_pool_packed(x, self.in_packed, self.stride, self.stride)
        else:
            bottom = max_pool(x, self.stride, self.stride) if self.stride > 1 else x
        if self.in_features != self.features:
            residual = ConvBN(
                self.features, 1, 1, padding=0, relu=False,
                train=self.train, dtype=self.dtype, name="project",
            )(bottom)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = Block(self.features, self.stride, train=self.train,
                       in_packed=self.in_packed, dtype=self.dtype,
                       name="tree1")(x, residual)
            x2 = Block(self.features, 1, train=self.train, dtype=self.dtype, name="tree2")(x1)
            out = Root(
                self.features, residual=self.root_residual,
                train=self.train, dtype=self.dtype, name="root",
            )([x2, x1] + children)
        else:
            x1 = Tree(
                self.levels - 1, self.block, self.in_features, self.features,
                self.stride, root_residual=self.root_residual,
                train=self.train, dtype=self.dtype, name="tree1",
            )(x)
            children.append(x1)
            out = Tree(
                self.levels - 1, self.block, self.features, self.features,
                1, root_residual=self.root_residual,
                train=self.train, dtype=self.dtype, name="tree2",
            )(x1, children=children)
        return out


class DLA(nn.Module):
    """DLA trunk emitting {p2..p6} at strides {4..64}."""

    variant: str = "dla34"
    train: bool = False
    stem_s2d: int = 4  # space-to-depth factor for the full-res stem convs
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        levels, channels, block = DLA_SPECS[self.variant]
        residual_root = self.variant in ("dla102", "dla102x", "dla102x2", "dla169")
        t = dict(train=self.train, dtype=self.dtype)

        # s2d=4: the full-resolution stem convs (C=3..16) underfill MXU
        # lanes; evaluate them in space-to-depth form (exact, see layers.Conv).
        # The whole stem chains in PACKED space-to-depth form (BN and relu
        # act per-channel on packed channels): the stride-2 level1 conv
        # halves the packing factor (F 4 -> 2) and level2's entry (phase
        # max-pool + packed tree1 conv1) exits the packed domain at stride
        # 4 — no unpack/repack relayouts between, the stem's pack transpose
        # is the only one left. Exact arithmetic; the chain needs
        # levels[2]==1 basic blocks (DLA-34 family). Worth ~4 ms at
        # bs=32/512px inference; since r5 the packed chain also runs in
        # TRAINING (batch stats computed per real channel on the packed
        # layout, layers._TrainPackedBN) — packed vs plain stem fwd+bwd
        # measured 17.4 vs 26.1 ms at bs=32.
        packed = self.stem_s2d == 4 and block == "basic" \
            and levels[2] == 1 \
            and x.shape[1] % self.stem_s2d == 0 and x.shape[2] % self.stem_s2d == 0
        x = ConvBN(channels[0], 7, 1, s2d=self.stem_s2d, out_packed=packed,
                   **t, name="base_layer")(x)
        x = ConvBN(channels[0], 3, 1, s2d=self.stem_s2d, in_packed=packed,
                   out_packed=packed, **t, name="level0")(x)
        x = ConvBN(channels[1], 3, 2, s2d=self.stem_s2d if packed else 1,
                   in_packed=packed, out_packed=packed, **t, name="level1")(x)
        l2 = Tree(levels[2], block, channels[1], channels[2], 2,
                  root_residual=residual_root,
                  in_packed=2 if packed else 0, **t, name="level2")(x)
        l3 = Tree(levels[3], block, channels[2], channels[3], 2, level_root=True,
                  root_residual=residual_root, **t, name="level3")(l2)
        l4 = Tree(levels[4], block, channels[3], channels[4], 2, level_root=True,
                  root_residual=residual_root, **t, name="level4")(l3)
        l5 = Tree(levels[5], block, channels[4], channels[5], 2, level_root=True,
                  root_residual=residual_root, **t, name="level5")(l4)
        p6 = max_pool(l5, 1, 2)
        return {"p2": l2, "p3": l3, "p4": l4, "p5": l5, "p6": p6}


def dla_out_channels(variant: str) -> dict:
    ch = DLA_SPECS[variant][1]
    return {"p2": ch[2], "p3": ch[3], "p4": ch[4], "p5": ch[5], "p6": ch[5]}
