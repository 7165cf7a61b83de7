"""Feature Pyramid Network (detectron2-FPN semantics), TPU-native NHWC.

Equivalent of the detectron2 FPN module the reference wraps its backbones in
(reference dla.py:500-506, resnet.py:88-95; SURVEY §2.2): 1x1 lateral convs,
3x3 output convs, nearest-2x top-down pathway with sum fusion, 256 output
channels at every level.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import upsample_nearest_2x


class FPN(nn.Module):
    """Top-down pyramid over already-extracted bottom-up features.

    Call with a dict {name: NHWC tensor} ordered fine->coarse via
    `in_features`; returns a dict with the same names, all at `out_channels`.
    """

    in_features: Sequence[str] = ("p2", "p3", "p4", "p5", "p6")
    out_channels: int = 256
    fuse_type: str = "sum"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bottom_up: dict) -> dict:
        feats = [bottom_up[f] for f in self.in_features]
        # stage number = log2(stride); in_features are strides 4..64 -> 2..6
        stages = list(range(2, 2 + len(feats)))

        laterals = [
            nn.Conv(
                self.out_channels, (1, 1), use_bias=True, dtype=self.dtype,
                param_dtype=jnp.float32, name=f"fpn_lateral{s}",
            )(f)
            for s, f in zip(stages, feats)
        ]

        results = {}
        prev = laterals[-1]
        for i in range(len(feats) - 1, -1, -1):
            if i < len(feats) - 1:
                td = upsample_nearest_2x(prev)
                # guard odd spatial dims: crop to the lateral's shape
                td = td[:, : laterals[i].shape[1], : laterals[i].shape[2], :]
                prev = laterals[i] + td
                if self.fuse_type == "avg":
                    prev = prev * 0.5
            out = nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                dtype=self.dtype, param_dtype=jnp.float32, name=f"fpn_output{stages[i]}",
            )(prev)
            results[self.in_features[i]] = out
        return results
