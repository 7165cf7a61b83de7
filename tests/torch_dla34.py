"""Torch DLA-34 test fixture reproducing the REAL reference checkpoint
namespace (public ucbdrive/dla layout, vendored by the reference at
cubercnn/modeling/backbone/dla.py:40-298).

This exists to break the converter's previously-circular validation: the key
names here come from an independent torch module tree whose attribute names
are transcribed from the published checkpoint format, NOT generated from the
`flax_path_to_torch` mapping under test. It also provides a runnable forward
so converted weights can be checked for activation parity.

Only the DLA-34 configuration (BasicBlock, levels [1,1,1,2,2,1]) is built —
that is the flagship backbone.
"""
from __future__ import annotations

import torch
import torch.nn as nn


def _conv_bn_relu(cin, cout, k, stride=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, stride=stride, padding=(k - 1) // 2, bias=False),
        nn.BatchNorm2d(cout),
        nn.ReLU(inplace=True),
    )


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, stride=1, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)

    def forward(self, x, residual=None):
        if residual is None:
            residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + residual)


class Root(nn.Module):
    def __init__(self, cin, cout, residual=False):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 1, stride=1, bias=False)
        self.bn = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.residual = residual

    def forward(self, *children):
        x = self.bn(self.conv(torch.cat(children, 1)))
        if self.residual:
            x = x + children[0]
        return self.relu(x)


class Tree(nn.Module):
    def __init__(self, levels, cin, cout, stride=1, level_root=False,
                 root_dim=0, root_residual=False):
        super().__init__()
        if root_dim == 0:
            root_dim = 2 * cout
        if level_root:
            root_dim += cin
        if levels == 1:
            self.tree1 = BasicBlock(cin, cout, stride)
            self.tree2 = BasicBlock(cout, cout, 1)
            self.root = Root(root_dim, cout, root_residual)
        else:
            self.tree1 = Tree(levels - 1, cin, cout, stride, root_dim=0,
                              root_residual=root_residual)
            self.tree2 = Tree(levels - 1, cout, cout,
                              root_dim=root_dim + cout,
                              root_residual=root_residual)
        self.level_root = level_root
        self.levels = levels
        self.downsample = nn.MaxPool2d(stride, stride=stride) if stride > 1 else None
        # NOTE: the published format registers `project` whenever cin != cout,
        # including on multi-level trees where forward never consumes it — the
        # checkpoint contains those (dead) tensors and so must the manifest.
        self.project = None
        if cin != cout:
            self.project = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=1, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x, residual=None, children=None):
        children = [] if children is None else children
        bottom = self.downsample(x) if self.downsample else x
        residual = self.project(bottom) if self.project else bottom
        if self.level_root:
            children.append(bottom)
        x1 = self.tree1(x, residual)
        if self.levels == 1:
            x2 = self.tree2(x1)
            return self.root(x2, x1, *children)
        children.append(x1)
        return self.tree2(x1, children=children)


class TorchDLA34(nn.Module):
    """DLA-34 trunk with the DLABackbone p2..p6 pyramid heads
    (reference dla.py:417-482: p6 = stride-2 1x1 maxpool of p5)."""

    def __init__(self):
        super().__init__()
        ch = [16, 32, 64, 128, 256, 512]
        self.base_layer = _conv_bn_relu(3, ch[0], 7)
        self.level0 = _conv_bn_relu(ch[0], ch[0], 3)
        self.level1 = _conv_bn_relu(ch[0], ch[1], 3, stride=2)
        self.level2 = Tree(1, ch[1], ch[2], 2, level_root=False)
        self.level3 = Tree(2, ch[2], ch[3], 2, level_root=True)
        self.level4 = Tree(2, ch[3], ch[4], 2, level_root=True)
        self.level5 = Tree(1, ch[4], ch[5], 2, level_root=True)

    def forward(self, x):
        x = self.base_layer(x)
        x = self.level0(x)
        x = self.level1(x)
        p2 = self.level2(x)
        p3 = self.level3(p2)
        p4 = self.level4(p3)
        p5 = self.level5(p4)
        p6 = nn.functional.max_pool2d(p5, kernel_size=1, stride=2)
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5, "p6": p6}


def imagenet_state_dict(seed: int = 0) -> dict:
    """Randomized state dict in the exact flat ImageNet namespace
    (reference load_pretrained_model deletes fc.*, dla.py:300-309)."""
    torch.manual_seed(seed)
    m = TorchDLA34()
    sd = {}
    for k, v in m.state_dict().items():
        if v.dtype.is_floating_point:
            v = torch.randn_like(v) * 0.05
            if k.endswith("running_var"):
                v = v.abs() + 0.5
        sd[k] = v
    return sd
