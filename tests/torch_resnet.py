"""Torch ResNet-34 test fixture reproducing the torchvision checkpoint
namespace (public torchvision layout, used by the reference at
cubercnn/modeling/backbone/resnet.py:12-63 via `pretrained=True`).

Like tests/torch_dla34.py, the attribute names here are transcribed from the
PUBLISHED torchvision state-dict format, independent of the
`flax_path_to_torch` mapping under test, and the module is runnable so the
converted weights can be checked for activation parity.
"""
from __future__ import annotations

import torch
import torch.nn as nn


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + idt)


class TorchResNet34(nn.Module):
    """torchvision resnet34 feature extractor: stem + layer1..4, outputs
    p2..p5 at strides 4..32 plus p6 = stride-2 maxpool of p5 (the reference
    backbone adds LastLevelMaxPool, resnet.py:93)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)

        def stage(cin, cout, n, stride):
            blocks = [BasicBlock(cin, cout, stride)]
            blocks += [BasicBlock(cout, cout) for _ in range(n - 1)]
            return nn.Sequential(*blocks)

        self.layer1 = stage(64, 64, 3, 1)
        self.layer2 = stage(64, 128, 4, 2)
        self.layer3 = stage(128, 256, 6, 2)
        self.layer4 = stage(256, 512, 3, 2)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        p2 = self.layer1(x)
        p3 = self.layer2(p2)
        p4 = self.layer3(p3)
        p5 = self.layer4(p4)
        p6 = torch.nn.functional.max_pool2d(p5, 1, stride=2)
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5, "p6": p6}


def imagenet_state_dict(seed: int = 0) -> dict:
    """Random-valued state dict with the exact torchvision resnet34 keys
    (incl. the fc head, which the converter must ignore)."""
    torch.manual_seed(seed)
    m = TorchResNet34()
    sd = {}
    for k, v in m.state_dict().items():
        if v.dtype.is_floating_point:
            # small weights keep activations O(1) through 34 layers so an
            # absolute parity tolerance is meaningful
            v = torch.randn_like(v) * 0.05
            if k.endswith("running_var"):
                v = v.abs() + 0.5
        sd[k] = v
    # the torchvision file also carries the classifier head
    sd["fc.weight"] = torch.randn(1000, 512) * 0.05
    sd["fc.bias"] = torch.randn(1000) * 0.05
    return sd
