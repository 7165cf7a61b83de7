"""Torch fixtures for DenseNet-121 / MNASNet-1.0 / ShuffleNetV2-x1.0
reproducing the torchvision checkpoint namespaces (used by the reference at
cubercnn/modeling/backbone/{densenet,mnasnet,shufflenet}.py via
`pretrained=True`).

As with tests/torch_dla34.py and tests/torch_resnet.py, the module/attribute
names are transcribed from the PUBLISHED torchvision state-dict layouts —
independent of the `flax_path_to_torch` mapping under test — and each module
is runnable, with the forward emitting p2..p6 at exactly the reference
backbone's split points (densenet.py:25-38, mnasnet.py:24-38,
shufflenet.py:27-44).
"""
from __future__ import annotations

from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F


def _randomize(module: nn.Module, seed: int, scale: float = 0.05) -> dict:
    """Small random weights keep deep-stack activations O(1) so absolute
    parity tolerances are meaningful."""
    torch.manual_seed(seed)
    sd = {}
    for k, v in module.state_dict().items():
        if v.dtype.is_floating_point:
            v = torch.randn_like(v) * scale
            if k.endswith("running_var"):
                v = v.abs() + 0.5
        sd[k] = v
    return sd


# ------------------------------ DenseNet-121 ------------------------------

class _DenseLayer(nn.Module):
    def __init__(self, cin, growth=32, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        h = self.conv1(F.relu(self.norm1(x)))
        h = self.conv2(F.relu(self.norm2(h)))
        return torch.cat([x, h], 1)


class _DenseBlock(nn.Module):
    def __init__(self, cin, n, growth=32):
        super().__init__()
        for i in range(n):
            self.add_module(f"denselayer{i + 1}", _DenseLayer(cin + i * growth, growth))

    def forward(self, x):
        for layer in self.children():
            x = layer(x)
        return x


class _Transition(nn.Sequential):
    def __init__(self, cin, cout):
        super().__init__(OrderedDict([
            ("norm", nn.BatchNorm2d(cin)),
            ("relu", nn.ReLU(inplace=True)),
            ("conv", nn.Conv2d(cin, cout, 1, bias=False)),
            ("pool", nn.AvgPool2d(2, 2)),
        ]))


class TorchDenseNet121(nn.Module):
    """torchvision densenet121 `features`, split per reference
    densenet.py:25-38 (p5 = norm5 output, NO final relu)."""

    def __init__(self):
        super().__init__()
        self.features = nn.Sequential(OrderedDict([
            ("conv0", nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)),
            ("norm0", nn.BatchNorm2d(64)),
            ("relu0", nn.ReLU(inplace=True)),
            ("pool0", nn.MaxPool2d(3, stride=2, padding=1)),
            ("denseblock1", _DenseBlock(64, 6)),
            ("transition1", _Transition(256, 128)),
            ("denseblock2", _DenseBlock(128, 12)),
            ("transition2", _Transition(512, 256)),
            ("denseblock3", _DenseBlock(256, 24)),
            ("transition3", _Transition(1024, 512)),
            ("denseblock4", _DenseBlock(512, 16)),
            ("norm5", nn.BatchNorm2d(1024)),
        ]))
        self.classifier = nn.Linear(1024, 1000)

    def forward(self, x):
        f = self.features
        p2 = f[0:5](x)
        p3 = f[5:7](p2)
        p4 = f[7:9](p3)
        p5 = f[9:](p4)
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5,
                "p6": F.max_pool2d(p5, 1, stride=2)}


# ------------------------------ MNASNet-1.0 ------------------------------

class _MNInvertedResidual(nn.Module):
    def __init__(self, cin, cout, kernel, stride, expansion):
        super().__init__()
        mid = cin * expansion
        self.apply_residual = stride == 1 and cin == cout
        self.layers = nn.Sequential(
            nn.Conv2d(cin, mid, 1, bias=False),
            nn.BatchNorm2d(mid),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid, mid, kernel, stride=stride, padding=kernel // 2,
                      groups=mid, bias=False),
            nn.BatchNorm2d(mid),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid, cout, 1, bias=False),
            nn.BatchNorm2d(cout),
        )

    def forward(self, x):
        out = self.layers(x)
        return out + x if self.apply_residual else out


def _mn_stack(cin, cout, kernel, stride, expansion, n):
    blocks = [_MNInvertedResidual(cin, cout, kernel, stride, expansion)]
    blocks += [_MNInvertedResidual(cout, cout, kernel, 1, expansion)
               for _ in range(n - 1)]
    return nn.Sequential(*blocks)


class TorchMNASNet10(nn.Module):
    """torchvision mnasnet1_0 `layers`, split per reference mnasnet.py:24-38
    (p2 = layers[0:9], p3 = layers[9], p4 = layers[10:12], p5 = layers[12:14];
    the 1280-ch head convs layers[14:17] are never run by the backbone)."""

    def __init__(self):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(32),
            nn.ReLU(inplace=True),
            nn.Conv2d(32, 32, 3, padding=1, groups=32, bias=False),
            nn.BatchNorm2d(32),
            nn.ReLU(inplace=True),
            nn.Conv2d(32, 16, 1, bias=False),
            nn.BatchNorm2d(16),
            _mn_stack(16, 24, 3, 2, 3, 3),
            _mn_stack(24, 40, 5, 2, 3, 3),
            _mn_stack(40, 80, 5, 2, 6, 3),
            _mn_stack(80, 96, 3, 1, 6, 2),
            _mn_stack(96, 192, 5, 2, 6, 4),
            _mn_stack(192, 320, 3, 1, 6, 1),
            nn.Conv2d(320, 1280, 1, bias=False),
            nn.BatchNorm2d(1280),
            nn.ReLU(inplace=True),
        )
        self.classifier = nn.Sequential(nn.Dropout(0.2), nn.Linear(1280, 1000))

    def forward(self, x):
        p2 = self.layers[0:9](x)
        p3 = self.layers[9](p2)
        p4 = self.layers[10:12](p3)
        p5 = self.layers[12:14](p4)
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5,
                "p6": F.max_pool2d(p5, 1, stride=2)}


# ---------------------------- ShuffleNetV2-x1.0 ----------------------------

def _torch_channel_shuffle(x, groups=2):
    n, c, h, w = x.shape
    return (x.view(n, groups, c // groups, h, w)
            .transpose(1, 2).reshape(n, c, h, w))


class _ShuffleUnit(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        bf = cout // 2
        self.stride = stride
        if stride > 1:
            self.branch1 = nn.Sequential(
                nn.Conv2d(cin, cin, 3, stride=stride, padding=1, groups=cin,
                          bias=False),
                nn.BatchNorm2d(cin),
                nn.Conv2d(cin, bf, 1, bias=False),
                nn.BatchNorm2d(bf),
                nn.ReLU(inplace=True),
            )
        else:
            self.branch1 = nn.Sequential()
        b2_in = cin if stride > 1 else bf
        self.branch2 = nn.Sequential(
            nn.Conv2d(b2_in, bf, 1, bias=False),
            nn.BatchNorm2d(bf),
            nn.ReLU(inplace=True),
            nn.Conv2d(bf, bf, 3, stride=stride, padding=1, groups=bf,
                      bias=False),
            nn.BatchNorm2d(bf),
            nn.Conv2d(bf, bf, 1, bias=False),
            nn.BatchNorm2d(bf),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat((x1, self.branch2(x2)), 1)
        else:
            out = torch.cat((self.branch1(x), self.branch2(x)), 1)
        return _torch_channel_shuffle(out, 2)


class TorchShuffleNetV2(nn.Module):
    """torchvision shufflenet_v2_x1_0, split per reference
    shufflenet.py:27-44 (p2 = maxpool(conv1), conv5/fc never run)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, 24, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(24),
            nn.ReLU(inplace=True),
        )
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)

        def stage(cin, cout, n):
            units = [_ShuffleUnit(cin, cout, 2)]
            units += [_ShuffleUnit(cout, cout, 1) for _ in range(n - 1)]
            return nn.Sequential(*units)

        self.stage2 = stage(24, 116, 4)
        self.stage3 = stage(116, 232, 8)
        self.stage4 = stage(232, 464, 4)
        self.conv5 = nn.Sequential(
            nn.Conv2d(464, 1024, 1, bias=False),
            nn.BatchNorm2d(1024),
            nn.ReLU(inplace=True),
        )
        self.fc = nn.Linear(1024, 1000)

    def forward(self, x):
        p2 = self.maxpool(self.conv1(x))
        p3 = self.stage2(p2)
        p4 = self.stage3(p3)
        p5 = self.stage4(p4)
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5,
                "p6": F.max_pool2d(p5, 1, stride=2)}


FIXTURES = {
    "build_densenet_fpn_backbone": TorchDenseNet121,
    "build_mnasnet_fpn_backbone": TorchMNASNet10,
    "build_shufflenet_fpn_backbone": TorchShuffleNetV2,
}


def imagenet_state_dict(builder: str, seed: int = 0) -> dict:
    return _randomize(FIXTURES[builder](), seed)
