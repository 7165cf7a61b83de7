"""Torch fixtures for full-model forward parity (non-circular).

Transcribes the torch module stack the reference binds AROUND the backbone —
detectron2 FPN (lateral 1x1 + output 3x3 convs, nearest-2x top-down sum;
bound at reference dla.py:500-506 / resnet.py:88-95), detectron2
StandardRPNHead (shared 3x3 conv + 1x1 objectness/deltas heads),
FastRCNNConvFCHead + FastRCNNOutputLayers (flatten-CHW -> fc1 -> fc2 ->
cls_score/bbox_pred), the reference CubeHead
(/root/reference/cubercnn/modeling/roi_heads/cube_head.py:51-197), and the
detectron2 multilevel ROIPooler level assignment.

Attribute names reproduce the PUBLISHED checkpoint namespace so the converter
under test cannot influence the expected key set. The 6d->rotation-matrix
conversion follows the published Zhou et al. continuity formula (same one
pytorch3d implements; pytorch3d is not installed here).
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as TF


class TorchFPN(nn.Module):
    """detectron2 FPN over already-extracted bottom-up features p2..p6."""

    def __init__(self, in_channels=(64, 128, 256, 512, 512), out_channels=256):
        super().__init__()
        self.stages = list(range(2, 2 + len(in_channels)))
        for s, cin in zip(self.stages, in_channels):
            self.add_module(f"fpn_lateral{s}", nn.Conv2d(cin, out_channels, 1))
            self.add_module(
                f"fpn_output{s}", nn.Conv2d(out_channels, out_channels, 3, padding=1)
            )

    def forward(self, feats: dict) -> dict:
        names = [f"p{s}" for s in self.stages]
        laterals = [
            getattr(self, f"fpn_lateral{s}")(feats[n])
            for s, n in zip(self.stages, names)
        ]
        out = {}
        prev = laterals[-1]
        out[names[-1]] = getattr(self, f"fpn_output{self.stages[-1]}")(prev)
        for i in range(len(names) - 2, -1, -1):
            td = TF.interpolate(prev, scale_factor=2.0, mode="nearest")
            td = td[:, :, : laterals[i].shape[2], : laterals[i].shape[3]]
            prev = laterals[i] + td
            out[names[i]] = getattr(self, f"fpn_output{self.stages[i]}")(prev)
        return out


class TorchRPNHead(nn.Module):
    """detectron2 StandardRPNHead."""

    def __init__(self, in_channels=256, num_anchors=3):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, in_channels, 3, padding=1)
        self.objectness_logits = nn.Conv2d(in_channels, num_anchors, 1)
        self.anchor_deltas = nn.Conv2d(in_channels, num_anchors * 4, 1)

    def forward(self, features):
        logits, deltas = [], []
        for f in features:
            t = TF.relu(self.conv(f))
            logits.append(self.objectness_logits(t))
            deltas.append(self.anchor_deltas(t))
        return logits, deltas


class TorchBoxHead(nn.Module):
    """FastRCNNConvFCHead NUM_FC=2: flatten NCHW -> fc -> relu."""

    def __init__(self, in_dim=256 * 7 * 7, fc_dim=1024):
        super().__init__()
        self.fc1 = nn.Linear(in_dim, fc_dim)
        self.fc2 = nn.Linear(fc_dim, fc_dim)

    def forward(self, x):
        x = torch.flatten(x, start_dim=1)
        x = TF.relu(self.fc1(x))
        x = TF.relu(self.fc2(x))
        return x


class TorchPredictor(nn.Module):
    """FastRCNNOutputLayers: cls_score (C+1) + bbox_pred (C*4)."""

    def __init__(self, num_classes, fc_dim=1024):
        super().__init__()
        self.cls_score = nn.Linear(fc_dim, num_classes + 1)
        self.bbox_pred = nn.Linear(fc_dim, num_classes * 4)

    def forward(self, x):
        return self.cls_score(x), self.bbox_pred(x)


def rotation_6d_to_matrix(d6: torch.Tensor) -> torch.Tensor:
    """Zhou et al. 6D continuity parametrization (published formula)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = TF.normalize(a1, dim=-1)
    b2 = a2 - (b1 * a2).sum(-1, keepdim=True) * b1
    b2 = TF.normalize(b2, dim=-1)
    b3 = torch.cross(b1, b2, dim=-1)
    return torch.stack((b1, b2, b3), dim=-2)


class TorchCubeHead(nn.Module):
    """Reference CubeHead, shared_fc + 6d pose + use_conf (the defaults;
    cube_head.py:51-197)."""

    def __init__(self, num_classes, in_dim=256 * 7 * 7, fc_dim=1024):
        super().__init__()
        C = num_classes
        self.num_classes = C
        self.feature_generator = nn.Sequential()
        self.feature_generator.add_module("fc1", nn.Linear(in_dim, fc_dim))
        self.feature_generator.add_module("fc_relu1", nn.ReLU())
        self.feature_generator.add_module("fc2", nn.Linear(fc_dim, fc_dim))
        self.feature_generator.add_module("fc_relu2", nn.ReLU())
        self.bbox_3D_dims = nn.Linear(fc_dim, C * 3)
        self.bbox_3D_center_deltas = nn.Linear(fc_dim, C * 2)
        self.bbox_3D_pose = nn.Linear(fc_dim, C * 6)
        self.bbox_3D_center_depth = nn.Linear(fc_dim, C * 1)
        self.bbox_3D_uncertainty = nn.Linear(fc_dim, C * 1)

    def forward(self, x):
        n = x.shape[0]
        C = self.num_classes
        x = torch.flatten(x, start_dim=1)
        f = self.feature_generator(x)
        deltas = self.bbox_3D_center_deltas(f).view(n, C, 2)
        dims = self.bbox_3D_dims(f).view(n, C, 3)
        pose = rotation_6d_to_matrix(self.bbox_3D_pose(f).view(-1, 6)).view(n, C, 3, 3)
        z = self.bbox_3D_center_depth(f).view(n, C)
        uncert = self.bbox_3D_uncertainty(f).clip(0.01).view(n, C)
        return deltas, z, dims, pose, uncert


def assign_levels(boxes: np.ndarray, min_level=2, max_level=6,
                  canonical_size=224.0, canonical_level=4) -> np.ndarray:
    """detectron2 assign_boxes_to_levels (ROIPooler)."""
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    lvl = np.floor(canonical_level + np.log2(np.sqrt(area) / canonical_size + 1e-8))
    return np.clip(lvl, min_level, max_level).astype(np.int64)


def multilevel_pool_oracle(feats_nchw: dict, boxes: np.ndarray, out_size=7,
                           sampling_ratio=0) -> np.ndarray:
    """detectron2 ROIPooler with ROIAlignV2 per level, via the numpy
    roi_align oracle (torchvision aligned=True semantics)."""
    from test_ops import roi_align_oracle

    levels = assign_levels(boxes)
    C = feats_nchw["p2"].shape[1]
    out = np.zeros((boxes.shape[0], out_size, out_size, C), np.float32)
    for lvl in range(2, 7):
        sel = np.nonzero(levels == lvl)[0]
        if sel.size == 0:
            continue
        f = feats_nchw[f"p{lvl}"][0].transpose(1, 2, 0)  # HWC
        pooled = roi_align_oracle(f, boxes[sel], out_size, 1.0 / (2 ** lvl),
                                  sampling_ratio)
        out[sel] = pooled
    return out


def load_prefixed(module: nn.Module, sd: dict, prefix: str):
    sub = {k[len(prefix):]: torch.as_tensor(np.asarray(v))
           for k, v in sd.items() if k.startswith(prefix)}
    module.load_state_dict(sub)
    module.eval()
    return module
