"""Model zoo URI resolution (reference cubercnn/util/model_zoo.py:7-24).

`cubercnn://x/y.pth` -> https://dl.fbaipublicfiles.com/cubercnn/x/y.pth,
cached under ~/.cache/omni3d_tpu. This environment has no egress; resolution
still works for local paths and pre-populated caches.
"""
from __future__ import annotations

import os
import urllib.request

PREFIX = "cubercnn://"
BASE_URL = "https://dl.fbaipublicfiles.com/cubercnn/"
CACHE_DIR = os.path.expanduser("~/.cache/omni3d_tpu")


def resolve(path: str) -> str:
    if not path.startswith(PREFIX):
        return path
    rel = path[len(PREFIX):]
    local = os.path.join(CACHE_DIR, rel)
    if os.path.exists(local):
        return local
    os.makedirs(os.path.dirname(local), exist_ok=True)
    url = BASE_URL + rel
    urllib.request.urlretrieve(url, local)
    return local


# file stems of the ImageNet weights each backbone family initializes from
# (reference dla.py:30-31 URL scheme `{name}-{hash}.pth`; torchvision download
# names for the rest).
_IMAGENET_STEMS = {
    "build_dla_from_vision_fpn_backbone": lambda cfg: [
        cfg.MODEL.DLA.TYPE + ("+tricks" if cfg.MODEL.DLA.TRICKS else ""),
        cfg.MODEL.DLA.TYPE,
    ],
    "build_resnet_from_vision_fpn_backbone": lambda cfg: [
        f"resnet{cfg.MODEL.RESNETS.DEPTH}"
    ],
    "build_densenet_fpn_backbone": lambda cfg: ["densenet121"],
    "build_mnasnet_fpn_backbone": lambda cfg: ["mnasnet1.0", "mnasnet1_0"],
    "build_shufflenet_fpn_backbone": lambda cfg: [
        "shufflenetv2_x1.0", "shufflenetv2_x1"
    ],
}


def find_imagenet_weights(cfg) -> str | None:
    """Locate a local ImageNet .pth for cfg's backbone (no-egress stand-in for
    the reference's model_zoo.load_url, dla.py:300-309): searches
    TPU.IMAGENET_WEIGHTS_DIR then ~/.cache/omni3d_tpu/imagenet for a file
    whose name starts with the family's stem."""
    stems = _IMAGENET_STEMS.get(cfg.MODEL.BACKBONE.NAME, lambda c: [])(cfg)
    dirs = [getattr(cfg.TPU, "IMAGENET_WEIGHTS_DIR", ""),
            os.path.join(CACHE_DIR, "imagenet")]
    for d in dirs:
        if not d or not os.path.isdir(d):
            continue
        files = sorted(os.listdir(d))
        for stem in stems:
            for f in files:
                if f.startswith(stem) and f.endswith((".pth", ".pkl")):
                    return os.path.join(d, f)
    return None


def load_reference_weights(path: str):
    """Load a reference .pth/.pkl checkpoint into a torch state dict."""
    path = resolve(path)
    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            return pickle.load(f, encoding="latin1")
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
