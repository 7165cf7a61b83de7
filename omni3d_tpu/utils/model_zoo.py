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


def load_reference_weights(path: str):
    """Load a reference .pth/.pkl checkpoint into a torch state dict."""
    path = resolve(path)
    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            return pickle.load(f, encoding="latin1")
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
