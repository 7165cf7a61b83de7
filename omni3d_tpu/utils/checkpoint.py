"""Checkpointing: native save/load + reference-.pth converter.

Replaces the reference checkpoint stack (detectron2 DetectionCheckpointer +
PeriodicCheckpointerOnlyOne, cubercnn/solver/checkpoint.py:5-27, tools/
train_net.py:128-145): a single rolling `model_recent` plus `model_final`,
resume bookkeeping via the stored step, and a converter that maps reference
torch state dicts (MODEL_ZOO .pth files) onto the flax parameter tree to fp32
fidelity — including the OIHW->HWIO conv transpose and the CHW->HWC column
permutation of the first FC after RoI pooling.
"""
from __future__ import annotations

import os
import pickle
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# ------------------------------ native save/load ------------------------------


def save_checkpoint(path: str, state, extra: dict | None = None):
    """Pickle a TrainState-like pytree of numpy-able leaves."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "tree": jax.tree.map(lambda x: np.asarray(x), state),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload["tree"], payload["extra"]


class PeriodicCheckpointer:
    """Rolling single-file checkpointer (reference solver/checkpoint.py:5-27):
    overwrites `model_recent` every `period` steps, writes `model_final` at
    max_iter."""

    def __init__(self, output_dir: str, period: int, max_iter: int):
        self.output_dir = output_dir
        self.period = period
        self.max_iter = max_iter

    def step(self, iteration: int, state, extra=None):
        if (iteration + 1) % self.period == 0:
            save_checkpoint(os.path.join(self.output_dir, "model_recent.ckpt"), state, extra)
        if iteration + 1 >= self.max_iter:
            save_checkpoint(os.path.join(self.output_dir, "model_final.ckpt"), state, extra)


def resume_or_load(output_dir: str):
    """Return (state_tree, extra) of model_recent if present, else None."""
    path = os.path.join(output_dir, "model_recent.ckpt")
    if os.path.exists(path):
        return load_checkpoint(path)
    return None


# ------------------------------ torch converter ------------------------------


def _conv_kernel(t):  # OIHW -> HWIO
    return np.transpose(np.asarray(t, np.float32), (2, 3, 1, 0))


def _linear_kernel(t):  # (out, in) -> (in, out)
    return np.transpose(np.asarray(t, np.float32))


def _linear_kernel_chw(t, c, h, w):
    """First-FC-after-pooling kernel: torch flattens pooled features as
    (C, H, W); ours flatten as (H, W, C). Permute input columns accordingly."""
    t = np.asarray(t, np.float32)  # (out, c*h*w)
    out = t.shape[0]
    t = t.reshape(out, c, h, w).transpose(0, 2, 3, 1).reshape(out, h * w * c)
    return np.transpose(t)


def flax_path_to_torch(path: tuple[str, ...]) -> str | None:
    """Map a flax param/batch-stat path to the reference torch key prefix.

    Citations: DLA module names (reference cubercnn/modeling/backbone/
    dla.py:233-298,417-482), FPN/RPN/box head names (detectron2 module
    attributes bound in SURVEY §2.2), cube head (cube_head.py:51-144).
    Returns None for keys with no torch counterpart.
    """
    p = list(path)
    top = p[0]

    if top == "backbone":
        rest = p[1:]
        names = set(rest)
        joined = " ".join(rest)
        if any(n.startswith(("denseblock", "transition")) or n in ("conv0", "norm0", "norm5")
               for n in rest):
            return _densenet_torch_key(rest)
        if any(n.startswith(("stack", "stem0", "stem_dw", "stem_pw")) for n in rest):
            return _mnasnet_torch_key(rest)
        if any(re.fullmatch(r"stage\d+_\d+", n) or n.startswith(("b1_", "b2_"))
               for n in rest) or (len(rest) >= 2 and rest[0] == "conv1" and rest[1] in ("c", "n")):
            return _shufflenet_torch_key(rest)
        out = ["backbone", "bottom_up"]
        i = 0
        while i < len(rest):
            name = rest[i]
            if name in ("base_layer", "level0", "level1"):
                # Sequential [conv, bn, relu]
                sub = rest[i + 1]  # 'c' or 'n'
                out.append(f"{name}.0" if sub == "c" else f"{name}.1")
                i += 3  # skip c/conv or n/bn
            elif name == "stem":  # resnet stem: conv1 + bn1
                sub = rest[i + 1]
                out.append("conv1" if sub == "c" else "bn1")
                i += 3
            elif re.fullmatch(r"layer\d+_\d+", name):  # resnet blocks
                stage, blk = name[5:].split("_")
                out.append(f"layer{stage}.{blk}")
                i += 1
            elif re.fullmatch(r"conv\d", name):
                sub = rest[i + 1]
                out.append(name if sub == "c" else "bn" + name[-1])
                i += 3
            elif name == "downsample":  # resnet downsample Sequential
                sub = rest[i + 1]
                out.append("downsample.0" if sub == "c" else "downsample.1")
                i += 3
            elif name == "project":  # DLA tree projection Sequential
                sub = rest[i + 1]
                out.append("project.0" if sub == "c" else "project.1")
                i += 3
            elif name == "root":
                # flax Root nests Conv('conv'->nn.Conv 'conv') and
                # BatchNorm('bn'->'bn'); torch Root is flat root.conv/root.bn
                out.append("root." + rest[i + 1])  # conv | bn
                i += 3
            else:  # levelK, tree1, tree2 pass through
                out.append(name)
                i += 1
        return ".".join(out)

    if top == "fpn":
        return "backbone." + p[1]

    if top == "rpn_head":
        return "proposal_generator.rpn_head." + p[1]

    if top == "box_head":
        return "roi_heads.box_head." + p[1]

    if top == "box_predictor":
        return "roi_heads.box_predictor." + p[1]

    if top == "cube_head":
        name = p[1]
        m = re.fullmatch(r"(feature_generator(?:_\w+?)?)_fc(\d)", name)
        if m:
            return f"roi_heads.cube_head.{m.group(1)}.fc{m.group(2)}"
        return "roi_heads.cube_head." + name

    if top.startswith("priors"):
        return "roi_heads." + top

    return None


def _densenet_torch_key(rest):
    """DenseNet-121 mapping: reference wraps torchvision `features` as
    `self.base` (reference densenet.py:16-19), so keys look like
    backbone.bottom_up.base.denseblock1.denselayer1.conv1.weight."""
    out = ["backbone", "bottom_up", "base"]
    i = 0
    while i < len(rest):
        n = rest[i]
        if n in ("conv", "bn") and i == len(rest) - 1:
            i += 1  # flax leaf-module wrapper (layers.Conv 'conv' / BN 'bn')
            continue
        out.append(n)
        i += 1
    return ".".join(out)


def _mnasnet_torch_key(rest):
    """MNASNet-1.0: reference keeps torchvision `model.layers` as `self.base`
    (reference mnasnet.py:16-19); stems are flat Sequential indices and each
    inverted residual is `<stack>.<block>.layers.<idx>`."""
    stem = {"stem0": ("0", "1"), "stem_dw": ("3", "4"), "stem_pw": ("6", "7")}
    stack_base = {"stack1": 8, "stack2": 9, "stack3": 10, "stack4": 11,
                  "stack5": 12, "stack6": 13}
    sub = {"expand": ("0", "1"), "dw": ("3", "4"), "project": ("6", "7")}
    kind = "c" if ("c" in rest or rest[-1] == "conv") else "n"
    # identify pieces
    if rest[0] in stem:
        conv_i, bn_i = stem[rest[0]]
        return f"backbone.bottom_up.base.{conv_i if kind == 'c' else bn_i}"
    m = re.fullmatch(r"(stack\d)_(\d+)", rest[0])
    if m:
        base = stack_base[m.group(1)]
        blk = m.group(2)
        conv_i, bn_i = sub[rest[1]]
        return (f"backbone.bottom_up.base.{base}.{blk}.layers."
                f"{conv_i if kind == 'c' else bn_i}")
    return None


def _shufflenet_torch_key(rest):
    """ShuffleNetV2-x1.0: torchvision attribute names (reference
    shufflenet.py:16-22): conv1 Sequential + stage{2,3,4} of InvertedResidual
    units with branch1/branch2 Sequentials."""
    kind = "c" if "c" in rest else "n"
    if rest[0] == "conv1":
        return f"backbone.bottom_up.conv1.{'0' if kind == 'c' else '1'}"
    m = re.fullmatch(r"(stage\d+)_(\d+)", rest[0])
    if not m:
        return None
    prefix = f"backbone.bottom_up.{m.group(1)}.{m.group(2)}"
    table = {
        "b1_dw": ("branch1.0", "branch1.1"),
        "b1_pw": ("branch1.2", "branch1.3"),
        "b2_pw1": ("branch2.0", "branch2.1"),
        "b2_dw": ("branch2.3", "branch2.4"),
        "b2_pw2": ("branch2.5", "branch2.6"),
    }
    conv_k, bn_k = table[rest[1]]
    return f"{prefix}.{conv_k if kind == 'c' else bn_k}"


# ImageNet (backbone-only) namespaces: maps the full-model torch prefix our
# key mapping produces onto the prefix used by the published ImageNet weights
# each reference backbone initializes from (reference dla.py:300-309
# flat DLA names; resnet.py:66-96 / densenet.py / mnasnet.py / shufflenet.py
# torchvision `models.*(pretrained=True)` namespaces).
IMAGENET_PREFIXES = {
    "build_dla_from_vision_fpn_backbone": ("backbone.bottom_up.", ""),
    "build_resnet_from_vision_fpn_backbone": ("backbone.bottom_up.", ""),
    "build_densenet_fpn_backbone": ("backbone.bottom_up.base.", "features."),
    "build_mnasnet_fpn_backbone": ("backbone.bottom_up.base.", "layers."),
    "build_shufflenet_fpn_backbone": ("backbone.bottom_up.", ""),
}

# ImageNet classifier heads each family carries that the detector drops
# (reference dla.py:306-308 deletes fc.* before load_state_dict; the
# detectron2-wrapped families simply never run their heads: shufflenet's
# conv5/fc and mnasnet's 1280-ch top convs layers.14/15 — reference
# mnasnet.py:24-38 stops at layers[0:14]).
_IMAGENET_HEAD_PREFIXES = ("fc.", "classifier.", "conv5.",
                           "layers.14.", "layers.15.")


def convert_imagenet_backbone(state_dict: dict, params, batch_stats,
                              backbone_name: str, strict: bool = False):
    """Load flat ImageNet backbone weights into the `backbone` subtree only.

    Replaces the reference's from-scratch ImageNet initialization
    (dla.py:494 `imagenet_pretrain` gate -> load_pretrained_model :300-309,
    torchvision `pretrained=True` in resnet.py:66-96 and the densenet/
    mnasnet/shufflenet builders). The head/FPN params keep their random init.

    Returns (new_params, new_batch_stats, report).
    """
    model_prefix, imagenet_prefix = IMAGENET_PREFIXES[backbone_name]
    if "model" in state_dict and isinstance(state_dict["model"], dict):
        state_dict = state_dict["model"]
    if "state_dict" in state_dict and isinstance(state_dict["state_dict"], dict):
        state_dict = state_dict["state_dict"]
    sd = {}
    for k, v in state_dict.items():
        if k.startswith(_IMAGENET_HEAD_PREFIXES):
            continue
        if imagenet_prefix and not k.startswith(imagenet_prefix):
            continue
        sd[model_prefix + k[len(imagenet_prefix):]] = v
    wrapped_p = {"backbone": params["backbone"]}
    wrapped_s = {"backbone": batch_stats["backbone"]} if batch_stats else {}
    new_p, new_s, report = convert_reference_checkpoint(
        sd, wrapped_p, wrapped_s, strict=strict
    )
    out_p = dict(params)
    out_p["backbone"] = new_p["backbone"]
    out_s = batch_stats
    if batch_stats:
        out_s = dict(batch_stats)
        out_s["backbone"] = new_s["backbone"]
    return out_p, out_s, report


def convert_reference_checkpoint(state_dict: dict, params, batch_stats,
                                 pooled_shape=(256, 7, 7), strict: bool = True):
    """Load a reference torch state dict into (params, batch_stats).

    Args:
      state_dict: {torch key: numpy/torch tensor}. A detectron2-format
        checkpoint dict ({'model': ...}) is unwrapped automatically.
      params, batch_stats: flax trees to fill (shapes define expectations).
      pooled_shape: (C, H, W) of RoI-pooled features — needed to permute the
        first FC of box/cube heads from torch CHW flattening to our HWC.

    Returns (new_params, new_batch_stats, report dict).
    """
    if "model" in state_dict and isinstance(state_dict["model"], dict):
        state_dict = state_dict["model"]
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}

    used = set()
    missing = []
    C, H, W = pooled_shape

    def fill(tree, is_stats):
        flat = jax.tree_util.tree_flatten_with_path(tree)
        out = []
        for path, leaf in flat[0]:
            keys = tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in path)
            leafname = keys[-1]
            prefix = flax_path_to_torch(keys[:-1] if leafname in
                                        ("kernel", "bias", "scale", "mean", "var")
                                        else keys)
            if prefix is None:
                missing.append("/".join(map(str, keys)))
                out.append(leaf)
                continue
            if is_stats:
                tk = prefix + (".running_mean" if leafname == "mean" else ".running_var")
                val = sd.get(tk)
                if val is None:
                    missing.append(tk)
                    out.append(leaf)
                    continue
                used.add(tk)
                out.append(jnp.asarray(val, jnp.float32))
                continue
            if leafname == "scale":
                tk = prefix + ".weight"
                val = sd.get(tk)
            elif leafname == "bias":
                tk = prefix + ".bias"
                val = sd.get(tk)
            elif leafname == "kernel":
                tk = prefix + ".weight"
                val = sd.get(tk)
                if val is not None:
                    if val.ndim == 4:
                        val = _conv_kernel(val)
                    elif val.ndim == 2:
                        # first FC after RoI pooling needs the CHW->HWC permute
                        if val.shape[1] == C * H * W and (
                            keys[-2].endswith("fc1") or keys[-2] == "fc1"
                        ):
                            val = _linear_kernel_chw(val, C, H, W)
                        else:
                            val = _linear_kernel(val)
            else:  # priors and other direct buffers
                tk = prefix
                val = sd.get(tk)
                if val is not None and val.shape != leaf.shape:
                    val = np.squeeze(val, axis=0)  # priors stored with batch dim
            if val is None:
                missing.append(tk)
                out.append(leaf)
                continue
            if val.shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch for {tk}: torch {val.shape} vs flax {leaf.shape}"
                )
            used.add(tk)
            out.append(jnp.asarray(val, jnp.float32))
        return jax.tree_util.tree_unflatten(flat[1], out)

    new_params = fill(params, is_stats=False)
    new_stats = fill(batch_stats, is_stats=True) if batch_stats else batch_stats

    unused = [k for k in sd if k not in used
              and not k.endswith("num_batches_tracked")
              and "pixel_mean" not in k and "pixel_std" not in k
              and "anchor_generator" not in k]
    report = {"missing": missing, "unused": unused, "loaded": len(used)}
    if strict and missing:
        raise KeyError(f"missing torch keys for flax params: {missing[:10]} "
                       f"({len(missing)} total)")
    return new_params, new_stats, report
