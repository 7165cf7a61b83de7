"""Minimal yacs-compatible config system.

Drop-in equivalent of the detectron2/yacs CfgNode surface the reference uses
(reference tools/train_net.py:318-349, cubercnn/config/config.py): attribute
access, YAML files with `_BASE_` inheritance, `merge_from_list` for CLI
`KEY VALUE` overrides, and freezing. Implemented standalone so the framework
has zero detectron2/yacs dependency.
"""
from __future__ import annotations

import ast
import copy
import os
from typing import Any

import yaml

_BASE_KEY = "_BASE_"


class CfgNode(dict):
    """A dict with attribute access, freezing, and yacs-style merging."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None):
        init_dict = init_dict or {}
        super().__init__()
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        for k, v in init_dict.items():
            self[k] = CfgNode(v) if isinstance(v, dict) else v

    # ------------------------------ attribute API ------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"Config key not found: {name}")

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(f"CfgNode is frozen; cannot set {name}")
        self[name] = CfgNode(value) if isinstance(value, dict) and not isinstance(value, CfgNode) else value

    def __setitem__(self, key, value):
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(f"CfgNode is frozen; cannot set {key}")
        super().__setitem__(key, value)

    # ------------------------------ freeze / clone ------------------------------
    def freeze(self):
        object.__setattr__(self, CfgNode.IMMUTABLE, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self):
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, CfgNode.IMMUTABLE)

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def __deepcopy__(self, memo):
        new = CfgNode()
        for k, v in self.items():
            dict.__setitem__(new, k, copy.deepcopy(v, memo))
        object.__setattr__(new, CfgNode.IMMUTABLE, False)
        return new

    # ------------------------------ merging ------------------------------
    def merge_from_other(self, other: "CfgNode", allow_new: bool = True):
        for k, v in other.items():
            if isinstance(v, (dict, CfgNode)) and isinstance(self.get(k), CfgNode):
                self[k].merge_from_other(CfgNode(v) if not isinstance(v, CfgNode) else v, allow_new)
            else:
                if not allow_new and k not in self:
                    raise KeyError(f"Non-existent config key: {k}")
                self[k] = CfgNode(v) if isinstance(v, dict) else _coerce(v, self.get(k))

    def merge_from_file(self, filename: str, allow_new: bool = True):
        """Load a YAML file, resolving `_BASE_` chains relative to the file."""
        merged = _load_yaml_with_base(filename)
        self.merge_from_other(CfgNode(merged), allow_new)

    def merge_from_list(self, opts: list, allow_new: bool = False):
        """CLI `KEY VALUE ...` overrides (yacs merge_from_list semantics)."""
        assert len(opts) % 2 == 0, f"Override list has odd length: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    if not allow_new:
                        raise KeyError(f"Non-existent config key: {key}")
                    node[p] = CfgNode()
                node = node[p]
            leaf = parts[-1]
            if leaf not in node and not allow_new:
                raise KeyError(f"Non-existent config key: {key}")
            node[leaf] = _coerce(_parse_value(value), node.get(leaf))

    # ------------------------------ io ------------------------------
    def dump(self) -> str:
        return yaml.safe_dump(_to_plain(self), sort_keys=True)

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(self.dump())


class StaticCfg:
    """Hashable, immutable attribute view of a CfgNode.

    flax.linen rewrites dict-typed module attributes into FrozenDicts (losing
    attribute access), and `jax.jit` static arguments must be hashable — this
    wrapper satisfies both, so a whole config can ride on a Module/static arg.
    """

    __slots__ = ("_node", "_key")

    def __init__(self, node):
        object.__setattr__(self, "_node", node)
        object.__setattr__(self, "_key", _freeze_key(node))

    def __getattr__(self, name):
        try:
            v = object.__getattribute__(self, "_node")[name]
        except KeyError:
            raise AttributeError(f"Config key not found: {name}") from None
        return StaticCfg(v) if isinstance(v, dict) else v

    def __getitem__(self, name):
        return self.__getattr__(name)

    def __contains__(self, name):
        return name in object.__getattribute__(self, "_node")

    def __setattr__(self, name, value):
        raise AttributeError("StaticCfg is immutable")

    def __hash__(self):
        return hash(object.__getattribute__(self, "_key"))

    def __eq__(self, other):
        return isinstance(other, StaticCfg) and object.__getattribute__(
            self, "_key"
        ) == object.__getattribute__(other, "_key")

    def node(self) -> "CfgNode":
        return object.__getattribute__(self, "_node")


def _freeze_key(node):
    if isinstance(node, dict):
        return tuple((k, _freeze_key(v)) for k, v in sorted(node.items()))
    if isinstance(node, (list, tuple)):
        return tuple(_freeze_key(v) for v in node)
    return node


def _to_plain(node):
    if isinstance(node, CfgNode):
        return {k: _to_plain(v) for k, v in node.items()}
    if isinstance(node, tuple):
        return list(node)
    return node


def _parse_value(value):
    """Parse a CLI string into a python literal when possible."""
    if not isinstance(value, str):
        return value
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def _coerce(new, old):
    """Coerce `new` toward the type of the existing value (yacs behavior):
    tuple<->list interchange, int->float promotion, str literal parsing."""
    if old is None:
        return new
    if isinstance(old, tuple) and isinstance(new, list):
        return tuple(new)
    if isinstance(old, list) and isinstance(new, tuple):
        return list(new)
    if isinstance(old, float) and isinstance(new, int):
        return float(new)
    if isinstance(old, (tuple, list)) and isinstance(new, str):
        parsed = _parse_value(new)
        if isinstance(parsed, (tuple, list)):
            return type(old)(parsed)
    return new


def _load_yaml_with_base(filename: str) -> dict:
    with open(filename) as f:
        data = yaml.safe_load(f) or {}
    base = data.pop(_BASE_KEY, None)
    if base:
        if not os.path.isabs(base):
            base = os.path.join(os.path.dirname(filename), base)
        merged = _load_yaml_with_base(base)
        _deep_update(merged, data)
        return merged
    return data


def _deep_update(dst: dict, src: dict):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v
