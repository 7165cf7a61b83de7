"""Optimizer + LR schedule factory (optax).

Equivalent of the reference solver (cubercnn/solver/build.py:6-78): SGD /
Adam(W) (+amsgrad) with torch-coupled weight decay, WD=0 for prior buffers and
norm parameters, WarmupMultiStepLR. BN freezing (`freeze_bn`,
solver/build.py:73-78) maps to zeroing updates for batch_stats + BN params via
the `USE_BN` mask.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

NORM_MODULE_NAMES = ("bn", "n")  # BatchNorm module names in the model tree


def _is_norm_param(path) -> bool:
    return any(str(p) in NORM_MODULE_NAMES for p in path)


def _is_prior_param(path) -> bool:
    return any("priors" in str(p) for p in path)


def weight_decay_mask(params):
    """True where coupled weight decay applies (reference solver/build.py:44-46
    gives prior buffers WD=0; detectron2 gives norm params WEIGHT_DECAY_NORM)."""

    def f(path, _):
        keys = [getattr(p, "key", getattr(p, "name", p)) for p in path]
        return not (_is_norm_param(keys) or _is_prior_param(keys))

    return jax.tree_util.tree_map_with_path(f, params)


def build_lr_schedule(cfg):
    """WarmupMultiStepLR (reference configs/Base_Omni3D.yaml:7-8 anchors)."""
    base = cfg.SOLVER.BASE_LR
    steps = tuple(cfg.SOLVER.STEPS)
    gamma = cfg.SOLVER.GAMMA
    warmup_iters = max(int(cfg.SOLVER.WARMUP_ITERS), 1)
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / warmup_iters, 0.0, 1.0)
        warm = warmup_factor * (1.0 - alpha) + alpha
        decays = jnp.sum(jnp.asarray([step >= s for s in steps], jnp.float32)) if steps else 0.0
        return base * warm * (gamma**decays)

    return schedule


def build_optimizer(cfg, params=None) -> optax.GradientTransformation:
    """SGD/Adam(W) with torch-style coupled L2 (reference solver/build.py:51-67).

    LR is injected via `optax.scale_by_learning_rate(schedule)`; WD is added to
    gradients *before* the momentum trace, matching torch.optim.SGD. The WD
    mask is a callable so it binds to whatever params the optimizer sees.
    """
    solver_type = cfg.SOLVER.TYPE.lower()
    wd = cfg.SOLVER.WEIGHT_DECAY
    schedule = build_lr_schedule(cfg)
    mask = weight_decay_mask

    chain = []
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "norm":
            chain.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
        else:
            chain.append(optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))

    if solver_type == "sgd":
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd, mask=mask))
        chain.append(optax.trace(decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV))
    elif solver_type.startswith("adamw"):
        chain.append(optax.scale_by_adam())
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd, mask=mask))
    elif solver_type.startswith("adam"):
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd, mask=mask))
        chain.append(optax.scale_by_adam())
    else:
        raise ValueError(f"Unknown solver type {cfg.SOLVER.TYPE}")

    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)
