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


def _param_class(path) -> str:
    """'norm' | 'prior' | 'bias' | 'rest' with the reference's precedence
    (solver/build.py:33-46: norm-module membership beats the bias key)."""
    keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
    if _is_prior_param(keys):
        return "prior"
    if _is_norm_param(keys):
        return "norm"
    if keys and keys[-1] == "bias":
        return "bias"
    return "rest"


def class_mask(params, *classes):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _param_class(path) in classes, params)


def weight_decay_mask(params):
    """True where coupled weight decay applies (reference solver/build.py:44-46
    gives prior buffers WD=0; detectron2 gives norm params WEIGHT_DECAY_NORM)."""
    return class_mask(params, "bias", "rest")


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


ADAM_EPS = 1e-2  # reference solver/build.py:58-66 passes eps=1e-02 to Adam(W)


def scale_by_amsgrad_torch(b1=0.9, b2=0.999, eps=1e-8):
    """AMSGrad with torch.optim semantics: the running max is taken over the
    RAW second moment and bias correction divides the maxed value each step
    (optax.scale_by_amsgrad maxes the bias-corrected moment instead, which
    diverges from torch in the early steps)."""

    def init_fn(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return {"count": jnp.zeros((), jnp.int32),
                "mu": z, "nu": jax.tree.map(jnp.zeros_like, params),
                "nu_max": jax.tree.map(jnp.zeros_like, params)}

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state["mu"], updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state["nu"], updates)
        nu_max = jax.tree.map(jnp.maximum, state["nu_max"], nu)
        c = state["count"] + 1
        bc1 = 1 - b1 ** c.astype(jnp.float32)
        bc2 = 1 - b2 ** c.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu_max)
        return out, {"count": c, "mu": mu, "nu": nu, "nu_max": nu_max}

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(cfg, params=None) -> optax.GradientTransformation:
    """SGD/Adam(W)(+amsgrad) with the reference's per-parameter groups
    (solver/build.py:6-70):

      * norm params: WEIGHT_DECAY_NORM (precedence over the bias rule),
      * biases: lr x BIAS_LR_FACTOR, WEIGHT_DECAY_BIAS (None -> WEIGHT_DECAY),
      * prior buffers: WD = 0,
      * Adam variants use eps=1e-2 and optionally amsgrad.

    Coupled (torch-style) L2 is added to gradients before the momentum/adam
    moments for sgd/adam, decoupled after for adamw — matching torch.optim.
    Masks are callables so they bind to whatever params the optimizer sees.
    """
    solver_type = cfg.SOLVER.TYPE.lower()
    schedule = build_lr_schedule(cfg)
    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_norm = cfg.SOLVER.WEIGHT_DECAY_NORM
    wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS
    wd_bias = wd if wd_bias is None else wd_bias
    bias_lr = cfg.SOLVER.BIAS_LR_FACTOR
    bias_lr = 1.0 if bias_lr is None else bias_lr

    def decay_terms():
        groups = [(wd, ("rest",)), (wd_bias, ("bias",)), (wd_norm, ("norm",))]
        return [
            optax.add_decayed_weights(v, mask=lambda p, c=classes: class_mask(p, *c))
            for v, classes in groups if v
        ]

    chain = []
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "norm":
            chain.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
        else:
            chain.append(optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))

    amsgrad = solver_type.endswith("+amsgrad")
    base_type = solver_type.removesuffix("+amsgrad")
    scale_adam = (scale_by_amsgrad_torch(eps=ADAM_EPS) if amsgrad
                  else optax.scale_by_adam(eps=ADAM_EPS))
    if base_type == "sgd":
        chain += decay_terms()
        chain.append(optax.trace(decay=cfg.SOLVER.MOMENTUM,
                                 nesterov=cfg.SOLVER.NESTEROV))
    elif base_type == "adamw":
        chain.append(scale_adam)
        chain += decay_terms()
    elif base_type == "adam":
        chain += decay_terms()
        chain.append(scale_adam)
    else:
        raise ValueError(f"Unknown solver type {cfg.SOLVER.TYPE}")

    chain.append(optax.scale_by_learning_rate(schedule))
    if bias_lr != 1.0:
        chain.append(optax.masked(optax.scale(bias_lr),
                                  lambda p: class_mask(p, "bias")))
    return optax.chain(*chain)
