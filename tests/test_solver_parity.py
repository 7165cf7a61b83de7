"""Optimizer parity vs torch.optim for every SOLVER.TYPE
(reference cubercnn/solver/build.py:6-70), including the per-parameter groups:
norm -> WEIGHT_DECAY_NORM, bias -> BIAS_LR_FACTOR / WEIGHT_DECAY_BIAS,
priors -> WD 0, Adam eps=1e-2, amsgrad variants.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from omni3d_tpu.config.defaults import get_default_cfg
from omni3d_tpu.solver.build import build_optimizer

SHAPES = {
    ("layer", "conv", "kernel"): (3, 4),
    ("layer", "conv", "bias"): (4,),
    ("bn", "bn", "scale"): (4,),
    ("bn", "bn", "bias"): (4,),
    ("priors_dims_per_cat",): (2, 3),
}


def make_cfg(solver_type, wd=0.01, wd_norm=0.0, wd_bias=None, bias_lr=1.0,
             momentum=0.9, nesterov=False, lr=0.1):
    cfg = get_default_cfg()
    cfg.SOLVER.TYPE = solver_type
    cfg.SOLVER.BASE_LR = lr
    cfg.SOLVER.WEIGHT_DECAY = wd
    cfg.SOLVER.WEIGHT_DECAY_NORM = wd_norm
    cfg.SOLVER.WEIGHT_DECAY_BIAS = wd_bias
    cfg.SOLVER.BIAS_LR_FACTOR = bias_lr
    cfg.SOLVER.MOMENTUM = momentum
    cfg.SOLVER.NESTEROV = nesterov
    # constant LR so schedules don't enter the comparison
    cfg.SOLVER.WARMUP_FACTOR = 1.0
    cfg.SOLVER.WARMUP_ITERS = 1
    cfg.SOLVER.STEPS = ()
    return cfg


def init_trees(seed=0):
    rng = np.random.default_rng(seed)
    flat = {k: rng.standard_normal(v).astype(np.float32) for k, v in SHAPES.items()}
    tree = {}
    for path, val in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(val)
    tparams = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in flat.items()}
    return tree, tparams, flat


def torch_groups(tparams, cfg):
    """The reference's per-param group construction (solver/build.py:20-47)."""
    groups = []
    for path, p in tparams.items():
        lr = cfg.SOLVER.BASE_LR
        wd = cfg.SOLVER.WEIGHT_DECAY
        if "bn" in path and cfg.SOLVER.WEIGHT_DECAY_NORM is not None:
            wd = cfg.SOLVER.WEIGHT_DECAY_NORM
        elif path[-1] == "bias":
            if cfg.SOLVER.BIAS_LR_FACTOR is not None:
                lr = cfg.SOLVER.BASE_LR * cfg.SOLVER.BIAS_LR_FACTOR
            if cfg.SOLVER.WEIGHT_DECAY_BIAS is not None:
                wd = cfg.SOLVER.WEIGHT_DECAY_BIAS
        if "priors" in path[0]:
            wd = 0.0
        groups.append({"params": [p], "lr": lr, "weight_decay": wd})
    return groups


def build_torch_opt(tparams, cfg):
    groups = torch_groups(tparams, cfg)
    t = cfg.SOLVER.TYPE
    if t == "sgd":
        return torch.optim.SGD(groups, cfg.SOLVER.BASE_LR,
                               momentum=cfg.SOLVER.MOMENTUM,
                               nesterov=cfg.SOLVER.NESTEROV)
    if t == "adam":
        return torch.optim.Adam(groups, cfg.SOLVER.BASE_LR, eps=1e-02)
    if t == "adam+amsgrad":
        return torch.optim.Adam(groups, cfg.SOLVER.BASE_LR, amsgrad=True, eps=1e-02)
    if t == "adamw":
        return torch.optim.AdamW(groups, cfg.SOLVER.BASE_LR, eps=1e-02)
    if t == "adamw+amsgrad":
        return torch.optim.AdamW(groups, cfg.SOLVER.BASE_LR, amsgrad=True, eps=1e-02)
    raise ValueError(t)


def run_both(cfg, n_steps=5):
    tree, tparams, flat = init_trees()
    tx = build_optimizer(cfg)
    opt_state = tx.init(tree)
    topt = build_torch_opt(tparams, cfg)
    rng = np.random.default_rng(42)
    for _ in range(n_steps):
        grads_flat = {k: rng.standard_normal(SHAPES[k]).astype(np.float32)
                      for k in SHAPES}
        gtree = {}
        for path, val in grads_flat.items():
            node = gtree
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = jnp.asarray(val)
        import optax

        updates, opt_state = tx.update(gtree, opt_state, tree)
        tree = optax.apply_updates(tree, updates)

        topt.zero_grad()
        for k, p in tparams.items():
            p.grad = torch.tensor(grads_flat[k])
        topt.step()
    out_flax = {}
    for path in SHAPES:
        node = tree
        for p in path:
            node = node[p]
        out_flax[path] = np.asarray(node)
    out_torch = {k: p.detach().numpy() for k, p in tparams.items()}
    return out_flax, out_torch


CONFIGS = [
    ("sgd", {}),
    ("sgd", {"nesterov": True}),
    ("sgd", {"bias_lr": 2.0, "wd_bias": 0.0}),
    ("sgd", {"wd_norm": 0.005}),
    ("adam", {}),
    ("adam+amsgrad", {}),
    ("adamw", {}),
    ("adamw+amsgrad", {}),
    ("adamw", {"bias_lr": 0.5, "wd_bias": 0.02}),
]


@pytest.mark.parametrize("solver_type,kw", CONFIGS)
def test_matches_torch(solver_type, kw):
    cfg = make_cfg(solver_type, **kw)
    out_flax, out_torch = run_both(cfg)
    for k in SHAPES:
        # f32 op-ordering differences between optax and torch accumulate to
        # ~1e-6/step; anything beyond 1e-5 after 5 steps is a real mismatch
        np.testing.assert_allclose(
            out_flax[k], out_torch[k], atol=1e-5, rtol=1e-4,
            err_msg=f"{solver_type} {kw} diverges at {k}")
