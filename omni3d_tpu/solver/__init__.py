"""Solver (reference `cubercnn.solver` surface)."""
from .build import build_lr_schedule, build_optimizer  # noqa: F401
