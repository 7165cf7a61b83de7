"""Evaluation suite (reference `cubercnn.evaluation` surface)."""
from .omni3d_eval import Omni3DEval, Omni3DEvaluationHelper  # noqa: F401
