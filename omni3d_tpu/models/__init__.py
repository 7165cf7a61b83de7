"""Modeling (reference `cubercnn.modeling` surface)."""
from .rcnn3d import CubeRCNN, build_model, inference_impl, inference_kwargs, preprocess  # noqa: F401
