"""Device-mesh and multi-process helpers (SPMD train sharding lives with the
train step in engine/train.py; this package owns the mesh itself and the
host-side collectives)."""
from .dist import gather_objects, globalize_batch, make_mesh

__all__ = ["gather_objects", "globalize_batch", "make_mesh"]
