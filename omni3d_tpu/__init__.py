"""omni3d_tpu: a TPU-native (JAX/XLA/Pallas/pjit) Cube R-CNN framework.

Brand-new implementation of the capabilities of facebookresearch/omni3d
(monocular 3D detection benchmark + Cube R-CNN model), designed TPU-first:
static shapes, functional train/eval steps under pjit, Pallas kernels for the
non-matmul hot ops, and SPMD data parallelism over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"
