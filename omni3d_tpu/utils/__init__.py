"""Geometry/math library + IO helpers (reference `cubercnn.util` surface:
math_util.py / util.py / model_zoo.py)."""
from .geometry import (R_from_allocentric, R_to_allocentric,  # noqa: F401
                       axis_angle_to_matrix, box3d_to_box2d, cuboid_verts,
                       cuboid_verts_2d, cuboid_verts_faces,
                       euler_angles_to_matrix, matrix_to_axis_angle,
                       matrix_to_rotation_6d, project_points,
                       quaternion_to_matrix, rotation_6d_to_matrix,
                       scaled_sigmoid, so3_relative_angle, virtual_scale)
from .priors import compute_priors, priors_to_params  # noqa: F401
from .model_zoo import (find_imagenet_weights, load_reference_weights,  # noqa: F401
                        resolve)
