"""Pure-jnp 3D geometry core for Cube R-CNN on TPU.

Functional equivalents of the reference geometry library
(reference: cubercnn/util/math_util.py) re-designed as batched, static-shape
`jax.numpy` transforms so every op fuses into the surrounding XLA program:

- cuboid vertices/faces         (math_util.py:116-219)
- perspective projection        (math_util.py:221-259)
- 3D box -> 2D box w/ clipping  (math_util.py:498-577)
- virtual depth scaling         (math_util.py:581-592)
- allocentric <-> egocentric    (math_util.py:595-705)
- rotation conversions          (pytorch3d rotation_conversions equivalents)
- scaled sigmoid                (math_util.py:969-978)

All functions are shape-polymorphic over leading batch dims where noted and
contain no data-dependent control flow, so they are jit/vmap/pjit safe.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax

_PREC = lax.Precision.HIGHEST

# Vertex layout of the canonical unit cube (reference math_util.py:37-46).
UNIT_CUBE = np.array(
    [
        [-0.5, -0.5, -0.5],
        [0.5, -0.5, -0.5],
        [0.5, 0.5, -0.5],
        [-0.5, 0.5, -0.5],
        [-0.5, -0.5, 0.5],
        [0.5, -0.5, 0.5],
        [0.5, 0.5, 0.5],
        [-0.5, 0.5, 0.5],
    ],
    dtype=np.float32,
)

# Triangle faces of a cuboid, matching the reference winding
# (reference math_util.py:195-213).
CUBOID_FACES = np.array(
    [
        [0, 1, 2], [2, 3, 0],  # front
        [1, 5, 6], [6, 2, 1],  # right
        [4, 0, 3], [3, 7, 4],  # left
        [5, 4, 7], [7, 6, 5],  # back
        [4, 5, 1], [1, 0, 4],  # top
        [3, 2, 6], [6, 7, 3],  # bottom
    ],
    dtype=np.int32,
)

# Per-vertex sign multipliers: X scales with l, Y with h, Z with w, with the
# vertex index layout of the reference diagram (math_util.py:151-181).
_VERT_SIGNS = np.array(
    [
        # (l, h, w) sign per vertex
        [-1, -1, -1],
        [1, -1, -1],
        [1, 1, -1],
        [-1, 1, -1],
        [-1, -1, 1],
        [1, -1, 1],
        [1, 1, 1],
        [-1, 1, 1],
    ],
    dtype=np.float32,
)


def cuboid_verts(box3d: jnp.ndarray, R: jnp.ndarray | None = None) -> jnp.ndarray:
    """Vertices of 3D cuboids in camera space.

    Args:
      box3d: (..., 6) [x, y, z, w, h, l] center + dimensions.
      R: optional (..., 3, 3) rotation applied about the box center.

    Returns:
      (..., 8, 3) vertices, ordered as the reference diagram
      (reference math_util.py:116-193).
    """
    box3d = jnp.asarray(box3d, jnp.float32)
    ctr = box3d[..., :3]
    w, h, l = box3d[..., 3], box3d[..., 4], box3d[..., 5]
    # local coords: X spans l, Y spans h, Z spans w
    half = jnp.stack([l, h, w], axis=-1) * 0.5  # (..., 3)
    local = _VERT_SIGNS * half[..., None, :]  # (..., 8, 3)
    if R is not None:
        R = jnp.asarray(R, jnp.float32)
        local = jnp.einsum("...ij,...vj->...vi", R, local, precision=_PREC)
    return local + ctr[..., None, :]


def cuboid_verts_faces(box3d, R=None):
    """Vertices plus the shared face index table (reference math_util.py:116-219)."""
    verts = cuboid_verts(box3d, R)
    return verts, jnp.asarray(CUBOID_FACES)


def project_points(K: jnp.ndarray, pts3d: jnp.ndarray) -> jnp.ndarray:
    """Project camera-space points to pixels.

    Args:
      K: (..., 3, 3) intrinsics.
      pts3d: (..., P, 3) points.

    Returns:
      (..., P, 3): [u, v, z] where z is the raw camera depth
      (reference math_util.py:251-253 divides x,y by z and keeps z).
    """
    proj = jnp.einsum("...ij,...pj->...pi", K, pts3d, precision=_PREC)
    z = proj[..., 2:3]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    uv = proj[..., :2] / safe_z
    return jnp.concatenate([uv, z], axis=-1)


def cuboid_verts_2d(K, box3d, R=None):
    """Project cuboid corners. Returns ((...,8,3) [u,v,z], (...,8,3) 3D verts).

    Equivalent of reference get_cuboid_verts (math_util.py:221-259) without the
    view transform branch.
    """
    corners3d = cuboid_verts(box3d, R)
    corners2d = project_points(K, corners3d)
    return corners2d, corners3d


def box3d_to_box2d(K, box3d, R=None, clipw: float = 0.0, cliph: float = 0.0,
                   xywh: bool = True, min_z: float = 0.20):
    """3D cuboid -> projected 2D box with behind-camera vertex clipping.

    Vectorized equivalent of reference convert_3d_box_to_2d
    (math_util.py:498-577): vertices with depth <= min_z are snapped to an
    image-corner bound chosen by the sign of their 3D coordinates.

    Returns (box2d (...,4), behind_camera (...,), fully_behind (...,)).
    """
    verts2d, verts3d = cuboid_verts_2d(K, box3d, R)
    behind = verts2d[..., 2] <= min_z  # (..., 8)
    behind_camera = jnp.any(behind, axis=-1)
    fully_behind = jnp.all(behind, axis=-1)

    sx = jnp.sign(verts3d[..., 0])
    sy = jnp.sign(verts3d[..., 1])
    # bound x: 0 if sign<0 else clipw-1; bound y: 0 if sign<0 else cliph-1
    bx = jnp.where(sx < 0, 0.0, jnp.where(sx > 0, clipw - 1.0, verts2d[..., 0]))
    by = jnp.where(sy < 0, 0.0, jnp.where(sy > 0, cliph - 1.0, verts2d[..., 1]))
    u = jnp.where(behind & (sx != 0) & (sy != 0), bx, verts2d[..., 0])
    v = jnp.where(behind & (sx != 0) & (sy != 0), by, verts2d[..., 1])

    x1 = jnp.min(u, axis=-1)
    y1 = jnp.min(v, axis=-1)
    x2 = jnp.max(u, axis=-1)
    y2 = jnp.max(v, axis=-1)
    if xywh:
        box2d = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
    else:
        box2d = jnp.stack([x1, y1, x2, y2], axis=-1)
    return box2d, behind_camera, fully_behind


def virtual_scale(f: jnp.ndarray, H: jnp.ndarray, f0: float, H0: jnp.ndarray):
    """Depth scaling factor between focal spaces (f0, H0) -> (f, H).

    Reference compute_virtual_scale_from_focal_spaces (math_util.py:581-592):
    returns (H0 * f) / (f0 * H).
    """
    return (H0 * f) / (f0 * H)


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula; axis_angle (..., 3) whose norm is the angle."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    safe = jnp.where(angle < 1e-12, 1.0, angle)
    axis = axis_angle / safe
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    a = angle[..., 0]
    c, s = jnp.cos(a), jnp.sin(a)
    C = 1.0 - c
    R = jnp.stack(
        [
            jnp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s], -1),
            jnp.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s], -1),
            jnp.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C], -1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    return jnp.where(angle[..., None] < 1e-12, eye, R)


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues; returns (..., 3) axis * angle."""
    cos = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1.0) * 0.5, -1.0, 1.0)
    angle = jnp.arccos(cos)
    ax = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0], R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    sin = jnp.sin(angle)
    scale = jnp.where(jnp.abs(sin) < 1e-8, 0.5, angle / (2.0 * jnp.where(jnp.abs(sin) < 1e-8, 1.0, sin)))
    return ax * scale[..., None]


def _allocentric_M(K: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotation M aligning the camera +z axis with the viewing ray of (u, v).

    Shared helper for the allocentric conversions (reference
    math_util.py:595-705): ray o = normalize([(u-sx)/fx, (v-sy)/fy, 1]),
    angle = acos(o_z), axis = normalize([-o_y, o_x, 0]).
    """
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    sx, sy = K[..., 0, 2], K[..., 1, 2]
    ox = (u - sx) / fx
    oy = (v - sy) / fy
    oray = jnp.stack([ox, oy, jnp.ones_like(ox)], axis=-1)
    oray = oray / jnp.linalg.norm(oray, axis=-1, keepdims=True)
    angle = jnp.arccos(jnp.clip(oray[..., 2], -1.0, 1.0))
    axis = jnp.stack([-oray[..., 1], oray[..., 0], jnp.zeros_like(ox)], axis=-1)
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis = axis / jnp.where(norm < 1e-12, 1.0, norm)
    return axis_angle_to_matrix(angle[..., None] * axis), angle


def R_to_allocentric(K, R, u, v):
    """Egocentric -> allocentric pose about the (u, v) viewing ray.

    Equivalent of reference R_to_allocentric (math_util.py:595-648):
    R_view = M^T @ R when the ray angle is > 0, else R.
    """
    M, angle = _allocentric_M(K, u, v)
    R_view = jnp.einsum("...ji,...jk->...ik", M, R, precision=_PREC)  # M^T @ R
    return jnp.where(angle[..., None, None] > 0, R_view, R)


def R_from_allocentric(K, R_view, u, v):
    """Allocentric -> egocentric pose (reference math_util.py:651-705)."""
    M, angle = _allocentric_M(K, u, v)
    R = jnp.einsum("...ij,...jk->...ik", M, R_view, precision=_PREC)
    return jnp.where(angle[..., None, None] > 0, R, R_view)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rotation parametrization (Zhou et al. CVPR'19) -> matrix.

    Matches pytorch3d.transforms.rotation_6d_to_matrix used by the reference
    cube head (cube_head.py:176): rows are built by Gram-Schmidt of the two
    3-vectors, third row is their cross product.
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(R: jnp.ndarray) -> jnp.ndarray:
    """Matrix -> 6D parametrization (first two rows, flattened)."""
    return jnp.concatenate([R[..., 0, :], R[..., 1, :]], axis=-1)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix (pytorch3d convention)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    R = jnp.stack(
        [
            jnp.stack([1 - two_s * (y * y + z * z), two_s * (x * y - z * w), two_s * (x * z + y * w)], -1),
            jnp.stack([two_s * (x * y + z * w), 1 - two_s * (x * x + z * z), two_s * (y * z - x * w)], -1),
            jnp.stack([two_s * (x * z - y * w), two_s * (y * z + x * w), 1 - two_s * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    return R


def normalize_quaternion(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize with the scale's sign copied from q_w, as the cube head does
    (reference cube_head.py:179-181 via pytorch3d _copysign)."""
    scale = jnp.sqrt(jnp.sum(q * q, axis=-1))
    scale = jnp.where(q[..., 0] < 0, -scale, scale)
    scale = jnp.where(jnp.abs(scale) < eps, eps, scale)
    return q / scale[..., None]


def euler_angles_to_matrix(euler: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Euler angles -> matrix, pytorch3d convention R = Rx @ Ry @ Rz for 'XYZ'."""

    def _axis_R(axis, a):
        c, s, o, z = jnp.cos(a), jnp.sin(a), jnp.ones_like(a), jnp.zeros_like(a)
        if axis == "X":
            rows = [o, z, z, z, c, -s, z, s, c]
        elif axis == "Y":
            rows = [c, z, s, z, o, z, -s, z, c]
        else:
            rows = [c, -s, z, s, c, z, z, z, o]
        return jnp.stack(rows, axis=-1).reshape(a.shape + (3, 3))

    R = _axis_R(convention[0], euler[..., 0])
    for i, ax in enumerate(convention[1:], start=1):
        R = R @ _axis_R(ax, euler[..., i])
    return R


def so3_relative_angle(R1: jnp.ndarray, R2: jnp.ndarray, eps: float = 1e-4,
                       cos_angle: bool = False) -> jnp.ndarray:
    """Relative rotation angle between two rotations (pytorch3d so3_relative_angle).

    Used by the reference non-disentangled pose loss (roi_heads.py:631-633).
    With cos_angle=True returns cos(theta) directly.
    """
    R12 = jnp.einsum("...ij,...kj->...ik", R1, R2, precision=_PREC)  # R1 @ R2^T
    trace = jnp.trace(R12, axis1=-2, axis2=-1)
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0 + eps, 1.0 - eps)
    if cos_angle:
        return cos
    return jnp.arccos(cos)


def scaled_sigmoid(vals, lo=0.0, hi=1.0):
    """Sigmoid rescaled to (lo, hi) (reference math_util.py:969-978)."""
    return lo + (hi - lo) * jax.nn.sigmoid(vals)


def mat2euler(R):
    """Rotation matrix -> euler angles (x, y, z), host/numpy helper
    (reference math_util.py:72-82)."""
    R = np.asarray(R)
    sy = math.sqrt(R[0, 0] * R[0, 0] + R[1, 0] * R[1, 0])
    x = math.atan2(R[2, 1], R[2, 2])
    y = math.atan2(-R[2, 0], sy)
    z = math.atan2(R[1, 0], R[0, 0])
    return np.array([x, y, z])


def euler2mat(euler):
    """Euler angles -> rotation matrix, host/numpy helper
    (reference math_util.py:86-105): R = Rz @ Ry @ Rx."""
    cx, cy, cz = (math.cos(v) for v in euler)
    sx, sy, sz = (math.sin(v) for v in euler)
    R_x = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    R_y = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    R_z = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return R_z @ R_y @ R_x


def approx_eval_resolution(h, w, scale_min=0, scale_max=1e10):
    """Resolution an (h, w) image runs through the model at
    (reference math_util.py:262-289). Host helper."""
    orig_h = h
    sf = scale_min / min(h, w)
    h, w = h * sf, w * sf
    sf = min(scale_max / max(h, w), 1.0)
    h, w = h * sf, w * sf
    return h, w, h / orig_h
