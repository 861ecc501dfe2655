"""3D math as JAX ops — the glam-equivalent layer.

Column-vector convention throughout (``M @ v``), matching glam as used by the
reference. All functions are pure and jit/vmap-friendly; matrices are [4,4]
float32 arrays, quaternions are [4] arrays in xyzw order (glam layout).
"""

from renderer_rs_tpu.mathx.mat4 import (  # noqa: F401
    compose_srt,
    inverse_transpose_3x3,
    look_at_rh,
    mat4_identity,
    orthographic_rh,
    perspective_rh,
    rotate_mat4,
    scale_mat4,
    transform_point,
    transform_points,
    transform_vector,
    transform_vectors,
    translate_mat4,
)
from renderer_rs_tpu.mathx.quat import (  # noqa: F401
    quat_from_axis_angle,
    quat_from_euler_yxz,
    quat_from_rotation_arc,
    quat_identity,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat3,
    quat_to_mat4,
)
from renderer_rs_tpu.mathx.vec import (  # noqa: F401
    cross,
    dot,
    length,
    normalize,
    normalize_or_zero,
    reflect,
    saturate,
)
