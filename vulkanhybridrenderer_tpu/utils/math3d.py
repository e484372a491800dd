"""Small 3D math library (camera/projection/basis helpers).

Semantics follow the Vulkan reference:
  * infinite reverse-Z perspective: reference vulkan_utils.h:494-503
  * ortho / lookAt: GLM right-handed with GLM_FORCE_DEPTH_ZERO_TO_ONE (reference pch.h:37)
  * shadow bias matrix: reference data/shaders/common.glsl:6-11
  * Frisvad orthonormal basis: reference data/shaders/common.glsl:80-93
  * octahedral normal encoding: reference data/shaders/common.glsl:97-108

All functions work on jnp or np arrays and are jit-safe.  Matrices act on column
vectors: ``clip = M @ v``.  Projections bake in a Vulkan-style y-flip (NDC y down) so
row 0 of every rendered image is the top; see package docstring.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Constants (reference data/shaders/common.glsl:1-4)
# ---------------------------------------------------------------------------
PI = 3.14159265358979323846264
TWO_PI = 6.28318530717958647692528
PI_INVERSE = 0.31830988618379067153776
COS_PI_4 = 0.70710678118654752440084

# Maps NDC xy in [-1,1] to uv in [0,1] for shadow lookups
# (reference common.glsl:6-11; stored column-major there, this is the math form).
SHADOW_BIAS_MATRIX = np.array(
    [
        [0.5, 0.0, 0.0, 0.5],
        [0.0, 0.5, 0.0, 0.5],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)


def normalize(v, axis=-1, eps=1e-20):
    """Normalize vectors along `axis` (safe at zero length)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def dot(a, b, axis=-1, keepdims=False):
    return jnp.sum(a * b, axis=axis, keepdims=keepdims)


def reflect(i, n):
    """GLSL reflect: i - 2*dot(n,i)*n."""
    return i - 2.0 * dot(i, n, keepdims=True) * n


def transform_points(m, p):
    """Apply a (4,4) matrix to (..., 3) points (w=1), perspective-divide NOT applied.

    Returns (..., 4) homogeneous result.
    """
    p4 = jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)], axis=-1)
    return p4 @ m.T


def transform_directions(m, d):
    """Apply a (4,4) matrix to (..., 3) directions (w=0). Returns (..., 3)."""
    return d @ m[:3, :3].T


def project_points(m, p):
    """Transform points and perspective-divide -> (..., 3) ndc (x, y, depth)."""
    h = transform_points(m, p)
    return h[..., :3] / h[..., 3:4]


# ---------------------------------------------------------------------------
# Projections / view matrices
# ---------------------------------------------------------------------------
def infinite_reverse_z_projection(yfov: float, aspect: float, znear: float, flip_y: bool = True):
    """Infinite far-plane reverse-Z perspective (reference vulkan_utils.h:494-503).

    clip = [s/a * x, (+-) s * y, znear, -z]; depth = znear / -z_view in (0, 1].
    flip_y=True bakes the Vulkan viewport flip in (see package docstring).
    """
    scale = 1.0 / np.tan(yfov * 0.5)
    sy = -scale if flip_y else scale
    return np.array(
        [
            [scale / aspect, 0.0, 0.0, 0.0],
            [0.0, sy, 0.0, 0.0],
            [0.0, 0.0, 0.0, znear],
            [0.0, 0.0, -1.0, 0.0],
        ],
        dtype=np.float32,
    )


def ortho(left, right, bottom, top, znear, zfar, flip_y: bool = True):
    """GLM orthoRH_ZO (depth 0..1).  The reference builds its light projection as
    ortho(-8, 8, -8, 8, 12, 0.1) (scene_loader.cpp:85) -- note znear > zfar, which
    yields a reverse-Z shadow map (depth grows toward the light).
    """
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = 2.0 / (right - left)
    m[1, 1] = 2.0 / (top - bottom)
    m[2, 2] = -1.0 / (zfar - znear)
    m[0, 3] = -(right + left) / (right - left)
    m[1, 3] = -(top + bottom) / (top - bottom)
    m[2, 3] = -znear / (zfar - znear)
    m[3, 3] = 1.0
    if flip_y:
        m[1] = -m[1]
    return m


def look_at(eye, center, up):
    """GLM lookAtRH (reference scene_loader.cpp:88-92 uses this for the light view)."""
    eye = np.asarray(eye, np.float32)
    center = np.asarray(center, np.float32)
    up = np.asarray(up, np.float32)
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def yaw_pitch_roll(yaw: float, pitch: float, roll: float):
    """GLM yawPitchRoll: R = Ry(yaw) @ Rx(pitch) @ Rz(roll), as a (4,4) matrix."""
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cr, sr = np.cos(roll), np.sin(roll)
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
    rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]], np.float32)
    rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]], np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = ry @ rx @ rz
    return m


def extract_euler_yxz(m):
    """GLM extractEulerAngleYXZ equivalent on the rotation part of a (4,4) matrix.

    Returns (yaw, pitch, roll) such that yaw_pitch_roll(yaw, pitch, roll) rebuilds the
    rotation (used for the camera in reference scene_loader.cpp:62-67).
    """
    r = np.asarray(m, np.float64)[:3, :3]
    # Normalize columns to strip scale.
    r = r / np.linalg.norm(r, axis=0, keepdims=True)
    # R = Ry @ Rx @ Rz ; R[1,2] = -sin(pitch)
    pitch = np.arcsin(np.clip(-r[1, 2], -1.0, 1.0))
    if abs(np.cos(pitch)) > 1e-6:
        yaw = np.arctan2(r[0, 2], r[2, 2])
        roll = np.arctan2(r[1, 0], r[1, 1])
    else:  # gimbal lock
        yaw = np.arctan2(-r[2, 0], r[0, 0])
        roll = 0.0
    return float(yaw), float(pitch), float(roll)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion q = (w, x, y, z)."""
    q = np.asarray(q, np.float64)
    w, xyz = q[0], q[1:]
    t = 2.0 * np.cross(xyz, v)
    return np.asarray(v + w * t + np.cross(xyz, t), np.float32)


def decompose_rotation(m):
    """Extract the unit quaternion (w,x,y,z) of the rotation part of a (4,4) transform
    (GLM decompose equivalent for our use: reference scene_loader.cpp:76-83 only keeps
    the rotation)."""
    r = np.asarray(m, np.float64)[:3, :3]
    r = r / np.linalg.norm(r, axis=0, keepdims=True)
    tr = np.trace(r)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (r[2, 1] - r[1, 2]) / s
        y = (r[0, 2] - r[2, 0]) / s
        z = (r[1, 0] - r[0, 1]) / s
    elif r[0, 0] > r[1, 1] and r[0, 0] > r[2, 2]:
        s = np.sqrt(1.0 + r[0, 0] - r[1, 1] - r[2, 2]) * 2
        w = (r[2, 1] - r[1, 2]) / s
        x = 0.25 * s
        y = (r[0, 1] + r[1, 0]) / s
        z = (r[0, 2] + r[2, 0]) / s
    elif r[1, 1] > r[2, 2]:
        s = np.sqrt(1.0 + r[1, 1] - r[0, 0] - r[2, 2]) * 2
        w = (r[0, 2] - r[2, 0]) / s
        x = (r[0, 1] + r[1, 0]) / s
        y = 0.25 * s
        z = (r[1, 2] + r[2, 1]) / s
    else:
        s = np.sqrt(1.0 + r[2, 2] - r[0, 0] - r[1, 1]) * 2
        w = (r[1, 0] - r[0, 1]) / s
        x = (r[0, 2] + r[2, 0]) / s
        y = (r[1, 2] + r[2, 1]) / s
        z = 0.25 * s
    return np.array([w, x, y, z], np.float64)


def normal_matrix(model):
    """inverse-transpose of the upper-left 3x3, padded to (4,4) (the reference passes
    glm::inverseTranspose(transform) as HybridPushConstants.normal_matrix)."""
    m = np.asarray(model, np.float64)
    n = np.linalg.inv(m[:3, :3]).T
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = n.astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# Basis / encodings (jit-safe, vectorized over leading dims)
# ---------------------------------------------------------------------------
def onb_from_unit_vector(n):
    """Frisvad ONB (reference common.glsl:80-93).  n: (..., 3).

    Returns (t, b, n) -- three (..., 3) arrays forming the basis columns; a direction d
    in local space maps to world as d.x*t + d.y*b + d.z*n (GLSL ``M * d`` with columns
    M[0]=t, M[1]=b, M[2]=n).  Uses the branchless select for n.z <= -0.9999999.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    degenerate = nz < -0.9999999
    a = 1.0 / jnp.where(degenerate, 1.0, 1.0 + nz)
    b = -nx * ny * a
    t0 = jnp.stack([1.0 - nx * nx * a, b, -nx], axis=-1)
    b0 = jnp.stack([b, 1.0 - ny * ny * a, -ny], axis=-1)
    t_deg = jnp.broadcast_to(jnp.array([0.0, -1.0, 0.0], n.dtype), t0.shape)
    b_deg = jnp.broadcast_to(jnp.array([-1.0, 0.0, 0.0], n.dtype), b0.shape)
    deg = degenerate[..., None]
    return jnp.where(deg, t_deg, t0), jnp.where(deg, b_deg, b0), n


def _sign_not_zero(v):
    return jnp.where(v >= 0.0, 1.0, -1.0)


def oct_encode(v):
    """Octahedral encode unit vectors (..., 3) -> (..., 2) (common.glsl:101-104)."""
    denom = jnp.abs(v[..., 0]) + jnp.abs(v[..., 1]) + jnp.abs(v[..., 2])
    p = v[..., :2] / denom[..., None]
    wrapped = (1.0 - jnp.abs(p[..., ::-1])) * _sign_not_zero(p)
    return jnp.where((v[..., 2] <= 0.0)[..., None], wrapped, p)


def oct_decode(e):
    """Octahedral decode (..., 2) -> unit (..., 3) (common.glsl:105-108)."""
    z = 1.0 - jnp.abs(e[..., 0]) - jnp.abs(e[..., 1])
    xy = jnp.where(
        (z < 0.0)[..., None],
        (1.0 - jnp.abs(e[..., ::-1])) * _sign_not_zero(e),
        e,
    )
    v = jnp.concatenate([xy, z[..., None]], axis=-1)
    return normalize(v)
