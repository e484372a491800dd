"""Screen-space reconstruction helpers (glsl_common.h:110-122)."""
from __future__ import annotations

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.utils.math3d import transform_points


def pixel_uv_grid(height: int, width: int):
    """(H, W, 2) uv at pixel centers: uv = (pixel + 0.5) / size."""
    xx = (jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5) / width
    yy = (jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5) / height
    return jnp.concatenate(
        [
            jnp.broadcast_to(xx, (height, width))[..., None],
            jnp.broadcast_to(yy, (height, width))[..., None],
        ],
        axis=-1,
    )


def position_from_depth(depth, uv, inverse_matrix):
    """Reconstruct positions from depth: inverse_matrix @ (uv*2-1, depth, 1), divide
    by w (glsl_common.h:111-115 with camera_proj_inverse for view space, :117-121
    with camera_viewproj_inverse for world space)."""
    ndc = jnp.concatenate([uv * 2.0 - 1.0, depth[..., None]], axis=-1)
    h = transform_points(inverse_matrix, ndc)
    # depth == 0 (sky, infinite reverse-Z far plane) yields w == 0; the reference's
    # GLSL divides anyway and downstream math multiplies by N == 0.  IEEE gives
    # NaN * 0 = NaN, so we clamp w to keep sky pixels finite (a point ~1e8 away).
    w = h[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-8, jnp.where(w < 0, -1e-8, 1e-8), w)
    return h[..., :3] / w
