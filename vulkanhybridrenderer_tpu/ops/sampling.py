"""Monte-Carlo direction sampling (reference data/shaders/common.glsl:29-42)."""
from __future__ import annotations

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.utils.math3d import TWO_PI, onb_from_unit_vector


def uniform_sample_cone(u, cos_theta_max):
    """Uniform direction in a cone around +z (common.glsl:29-34).

    u: (..., 2) uniforms; returns (..., 3).
    """
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = u[..., 1] * TWO_PI
    return jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )


def uniform_sample_cosine_hemisphere(u):
    """Cosine-weighted hemisphere around +z (common.glsl:37-42)."""
    r = jnp.sqrt(u[..., 0])
    phi = TWO_PI * u[..., 1]
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u[..., 0], 0.0))
    return jnp.stack([x, y, z], axis=-1)


def to_basis(n, local_dir):
    """Rotate a +z-hemisphere sample into the basis around unit vector n
    (GLSL ``onb_from_unit_vector(n) * d``, raygen.rgen:36-52)."""
    t, b, nn = onb_from_unit_vector(n)
    return (
        local_dir[..., 0:1] * t + local_dir[..., 1:2] * b + local_dir[..., 2:3] * nn
    )
