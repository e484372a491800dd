"""PBR BRDF evaluation (reference data/shaders/common.glsl:116-150).

All functions are elementwise over (..., 3) / (...,) jnp arrays and fuse into the
surrounding jitted frame function on TPU (pure VPU work).
"""
from __future__ import annotations

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.utils.math3d import PI, PI_INVERSE, dot, normalize

MIN_ROUGHNESS = 0.04  # composition.frag:121, reflection_hit.rchit:53


def fresnel_schlick(f0, h, v):
    """common.glsl:116-119 (5 explicit multiplies, matching the reference exactly)."""
    h_dot_v = jnp.maximum(dot(h, v, keepdims=True), 0.0)
    m = 1.0 - h_dot_v
    return f0 + (1.0 - f0) * m * m * m * m * m


def d_ggx(roughness, n, h):
    """Trowbridge-Reitz GGX normal distribution (common.glsl:122-127).

    Note the reference uses a2 = roughness^2 (not roughness^4); kept for parity.
    """
    a2 = roughness * roughness
    n_dot_h = jnp.maximum(dot(n, h), 0.0)
    f = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / (PI * f * f)


def g_ggx(roughness, n, v, l):
    """Schlick-GGX geometry term (common.glsl:130-139)."""
    k = (roughness + 1.0) * (roughness + 1.0) * 0.125
    n_dot_v = jnp.maximum(dot(n, v), 0.0)
    n_dot_l = jnp.maximum(dot(n, l), 0.0)
    g_nvk = n_dot_v / (n_dot_v * (1.0 - k) + k)
    g_nlk = n_dot_l / (n_dot_l * (1.0 - k) + k)
    return g_nvk * g_nlk


def specular_brdf(roughness, f, v, l, n, h):
    """common.glsl:141-145.  roughness: (...,), f: (..., 3); returns (..., 3)."""
    dfg = (d_ggx(roughness, n, h) * g_ggx(roughness, n, v, l))[..., None] * f
    denom = 4.0 * jnp.maximum(dot(n, v), 0.0) * jnp.maximum(dot(n, l), 0.0)
    return dfg / jnp.maximum(denom, 1e-6)[..., None]


def diffuse_brdf(metallic, albedo, f):
    """common.glsl:147-150.  metallic: (...,), albedo/f: (..., 3)."""
    diffuse_portion = (1.0 - f) * (1.0 - metallic)[..., None]
    return diffuse_portion * albedo / PI


def direct_lighting(albedo, metallic, roughness, n, v, l, light_color, light_intensity,
                    ambient_factor):
    """Shared ambient + GGX direct lighting combine used by reflection_hit.rchit:52-71
    and ssr.comp:28-59: ambient + (diffuse+specular) * max(N.L,0) * intensity * color.

    albedo: (...,3); metallic/roughness: (...,); n,v,l: (...,3);
    light_color/light_intensity: (3,) or broadcastable.
    Returns (..., 3) linear radiance.
    """
    roughness = jnp.clip(roughness, MIN_ROUGHNESS, 1.0)
    metallic = jnp.clip(metallic, 0.0, 1.0)
    h = normalize(l + v)
    f0 = jnp.full_like(albedo, 0.04)
    f0 = f0 + (albedo - f0) * metallic[..., None]
    f = fresnel_schlick(f0, h, v)
    ambient = albedo * ambient_factor
    diffuse = diffuse_brdf(metallic, albedo, f)
    specular = specular_brdf(roughness, f, v, l, n, h)
    n_dot_l = jnp.maximum(dot(n, l), 0.0)[..., None]
    return ambient + (diffuse + specular) * n_dot_l * light_intensity * light_color


__all__ = [
    "MIN_ROUGHNESS",
    "PI_INVERSE",
    "fresnel_schlick",
    "d_ggx",
    "g_ggx",
    "specular_brdf",
    "diffuse_brdf",
    "direct_lighting",
]
