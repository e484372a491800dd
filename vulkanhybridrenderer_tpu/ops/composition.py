"""Hybrid composition: G-buffer + shadow/AO/reflection sources -> final lighting
(reference composition.frag:64-161).  The shadow/AO/reflection mode selection is
compile-time (specialization constants in the reference, static Python config here),
so each mode combination traces to a lean fused kernel.
"""
from __future__ import annotations

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.config import (
    AmbientOcclusionMode,
    HybridSettings,
    ReflectionMode,
    ShadowMode,
)
from vulkanhybridrenderer_tpu.core.types import GBuffer, PerFrameData
from vulkanhybridrenderer_tpu.ops import brdf, screen, shadowmap
from vulkanhybridrenderer_tpu.utils.math3d import PI_INVERSE, normalize


def compose(
    gbuf: GBuffer,
    pfd: PerFrameData,
    settings: HybridSettings,
    shadow_map=None,  # (S, S) when shadow_mode == RASTERIZED
    ssao_tex=None,  # (H, W) when ao_mode == SSAO
    ssr_tex=None,  # (4, H, W) when reflection_mode == SSR
    rt_shadow_ao=None,  # (4, H, W) when any RT mode (possibly denoised)
    rt_reflections=None,  # (4, H, W) when reflection_mode == RAYTRACED
):
    h, w = gbuf.depth.shape
    uv = screen.pixel_uv_grid(h, w)
    albedo = gbuf.albedo[:3].transpose(1, 2, 0)
    depth = gbuf.depth
    p = screen.position_from_depth(depth, uv, pfd.camera_viewproj_inverse)
    n = gbuf.normal_oid[:3].transpose(1, 2, 0)
    metallic = jnp.clip(gbuf.motion_mr[2], 0.0, 1.0)
    roughness = jnp.clip(gbuf.motion_mr[3], brdf.MIN_ROUGHNESS, 1.0)

    cam = pfd.camera_position
    v = normalize(cam - p)
    l = -pfd.directional_light.direction[:3]
    l_b = jnp.broadcast_to(l, n.shape)
    h_vec = normalize(l_b + v)

    # ---- shadow source (composition.frag:81-135) -------------------------------
    if settings.shadow_mode == ShadowMode.RAYTRACED:
        shadow = rt_shadow_ao[0]
    elif settings.shadow_mode == ShadowMode.RASTERIZED:
        shadow = shadowmap.shadow_pcf16(
            shadow_map, pfd.directional_light.projview, p
        )
    else:
        shadow = jnp.ones((h, w), jnp.float32)

    # ---- AO source (:137-143) ----------------------------------------------------
    if settings.ao_mode == AmbientOcclusionMode.RAYTRACED:
        ao = rt_shadow_ao[1]
    elif settings.ao_mode == AmbientOcclusionMode.SSAO:
        ao = ssao_tex
    else:
        ao = jnp.ones((h, w), jnp.float32)

    # ---- BRDF terms (:121-134) ------------------------------------------------------
    light_i = pfd.directional_light.intensity[:3]
    light_c = pfd.directional_light.color[:3]
    f0 = jnp.full_like(albedo, 0.04)
    f0 = f0 + (albedo - f0) * metallic[..., None]
    f = brdf.fresnel_schlick(f0, h_vec, v)
    n_dot_l = jnp.maximum(jnp.sum(n * l_b, axis=-1), 0.0)

    ambient = ao[..., None] * albedo * PI_INVERSE
    common = (n_dot_l * shadow)[..., None] * light_i * light_c
    diffuse = brdf.diffuse_brdf(metallic, albedo, f) * common
    specular = brdf.specular_brdf(roughness, f, v, l_b, n, h_vec) * common

    # ---- reflections (:145-156) --------------------------------------------------------
    if settings.reflection_mode == ReflectionMode.RAYTRACED:
        refl = rt_reflections[:3].transpose(1, 2, 0) * shadow[..., None]
        specular = jnp.where(
            (metallic == 1.0)[..., None],
            refl,
            specular + (refl - specular) * roughness[..., None],
        )
    elif settings.reflection_mode == ReflectionMode.SSR:
        refl = ssr_tex[:3].transpose(1, 2, 0) * shadow[..., None]
        specular = jnp.where(
            (metallic == 1.0)[..., None],
            refl,
            specular + (refl - specular) * roughness[..., None],
        )

    rgb = ambient + diffuse + specular
    out = jnp.concatenate([rgb, jnp.ones((h, w, 1), jnp.float32)], axis=-1)
    return out.transpose(2, 0, 1)
