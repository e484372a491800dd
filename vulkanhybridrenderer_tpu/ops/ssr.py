"""Screen-space reflections: world-space ray march + binary search refinement
(reference ssr.comp:61-137) and full-BRDF shading of the hit sample (:28-59).

March: `ray_distance / step_size` fixed steps along reflect(I, N); a hit is
0.3 < (dist_to_ray - dist_to_screen) < thickness.  The binary search then refines
between the last miss and the hit (:105-128).  All pixels march in lockstep with a
found-mask (lax.fori_loop) -- fixed iteration counts are exactly what the GLSL loop
compiles to anyway.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.types import PerFrameData
from vulkanhybridrenderer_tpu.core.config import SSRSettings
from vulkanhybridrenderer_tpu.ops import brdf, screen
from vulkanhybridrenderer_tpu.ops.filters import (bilinear_quad, bilinear_sample,
                                                  quad2x2_rows)
from vulkanhybridrenderer_tpu.utils.math3d import PI_INVERSE, normalize, reflect, transform_points

DELTA_MIN = 0.3  # ssr.comp:97


def _world_to_uv(pfd, pos):
    clip = transform_points(pfd.camera_proj @ pfd.camera_view, pos)
    return (clip[..., :2] / clip[..., 3:4]) * 0.5 + 0.5


def _dist_to_screen(pfd, depth_quad, hw, uv, cam):
    # one quad-row gather per tap (the march samples depth every step;
    # per-index gather cost model, docs/PERF_STATUS.md)
    d = bilinear_quad(depth_quad, hw[0], hw[1], uv)
    p = screen.position_from_depth(d, uv, pfd.camera_viewproj_inverse)
    return jnp.linalg.norm(p - cam, axis=-1)


def ssr(pfd: PerFrameData, depth, normal_oid, albedo, motion_mr,
        settings: SSRSettings):
    """Returns (4, H, W) reflections (rgb + hit flag in alpha)."""
    h, w = depth.shape
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] / w
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] / h
    coords = jnp.concatenate(
        [jnp.broadcast_to(xx, (h, w))[..., None], jnp.broadcast_to(yy, (h, w))[..., None]],
        axis=-1,
    )
    depth_quad = quad2x2_rows(depth)
    frag_depth = bilinear_quad(depth_quad, h, w, coords)
    cam = pfd.camera_position
    p = screen.position_from_depth(frag_depth, coords, pfd.camera_viewproj_inverse)
    n = normal_oid[:3].transpose(1, 2, 0)
    i_dir = normalize(p - cam)
    r_dir = normalize(reflect(i_dir, n))

    num_steps = int(settings.ray_distance / settings.step_size)

    def in_hit_band(offset):
        ray_pos = p + r_dir * offset[..., None]
        dist_ray = jnp.linalg.norm(ray_pos - cam, axis=-1)
        suv = _world_to_uv(pfd, ray_pos)
        dist_screen = _dist_to_screen(pfd, depth_quad, (h, w), suv, cam)
        delta = dist_ray - dist_screen
        return (delta > DELTA_MIN) & (delta < settings.thickness), suv

    # ---- linear march (:83-104) ---------------------------------------------------
    def march(i, carry):
        found, prev_step, final_step = carry
        offset = settings.step_size * i.astype(jnp.float32)
        hit, _ = in_hit_band(offset)
        new_found = found | hit
        final_step = jnp.where(hit & ~found, offset, final_step)
        prev_step = jnp.where(~new_found, offset, prev_step)
        return new_found, prev_step, final_step

    found = jnp.zeros((h, w), bool)
    prev_step = jnp.zeros((h, w), jnp.float32)
    final_step = jnp.zeros((h, w), jnp.float32)
    found, prev_step, final_step = jax.lax.fori_loop(
        0, num_steps, march, (found, prev_step, final_step)
    )

    # ---- binary search (:105-128) ---------------------------------------------------
    mid = (prev_step + final_step) * 0.5
    final_uv = jnp.zeros((h, w, 2), jnp.float32)

    def bsearch(_, carry):
        mid, prev, final_uv = carry
        hit, suv = in_hit_band(mid)
        new_mid = jnp.where(hit, (prev + mid) * 0.5, mid + (mid - prev))
        new_prev = jnp.where(hit, prev, mid)
        return new_mid, new_prev, suv

    mid, prev_step, final_uv = jax.lax.fori_loop(
        0, settings.bsearch_steps, bsearch, (mid, prev_step, final_uv)
    )

    # ---- shade the hit sample (:28-59) -----------------------------------------------
    alb = bilinear_sample(albedo, final_uv)[..., :3]
    pos = screen.position_from_depth(
        bilinear_quad(depth_quad, h, w, final_uv), final_uv,
        pfd.camera_viewproj_inverse,
    )
    mr = bilinear_sample(motion_mr, final_uv)[..., 2:4]
    nrm = bilinear_sample(normal_oid, final_uv)[..., :3]
    v_dir = normalize(cam - pos)
    l = -pfd.directional_light.direction[:3]
    lighting = brdf.direct_lighting(
        alb,
        jnp.clip(mr[..., 0], 0.0, 1.0),
        mr[..., 1],
        nrm,
        v_dir,
        jnp.broadcast_to(l, nrm.shape),
        pfd.directional_light.color[:3],
        pfd.directional_light.intensity[:3],
        ambient_factor=PI_INVERSE * 0.2,
    )
    rgb = jnp.where(found[..., None], lighting, 0.0)
    a = jnp.where(found, 1.0, 0.0)
    return jnp.concatenate([rgb, a[..., None]], axis=-1).transpose(2, 0, 1)
