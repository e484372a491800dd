"""Shadow mapping: depth-only rasterization from the light + lookup/PCF filters.

Reference semantics:
  * depth prepass renders the scene into a 4096x4096 D32 target from
    directional_light.projview with reverse-Z GREATER_OR_EQUAL + clear 0
    (depth_prepass.vert:14-18, forward_raster_render_path.cpp:15).
  * single-tap lookup with bias 0.003 (forward default.frag:75-79).
  * 16-tap PCF on a 4x4 half-texel grid with bias 1e-4 (composition.frag:88-111).

Lookups: shadow_coord = SHADOW_BIAS_MATRIX @ projview @ P; uv = coord.xy, compare
coord.z against the stored (reverse-Z) depth: the fragment is lit when
z >= stored - bias (stored depth is the surface *closest to the light* = max).
"""
from __future__ import annotations

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.ops import rasterizer
from vulkanhybridrenderer_tpu.utils.math3d import SHADOW_BIAS_MATRIX, transform_points


def render_shadow_map(clip_light, tri_vertex, size: int, chunk: int = 64):
    """Rasterize depth-only from the light's point of view.

    clip_light: (V, 4) vertices in light clip space.  Returns (size, size) f32.
    The reference keeps back-face culling on for the prepass (RASTERIZATION_STATE_
    DEFAULT, pipeline.cpp:99) -- matched here.
    """
    setup = rasterizer.triangle_setup(clip_light, tri_vertex, size, size)
    vis = rasterizer.rasterize(setup, size, size, chunk=chunk)
    return vis.depth


def _sample_nearest(shadow_map, uv):
    """Nearest-texel depth fetch, clamped to edge. uv: (..., 2) in [0,1]."""
    size_y, size_x = shadow_map.shape
    x = jnp.clip((uv[..., 0] * size_x).astype(jnp.int32), 0, size_x - 1)
    y = jnp.clip((uv[..., 1] * size_y).astype(jnp.int32), 0, size_y - 1)
    return shadow_map[y, x]


def shadow_coords(light_projview, world_pos):
    """(..., 3): uv + reverse-Z depth of world positions in light space."""
    biased = SHADOW_BIAS_MATRIX @ light_projview
    h = transform_points(jnp.asarray(biased), world_pos)
    return h[..., :3] / h[..., 3:4]


def shadow_single_tap(shadow_map, light_projview, world_pos, bias: float = 0.003):
    """forward default.frag:75-79: shadow = coord.z < depth - bias ? 0 : 1."""
    sc = shadow_coords(light_projview, world_pos)
    d = _sample_nearest(shadow_map, sc[..., :2])
    return jnp.where(sc[..., 2] < d - bias, 0.0, 1.0)


def shadow_pcf16(shadow_map, light_projview, world_pos, bias: float = 1e-4):
    """composition.frag:88-111: 16 taps on a 4x4 grid of half-texel offsets scaled by
    1/4096 (the hard-coded scale in the reference), averaged.

    Tap fusion: the 4x4 grid spans at most 4 consecutive texels per axis (for
    maps up to 4096^2), so the 16 nearest-taps are served by FOUR 4-wide row
    gathers from an edge-clamped quad table + lane selects — gather cost on
    TPU is per-index (docs/PERF_STATUS.md), so this is 4x fewer indices than
    per-tap gathers."""
    from vulkanhybridrenderer_tpu.ops.filters import quad4_rows

    sc = shadow_coords(light_projview, world_pos)
    h, w = shadow_map.shape
    offs = (-1.5, -0.5, 0.5, 1.5)
    if w > 4096 or h > 4096:
        # offsets span > 4 texels: per-tap gathers (exact original path)
        scale = 1.0 / 4096.0
        acc = 0.0
        for oy in offs:
            for ox in offs:
                uv = sc[..., :2] + jnp.array([ox, oy], jnp.float32) * scale
                d = _sample_nearest(shadow_map, uv)
                acc = acc + jnp.where(sc[..., 2] < d - bias, 0.0, 1.0)
        return acc / 16.0

    quad = quad4_rows(shadow_map)
    sx = w / 4096.0  # reference's hard-coded 1/4096 uv scale, in texels
    sy = h / 4096.0
    fx = sc[..., 0] * w
    fy = sc[..., 1] * h
    x0 = jnp.clip(jnp.floor(fx - 1.5 * sx).astype(jnp.int32), 0, w - 4)
    lanes = jnp.arange(4, dtype=jnp.int32)
    acc = 0.0
    for oy in offs:
        yj = jnp.clip((fy + oy * sy).astype(jnp.int32), 0, h - 1)
        row = quad[yj * w + x0]  # (..., 4)
        for ox in offs:
            xi = jnp.clip((fx + ox * sx).astype(jnp.int32), 0, w - 1)
            lane = jnp.clip(xi - x0, 0, 3)
            d = jnp.sum(
                jnp.where(lane[..., None] == lanes, row, 0.0), axis=-1
            )
            acc = acc + jnp.where(sc[..., 2] < d - bias, 0.0, 1.0)
    return acc / 16.0
