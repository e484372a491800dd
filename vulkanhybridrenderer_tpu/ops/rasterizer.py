"""Visibility-buffer rasterization (jnp reference implementation).

TPU-first redesign of the reference's raster pipelines (gbuf.vert/frag,
depth_prepass.vert): instead of per-primitive draw calls through fixed-function
hardware (hybrid_render_path.cpp:41-52), we rasterize the *whole scene* into a
visibility buffer -- per pixel: (triangle id, reverse-Z depth, screen barycentrics) --
and defer all attribute work to a separate resolve pass (ops/gbuffer.py).  That split
keeps the depth-test inner loop tiny and vector-friendly, and turns attribute
interpolation + texturing into big batched gathers that XLA fuses well.

This module is the *reference* implementation: a `lax.scan` over triangle chunks with
full-image edge-function evaluation per chunk.  It is exact and runs anywhere (CPU
tests use it at small resolutions); the production Pallas path (ops/rasterizer_tiled.py)
bins triangles to tiles first and must match it bit-for-bit on the visibility buffer.

Pipeline-state parity: back-face culling with the offscreen front-face convention
(pipeline.cpp:99 + :170-173 -- our projections bake the y-flip, see package
docstring), reverse-Z GREATER_OR_EQUAL depth test with clear depth 0.0
(vulkan_pipeline_presets.h:35-40, ClearDepth(0.0) in all paths), later-triangle wins
depth ties.  Near-plane handling: triangles with any vertex at w <= eps are rejected
(no true clipping yet -- cameras in our scenes keep geometry past znear).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VisibilityBuffer:
    tri_id: Any  # (H, W) int32, -1 = none
    depth: Any  # (H, W) f32 reverse-Z (0 = far/clear)
    bary: Any  # (H, W, 2) f32 screen-space (lambda1, lambda2) of the winner


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriangleSetup:
    """Screen-space triangle data. sx/sy in pixels, z = ndc depth, inv_w = 1/clip.w."""

    sx: Any  # (T, 3)
    sy: Any  # (T, 3)
    z: Any  # (T, 3)
    inv_w: Any  # (T, 3)
    valid: Any  # (T,) bool


def triangle_setup(clip, tri_vertex, width: int, height: int) -> TriangleSetup:
    """clip: (V, 4) clip-space vertices; tri_vertex: (T, 3) vertex ids."""
    v = clip[tri_vertex]  # (T, 3, 4)
    w = v[..., 3]
    valid = jnp.all(w > 1e-6, axis=-1)
    safe_w = jnp.where(w > 1e-6, w, 1.0)
    inv_w = 1.0 / safe_w
    ndc = v[..., :3] * inv_w[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (ndc[..., 1] * 0.5 + 0.5) * height
    return TriangleSetup(sx=sx, sy=sy, z=ndc[..., 2], inv_w=inv_w, valid=valid)


def _pad_to_multiple(arr, chunk, fill):
    t = arr.shape[0]
    pad = (-t) % chunk
    if pad == 0:
        return arr
    pad_block = jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)
    return jnp.concatenate([arr, pad_block], axis=0)


@partial(
    jax.jit,
    static_argnames=("width", "height", "chunk", "cull_backface", "frag_mask_fn"),
)
def rasterize(
    setup: TriangleSetup,
    width: int,
    height: int,
    chunk: int = 64,
    cull_backface: bool = True,
    frag_mask_fn: Callable | None = None,
) -> VisibilityBuffer:
    """Rasterize all triangles; returns the visibility buffer.

    frag_mask_fn(tri_ids (C,), lam (C, H, W, 3)) -> (C, H, W) bool: optional
    per-fragment kill mask evaluated *during* rasterization -- the alpha-mask discard
    of gbuf.frag:27-32 (a discarded fragment exposes geometry behind it, so it cannot
    be done at resolve time).
    """
    t_total = setup.sx.shape[0]
    sx = _pad_to_multiple(setup.sx, chunk, 0.0)
    sy = _pad_to_multiple(setup.sy, chunk, 0.0)
    zz = _pad_to_multiple(setup.z, chunk, 0.0)
    iw = _pad_to_multiple(setup.inv_w, chunk, 1.0)
    vv = _pad_to_multiple(setup.valid, chunk, False)
    n_chunks = sx.shape[0] // chunk

    px = jnp.arange(width, dtype=jnp.float32)[None, None, :] + 0.5
    py = jnp.arange(height, dtype=jnp.float32)[None, :, None] + 0.5

    def body(carry, c):
        best_z, best_tri, best_b1, best_b2 = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk, axis=0)
        x, y, z, w_inv, val = sl(sx), sl(sy), sl(zz), sl(iw), sl(vv)
        tri_ids = c * chunk + jnp.arange(chunk, dtype=jnp.int32)

        x0, x1, x2 = x[:, 0, None, None], x[:, 1, None, None], x[:, 2, None, None]
        y0, y1, y2 = y[:, 0, None, None], y[:, 1, None, None], y[:, 2, None, None]
        area2 = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)  # (C,1,1)

        if cull_backface:
            # Front face after the baked y-flip = negative signed area
            # (pipeline.cpp:170-173: offscreen passes use CLOCKWISE front face).
            front = area2 < 0
        else:
            front = jnp.abs(area2) > 1e-12

        inv_area = 1.0 / jnp.where(jnp.abs(area2) > 1e-12, area2, 1.0)
        # Edge functions opposite each vertex -> barycentrics after / area.
        e0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        e1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
        e2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        l0 = e0 * inv_area
        l1 = e1 * inv_area
        l2 = e2 * inv_area
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
        z_px = l0 * z[:, 0, None, None] + l1 * z[:, 1, None, None] + l2 * z[:, 2, None, None]
        inside &= (z_px >= 0.0) & (z_px <= 1.0)
        inside &= front & val[:, None, None] & (tri_ids < t_total)[:, None, None]

        if frag_mask_fn is not None:
            lam = jnp.stack([l0, l1, l2], axis=-1)
            inside &= frag_mask_fn(tri_ids, lam, w_inv)

        # Reverse-Z: larger depth wins; later triangle wins ties (GREATER_OR_EQUAL).
        # Merge triangles in submission order with static slices -- argmax +
        # take_along_axis compiles to gathers, which are pathologically slow on
        # TPU (hundreds of ms per full-frame chunk).
        for j in range(chunk):
            better = inside[j] & (z_px[j] >= best_z)
            best_z = jnp.where(better, z_px[j], best_z)
            best_tri = jnp.where(better, tri_ids[j], best_tri)
            best_b1 = jnp.where(better, l1[j], best_b1)
            best_b2 = jnp.where(better, l2[j], best_b2)
        return (best_z, best_tri, best_b1, best_b2), None

    init = (
        jnp.zeros((height, width), jnp.float32),
        jnp.full((height, width), -1, jnp.int32),
        jnp.zeros((height, width), jnp.float32),
        jnp.zeros((height, width), jnp.float32),
    )
    (bz, bt, b1, b2), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return VisibilityBuffer(
        tri_id=bt, depth=bz, bary=jnp.stack([b1, b2], axis=-1)
    )
