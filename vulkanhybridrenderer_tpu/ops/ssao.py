"""Alchemy screen-space ambient occlusion + box blur (reference ssao.comp,
ssao_blur.comp).

Parity (cited to ssao.comp):
  * view-space position from depth via camera_proj_inverse (:24), view-space normal
    = mat3(view) * world_normal (:25);
  * perspective_radius = radius / P.z -- P.z is *negative* in front of the camera;
    the reference does not take abs, producing mirrored disk offsets, which is
    statistically identical for this symmetric kernel; matched exactly (:28);
  * 16 samples, angle/distance from the shader RNG seeded
    (y * display_h + x) * frame_index (:36-44);
  * AO = max(1 - (2*sigma/n) * sum(max(dot(V,N) - beta, 0) / (dot(V,V) + 1e-4)), 0)
    with sigma=1, beta=1e-4 (:31-46);
  * sky pixels (depth == 0) write 0 (:17-23);
  * blur: 13x13 box summing in-bounds taps but always dividing by 169
    (ssao_blur.comp:14-25) -- keeps the reference's edge darkening.
"""
from __future__ import annotations

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.types import PerFrameData
from vulkanhybridrenderer_tpu.ops import screen
from vulkanhybridrenderer_tpu.ops.filters import (bilinear_quad, quad2x2_rows,
                                                  shifted)
from vulkanhybridrenderer_tpu.utils import rng
from vulkanhybridrenderer_tpu.utils.math3d import TWO_PI, transform_directions

NUM_SAMPLES = 16
SIGMA = 1.0
BETA = 1e-4


def ssao(pfd: PerFrameData, depth, normal_oid, radius: float):
    """depth (H, W), normal_oid (4, H, W) -> AO (H, W)."""
    h, w = depth.shape
    # NOTE: the reference computes coords = pixel_index * display_size_inverse
    # (ssao.comp:17), i.e. *without* the half-texel offset -- matched.
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] / w
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] / h
    coords = jnp.concatenate(
        [jnp.broadcast_to(xx, (h, w))[..., None], jnp.broadcast_to(yy, (h, w))[..., None]],
        axis=-1,
    )
    dq = quad2x2_rows(depth)  # one row gather per bilinear depth tap
    d0 = bilinear_quad(dq, h, w, coords)
    p = screen.position_from_depth(d0, coords, pfd.camera_proj_inverse)
    n_world = normal_oid[:3].transpose(1, 2, 0)
    n = transform_directions(pfd.camera_view, n_world)

    perspective_radius = radius / p[..., 2]
    state = rng.pixel_seed(w, h, pfd.frame_index)

    acc = jnp.zeros((h, w), jnp.float32)
    for _ in range(NUM_SAMPLES):
        state, r1 = rng.random01(state)
        state, r2 = rng.random01(state)
        ang = r1 * TWO_PI
        dist = r2 * perspective_radius
        offset = jnp.stack([jnp.cos(ang) * dist, jnp.sin(ang) * dist], axis=-1)
        suv = coords + offset
        ds = bilinear_quad(dq, h, w, suv)
        ps = screen.position_from_depth(ds, suv, pfd.camera_proj_inverse)
        v = ps - p
        acc = acc + jnp.maximum(jnp.sum(v * n, axis=-1) - BETA, 0.0) / (
            jnp.sum(v * v, axis=-1) + 1e-4
        )

    ao = jnp.maximum(1.0 - (2.0 * SIGMA / NUM_SAMPLES) * acc, 0.0)
    return jnp.where(d0 == 0.0, 0.0, ao)


def ssao_blur(ao):
    """13x13 box blur, edges divided by the full 169 (ssao_blur.comp:14-25)."""
    h, w = ao.shape
    acc = jnp.zeros_like(ao)
    for dy in range(-6, 7):
        for dx in range(-6, 7):
            acc = acc + shifted(ao, dy, dx, fill=0.0)
    return acc / 169.0
