"""Half-resolution ray tracing support: guided downsample + joint-bilateral
upsample.

The reference traces every RT effect at full resolution (raygen.rgen launches
one thread per display pixel).  On TPU the traces are the frame's dominant
cost (docs/PERF_STATUS.md), so `HybridSettings.rt_scale = s` traces
shadow/AO/reflections on a 1/s-resolution G-buffer (1/s^2 the rays) and
upsamples the (denoised) results with full-res G-buffer guidance — the
standard real-time half-res RT recipe the 16.6 ms target invites.  Default is
rt_scale = 1 (reference parity); the knob only changes performance/quality
trade-off, never the pass semantics.

The upsample is joint-bilateral: each full-res pixel blends its 4 nearest
low-res taps with weights = bilinear footprint x object-id match x normal
alignment^32 x relative depth closeness (the SVGF edge-stopping family,
svgf_atrous_filter.comp:40-101), falling back to plain bilinear where no tap
matches (disocclusion slivers thinner than the low-res grid).
"""
from __future__ import annotations

import jax.numpy as jnp

NORMAL_POW = 32
DEPTH_REL_SIGMA = 0.1  # relative reverse-Z tolerance


def downsample_nearest(img, scale: int):
    """(..., H, W) -> (..., ceil(H/s), ceil(W/s)) by top-left point sampling.

    Point sampling (not averaging) keeps every low-res texel a REAL surface
    sample — averaged depth/normals across edges belong to no surface and
    would spray rays from phantom geometry."""
    if scale == 1:
        return img
    h, w = img.shape[-2:]
    iy = jnp.arange(0, h, scale)
    ix = jnp.arange(0, w, scale)
    return jnp.take(jnp.take(img, iy, axis=-2), ix, axis=-1)


def _tap_indices(n_hi: int, n_lo: int, scale: int):
    """Bilinear footprint of full-res row/col i onto the low-res grid:
    (i0, i1, frac) with i0/i1 clamped to [0, n_lo-1]."""
    f = (jnp.arange(n_hi, dtype=jnp.float32) + 0.5) / scale - 0.5
    i0 = jnp.floor(f)
    frac = f - i0
    i0i = jnp.clip(i0.astype(jnp.int32), 0, n_lo - 1)
    i1i = jnp.clip(i0i + 1, 0, n_lo - 1)
    return i0i, i1i, frac


def joint_bilateral_upsample(
    lo,  # (C, hs, ws) low-res signal
    scale: int,
    depth_hi,  # (H, W) full-res guide
    normal_oid_hi,  # (4, H, W) full-res guide (xyz normal, w object id)
    depth_lo,  # (hs, ws) low-res guide (the SAME samples the trace used)
    normal_oid_lo,  # (4, hs, ws)
):
    """(C, hs, ws) -> (C, H, W) guided by the full-res G-buffer."""
    if scale == 1:
        return lo
    h, w = depth_hi.shape
    hs, ws = depth_lo.shape
    y0, y1, fy = _tap_indices(h, hs, scale)
    x0, x1, fx = _tap_indices(w, ws, scale)
    wy = [(1.0 - fy)[:, None], fy[:, None]]  # (H, 1)
    wx = [(1.0 - fx)[None, :], fx[None, :]]  # (1, W)
    ys = [y0, y1]
    xs = [x0, x1]

    n_hi = normal_oid_hi[:3]
    oid_hi = normal_oid_hi[3]

    num = jnp.zeros((lo.shape[0], h, w), lo.dtype)
    den = jnp.zeros((h, w), jnp.float32)
    num_b = jnp.zeros_like(num)  # plain-bilinear fallback accumulator

    for a in range(2):
        for b in range(2):
            take = lambda img: jnp.take(
                jnp.take(img, ys[a], axis=-2), xs[b], axis=-1
            )
            w_bil = wy[a] * wx[b]  # (H, W)
            d_tap = take(depth_lo)
            no_tap = take(normal_oid_lo)
            w_id = (no_tap[3] == oid_hi).astype(jnp.float32)
            ndot = jnp.maximum(jnp.sum(no_tap[:3] * n_hi, axis=0), 0.0)
            w_n = ndot ** NORMAL_POW
            w_z = jnp.exp(
                -jnp.abs(d_tap - depth_hi)
                / (DEPTH_REL_SIGMA * jnp.maximum(depth_hi, 1e-4))
            )
            wt = w_bil * w_id * w_n * w_z
            v = take(lo)
            num = num + wt[None] * v
            den = den + wt
            num_b = num_b + w_bil[None] * v

    good = den > 1e-6
    return jnp.where(good[None], num / jnp.maximum(den, 1e-6)[None], num_b)
