"""Image gather/filter helpers shared by the screen-space passes."""
from __future__ import annotations

import jax.numpy as jnp


def flat_gather(table, idx):
    """table: (N,) 1-D; idx: any shape -> table[idx].

    Gather cost on TPU is per-INDEX, independent of row width (row gathers are
    NOT slower -- round 1's "300x" rule was a dispatch-latency measurement
    artifact, see docs/PERF_STATUS.md): prefer ONE (N, K) row gather over K
    1-D gathers when a consumer needs K values per index.  This helper remains
    for genuinely scalar lookups.  Multi-dim index shapes are fine as-is --
    measured: pre-flattening idx with reshapes made the forward frame 2x
    slower (breaks fusion)."""
    return table[idx]


def gather_2d(img, iy, ix):
    """img: (H, W) or (C, H, W); iy/ix int32 (...,) clamped to bounds.
    Returns (...,) or (..., C)."""
    if img.ndim == 2:
        h, w = img.shape
        iy = jnp.clip(iy, 0, h - 1)
        ix = jnp.clip(ix, 0, w - 1)
        return img.reshape(-1)[iy * w + ix]
    c, h, w = img.shape
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    lin = (iy * w + ix).reshape(-1)
    return img.reshape(c, -1)[:, lin].T.reshape(iy.shape + (c,))


def bilinear_sample(img, uv):
    """GLSL texture() with a linear clamp-to-edge sampler.

    img: (H, W) or (C, H, W); uv: (..., 2) in [0, 1] (texel centers at
    (i + .5) / size).  Returns (...,) or (..., C).
    """
    h, w = img.shape[-2:]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    c00 = gather_2d(img, y0i, x0i)
    c10 = gather_2d(img, y0i, x0i + 1)
    c01 = gather_2d(img, y0i + 1, x0i)
    c11 = gather_2d(img, y0i + 1, x0i + 1)
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def shifted(img, dy: int, dx: int, fill=0.0):
    """Static shift of the last two dims with `fill` outside -- stencil building
    block.  shifted(img, dy, dx)[..., y, x] == img[..., y + dy, x + dx] (fill where
    y + dy or x + dx falls outside)."""
    h, w = img.shape[-2:]
    pad = [(0, 0)] * (img.ndim - 2) + [
        (max(0, -dy), max(0, dy)),
        (max(0, -dx), max(0, dx)),
    ]
    p = jnp.pad(img, pad, constant_values=fill)
    y0 = max(0, dy)
    x0 = max(0, dx)
    sl = [slice(None)] * (img.ndim - 2) + [slice(y0, y0 + h), slice(x0, x0 + w)]
    return p[tuple(sl)]


def inbounds_mask(height: int, width: int, dy: int, dx: int):
    """(H, W) bool: True where pixel (y + dy, x + dx) is inside the image (the
    bounds checks the compute shaders do per tap)."""
    yy = jnp.arange(height)[:, None] + dy
    xx = jnp.arange(width)[None, :] + dx
    return ((yy >= 0) & (yy < height)) & ((xx >= 0) & (xx < width))


def _edge_shift(img, dy: int, dx: int):
    """shifted() with edge replication (clamp-to-edge neighborhoods)."""
    h, w = img.shape[-2:]
    p = jnp.pad(
        img,
        [(0, 0)] * (img.ndim - 2) + [(0, max(0, dy)), (0, max(0, dx))],
        mode="edge",
    )
    sl = [slice(None)] * (img.ndim - 2) + [slice(dy, dy + h), slice(dx, dx + w)]
    return p[tuple(sl)]


def quad2x2_rows(img):
    """(H, W) -> (H*W, 4) rows [v(y,x), v(y,x+1), v(y+1,x), v(y+1,x+1)]
    (edge-clamped), so one bilinear tap = ONE row gather (bilinear_quad).

    Gather cost on TPU is per-index regardless of row width
    (docs/PERF_STATUS.md); the per-channel formulation pays 4 indices per tap.
    """
    return jnp.stack(
        [img, _edge_shift(img, 0, 1), _edge_shift(img, 1, 0),
         _edge_shift(img, 1, 1)],
        axis=-1,
    ).reshape(-1, 4)


def bilinear_quad(quad, h: int, w: int, uv):
    """GLSL texture() with a linear clamp-to-edge sampler via quad2x2_rows:
    ONE row gather per tap.  Bit-equivalent to bilinear_sample up to border
    weight algebra (continuous coords are clamped first, which zeroes the
    out-of-range lane weights)."""
    x = jnp.clip(uv[..., 0] * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(uv[..., 1] * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.minimum(x0.astype(jnp.int32), w - 1)
    y0i = jnp.minimum(y0.astype(jnp.int32), h - 1)
    c = quad[y0i * w + x0i]  # (..., 4)
    top = c[..., 0] * (1 - fx) + c[..., 1] * fx
    bot = c[..., 2] * (1 - fx) + c[..., 3] * fx
    return top * (1 - fy) + bot * fy


def quad4_rows(img):
    """(H, W) -> (H*W, 4) rows [v(y,x..x+3)] (edge-clamped): a 4-consecutive-
    texel fetch is one row gather (used by the 16-tap PCF, whose 4x4 half-texel
    grid spans at most 4 consecutive texels per axis)."""
    return jnp.stack(
        [img, _edge_shift(img, 0, 1), _edge_shift(img, 0, 2),
         _edge_shift(img, 0, 3)],
        axis=-1,
    ).reshape(-1, 4)
