"""Atlas texture sampling.

The reference binds up to 2048 independent sampled images bindlessly
(resource_manager.h:13, glsl_common.h:105) and lets fragment/ray shaders call
``texture(textures[i], uv)``.  TPUs have no samplers, so all scene textures live in one
packed atlas (core/types.py:TextureAtlas) and sampling is a gather:

    texel = uv_offset[t] + wrap(uv) * uv_scale[t]

with bilinear filtering and REPEAT wrapping done in-kernel.  The gathers vectorize over
whole (H, W) pixel grids and fuse into the surrounding jitted frame function.

NOTE: production frame paths sample through ops/shadetab.sample_atlas4, which
gathers the pre-packed texel-major atlas4 table with the texture scale/offset
already fused into the PrimRow.  This module is the standalone sampler (same
math, per-texture-id scale/offset lookup) used by scene-level tests and any
caller without shade tables.
"""
from __future__ import annotations

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.types import TextureAtlas


def _gather_texel(data, iy, ix):
    """data: (4, AH, AW); iy/ix: (...,) int32 -> (..., 4).

    ONE 4-channel row gather per tap from the texel-major view of the atlas:
    gather cost on TPU is per-INDEX regardless of row width, so a row gather
    beats 4 per-channel 1-D gathers 4x (docs/PERF_STATUS.md rule 4 — the
    round-1 claim that row gathers are slower was a dispatch-latency
    measurement artifact).  The channel→texel-major transpose is shared by
    all four bilinear taps via CSE; production paths avoid it entirely by
    gathering the pre-packed shadetab.atlas4 table."""
    c, ah, aw = data.shape
    rows = data.reshape(c, ah * aw).T  # (AH*AW, 4) texel-major
    lin = iy * aw + ix
    return rows[lin]


def sample_atlas_bilinear(atlas: TextureAtlas, tex_id, uv, fallback=None):
    """Bilinear-sample per-pixel texture ids.

    tex_id: (...,) int32; -1 selects `fallback` (default: ones, so callers can
    multiply).  uv: (..., 2) in texture space (REPEAT wrap, like the default glTF
    sampler the reference uses).  Returns (..., 4) float32.
    """
    from vulkanhybridrenderer_tpu.ops.filters import flat_gather

    safe_id = jnp.maximum(tex_id, 0)
    scale = jnp.stack(
        [flat_gather(atlas.uv_scale[:, c], safe_id) for c in range(2)], axis=-1
    )
    offset = jnp.stack(
        [flat_gather(atlas.uv_offset[:, c], safe_id) for c in range(2)], axis=-1
    )

    # REPEAT wrap in [0,1), then to continuous texel coords with half-texel center.
    u = uv - jnp.floor(uv)
    t = u * scale - 0.5
    t0 = jnp.floor(t)
    f = t - t0  # bilinear weights

    def wrap(i, size):
        # true REPEAT within the tile
        return jnp.remainder(i, jnp.maximum(size, 1.0))

    x0 = wrap(t0[..., 0], scale[..., 0])
    y0 = wrap(t0[..., 1], scale[..., 1])
    x1 = wrap(t0[..., 0] + 1.0, scale[..., 0])
    y1 = wrap(t0[..., 1] + 1.0, scale[..., 1])

    ox = offset[..., 0]
    oy = offset[..., 1]
    ix0 = (ox + x0).astype(jnp.int32)
    ix1 = (ox + x1).astype(jnp.int32)
    iy0 = (oy + y0).astype(jnp.int32)
    iy1 = (oy + y1).astype(jnp.int32)

    d = atlas.data.astype(jnp.float32)
    c00 = _gather_texel(d, iy0, ix0)
    c10 = _gather_texel(d, iy0, ix1)
    c01 = _gather_texel(d, iy1, ix0)
    c11 = _gather_texel(d, iy1, ix1)

    fx = f[..., 0:1]
    fy = f[..., 1:2]
    out = (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )
    if fallback is None:
        fallback = jnp.ones(4, jnp.float32)
    return jnp.where((tex_id >= 0)[..., None], out, fallback)


def sample_or_factor(atlas: TextureAtlas, tex_id, uv, factor):
    """``tex == -1 ? factor : texture(tex, uv)`` -- the pattern of gbuf.frag:20-26."""
    return jnp.where(
        (tex_id >= 0)[..., None],
        sample_atlas_bilinear(atlas, tex_id, uv),
        factor,
    )
