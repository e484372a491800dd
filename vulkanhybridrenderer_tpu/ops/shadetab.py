"""Fused shading tables: the gather layout for per-pixel attribute resolves.

The G-buffer / forward resolves (gbuf.frag:17-59, default.frag:46-85) need
~10 vertex attributes, ~8 material constants and 4-16 atlas texels per pixel.
Issued as separate flat gathers (round 1) that is ~80 gather indices per pixel,
and XLA-on-TPU gather cost is per-INDEX (~11 ns from HBM-resident operands,
~3 ns from VMEM-resident ones) and per-index cost is independent of row width
up to 128 f32 (measured, docs/PERF_STATUS.md).  So the fix is to fuse columns
into rows and gather ROWS:

  * TriRow (T, 40): everything the resolve needs about a triangle's three
    vertices in ONE gather -- world positions, clip w, object-space normals,
    tangents, uv0, primitive id.  Static columns are packed once at scene
    load; the per-frame columns (world position, clip w) are rebuilt in-jit by
    make_tri_rows at triangle count (≪ pixel count) and concatenated.
  * PrimRow (P, 32): material constants + texture ids + each texture's atlas
    scale/offset + the 3x3 normal matrix in one gather.
  * atlas4 (AH*AW, 4): texel-major atlas so one bilinear tap = ONE 4-channel
    row gather instead of 4 per-channel gathers (bilinear = 4 taps total).

Per-pixel gather budget after fusion: 1 TriRow + 1 PrimRow + 4 atlas rows
(+4 per extra texture kind) ≈ 6-14 indices instead of ~80.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

# TriRow column map (keep in sync between build/make/fetch)
_POS = 0  # [0:9)   v0.xyz v1.xyz v2.xyz world position (per-frame)
_CLIPW = 9  # [9:12)  clip-space w per vertex (per-frame)
_NRM = 12  # [12:21) object-space normals
_TAN = 21  # [21:33) tangents xyzw
_UV0 = 33  # [33:39) uv0
_PRIM = 39  # [39]    primitive id
TRI_ROW_W = 40
_N_STATIC = TRI_ROW_W - _NRM

# PrimRow column map
_BASE_COL = 0  # [0:4) base color factor
_BASE_TEX = 4  # [4] texture id, [5:7) uv scale, [7:9) uv offset
_NM_TEX = 9  # [9] id, [10:12) scale, [12:14) offset
_MR_TEX = 14  # [14] id, [15:17) scale, [17:19) offset
_METAL = 19
_ROUGH = 20
_AMASK = 21
_ACUT = 22
_NMAT = 23  # [23:32) 3x3 normal matrix, row-major
PRIM_ROW_W = 32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShadeTables:
    tri_static: Any  # (T, 28) f32 static TriRow columns [12:40)
    prim_rows: Any  # (P, 32) f32
    atlas4: Any  # (AH*AW, 4) f32 texel-major atlas
    atlas_w: int = dataclasses.field(default=1, metadata=dict(static=True))


def _tex_scale_offset(atlas, tex_ids):
    safe = jnp.maximum(tex_ids, 0)
    return atlas.uv_scale[safe], atlas.uv_offset[safe]


def build_shade_tables(scene) -> ShadeTables:
    """One-time (scene load) packing of the static tables."""
    tv = scene.tri_vertex  # (T, 3)
    cols = []
    for j in range(3):
        for c in range(3):
            cols.append(scene.normals[:, c][tv[:, j]])
    for j in range(3):
        for c in range(4):
            cols.append(scene.tangents[:, c][tv[:, j]])
    for j in range(3):
        for c in range(2):
            cols.append(scene.uv0[:, c][tv[:, j]])
    cols.append(scene.tri_prim.astype(jnp.float32))
    tri_static = jnp.stack(cols, axis=-1)
    assert tri_static.shape[1] == _N_STATIC

    m = scene.materials
    atlas = scene.atlas
    bs, bo = _tex_scale_offset(atlas, m.base_color_texture)
    ns, no = _tex_scale_offset(atlas, m.normal_map)
    ms, mo = _tex_scale_offset(atlas, m.metallic_roughness_texture)
    nmat = scene.prim_normal_mat.reshape(-1, 16)
    prim_rows = jnp.concatenate(
        [
            m.base_color,
            m.base_color_texture.astype(jnp.float32)[:, None],
            bs,
            bo,
            m.normal_map.astype(jnp.float32)[:, None],
            ns,
            no,
            m.metallic_roughness_texture.astype(jnp.float32)[:, None],
            ms,
            mo,
            m.metallic_factor[:, None],
            m.roughness_factor[:, None],
            m.alpha_mask.astype(jnp.float32)[:, None],
            m.alpha_cutoff[:, None],
            nmat[:, jnp.array([0, 1, 2, 4, 5, 6, 8, 9, 10])],
        ],
        axis=-1,
    )
    assert prim_rows.shape[1] == PRIM_ROW_W

    data = scene.atlas.data.astype(jnp.float32)  # (4, AH, AW)
    _, ah, aw = data.shape
    atlas4 = data.transpose(1, 2, 0).reshape(ah * aw, 4)
    return ShadeTables(
        tri_static=tri_static, prim_rows=prim_rows, atlas4=atlas4, atlas_w=aw
    )


def make_tri_rows(tables: ShadeTables, scene, world_pos, clip):
    """Per-frame TriRows: gather the dynamic columns at TRIANGLE count (cheap)
    and concat with the static block.  Runs inside the jitted frame."""
    tv = scene.tri_vertex
    cols = []
    for j in range(3):
        for c in range(3):
            cols.append(world_pos[:, c][tv[:, j]])
    w = clip[:, 3]
    for j in range(3):
        cols.append(w[tv[:, j]])
    dyn = jnp.stack(cols, axis=-1)  # (T, 12)
    return jnp.concatenate([dyn, tables.tri_static], axis=-1)  # (T, 40)


def fetch_tri(tri_rows, tri_ids):
    """ONE row gather -> dict of per-pixel vertex-attribute stacks.

    Returns arrays shaped (..., 3, k): slot-major per vertex."""
    row = tri_rows[tri_ids]  # (..., 40)
    s = tri_ids.shape
    return dict(
        pos=row[..., _POS:_POS + 9].reshape(*s, 3, 3),
        clip_w=row[..., _CLIPW:_CLIPW + 3],
        normal=row[..., _NRM:_NRM + 9].reshape(*s, 3, 3),
        tangent=row[..., _TAN:_TAN + 12].reshape(*s, 3, 4),
        uv0=row[..., _UV0:_UV0 + 6].reshape(*s, 3, 2),
        prim=row[..., _PRIM].astype(jnp.int32),
    )


def fetch_prim(prim_rows, prim_ids):
    """ONE row gather -> material/primitive constants per pixel."""
    row = prim_rows[prim_ids]  # (..., 32)
    s = prim_ids.shape
    return dict(
        base_color=row[..., _BASE_COL:_BASE_COL + 4],
        base_tex=row[..., _BASE_TEX].astype(jnp.int32),
        base_scale=row[..., _BASE_TEX + 1:_BASE_TEX + 3],
        base_offset=row[..., _BASE_TEX + 3:_BASE_TEX + 5],
        nm_tex=row[..., _NM_TEX].astype(jnp.int32),
        nm_scale=row[..., _NM_TEX + 1:_NM_TEX + 3],
        nm_offset=row[..., _NM_TEX + 3:_NM_TEX + 5],
        mr_tex=row[..., _MR_TEX].astype(jnp.int32),
        mr_scale=row[..., _MR_TEX + 1:_MR_TEX + 3],
        mr_offset=row[..., _MR_TEX + 3:_MR_TEX + 5],
        metallic=row[..., _METAL],
        roughness=row[..., _ROUGH],
        alpha_mask=row[..., _AMASK],
        alpha_cutoff=row[..., _ACUT],
        normal_mat=row[..., _NMAT:_NMAT + 9].reshape(*s, 3, 3),
    )


def interpolate3(attr, weights):
    """attr (..., 3, k) per-vertex values + (..., 3) weights -> (..., k)."""
    return jnp.sum(attr * weights[..., None], axis=-2)


def fetch_tri_uv(tables: ShadeTables, tri_ids):
    """ONE static-row gather -> per-vertex uv0 (..., 3, 2).  For consumers
    (alpha hit filters) that need uvs without the per-frame TriRows."""
    row = tables.tri_static[tri_ids]  # (..., 28)
    s = tri_ids.shape
    off = _UV0 - _NRM
    return row[..., off:off + 6].reshape(*s, 3, 2)


def sample_atlas4(tables: ShadeTables, tex_id, scale, offset, uv, fallback=None):
    """Bilinear atlas sample = FOUR (AH*AW, 4) row gathers.

    Same math as ops/texture.sample_atlas_bilinear (REPEAT wrap, half-texel
    centers) but with the texture's scale/offset supplied by the caller (from
    the PrimRow) instead of per-texture gathers.  tex_id < 0 -> fallback.
    """
    aw = tables.atlas_w
    u = uv - jnp.floor(uv)
    t = u * scale - 0.5
    t0 = jnp.floor(t)
    f = t - t0

    def wrap(i, size):
        return jnp.remainder(i, jnp.maximum(size, 1.0))

    x0 = wrap(t0[..., 0], scale[..., 0])
    y0 = wrap(t0[..., 1], scale[..., 1])
    x1 = wrap(t0[..., 0] + 1.0, scale[..., 0])
    y1 = wrap(t0[..., 1] + 1.0, scale[..., 1])
    ox = offset[..., 0]
    oy = offset[..., 1]

    def lin(x, y):
        return ((oy + y).astype(jnp.int32) * aw + (ox + x).astype(jnp.int32))

    c00 = tables.atlas4[lin(x0, y0)]
    c10 = tables.atlas4[lin(x1, y0)]
    c01 = tables.atlas4[lin(x0, y1)]
    c11 = tables.atlas4[lin(x1, y1)]
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
