"""Fused shading tables: the gather layout for per-pixel attribute resolves.

The G-buffer / forward resolves (gbuf.frag:17-59, default.frag:46-85) need
~10 vertex attributes, ~8 material constants and 4-16 atlas texels per pixel.
Issued as separate flat gathers (round 1) that is ~80 gather indices per pixel,
and XLA-on-TPU gather cost is per-INDEX (~11 ns from HBM-resident operands,
~3 ns from VMEM-resident ones) and per-index cost is independent of row width
up to 128 f32 (measured, docs/PERF_STATUS.md).  So the fix is to fuse columns
into rows and gather ROWS:

  * TriRow (T, 72): everything the resolve needs about a triangle in ONE
    gather -- the three vertices' world positions, clip w, object-space
    normals, tangents, uv0, plus the owning PRIMITIVE'S whole material row
    (folded in at build time, so the resolve never pays a second per-pixel
    prim gather).  Static columns are packed once at scene load; the
    per-frame columns (world position, clip w) are rebuilt in-jit by
    make_tri_rows at triangle count (<< pixel count) and concatenated.
  * PrimRow (P, 32): the material row by primitive id, kept for consumers
    that have a prim id but no triangle (compat/tests).
  * atlas_q (AH*AW, 16): quad-packed texel-major atlas -- row t holds texel
    t's whole 2x2 bilinear footprint (self, +x, +y, +xy neighbors x 4
    channels), so one bilinear tap = ONE row gather instead of 4.  Wrap
    correctness comes from the atlas packer's per-texture 1-texel wrap
    border (scene/atlas.py), which makes atlas-space +1 the REPEAT-wrap
    neighbor; the table is then just 4 whole-atlas rolls (jnp-only, safe to
    build in-trace).

Per-pixel gather budget after fusion (round 5): 1 TriRow + 1 atlas row per
bilinear sample = 2-4 indices instead of ~80 (round 1) / 6-14 (rounds 2-4:
separate prim row + 4 rows per bilinear tap; measured 121 ms of the 1080p
G-buffer, scripts/bench_resolve_gathers.py -- gather cost is flat in row
WIDTH, so fusing more columns per row is free while every dropped index is
~4.4-12 ns/pixel back).
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
_PMAT = 40  # [40:72) the owning primitive's PrimRow, folded in
TRI_ROW_W = 72
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
    tri_static: Any  # (T, 60) f32 static TriRow columns [12:72)
    prim_rows: Any  # (P, 32) f32
    atlas_q: Any  # (AH*AW, 16) f32 quad-packed texel-major atlas
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

    # fold each triangle's material row into its TriRow (one load-time gather
    # at triangle count saves one per-PIXEL gather every resolve)
    tri_static = jnp.concatenate(
        [jnp.stack(cols, axis=-1), prim_rows[scene.tri_prim]], axis=-1
    )
    assert tri_static.shape[1] == _N_STATIC

    data = scene.atlas.data.astype(jnp.float32)  # (4, AH, AW)
    _, ah, aw = data.shape
    base = data.transpose(1, 2, 0)  # (AH, AW, 4)
    # quad rows via whole-atlas rolls: correct because the packer stores a
    # 1-texel wrap border per texture (scene/atlas.py), so +1 in atlas space
    # IS the REPEAT neighbor for every interior texel, and interior texels
    # never sit on the atlas' last row/column (the border is inside).
    right = jnp.roll(base, -1, axis=1)
    down = jnp.roll(base, -1, axis=0)
    diag = jnp.roll(right, -1, axis=0)
    atlas_q = jnp.concatenate([base, right, down, diag], axis=-1).reshape(
        ah * aw, 16
    )
    return ShadeTables(
        tri_static=tri_static, prim_rows=prim_rows, atlas_q=atlas_q,
        atlas_w=aw,
    )


def make_tri_rows(tables: ShadeTables, scene, world_pos, clip):
    """Per-frame TriRows: gather the dynamic columns at TRIANGLE count (cheap)
    and concat with the static block.  Runs inside the jitted frame.

    ONE (V, 4) row gather at 3T indices (positions + clip w fused per
    vertex) instead of 12 per-column flat gathers — same per-index rule as
    world_triangles."""
    tv = scene.tri_vertex
    t = tv.shape[0]
    posw = jnp.concatenate([world_pos, clip[:, 3:4]], axis=-1)  # (V, 4)
    rows = posw[tv.reshape(-1)].reshape(t, 3, 4)
    dyn = jnp.concatenate(
        [rows[..., :3].reshape(t, 9), rows[..., 3]], axis=-1
    )  # (T, 12): v0.xyz v1.xyz v2.xyz, then w per vertex
    return jnp.concatenate([dyn, tables.tri_static], axis=-1)  # (T, 72)


def _prim_fields(row, base):
    """Decode a PrimRow block starting at column `base` of `row`."""
    s = row.shape[:-1]
    return dict(
        base_color=row[..., base + _BASE_COL:base + _BASE_COL + 4],
        base_tex=row[..., base + _BASE_TEX].astype(jnp.int32),
        base_scale=row[..., base + _BASE_TEX + 1:base + _BASE_TEX + 3],
        base_offset=row[..., base + _BASE_TEX + 3:base + _BASE_TEX + 5],
        nm_tex=row[..., base + _NM_TEX].astype(jnp.int32),
        nm_scale=row[..., base + _NM_TEX + 1:base + _NM_TEX + 3],
        nm_offset=row[..., base + _NM_TEX + 3:base + _NM_TEX + 5],
        mr_tex=row[..., base + _MR_TEX].astype(jnp.int32),
        mr_scale=row[..., base + _MR_TEX + 1:base + _MR_TEX + 3],
        mr_offset=row[..., base + _MR_TEX + 3:base + _MR_TEX + 5],
        metallic=row[..., base + _METAL],
        roughness=row[..., base + _ROUGH],
        alpha_mask=row[..., base + _AMASK],
        alpha_cutoff=row[..., base + _ACUT],
        normal_mat=row[..., base + _NMAT:base + _NMAT + 9].reshape(*s, 3, 3),
    )


def fetch_tri(tri_rows, tri_ids):
    """ONE row gather -> per-pixel vertex attributes AND the material fields
    of the owning primitive (folded into the row at build time).

    Vertex attributes are shaped (..., 3, k): slot-major per vertex."""
    row = tri_rows[tri_ids]  # (..., 72)
    s = tri_ids.shape
    out = dict(
        pos=row[..., _POS:_POS + 9].reshape(*s, 3, 3),
        clip_w=row[..., _CLIPW:_CLIPW + 3],
        normal=row[..., _NRM:_NRM + 9].reshape(*s, 3, 3),
        tangent=row[..., _TAN:_TAN + 12].reshape(*s, 3, 4),
        uv0=row[..., _UV0:_UV0 + 6].reshape(*s, 3, 2),
        prim=row[..., _PRIM].astype(jnp.int32),
    )
    out.update(_prim_fields(row, _PMAT))
    return out


def fetch_prim(prim_rows, prim_ids):
    """ONE row gather -> material/primitive constants per pixel (compat path
    for consumers holding a prim id without a TriRow)."""
    return _prim_fields(prim_rows[prim_ids], 0)


def interpolate3(attr, weights):
    """attr (..., 3, k) per-vertex values + (..., 3) weights -> (..., k)."""
    return jnp.sum(attr * weights[..., None], axis=-2)


def fetch_tri_static(tables: ShadeTables, tri_ids):
    """ONE static-row gather -> per-vertex uv0 (..., 3, 2) plus the owning
    primitive's material fields.  For consumers (alpha hit filters, fragment
    alpha kill) that need uvs + alpha material data without the per-frame
    TriRows: 1 gather where round 4 paid 3 (prim id + prim row + uv row)."""
    row = tables.tri_static[tri_ids]  # (..., 60)
    s = tri_ids.shape
    off = _UV0 - _NRM
    out = dict(uv0=row[..., off:off + 6].reshape(*s, 3, 2))
    out.update(_prim_fields(row, _PMAT - _NRM))
    return out


def fetch_tri_uv(tables: ShadeTables, tri_ids):
    """ONE static-row gather -> per-vertex uv0 (..., 3, 2)."""
    return fetch_tri_static(tables, tri_ids)["uv0"]


def sample_atlas4(tables: ShadeTables, tex_id, scale, offset, uv, fallback=None):
    """Bilinear atlas sample = ONE (AH*AW, 16) quad-row gather.

    Same math as ops/texture.sample_atlas_bilinear (REPEAT wrap, half-texel
    centers) with the texture's scale/offset supplied by the caller (from the
    TriRow/PrimRow).  The +1-neighbor texels come packed in the gathered quad
    row (wrap-correct via the packer's border, see build_shade_tables).
    tex_id < 0 -> fallback."""
    aw = tables.atlas_w
    u = uv - jnp.floor(uv)
    t = u * scale - 0.5
    t0 = jnp.floor(t)
    f = t - t0

    def wrap(i, size):
        return jnp.remainder(i, jnp.maximum(size, 1.0))

    x0 = wrap(t0[..., 0], scale[..., 0])
    y0 = wrap(t0[..., 1], scale[..., 1])
    lin = (
        (offset[..., 1] + y0).astype(jnp.int32) * aw
        + (offset[..., 0] + x0).astype(jnp.int32)
    )
    q = tables.atlas_q[lin]  # (..., 16) — THE gather
    c00 = q[..., 0:4]
    c10 = q[..., 4:8]
    c01 = q[..., 8:12]
    c11 = q[..., 12:16]
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
