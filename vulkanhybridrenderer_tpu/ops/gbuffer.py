"""G-buffer resolve: visibility buffer -> full G-buffer.

Implements the fragment-shader side of the hybrid G-buffer pass (gbuf.frag:17-59) as
one batched gather+math op over the whole image: perspective-correct attribute
interpolation, base-color texturing with alpha handling, normal mapping, motion
vectors from previous-frame reprojection, metallic/roughness.

Parity notes (all cited to gbuf.frag):
  * normal mapping happens in *object* space on the interpolated vertex normal and
    tangent, then transforms by the primitive's normal matrix (:33-41);
  * the bitangent is cross(sampled_tangent_space_normal, tangent.xyz) * tangent.w --
    the reference's exact (unusual) formula (:36);
  * metallic multiplies by the G channel and roughness by the B channel of the
    metallic-roughness texture (:51-55) -- note this is swapped relative to the glTF
    spec, kept for pixel parity;
  * motion vector = current pixel uv - previous-frame NDC*0.5+0.5, using the
    *current* model transform with previous view/proj (gbuf.vert:26, frag:44-46);
  * clear values: albedo/normal+oid = 0, motion+mr = (0, 0, -1, -1), depth = 0
    (hybrid_render_path.cpp:16-19).
"""
from __future__ import annotations

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.types import GBuffer, PerFrameData, SceneBuffers
from vulkanhybridrenderer_tpu.ops.geometry import WorldGeometry
from vulkanhybridrenderer_tpu.ops.rasterizer import (VisibilityBuffer,
    weights_from_bary)
from vulkanhybridrenderer_tpu.ops.filters import flat_gather
from vulkanhybridrenderer_tpu.utils.math3d import normalize, transform_points


def perspective_weights(bary2, inv_w3):
    """Screen barycentrics (…, 2) + per-vertex 1/w (…, 3) -> perspective-correct
    weights (…, 3)."""
    l1 = bary2[..., 0]
    l2 = bary2[..., 1]
    l0 = 1.0 - l1 - l2
    pw = jnp.stack([l0, l1, l2], axis=-1) * inv_w3
    return pw / jnp.sum(pw, axis=-1, keepdims=True)


def interpolate(attr_v, vidx, weights):
    """attr_v: (V, K) vertex attribute; vidx: (..., 3); weights: (..., 3) -> (..., K).

    Reference-path helper (tests): production resolves interpolate through the
    fused TriRow gather tables instead (ops/shadetab.py, 1 row gather for all
    three vertices' attributes)."""
    k = attr_v.shape[1]
    out = None
    for j in range(3):
        idx = vidx[..., j]
        a_j = jnp.stack(
            [flat_gather(attr_v[:, c], idx) for c in range(k)], axis=-1
        )
        term = a_j * weights[..., j : j + 1]
        out = term if out is None else out + term
    return out


def make_alpha_frag_mask(scene: SceneBuffers, clip=None, tables=None):
    """Per-fragment alpha kill for the rasterizer (gbuf.frag:27-32): fragments with
    (alpha_mask && a < cutoff) or a == 0 are discarded during depth testing.

    Returns frag_mask_fn(tri_ids (C,), wts (C,H,W,3)) -> keep (C,H,W); `wts` are
    already perspective-correct vertex weights (the 2DH rasterizer provides
    them directly, ops/rasterizer.py).  Sampling goes through the fused atlas4
    row-gather tables (ops/shadetab.py) -- 4 gather indices per bilinear tap
    instead of 16; `tables=None` rebuilds them in-trace (test convenience),
    production callers thread the scene-cached tables."""
    from vulkanhybridrenderer_tpu.ops import shadetab

    if tables is None:
        tables = shadetab.build_shade_tables(scene)

    def frag_mask(tri_ids, wts):
        pm = shadetab.fetch_tri_static(tables, tri_ids)  # ONE row gather
        needs_test = (pm["alpha_mask"] == 1.0) & (pm["base_tex"] >= 0)
        uvv = pm["uv0"]  # (C, 3, 2)
        uv = jnp.einsum("chwk,ckj->chwj", wts, uvv)
        alpha = shadetab.sample_atlas4(
            tables,
            pm["base_tex"][:, None, None],
            pm["base_scale"][:, None, None, :],
            pm["base_offset"][:, None, None, :],
            uv,
        )[..., 3]
        kill = needs_test[:, None, None] & (
            alpha < pm["alpha_cutoff"][:, None, None]
        )
        return ~kill

    return frag_mask


def apply_normal_map(n_obj, tan_obj, nm_tex, ts_rgb):
    """Object-space normal mapping, the reference's exact formulas
    (gbuf.frag:35-41, incl. the unusual bitangent = cross(sampled_n, tangent)
    * tangent.w).  ts_rgb: the sampled normal-map texel rgb."""
    has_nm = nm_tex >= 0
    ts_n = normalize(ts_rgb * 2.0 - 1.0)
    bitangent = jnp.cross(ts_n, tan_obj[..., :3]) * tan_obj[..., 3:4]
    t_ortho = normalize(
        tan_obj[..., :3]
        - n_obj * jnp.sum(tan_obj[..., :3] * n_obj, axis=-1, keepdims=True)
    )
    n_mapped = (
        t_ortho * ts_n[..., 0:1]
        + bitangent * ts_n[..., 1:2]
        + n_obj * ts_n[..., 2:3]
    )
    return jnp.where(has_nm[..., None], n_mapped, n_obj)


def resolve_gbuffer(
    scene: SceneBuffers,
    tables,
    tri_rows,
    vis: VisibilityBuffer,
    pfd: PerFrameData,
) -> GBuffer:
    """vis -> GBuffer (albedo, world normal + object id, motion + metallic/roughness,
    depth).  `tables`/`tri_rows` are the fused gather tables (ops/shadetab.py):
    the whole resolve costs 1 TriRow + 1 PrimRow + 4 atlas-row gathers per pixel
    (+4 per optional normal-map / metallic-roughness texture sample)."""
    from vulkanhybridrenderer_tpu.ops import shadetab

    h, w = vis.tri_id.shape
    valid = vis.tri_id >= 0
    tri = jnp.maximum(vis.tri_id, 0)
    tr = shadetab.fetch_tri(tri_rows, tri)  # ONE row gather
    prim = tr["prim"]
    pm = tr  # material fields are folded into the TriRow (no prim gather)

    wts = weights_from_bary(vis.bary)
    uv = shadetab.interpolate3(tr["uv0"], wts)
    n_obj = shadetab.interpolate3(tr["normal"], wts)
    tan_obj = shadetab.interpolate3(tr["tangent"], wts)
    pos_world = shadetab.interpolate3(tr["pos"], wts)

    # ---- albedo (gbuf.frag:19-33) --------------------------------------------
    albedo = shadetab.sample_atlas4(
        tables, pm["base_tex"], pm["base_scale"], pm["base_offset"], uv,
        fallback=pm["base_color"],
    )

    # ---- normal mapping in object space (gbuf.frag:35-41) ---------------------
    # static skip when NO material has a normal map: saves a full bilinear atlas
    # sample (4 gathers/pixel) that would be where()-discarded anyway
    if scene.has_normal_maps:
        ts = shadetab.sample_atlas4(
            tables, pm["nm_tex"], pm["nm_scale"], pm["nm_offset"], uv
        )[..., :3]
        n_final_obj = apply_normal_map(n_obj, tan_obj, pm["nm_tex"], ts)
    else:
        n_final_obj = n_obj

    n_world = normalize(jnp.einsum("hwij,hwj->hwi", pm["normal_mat"], n_final_obj))

    # ---- motion vectors (gbuf.vert:26, gbuf.frag:43-46) ------------------------
    xx = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) / w
    yy = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) / h
    cur_uv = jnp.concatenate(
        [jnp.broadcast_to(xx, (h, w))[..., None], jnp.broadcast_to(yy, (h, w))[..., None]],
        axis=-1,
    )
    prev_vp = pfd.camera_proj_prev_frame @ pfd.camera_view_prev_frame
    prev_clip = transform_points(prev_vp, pos_world)  # (H, W, 4)
    prev_ndc = prev_clip[..., :2] / prev_clip[..., 3:4]
    motion = cur_uv - (prev_ndc * 0.5 + 0.5)

    # ---- metallic / roughness (gbuf.frag:48-55; G/B swap kept) -----------------
    if scene.has_mr_textures:
        mr = shadetab.sample_atlas4(
            tables, pm["mr_tex"], pm["mr_scale"], pm["mr_offset"], uv
        )
        metallic = pm["metallic"] * jnp.where(pm["mr_tex"] >= 0, mr[..., 1], 1.0)
        roughness = pm["roughness"] * jnp.where(pm["mr_tex"] >= 0, mr[..., 2], 1.0)
    else:
        metallic = pm["metallic"]
        roughness = pm["roughness"]

    # ---- assemble with clear values -------------------------------------------
    v = valid
    vf = v[..., None]
    albedo_out = jnp.where(vf, albedo, 0.0)
    normal_oid = jnp.where(
        vf,
        jnp.concatenate([n_world, prim[..., None].astype(jnp.float32)], axis=-1),
        0.0,
    )
    motion_mr = jnp.where(
        vf,
        jnp.concatenate(
            [motion, metallic[..., None], roughness[..., None]], axis=-1
        ),
        jnp.array([0.0, 0.0, -1.0, -1.0]),
    )
    return GBuffer(
        albedo=albedo_out.transpose(2, 0, 1),
        normal_oid=normal_oid.transpose(2, 0, 1),
        motion_mr=motion_mr.transpose(2, 0, 1),
        depth=vis.depth,
    )
