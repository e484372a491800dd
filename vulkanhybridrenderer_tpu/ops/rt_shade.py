"""Ray-hit shading kernels (the closest-hit shaders as batched gather + BRDF math).

reflection_hit  -- hybrid mirror reflections (reflection_hit.rchit:10-72)
primary_hit     -- full-RT path closest hit w/ secondary shadow ray factor
                   (raytraced closesthit.rchit:10-67)
Both fetch triangle attributes by hit barycentrics exactly like the reference
(vertex fetch via primitive/index tables, reflection_hit.rchit:11-24).
"""
from __future__ import annotations

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.types import PerFrameData, SceneBuffers
from vulkanhybridrenderer_tpu.ops import brdf
from vulkanhybridrenderer_tpu.ops.texture import sample_atlas_bilinear, sample_or_factor
from vulkanhybridrenderer_tpu.utils.math3d import PI_INVERSE, normalize


def interpolate_hit_attributes(scene: SceneBuffers, tri, u, v):
    """Barycentric attribute fetch for hit records (safe for tri == -1: caller masks).

    Returns dict(position_object? no -- position in *world* via prim transform,
    normal (object-space interpolated), uv, prim)."""
    t = jnp.maximum(tri, 0)
    # per-column 1-D gathers (row gathers are ~300x slower on TPU)
    v0 = scene.tri_vertex[:, 0][t]
    v1 = scene.tri_vertex[:, 1][t]
    v2 = scene.tri_vertex[:, 2][t]
    prim = scene.tri_prim[t]
    w0 = (1.0 - u - v)[..., None]
    wu = u[..., None]
    wv = v[..., None]

    def lerp(attr):
        k = attr.shape[1]

        def col(idx):
            return jnp.stack([attr[:, c][idx] for c in range(k)], axis=-1)

        return col(v0) * w0 + col(v1) * wu + col(v2) * wv

    pos_obj = lerp(scene.positions)
    nrm = lerp(scene.normals)
    tan = lerp(scene.tangents)
    uv = lerp(scene.uv0)
    mflat = scene.prim_transform.reshape(-1, 16)
    m = jnp.stack([mflat[:, c][prim] for c in range(16)], axis=-1).reshape(-1, 4, 4)
    pos_world = jnp.einsum("rij,rj->ri", m[:, :3, :3], pos_obj) + m[:, :3, 3]
    return dict(prim=prim, uv=uv, normal=nrm, tangent=tan, position=pos_world)


def reflection_hit_shade(scene: SceneBuffers, pfd: PerFrameData, tri, u, v):
    """reflection_hit.rchit:26-71: ambient(PI_INV*0.2) + GGX direct lighting at the
    hit point, no shadowing (the reference's shadow trace is commented out).
    Returns (R, 4) rgba; caller zeroes misses (reflection_miss.rmiss -> 0)."""
    at = interpolate_hit_attributes(scene, tri, u, v)
    mats = scene.materials
    prim = at["prim"]
    albedo = sample_or_factor(
        scene.atlas, mats.base_color_texture[prim], at["uv"], mats.base_color[prim]
    )[..., :3]
    if scene.has_mr_textures:
        mr_tex = mats.metallic_roughness_texture[prim]
        mr = sample_atlas_bilinear(scene.atlas, mr_tex, at["uv"])
        metallic = mats.metallic_factor[prim] * jnp.where(mr_tex >= 0, mr[..., 1], 1.0)
        roughness = mats.roughness_factor[prim] * jnp.where(mr_tex >= 0, mr[..., 2], 1.0)
    else:
        metallic = mats.metallic_factor[prim]
        roughness = mats.roughness_factor[prim]

    cam_pos = pfd.camera_position
    v_dir = normalize(cam_pos - at["position"])
    l = -pfd.directional_light.direction[:3]
    # NOTE: the reference uses the raw interpolated (object-space) normal here
    # (reflection_hit.rchit:18,57) -- matched.
    n = at["normal"]
    lighting = brdf.direct_lighting(
        albedo,
        metallic,
        roughness,
        n,
        v_dir,
        jnp.broadcast_to(l, n.shape),
        pfd.directional_light.color[:3],
        pfd.directional_light.intensity[:3],
        ambient_factor=PI_INVERSE * 0.2,
    )
    return jnp.concatenate([lighting, jnp.ones_like(lighting[..., :1])], axis=-1)


def primary_hit_shade(scene: SceneBuffers, pfd: PerFrameData, tri, u, v, lit,
                      test_alpha: bool = False):
    """raytraced closesthit.rchit:26-67: albedo/pi ambient + (if the secondary shadow
    ray missed) N.L * albedo * intensity * color.  `lit`: (R,) bool (shadow ray miss).
    Includes the object-space normal mapping branch (:37-46).

    test_alpha=True switches to the closesthit_test_alpha.rchit constants: ambient
    0.2*albedo and no intensity factor in the direct term (:39, :46)."""
    at = interpolate_hit_attributes(scene, tri, u, v)
    mats = scene.materials
    prim = at["prim"]
    albedo = sample_or_factor(
        scene.atlas, mats.base_color_texture[prim], at["uv"], mats.base_color[prim]
    )[..., :3]

    nrm = at["normal"]
    if scene.has_normal_maps:
        nm_tex = mats.normal_map[prim]
        has_nm = nm_tex >= 0
        ts_n = normalize(
            sample_atlas_bilinear(scene.atlas, nm_tex, at["uv"])[..., :3] * 2.0 - 1.0
        )
        tan = at["tangent"]
        bitangent = jnp.cross(ts_n, tan[..., :3]) * tan[..., 3:4]
        t_ortho = normalize(
            tan[..., :3] - nrm * jnp.sum(tan[..., :3] * nrm, axis=-1, keepdims=True)
        )
        n_mapped = (
            t_ortho * ts_n[..., :1] + bitangent * ts_n[..., 1:2] + nrm * ts_n[..., 2:3]
        )
        n = jnp.where(has_nm[..., None], n_mapped, nrm)
    else:
        n = nrm

    l = -pfd.directional_light.direction[:3]
    n_dot_l = jnp.maximum(jnp.sum(n * l, axis=-1), 0.0)
    if test_alpha:
        ambient = 0.2 * albedo
        direct = albedo * n_dot_l[..., None] * pfd.directional_light.color[:3]
    else:
        ambient = PI_INVERSE * albedo
        direct = (
            albedo
            * n_dot_l[..., None]
            * pfd.directional_light.intensity[:3]
            * pfd.directional_light.color[:3]
        )
    rgb = ambient + jnp.where(lit[..., None], direct, 0.0)
    return jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1)
