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
from vulkanhybridrenderer_tpu.utils.math3d import PI_INVERSE, normalize


def interpolate_hit_attributes(tables, tri_rows, tri, u, v):
    """Barycentric attribute fetch for hit records (safe for tri == -1: caller
    masks).  One TriRow gather per hit (ops/shadetab.py); world position is the
    barycentric blend of the row's world-space vertices (affine transforms
    commute with convex combinations, so this equals transforming the
    interpolated object-space position like reflection_hit.rchit:20-24).

    Returns dict(prim, uv, normal (object-space), tangent, position (world),
    pm (the PrimRow material constants))."""
    from vulkanhybridrenderer_tpu.ops import shadetab

    t = jnp.maximum(tri, 0)
    tr = shadetab.fetch_tri(tri_rows, t)
    wts = jnp.stack([1.0 - u - v, u, v], axis=-1)
    pm = tr  # material fields folded into the TriRow (no prim gather)
    return dict(
        prim=tr["prim"],
        uv=shadetab.interpolate3(tr["uv0"], wts),
        normal=shadetab.interpolate3(tr["normal"], wts),
        tangent=shadetab.interpolate3(tr["tangent"], wts),
        position=shadetab.interpolate3(tr["pos"], wts),
        pm=pm,
    )


def reflection_hit_shade(scene: SceneBuffers, tables, tri_rows, pfd: PerFrameData,
                         tri, u, v):
    """reflection_hit.rchit:26-71: ambient(PI_INV*0.2) + GGX direct lighting at the
    hit point, no shadowing (the reference's shadow trace is commented out).
    Returns (R, 4) rgba; caller zeroes misses (reflection_miss.rmiss -> 0)."""
    from vulkanhybridrenderer_tpu.ops import shadetab

    at = interpolate_hit_attributes(tables, tri_rows, tri, u, v)
    pm = at["pm"]
    albedo = shadetab.sample_atlas4(
        tables, pm["base_tex"], pm["base_scale"], pm["base_offset"], at["uv"],
        fallback=pm["base_color"],
    )[..., :3]
    if scene.has_mr_textures:
        mr = shadetab.sample_atlas4(
            tables, pm["mr_tex"], pm["mr_scale"], pm["mr_offset"], at["uv"]
        )
        metallic = pm["metallic"] * jnp.where(pm["mr_tex"] >= 0, mr[..., 1], 1.0)
        roughness = pm["roughness"] * jnp.where(pm["mr_tex"] >= 0, mr[..., 2], 1.0)
    else:
        metallic = pm["metallic"]
        roughness = pm["roughness"]

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


def primary_hit_shade(scene: SceneBuffers, tables, tri_rows, pfd: PerFrameData,
                      tri, u, v, lit, test_alpha: bool = False):
    """raytraced closesthit.rchit:26-67: albedo/pi ambient + (if the secondary shadow
    ray missed) N.L * albedo * intensity * color.  `lit`: (R,) bool (shadow ray miss).
    Includes the object-space normal mapping branch (:37-46).

    test_alpha=True switches to the closesthit_test_alpha.rchit constants: ambient
    0.2*albedo and no intensity factor in the direct term (:39, :46)."""
    from vulkanhybridrenderer_tpu.ops import shadetab
    from vulkanhybridrenderer_tpu.ops.gbuffer import apply_normal_map

    at = interpolate_hit_attributes(tables, tri_rows, tri, u, v)
    pm = at["pm"]
    albedo = shadetab.sample_atlas4(
        tables, pm["base_tex"], pm["base_scale"], pm["base_offset"], at["uv"],
        fallback=pm["base_color"],
    )[..., :3]

    nrm = at["normal"]
    if scene.has_normal_maps:
        ts = shadetab.sample_atlas4(
            tables, pm["nm_tex"], pm["nm_scale"], pm["nm_offset"], at["uv"]
        )[..., :3]
        n = apply_normal_map(nrm, at["tangent"], pm["nm_tex"], ts)
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
