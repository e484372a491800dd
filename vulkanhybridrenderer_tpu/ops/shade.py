"""Per-pixel shading ops shared by the render paths.

forward_shade      -- forward lit pass (forward_raster_render_path/default.frag)
rayquery_shade     -- forward + inline ray-query shadows (rayquery_render_path/default.frag)
Both interpolate *object-space* normals (the reference's forward shaders never apply
a normal matrix -- default.vert:26 passes in_normal straight through; matched for
parity).
"""
from __future__ import annotations

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.types import PerFrameData, SceneBuffers
from vulkanhybridrenderer_tpu.ops import gbuffer as gbuf_ops
from vulkanhybridrenderer_tpu.ops.rasterizer import weights_from_bary
from vulkanhybridrenderer_tpu.utils.math3d import PI_INVERSE, normalize


def resolve_forward_attributes(scene: SceneBuffers, tables, tri_rows, vis):
    """Interpolate the attribute set the forward fragment shaders consume:
    world position, object-space normal (normal-mapped), uv, albedo, validity.

    Uses the fused gather tables (ops/shadetab.py): 1 TriRow (material
    fields folded in) + 1 quad-atlas row per bilinear sample."""
    from vulkanhybridrenderer_tpu.ops import shadetab

    valid = vis.tri_id >= 0
    tri = jnp.maximum(vis.tri_id, 0)
    tr = shadetab.fetch_tri(tri_rows, tri)
    prim = tr["prim"]
    pm = tr  # material fields folded into the TriRow (no prim gather)

    wts = weights_from_bary(vis.bary)
    uv = shadetab.interpolate3(tr["uv0"], wts)
    n_obj = shadetab.interpolate3(tr["normal"], wts)
    tan_obj = shadetab.interpolate3(tr["tangent"], wts)
    pos_world = shadetab.interpolate3(tr["pos"], wts)

    albedo = shadetab.sample_atlas4(
        tables, pm["base_tex"], pm["base_scale"], pm["base_offset"], uv,
        fallback=pm["base_color"],
    )

    # normal mapping, object space (default.frag:62-69; same formula as gbuf.frag);
    # statically skipped when no material has a normal map (saves an atlas sample)
    if scene.has_normal_maps:
        ts = shadetab.sample_atlas4(
            tables, pm["nm_tex"], pm["nm_scale"], pm["nm_offset"], uv
        )[..., :3]
        n = gbuf_ops.apply_normal_map(n_obj, tan_obj, pm["nm_tex"], ts)
    else:
        n = n_obj
    return dict(valid=valid, prim=prim, uv=uv, normal=n, position=pos_world,
                albedo=albedo)


def forward_shade(attrs, pfd: PerFrameData, shadow=None):
    """default.frag:71-85: ambient albedo/pi + albedo * max(N.L, 0) * light_color.

    `shadow` would multiply the diffuse term, but the reference forces shadow = 1.0
    (default.frag:79: ``shadow = 1.0;`` overrides the lookup); pass None for parity.
    Output (4, H, W), linear; background = clear color 0.
    """
    l = -pfd.directional_light.direction[:3]
    light_color = pfd.directional_light.color[:3]
    n_dot_l = jnp.maximum(jnp.sum(attrs["normal"] * l, axis=-1), 0.0)
    s = 1.0 if shadow is None else shadow
    ambient = attrs["albedo"][..., :3] * PI_INVERSE
    diffuse = attrs["albedo"][..., :3] * (n_dot_l * s)[..., None] * light_color
    rgb = jnp.where(attrs["valid"][..., None], ambient + diffuse, 0.0)
    a = jnp.where(attrs["valid"], 1.0, 0.0)
    return jnp.concatenate([rgb, a[..., None]], axis=-1).transpose(2, 0, 1)


def rayquery_shade(attrs, pfd: PerFrameData, in_shadow):
    """rayquery default.frag:71-85: 0.2*albedo + N.L * albedo * light_color * vis.

    in_shadow: (H, W) 1.0 lit / 0.0 occluded from the inline shadow query.
    """
    l = -pfd.directional_light.direction[:3]
    light_color = pfd.directional_light.color[:3]
    n_dot_l = jnp.maximum(jnp.sum(attrs["normal"] * l, axis=-1), 0.0)
    ambient = 0.2 * attrs["albedo"][..., :3]
    diffuse = attrs["albedo"][..., :3] * (n_dot_l * in_shadow)[..., None] * light_color
    rgb = jnp.where(attrs["valid"][..., None], ambient + diffuse, 0.0)
    a = jnp.where(attrs["valid"], 1.0, 0.0)
    return jnp.concatenate([rgb, a[..., None]], axis=-1).transpose(2, 0, 1)
