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
from vulkanhybridrenderer_tpu.ops.filters import flat_gather
from vulkanhybridrenderer_tpu.ops.texture import sample_atlas_bilinear, sample_or_factor
from vulkanhybridrenderer_tpu.utils.math3d import PI_INVERSE, normalize


def resolve_forward_attributes(scene: SceneBuffers, world, clip, vis):
    """Interpolate the attribute set the forward fragment shaders consume:
    world position, object-space normal (normal-mapped), uv, albedo, validity."""
    valid = vis.tri_id >= 0
    tri = jnp.maximum(vis.tri_id, 0)
    vidx = jnp.stack(
        [flat_gather(scene.tri_vertex[:, j], tri) for j in range(3)], axis=-1
    )
    prim = flat_gather(scene.tri_prim, tri)
    mats = scene.materials

    clip_w = clip[:, 3]
    inv_w = 1.0 / jnp.maximum(
        jnp.stack(
            [flat_gather(clip_w, vidx[..., j]) for j in range(3)], axis=-1
        ),
        1e-9,
    )
    wts = gbuf_ops.perspective_weights(vis.bary, inv_w)
    uv = gbuf_ops.interpolate(scene.uv0, vidx, wts)
    n_obj = gbuf_ops.interpolate(scene.normals, vidx, wts)
    tan_obj = gbuf_ops.interpolate(scene.tangents, vidx, wts)
    pos_world = gbuf_ops.interpolate(world.position, vidx, wts)

    base_col = jnp.stack(
        [flat_gather(mats.base_color[:, c], prim) for c in range(4)], axis=-1
    )
    albedo = sample_or_factor(
        scene.atlas, flat_gather(mats.base_color_texture, prim), uv, base_col
    )

    # normal mapping, object space (default.frag:62-69; same formula as gbuf.frag);
    # statically skipped when no material has a normal map (saves an atlas sample)
    if scene.has_normal_maps:
        nm_tex = flat_gather(mats.normal_map, prim)
        has_nm = nm_tex >= 0
        ts_n = normalize(
            sample_atlas_bilinear(scene.atlas, nm_tex, uv)[..., :3] * 2.0 - 1.0
        )
        bitangent = jnp.cross(ts_n, tan_obj[..., :3]) * tan_obj[..., 3:4]
        t_ortho = normalize(
            tan_obj[..., :3]
            - n_obj * jnp.sum(tan_obj[..., :3] * n_obj, axis=-1, keepdims=True)
        )
        n_mapped = (
            t_ortho * ts_n[..., 0:1] + bitangent * ts_n[..., 1:2] + n_obj * ts_n[..., 2:3]
        )
        n = jnp.where(has_nm[..., None], n_mapped, n_obj)
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
