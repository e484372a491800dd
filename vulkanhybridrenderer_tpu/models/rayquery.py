"""Ray-query render path (reference rayquery_render_path.cpp:11-54).

A forward raster pass whose per-pixel shading casts an inline shadow ray
(rayquery default.frag:36-44): origin = world position, direction = -light dir,
tmin 0.1, tmax 10000, terminate-on-first-hit, opaque-only (the BLAS geometry is
opaque-flagged, resource_manager.cpp:633, and the empty rayQueryProceed loop never
confirms non-opaque candidates -- so no alpha testing here).
Shading: 0.2*albedo ambient + N.L * albedo * light_color * visibility.
"""
from __future__ import annotations

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.graph.render_graph import RENDER_OUTPUT, RenderGraph
from vulkanhybridrenderer_tpu.models.base import RenderPath
from vulkanhybridrenderer_tpu.models.passes import (
    add_bvh_pass,
    add_geometry_pass,
    rasterize_for_path,
)
from vulkanhybridrenderer_tpu.ops import shade, traverse


class RayqueryPath(RenderPath):
    name = "rayquery"

    def register(self, graph: RenderGraph) -> None:
        cfg = self.config
        h, w = cfg.height, cfg.width

        add_geometry_pass(graph)
        add_bvh_pass(graph, cfg.animated)

        def rayquery_pass(res):
            scene = res["scene"]
            pfd = res["pfd"]
            clip = res["Clip"]
            # no alpha discard in the rayquery fragment shader (default.frag)
            vis = rasterize_for_path(scene, clip, w, h, cfg, alpha=False,
                                     mesh=res.get("mesh"))
            attrs = shade.resolve_forward_attributes(
                scene, res["shade_tables"], res["TriRows"], vis
            )

            l_dir = -pfd.directional_light.direction[:3]
            origins = attrs["position"].reshape(-1, 3)
            # parallel shadow rays (flat unions): packet schedule with
            # screen-block strips, like the hybrid shadow wavefront
            from vulkanhybridrenderer_tpu.ops.raygen import padded_block_tiler

            tile, untile, nby, nbx = padded_block_tiler(h, w, 8, 16)
            dirs = jnp.broadcast_to(l_dir, origins.shape)
            strips = nby * nbx if nby * nbx >= 8 else 16
            rec_t = traverse.trace(
                res["BVH"], res["WorldTris"], tile(origins), tile(dirs),
                0.1, tile(jnp.full((h * w,), 10000.0, jnp.float32), fill=-1.0),
                anyhit=True, strips=strips, packets=128,
            )
            hit = untile(rec_t.hit)
            in_shadow = jnp.where(hit, 0.0, 1.0).reshape(h, w)
            img = shade.rayquery_shade(attrs, pfd, in_shadow)
            return {RENDER_OUTPUT: img}

        graph.add_pass(
            "Rayquery Pass",
            rayquery_pass,
            inputs=("scene", "pfd", "Clip", "BVH", "WorldTris", "shade_tables",
                    "TriRows"),
            outputs=(RENDER_OUTPUT,),
        )
