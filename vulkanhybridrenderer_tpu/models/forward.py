"""Forward raster render path (reference forward_raster_render_path.cpp:11-96).

Passes:
  Geometry       -- vertex transforms (world + camera clip + light clip)
  Depth Prepass  -- 4096^2 shadow map from the light (depth-only)
  Forward Pass   -- lit forward shading -> RENDER_OUTPUT

MSAA (forward_raster_render_path.cpp:59: max-sample-count MSAA twin images):
the default "coverage" mode reproduces multisampling's actual semantics —
depth/coverage evaluated per sample at the standard Vulkan sample positions
(sharing one binning pass; ops/rasterizer_tiled.rasterize_scene_msaa) while
shading runs once per covered FRAGMENT, not per sample: per pixel, the
sample-0 fragment plus at most one more distinct fragment are shaded and the
resolve coverage-averages them (>= 3 distinct triangles in one pixel — rare
corner pixels — approximate with the second fragment's color).  The legacy
"supersample" mode rasterizes + shades at k x resolution and box-filters.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.graph.render_graph import RENDER_OUTPUT, RenderGraph
from vulkanhybridrenderer_tpu.models.base import RenderPath
from vulkanhybridrenderer_tpu.models.passes import (
    add_geometry_pass,
    add_shadow_map_pass,
    rasterize_for_path,
)
from vulkanhybridrenderer_tpu.ops import shade


class ForwardRasterPath(RenderPath):
    name = "forward"

    def register(self, graph: RenderGraph) -> None:
        cfg = self.config
        k = max(1, cfg.forward.msaa_samples)
        coverage = (
            cfg.forward.msaa_mode == "coverage" and k > 1
            and cfg.raster == "binned"
        )
        ss = 1 if coverage else max(1, int(math.isqrt(k)))
        w, h = cfg.width * ss, cfg.height * ss

        add_geometry_pass(graph)
        add_shadow_map_pass(graph, cfg.shadow_map_size, cfg)

        def shade_vis(res, vis):
            attrs = shade.resolve_forward_attributes(
                res["scene"], res["shade_tables"], res["TriRows"], vis
            )
            # The reference samples the shadow map but forces shadow = 1.0
            # (default.frag:79); forward_shade(None) reproduces that.
            return shade.forward_shade(attrs, res["pfd"], shadow=None)

        def forward_pass(res):
            scene = res["scene"]
            clip = res["Clip"]
            if coverage:
                from vulkanhybridrenderer_tpu.ops import rasterizer_tiled as rt
                from vulkanhybridrenderer_tpu.ops.rasterizer import (
                    VisibilityBuffer,
                )

                if res.get("mesh") is not None:
                    raise NotImplementedError(
                        "coverage MSAA is single-device; use "
                        "forward.msaa_mode='supersample' on a mesh"
                    )

                vises = rt.rasterize_scene_msaa(
                    scene, clip, w, h, k,
                    alpha=cfg.alpha_raster != "off",
                    cull_backface=cfg.raster_state.cull_mode == "back",
                    tables=res["shade_tables"],
                )
                v0 = vises[0]
                # second fragment: the first sample whose triangle differs
                found = jnp.zeros_like(v0.tri_id, dtype=bool)
                tb, db, bb = v0.tri_id, v0.depth, v0.bary
                for v in vises[1:]:
                    take = ~found & (v.tri_id != v0.tri_id) & (v.tri_id >= 0)
                    tb = jnp.where(take, v.tri_id, tb)
                    db = jnp.where(take, v.depth, db)
                    bb = jnp.where(take[..., None], v.bary, bb)
                    found |= take
                col_a = shade_vis(res, v0)
                col_b = shade_vis(
                    res, VisibilityBuffer(tri_id=tb, depth=db, bary=bb)
                )
                acc = jnp.zeros_like(col_a)
                for v in vises:
                    ci = jnp.where(
                        (v.tri_id == v0.tri_id)[None], col_a, col_b
                    )
                    # uncovered sample over covered sample 0: clear color
                    ci = jnp.where((v.tri_id == -1)[None], 0.0, ci)
                    acc = acc + ci
                return {RENDER_OUTPUT: acc / k}

            vis = rasterize_for_path(scene, clip, w, h, cfg, mesh=res.get("mesh"),
                                     tables=res["shade_tables"])
            img = shade_vis(res, vis)
            if ss > 1:  # supersample resolve: box filter
                c = img.shape[0]
                img = img.reshape(c, cfg.height, ss, cfg.width, ss).mean(axis=(2, 4))
            return {RENDER_OUTPUT: img}

        graph.add_pass(
            "Forward Pass",
            forward_pass,
            inputs=("scene", "pfd", "Clip", "Shadow Map", "shade_tables",
                    "TriRows"),
            outputs=(RENDER_OUTPUT,),
        )
