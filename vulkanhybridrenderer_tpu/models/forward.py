"""Forward raster render path (reference forward_raster_render_path.cpp:11-96).

Passes:
  Geometry       -- vertex transforms (world + camera clip + light clip)
  Depth Prepass  -- 4096^2 shadow map from the light (depth-only)
  Forward Pass   -- lit forward shading -> RENDER_OUTPUT

MSAA (forward_raster_render_path.cpp:59: max-sample-count MSAA twin images) is
realized as ordered-grid supersampling: rasterize + shade at k*resolution and box
filter down, the natural TPU equivalent of multisampled attachments + resolve.
"""
from __future__ import annotations

import math

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
        ss = max(1, int(math.isqrt(max(1, cfg.forward.msaa_samples))))
        w, h = cfg.width * ss, cfg.height * ss

        add_geometry_pass(graph)
        add_shadow_map_pass(graph, cfg.shadow_map_size, cfg)

        def forward_pass(res):
            scene = res["scene"]
            pfd = res["pfd"]
            clip = res["Clip"]
            vis = rasterize_for_path(scene, clip, w, h, cfg, mesh=res.get("mesh"),
                                     tables=res["shade_tables"])
            attrs = shade.resolve_forward_attributes(
                scene, res["shade_tables"], res["TriRows"], vis
            )
            # The reference samples the shadow map but forces shadow = 1.0
            # (default.frag:79); forward_shade(None) reproduces that.
            img = shade.forward_shade(attrs, pfd, shadow=None)
            if ss > 1:  # MSAA resolve: box filter the supersampled image
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
