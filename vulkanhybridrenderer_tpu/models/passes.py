"""Shared pass builders used by multiple render paths."""
from __future__ import annotations

from vulkanhybridrenderer_tpu.graph.render_graph import RenderGraph
from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
from vulkanhybridrenderer_tpu.ops import gbuffer, geometry, rasterizer, shadowmap
from vulkanhybridrenderer_tpu.ops import rasterizer_tiled


def rasterize_for_path(scene, clip, width, height, config, alpha: bool = True,
                       mesh=None, tables=None):
    """Rasterizer dispatch per RenderConfig.raster ("binned" Pallas tile kernel vs
    "brute" reference scan), honoring config.raster_state
    (vulkan_pipeline_presets.h:35-78).  Both produce identical
    VisibilityBuffers (tested).  With an active device mesh, rasterization
    runs triangle-sharded with a sort-last composite over ICI
    (parallel/mesh.rasterize_scene_sharded).  `tables`: the scene's cached
    fused shade tables, used by the alpha-mask fragment kill."""
    alpha = alpha and config.alpha_raster != "off"
    rs = config.raster_state
    cull = rs.cull_mode == "back"
    if config.raster == "binned":
        if rs.depth_compare != "greater_equal" or rs.depth_clear != 0.0:
            raise NotImplementedError(
                "the binned kernel implements the reverse-Z greater_equal "
                "preset; use config.raster='brute' for other depth states"
            )
        if mesh is not None and height % mesh.devices.size == 0:
            from vulkanhybridrenderer_tpu.parallel.mesh import (
                rasterize_scene_sharded,
            )

            return rasterize_scene_sharded(
                scene, clip, width, height, mesh, alpha=alpha,
                cull_backface=cull, tables=tables,
            )
        return rasterizer_tiled.rasterize_scene(
            scene, clip, width, height, alpha=alpha, cull_backface=cull,
            tables=tables, alpha_rounds=config.alpha_peel_rounds,
        )
    setup = rasterizer.triangle_setup(clip, scene.tri_vertex, width, height)
    mask_fn = (
        gbuffer.make_alpha_frag_mask(scene, clip, tables=tables)
        if (alpha and scene.has_alpha_mask)
        else None
    )
    return rasterizer.rasterize(
        setup, width, height, frag_mask_fn=mask_fn, cull_backface=cull,
        depth_compare=rs.depth_compare, depth_clear=rs.depth_clear,
    )


def add_geometry_pass(graph: RenderGraph):
    """Vertex transforms: object -> world -> camera/light clip space (the vertex
    shader stage of every raster pass, gbuf.vert / depth_prepass.vert).  Also
    assembles the per-frame TriRow gather table (ops/shadetab.py) the resolve
    passes consume."""
    from vulkanhybridrenderer_tpu.ops import shadetab

    def fn(res):
        scene = res["scene"]
        pfd = res["pfd"]
        world = geometry.to_world(scene, res.get("prim_transform"))
        viewproj = pfd.camera_proj @ pfd.camera_view
        clip = geometry.to_clip(world.position, viewproj)
        clip_light = geometry.to_clip(world.position, pfd.directional_light.projview)
        tris = bvh_ops.world_triangles(world.position, scene.tri_vertex)
        tri_rows = shadetab.make_tri_rows(
            res["shade_tables"], scene, world.position, clip
        )
        return {"World": world, "Clip": clip, "LightClip": clip_light,
                "WorldTris": tris, "TriRows": tri_rows}

    graph.add_pass(
        "Geometry",
        fn,
        inputs=("scene", "pfd", "prim_transform", "shade_tables"),
        outputs=("World", "Clip", "LightClip", "WorldTris", "TriRows"),
    )


def add_shadow_map_pass(graph: RenderGraph, size: int, config=None, chunk: int = 256):
    """Depth-only prepass into the shadow map from the light's view
    (forward_raster_render_path.cpp:13-41 / hybrid_render_path.cpp:60-96).  The
    prepass fragment shader is empty (depth_prepass.frag) -- no alpha testing."""

    def fn(res):
        scene = res["scene"]
        if config is not None and config.raster == "binned":
            vis = rasterize_for_path(
                scene, res["LightClip"], size, size, config, alpha=False,
                mesh=res.get("mesh"),
            )
            return {"Shadow Map": vis.depth}
        return {
            "Shadow Map": shadowmap.render_shadow_map(
                res["LightClip"], scene.tri_vertex, size, chunk=chunk
            )
        }

    graph.add_pass(
        "Depth Prepass", fn, inputs=("scene", "LightClip"), outputs=("Shadow Map",)
    )


def add_bvh_pass(graph: RenderGraph, animated: bool):
    """Acceleration-structure pass.  Static scenes reuse the prebuilt LBVH (the
    reference builds BLAS/TLAS once at scene load, resource_manager.cpp:291-307);
    animated scenes refit the AABBs from this frame's world triangles every frame
    (the analogue of re-running UpdateBLAS on geometry update)."""

    if animated:
        def fn(res):
            from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops

            b = res["bvh"]
            if isinstance(b, bvh8_ops.BVH8):
                return {"BVH": bvh8_ops.refit8(b, res["WorldTris"])}
            return {"BVH": bvh_ops.refit(b, res["WorldTris"])}

        graph.add_pass("BVH Refit", fn, inputs=("bvh", "WorldTris"), outputs=("BVH",))
    else:
        def fn(res):
            return {"BVH": res["bvh"]}

        graph.add_pass("BVH", fn, inputs=("bvh",), outputs=("BVH",))
