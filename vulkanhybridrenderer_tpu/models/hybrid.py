"""Hybrid render path -- the flagship (reference hybrid_render_path.cpp:12-441).

Pass graph (conditionally registered per static settings, like the reference's
RegisterPath branches):

  Geometry -> G-Buffer Pass -> { Shadow Map Pass | Raytrace Pass }
           -> [SSAO Pass -> SSAO Blur] -> [SSR Pass] -> [SVGF Denoise Pass]
           -> Composition Pass -> RENDER_OUTPUT

Defaults mirror hybrid_render_path.h:32-35: RT shadows, AO off, reflections off,
denoise off.
"""
from __future__ import annotations

from vulkanhybridrenderer_tpu.core.config import (
    AmbientOcclusionMode,
    ReflectionMode,
    ShadowMode,
)
from vulkanhybridrenderer_tpu.core.types import GBuffer
from vulkanhybridrenderer_tpu.graph.render_graph import RENDER_OUTPUT, RenderGraph
from vulkanhybridrenderer_tpu.models.base import RenderPath
from vulkanhybridrenderer_tpu.models.passes import (
    add_bvh_pass,
    add_geometry_pass,
    add_shadow_map_pass,
    rasterize_for_path,
)
from vulkanhybridrenderer_tpu.ops import (
    composition as comp_ops,
    gbuffer,
    raygen,
    ssao as ssao_ops,
    ssr as ssr_ops,
    svgf,
)


class HybridPath(RenderPath):
    name = "hybrid"

    @property
    def uses_temporal_state(self) -> bool:  # type: ignore[override]
        return self._denoise_active()

    def _denoise_active(self) -> bool:
        s = self.config.hybrid
        return s.denoise and (
            s.shadow_mode == ShadowMode.RAYTRACED
            or s.ao_mode == AmbientOcclusionMode.RAYTRACED
            or s.reflection_mode == ReflectionMode.RAYTRACED
        )

    def register(self, graph: RenderGraph) -> None:
        cfg = self.config
        s = cfg.hybrid
        h, w = cfg.height, cfg.width
        rt_needed = (
            s.shadow_mode == ShadowMode.RAYTRACED
            or s.ao_mode == AmbientOcclusionMode.RAYTRACED
            or s.reflection_mode == ReflectionMode.RAYTRACED
        )
        denoise = self._denoise_active()

        add_geometry_pass(graph)

        def gbuffer_pass(res):
            scene = res["scene"]
            clip = res["Clip"]
            vis = rasterize_for_path(scene, clip, w, h, cfg, mesh=res.get("mesh"),
                                     tables=res["shade_tables"])
            gb = gbuffer.resolve_gbuffer(
                scene, res["shade_tables"], res["TriRows"], vis, res["pfd"]
            )
            return {
                "Albedo": gb.albedo,
                "World Space Normals and Object IDs": gb.normal_oid,
                "Motion Vectors and Metallic Roughness": gb.motion_mr,
                "Depth": gb.depth,
            }

        graph.add_pass(
            "G-Buffer Pass",
            gbuffer_pass,
            inputs=("scene", "pfd", "Clip", "shade_tables", "TriRows"),
            outputs=(
                "Albedo",
                "World Space Normals and Object IDs",
                "Motion Vectors and Metallic Roughness",
                "Depth",
            ),
        )

        comp_inputs = [
            "pfd",
            "Albedo",
            "World Space Normals and Object IDs",
            "Motion Vectors and Metallic Roughness",
            "Depth",
        ]
        comp_kwargs_resources = {}

        if s.shadow_mode == ShadowMode.RASTERIZED:
            add_shadow_map_pass(graph, cfg.shadow_map_size, cfg)
            comp_inputs.append("Shadow Map")
            comp_kwargs_resources["shadow_map"] = "Shadow Map"

        # half-res RT (rt_scale > 1): trace on a downsampled G-buffer, then
        # joint-bilaterally upsample the (denoised) results before composition
        # (ops/upsample.py).  SVGF runs at trace resolution — denoising before
        # upsampling is the standard ordering (variance is a trace-domain
        # quantity) and makes the a-trous cost drop with the ray count.
        rs = max(1, int(getattr(s, "rt_scale", 1)))
        rt_half = rt_needed and rs > 1
        if rt_half:
            from vulkanhybridrenderer_tpu.ops import upsample as upsample_ops

            def rt_down_pass(res):
                return {
                    "RT Depth": upsample_ops.downsample_nearest(
                        res["Depth"], rs
                    ),
                    "RT Normals": upsample_ops.downsample_nearest(
                        res["World Space Normals and Object IDs"], rs
                    ),
                    "RT Motion": upsample_ops.downsample_nearest(
                        res["Motion Vectors and Metallic Roughness"], rs
                    ),
                }

            graph.add_pass(
                "RT Downsample Pass",
                rt_down_pass,
                inputs=(
                    "Depth",
                    "World Space Normals and Object IDs",
                    "Motion Vectors and Metallic Roughness",
                ),
                outputs=("RT Depth", "RT Normals", "RT Motion"),
            )
        rt_depth_res = "RT Depth" if rt_half else "Depth"
        rt_normal_res = (
            "RT Normals" if rt_half else "World Space Normals and Object IDs"
        )
        rt_motion_res = (
            "RT Motion" if rt_half
            else "Motion Vectors and Metallic Roughness"
        )

        if rt_needed:
            use_grid = (
                cfg.shadow_accel == "grid"
                and s.shadow_mode == ShadowMode.RAYTRACED
            )
            # the BVH is only consumed by the AO/reflection traces and by the
            # shadow trace when it is NOT served by the grid — with grid-only
            # shadows, skip the build/refit pass entirely (the grid's
            # build-cost advantage is the point of choosing it)
            bvh_needed = (
                s.ao_mode == AmbientOcclusionMode.RAYTRACED
                or s.reflection_mode == ReflectionMode.RAYTRACED
                or (s.shadow_mode == ShadowMode.RAYTRACED and not use_grid)
            )
            if bvh_needed:
                add_bvh_pass(graph, cfg.animated)
            rt_inputs = [
                "scene",
                "shade_tables",
                "TriRows",
                "pfd",
                "WorldTris",
                rt_depth_res,
                rt_normal_res,
            ]
            if bvh_needed:
                rt_inputs.append("BVH")
            if use_grid:
                # alternative shadow AS: light-space grid.  Prebuilt host-side
                # (renderer._get_shadow_grid, like the BVH); animated scenes
                # rebuild it in-frame from this frame's world triangles at the
                # same static resolution (cheap sort-based binning -- the
                # analogue of the BVH Refit pass).
                if cfg.animated:
                    def grid_pass(res):
                        from vulkanhybridrenderer_tpu.ops import shadowgrid

                        return {
                            "ShadowGrid": shadowgrid.build_shadow_grid(
                                res["WorldTris"],
                                res["pfd"].directional_light.direction[:3],
                                grid=res["shadow_grid"].grid,
                            )
                        }
                else:
                    def grid_pass(res):
                        return {"ShadowGrid": res["shadow_grid"]}

                graph.add_pass(
                    "Shadow Grid Build",
                    grid_pass,
                    inputs=("WorldTris", "pfd", "shadow_grid"),
                    outputs=("ShadowGrid",),
                )
                rt_inputs.append("ShadowGrid")

            def raytrace_pass(res):
                shadow_ao, refl = raygen.hybrid_raytrace(
                    res["scene"],
                    res["shade_tables"],
                    res["TriRows"],
                    res.get("BVH"),
                    res["WorldTris"],
                    res["pfd"],
                    res[rt_depth_res],
                    res[rt_normal_res],
                    ao_rays=cfg.ao_rays,
                    settings=s,
                    shadow_grid=res.get("ShadowGrid"),
                    mesh=res.get("mesh"),
                )
                return {
                    "Raytraced Shadows and Ambient Occlusion": shadow_ao,
                    "Raytraced Reflections": refl,
                }

            graph.add_pass(
                "Raytrace Pass",
                raytrace_pass,
                inputs=tuple(rt_inputs),
                outputs=(
                    "Raytraced Shadows and Ambient Occlusion",
                    "Raytraced Reflections",
                ),
            )
            # (composition wiring for RT reflections happens after the
            # optional RT Upsample Pass below, which may rename the resource)

        if s.ao_mode == AmbientOcclusionMode.SSAO:
            def ssao_pass(res):
                return {
                    "Screen Space Ambient Occlusion Raw": ssao_ops.ssao(
                        res["pfd"],
                        res["Depth"],
                        res["World Space Normals and Object IDs"],
                        radius=s.ssao.radius,
                    )
                }

            def ssao_blur_pass(res):
                return {
                    "Screen Space Ambient Occlusion": ssao_ops.ssao_blur(
                        res["Screen Space Ambient Occlusion Raw"]
                    )
                }

            graph.add_pass(
                "SSAO Pass",
                ssao_pass,
                inputs=("pfd", "Depth", "World Space Normals and Object IDs"),
                outputs=("Screen Space Ambient Occlusion Raw",),
            )
            graph.add_pass(
                "SSAO Blur Pass",
                ssao_blur_pass,
                inputs=("Screen Space Ambient Occlusion Raw",),
                outputs=("Screen Space Ambient Occlusion",),
            )
            comp_inputs.append("Screen Space Ambient Occlusion")
            comp_kwargs_resources["ssao_tex"] = "Screen Space Ambient Occlusion"

        if s.reflection_mode == ReflectionMode.SSR:
            def ssr_pass(res):
                return {
                    "Screen Space Reflections": ssr_ops.ssr(
                        res["pfd"],
                        res["Depth"],
                        res["World Space Normals and Object IDs"],
                        res["Albedo"],
                        res["Motion Vectors and Metallic Roughness"],
                        s.ssr,
                    )
                }

            graph.add_pass(
                "SSR Pass",
                ssr_pass,
                inputs=(
                    "pfd",
                    "Depth",
                    "World Space Normals and Object IDs",
                    "Albedo",
                    "Motion Vectors and Metallic Roughness",
                ),
                outputs=("Screen Space Reflections",),
            )
            comp_inputs.append("Screen Space Reflections")
            comp_kwargs_resources["ssr_tex"] = "Screen Space Reflections"

        rt_shadow_ao_resource = "Raytraced Shadows and Ambient Occlusion"
        rt_refl_resource = "Raytraced Reflections"
        if denoise:
            def svgf_pass(res):
                denoised, new_state = svgf.denoise(
                    res[rt_normal_res],
                    res[rt_motion_res],
                    res["Raytraced Shadows and Ambient Occlusion"],
                    res["temporal_state"],
                )
                return {
                    "Denoised Raytraced Shadows and Ambient Occlusion": denoised,
                    "TemporalStateOut": new_state,
                }

            graph.add_pass(
                "SVGF Denoise Pass",
                svgf_pass,
                inputs=(
                    rt_normal_res,
                    rt_motion_res,
                    "Raytraced Shadows and Ambient Occlusion",
                    "temporal_state",
                ),
                outputs=(
                    "Denoised Raytraced Shadows and Ambient Occlusion",
                    "TemporalStateOut",
                ),
            )
            rt_shadow_ao_resource = "Denoised Raytraced Shadows and Ambient Occlusion"

        if rt_half:
            up_src = rt_shadow_ao_resource  # bind NOW (renamed just below)

            def rt_up_pass(res):
                up = lambda lo: upsample_ops.joint_bilateral_upsample(
                    lo, rs, res["Depth"],
                    res["World Space Normals and Object IDs"],
                    res["RT Depth"], res["RT Normals"],
                )
                out = {
                    "Upsampled Raytraced Shadows and Ambient Occlusion": up(
                        res[up_src]
                    )
                }
                if s.reflection_mode == ReflectionMode.RAYTRACED:
                    out["Upsampled Raytraced Reflections"] = up(
                        res["Raytraced Reflections"]
                    )
                return out

            up_outputs = ["Upsampled Raytraced Shadows and Ambient Occlusion"]
            up_inputs = [
                rt_shadow_ao_resource, "Depth",
                "World Space Normals and Object IDs", "RT Depth", "RT Normals",
            ]
            if s.reflection_mode == ReflectionMode.RAYTRACED:
                up_outputs.append("Upsampled Raytraced Reflections")
                up_inputs.append("Raytraced Reflections")
            graph.add_pass(
                "RT Upsample Pass",
                rt_up_pass,
                inputs=tuple(up_inputs),
                outputs=tuple(up_outputs),
            )
            rt_shadow_ao_resource = (
                "Upsampled Raytraced Shadows and Ambient Occlusion"
            )
            rt_refl_resource = "Upsampled Raytraced Reflections"

        if rt_needed:
            comp_inputs.append(rt_shadow_ao_resource)
            comp_kwargs_resources["rt_shadow_ao"] = rt_shadow_ao_resource
            if s.reflection_mode == ReflectionMode.RAYTRACED:
                comp_inputs.append(rt_refl_resource)
                comp_kwargs_resources["rt_reflections"] = rt_refl_resource

        def composition_pass(res):
            gb = GBuffer(
                albedo=res["Albedo"],
                normal_oid=res["World Space Normals and Object IDs"],
                motion_mr=res["Motion Vectors and Metallic Roughness"],
                depth=res["Depth"],
            )
            kwargs = {k: res[v] for k, v in comp_kwargs_resources.items()}
            return {RENDER_OUTPUT: comp_ops.compose(gb, res["pfd"], s, **kwargs)}

        # When denoising, "TemporalStateOut" is produced by the SVGF pass (which is
        # on the RENDER_OUTPUT dependency chain) and returned via make_frame_fn's
        # keep set -- no extra wiring needed here.
        graph.add_pass(
            "Composition Pass",
            composition_pass,
            inputs=tuple(comp_inputs),
            outputs=(RENDER_OUTPUT,),
        )
