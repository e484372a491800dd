"""Full ray-traced render path (reference raytraced_render_path.cpp:11-76).

Passes: Geometry -> BVH -> Raytrace Pass (primary rays + closest-hit shading +
secondary shadow rays) -> Composition (blit to RENDER_OUTPUT, composition.frag:14).

Primary ray generation matches raygen.rgen:11-20: origin = view_inverse @ (0,0,0,1),
direction = view_inverse @ normalize(proj_inverse @ (ndc.xy, 1, 1)).xyz, tmin 0.1,
tmax 10000.  Miss -> sky (0.3, 0.8, 0.2, 1.0) (miss.rmiss:7).

The `test_alpha` mode mirrors the any-hit variant pipeline
(raygen_test_alpha/closesthit_test_alpha/shadow_anyhit): NoOpaque rays with the
alpha-test hit filter on BOTH primary and shadow rays, and slightly different
shading constants (ambient 0.2*albedo, no intensity factor --
closesthit_test_alpha.rchit:26-46).
"""
from __future__ import annotations

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.graph.render_graph import RENDER_OUTPUT, RenderGraph
from vulkanhybridrenderer_tpu.models.base import RenderPath
from vulkanhybridrenderer_tpu.models.passes import add_bvh_pass, add_geometry_pass
from vulkanhybridrenderer_tpu.ops import rt_shade, screen, traverse
from vulkanhybridrenderer_tpu.utils.math3d import normalize, transform_directions, transform_points

SKY = jnp.array([0.3, 0.8, 0.2, 1.0], jnp.float32)  # miss.rmiss:7
SHADOW_TMIN = 0.1
TMAX = 10000.0


def primary_rays(pfd, height: int, width: int):
    """raygen.rgen:11-18.  Returns origins (R, 3), directions (R, 3)."""
    uv = screen.pixel_uv_grid(height, width).reshape(-1, 2)
    ndc = uv * 2.0 - 1.0
    target = transform_points(
        pfd.camera_proj_inverse,
        jnp.concatenate([ndc, jnp.ones_like(ndc[:, :1])], axis=-1),
    )
    d_view = normalize(target[:, :3])
    d_world = transform_directions(pfd.camera_view_inverse, d_view)
    origin = pfd.camera_view_inverse[:3, 3]
    return jnp.broadcast_to(origin, d_world.shape), d_world


class RaytracedPath(RenderPath):
    name = "raytraced"

    def register(self, graph: RenderGraph) -> None:
        cfg = self.config
        h, w = cfg.height, cfg.width
        test_alpha = cfg.raytraced.test_alpha

        add_geometry_pass(graph)
        add_bvh_pass(graph, cfg.animated)

        def raytrace_pass(res):
            scene = res["scene"]
            pfd = res["pfd"]
            bvh = res["BVH"]
            tris = res["WorldTris"]
            o, d = primary_rays(pfd, h, w)
            # the any-hit alpha filter only pays off when MASK materials
            # exist — an all-opaque scene gets bit-identical results with
            # the filter compiled out (2 gather idx/candidate saved)
            filt = (
                traverse.make_alpha_hit_filter(scene, res["shade_tables"])
                if test_alpha and scene.has_alpha_mask else None
            )
            # coherent primary closest-hit: tiled PACKET traversal (8x16-pixel
            # packets share one walk, 375 -> 254 ms at 2M rays), strips =
            # screen blocks (each strip pays its own spatially-correlated max
            # walk, see ops/raygen.py); padded tiler -> works at ANY resolution
            from vulkanhybridrenderer_tpu.ops.raygen import padded_block_tiler

            tile, untile, nby, nbx = padded_block_tiler(h, w, 8, 16)
            strips = nby * nbx if nby * nbx >= 8 else 16
            rc = traverse.trace(
                bvh, tris, tile(o), tile(d), 0.1,
                tile(jnp.full((h * w,), TMAX, jnp.float32), fill=-1.0),
                hit_filter=filt, strips=strips, packets=128,
            )
            rec = traverse.HitRecord(
                t=untile(rc.t), tri=untile(rc.tri), u=untile(rc.u),
                v=untile(rc.v),
            )

            at = rt_shade.interpolate_hit_attributes(
                res["shade_tables"], res["TriRows"], rec.tri, rec.u, rec.v
            )
            l_dir = -pfd.directional_light.direction[:3]
            # secondary shadow rays: parallel (flat unions) -> same packet
            # schedule as the hybrid shadow wavefront
            pos = at["position"]
            sh_dir = jnp.broadcast_to(l_dir, pos.shape)
            sc_ = traverse.trace(
                bvh, tris, tile(pos), tile(sh_dir), SHADOW_TMIN,
                tile(jnp.full((h * w,), TMAX, jnp.float32), fill=-1.0),
                anyhit=True, hit_filter=filt, strips=strips, packets=128,
            )
            shadow = traverse.HitRecord(
                t=untile(sc_.t), tri=untile(sc_.tri), u=untile(sc_.u),
                v=untile(sc_.v),
            )
            lit = ~shadow.hit
            shaded = rt_shade.primary_hit_shade(
                scene, res["shade_tables"], res["TriRows"], pfd, rec.tri, rec.u,
                rec.v, lit, test_alpha=test_alpha
            )
            img = jnp.where(rec.hit[:, None], shaded, SKY)
            return {"Raytraced Output": img.reshape(h, w, 4).transpose(2, 0, 1)}

        graph.add_pass(
            "Raytrace Pass",
            raytrace_pass,
            inputs=("scene", "pfd", "BVH", "WorldTris", "shade_tables",
                    "TriRows"),
            outputs=("Raytraced Output",),
        )

        def composition(res):
            return {RENDER_OUTPUT: res["Raytraced Output"]}

        graph.add_pass(
            "Composition", composition, inputs=("Raytraced Output",),
            outputs=(RENDER_OUTPUT,),
        )
