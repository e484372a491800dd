"""Intra-pass attribution of the full-hybrid Raytrace Pass on the TPU.

ATTR_full_s1.json says Raytrace Pass = 761.6 ms, but the three wavefront
sweeps (bench_trace_real.py) only account for shadow 70 + AO 402 + refl 186
= 658 ms — ~100 ms of the pass is unattributed (wavefront prep, RNG/dirs,
reflection hit shading, output assembly).  This script times hybrid_raytrace
end-to-end under every feature-gate combination off ONE fixed G-buffer;
differences attribute each wavefront INCLUSIVE of its shading, and the
all-off row is the prep/assembly floor.

Run: python scripts/attr_raytrace.py [rt_scale] [scene]
(scene: sponza | realglb | bistro; realglb = the flagship's GLB-loader asset,
whose 24.9 MB BVH8 table gathers at the HBM rate)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def timeit(fn, iters=3):
    sync(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
    return best


def main():
    from vulkanhybridrenderer_tpu.core.config import (
        AmbientOcclusionMode, HybridSettings, ReflectionMode, RenderConfig,
        ShadowMode,
    )
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import geometry, raygen
    from vulkanhybridrenderer_tpu.ops.shadetab import build_shade_tables
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    scene_name = sys.argv[2] if len(sys.argv) > 2 else "sponza"
    import os
    h = int(os.environ.get("H", 1080)); w = int(os.environ.get("W", 1920))
    if scene_name == "realglb":
        from vulkanhybridrenderer_tpu.scene import gltf, sample_asset

        glb = "/tmp/vhr_sponza_class.glb"
        if not os.path.exists(glb):
            sample_asset.build_sponza_class_glb(glb)
        sc = gltf.load_scene(glb)
    elif scene_name == "bistro":
        sc = procedural.bistro_proxy()
    else:
        sc = procedural.sponza_proxy()
    cfg = RenderConfig(width=w, height=h, alpha_raster="off",
                       hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED))
    r = Renderer(sc, cfg, path="hybrid")
    pfd = r._make_pfd()
    depth, normal_oid = r.fetch_resource(
        "Depth", "World Space Normals and Object IDs"
    )
    sync(depth)
    scene = r.scene.buffers
    tables = build_shade_tables(scene)
    bvh = r._get_bvh()
    world = geometry.to_world(scene, None)
    tris = bvh_ops.world_triangles(world.position, scene.tri_vertex)
    from vulkanhybridrenderer_tpu.ops.shadetab import make_tri_rows
    viewproj = pfd.camera_proj @ pfd.camera_view
    clip = geometry.to_clip(world.position, viewproj)
    tri_rows = make_tri_rows(tables, scene, world.position, clip)

    combos = [
        ("none (prep/assembly floor)", 0, 0, 0),
        ("shadow only", 1, 0, 0),
        ("ao only", 0, 1, 0),
        ("refl only", 0, 0, 1),
        ("shadow+ao", 1, 1, 0),
        ("full (shadow+ao+refl)", 1, 1, 1),
    ]
    results = {}
    for label, s, a, rf in combos:
        hs = HybridSettings(
            shadow_mode=ShadowMode.RAYTRACED if s else ShadowMode.RASTERIZED,
            ao_mode=(AmbientOcclusionMode.RAYTRACED if a
                     else AmbientOcclusionMode.OFF),
            reflection_mode=(ReflectionMode.RAYTRACED if rf
                             else ReflectionMode.OFF),
            denoise=True, rt_scale=scale,
        )

        def run(hs=hs):
            return raygen.hybrid_raytrace(
                scene, tables, tri_rows, bvh, tris, pfd, depth, normal_oid,
                settings=hs,
            )

        jr = jax.jit(run)
        ms = timeit(jr)
        results[label] = ms
        print(f"{label:<32} {ms:8.1f} ms", flush=True)

    full = results["full (shadow+ao+refl)"]
    floor = results["none (prep/assembly floor)"]
    print(f"\nfloor {floor:.1f}; shadow+={results['shadow only']-floor:.1f}; "
          f"ao+={results['ao only']-floor:.1f}; "
          f"refl+={results['refl only']-floor:.1f}; "
          f"sum={floor + (results['shadow only']-floor) + (results['ao only']-floor) + (results['refl only']-floor):.1f} "
          f"vs full {full:.1f}")


if __name__ == "__main__":
    main()
