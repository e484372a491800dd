"""Stage-level attribution of the FLAGSHIP G-Buffer pass (realglb, alpha=brute).

ATTR_flagship_realglb_s1_brute.json records G-Buffer Pass = 274.4 ms vs
Sponza's 45.7 — this script splits the difference into: opaque binning,
opaque tile raster, the 4-round alpha depth peel (with/without live-tile
compaction, per round count), merge, and resolve, each jitted separately on
the real TPU; plus the fused rasterize_scene at alpha off/brute.

Run: python scripts/attr_gbuffer_realglb.py [sponza|realglb]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def timeit(fn, iters=5):
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
    from vulkanhybridrenderer_tpu.ops import gbuffer, geometry, rasterizer
    from vulkanhybridrenderer_tpu.ops import rasterizer_tiled as rt
    from vulkanhybridrenderer_tpu.ops.shadetab import (
        build_shade_tables, make_tri_rows,
    )
    from vulkanhybridrenderer_tpu.scene import procedural

    name = sys.argv[1] if len(sys.argv) > 1 else "realglb"
    if name == "realglb":
        from vulkanhybridrenderer_tpu.scene import gltf, sample_asset

        glb = "/tmp/vhr_sponza_class.glb"
        if not os.path.exists(glb):
            sample_asset.build_sponza_class_glb(glb)
        scene = gltf.load_scene(glb)
    else:
        scene = procedural.sponza_proxy()
    buf = scene.buffers
    w, h = 1920, 1080
    cam = scene.camera
    viewproj = np.asarray(cam.projection(aspect=w / h) @ cam.view())

    tables = build_shade_tables(buf)
    world = geometry.to_world(buf, None)
    clip = jax.jit(geometry.to_clip)(world.position, jnp.asarray(viewproj))
    tri_rows = jax.jit(make_tri_rows)(tables, buf, world.position, clip)
    setup = jax.jit(
        lambda c: rasterizer.triangle_setup(c, buf.tri_vertex, w, h)
    )(clip)
    print(f"{scene.name}: {buf.num_triangles} tris, "
          f"{buf.alpha_tri_idx.shape[0]} masked, {w}x{h}", flush=True)

    tri_masked = buf.materials.alpha_mask[buf.tri_prim] == 1

    def bins_opaque():
        return rt.bin_triangles(
            setup, w, h, e_cap=rt.default_e_cap(setup.sx.shape[0], w * h),
            exclude_mask=tri_masked,
        )

    ms = timeit(jax.jit(bins_opaque))
    print(f"opaque binning             : {ms:8.1f} ms", flush=True)

    bins = jax.jit(bins_opaque)()

    def raster_only():
        return rt.rasterize_binned(bins, w, h)

    ms = timeit(jax.jit(raster_only))
    print(f"opaque tile raster         : {ms:8.1f} ms", flush=True)

    vis_o = jax.jit(raster_only)()

    for rounds in (1, 2, 4):
        for compact in ((False, True) if rounds > 1 else (False,)):
            def peel(rounds=rounds, compact=compact):
                v, ovf = rt.rasterize_alpha_peeled(
                    buf, setup, w, h, tables, rounds=rounds,
                    compact_tiles=compact,
                )
                return v.tri_id, v.depth, ovf
            ms = timeit(jax.jit(peel))
            print(f"alpha peel r={rounds} compact={int(compact)}   : "
                  f"{ms:8.1f} ms", flush=True)

    def scene_off():
        v = rt.rasterize_scene(buf, clip, w, h, alpha=False, tables=tables)
        return v.tri_id, v.depth

    ms = timeit(jax.jit(scene_off))
    print(f"rasterize_scene alpha=off  : {ms:8.1f} ms", flush=True)

    def scene_brute():
        v = rt.rasterize_scene(buf, clip, w, h, alpha=True, tables=tables)
        return v.tri_id, v.depth

    ms = timeit(jax.jit(scene_brute))
    print(f"rasterize_scene alpha=brute: {ms:8.1f} ms", flush=True)

    from vulkanhybridrenderer_tpu.core.config import (
        HybridSettings, RenderConfig, ShadowMode,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer

    cfg = RenderConfig(width=w, height=h, alpha_raster="brute",
                       hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED))
    r = Renderer(scene, cfg, path="hybrid")
    pfd = r._make_pfd()

    def resolve():
        gb = gbuffer.resolve_gbuffer(buf, tables, tri_rows, vis_o, pfd)
        return gb.albedo, gb.depth

    ms = timeit(jax.jit(resolve))
    print(f"resolve_gbuffer            : {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
