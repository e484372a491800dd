"""Round-5 frame-floor attribution: where do Geometry's 30 ms and the
G-buffer's unattributed ~48 ms go?

Times the Geometry pass and each of its stages separately (to_world with the
round-5 packed-row gather, clip transforms, world_triangles, make_tri_rows),
plus triangle_setup (the G-buffer stage the round-4 attribution never timed).

Run: python scripts/attr_r5_floor.py  [H=1080 W=1920 SCENE=sponza]
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


def timeit(fn, iters=8):
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
        HybridSettings, RenderConfig, ShadowMode,
    )
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import geometry, rasterizer
    from vulkanhybridrenderer_tpu.ops.shadetab import (
        build_shade_tables, make_tri_rows,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural

    h = int(os.environ.get("H", 1080))
    w = int(os.environ.get("W", 1920))
    cfg = RenderConfig(width=w, height=h, alpha_raster="off",
                       hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED))
    r = Renderer(procedural.sponza_proxy(), cfg, path="hybrid")
    pfd = r._make_pfd()
    scene = r.scene.buffers
    tables = build_shade_tables(scene)
    print(f"V={scene.num_vertices} T={scene.num_triangles}", flush=True)

    viewproj = pfd.camera_proj @ pfd.camera_view

    tw = jax.jit(lambda: geometry.to_world(scene, None))
    print(f"to_world                 {timeit(tw):8.2f} ms", flush=True)
    world = tw()

    tc = jax.jit(lambda: geometry.to_clip(world.position, viewproj))
    print(f"to_clip (camera)         {timeit(tc):8.2f} ms", flush=True)
    clip = tc()

    wt = jax.jit(lambda: bvh_ops.world_triangles(world.position,
                                                 scene.tri_vertex))
    print(f"world_triangles          {timeit(wt):8.2f} ms", flush=True)

    mtr = jax.jit(lambda: make_tri_rows(tables, scene, world.position, clip))
    print(f"make_tri_rows            {timeit(mtr):8.2f} ms", flush=True)

    def geo_pass():
        wld = geometry.to_world(scene, None)
        c = geometry.to_clip(wld.position, viewproj)
        cl = geometry.to_clip(wld.position, pfd.directional_light.projview)
        tris = bvh_ops.world_triangles(wld.position, scene.tri_vertex)
        trr = make_tri_rows(tables, scene, wld.position, c)
        return c, cl, tris, trr

    print(f"GEOMETRY PASS (fused)    {timeit(jax.jit(geo_pass)):8.2f} ms",
          flush=True)

    ts = jax.jit(lambda: rasterizer.triangle_setup(clip, scene.tri_vertex,
                                                   w, h))
    print(f"triangle_setup           {timeit(ts):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
