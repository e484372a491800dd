"""Reflection-wavefront profile with REAL rays: render the SponzaProxy
G-buffer at 1080p, build the exact mirror-reflection wavefront the hybrid
path traces (ops/raygen.py:167-187), and time trace vs hit-shade separately
under several schedules.  Synthetic wavefronts have twice mispredicted the
fused-frame cost (AO marginal 15 ms vs 700 ms synthetic estimate) — always
profile the real thing."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, iters=3):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
    return best


def main():
    from vulkanhybridrenderer_tpu.core.config import (
        HybridSettings, RenderConfig, ShadowMode,
    )
    from vulkanhybridrenderer_tpu.ops import raygen, rt_shade, traverse
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural
    from vulkanhybridrenderer_tpu.utils.math3d import normalize, reflect

    h, w = 1080, 1920
    cfg = RenderConfig(width=w, height=h, alpha_raster="off",
                       hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED))
    r = Renderer(procedural.sponza_proxy(), cfg, path="hybrid")
    pfd = r._make_pfd()
    res = dict(r._resources(pfd))
    depth = r.fetch_resource("Depth")
    normal_oid = r.fetch_resource("World Space Normals and Object IDs")
    tri_rows = r.fetch_resource("TriRows")

    scene = res["scene"]
    bvh = r._get_bvh()
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import geometry, screen

    world = geometry.to_world(scene, None)
    tris = bvh_ops.world_triangles(world.position, scene.tri_vertex)

    n_img = normal_oid[:3].transpose(1, 2, 0)  # (H, W, 3)
    uv = screen.pixel_uv_grid(h, w)
    p_world = screen.position_from_depth(depth, uv,
                                         pfd.camera_viewproj_inverse)
    n = n_img.reshape(-1, 3)
    origin = (p_world + n_img * 0.1).reshape(-1, 3)
    i_dir = normalize(p_world.reshape(-1, 3) - pfd.camera_position)
    r_dir = reflect(i_dir, n)
    sky_flat = (depth == 0.0).reshape(-1)
    tmax = jnp.where(sky_flat, -1.0, 10000.0)
    print(f"live rays: {int((~np.asarray(sky_flat)).sum())} / {h*w}")

    tile, untile = raygen.make_tiler(h, w)

    def trace_phased(strips, phases):
        rec = traverse.trace(
            bvh, tris, tile(origin), tile(r_dir), 0.01, tile(tmax),
            strips=strips, packets=128, compact=True, packet_phases=phases,
        )
        return rec.t.sum()

    def trace_subpkt(k, nby, nbx, th, tw, strips=None, phases=None):
        tl, _ = raygen.make_block_tiler(h, w, nby, nbx, th, tw)
        assert tl is not None, (nby, nbx, th, tw)
        if strips is None:
            strips = nby * nbx
        kw = dict(strips=strips, packets=k)
        if phases is not None:
            kw.update(compact=True, packet_phases=phases)
        rec = traverse.trace(bvh, tris, tl(origin), tl(r_dir), 0.01,
                             tl(tmax), **kw)
        return rec.t.sum()

    import os

    cases = (
        ("phased s1 ((48,4),(96,16)) prod", trace_phased,
         (1, ((48, 4), (96, 16)))),
        ("subpkt K8 2x4 b4x8", trace_subpkt, (8, 4, 8, 2, 4)),
        ("subpkt K16 4x4 b4x8", trace_subpkt, (16, 4, 8, 4, 4)),
        ("subpkt K16 4x4 b6x16", trace_subpkt, (16, 6, 16, 4, 4)),
        ("subpkt K32 4x8 b4x8", trace_subpkt, (32, 4, 8, 4, 8)),
        ("subpkt K16 ph s1 ((64,4),(96,16))", trace_subpkt,
         (16, 4, 8, 4, 4, 1, ((64, 4), (96, 16)))),
        ("subpkt K8 ph s1 ((56,4),(96,16))", trace_subpkt,
         (8, 4, 8, 2, 4, 1, ((56, 4), (96, 16)))),
    )
    only = os.environ.get("REFL_CASES")
    for label, fn, args in cases:
        if only and only not in label:
            continue
        ms = timeit(fn, *args)
        print(f"refl trace {label:<34} {ms:8.1f} ms")
        sys.stdout.flush()

    # hit shade standalone
    rec = traverse.trace(bvh, tris, tile(origin), tile(r_dir), 0.01,
                         tile(tmax), strips=16, packets=128)
    tri = untile(rec.tri)
    u = untile(rec.u)
    v = untile(rec.v)

    def shade(tri_, u_, v_):
        return rt_shade.reflection_hit_shade(
            scene, res["shade_tables"], tri_rows, pfd, tri_, u_, v_
        ).sum()

    try:
        ms = timeit(jax.jit(shade), tri, u, v)
        print(f"reflection_hit_shade          {ms:8.1f} ms")
    except Exception as e:
        print("shade standalone failed:", repr(e)[:200])


if __name__ == "__main__":
    main()
