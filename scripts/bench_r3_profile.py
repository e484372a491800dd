"""Round-3 perf decomposition on the real TPU.

Times (pipelined, min-of-N, tiny-reduction sync to avoid readback skew):
  1. per-pass attribution for rt-shadows on Cornell (74 tris) and SponzaProxy
     (the Cornell "frame floor" is VERDICT round-2 item 2)
  2. binning stages standalone: argsort, scatter, full bin_triangles, kernel
  3. BVH8 traversal micro: anyhit/closest, coherent/incoherent, with the
     empty-slot mask fix (expect step-count savings vs round-2 numbers)
  4. host-readback cost of the sRGB8 frame over the tunnel

Run: python scripts/bench_r3_profile.py [section ...]
Sections: passes binning trace readback (default: all)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    """Force completion: on the tunneled runtime block_until_ready can return
    without waiting, so fetch one element of the first leaf to the host."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])  # 1-element device slice -> host


def timeit(fn, *args, iters=5, warm=2, **kw):
    """Pipelined min-of-iters wall ms; completion forced by a host fetch."""
    for _ in range(warm):
        out = fn(*args, **kw)
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kw)
        sync(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
    return best


def section_passes():
    from vulkanhybridrenderer_tpu.core.config import (
        HybridSettings, RenderConfig, ShadowMode,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural

    hs = HybridSettings(shadow_mode=ShadowMode.RAYTRACED)
    for scene_name, scene in (
        ("cornell", procedural.cornell_box()),
        ("sponza", procedural.sponza_proxy()),
    ):
        cfg = RenderConfig(width=1920, height=1080, hybrid=hs, alpha_raster="off")
        r = Renderer(scene, cfg, path="hybrid")
        t = r.time_passes(iters=5)
        print(f"-- per-pass [{scene_name}] rt-shadows 1080p --")
        for k, v in t.items():
            print(f"  {k:<42} {v:8.1f} ms")
        print(f"  {'SUM':<42} {sum(t.values()):8.1f} ms")
        # pipelined whole frames, device-side sync via srgb8 sum
        out = r.render_frame(srgb8=True)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                out = r.render_frame(sync=False, srgb8=True)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) * 1e3 / 4)
        print(f"  pipelined frame (batch4 incl 1 readback) {best:8.1f} ms")


def section_binning():
    from vulkanhybridrenderer_tpu.ops import geometry, rasterizer
    from vulkanhybridrenderer_tpu.ops import rasterizer_tiled as rt
    from vulkanhybridrenderer_tpu.scene import procedural

    scene = procedural.sponza_proxy()
    sc = scene.buffers
    world = geometry.to_world(sc)
    pfd_vp = None
    from vulkanhybridrenderer_tpu.core.types import make_per_frame_data

    cam = scene.camera
    view = cam.view()
    proj = cam.projection(aspect=1920 / 1080)
    vp = jnp.asarray(proj @ view)
    clip = geometry.to_clip(world.position, vp)
    setup = rasterizer.triangle_setup(clip, sc.tri_vertex, 1920, 1080)
    t = setup.sx.shape[0]
    print(f"-- binning [sponza {t} tris @1080p] --")

    ms = timeit(lambda s: rt.bin_triangles(s, 1920, 1080), setup)
    print(f"  bin_triangles total      {ms:8.1f} ms")

    bins = jax.block_until_ready(rt.bin_triangles(setup, 1920, 1080))
    ms = timeit(
        lambda b: rt.rasterize_binned(b, 1920, 1080, interpret=False), bins
    )
    print(f"  rasterize_binned kernel  {ms:8.1f} ms")

    # stage microbenches at the real entry width
    e_total = t * 16 + max(4096, t // 16) * 64 + max(512, t // 64) * 256
    print(f"  (entry width e_total = {e_total})")
    keys = jnp.asarray(
        np.random.default_rng(0).integers(0, 2040, e_total, dtype=np.int32)
    )

    srt = jax.jit(lambda k: jnp.argsort(k, stable=True))
    ms = timeit(srt, keys)
    print(f"  argsort stable (E,)      {ms:8.1f} ms")

    vals = jnp.arange(e_total, dtype=jnp.int32)
    dest = jnp.asarray(
        np.random.default_rng(1).permutation(e_total).astype(np.int32)
    )
    scat = jax.jit(lambda d, v: jnp.zeros(e_total + 1, jnp.int32).at[d].set(v))
    ms = timeit(scat, dest, vals)
    print(f"  scatter (E,) int32       {ms:8.1f} ms")

    gat = jax.jit(lambda tab, i: tab[i])
    tab16 = jnp.zeros((t + 1, 16), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(2).integers(0, t, e_total, dtype=np.int32)
    )
    ms = timeit(gat, tab16, idx)
    print(f"  plane row gather (E,16)  {ms:8.1f} ms")


def section_trace():
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops
    from vulkanhybridrenderer_tpu.ops import geometry, traverse
    from vulkanhybridrenderer_tpu import native_bridge
    from vulkanhybridrenderer_tpu.scene import procedural

    scene = procedural.sponza_proxy()
    sc = scene.buffers
    world = geometry.to_world(sc)
    tris = bvh_ops.world_triangles(world.position, sc.tri_vertex)
    binary = native_bridge.build_sah_host(np.asarray(tris))
    b8 = bvh8_ops.build_bvh8_host(binary, tris)
    print(f"-- trace [sponza {tris.shape[0]} tris, {b8.num_rows} rows] --")

    rng = np.random.default_rng(0)
    n = 1 << 21
    # coherent shadow-style rays from a floor-ish plane toward the light
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = rng.uniform(-14, 14, n)
    o[:, 2] = rng.uniform(-7, 7, n)
    o[:, 1] = rng.uniform(0.1, 8, n)
    l = np.array([0.35, 0.85, 0.4], np.float32)
    l /= np.linalg.norm(l)
    d_coh = np.broadcast_to(l, (n, 3)).copy()
    # incoherent AO-style
    d_inc = rng.normal(size=(n, 3)).astype(np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=-1, keepdims=True)
    d_inc[:, 1] = np.abs(d_inc[:, 1])
    oj = jnp.asarray(o)

    def run(d, anyhit, compact, phases=((16, 2), (16, 8)), strips=32):
        rec = traverse.trace(
            b8, tris, oj, jnp.asarray(d), 0.01, 1e4, anyhit=anyhit,
            compact=compact, phases=phases, strips=strips,
        )
        return rec.t.sum()

    for name, d, anyhit, compact, ph, strips in [
        ("anyhit coherent plain s32", d_coh, True, False, None, 32),
        ("anyhit incoh compact", d_inc, True, True, ((16, 4), (16, 16)), 16),
        ("closest coherent plain s32", d_coh, False, False, None, 32),
        ("closest incoh plain s32", d_inc, False, False, None, 32),
        ("closest incoh compact", d_inc, False, True, ((16, 4), (16, 16)), 16),
        ("closest incoh compact48", d_inc, False, True, ((48, 4),), 32),
    ]:
        kw = dict(phases=ph) if ph else {}
        ms = timeit(run, d, anyhit, compact, strips=strips, iters=3, **kw)
        print(f"  {name:<28} {ms:8.1f} ms  ({n/ms/1e3:.1f} Mrays/s)")


def section_readback():
    x = jnp.zeros((1080, 1920, 4), jnp.uint8)
    x = jax.device_put(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(x)
    ms = (time.perf_counter() - t0) * 1e3 / 3
    print(f"-- readback: (1080,1920,4) uint8 = 8.3 MB  {ms:8.1f} ms --")
    y = jnp.zeros((4, 1080, 1920), jnp.float32)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    np.asarray(y)
    ms = (time.perf_counter() - t0) * 1e3
    print(f"-- readback: (4,1080,1920) f32 = 33 MB     {ms:8.1f} ms --")

    # dispatch latency: trivial jitted op round trip
    f = jax.jit(lambda a: a + 1)
    a = jnp.zeros((8, 128), jnp.float32)
    f(a)
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(a)
        jax.block_until_ready(out)
    print(f"-- sync dispatch round trip          {(time.perf_counter()-t0)*1e2:8.1f} ms --")
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(out)
    jax.block_until_ready(out)
    print(f"-- async chained dispatch            {(time.perf_counter()-t0)*1e3/20:8.1f} ms --")


if __name__ == "__main__":
    want = sys.argv[1:] or ["readback", "binning", "trace", "passes"]
    print("devices:", jax.devices())
    for s in want:
        globals()[f"section_{s}"]()
