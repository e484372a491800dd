"""Traversal microbench: ordered (octant links) vs unordered threaded traversal.

Replicates round-1's PERF_STATUS numbers (anyhit, 2M coherent shadow rays /
incoherent AO rays, SponzaProxy 108k tris) so deltas are apples-to-apples.
Run on the real TPU:  timeout 550 python scripts/bench_traverse.py 2>&1 | tee log

All timings materialize via np.asarray (block_until_ready can return before
async device faults/latency surface on this runtime); min of 3 runs.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, n=3):
    fn()  # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax.numpy as jnp

    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import traverse
    from vulkanhybridrenderer_tpu.ops.geometry import to_world
    from vulkanhybridrenderer_tpu.scene import procedural

    r_count = int(os.environ.get("RAYS", 2_073_600))  # 1080p pixel count
    scene = procedural.sponza_proxy()  # full 108k-tri proxy (bench.py's scene)
    world = to_world(scene.buffers, scene.buffers.prim_transform)
    tris = bvh_ops.world_triangles(world.position, scene.buffers.tri_vertex)
    print(f"scene: {scene.name} {tris.shape[0]} tris, {r_count} rays", flush=True)
    b = bvh_ops.build(tris, leaf_size=1)
    np.asarray(b.esc8)
    print("bvh built", flush=True)

    rng = np.random.default_rng(0)
    lo = np.asarray(tris.reshape(-1, 3).min(0))
    hi = np.asarray(tris.reshape(-1, 3).max(0))
    # surface-ish origins: jittered grid across the scene footprint, low height
    side = int(np.sqrt(r_count)) + 1
    gx, gz = np.meshgrid(np.linspace(lo[0], hi[0], side), np.linspace(lo[2], hi[2], side))
    o = np.stack([gx.ravel(), np.full(gx.size, lo[1] + 0.5), gz.ravel()], -1)[:r_count]
    o += rng.normal(scale=0.05, size=o.shape)
    origin = jnp.asarray(o.astype(np.float32))

    # coherent shadow rays: single light direction
    l = np.array([0.35, 0.8, 0.3], np.float32)
    l /= np.linalg.norm(l)
    d_shadow = jnp.broadcast_to(jnp.asarray(l), (r_count, 3))
    # incoherent AO rays: cosine-ish random hemisphere around +y
    v = rng.normal(size=(r_count, 3)).astype(np.float32)
    v[:, 1] = np.abs(v[:, 1]) + 0.05
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    d_ao = jnp.asarray(v)

    import json

    cases = json.loads(os.environ.get("CASES", """[
      ["anyhit coh ord s1      ", "sh", {"anyhit": true, "strips": 1}],
      ["anyhit coh ord s8      ", "sh", {"anyhit": true, "strips": 8}],
      ["anyhit coh ord s32     ", "sh", {"anyhit": true, "strips": 32}],
      ["anyhit coh ord s128    ", "sh", {"anyhit": true, "strips": 128}],
      ["anyhit coh unord s128  ", "sh", {"anyhit": true, "strips": 128, "ordered": false}],
      ["anyhit coh ordflat s8  ", "sh", {"anyhit": true, "strips": 8, "baked_links": false}],
      ["anyhit inc ord+sort s8 ", "ao", {"anyhit": true, "strips": 8, "sort_rays": true}],
      ["anyhit inc ord s8      ", "ao", {"anyhit": true, "strips": 8}],
      ["closest coh ord s8     ", "sh", {"strips": 8}],
      ["closest inc ord+sort s8", "ao", {"strips": 8, "sort_rays": true}],
      ["anyhit coh ord s8 cmp  ", "sh", {"anyhit": true, "strips": 8, "compact": true}]
    ]"""))
    dirs = {"sh": d_shadow, "ao": d_ao}
    use_sah = os.environ.get("SAH", "1") == "1"
    if use_sah:
        from vulkanhybridrenderer_tpu import native_bridge

        b = native_bridge.build_sah_host(np.asarray(tris))
        print("using native SAH tree", flush=True)
    if os.environ.get("BVH8", "0") == "1":
        from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops

        b = bvh8_ops.build_bvh8_host(
            b, tris, leaf_max=int(os.environ.get("LEAF_MAX", 8))
        )
        print(f"using BVH8: {b.num_rows} rows "
              f"({b.num_rows * 512 / 1e6:.1f} MB), depth {b.depth}", flush=True)
    for name, dkey, kw in cases:
        if "phases" in kw:
            kw["phases"] = tuple(map(tuple, kw["phases"]))
        t = bench(lambda d=dirs[dkey], kw=kw: traverse.trace(
            b, tris, origin, d, 0.01, 1e4, **kw).t)
        print(f"{name}: {t*1e3:9.1f} ms  ({r_count/t/1e6:7.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
