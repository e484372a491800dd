"""Round-5 probe: BVH8 table size vs gather rate (the VMEM residency cliff).

realglb (254k tris) measured 451.6 ms rt-shadows vs SponzaProxy's 156.7 —
hypothesis: its leaf8 table (~45k rows ~23 MB) gathers at the ~11 ns HBM rate
while Sponza's 10.5 MB table is VMEM-resident (~3-4.4 ns).  leaf_max=12
shrinks tables ~25%; this probe builds both variants for realglb + Bistro,
prints sizes, and measures the dependent-gather walk rate on each table —
if the cliff is real and leaf12 crosses it, auto-selecting leaf12 for
table-bound scenes is a ~2-3x trace lever (PERF_STATUS rule 5).

Run: python scripts/bench_vmem_cliff.py
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


def timeit(fn, *args, iters=4):
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


def walk_rate(rows, r_strip=32400, steps=40, strips=64):
    n_rows = rows.shape[0]
    idx0 = jnp.asarray(
        np.random.default_rng(0).integers(0, n_rows, r_strip * strips)
        .astype(np.int32)
    )

    @jax.jit
    def walk(idx0=idx0):
        def strip(idx):
            def body(_, s):
                i, acc = s
                row = rows[i]
                acc = acc + row[:, 0] + row[:, 127]
                i = (i + row[:, 1].astype(jnp.int32) % 7 + 1) % n_rows
                return i, acc

            return jax.lax.fori_loop(
                0, steps, body, (idx, jnp.zeros((r_strip,), jnp.float32))
            )[1]

        return jax.lax.map(strip, idx0.reshape(strips, r_strip)).sum()

    ms = timeit(walk)
    return ms, ms * 1e6 / (r_strip * steps * strips)


def main():
    from vulkanhybridrenderer_tpu import native_bridge
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops
    from vulkanhybridrenderer_tpu.ops import geometry
    from vulkanhybridrenderer_tpu.scene import procedural

    def load(name):
        if name == "realglb":
            from vulkanhybridrenderer_tpu.scene import gltf, sample_asset

            glb = "/tmp/vhr_sponza_class.glb"
            if not os.path.exists(glb):
                sample_asset.build_sponza_class_glb(glb)
            return gltf.load_scene(glb)
        if name == "bistro":
            return procedural.bistro_proxy()
        return procedural.sponza_proxy()

    for name in ("sponza", "realglb", "bistro"):
        sc = load(name)
        world = geometry.to_world(sc.buffers, None)
        tris = bvh_ops.world_triangles(world.position, sc.buffers.tri_vertex)
        tris_np = np.asarray(tris)
        binary = native_bridge.build_sah_host(tris_np)
        for lm in (8, 12):
            b8 = bvh8_ops.build_bvh8_host(binary, tris, leaf_max=lm)
            mb = b8.num_rows * 512 / 1e6
            ms, per = walk_rate(b8.rows)
            print(f"{name:8s} T={tris_np.shape[0]:7d} leaf{lm:2d}: "
                  f"{b8.num_rows:6d} rows {mb:6.1f} MB depth {b8.depth}: "
                  f"{per:5.2f} ns/idx ({ms:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
