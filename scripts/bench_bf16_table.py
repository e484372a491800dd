"""Round-5 probe: bf16 BVH8 rows as a VMEM-residency lever.

The cliff probe (bench_vmem_cliff.py) measured a sharp dependent-gather step
at ~15-17 MB of padded table bytes: 3.6-3.9 ns/idx under, 6.0 over (1.65x).
realglb's table (48.6k rows, 24.9 MB f32 @ leaf8) sits over; the same rows in
bf16 are 12.4 MB — under.  Gather cost is per-INDEX not per-byte, so the ONLY
effect to measure is residency: does a (48.6k, 128) bf16 table walk at the
VMEM rate, and what does the per-step f32 upcast add on a VMEM-resident
table (sponza row)?

Run: python scripts/bench_bf16_table.py
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
                row = rows[i].astype(jnp.float32)
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
        binary = native_bridge.build_sah_host(np.asarray(tris))
        b8 = bvh8_ops.build_bvh8_host(binary, tris, leaf_max=8)
        for dt, bpel in ((jnp.float32, 4), (jnp.bfloat16, 2)):
            rows = b8.rows.astype(dt)
            mb = b8.num_rows * 128 * bpel / 1e6
            ms, per = walk_rate(rows)
            print(f"{name:8s} {np.dtype(dt).name:9s}: {b8.num_rows:6d} rows "
                  f"{mb:6.1f} MB: {per:5.2f} ns/idx ({ms:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
