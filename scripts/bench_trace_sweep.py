"""Sweep traversal schedules (strips x phases x compaction) on the real TPU
to pick production settings for each wavefront kind (shadow coherent anyhit,
AO incoherent anyhit, reflection semi-coherent closest, primary coherent
closest).  Round-3 follow-up to docs/PERF_STATUS.md."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
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
    print(f"sponza {tris.shape[0]} tris, {b8.num_rows} rows, depth {b8.depth}")

    rng = np.random.default_rng(0)
    n = 1 << 21
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = rng.uniform(-14, 14, n)
    o[:, 2] = rng.uniform(-7, 7, n)
    o[:, 1] = rng.uniform(0.1, 8, n)
    # image-coherent ordering: sort origins by (z, x) to mimic pixel locality
    order = np.lexsort((o[:, 0], o[:, 2]))
    o = o[order]
    l = np.array([0.35, 0.85, 0.4], np.float32)
    l /= np.linalg.norm(l)
    d_coh = np.broadcast_to(l, (n, 3)).copy()
    d_inc = rng.normal(size=(n, 3)).astype(np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=-1, keepdims=True)
    d_inc[:, 1] = np.abs(d_inc[:, 1])
    oj = jnp.asarray(o)

    def run(d, anyhit, compact, phases, strips):
        rec = traverse.trace(
            b8, tris, oj, jnp.asarray(d), 0.01, 1e4, anyhit=anyhit,
            compact=compact, phases=phases, strips=strips,
        )
        return rec.t.sum()

    def timeit(fn, *args, iters=3, **kw):
        # np.asarray sync: block_until_ready can return early on the tunnel
        out = fn(*args, **kw)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args, **kw)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
        return best

    cases = []
    for strips in (32, 64, 128):
        cases.append((f"plain s{strips}", False, None, strips))
    for ph in (((12, 2), (12, 8)), ((16, 2), (16, 8)), ((8, 2), (12, 4), (12, 16))):
        for strips in (16, 32, 64):
            cases.append((f"c{ph} s{strips}", True, ph, strips))

    for kind, d, anyhit in (
        ("anyhit-coh", d_coh, True),
        ("anyhit-inc", d_inc, True),
        ("closest-coh", d_coh, False),
        ("closest-inc", d_inc, False),
    ):
        print(f"== {kind} ==")
        for label, compact, ph, strips in cases:
            kw = dict(phases=ph) if ph else {}
            try:
                ms = timeit(run, d, anyhit, compact, ph or ((16, 2), (16, 8)),
                            strips)
            except Exception as e:  # noqa: BLE001
                print(f"  {label:<34} FAILED {type(e).__name__}")
                continue
            print(f"  {label:<34} {ms:8.1f} ms ({n/ms/1e3:.1f} Mrays/s)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
