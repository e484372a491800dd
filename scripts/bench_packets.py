"""Packet-traversal benchmark vs plain per-ray strips on the real TPU:
coherent shadow wavefront, incoherent AO wavefront, coherent primary
closest, semi-coherent reflections (mirror of primaries off a bumpy floor)."""
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
    # image-plane-ordered origins (scanline coherent like a real G-buffer)
    gw = 1920
    gh = n // gw
    xs = (np.arange(n) % gw) / gw * 28 - 14
    zs = (np.arange(n) // gw) / gh * 14 - 7
    o = np.stack([xs, 0.1 + 0.3 * np.sin(xs * 3) ** 2, zs], -1).astype(
        np.float32
    )
    l = np.array([0.35, 0.85, 0.4], np.float32)
    l /= np.linalg.norm(l)
    d_coh = np.broadcast_to(l, (n, 3)).copy()
    d_inc = rng.normal(size=(n, 3)).astype(np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=-1, keepdims=True)
    d_inc[:, 1] = np.abs(d_inc[:, 1])
    # semi-coherent: mirror directions off mildly varying normals
    nrm = np.stack(
        [0.2 * np.sin(xs * 5), np.ones(n), 0.2 * np.cos(zs * 4)], -1
    ).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    i_dir = np.broadcast_to(
        np.array([0.3, -0.8, -0.5], np.float32), (n, 3)
    ).copy()
    i_dir /= np.linalg.norm(i_dir, axis=-1, keepdims=True)
    d_ref = i_dir - 2 * (i_dir * nrm).sum(-1, keepdims=True) * nrm
    d_ref = (d_ref / np.linalg.norm(d_ref, axis=-1, keepdims=True)).astype(
        np.float32
    )
    oj = jnp.asarray(o)

    def run(d, anyhit, strips, packets):
        rec = traverse.trace(
            b8, tris, oj, jnp.asarray(d), 0.01, 1e4, anyhit=anyhit,
            strips=strips, packets=packets,
        )
        return rec.t.sum()

    def timeit(fn, *args, iters=3, **kw):
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

    for kind, d, anyhit in (
        ("shadow-coh anyhit", d_coh, True),
        ("ao-inc anyhit", d_inc, True),
        ("primary-coh closest", d_coh, False),
        ("refl-semi closest", d_ref, False),
    ):
        print(f"== {kind} ==")
        for label, strips, pk in (
            ("plain s64", 64, 0),
            ("plain s128", 128, 0),
            ("packet128 s8", 8, 128),
            ("packet128 s16", 16, 128),
            ("packet128 s32", 32, 128),
            ("packet64 s16", 16, 64),
        ):
            ms = timeit(run, d, anyhit, strips, pk)
            print(f"  {label:<22} {ms:8.1f} ms ({n/ms/1e3:.1f} Mrays/s)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
