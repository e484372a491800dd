"""AO-wavefront schedule sweep on the real TPU: per-ray strips vs packets
for incoherent cosine-hemisphere rays at the REAL AO tmax (5.0 — short rays
bound a packet's union walk, which the earlier tmax=1e4 sweep did not test).
Also probes 2-rays-per-pixel interleaving (the production AO wavefront is
ao_rays copies of the pixel grid concatenated)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np


def main():
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import geometry, traverse
    from vulkanhybridrenderer_tpu import native_bridge
    from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops
    from vulkanhybridrenderer_tpu.scene import procedural
    from vulkanhybridrenderer_tpu.utils.math3d import normalize
    from vulkanhybridrenderer_tpu.ops.sampling import (
        to_basis, uniform_sample_cosine_hemisphere,
    )
    from vulkanhybridrenderer_tpu.utils import rng

    scene = procedural.sponza_proxy()
    sc = scene.buffers
    world = geometry.to_world(sc)
    tris = bvh_ops.world_triangles(world.position, sc.tri_vertex)
    binary = native_bridge.build_sah_host(np.asarray(tris))
    b8 = bvh8_ops.build_bvh8_host(binary, tris)
    print(f"sponza {tris.shape[0]} tris, {b8.num_rows} rows, depth {b8.depth}")

    # AO-like wavefront: origins on the floor-ish plane in scanline order,
    # cosine-hemisphere directions around up-ish normals, per-pixel RNG.
    n = 1 << 21
    gw = 1920
    gh = n // gw
    xs = (np.arange(n) % gw) / gw * 28 - 14
    zs = (np.arange(n) // gw) / gh * 14 - 7
    o = np.stack(
        [xs, 0.1 + 0.3 * np.sin(xs * 3) ** 2, zs], -1
    ).astype(np.float32)
    nrm = np.stack(
        [0.2 * np.sin(xs * 5), np.ones(n), 0.2 * np.cos(zs * 4)], -1
    ).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    state = rng.seed_thread(jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(7919))
    state, r1 = rng.random01(state)
    state, r2 = rng.random01(state)
    u2 = jnp.stack([r1, r2], axis=-1).reshape(-1, 2)
    d = to_basis(jnp.asarray(nrm), uniform_sample_cosine_hemisphere(u2))
    d = normalize(d)
    oj = jnp.asarray(o)

    def run(tmax, strips, packets):
        rec = traverse.trace(
            b8, tris, oj, d, 0.01, jnp.full((n,), tmax, jnp.float32),
            anyhit=True, strips=strips, packets=packets,
        )
        return rec.t.sum()

    def timeit(fn, *args, iters=3):
        out = fn(*args)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
        return best

    import os

    tmaxes = (5.0,) if os.environ.get("AO_SHORT") else (5.0, 1e4)
    scheds = ((64, 0), (16, 128), (32, 128))
    for tmax in tmaxes:
        for strips, packets in scheds:
            ms = timeit(run, tmax, strips, packets)
            print(
                f"tmax={tmax:>7} strips={strips:<3} packets={packets:<4}"
                f" {ms:8.1f} ms  ({ms / n * 1e6:.1f} ns/ray)"
            )
            sys.stdout.flush()


if __name__ == "__main__":
    main()
