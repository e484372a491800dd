"""Round-5 AO grind: why can't strips get finer than ~8k rays?

The b-sweep (scripts/bench_ao_r4.py) showed per-ray AO bottoming at b15x15
(~8k-ray strips, 402 ms) with finer grids flat-to-worse — hypothesis: a fixed
per-STEP cost (the while_loop's device-wide cond evaluation / pipeline bubble)
that amortizes over strip width.  If true, checking the cond every U steps
(unrolled body) pays max+U/2 steps per strip but 1/U of the bubbles, letting
finer blocks (closer-to-local max walks) win.

Measures:
  1. fori vs while at fixed steps across strip widths  -> per-step bubble cost
  2. production AO wavefront: blocks x unroll sweep    -> the real lever

Run: python scripts/bench_ao_r5.py [bubble] [sweep]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


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
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import geometry, raygen, screen, traverse
    from vulkanhybridrenderer_tpu.ops.sampling import (
        to_basis, uniform_sample_cosine_hemisphere,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural
    from vulkanhybridrenderer_tpu.utils import rng

    which = sys.argv[1:] or ["bubble", "sweep"]
    h, w = 1080, 1920
    cfg = RenderConfig(width=w, height=h, alpha_raster="off",
                       hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED))
    r = Renderer(procedural.sponza_proxy(), cfg, path="hybrid")
    pfd = r._make_pfd()
    depth, normal_oid = r.fetch_resource(
        "Depth", "World Space Normals and Object IDs"
    )
    sync(depth)
    bvh = r._get_bvh()
    scene = r.scene.buffers
    world = geometry.to_world(scene, None)
    tris = bvh_ops.world_triangles(world.position, scene.tri_vertex)

    uv = screen.pixel_uv_grid(h, w)
    p_world = screen.position_from_depth(depth, uv,
                                         pfd.camera_viewproj_inverse)
    n = normal_oid[:3].transpose(1, 2, 0)
    n_flat = n.reshape(-1, 3)
    origin = (p_world + n * 0.1).reshape(-1, 3)
    state = rng.pixel_seed(w, h, pfd.frame_index)
    for _ in range(2):
        state, _ = rng.random01(state)
    dirs = []
    for _ in range(2):
        state, r1 = rng.random01(state)
        state, r2 = rng.random01(state)
        u2 = jnp.stack([r1, r2], axis=-1).reshape(-1, 2)
        dirs.append(to_basis(n_flat, uniform_sample_cosine_hemisphere(u2)))
    sky_flat = (depth == 0.0).reshape(-1)
    ao_tmax = jnp.where(sky_flat, -1.0, raygen.AO_TMAX)

    if "bubble" in which:
        # fixed 40 steps over the real table; fori (no cond) vs while (cond
        # every step): the difference/step = the bubble.
        rows = bvh.rows
        n_rows = rows.shape[0]
        steps = 40
        for r_strip in (1024, 2304, 4608, 9216, 32400):
            strips = (1 << 22) // r_strip
            idx0 = jnp.asarray(
                np.random.default_rng(0).integers(
                    0, n_rows, r_strip * strips
                ).astype(np.int32)
            )

            def make(loop):
                @jax.jit
                def walk(idx0=idx0):
                    def body(s):
                        i, acc, k = s
                        row = rows[i]
                        acc = acc + row[:, 0] + row[:, 127]
                        i = (i + row[:, 1].astype(jnp.int32) % 7 + 1) % n_rows
                        return i, acc, k + 1

                    def strip(idx):
                        init = (idx, jnp.zeros((r_strip,), jnp.float32),
                                jnp.int32(0))
                        if loop == "fori":
                            out = jax.lax.fori_loop(
                                0, steps, lambda _, s: body(s), init
                            )
                        else:
                            out = jax.lax.while_loop(
                                lambda s: (s[2] < steps)
                                & jnp.any(s[0] >= 0), body, init
                            )
                        return out[1]

                    return jax.lax.map(
                        strip, idx0.reshape(strips, r_strip)
                    ).sum()

                return walk

            t_f = timeit(make("fori"))
            t_w = timeit(make("while"))
            bub = (t_w - t_f) / (strips * steps) * 1e3
            print(f"R={r_strip:6d} x{strips:4d} strips x{steps}: "
                  f"fori {t_f:7.1f} ms  while {t_w:7.1f} ms  "
                  f"bubble {bub:6.2f} us/strip-step", flush=True)

    if "sweep" in which:
        def perray(max_blocks, unroll):
            blk, unblk, nby, nbx = raygen.padded_block_tiler(
                h, w, 1, 1, max_blocks=max_blocks
            )
            rec = traverse.trace(
                bvh, tris,
                jnp.concatenate([blk(origin)] * 2),
                jnp.concatenate([blk(d) for d in dirs]),
                raygen.SHADOW_TMIN,
                jnp.concatenate([blk(ao_tmax, fill=-1.0)] * 2),
                anyhit=True, strips=2 * nby * nbx, unroll=unroll,
            )
            return rec.t.sum(), nby, nbx

        for mb in (15, 24, 30, 40, 60):
            for unroll in (1, 2, 4, 8):
                fn = jax.jit(lambda mb=mb, u=unroll: perray(mb, u)[0])
                _, nby, nbx = perray(mb, 1)
                ms = timeit(fn)
                print(f"ao perray b{nby}x{nbx} s{2*nby*nbx:<5} u{unroll}: "
                      f"{ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
