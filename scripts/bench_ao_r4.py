"""Round-4 AO grind: the AO trace is the biggest full-hybrid line item
(504.8 ms measured, prod per-ray block-major s128).  Two levers measured on
the REAL wavefront (VERDICT-r3 #3 bar: AO wavefront <= 250 ms):

  1. strip granularity: finer screen blocks cut the per-strip MAX walk the
     lockstep loop pays (cost = strip_width x strip_max_steps per strip) at
     the price of more sequential lax.map iterations.
  2. gathered-row WIDTH: a while-loop microbench over the real BVH8 table
     pattern, widths 32/64/128 f32 — if per-step cost scales with width, a
     narrow anyhit table (boxes + control only in 56 lanes) is a ~2x lever;
     if flat (per-index model), it is not.

Run: python scripts/bench_ao_r4.py [blocks] [width]
"""
import os
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
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import geometry, raygen, screen, traverse
    from vulkanhybridrenderer_tpu.ops.sampling import (
        to_basis, uniform_sample_cosine_hemisphere,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural
    from vulkanhybridrenderer_tpu.utils import rng

    which = sys.argv[1:] or ["blocks", "width"]
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

    if "blocks" in which:
        def perray_blocks(max_blocks):
            blk, unblk, nby, nbx = raygen.padded_block_tiler(
                h, w, 1, 1, max_blocks=max_blocks
            )
            rec = traverse.trace(
                bvh, tris,
                jnp.concatenate([blk(origin)] * 2),
                jnp.concatenate([blk(d) for d in dirs]),
                raygen.SHADOW_TMIN,
                jnp.concatenate([blk(ao_tmax, fill=-1.0)] * 2),
                anyhit=True, strips=2 * nby * nbx,
            )
            return rec.t.sum(), nby, nbx

        for mb in (4, 6, 8, 12, 15, 20, 24, 30):
            fn = jax.jit(lambda mb=mb: perray_blocks(mb)[0])
            _, nby, nbx = perray_blocks(mb)
            ms = timeit(fn)
            print(f"ao perray b{nby}x{nbx} s{2*nby*nbx:<4}  {ms:8.1f} ms",
                  flush=True)

    if "width" in which:
        # while-loop gather microbench over the real table's memory pattern:
        # random-ish node sequence, STEPS fixed, vary row width and strip R
        rows128 = bvh.rows  # (N, 128)
        n_rows = rows128.shape[0]
        print(f"table rows: {n_rows} ({n_rows * 512 / 1e6:.1f} MB @128w)")
        for width in (32, 64, 128):
            tbl = rows128[:, :width]
            for r_strip, steps, strips in ((32400, 40, 128),):
                idx0 = jnp.asarray(
                    np.random.default_rng(0).integers(
                        0, n_rows, r_strip * strips
                    ).astype(np.int32)
                )

                @jax.jit
                def walk(idx0=idx0, tbl=tbl, steps=steps, strips=strips,
                         r_strip=r_strip, width=width):
                    def strip(idx):
                        def body(s):
                            i, acc = s
                            row = tbl[i]  # (R, width) — THE gather
                            acc = acc + row[:, 0] + row[:, width - 1]
                            # next node depends on row -> serializes steps
                            i = (i + row[:, 1].astype(jnp.int32) % 7 + 1) % n_rows
                            return i, acc

                        i, acc = jax.lax.fori_loop(
                            0, steps, lambda _, s: body(s),
                            (idx, jnp.zeros((r_strip,), jnp.float32)),
                        )
                        return acc

                    return jax.lax.map(
                        strip, idx0.reshape(strips, r_strip)
                    ).sum()

                ms = timeit(walk)
                per_idx = ms * 1e6 / (r_strip * steps * strips)
                print(f"width {width:3d}  R/strip {r_strip} x{strips} strips "
                      f"x{steps} steps: {ms:8.1f} ms  ({per_idx:.2f} ns/idx)",
                      flush=True)


if __name__ == "__main__":
    main()
