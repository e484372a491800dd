"""leaf_max sweep on the real 1080p SponzaProxy wavefronts (TPU).

The BVH8 row has room for 12 triangles per leaf (10 coordinate groups of 12
= 120 floats <= 127); fatter leaves mean fewer rows and shallower trees —
fewer steps at the SAME one-gather-per-step cost (gathers are per-index,
docs/PERF_STATUS.md rule 2/5), paying only wider masked Moller-Trumbore VPU
work per leaf step.  Parity: tests/test_bvh8.py::test_leaf_max_12_matches_8.

Times the PRODUCTION schedules for all three wavefronts with leaf_max in
{8, 12}: shadow packet128 b5x8, AO per-ray adaptive blocks, reflection
packet128 phased.

Run: python scripts/bench_leafmax.py [8] [12]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def timeit(fn, iters=3):
    sync(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
    return best


def main():
    from vulkanhybridrenderer_tpu import native_bridge
    from vulkanhybridrenderer_tpu.core.config import (
        HybridSettings, RenderConfig, ShadowMode,
    )
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops
    from vulkanhybridrenderer_tpu.ops import geometry, raygen, screen, traverse
    from vulkanhybridrenderer_tpu.ops.sampling import (
        to_basis, uniform_sample_cone, uniform_sample_cosine_hemisphere,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.utils import rng
    from vulkanhybridrenderer_tpu.utils.math3d import normalize, reflect
    from vulkanhybridrenderer_tpu.scene import procedural

    lms = [int(a) for a in sys.argv[1:]] or [8, 12]

    h, w = 1080, 1920
    cfg = RenderConfig(width=w, height=h, alpha_raster="off",
                       hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED))
    r = Renderer(procedural.sponza_proxy(), cfg, path="hybrid")
    pfd = r._make_pfd()
    depth, normal_oid = r.fetch_resource(
        "Depth", "World Space Normals and Object IDs"
    )
    sync(depth)
    scene = r.scene.buffers
    world = geometry.to_world(scene, None)
    tris = bvh_ops.world_triangles(world.position, scene.tri_vertex)
    binary = native_bridge.build_sah_host(np.asarray(tris))

    uv = screen.pixel_uv_grid(h, w)
    p_world = screen.position_from_depth(depth, uv,
                                         pfd.camera_viewproj_inverse)
    n = normal_oid[:3].transpose(1, 2, 0)
    n_flat = n.reshape(-1, 3)
    origin = (p_world + n * 0.1).reshape(-1, 3)
    sky_flat = (depth == 0.0).reshape(-1)
    l = -pfd.directional_light.direction[:3]

    state = rng.pixel_seed(w, h, pfd.frame_index)
    state, r1 = rng.random01(state)
    state, r2 = rng.random01(state)
    u2 = jnp.stack([r1, r2], axis=-1).reshape(-1, 2)
    cone = normalize(uniform_sample_cone(u2, raygen.CONE_COS_THETA_MAX))
    shadow_dir = to_basis(jnp.broadcast_to(l, (h * w, 3)), cone)
    shadow_tmax = jnp.where(sky_flat, -1.0, raygen.SHADOW_TMAX)
    ao_dirs = []
    for _ in range(2):
        state, r1 = rng.random01(state)
        state, r2 = rng.random01(state)
        u2 = jnp.stack([r1, r2], axis=-1).reshape(-1, 2)
        ao_dirs.append(to_basis(n_flat, uniform_sample_cosine_hemisphere(u2)))
    ao_tmax = jnp.where(sky_flat, -1.0, raygen.AO_TMAX)
    i_dir = normalize(p_world.reshape(-1, 3) - pfd.camera_position)
    r_dir = reflect(i_dir, n_flat)

    for lm in lms:
        bvh = bvh8_ops.build_bvh8_host(binary, tris, leaf_max=lm)
        print(f"leaf_max={lm}: {bvh.num_rows} rows "
              f"({bvh.num_rows * 512 / 1e6:.1f} MB), depth {bvh.depth}",
              flush=True)

        # shadow: production packet128 over 8x16 tiles, 5x8 blocks
        tl, _, nby, nbx = raygen.padded_block_tiler(h, w, *raygen.PACKET_TILE)

        @jax.jit
        def shadow_fn(bvh=bvh, tl=tl, nby=nby, nbx=nbx):
            return traverse.trace(
                bvh, tris, tl(origin), tl(shadow_dir), raygen.SHADOW_TMIN,
                tl(shadow_tmax, fill=-1.0), anyhit=True, strips=nby * nbx,
                packets=128,
            ).t.sum()

        print(f"  shadow prod: {timeit(shadow_fn):8.1f} ms", flush=True)

        # AO: production per-ray, adaptive blocks (15x15 at 1080p)
        mb = max(1, min(15, int((h * w / 8192) ** 0.5)))
        blk, _, anby, anbx = raygen.padded_block_tiler(h, w, 1, 1,
                                                       max_blocks=mb)

        @jax.jit
        def ao_fn(bvh=bvh, blk=blk, anby=anby, anbx=anbx):
            return traverse.trace(
                bvh, tris,
                jnp.concatenate([blk(origin)] * 2),
                jnp.concatenate([blk(d) for d in ao_dirs]),
                raygen.SHADOW_TMIN,
                jnp.concatenate([blk(ao_tmax, fill=-1.0)] * 2),
                anyhit=True, strips=2 * anby * anbx,
            ).t.sum()

        print(f"  AO prod:     {timeit(ao_fn):8.1f} ms", flush=True)

        # reflection: production packet128 phased
        @jax.jit
        def refl_fn(bvh=bvh, tl=tl):
            return traverse.trace(
                bvh, tris, tl(origin), tl(r_dir), raygen.SHADOW_TMIN,
                tl(shadow_tmax, fill=-1.0), strips=1, packets=128,
                compact=True, packet_phases=((48, 4), (96, 16)),
            ).t.sum()

        print(f"  refl prod:   {timeit(refl_fn):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
