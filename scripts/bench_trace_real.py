"""Real-wavefront trace-schedule sweep on the TPU, all three hybrid
wavefronts from ONE rendered 1080p SponzaProxy G-buffer (the expensive part):

  shadow (anyhit, coherent)        - production: tiled packets=128 s16
  AO x2 (anyhit, incoherent, t=5)  - production: block-major per-ray s128
  reflection (closest, mirror)     - production: packets=128 phased

Sub-packet schedules (packets=K<128, (K, M) sublane layout) sized by
scripts/sim_packet_union.py predictions.

Run: python scripts/bench_trace_real.py [shadow] [ao] [refl]
Filter cases: CASES=substring
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
        to_basis, uniform_sample_cone, uniform_sample_cosine_hemisphere,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.utils import rng
    from vulkanhybridrenderer_tpu.utils.math3d import normalize, reflect
    from vulkanhybridrenderer_tpu.scene import procedural

    which = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "shadow", "ao", "refl"
    ]
    only = os.environ.get("CASES")

    h, w = 1080, 1920
    cfg = RenderConfig(width=w, height=h, alpha_raster="off",
                       hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED))
    r = Renderer(procedural.sponza_proxy(), cfg, path="hybrid")
    pfd = r._make_pfd()
    t0 = time.time()
    depth, normal_oid = r.fetch_resource(
        "Depth", "World Space Normals and Object IDs"
    )
    sync(depth)
    print(f"gbuffer fetch: {time.time() - t0:.0f}s", flush=True)
    scene = r.scene.buffers
    bvh = r._get_bvh()
    world = geometry.to_world(scene, None)
    tris = bvh_ops.world_triangles(world.position, scene.tri_vertex)

    uv = screen.pixel_uv_grid(h, w)
    p_world = screen.position_from_depth(depth, uv,
                                         pfd.camera_viewproj_inverse)
    n = normal_oid[:3].transpose(1, 2, 0)
    n_flat = n.reshape(-1, 3)
    origin = (p_world + n * 0.1).reshape(-1, 3)
    sky_flat = (depth == 0.0).reshape(-1)
    l = -pfd.directional_light.direction[:3]

    # exact production RNG draw order
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

    def run_cases(tag, cases):
        for label, fn, args in cases:
            if only and only not in label:
                continue
            ms = timeit(fn, *args)
            print(f"{tag} {label:<36} {ms:8.1f} ms", flush=True)

    def one(o, d, tmax, anyhit, k, nby, nbx, th, tw, strips=None,
            phases=None, draws=1):
        if k:
            tl, _ = raygen.make_block_tiler(h, w, nby, nbx, th, tw)
            assert tl is not None, (nby, nbx, th, tw)
        else:
            tl = lambda a: a
        if strips is None:
            strips = draws * nby * nbx
        if draws > 1:
            o = jnp.concatenate([tl(o)] * draws)
            d = jnp.concatenate([tl(x) for x in d])
            tmax = jnp.concatenate([tl(tmax)] * draws)
        else:
            o, d, tmax = tl(o), tl(d), tl(tmax)
        kw = dict(anyhit=anyhit, strips=strips, packets=k)
        if phases is not None:
            kw.update(compact=True, packet_phases=phases)
        return traverse.trace(bvh, tris, o, d, raygen.SHADOW_TMIN, tmax,
                              **kw).t.sum()

    if "shadow" in which:
        tile, _ = raygen.make_tiler(h, w)

        def prod_shadow():
            return traverse.trace(
                bvh, tris, tile(origin), tile(shadow_dir), raygen.SHADOW_TMIN,
                tile(shadow_tmax), anyhit=True, strips=16, packets=128,
            ).t.sum()

        # (sub-packet variants removed in round 5 with the kernels —
        # measured 2-14x losers on every wavefront, docs/PERF_STATUS.md)
        run_cases("shadow", [
            ("prod packets=128 s16", prod_shadow, ()),
            ("K128 8x16 b5x8 s40", one,
             (origin, shadow_dir, shadow_tmax, True, 128, 5, 8, 8, 16)),
            ("K128 8x16 b5x15 s75", one,
             (origin, shadow_dir, shadow_tmax, True, 128, 5, 15, 8, 16)),
        ])

    if "ao" in which:
        block, _ = raygen.make_blocker(h, w)

        def prod_ao():
            return traverse.trace(
                bvh, tris,
                jnp.concatenate([block(origin)] * 2),
                jnp.concatenate([block(d) for d in ao_dirs]),
                raygen.SHADOW_TMIN,
                jnp.concatenate([block(ao_tmax)] * 2),
                anyhit=True, strips=128,
            ).t.sum()

        def prod_ao_b15():
            blk, _, nby, nbx = raygen.padded_block_tiler(h, w, 1, 1,
                                                         max_blocks=15)
            return traverse.trace(
                bvh, tris,
                jnp.concatenate([blk(origin)] * 2),
                jnp.concatenate([blk(d) for d in ao_dirs]),
                raygen.SHADOW_TMIN,
                jnp.concatenate([blk(ao_tmax, fill=-1.0)] * 2),
                anyhit=True, strips=2 * nby * nbx,
            ).t.sum()

        run_cases("ao", [
            ("prod per-ray b15 adaptive", prod_ao_b15, ()),
            ("r3-style block-major s128", prod_ao, ()),
        ])

    if "refl" in which:
        tile, _ = raygen.make_tiler(h, w)
        refl_tmax = shadow_tmax

        def prod_refl():
            return traverse.trace(
                bvh, tris, tile(origin), tile(r_dir), raygen.SHADOW_TMIN,
                tile(refl_tmax), strips=1, packets=128,
                compact=True, packet_phases=((48, 4), (96, 16)),
            ).t.sum()

        run_cases("refl", [
            ("prod packets=128 phased", prod_refl, ()),
        ])


if __name__ == "__main__":
    main()
