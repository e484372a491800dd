"""Shadow-wavefront tail profile with REAL rays (denoise-on semantics: the
N.L <= 0 grazing rays are kept, measured ~800 ms of the full-hybrid frame).
Builds the exact cone-sampled shadow wavefront from the rendered G-buffer and
sweeps packet / packet-phased schedules."""
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
    from vulkanhybridrenderer_tpu.ops import raygen, traverse
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import geometry, screen
    from vulkanhybridrenderer_tpu.ops.sampling import (
        to_basis, uniform_sample_cone,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural
    from vulkanhybridrenderer_tpu.utils import rng
    from vulkanhybridrenderer_tpu.utils.math3d import normalize

    h, w = 1080, 1920
    cfg = RenderConfig(width=w, height=h, alpha_raster="off",
                       hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED))
    r = Renderer(procedural.sponza_proxy(), cfg, path="hybrid")
    pfd = r._make_pfd()
    depth = r.fetch_resource("Depth")
    normal_oid = r.fetch_resource("World Space Normals and Object IDs")
    scene = r.scene.buffers
    bvh = r._get_bvh()
    world = geometry.to_world(scene, None)
    tris = bvh_ops.world_triangles(world.position, scene.tri_vertex)

    uv = screen.pixel_uv_grid(h, w)
    p_world = screen.position_from_depth(depth, uv,
                                         pfd.camera_viewproj_inverse)
    n = normal_oid[:3].transpose(1, 2, 0)
    l = -pfd.directional_light.direction[:3]
    origin = (p_world + n * 0.1).reshape(-1, 3)
    state = rng.pixel_seed(w, h, pfd.frame_index)
    state, r1 = rng.random01(state)
    state, r2 = rng.random01(state)
    u2 = jnp.stack([r1, r2], axis=-1).reshape(-1, 2)
    cone = normalize(uniform_sample_cone(u2, raygen.CONE_COS_THETA_MAX))
    shadow_dir = to_basis(jnp.broadcast_to(l, (h * w, 3)), cone)
    sky_flat = (depth == 0.0).reshape(-1)
    tmax = jnp.where(sky_flat, -1.0, raygen.SHADOW_TMAX)
    ndl = jnp.sum(n.reshape(-1, 3) * l, axis=-1)
    back = (~np.asarray(sky_flat)) & (np.asarray(ndl) <= 0)
    print(f"live {int((~np.asarray(sky_flat)).sum())}, backfacing {back.sum()}")

    tile, _ = raygen.make_tiler(h, w)
    ot, dt, tt = tile(origin), tile(shadow_dir), tile(tmax)

    def packet(strips):
        return traverse.trace(bvh, tris, ot, dt, raygen.SHADOW_TMIN, tt,
                              anyhit=True, strips=strips, packets=128).t.sum()

    def phased(strips, phases):
        return traverse.trace(
            bvh, tris, ot, dt, raygen.SHADOW_TMIN, tt, anyhit=True,
            strips=strips, packets=128, compact=True, packet_phases=phases,
        ).t.sum()

    for label, fn, args in (
        ("packet s16 (production)", packet, (16,)),
        ("phased s1 ((64,8))", phased, (1, ((64, 8),))),
        ("phased s1 ((48,8),(192,64))", phased, (1, ((48, 8), (192, 64)))),
        ("phased s4 ((64,8))", phased, (4, ((64, 8),))),
        ("phased s16 ((64,8))", phased, (16, ((64, 8),))),
        ("phased s1 ((32,4),(96,32))", phased, (1, ((32, 4), (96, 32)))),
    ):
        ms = timeit(fn, *args)
        print(f"shadow {label:<28} {ms:8.1f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
