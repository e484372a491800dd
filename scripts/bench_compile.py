"""Compile-time attribution on the real TPU backend: AOT-lower + compile each
major frame component separately at 1080p and time it.  Identifies what makes
the full-hybrid frame compile take minutes (VERDICT r2 item 6)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def ctime(label, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"{label:<34} trace+lower {t1 - t0:6.1f}s   compile {t2 - t1:6.1f}s")
    sys.stdout.flush()


def main():
    from vulkanhybridrenderer_tpu.core.types import TemporalState
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops
    from vulkanhybridrenderer_tpu.ops import geometry, svgf, traverse
    from vulkanhybridrenderer_tpu import native_bridge
    from vulkanhybridrenderer_tpu.scene import procedural

    scene = procedural.sponza_proxy()
    sc = scene.buffers
    world = geometry.to_world(sc)
    tris = bvh_ops.world_triangles(world.position, sc.tri_vertex)
    binary = native_bridge.build_sah_host(np.asarray(tris))
    b8 = bvh8_ops.build_bvh8_host(binary, tris)

    n = 1920 * 1080
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.ones((n, 3), jnp.float32)
    tmax = jnp.ones((n,), jnp.float32)

    ctime("packet anyhit trace (strips=16)",
          lambda o_, d_, t_: traverse.trace(
              b8, tris, o_, d_, 0.01, t_, anyhit=True, strips=16, packets=128
          ).t.sum(), o, d, tmax)
    ctime("packet closest trace (strips=16)",
          lambda o_, d_, t_: traverse.trace(
              b8, tris, o_, d_, 0.01, t_, strips=16, packets=128
          ).t.sum(), o, d, tmax)
    ctime("per-ray anyhit trace (strips=64)",
          lambda o_, d_, t_: traverse.trace(
              b8, tris, o_, d_, 0.01, t_, anyhit=True, strips=64
          ).t.sum(), o, d, tmax)

    h, w = 1080, 1920
    img4 = jnp.zeros((4, h, w), jnp.float32)
    state = TemporalState(
        shadow_ao_history=jnp.zeros((2, h, w)),
        moments_history=jnp.zeros((4, h, w)),
        prev_normal_oid=img4,
    )
    ctime("svgf denoise (temporal + 5 iters)",
          lambda s, st: svgf.denoise(img4, img4, s, st), img4, state)

    from vulkanhybridrenderer_tpu.ops import rasterizer_tiled as rt

    clip = geometry.to_clip(world.position, jnp.eye(4))
    ctime("binned raster 1080p",
          lambda c: rt.rasterize_scene(sc, c, 1920, 1080, alpha=False).depth,
          clip)


if __name__ == "__main__":
    main()
