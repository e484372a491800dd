"""Raster scaling on the virtual CPU mesh: sort-last triangle-sharded
rasterization (parallel/mesh.rasterize_scene_sharded) vs mesh size.

Caveat printed with the table: virtual CPU devices share the host's cores, so
WALL time does not show real-hardware speedup; the meaningful columns are the
per-device triangle count and binning sort length (the work that now scales),
plus the bit-identity assertion vs the single-device raster.  On real ICI the
composite all_to_all is a row-band exchange (H x W x 20 B).

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_shard.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def main():
    import jax

    from vulkanhybridrenderer_tpu.ops import geometry, rasterizer_tiled
    from vulkanhybridrenderer_tpu.parallel import mesh as pmesh
    from vulkanhybridrenderer_tpu.scene import procedural

    devs = jax.devices("cpu")
    sc = procedural.sponza_proxy()
    w, h = 1024, 512
    with jax.default_device(devs[0]):
        cam = sc.camera
        vp = cam.projection(aspect=w / h) @ cam.view()
        world = geometry.to_world(sc.buffers, sc.buffers.prim_transform)
        clip = geometry.to_clip(world.position, np.asarray(vp))
        t = sc.buffers.num_triangles

        ref = rasterizer_tiled.rasterize_scene(
            sc.buffers, clip, w, h, interpret=True, alpha=False
        )
        ref_tri = np.asarray(ref.tri_id)

        print(f"{sc.name}: {t} tris at {w}x{h} (virtual CPU mesh; wall times "
              "share host cores — per-device work is the scaling signal)")
        for n in (1, 2, 4, 8):
            m = pmesh.make_mesh(devs[:n])
            with m:
                vis = pmesh.rasterize_scene_sharded(
                    sc.buffers, clip, w, h, m, alpha=False
                )
                np.asarray(vis.depth)
                t0 = time.perf_counter()
                vis = pmesh.rasterize_scene_sharded(
                    sc.buffers, clip, w, h, m, alpha=False
                )
                np.asarray(vis.depth)
                dt = time.perf_counter() - t0
            ident = (np.asarray(vis.tri_id) == ref_tri).all()
            print(f"  mesh n={n}: {t // n:7d} tris/device "
                  f"(sort {t // n * 16 / 1e6:4.1f}M entries/device)  "
                  f"wall {dt * 1e3:7.1f} ms  bit-identical: {bool(ident)}",
                  flush=True)


if __name__ == "__main__":
    main()
