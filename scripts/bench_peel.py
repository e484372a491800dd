"""Standalone cost of the binned depth-peel alpha raster at 1080p, with and
without round-5's live-tile compaction (rasterize_alpha_peeled
compact_tiles) — the flagship's alpha=brute price is paid here.

Run: python scripts/bench_peel.py [sponza|realglb] [width height]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vulkanhybridrenderer_tpu.ops import geometry, rasterizer, shadetab
    from vulkanhybridrenderer_tpu.ops import rasterizer_tiled as rt
    from vulkanhybridrenderer_tpu.scene import procedural

    scene_name = sys.argv[1] if len(sys.argv) > 1 else "sponza"
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080

    if scene_name == "realglb":
        from vulkanhybridrenderer_tpu.scene import gltf, sample_asset

        glb = "/tmp/vhr_sponza_class.glb"
        if not os.path.exists(glb):
            sample_asset.build_sponza_class_glb(glb)
        scene = gltf.load_scene(glb)
    else:
        scene = procedural.sponza_proxy()

    buf = scene.buffers
    cam = scene.camera
    viewproj = cam.projection(aspect=w / h) @ cam.view()
    world = geometry.to_world(buf)
    clip = geometry.to_clip(world.position, jnp.asarray(viewproj))
    setup = rasterizer.triangle_setup(clip, buf.tri_vertex, w, h)
    tables = shadetab.build_shade_tables(buf)
    n_masked = int(buf.alpha_tri_idx.shape[0])
    print(f"{scene.name}: {buf.num_triangles} tris, {n_masked} masked, {w}x{h}")

    def timeit(fn, reps=3, inner=5):
        out = jax.block_until_ready(fn())
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(inner):
                out = fn()
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) * 1e3 / inner)
        return best, out

    for rounds in (1, 2, 4):
        for compact in (False, True):
            if rounds == 1 and compact:
                continue  # round 1 is always full-width

            @jax.jit
            def run(rounds=rounds, compact=compact):
                vis, ovf = rt.rasterize_alpha_peeled(
                    buf, setup, w, h, tables, rounds=rounds,
                    compact_tiles=compact,
                )
                return vis.tri_id, vis.depth, ovf

            ms, out = timeit(run)
            tri = np.asarray(out[0])
            cov = (tri >= 0).mean()
            print(
                f"rounds={rounds} compact={int(compact)}: {ms:8.1f} ms"
                f"  (masked coverage {cov:.4f}, overflow {int(np.asarray(out[2])[0])})"
            )


if __name__ == "__main__":
    main()
