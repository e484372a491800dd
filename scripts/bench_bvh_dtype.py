"""End-to-end bf16-vs-f32 BVH8 table on the realglb flagship asset: steady
frame time (bench.py methodology: pipelined, scalar sync, min-of-3) and
image RMSE between the two tables.  The acceptance bar mirrors the golden
threshold (linear RMSE <= ~2e-3): under it, bvh_dtype='auto' keeps bf16 for
over-cliff static scenes; over it, the knob stays opt-in.

Run: python scripts/bench_bvh_dtype.py [rt-shadows|full] [scene]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax.numpy as jnp

    from vulkanhybridrenderer_tpu.core.config import (
        AmbientOcclusionMode, HybridSettings, ReflectionMode, RenderConfig,
        ShadowMode,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import gltf, procedural, sample_asset

    mode = sys.argv[1] if len(sys.argv) > 1 else "rt-shadows"
    scene_name = sys.argv[2] if len(sys.argv) > 2 else "realglb"

    if scene_name == "realglb":
        glb = "/tmp/vhr_sponza_class.glb"
        if not os.path.exists(glb):
            sample_asset.build_sponza_class_glb(glb)
        scene = gltf.load_scene(glb)
    elif scene_name == "bistro":
        scene = procedural.bistro_proxy()
    else:
        scene = procedural.sponza_proxy()

    if mode == "full":
        hs = HybridSettings(
            shadow_mode=ShadowMode.RAYTRACED,
            ao_mode=AmbientOcclusionMode.RAYTRACED,
            reflection_mode=ReflectionMode.RAYTRACED,
            denoise=True,
        )
        alpha = "brute"
    else:
        hs = HybridSettings(shadow_mode=ShadowMode.RAYTRACED)
        alpha = "off"

    frames = {}
    for dt in ("f32", "bf16"):
        cfg = RenderConfig(width=1920, height=1080, hybrid=hs,
                           alpha_raster=alpha, bvh_dtype=dt)
        r = Renderer(scene, cfg, path="hybrid")
        t0 = time.time()
        lin = np.asarray(r.render_frame())
        print(f"{dt}: first frame {time.time()-t0:.1f}s "
              f"(table {r._get_bvh().rows.dtype}, "
              f"{r._get_bvh().num_rows} rows)", flush=True)
        assert np.isfinite(lin).all()
        frames[dt] = lin
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(5):
                out = r.render_frame(sync=False, srgb8=True)
            np.asarray(jnp.max(out))
            best = min(best, (time.perf_counter() - t0) * 1e3 / 5)
        print(f"{dt}: steady {best:.1f} ms/frame", flush=True)

    d = frames["f32"] - frames["bf16"]
    rmse = float(np.sqrt(np.mean(d * d)))
    p = np.abs(d)
    print(f"linear RMSE f32 vs bf16: {rmse:.2e}  "
          f"max|d| {p.max():.3f}  frac>1e-2 {(p > 1e-2).mean():.5f}")


if __name__ == "__main__":
    main()
