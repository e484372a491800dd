"""Per-pass attribution of the FLAGSHIP bench config (BASELINE.md config 3):
full hybrid on the realglb GLB-loader asset with reference-parity alpha
(alpha_raster="brute"), 1920x1080.

Motivation (round 5): the flagship measures 1163 ms and quartering the rays
(rt_scale=2) moves it only to 1130 ms -- the frame is raster-side bound on
this asset, unlike full-sponza where the Raytrace pass dominates.  This
script answers WHERE the ~1000 ms of non-trace time goes (G-buffer binning/
kernel/resolve, alpha peel rounds, geometry, SVGF, composition, rt_shade).

Run: python scripts/attr_flagship.py [rt_scale] [scene] [alpha]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from vulkanhybridrenderer_tpu.core.config import (
        AmbientOcclusionMode, HybridSettings, ReflectionMode, RenderConfig,
        ShadowMode,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import gltf, procedural, sample_asset

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    scene_name = sys.argv[2] if len(sys.argv) > 2 else "realglb"
    alpha = sys.argv[3] if len(sys.argv) > 3 else "brute"

    if scene_name == "realglb":
        glb = "/tmp/vhr_sponza_class.glb"
        if not os.path.exists(glb):
            sample_asset.build_sponza_class_glb(glb)
        scene = gltf.load_scene(glb)
    elif scene_name == "bistro":
        scene = procedural.bistro_proxy()
    else:
        scene = procedural.sponza_proxy()

    hs = HybridSettings(
        shadow_mode=ShadowMode.RAYTRACED,
        ao_mode=AmbientOcclusionMode.RAYTRACED,
        reflection_mode=ReflectionMode.RAYTRACED,
        denoise=True, rt_scale=scale,
    )
    cfg = RenderConfig(width=1920, height=1080, hybrid=hs, alpha_raster=alpha)
    r = Renderer(scene, cfg, path="hybrid")
    t0 = time.time()
    timings = r.time_passes(iters=3)
    print(f"attribution wall: {time.time() - t0:.0f}s")
    total = sum(timings.values())
    for name, ms in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"{name:<50} {ms:9.1f} ms")
    print(f"{'TOTAL':<50} {total:9.1f} ms")
    out = f"/root/repo/docs/ATTR_flagship_{scene_name}_s{scale}_{alpha}.json"
    with open(out, "w") as f:
        json.dump(timings, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
