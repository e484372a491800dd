"""Per-pass attribution of the FULL hybrid config at 1080p on the TPU —
the round-4 regression hunt (full sponza measured 3948 ms vs 1301 round 3).

Run: python scripts/attr_full.py [rt_scale]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from vulkanhybridrenderer_tpu.core.config import (
        AmbientOcclusionMode, HybridSettings, ReflectionMode, RenderConfig,
        ShadowMode,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    hs = HybridSettings(
        shadow_mode=ShadowMode.RAYTRACED,
        ao_mode=AmbientOcclusionMode.RAYTRACED,
        reflection_mode=ReflectionMode.RAYTRACED,
        denoise=True, rt_scale=scale,
    )
    cfg = RenderConfig(width=1920, height=1080, hybrid=hs, alpha_raster="off")
    r = Renderer(procedural.sponza_proxy(), cfg, path="hybrid")
    t0 = time.time()
    timings = r.time_passes(iters=3)
    print(f"attribution wall: {time.time() - t0:.0f}s")
    total = sum(timings.values())
    for name, ms in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"{name:<50} {ms:9.1f} ms")
    print(f"{'TOTAL':<50} {total:9.1f} ms")
    with open(f"/root/repo/docs/ATTR_full_s{scale}.json", "w") as f:
        json.dump(timings, f, indent=1)


if __name__ == "__main__":
    main()
