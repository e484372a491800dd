"""Marginal-cost decomposition of the full-hybrid frame on the real TPU:
time the fused frame with individual features toggled off and subtract.
(Standalone per-pass timing is DCE-distorted — the fused frame drops unused
outputs — so marginals against the full config are the honest numbers.)

Run: python scripts/bench_full_decomp.py <case>
Cases: full noao norefl nodenoise sh
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    from vulkanhybridrenderer_tpu.core.config import (
        AmbientOcclusionMode, HybridSettings, ReflectionMode, RenderConfig,
        ShadowMode,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural

    case = sys.argv[1]
    kw = dict(shadow_mode=ShadowMode.RAYTRACED,
              ao_mode=AmbientOcclusionMode.RAYTRACED,
              reflection_mode=ReflectionMode.RAYTRACED, denoise=True)
    if case == "noao":
        kw["ao_mode"] = AmbientOcclusionMode.OFF
    elif case == "norefl":
        kw["reflection_mode"] = ReflectionMode.OFF
    elif case == "nodenoise":
        kw["denoise"] = False
    elif case == "sh":
        kw.update(ao_mode=AmbientOcclusionMode.OFF,
                  reflection_mode=ReflectionMode.OFF, denoise=False)
    elif case == "shdn":  # shadows + denoise only: isolates the nl-dead-ray
        kw.update(ao_mode=AmbientOcclusionMode.OFF,  # + svgf marginal
                  reflection_mode=ReflectionMode.OFF, denoise=True)
    cfg = RenderConfig(width=1920, height=1080, alpha_raster="off",
                       hybrid=HybridSettings(**kw))
    r = Renderer(procedural.sponza_proxy(), cfg, path="hybrid")
    t0 = time.perf_counter()
    out = r.render_frame(srgb8=True)
    np.asarray(out)
    print(f"{case}: compile+first {time.perf_counter() - t0:.0f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            out = r.render_frame(sync=False, srgb8=True)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / 4)
    print(f"{case}: {best:.1f} ms/frame (pipelined batch-4)")


if __name__ == "__main__":
    main()
