"""Benchmark runner: full hybrid pipeline on the Sponza stand-in.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value is
ms/frame of the full hybrid pipeline (RT shadows + AO + mirror reflections + SVGF)
at 1920x1080 on the available accelerator, and vs_baseline is measured against the
BASELINE.md target of 16.6 ms/frame (>1.0 = faster than target).

Env knobs: BENCH_WIDTH/BENCH_HEIGHT/BENCH_FRAMES/BENCH_SCENE ("sponza"|"cornell"),
BENCH_PATH (default "hybrid").
"""
from __future__ import annotations

import json
import os
import time


def main() -> None:
    import jax
    import numpy as np

    from vulkanhybridrenderer_tpu.core.config import (
        AmbientOcclusionMode,
        HybridSettings,
        ReflectionMode,
        RenderConfig,
        ShadowMode,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    frames = int(os.environ.get("BENCH_FRAMES", 20))
    path = os.environ.get("BENCH_PATH", "hybrid")
    scene_name = os.environ.get("BENCH_SCENE", "sponza")

    if scene_name == "cornell":
        scene = procedural.cornell_box()
    else:
        scene = procedural.sponza_proxy()

    cfg = RenderConfig(
        width=width,
        height=height,
        hybrid=HybridSettings(
            shadow_mode=ShadowMode.RAYTRACED,
            ao_mode=AmbientOcclusionMode.RAYTRACED,
            reflection_mode=ReflectionMode.RAYTRACED,
            denoise=True,
        ),
    )
    r = Renderer(scene, cfg, path=path)

    # warm up: compile + 2 frames (np.asarray forces real execution -- on this
    # runtime block_until_ready can return before async device faults surface)
    out = r.render_frame()
    np.asarray(out)
    out = r.render_frame()
    np.asarray(out)

    t0 = time.perf_counter()
    for _ in range(frames):
        out = r.render_frame(sync=False)
    host = np.asarray(out)
    ms = (time.perf_counter() - t0) * 1e3 / frames

    assert np.isfinite(host).all()
    target_ms = 16.6  # BASELINE.md: 60 FPS full hybrid at 1080p
    print(
        json.dumps(
            {
                "metric": f"ms/frame full hybrid {scene.name} {width}x{height} "
                f"({scene.buffers.num_triangles} tris, RT shadow+AO+refl+SVGF)",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(target_ms / ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
