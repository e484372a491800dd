"""Cold/warm pipeline-build latency of the FLAGSHIP config: fused one-program
frame vs per-pass dispatch with concurrent AOT precompilation
(Renderer.precompile_passes).

The VERDICT-r5 bars: cold flagship <= 120 s, warm first frame <= 25 s.  The
fused program pays minutes of whole-graph XLA optimization while its passes
compile in seconds each — per-pass + thread-pool compilation should cost
~the slowest pass.  Steady-state per-pass frames measured == fused on full
sponza (997.8 vs 998.4 ms, docs/PERF_STATUS.md), so if the build-latency win
holds on hardware the flagship bench can switch dispatch modes.

Run: python scripts/bench_cold_compile.py [fused|per_pass] [scene] [alpha]
  COLD=1 disables the persistent compile cache (true cold build).
One mode per process (the in-process jit cache would contaminate a second).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

if os.environ.get("COLD"):
    # a throwaway cache dir = true cold compile without touching the real one
    os.environ["VHR_COMPILE_CACHE_DIR"] = f"/tmp/vhr_cold_cache_{os.getpid()}"

import numpy as np


def main():
    from vulkanhybridrenderer_tpu.core.config import (
        AmbientOcclusionMode, HybridSettings, ReflectionMode, RenderConfig,
        ShadowMode,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import gltf, procedural, sample_asset

    mode = sys.argv[1] if len(sys.argv) > 1 else "per_pass"
    scene_name = sys.argv[2] if len(sys.argv) > 2 else "realglb"
    alpha = sys.argv[3] if len(sys.argv) > 3 else "brute"

    if scene_name == "realglb":
        glb = "/tmp/vhr_sponza_class.glb"
        if not os.path.exists(glb):
            sample_asset.build_sponza_class_glb(glb)
        scene = gltf.load_scene(glb)
    else:
        scene = procedural.sponza_proxy()

    hs = HybridSettings(
        shadow_mode=ShadowMode.RAYTRACED,
        ao_mode=AmbientOcclusionMode.RAYTRACED,
        reflection_mode=ReflectionMode.RAYTRACED,
        denoise=True,
    )
    cfg = RenderConfig(width=1920, height=1080, hybrid=hs, alpha_raster=alpha)
    t_init = time.time()
    r = Renderer(scene, cfg, path="hybrid", dispatch=mode)

    t0 = time.time()
    if mode == "per_pass":
        times = r.precompile_passes()
        build_s = time.time() - t0
        worst = max(
            (v, k) for k, v in times.items() if not k.startswith("__")
        )
        print(f"precompile: wall {build_s:.1f}s, trace {times['__trace_s__']:.1f}s,"
              f" slowest pass {worst[1]} {worst[0]:.1f}s")
    lin = np.asarray(r.render_frame())
    first_frame_s = time.time() - t0
    assert np.isfinite(lin).all()

    # steady-state (pipelined, scalar sync — bench.py methodology)
    import jax.numpy as jnp

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(5):
            out = r.render_frame(sync=False, srgb8=True)
        np.asarray(jnp.max(out))
        best = min(best, (time.perf_counter() - t0) * 1e3 / 5)
    print(
        f"mode={mode} scene={scene_name} alpha={alpha} cold={bool(os.environ.get('COLD'))}: "
        f"build+first-frame {first_frame_s:.1f}s (since init {time.time()-t_init:.1f}s), "
        f"steady {best:.1f} ms/frame"
    )


if __name__ == "__main__":
    main()
