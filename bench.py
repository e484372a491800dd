"""Benchmark runner: the flagship hybrid pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "secondary"}.

Default (BENCH_MODE unset) = the FLAGSHIP config the BASELINE.md 16.6 ms
target defines (config 3): full hybrid (RT shadows + AO + mirror reflections
+ SVGF, rt_scale=1) at 1920x1080 on a REAL glTF asset loaded through the GLB
reader, with reference-parity alpha handling (alpha_raster="brute" -- the
reference's G-buffer does per-fragment alpha-mask discard unconditionally,
gbuf.frag:22-27, and its shadow rays run the any-hit alpha test,
shadow_anyhit.rahit:22-26).  `value`/`vs_baseline` are that config's ms/frame
against 16.6 ms.  `secondary` carries the reference-defaults config
(BASELINE.md config 2: RT shadows only, hybrid_render_path.h:32-35) on the
SponzaProxy scene for continuity with BENCH_r01-r04.

Set BENCH_MODE explicitly for a single-config run: "full" (config 3 on
BENCH_SCENE), "rt-shadows" (config 2), "raster" (shadow map + SSAO, config 1
analogue).

Env knobs: BENCH_WIDTH/BENCH_HEIGHT/BENCH_FRAMES/BENCH_SCENE
("sponza"|"cornell"|"bistro"|"realglb"), BENCH_PATH (default "hybrid"),
BENCH_MODE, BENCH_RT_SCALE (HybridSettings.rt_scale: 2 = half-res RT +
joint-bilateral upsample, ops/upsample.py; default 1 = reference parity),
BENCH_ALPHA (RenderConfig.alpha_raster; defaults: "brute" for the flagship,
"off" for explicit single-config runs, matching the r1-r4 artifacts).
"""
from __future__ import annotations

import json
import os
import sys
import time


def _ensure_live_backend() -> str:
    """The tunneled TPU relay can be down for hours (rounds 3/4); a plain
    `import jax` then hangs until the driver's timeout and the round records
    NO number at all.  Probe the default platform in a SUBPROCESS (the hang
    is inside native dial code — unkillable in-process) and, if it is dead,
    re-exec this benchmark as a true CPU process (PALLAS_AXON_POOL_IPS
    stripped so the axon plugin never registers).  A clearly-labeled CPU
    number beats an empty BENCH artifact.  Returns the platform tag."""
    import subprocess

    if os.environ.get("BENCH_CPU_FALLBACK"):
        return "cpu-fallback(tunnel down)"
    if "PALLAS_AXON_POOL_IPS" not in os.environ:
        return "cpu"  # already a CPU-only environment
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            timeout=int(os.environ.get("BENCH_PROBE_TIMEOUT", 300)),
            capture_output=True, env=os.environ.copy(),
        )
        if proc.returncode == 0:
            return "tpu"
    except subprocess.TimeoutExpired:
        pass
    env = os.environ.copy()
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_CPU_FALLBACK"] = "1"
    # CPU frames are ~20x slower: keep the run inside the driver's timeout
    env.setdefault("BENCH_FRAMES", "6")
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)
    raise RuntimeError("unreachable")


def _load_scene(scene_name: str):
    from vulkanhybridrenderer_tpu.scene import procedural

    if scene_name == "cornell":
        return procedural.cornell_box()
    if scene_name == "bistro":
        return procedural.bistro_proxy()
    if scene_name == "realglb":
        # Sponza-class REAL glTF: >= 250k tris, 39 textures, loaded through
        # the full GLB reader (BASELINE.md config 3/5 asset-scale check)
        from vulkanhybridrenderer_tpu.scene import gltf, sample_asset

        glb = "/tmp/vhr_sponza_class.glb"
        if not os.path.exists(glb):
            sample_asset.build_sponza_class_glb(glb)
        return gltf.load_scene(glb)
    return procedural.sponza_proxy()


def _make_settings(mode: str, rt_scale: int):
    from vulkanhybridrenderer_tpu.core.config import (
        AmbientOcclusionMode,
        HybridSettings,
        ReflectionMode,
        ShadowMode,
    )

    if mode == "full":
        return HybridSettings(
            shadow_mode=ShadowMode.RAYTRACED,
            ao_mode=AmbientOcclusionMode.RAYTRACED,
            reflection_mode=ReflectionMode.RAYTRACED,
            denoise=True,
            rt_scale=rt_scale,
        )
    if mode == "raster":
        return HybridSettings(
            shadow_mode=ShadowMode.RASTERIZED,
            ao_mode=AmbientOcclusionMode.SSAO,
        )
    # reference hybrid defaults (hybrid_render_path.h:32-35)
    return HybridSettings(shadow_mode=ShadowMode.RAYTRACED, rt_scale=rt_scale)


def _run_config(scene, mode: str, rt_scale: int, alpha: str, width: int,
                height: int, frames: int, path: str, platform: str) -> dict:
    """Compile + measure one config; returns the metric dict."""
    import jax.numpy as jnp
    import numpy as np

    from vulkanhybridrenderer_tpu.core.config import RenderConfig
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer

    cfg = RenderConfig(
        width=width, height=height, hybrid=_make_settings(mode, rt_scale),
        alpha_raster=alpha,
    )
    r = Renderer(scene, cfg, path=path)

    # warm up: compile + 2 frames (np.asarray forces real execution -- on this
    # runtime block_until_ready can return before async device faults surface).
    # First warm frame is fetched LINEAR and isfinite-checked: the sRGB8 encode
    # clips NaNs to valid uint8, so only the linear frame can prove the
    # pipeline is numerically sound.  Timed frames then use the 8-bit sRGB
    # swapchain image (the reference presents B8G8R8A8_SRGB) -- encoded on
    # device, 4x less host readback.
    lin = np.asarray(r.render_frame())
    assert np.isfinite(lin).all(), "non-finite values in linear frame"
    out = r.render_frame(srgb8=True)
    np.asarray(out)

    # min of 3 batches: the shared TPU pool shows up to 2x run-to-run variance,
    # so a single averaged block over-reports; min-of-batches is stable.
    # The per-batch sync point is a SCALAR reduction of the last frame: it
    # forces every dispatched frame to finish on device (single execution
    # stream) without timing the ~250 ms tunnel readback of an 8 MB image —
    # the reference presents to an on-device swapchain and never pays host
    # readback at all, so device-compute ms/frame is the comparable number.
    # One full frame is still fetched (untimed, below) as image evidence.
    batch = max(1, frames // 3)
    best = float("inf")
    out = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(batch):
            out = r.render_frame(sync=False, srgb8=True)
        np.asarray(jnp.max(out))  # scalar sync: all batch frames complete
        best = min(best, (time.perf_counter() - t0) * 1e3 / batch)
    ms = best

    host = np.asarray(out)  # evidence frame, untimed
    assert host.dtype == np.uint8 and host.size > 0
    target_ms = 16.6  # BASELINE.md: 60 FPS full hybrid at 1080p
    return {
        "metric": f"ms/frame hybrid[{mode}"
        + (f",rt_scale={rt_scale}" if rt_scale != 1 else "")
        + (f",alpha={alpha}" if alpha != "off" else "")
        + f"] {scene.name} {width}x{height} "
        f"({scene.buffers.num_triangles} tris)"
        + (f" [{platform}]" if platform != "tpu" else ""),
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(target_ms / ms, 4),
    }


def main() -> None:
    platform = _ensure_live_backend()

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    # 30 frames -> batches of 10: the ~250 ms tunnel readback of the one
    # materialized frame per batch amortizes to ~25 ms/frame (the reference
    # presents to a swapchain and never pays host readback at all)
    frames = int(os.environ.get("BENCH_FRAMES", 30))
    path = os.environ.get("BENCH_PATH", "hybrid")
    mode = os.environ.get("BENCH_MODE")
    rt_scale = int(os.environ.get("BENCH_RT_SCALE", 1))

    if mode:  # explicit single-config run (r1-r4 artifact compatibility)
        scene = _load_scene(os.environ.get("BENCH_SCENE", "sponza"))
        alpha = os.environ.get("BENCH_ALPHA", "off")
        result = _run_config(scene, mode, rt_scale, alpha, width, height,
                             frames, path, platform)
    else:
        # FLAGSHIP (the config the 16.6 ms target defines): full hybrid on a
        # real GLB-loaded asset with parity alpha handling.  The full-hybrid
        # frame is several times slower than rt-shadows, so fewer frames keep
        # the run inside the driver's budget without losing the pipelined
        # min-of-batches methodology.
        scene_name = os.environ.get("BENCH_SCENE", "realglb")
        alpha = os.environ.get("BENCH_ALPHA", "brute")
        scene = _load_scene(scene_name)
        result = _run_config(
            scene, "full", rt_scale, alpha, width, height,
            max(3, frames // 3), path, platform,
        )
        # secondary: reference-defaults config 2 on SponzaProxy (the r1-r4
        # headline series), recorded for continuity but NOT the parsed value.
        try:
            sec = _run_config(
                _load_scene("sponza"), "rt-shadows", rt_scale, "off", width,
                height, frames, path, platform,
            )
            result["secondary"] = {k: sec[k] for k in ("metric", "value")}
        except Exception as e:  # flagship number still stands alone
            result["secondary"] = {"error": str(e)[:200]}

    print(json.dumps(result))


if __name__ == "__main__":
    main()
