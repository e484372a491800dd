"""Golden-image regression tests.

BASELINE.md's acceptance metric is RMSE <= 2e-3 against reference renders; the
Vulkan reference cannot run in this environment (Windows/Vulkan), so these goldens
pin OUR renderer's output at a commit where the images were visually verified
against the reference's documented behavior.  Any change that shifts a pass's
math must consciously regenerate them (delete tests/goldens and re-run).
"""
import os
from pathlib import Path

import numpy as np
import pytest

from vulkanhybridrenderer_tpu.core.config import (
    AmbientOcclusionMode,
    HybridSettings,
    ReflectionMode,
    RenderConfig,
    ShadowMode,
)
from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
from vulkanhybridrenderer_tpu.scene import procedural
from vulkanhybridrenderer_tpu.utils.image import rmse

GOLDEN_DIR = Path(__file__).parent / "goldens"
RMSE_TOL = 2e-3  # BASELINE.md acceptance threshold

CASES = {
    "forward_cornell": dict(
        scene="cornell", path="forward", hybrid=HybridSettings()
    ),
    "hybrid_rt_shadows_cornell": dict(
        scene="cornell", path="hybrid",
        hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED),
    ),
    "hybrid_full_cornell": dict(
        scene="cornell", path="hybrid",
        hybrid=HybridSettings(
            shadow_mode=ShadowMode.RAYTRACED,
            ao_mode=AmbientOcclusionMode.RAYTRACED,
            reflection_mode=ReflectionMode.RAYTRACED,
            denoise=True,
        ),
        frames=2,
    ),
    "hybrid_raster_shadows_ssao": dict(
        scene="cornell", path="hybrid",
        hybrid=HybridSettings(
            shadow_mode=ShadowMode.RASTERIZED,
            ao_mode=AmbientOcclusionMode.SSAO,
        ),
    ),
    "raytraced_cornell": dict(
        scene="cornell", path="raytraced", hybrid=HybridSettings()
    ),
    "rayquery_checker": dict(
        scene="checker", path="rayquery", hybrid=HybridSettings()
    ),
}


def _render(case):
    scene = {
        "cornell": procedural.cornell_box,
        "checker": procedural.checker_quad,
    }[case["scene"]]()
    cfg = RenderConfig(
        width=64, height=64, shadow_map_size=128, hybrid=case["hybrid"]
    )
    r = Renderer(scene, cfg, path=case["path"])
    img = None
    for _ in range(case.get("frames", 1)):
        img = np.asarray(r.render_frame())
    return img


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    img = _render(CASES[name])
    assert np.isfinite(img).all()
    path = GOLDEN_DIR / f"{name}.npy"
    if not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.save(path, img.astype(np.float16))
        pytest.skip(f"golden {name} generated; re-run to compare")
    golden = np.load(path).astype(np.float32)
    # compare on tonemapped range like the swapchain output (clamp to [0,1])
    err = rmse(np.clip(img, 0, 1), np.clip(golden, 0, 1))
    assert err <= max(RMSE_TOL, 2e-3), f"golden {name} RMSE {err:.5f}"
