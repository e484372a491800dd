import numpy as np
import pytest

from vulkanhybridrenderer_tpu.core.config import (
    AmbientOcclusionMode,
    HybridSettings,
    ReflectionMode,
    RenderConfig,
    ShadowMode,
    SSRSettings,
)
from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
from vulkanhybridrenderer_tpu.scene import procedural


def _cfg(hs: HybridSettings, **kw):
    return RenderConfig(width=96, height=64, shadow_map_size=128, hybrid=hs, **kw)


def _render(scene, hs: HybridSettings, frames=1, **kw):
    r = Renderer(scene, _cfg(hs, **kw), path="hybrid")
    img = None
    for _ in range(frames):
        img = np.asarray(r.render_frame())
    return img, r


def test_hybrid_default_rt_shadows():
    sc = procedural.cornell_box()
    img, _ = _render(sc, HybridSettings())
    assert img.shape == (4, 64, 96)
    assert np.isfinite(img).all()
    left = img[:3, 32, 12]
    right = img[:3, 32, 83]
    assert left[0] > left[1] and right[1] > right[0]


def test_hybrid_shadow_modes_differ():
    sc = procedural.cornell_box()
    img_rt, _ = _render(sc, HybridSettings(shadow_mode=ShadowMode.RAYTRACED))
    img_sm, _ = _render(sc, HybridSettings(shadow_mode=ShadowMode.RASTERIZED))
    img_off, _ = _render(sc, HybridSettings(shadow_mode=ShadowMode.OFF))
    # off-mode has the most light everywhere
    assert img_off[:3].mean() >= img_rt[:3].mean() - 1e-6
    assert img_off[:3].mean() >= img_sm[:3].mean() - 1e-6
    # RT and rasterized shadows are not identical but broadly correlated
    diff_rt_off = np.abs(img_rt - img_off).mean()
    assert diff_rt_off > 1e-4  # shadows actually darken something
    mask_rt = (img_rt[:3].mean(0) < img_off[:3].mean(0) - 1e-3)
    mask_sm = (img_sm[:3].mean(0) < img_off[:3].mean(0) - 1e-3)
    inter = (mask_rt & mask_sm).sum()
    union = (mask_rt | mask_sm).sum()
    assert union > 50  # plenty of shadowed pixels
    assert inter / union > 0.5  # both techniques shadow mostly the same pixels


def test_hybrid_rt_ao_darkens_corners():
    sc = procedural.cornell_box()
    img_ao, _ = _render(sc, HybridSettings(
        shadow_mode=ShadowMode.OFF, ao_mode=AmbientOcclusionMode.RAYTRACED))
    img_off, _ = _render(sc, HybridSettings(
        shadow_mode=ShadowMode.OFF, ao_mode=AmbientOcclusionMode.OFF))
    assert img_ao[:3].mean() < img_off[:3].mean()


def test_hybrid_ssao():
    sc = procedural.cornell_box()
    img, _ = _render(sc, HybridSettings(
        shadow_mode=ShadowMode.OFF, ao_mode=AmbientOcclusionMode.SSAO))
    assert np.isfinite(img).all()
    img_off, _ = _render(sc, HybridSettings(
        shadow_mode=ShadowMode.OFF, ao_mode=AmbientOcclusionMode.OFF))
    assert img[:3].mean() < img_off[:3].mean()


def test_hybrid_rt_reflections_on_metal():
    sc = procedural.cornell_box()
    img, _ = _render(sc, HybridSettings(
        shadow_mode=ShadowMode.OFF, reflection_mode=ReflectionMode.RAYTRACED))
    img_off, _ = _render(sc, HybridSettings(shadow_mode=ShadowMode.OFF))
    assert np.isfinite(img).all()
    # metal box region must change when reflections are enabled
    assert np.abs(img - img_off).max() > 1e-3


def test_hybrid_ssr_runs():
    sc = procedural.cornell_box()
    img, _ = _render(sc, HybridSettings(
        shadow_mode=ShadowMode.OFF,
        reflection_mode=ReflectionMode.SSR,
        ssr=SSRSettings(ray_distance=5.0, step_size=0.25, thickness=0.75,
                        bsearch_steps=3)))
    assert np.isfinite(img).all()


def test_hybrid_svgf_denoise_temporal():
    sc = procedural.cornell_box()
    hs = HybridSettings(
        shadow_mode=ShadowMode.RAYTRACED,
        ao_mode=AmbientOcclusionMode.RAYTRACED,
        denoise=True,
    )
    r = Renderer(sc, _cfg(hs), path="hybrid")
    imgs = [np.asarray(r.render_frame()) for _ in range(3)]
    assert all(np.isfinite(i).all() for i in imgs)
    # temporal state is being carried: history no longer zeros
    hist = np.asarray(r.temporal_state.shadow_ao_history)
    assert hist.max() > 0.1
    prev_n = np.asarray(r.temporal_state.prev_normal_oid)
    assert np.abs(prev_n[:3]).max() > 0.5
    # static camera: denoised result converges (frame 2 vs 3 close)
    assert np.abs(imgs[2] - imgs[1]).mean() < 0.05


def test_hybrid_shadow_accel_grid_matches_bvh():
    """config.shadow_accel="grid" (light-space grid AS, ops/shadowgrid.py)
    must produce the exact same frame as the BVH8 traversal: the grid only
    culls, intersection tests are the same world-space Möller-Trumbore."""
    sc = procedural.sponza_proxy(columns=3, segments=6, extra_boxes=10,
                                 grid_res=6)
    hs = HybridSettings(shadow_mode=ShadowMode.RAYTRACED)
    img_bvh, _ = _render(sc, hs)
    img_grid, r = _render(sc, hs, shadow_accel="grid")
    np.testing.assert_array_equal(img_bvh, img_grid)
    assert "ShadowGrid" in r.list_resources()
    # with grid-only shadows the BVH pass must be skipped (the grid's
    # build-cost advantage is the point): no BVH resource in the graph
    assert "BVH" not in r.list_resources()


def test_hybrid_full_everything():
    sc = procedural.sponza_proxy(columns=3, segments=6, extra_boxes=12, grid_res=8)
    hs = HybridSettings(
        shadow_mode=ShadowMode.RAYTRACED,
        ao_mode=AmbientOcclusionMode.RAYTRACED,
        reflection_mode=ReflectionMode.RAYTRACED,
        denoise=True,
    )
    img, r = _render(sc, hs, frames=2)
    assert np.isfinite(img).all()
    assert img[:3].max() > 0.05


def test_per_pass_dispatch_matches_fused():
    """dispatch="per_pass" (one jitted call per pass — the seconds-not-
    minutes pipeline-build mode, runtime/renderer._run_per_pass) must
    produce the fused frame, including temporal-state carry across frames
    (SVGF history flows through the per-pass resource dict)."""
    sc = procedural.cornell_box()
    hs = HybridSettings(
        shadow_mode=ShadowMode.RAYTRACED,
        ao_mode=AmbientOcclusionMode.RAYTRACED,
        denoise=True,
    )
    ra = Renderer(sc, _cfg(hs), path="hybrid")
    rb = Renderer(sc, _cfg(hs), path="hybrid", dispatch="per_pass")
    for _ in range(2):
        img_a = np.asarray(ra.render_frame())
        img_b = np.asarray(rb.render_frame())
    # fusion changes FP contraction; values must agree to float tolerance
    np.testing.assert_allclose(img_a, img_b, atol=2e-5, rtol=1e-5)


def test_precompile_passes_aot():
    """precompile_passes AOT-builds one executable per graph pass (used by
    per-pass dispatch's auto_precompile); the compiled path must produce
    the same frame as the lazy per-pass jits."""
    sc = procedural.cornell_box()
    hs = HybridSettings(shadow_mode=ShadowMode.RAYTRACED, denoise=True)
    ra = Renderer(sc, _cfg(hs), path="hybrid", dispatch="per_pass",
                  auto_precompile=False)
    rb = Renderer(sc, _cfg(hs), path="hybrid", dispatch="per_pass")
    times = rb.precompile_passes()
    graph_passes = rb._graphs[rb._key()].find_execution_order()
    assert set(graph_passes) <= set(times)
    assert rb._pass_compiled[rb._key()].keys() == set(graph_passes)
    for _ in range(2):
        img_a = np.asarray(ra.render_frame())
        img_b = np.asarray(rb.render_frame())
    np.testing.assert_allclose(img_a, img_b, atol=2e-5, rtol=1e-5)
    # the AOT executables survived the frame loop (no aval-drift fallback)
    assert rb._pass_compiled[rb._key()].keys() == set(graph_passes)
