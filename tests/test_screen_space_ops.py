"""Unit tests for the screen-space kernels (SSAO, SSR, SVGF, composition,
shadow mapping) at the op level -- semantics pinned against the reference shader
formulas (file:line cites in each op module)."""
import numpy as np
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.config import (
    HybridSettings,
    ShadowMode,
    AmbientOcclusionMode,
    SSRSettings,
)
from vulkanhybridrenderer_tpu.core.types import (
    GBuffer,
    make_per_frame_data,
    make_temporal_state,
)
from vulkanhybridrenderer_tpu.ops import composition, filters, shadowmap, ssao, svgf
from vulkanhybridrenderer_tpu.scene.gltf import make_directional_light
from vulkanhybridrenderer_tpu.utils import math3d as m3


def _flat_scene_pfd(h=32, w=32):
    light = make_directional_light([0.0, -1.0, 0.01], intensity=1.0)
    proj = m3.infinite_reverse_z_projection(np.deg2rad(60.0), w / h, 0.1)
    view = m3.look_at([0, 1, 3], [0, 0, 0], [0, 1, 0])
    return make_per_frame_data(view, proj, light, w, h, frame_index=1)


# ---------------------------------------------------------------------------- SSAO
def test_ssao_flat_plane_is_unoccluded():
    h = w = 32
    # straight-on camera: view rotation = identity so +z normals face the camera
    light = make_directional_light([0.0, -1.0, 0.01], intensity=1.0)
    proj = m3.infinite_reverse_z_projection(np.deg2rad(60.0), 1.0, 0.1)
    view = m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0])
    pfd = make_per_frame_data(view, proj, light, w, h, frame_index=1)
    # constant depth = flat wall facing the camera -> AO ~ 1 (no occlusion)
    depth = jnp.full((h, w), 0.05, jnp.float32)
    n = jnp.zeros((4, h, w)).at[2].set(1.0)  # +z toward camera
    ao = np.asarray(ssao.ssao(pfd, depth, n, radius=0.75))
    assert ao.shape == (h, w)
    assert ao.mean() > 0.9


def test_ssao_sky_is_zero():
    h = w = 16
    pfd = _flat_scene_pfd(h, w)
    ao = np.asarray(
        ssao.ssao(pfd, jnp.zeros((h, w)), jnp.zeros((4, h, w)), radius=0.75)
    )
    np.testing.assert_allclose(ao, 0.0)  # ssao.comp:17-23


def test_ssao_blur_is_box_169():
    # a unit impulse blurs to 1/169 in the 13x13 neighborhood
    img = jnp.zeros((32, 32)).at[16, 16].set(1.0)
    out = np.asarray(ssao.ssao_blur(img))
    np.testing.assert_allclose(out[16, 16], 1 / 169.0, atol=1e-6)
    np.testing.assert_allclose(out[10, 16], 1 / 169.0, atol=1e-6)
    np.testing.assert_allclose(out[9, 16], 0.0, atol=1e-7)
    # edge pixels still divide by 169 (reference quirk, ssao_blur.comp:25)
    img2 = jnp.ones((32, 32))
    out2 = np.asarray(ssao.ssao_blur(img2))
    assert out2[0, 0] < out2[16, 16]  # corner sees only 7x7 in-bounds taps


# ------------------------------------------------------------------------- filters
def test_shifted_semantics():
    a = jnp.arange(12.0).reshape(3, 4)
    s = np.asarray(filters.shifted(a, 1, 0))
    np.testing.assert_allclose(s[0], np.asarray(a)[1])
    np.testing.assert_allclose(s[2], 0.0)  # filled
    s2 = np.asarray(filters.shifted(a, 0, -1))
    np.testing.assert_allclose(s2[:, 1:], np.asarray(a)[:, :-1])


def test_bilinear_sample_center_exact():
    img = jnp.arange(16.0).reshape(4, 4)
    # sampling at texel centers returns exact values
    uv = jnp.array([[(1 + 0.5) / 4, (2 + 0.5) / 4]])
    out = np.asarray(filters.bilinear_sample(img, uv))
    np.testing.assert_allclose(out, [9.0], atol=1e-6)


# --------------------------------------------------------------------------- SVGF
def test_svgf_temporal_rejects_on_object_id():
    h = w = 16
    n = jnp.zeros((4, h, w)).at[2].set(1.0)  # normals +z, oid 0
    motion = jnp.zeros((4, h, w))
    shadow_ao = jnp.zeros((4, h, w)).at[0].set(1.0).at[1].set(0.5)
    state = make_temporal_state(h, w)
    # history has oid -1 (cleared) -> everything invalid -> output = current
    integrated, moments = svgf.temporal(n, motion, shadow_ao, state)
    np.testing.assert_allclose(np.asarray(integrated[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(integrated[1]), 0.5, atol=1e-6)
    # valid history: prev normals/oid match -> alpha blend 0.2 (svgf.comp:105)
    state2 = svgf.TemporalState(
        shadow_ao_history=jnp.zeros((2, h, w)),
        moments_history=jnp.zeros((4, h, w)),
        prev_normal_oid=n,
    )
    integrated2, _ = svgf.temporal(n, motion, shadow_ao, state2)
    np.testing.assert_allclose(np.asarray(integrated2[0]), 0.2, atol=1e-5)


def test_svgf_atrous_preserves_constant_field():
    h = w = 16
    n = jnp.zeros((4, h, w)).at[2].set(1.0)
    const = jnp.zeros((4, h, w)).at[0].set(0.7).at[1].set(0.3)
    out = np.asarray(svgf.atrous_iteration(const, n, step=1))
    np.testing.assert_allclose(out[0], 0.7, atol=1e-5)
    np.testing.assert_allclose(out[1], 0.3, atol=1e-5)


def test_svgf_atrous_edge_stopping_on_object_id():
    h = w = 16
    n = jnp.zeros((4, h, w)).at[2].set(1.0)
    n = n.at[3, :, 8:].set(1.0)  # right half = object 1
    field = jnp.zeros((4, h, w)).at[0, :, 8:].set(1.0)
    out = np.asarray(svgf.atrous_iteration(field, n, step=1))
    # no bleeding across the object-id edge
    np.testing.assert_allclose(out[0][:, :8], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[0][:, 8:], 1.0, atol=1e-6)


def test_svgf_scan_matches_unrolled_atrous():
    """denoise()'s lax.scan a-trous loop (dynamic-step body) must be
    value-identical to the unrolled static-step atrous_iteration chain,
    including the history = first-iteration-output rule."""
    h, w = 24, 40
    rng = np.random.default_rng(3)
    n = jnp.zeros((4, h, w)).at[2].set(1.0)
    n = n.at[3, :, 20:].set(1.0)
    motion = jnp.zeros((4, h, w))
    shadow_ao = jnp.asarray(rng.random((4, h, w)), jnp.float32)
    state = svgf.TemporalState(
        shadow_ao_history=jnp.asarray(rng.random((2, h, w)), jnp.float32),
        moments_history=jnp.asarray(rng.random((4, h, w)), jnp.float32),
        prev_normal_oid=n,
    )
    out, new_state = svgf.denoise(n, motion, shadow_ao, state, iterations=5)
    integrated, _ = svgf.temporal(n, motion, shadow_ao, state)
    cur = integrated
    hist = None
    for i in range(5):
        cur = svgf.atrous_iteration(cur, n, 1 << i)
        if i == 0:
            hist = cur[:2]
    np.testing.assert_allclose(np.asarray(out), np.asarray(cur),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.shadow_ao_history),
                               np.asarray(hist), atol=1e-6, rtol=1e-6)


def test_svgf_denoise_smooths_noise():
    h = w = 32
    rng = np.random.default_rng(0)
    n = jnp.zeros((4, h, w)).at[2].set(1.0)
    state = make_temporal_state(h, w)
    # frame 1: single-sample moments give zero variance -> edge-stopping blocks
    # all smoothing (faithful to svgf.comp); frame 2 has real variance and smooths.
    noisy1 = jnp.zeros((4, h, w)).at[0].set(
        jnp.asarray((rng.random((h, w)) > 0.5).astype(np.float32))
    )
    out1, state = svgf.denoise(n, jnp.zeros((4, h, w)), noisy1, state)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(noisy1[0]), atol=1e-5)
    noisy2 = jnp.zeros((4, h, w)).at[0].set(
        jnp.asarray((rng.random((h, w)) > 0.5).astype(np.float32))
    )
    out2, state2 = svgf.denoise(n, jnp.zeros((4, h, w)), noisy2, state)
    # temporal blend + variance-guided a-trous reduce the noise substantially
    assert np.asarray(out2[0]).std() < np.asarray(noisy2[0]).std() * 0.5
    assert np.asarray(state2.shadow_ao_history).shape == (2, h, w)
    assert np.abs(np.asarray(state2.prev_normal_oid) - np.asarray(n)).max() < 1e-6


# -------------------------------------------------------------------- shadow map
def test_shadow_lookup_semantics():
    light = make_directional_light([0.0, -1.0, 0.001], intensity=1.0)
    size = 64
    # shadow map: everything at depth 0 (far) except a blocker region at 0.9
    sm = jnp.zeros((size, size)).at[24:40, 24:40].set(0.9)
    # a world point whose light-space depth is 0.5: lit where map < 0.5
    # find uv of origin: project (0,0,0)
    sc = shadowmap.shadow_coords(jnp.asarray(light.projview), jnp.zeros((1, 3)))
    uv = np.asarray(sc[0, :2])
    assert 0.0 < uv[0] < 1.0 and 0.0 < uv[1] < 1.0
    # single tap at points on the floor plane y=0 grid
    pts = jnp.asarray(
        np.stack(np.meshgrid(np.linspace(-4, 4, 8), np.linspace(-4, 4, 8)), -1)
        .reshape(-1, 2)
    )
    world = jnp.concatenate(
        [pts[:, :1], jnp.zeros((64, 1)), pts[:, 1:]], axis=1
    )
    vis = np.asarray(
        shadowmap.shadow_single_tap(sm, jnp.asarray(light.projview), world)
    )
    assert set(np.unique(vis)).issubset({0.0, 1.0})
    # the blocker occludes the center region (points whose z < 0.9 - bias)
    assert vis.min() == 0.0 and vis.max() == 1.0


# ------------------------------------------------------------------- composition
def test_composition_modes_off_is_ambient_only_for_sky():
    h = w = 8
    pfd = _flat_scene_pfd(h, w)
    gb = GBuffer(
        albedo=jnp.zeros((4, h, w)),
        normal_oid=jnp.zeros((4, h, w)),
        motion_mr=jnp.zeros((4, h, w)).at[2].set(-1.0).at[3].set(-1.0),
        depth=jnp.zeros((h, w)),
    )
    s = HybridSettings(shadow_mode=ShadowMode.OFF,
                       ao_mode=AmbientOcclusionMode.OFF)
    out = np.asarray(composition.compose(gb, pfd, s))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:3], 0.0, atol=1e-5)  # black sky


def test_composition_lit_floor():
    h = w = 8
    pfd = _flat_scene_pfd(h, w)
    gb = GBuffer(
        albedo=jnp.zeros((4, h, w)).at[0].set(0.8).at[3].set(1.0),
        normal_oid=jnp.zeros((4, h, w)).at[1].set(1.0),  # up normals
        motion_mr=jnp.zeros((4, h, w)).at[2].set(0.0).at[3].set(0.5),
        depth=jnp.full((h, w), 0.01, jnp.float32),
    )
    s = HybridSettings(shadow_mode=ShadowMode.OFF,
                       ao_mode=AmbientOcclusionMode.OFF)
    out = np.asarray(composition.compose(gb, pfd, s))
    # ambient (albedo/pi) + diffuse: red channel dominates
    assert out[0].mean() > 0.2
    assert out[0].mean() > out[1].mean() * 2


def test_ssr_settings_static_iteration_count():
    # int(ray_distance / step_size) static loop count must match the reference
    s = SSRSettings(ray_distance=20.0, step_size=0.1)
    assert int(s.ray_distance / s.step_size) == 200
