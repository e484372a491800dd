"""Half-res RT (HybridSettings.rt_scale) + joint-bilateral upsample tests."""
import numpy as np
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.config import (
    AmbientOcclusionMode,
    HybridSettings,
    ReflectionMode,
    RenderConfig,
    ShadowMode,
)
from vulkanhybridrenderer_tpu.ops import upsample
from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
from vulkanhybridrenderer_tpu.scene import procedural


def test_downsample_nearest_points():
    img = jnp.arange(6 * 8, dtype=jnp.float32).reshape(6, 8)
    lo = np.asarray(upsample.downsample_nearest(img, 2))
    assert lo.shape == (3, 4)
    np.testing.assert_array_equal(lo, np.asarray(img)[::2, ::2])
    # ceil semantics on odd dims
    lo = np.asarray(upsample.downsample_nearest(img[:5, :7], 2))
    assert lo.shape == (3, 4)


def test_upsample_constant_is_exact():
    h, w, s = 8, 12, 2
    depth_hi = jnp.full((h, w), 0.25)
    nrm_hi = jnp.concatenate(
        [jnp.zeros((2, h, w)), jnp.ones((2, h, w))], axis=0
    )  # n=(0,0,1), oid=1
    depth_lo = upsample.downsample_nearest(depth_hi, s)
    nrm_lo = upsample.downsample_nearest(nrm_hi, s)
    lo = jnp.full((3, h // s, w // s), 0.7)
    hi = np.asarray(
        upsample.joint_bilateral_upsample(lo, s, depth_hi, nrm_hi,
                                          depth_lo, nrm_lo)
    )
    assert hi.shape == (3, h, w)
    np.testing.assert_allclose(hi, 0.7, atol=1e-6)


def test_upsample_respects_object_edges():
    """A depth/object discontinuity must not bleed: each full-res pixel only
    accepts low-res taps of its own object (plain bilinear would smear the
    boundary columns to ~0.5)."""
    h, w, s = 8, 8, 2
    left = jnp.arange(w)[None, :] < w // 2  # (1, W) broadcast mask
    left_hw = jnp.broadcast_to(left, (h, w))
    depth_hi = jnp.where(left_hw, 0.5, 0.1)
    oid_hi = jnp.where(left_hw, 1.0, 2.0)
    nrm_hi = jnp.stack(
        [jnp.zeros((h, w)), jnp.zeros((h, w)), jnp.ones((h, w)), oid_hi]
    )
    depth_lo = upsample.downsample_nearest(depth_hi, s)
    nrm_lo = upsample.downsample_nearest(nrm_hi, s)
    sig_lo = jnp.where(
        jnp.arange(w // s)[None, :] < w // (2 * s), 1.0, 0.0
    )
    sig_lo = jnp.broadcast_to(sig_lo, (1, h // s, w // s))
    hi = np.asarray(
        upsample.joint_bilateral_upsample(sig_lo, s, depth_hi, nrm_hi,
                                          depth_lo, nrm_lo)
    )[0]
    np.testing.assert_allclose(hi[:, : w // 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(hi[:, w // 2:], 0.0, atol=1e-6)


def _flagship_cfg(rt_scale, w=96, h=64):
    return RenderConfig(
        width=w, height=h, shadow_map_size=64,
        hybrid=HybridSettings(
            shadow_mode=ShadowMode.RAYTRACED,
            ao_mode=AmbientOcclusionMode.RAYTRACED,
            reflection_mode=ReflectionMode.RAYTRACED,
            denoise=True,
            rt_scale=rt_scale,
        ),
    )


def test_halfres_flagship_close_to_fullres():
    sc = procedural.cornell_box()
    full = np.asarray(Renderer(sc, _flagship_cfg(1), path="hybrid").render_frame())
    r2 = Renderer(sc, _flagship_cfg(2), path="hybrid")
    half = np.asarray(r2.render_frame())
    assert half.shape == full.shape
    assert np.isfinite(half).all()
    # temporal state lives at trace resolution
    assert r2.temporal_state.shadow_ao_history.shape == (2, 32, 48)
    # a quality knob, not a different image: small mean deviation
    diff = np.abs(half[:3] - full[:3])
    assert diff.mean() < 0.04, f"mean abs diff {diff.mean():.4f}"
    # second frame carries the half-res temporal state through cleanly
    assert np.isfinite(np.asarray(r2.render_frame())).all()


def test_halfres_odd_resolution():
    sc = procedural.cornell_box()
    img = np.asarray(
        Renderer(sc, _flagship_cfg(2, w=84, h=52), path="hybrid").render_frame()
    )
    assert img.shape == (4, 52, 84)
    assert np.isfinite(img).all()
