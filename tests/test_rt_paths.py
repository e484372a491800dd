import numpy as np

from vulkanhybridrenderer_tpu.core.config import RenderConfig, RaytracedSettings
from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
from vulkanhybridrenderer_tpu.scene import procedural


def _cfg(**kw):
    return RenderConfig(width=96, height=64, shadow_map_size=128, **kw)


def test_raytraced_path_end_to_end():
    sc = procedural.cornell_box()
    r = Renderer(sc, _cfg(), path="raytraced")
    img = np.asarray(r.render_frame())
    assert img.shape == (4, 64, 96)
    assert np.isfinite(img).all()
    # sky visible around the box opening edges: (0.3, 0.8, 0.2)
    corner = img[:3, 0, 0]
    np.testing.assert_allclose(corner, [0.3, 0.8, 0.2], atol=1e-5)
    # interior: red wall left / green wall right as in the raster path
    left = img[:3, 32, 12]
    right = img[:3, 32, 83]
    assert left[0] > left[1] and right[1] > right[0]
    # shadows exist: some interior pixels darker than lit floor
    assert img[:3].std() > 0.05


def test_raytraced_shadows_differ_from_unshadowed():
    sc = procedural.cornell_box()
    r = Renderer(sc, _cfg(), path="raytraced")
    img = np.asarray(r.render_frame())
    # the tall box must cast a shadow: pixels on the floor where direct light is
    # blocked have only ambient albedo/pi; check a dark-to-lit contrast on floor
    floor_rows = img[:3, 55:63, :]
    assert floor_rows.max() > 2.0 * max(floor_rows.min(), 1e-3)


def test_raytraced_alpha_mode():
    sc = procedural.checker_quad(alpha_leaf=True)
    r = Renderer(sc, _cfg(raytraced=RaytracedSettings(test_alpha=True)),
                 path="raytraced")
    img = np.asarray(r.render_frame())
    assert np.isfinite(img).all()
    # through the transparent corner of the leaf quad we must see sky
    assert (np.abs(img[:3, 2, 2] - np.array([0.3, 0.8, 0.2])) < 1e-4).all()


def test_rayquery_path_end_to_end():
    sc = procedural.cornell_box()
    r = Renderer(sc, _cfg(), path="rayquery")
    img = np.asarray(r.render_frame())
    assert img.shape == (4, 64, 96)
    assert np.isfinite(img).all()
    left = img[:3, 32, 12]
    right = img[:3, 32, 83]
    assert left[0] > left[1] and right[1] > right[0]


def test_animated_refit_path():
    sc = procedural.pica_proxy(grid=2)
    r = Renderer(sc, _cfg(animated=True), path="raytraced")
    img0 = np.asarray(r.render_frame())
    r.animate(procedural.animate_pica(sc, 0.8))
    img1 = np.asarray(r.render_frame())
    assert np.isfinite(img1).all()
    assert np.abs(img1 - img0).mean() > 1e-4  # boxes moved
