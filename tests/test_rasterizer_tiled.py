import numpy as np
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.ops import geometry, rasterizer
from vulkanhybridrenderer_tpu.ops import rasterizer_tiled as rt
from vulkanhybridrenderer_tpu.ops.gbuffer import make_alpha_frag_mask
from vulkanhybridrenderer_tpu.scene import procedural


def _clip_setup(scene, w, h):
    cam = scene.camera
    viewproj = cam.projection(aspect=w / h) @ cam.view()
    world = geometry.to_world(scene.buffers)
    clip = geometry.to_clip(world.position, jnp.asarray(viewproj))
    setup = rasterizer.triangle_setup(clip, scene.buffers.tri_vertex, w, h)
    return clip, setup


def _assert_vis_equal(a, b, max_edge_frac=0.002):
    """Visibility buffers must agree except on a tiny fraction of borderline
    pixels: (1) exact depth ties on coplanar shared edges, where the binned path's
    small/big processing order differs from submission order, and (2) pixels lying
    exactly on triangle edges, where FMA contraction differences between the two
    compilations flip the sign of ~0 edge functions."""
    tri_a = np.asarray(a.tri_id)
    tri_b = np.asarray(b.tri_id)
    d_a = np.asarray(a.depth)
    d_b = np.asarray(b.depth)
    mism = (tri_a != tri_b) | (np.abs(d_a - d_b) > 1e-6)
    assert mism.mean() <= max_edge_frac, f"visibility mismatch {mism.mean():.4f}"
    agree = ~mism
    np.testing.assert_allclose(d_a[agree], d_b[agree], atol=1e-6)


def test_binned_matches_brute_cornell():
    sc = procedural.cornell_box()
    w, h = 160, 128
    clip, setup = _clip_setup(sc, w, h)
    brute = rasterizer.rasterize(setup, w, h, chunk=64)
    full = rt.rasterize_scene(sc.buffers, clip, w, h, interpret=True)
    _assert_vis_equal(brute, full)
    agree = (np.asarray(brute.tri_id) == np.asarray(full.tri_id))
    bary_a = np.asarray(brute.bary)[agree]
    bary_b = np.asarray(full.bary)[agree]
    np.testing.assert_allclose(bary_a, bary_b, atol=1e-5)


def test_binned_matches_brute_sponza():
    sc = procedural.sponza_proxy(columns=3, segments=6, extra_boxes=20, grid_res=8)
    w, h = 192, 96
    clip, setup = _clip_setup(sc, w, h)
    # render masked geometry solid on both sides for a pure geometric comparison
    brute = rasterizer.rasterize(setup, w, h, chunk=64)
    full = rt.rasterize_scene(sc.buffers, clip, w, h, interpret=True, alpha=False)
    _assert_vis_equal(brute, full)


def test_rasterize_scene_with_alpha():
    sc = procedural.checker_quad(alpha_leaf=True)
    w = h = 64
    clip, setup = _clip_setup(sc, w, h)
    mask_fn = make_alpha_frag_mask(sc.buffers, clip)
    brute = rasterizer.rasterize(setup, w, h, chunk=16, frag_mask_fn=mask_fn)
    full = rt.rasterize_scene(sc.buffers, clip, w, h, interpret=True)
    _assert_vis_equal(brute, full)


def test_big_triangle_path():
    # one huge floor quad spanning many tiles -> exercises the big list
    sc = procedural.pica_proxy(grid=2)
    w, h = 256, 160
    clip, setup = _clip_setup(sc, w, h)
    brute = rasterizer.rasterize(setup, w, h, chunk=64)
    full = rt.rasterize_scene(sc.buffers, clip, w, h, interpret=True)
    _assert_vis_equal(brute, full)
