import numpy as np
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
from vulkanhybridrenderer_tpu.ops import traverse
from vulkanhybridrenderer_tpu.ops.geometry import to_world
from vulkanhybridrenderer_tpu.scene import procedural


def _random_soup(n, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (n, 1, 3))
    tri = base + rng.uniform(-0.5, 0.5, (n, 3, 3))
    return jnp.asarray(tri.astype(np.float32))


def _brute_force_closest(tri_verts, o, d, tmin, tmax):
    t, u, v, ok = traverse.moller_trumbore(
        tri_verts[:, 0], tri_verts[:, 1], tri_verts[:, 2], o[None], d[None]
    )
    t = np.asarray(jnp.where(ok & (t >= tmin) & (t <= tmax), t, np.inf))
    i = int(np.argmin(t))
    return (i, float(t[i])) if np.isfinite(t[i]) else (-1, tmax)


def test_build_structure_small():
    tris = _random_soup(37)
    b = bvh_ops.build(tris)
    bvh_ops.validate_host(b)


def test_build_structure_duplicate_centroids():
    # identical centroids stress the tie-break path
    one = _random_soup(1)
    tris = jnp.tile(one, (16, 1, 1))
    b = bvh_ops.build(tris)
    bvh_ops.validate_host(b)


def test_build_single_triangle():
    tris = _random_soup(1)
    b = bvh_ops.build(tris)
    o = jnp.asarray(np.asarray(tris[0]).mean(0) + np.array([0, 0, 5], np.float32))[None]
    d = jnp.asarray(np.array([[0, 0, -1]], np.float32))
    rec = traverse.trace(b, tris, o, d, 0.0, 100.0)
    assert int(rec.tri[0]) == 0


def test_closest_hit_matches_brute_force():
    tris = _random_soup(300, seed=3)
    b = bvh_ops.build(tris)
    rng = np.random.default_rng(1)
    origins = rng.uniform(-12, 12, (64, 3)).astype(np.float32)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rec = traverse.trace(
        b, tris, jnp.asarray(origins), jnp.asarray(dirs), 0.01, 1000.0
    )
    for i in range(64):
        bf_tri, bf_t = _brute_force_closest(
            tris, jnp.asarray(origins[i]), jnp.asarray(dirs[i]), 0.01, 1000.0
        )
        if bf_tri == -1:
            assert int(rec.tri[i]) == -1
        else:
            assert abs(float(rec.t[i]) - bf_t) < 1e-4, (i, bf_tri, int(rec.tri[i]))


def test_anyhit_consistency():
    tris = _random_soup(200, seed=5)
    b = bvh_ops.build(tris)
    rng = np.random.default_rng(2)
    origins = rng.uniform(-12, 12, (128, 3)).astype(np.float32)
    dirs = rng.normal(size=(128, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    closest = traverse.trace(b, tris, jnp.asarray(origins), jnp.asarray(dirs), 0.01, 1e4)
    any_ = traverse.trace(
        b, tris, jnp.asarray(origins), jnp.asarray(dirs), 0.01, 1e4, anyhit=True
    )
    np.testing.assert_array_equal(
        np.asarray(closest.tri >= 0), np.asarray(any_.tri >= 0)
    )
    # anyhit t must not exceed... it can be any hit; must be >= closest t
    m = np.asarray(closest.tri >= 0)
    assert (np.asarray(any_.t)[m] >= np.asarray(closest.t)[m] - 1e-5).all()


def test_refit_animated():
    tris = _random_soup(64, seed=7)
    b = bvh_ops.build(tris)
    moved = tris + jnp.asarray([5.0, 0.0, 0.0])
    b2 = bvh_ops.refit(b, moved)
    bvh_ops.validate_host(b2)
    # rays that hit the old positions now miss, and vice versa
    o = jnp.asarray(np.array([[20.0, 0.0, 0.0]], np.float32))
    # aim at a known triangle's new centroid
    c = np.asarray(moved[10]).mean(0)
    d = c - np.asarray(o[0])
    d = jnp.asarray((d / np.linalg.norm(d)).astype(np.float32))[None]
    rec = traverse.trace(b2, moved, o, d, 0.01, 1e4)
    assert int(rec.tri[0]) >= 0


def test_shadow_rays_cornell():
    sc = procedural.cornell_box()
    world = to_world(sc.buffers)
    tris = bvh_ops.world_triangles(world.position, sc.buffers.tri_vertex)
    b = bvh_ops.build(tris)
    bvh_ops.validate_host(b)
    l = -np.asarray(sc.light.direction[:3])
    # point on the floor in the tall box's shadow vs in the open
    # light dir (0.25,-0.9,-0.35) normalized -> shadow cast toward -x... probe both
    p_open = np.array([1.5, 0.01, 1.5], np.float32)
    p_under = np.asarray(
        np.array([-0.7, 0.01, -0.6]) - l * 0.5, np.float32
    )  # just below the tall box top surface direction
    o = jnp.asarray(np.stack([p_open, p_under]))
    d = jnp.asarray(np.tile(l[None], (2, 1)).astype(np.float32))
    rec = traverse.trace(b, tris, o, d, 0.01, 1e4, anyhit=True)
    hits = np.asarray(rec.tri >= 0)
    assert not hits[0]  # open floor sees the light (exits through the open front)
    assert hits[1]  # under the tall box -> occluded


def test_alpha_hit_filter():
    sc = procedural.checker_quad(alpha_leaf=True)
    world = to_world(sc.buffers)
    tris = bvh_ops.world_triangles(world.position, sc.buffers.tri_vertex)
    b = bvh_ops.build(tris)
    filt = traverse.make_alpha_hit_filter(sc.buffers)
    # straight down through the transparent corner vs the opaque center
    o = jnp.asarray(
        np.array([[1.9, 2.0, 1.9], [0.0, 2.0, 0.0]], np.float32)
    )
    d = jnp.asarray(np.tile([[0.0, -1.0, 0.0]], (2, 1)).astype(np.float32))
    rec_f = traverse.trace(b, tris, o, d, 0.01, 10.0, anyhit=True, hit_filter=filt)
    rec_o = traverse.trace(b, tris, o, d, 0.01, 10.0, anyhit=True)
    assert np.asarray(rec_o.tri >= 0).all()  # opaque trace hits both
    hits_f = np.asarray(rec_f.tri >= 0)
    assert not hits_f[0]  # corner is transparent -> filtered out
    assert hits_f[1]  # center opaque


def test_leaf_size_4_matches_leaf_size_1():
    tris = _random_soup(300, seed=13)
    b1 = bvh_ops.build(tris, leaf_size=1)
    b4 = bvh_ops.build(tris, leaf_size=4)
    bvh_ops.validate_host(b4)
    rng = np.random.default_rng(5)
    o = jnp.asarray(rng.uniform(-12, 12, (64, 3)).astype(np.float32))
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    r1 = traverse.trace(b1, tris, o, d, 0.01, 1e4)
    r4 = traverse.trace(b4, tris, o, d, 0.01, 1e4)
    np.testing.assert_array_equal(np.asarray(r1.tri), np.asarray(r4.tri))
    np.testing.assert_allclose(np.asarray(r1.t), np.asarray(r4.t), atol=1e-5)
    a1 = traverse.trace(b1, tris, o, d, 0.01, 1e4, anyhit=True)
    a4 = traverse.trace(b4, tris, o, d, 0.01, 1e4, anyhit=True)
    np.testing.assert_array_equal(np.asarray(a1.tri >= 0), np.asarray(a4.tri >= 0))


def test_leaf_size_4_refit():
    tris = _random_soup(50, seed=21)
    b = bvh_ops.build(tris, leaf_size=4)
    moved = tris + jnp.asarray([3.0, 0.0, 0.0])
    b2 = bvh_ops.refit(b, moved)
    bvh_ops.validate_host(b2)
    c = np.asarray(moved[7]).mean(0)
    o = jnp.asarray((c + np.array([0, 0, 9], np.float32))[None])
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    rec = traverse.trace(b2, moved, o, d, 0.01, 1e4)
    assert int(rec.tri[0]) >= 0
