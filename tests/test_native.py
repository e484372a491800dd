import numpy as np
import jax.numpy as jnp
import pytest

from vulkanhybridrenderer_tpu import native_bridge
from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
from vulkanhybridrenderer_tpu.ops import traverse


def _soup(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-10, 10, (n, 1, 3))
    return jnp.asarray((base + rng.uniform(-0.5, 0.5, (n, 3, 3))).astype(np.float32))


@pytest.mark.skipif(not native_bridge.native_available(), reason="no native toolchain")
def test_native_build_matches_device_build():
    tris = _soup(200, seed=4)
    b_native = native_bridge.build_bvh_host(tris)
    b_device = bvh_ops.build(tris)
    # identical trees: same algorithm, same tie-breaks
    np.testing.assert_array_equal(np.asarray(b_native.order), np.asarray(b_device.order))
    np.testing.assert_array_equal(np.asarray(b_native.left), np.asarray(b_device.left))
    np.testing.assert_array_equal(np.asarray(b_native.escape), np.asarray(b_device.escape))
    np.testing.assert_allclose(
        np.asarray(b_native.aabb_min), np.asarray(b_device.aabb_min), atol=1e-6
    )
    bvh_ops.validate_host(b_native)


@pytest.mark.skipif(not native_bridge.native_available(), reason="no native toolchain")
def test_native_build_traversal_equivalence():
    tris = _soup(300, seed=9)
    b = native_bridge.build_bvh_host(tris)
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.uniform(-12, 12, (32, 3)).astype(np.float32))
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    rec_native = traverse.trace(b, tris, o, d, 0.01, 1e4)
    rec_device = traverse.trace(bvh_ops.build(tris), tris, o, d, 0.01, 1e4)
    np.testing.assert_array_equal(np.asarray(rec_native.tri), np.asarray(rec_device.tri))


@pytest.mark.skipif(not native_bridge.native_available(), reason="no native toolchain")
def test_native_duplicate_codes():
    one = _soup(1)
    tris = jnp.tile(one, (32, 1, 1))
    b = native_bridge.build_bvh_host(tris)
    bvh_ops.validate_host(b)


@pytest.mark.skipif(not native_bridge.native_available(), reason="no native toolchain")
def test_sah_build_structure():
    tris = _soup(257, seed=11)
    b = native_bridge.build_sah_host(tris)
    assert b.num_leaves == 257 and b.leaf_size == 1
    bvh_ops.validate_host(b)  # incl. all 8 octant threadings


@pytest.mark.skipif(not native_bridge.native_available(), reason="no native toolchain")
def test_sah_closest_hit_matches_lbvh():
    tris = _soup(300, seed=12)
    b_sah = native_bridge.build_sah_host(tris)
    b_lbvh = bvh_ops.build(tris)
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-12, 12, (64, 3)).astype(np.float32))
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    rec_sah = traverse.trace(b_sah, tris, o, d, 0.01, 1e4)
    rec_lbvh = traverse.trace(b_lbvh, tris, o, d, 0.01, 1e4)
    # same nearest triangle regardless of builder / traversal order
    np.testing.assert_array_equal(np.asarray(rec_sah.tri), np.asarray(rec_lbvh.tri))
    np.testing.assert_allclose(np.asarray(rec_sah.t), np.asarray(rec_lbvh.t), atol=1e-4)
    # anyhit agrees on hit/miss
    a_sah = traverse.trace(b_sah, tris, o, d, 0.01, 1e4, anyhit=True)
    np.testing.assert_array_equal(
        np.asarray(a_sah.tri >= 0), np.asarray(rec_lbvh.tri >= 0)
    )


@pytest.mark.skipif(not native_bridge.native_available(), reason="no native toolchain")
def test_sah_refit_after_move():
    tris = np.asarray(_soup(64, seed=13))
    b = native_bridge.build_sah_host(tris)
    moved = jnp.asarray(tris + np.array([5.0, 0.0, 0.0], np.float32))
    b2 = bvh_ops.refit(b, moved)
    bvh_ops.validate_host(b2)
    rng = np.random.default_rng(5)
    o = jnp.asarray(rng.uniform(-12, 12, (32, 3)).astype(np.float32) +
                    np.array([5, 0, 0], np.float32))
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    rec = traverse.trace(b2, moved, o, d, 0.01, 1e4)
    rec_ref = traverse.trace(bvh_ops.build(moved), moved, o, d, 0.01, 1e4)
    np.testing.assert_array_equal(np.asarray(rec.tri), np.asarray(rec_ref.tri))


def test_native_bvh8_collapse_matches_python():
    """native/bvh8.cpp must reproduce the Python collapse BIT-IDENTICALLY
    (same greedy expansion, FFD packing, slot probing, allocation order)."""
    import numpy as np
    import jax.numpy as jnp

    from vulkanhybridrenderer_tpu import native_bridge
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops

    if not native_bridge.native_available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    for n in (1, 9, 300, 2000):
        base = rng.uniform(-10, 10, (n, 1, 3))
        tris = jnp.asarray((base + rng.uniform(-0.5, 0.5, (n, 3, 3))).astype(np.float32))
        binary = bvh_ops.build(tris, leaf_size=1)
        py = bvh8_ops.build_bvh8_host(binary, tris, prefer_native=False)
        nat = native_bridge.bvh8_collapse_host(binary, tris)
        assert nat.depth == py.depth
        np.testing.assert_array_equal(np.asarray(nat.rows), np.asarray(py.rows))
        np.testing.assert_array_equal(np.asarray(nat.child8), np.asarray(py.child8))
        np.testing.assert_array_equal(np.asarray(nat.valid8), np.asarray(py.valid8))
        np.testing.assert_array_equal(np.asarray(nat.tri8), np.asarray(py.tri8))
