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
