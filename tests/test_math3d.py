import numpy as np
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.utils import math3d as m3


def test_infinite_reverse_z_projection_depth():
    # reference vulkan_utils.h:494-503: depth = znear / -z_view, w = -z_view
    p = m3.infinite_reverse_z_projection(np.deg2rad(60.0), 16 / 9, 0.1, flip_y=False)
    # Point at z=-0.1 (on near plane) -> depth 1
    h = m3.transform_points(jnp.asarray(p), jnp.array([[0.0, 0.0, -0.1]]))
    assert np.isclose(h[0, 2] / h[0, 3], 1.0, atol=1e-6)
    # Far away -> depth ~ 0
    h = m3.transform_points(jnp.asarray(p), jnp.array([[0.0, 0.0, -1e6]]))
    assert abs(h[0, 2] / h[0, 3]) < 1e-5
    # w = -z_view
    assert np.isclose(h[0, 3], 1e6)


def test_projection_y_flip():
    p = m3.infinite_reverse_z_projection(np.deg2rad(60.0), 1.0, 0.1, flip_y=True)
    # World-up point in view space (+y) must land in the upper half (ndc y < 0).
    h = np.asarray(m3.transform_points(jnp.asarray(p), jnp.array([[0.0, 1.0, -2.0]])))
    assert h[0, 1] / h[0, 3] < 0


def test_ortho_reverse_z_shadow():
    # reference scene_loader.cpp:85: ortho(-8, 8, -8, 8, 12, 0.1) with ZO depth.
    m = m3.ortho(-8, 8, -8, 8, 12.0, 0.1, flip_y=False)
    # z_view = -12 (near plane, 12 units in front) -> depth 0
    h = m3.transform_points(jnp.asarray(m), jnp.array([[0.0, 0.0, -12.0]]))
    assert np.isclose(float(h[0, 2]), 0.0, atol=1e-5)
    # z_view = -0.1 (far plane) -> depth 1 (reverse-Z: closer to light = larger)
    h = m3.transform_points(jnp.asarray(m), jnp.array([[0.0, 0.0, -0.1]]))
    assert np.isclose(float(h[0, 2]), 1.0, atol=1e-5)


def test_look_at_basics():
    v = m3.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0])
    # camera at origin looking down -z: view maps eye->origin
    h = m3.transform_points(jnp.asarray(v), jnp.array([[0.0, 0.0, 5.0]]))
    np.testing.assert_allclose(np.asarray(h)[0, :3], [0, 0, 0], atol=1e-6)
    # a point in front of the camera has negative view z
    h = m3.transform_points(jnp.asarray(v), jnp.array([[0.0, 0.0, 0.0]]))
    assert h[0, 2] < 0


def test_euler_roundtrip():
    yaw, pitch, roll = 0.7, -0.3, 0.2
    m = m3.yaw_pitch_roll(yaw, pitch, roll)
    y2, p2, r2 = m3.extract_euler_yxz(m)
    np.testing.assert_allclose([y2, p2, r2], [yaw, pitch, roll], atol=1e-6)


def test_quat_decompose_rotate():
    m = m3.yaw_pitch_roll(0.5, 0.25, -0.1)
    q = m3.decompose_rotation(m)
    v = np.array([0.0, 0.0, -1.0])
    np.testing.assert_allclose(
        m3.quat_rotate(q, v), (m[:3, :3] @ v).astype(np.float32), atol=1e-6
    )


def test_onb_orthonormal():
    n = m3.normalize(jnp.array([[0.3, -0.5, 0.8], [0.0, 0.0, -1.0], [0.0, 0.0, 1.0]]))
    t, b, nn = m3.onb_from_unit_vector(n)
    for i in range(3):
        np.testing.assert_allclose(float(m3.dot(t[i], b[i])), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(m3.dot(t[i], nn[i])), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(jnp.linalg.norm(t[i])), 1.0, atol=1e-5)
        # right-handed: t x b = n
        np.testing.assert_allclose(
            np.cross(np.asarray(t[i]), np.asarray(b[i])), np.asarray(nn[i]), atol=1e-5
        )


def test_oct_encode_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    e = m3.oct_encode(jnp.asarray(v))
    d = m3.oct_decode(e)
    np.testing.assert_allclose(np.asarray(d), v, atol=2e-6)


def test_normal_matrix():
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.diag([2.0, 1.0, 1.0])
    nm = m3.normal_matrix(m)
    # non-uniform scale: normals scale with inverse-transpose
    np.testing.assert_allclose(nm[:3, :3], np.diag([0.5, 1.0, 1.0]), atol=1e-6)
