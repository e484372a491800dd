import numpy as np
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.utils import rng
from vulkanhybridrenderer_tpu.ops import brdf, sampling
from vulkanhybridrenderer_tpu.utils.math3d import normalize


def _wang_ref(seed):
    # independent NumPy reimplementation of common.glsl:50-58 for cross-checking
    seed = np.uint32(seed)
    seed = np.uint32((seed ^ np.uint32(61)) ^ (seed >> np.uint32(16)))
    seed = np.uint32(seed * np.uint32(9))
    seed = np.uint32(seed ^ (seed >> np.uint32(4)))
    seed = np.uint32(seed * np.uint32(0x27D4EB2D))
    seed = np.uint32(seed ^ (seed >> np.uint32(15)))
    return seed


def test_wang_hash_matches():
    vals = np.array([0, 1, 61, 12345, 0xFFFFFFFF], dtype=np.uint32)
    with np.errstate(over="ignore"):
        expect = np.array([_wang_ref(v) for v in vals], dtype=np.uint32)
    got = np.asarray(rng.seed_thread(jnp.asarray(vals)))
    np.testing.assert_array_equal(got, expect)


def test_xorshift_sequence():
    # xorshift32 from a known state; reference common.glsl:60-66
    s = np.uint32(0x12345678)
    expect = []
    x = int(s)
    for _ in range(4):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        x &= 0xFFFFFFFF
        expect.append(x)
    state = jnp.asarray(s)
    got = []
    for _ in range(4):
        state, v = rng.next_u32(state)
        got.append(int(v))
    assert got == expect


def test_random01_range_and_determinism():
    state = rng.seed_thread(jnp.arange(1, 1025, dtype=jnp.uint32))
    state, u = rng.random01(state)
    u = np.asarray(u)
    assert (u >= 0).all() and (u < 1).all()
    # decent spread
    assert u.std() > 0.2


def test_pixel_seed_frame0_is_all_equal():
    # parity quirk: frame_index multiplies the linear id (raygen.rgen:18)
    s = rng.pixel_seed(8, 4, 0)
    assert len(np.unique(np.asarray(s))) == 1


def test_cone_sampling_within_cone():
    state = rng.seed_thread(jnp.arange(1, 257, dtype=jnp.uint32))
    state, u1 = rng.random01(state)
    state, u2 = rng.random01(state)
    u = jnp.stack([u1, u2], axis=-1)
    d = sampling.uniform_sample_cone(u, 0.999995)
    d = np.asarray(normalize(d))
    assert (d[:, 2] >= 0.999995 - 1e-6).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_cosine_hemisphere_upper():
    u = jnp.stack(
        [jnp.linspace(0.01, 0.99, 64), jnp.linspace(0.0, 1.0, 64)], axis=-1
    )
    d = np.asarray(sampling.uniform_sample_cosine_hemisphere(u))
    assert (d[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_brdf_energy_sanity():
    n = jnp.array([[0.0, 0.0, 1.0]])
    v = normalize(jnp.array([[0.0, 0.5, 1.0]]))
    l = normalize(jnp.array([[0.0, -0.5, 1.0]]))
    albedo = jnp.array([[0.8, 0.2, 0.1]])
    out = brdf.direct_lighting(
        albedo,
        jnp.array([0.0]),
        jnp.array([0.5]),
        n,
        v,
        l,
        jnp.ones(3),
        jnp.ones(3),
        ambient_factor=0.0,
    )
    out = np.asarray(out)[0]
    assert (out >= 0).all() and np.isfinite(out).all()
    # metallic=1 kills diffuse: specular-only should be grayer than albedo-tinted
    out_m = np.asarray(
        brdf.diffuse_brdf(jnp.array([1.0]), albedo, jnp.zeros((1, 3)))
    )
    np.testing.assert_allclose(out_m, 0.0, atol=1e-7)


def test_fresnel_schlick_limits():
    f0 = jnp.array([[0.04, 0.04, 0.04]])
    n = jnp.array([[0.0, 0.0, 1.0]])
    # grazing: H.V ~ 0 -> F -> 1
    v = jnp.array([[1.0, 0.0, 1e-4]])
    f = np.asarray(brdf.fresnel_schlick(f0, n, v))
    assert (f > 0.99).all()
    # head-on: F = f0
    f = np.asarray(brdf.fresnel_schlick(f0, n, jnp.array([[0.0, 0.0, 1.0]])))
    np.testing.assert_allclose(f, 0.04, atol=1e-6)
