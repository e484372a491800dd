"""bf16 BVH8 gather tables (ops/bvh8.py:table_to_bf16) — the VMEM-residency
lever for big static scenes.  Checks: integer lanes decode exactly, boxes
only grow (conservative directed rounding), traversal answers match the f32
table to quantization (shared vertices quantize identically, so flips are
confined to sub-texel edge cases), and the config/renderer gating."""
import numpy as np
import pytest

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops
from vulkanhybridrenderer_tpu.ops import traverse


def _random_tris(n, seed=0, extent=10.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-extent, extent, (n, 1, 3))
    return jnp.asarray(
        (base + rng.uniform(-0.8, 0.8, (n, 3, 3))).astype(np.float32)
    )


@pytest.fixture(scope="module")
def tables():
    tris = _random_tris(3000)
    binary = bvh_ops.build(tris, leaf_size=1)
    b_f32 = bvh8_ops.build_bvh8_host(binary, tris, prefer_native=False)
    return b_f32, bvh8_ops.table_to_bf16(b_f32), tris


def test_integer_lanes_exact(tables):
    b_f32, b_bf16, _ = tables
    lm = b_f32.leaf_max
    _, base32, off32, tri32 = traverse._decode_row(b_f32.rows, lm)
    _, base16, off16, tri16 = traverse._decode_row(b_bf16.rows, lm)
    leaf = np.asarray(b_f32.is_leaf_rows)
    np.testing.assert_array_equal(
        np.asarray(base32)[~leaf], np.asarray(base16)[~leaf]
    )
    np.testing.assert_array_equal(
        np.asarray(off32)[~leaf], np.asarray(off16)[~leaf]
    )
    np.testing.assert_array_equal(
        np.asarray(tri32)[leaf], np.asarray(tri16)[leaf]
    )


def test_boxes_only_grow(tables):
    b_f32, b_bf16, _ = tables
    rf, _, _, _ = traverse._decode_row(b_f32.rows, b_f32.leaf_max)
    rq, _, _, _ = traverse._decode_row(b_bf16.rows, b_f32.leaf_max)
    leaf = np.asarray(b_f32.is_leaf_rows)
    lo32 = np.asarray(rf)[~leaf, 0:24]
    hi32 = np.asarray(rf)[~leaf, 24:48]
    lo16 = np.asarray(rq)[~leaf, 0:24]
    hi16 = np.asarray(rq)[~leaf, 24:48]
    assert (lo16 <= lo32).all()
    assert (hi16 >= hi32).all()
    # empty-slot sentinels stay inverted (lo > hi)
    inv = lo32 > hi32
    assert (lo16[inv] > hi16[inv]).all()


def test_leaf_flag_and_vertex_error(tables):
    b_f32, b_bf16, _ = tables
    np.testing.assert_array_equal(
        np.asarray(b_f32.is_leaf_rows), np.asarray(b_bf16.is_leaf_rows)
    )
    rf, _, _, _ = traverse._decode_row(b_f32.rows, b_f32.leaf_max)
    rq, _, _, tri16 = traverse._decode_row(b_bf16.rows, b_f32.leaf_max)
    leaf = np.asarray(b_f32.is_leaf_rows)
    valid = np.asarray(tri16)[leaf] >= 0  # (L, 8)
    vmask = np.concatenate([valid] * 9, axis=1)  # (L, 72)
    v32 = np.asarray(rf)[leaf, 0:72]
    v16 = np.asarray(rq)[leaf, 0:72]
    # centroid-relative storage: error = half-ULP of the LEAF-LOCAL offset
    # (2^-8 * |v - c|) + the split-centroid residual (~2^-15 * |c|)
    craw = np.asarray(b_bf16.rows.astype(jnp.float32))[leaf]
    cen = craw[:, 96:99] + craw[:, 99:102]
    cexp = np.concatenate(
        [cen[:, k % 3:k % 3 + 1].repeat(8, axis=1) for k in range(9)], axis=1
    )
    bound = np.abs(v32 - cexp) * 2.0 ** -8 + np.abs(cexp) * 2.0 ** -14 + 1e-5
    err = np.abs(v32 - v16)
    assert (err[vmask] <= bound[vmask]).all()


def _trace_both(tables, anyhit):
    b_f32, b_bf16, _ = tables
    rng = np.random.default_rng(7)
    r = 512
    origin = jnp.asarray(rng.uniform(-12, 12, (r, 3)).astype(np.float32))
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    direction = jnp.asarray(d)
    tmin = jnp.zeros((r,), jnp.float32)
    tmax = jnp.full((r,), 1e4, jnp.float32)
    out = []
    for b in (b_f32, b_bf16):
        t, tri, u, v = traverse._trace8(
            b.rows, b.root, b.depth, origin, direction, tmin, tmax,
            anyhit=anyhit, hit_filter=None, max_steps=4096,
            leaf_max=b.leaf_max,
        )
        out.append((np.asarray(t), np.asarray(tri)))
    return out


def test_closest_hit_parity(tables):
    (t32, tri32), (t16, tri16) = _trace_both(tables, anyhit=False)
    # occlusion answer flips only on sub-quantization edge grazes
    same = (tri32 >= 0) == (tri16 >= 0)
    assert same.mean() >= 0.99
    both = same & (tri32 >= 0)
    # same triangle (or an equally-near one: |t| within quantization)
    close_t = np.abs(t32[both] - t16[both]) <= 4e-2 * np.abs(t32[both]) + 1e-3
    assert close_t.mean() >= 0.99


def test_anyhit_parity(tables):
    (_, tri32), (_, tri16) = _trace_both(tables, anyhit=True)
    assert ((tri32 >= 0) == (tri16 >= 0)).mean() >= 0.99


def test_config_validation():
    from vulkanhybridrenderer_tpu.core.config import RenderConfig

    with pytest.raises(ValueError, match="bvh_dtype"):
        RenderConfig(bvh_dtype="fp8")
    with pytest.raises(ValueError, match="leaf_max 8"):
        RenderConfig(bvh_dtype="bf16", bvh_leaf_max=12)
    with pytest.raises(ValueError, match="static-scene"):
        RenderConfig(bvh_dtype="bf16", animated=True)


def test_refit_rejects_bf16(tables):
    _, b_bf16, tris = tables
    with pytest.raises(ValueError, match="f32 table"):
        bvh8_ops.refit8(b_bf16, tris)


def test_renderer_auto_keeps_small_scenes_f32():
    from vulkanhybridrenderer_tpu.core.config import RenderConfig
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural

    r = Renderer(
        procedural.cornell_box(), RenderConfig(width=64, height=64),
        path="forward",
    )
    assert r._get_bvh().rows.dtype == jnp.float32

    r16 = Renderer(
        procedural.cornell_box(),
        RenderConfig(width=64, height=64, bvh_dtype="bf16"),
        path="forward",
    )
    assert r16._get_bvh().rows.dtype == jnp.bfloat16
