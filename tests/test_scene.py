import json
import struct

import numpy as np
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.scene import procedural, gltf
from vulkanhybridrenderer_tpu.scene.atlas import build_atlas, srgb_to_linear
from vulkanhybridrenderer_tpu.ops.texture import sample_atlas_bilinear, sample_or_factor


def test_cornell_box_buffers():
    sc = procedural.cornell_box()
    bufs = sc.buffers
    assert bufs.num_triangles > 0
    assert bufs.tri_vertex.shape[1] == 3
    assert int(jnp.max(bufs.tri_vertex)) < bufs.num_vertices
    assert bufs.prim_transform.shape == (bufs.num_primitives, 4, 4)
    assert bufs.materials.base_color.shape == (bufs.num_primitives, 4)
    # light points mostly downward
    assert float(sc.light.direction[1]) < 0


def test_sponza_proxy_scale():
    sc = procedural.sponza_proxy(columns=4, segments=8, extra_boxes=20, grid_res=8)
    assert sc.buffers.num_triangles > 800
    # alpha-masked prims exist
    assert int(jnp.sum(sc.buffers.materials.alpha_mask)) > 0
    # textures packed
    assert sc.buffers.atlas.num_textures == 3


def test_atlas_sampling_flat_color():
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 0] = 200
    img[..., 3] = 255
    atlas = build_atlas([img], [False])
    uv = jnp.array([[0.5, 0.5], [0.1, 0.9]])
    tex = jnp.array([0, 0])
    out = np.asarray(sample_atlas_bilinear(atlas, tex, uv))
    np.testing.assert_allclose(out[:, 0], 200 / 255.0, atol=1e-5)
    np.testing.assert_allclose(out[:, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[:, 3], 1.0, atol=1e-6)


def test_atlas_sampling_bilinear_interp():
    # 2x1 texture: left black, right white; sample center -> 0.5
    img = np.zeros((1, 2, 4), np.float32)
    img[0, 1] = 1.0
    atlas = build_atlas([img], [False])
    out = np.asarray(
        sample_atlas_bilinear(atlas, jnp.array([0]), jnp.array([[0.5, 0.5]]))
    )
    np.testing.assert_allclose(out[0, 0], 0.5, atol=1e-5)


def test_sample_or_factor_fallback():
    atlas = build_atlas([], [])
    factor = jnp.array([[0.3, 0.4, 0.5, 1.0]])
    out = np.asarray(
        sample_or_factor(atlas, jnp.array([-1]), jnp.array([[0.2, 0.2]]), factor)
    )
    np.testing.assert_allclose(out, np.asarray(factor), atol=1e-6)


def test_srgb_roundtrip_monotone():
    x = np.linspace(0, 1, 32)
    y = srgb_to_linear(x)
    assert (np.diff(y) > 0).all()
    assert y[0] == 0.0 and abs(y[-1] - 1.0) < 1e-6


def _write_minimal_glb(path):
    """Build a tiny GLB (one triangle, camera, directional light) from scratch."""
    positions = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.tile(np.asarray([[0, 0, 1]], np.float32), (3, 1))
    indices = np.asarray([0, 1, 2], np.uint16)
    bin_data = positions.tobytes() + normals.tobytes() + indices.tobytes()
    pad = (4 - len(bin_data) % 4) % 4
    bin_data += b"\x00" * pad
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2]}],
        "nodes": [
            {"mesh": 0, "translation": [0, 0, 0]},
            {"camera": 0, "translation": [0, 0, 3]},
            {
                "extensions": {"KHR_lights_punctual": {"light": 0}},
                "rotation": [-0.7071, 0, 0, 0.7071],  # points -z down to -y
            },
        ],
        "extensions": {
            "KHR_lights_punctual": {
                "lights": [{"type": "directional", "color": [1, 0.9, 0.8]}]
            }
        },
        "cameras": [
            {
                "type": "perspective",
                "perspective": {"yfov": 1.0, "znear": 0.1, "aspectRatio": 1.5},
            }
        ],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1},
                        "indices": 2,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.5, 0.25, 0.125, 1.0],
                    "metallicFactor": 0.0,
                    "roughnessFactor": 0.5,
                }
            }
        ],
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
    }
    js = json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_data)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(bin_data), 0x004E4942))
        f.write(bin_data)


def test_glb_loader(tmp_path):
    p = tmp_path / "tri.glb"
    _write_minimal_glb(p)
    sc = gltf.load_scene(p)
    assert sc.buffers.num_triangles == 1
    assert sc.buffers.num_vertices == 3
    np.testing.assert_allclose(
        np.asarray(sc.buffers.materials.base_color[0]), [0.5, 0.25, 0.125, 1.0]
    )
    # camera parsed
    assert abs(sc.camera.yfov - 1.0) < 1e-6
    assert abs(sc.camera.aspect - 1.5) < 1e-6
    np.testing.assert_allclose(sc.camera.position, [0, 0, 3], atol=1e-6)
    # light: rotation -90deg about x maps (0,0,-1) -> (0,-1,0)... direction downward
    d = np.asarray(sc.light.direction)
    assert d[1] < -0.9
    # non-Pica scene -> intensity 30 (scene_loader.cpp:97)
    assert float(sc.light.intensity[0]) == 30.0


def test_pica_animation():
    sc = procedural.pica_proxy(grid=2)
    t0 = np.asarray(sc.buffers.prim_transform)
    t1 = np.asarray(procedural.animate_pica(sc, 0.5))
    assert t1.shape == t0.shape
    # floor static, boxes moved
    np.testing.assert_allclose(t1[0], t0[0])
    assert np.abs(t1[1:] - t0[1:]).max() > 1e-3
