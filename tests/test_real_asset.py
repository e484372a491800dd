"""End-to-end loader validation on a real multi-feature GLB (VERDICT round-1
item 5): the Atrium asset (scene/sample_asset.py) is written by an INDEPENDENT
GLB writer and exercises interleaved byteStride accessors, sparse accessors,
TEXCOORD_1, multi-primitive meshes, node hierarchies, u16+u32 indices, four
materials (textured PBR + normal/MR maps, alpha MASK, factor-only), an
embedded-PNG texture set, a camera node, and a KHR_lights_punctual directional
light.  Reference branches: scene_loader.cpp:102-231 (meshes), 239-309
(textures), 334-349 (cgltf incl. sparse)."""
import numpy as np
import pytest

from vulkanhybridrenderer_tpu.core.config import RenderConfig
from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
from vulkanhybridrenderer_tpu.scene import gltf, sample_asset


@pytest.fixture(scope="module")
def asset(tmp_path_factory):
    path = tmp_path_factory.mktemp("asset") / "Atrium.glb"
    truth = sample_asset.build_sample_glb(path)
    return path, truth


@pytest.fixture(scope="module")
def loaded(asset):
    path, truth = asset
    return gltf.load_scene(path), truth


def test_structure(loaded):
    scene, truth = loaded
    b = scene.buffers
    assert b.num_primitives == truth["prims"] == 11
    assert b.num_triangles > 50
    # four textures landed in the atlas
    assert b.atlas.num_textures == 4
    # alpha-masked primitives present and wired
    am = np.asarray(b.materials.alpha_mask)
    assert (am == 1).sum() == 2
    cut = np.asarray(b.materials.alpha_cutoff)
    np.testing.assert_allclose(cut[am == 1], 0.4)
    # factor-only material keeps its factor; textured ones force 1s
    bc = np.asarray(b.materials.base_color)
    tex = np.asarray(b.materials.base_color_texture)
    assert ((bc[tex >= 0] == 1.0).all())
    assert (np.abs(bc[tex < 0][:, 0] - 0.75) < 1e-6).any()
    # normal map + MR map wired on material 0 primitives
    assert (np.asarray(b.materials.normal_map) >= 0).any()
    assert (np.asarray(b.materials.metallic_roughness_texture) >= 0).any()


def test_interleaved_and_hierarchy(loaded):
    scene, truth = loaded
    b = scene.buffers
    # interleaved floor positions round-trip exactly (byteStride path)
    pos = np.asarray(b.positions)[:4]
    np.testing.assert_array_equal(pos, truth["floor_interleaved_pos"])
    # column node under a parent: world transform composes parent translation
    xf = np.asarray(b.prim_transform)
    # find the transform translating to column0's world position
    found = False
    for p in range(xf.shape[0]):
        t = xf[p, :3, 3]
        if (
            abs(t[0] - truth["column0_world_x"]) < 1e-5
            and abs(t[2] - truth["column0_world_z"]) < 1e-5
        ):
            found = True
    assert found, "parented column transform missing"


def test_sparse_accessor(loaded):
    scene, truth = loaded
    b = scene.buffers
    # the spiky sphere's vertex 0 was displaced by the sparse substitution;
    # find it among the object-space positions
    pos = np.asarray(b.positions)
    target = truth["sparse_vertex0_local"]
    d = np.linalg.norm(pos - target, axis=1)
    assert d.min() < 1e-5, "sparse-displaced vertex not found in loaded positions"


def test_texcoord1(loaded):
    scene, truth = loaded
    b = scene.buffers
    uv1 = np.asarray(b.uv1)
    # the rug's uv1 values (0.25..0.75 range) round-trip
    assert (np.abs(uv1 - 0.25) < 1e-6).any()
    assert (np.abs(uv1 - 0.75) < 1e-6).any()


def test_camera_and_light(loaded):
    scene, _ = loaded
    assert scene.camera is not None
    np.testing.assert_allclose(
        np.asarray(scene.camera.position), [0.0, 2.2, 7.0], atol=1e-5
    )
    assert abs(scene.camera.yfov - 1.0) < 1e-6
    d = np.asarray(scene.light.direction[:3])
    # -45deg about X applied to (0,0,-1): direction goes down and forward
    np.testing.assert_allclose(d, [0.0, -0.7071068, -0.7071068], atol=1e-4)
    np.testing.assert_allclose(np.asarray(scene.light.intensity)[0], 30.0)


@pytest.mark.parametrize("path_name", ["forward", "hybrid", "raytraced", "rayquery"])
def test_render_all_paths(loaded, path_name):
    scene, _ = loaded
    cfg = RenderConfig(width=96, height=96, shadow_map_size=128)
    r = Renderer(scene, cfg, path=path_name)
    img = np.asarray(r.render_frame())
    assert np.isfinite(img).all()
    # scene covers a meaningful part of the frame and is lit non-uniformly
    assert (img[3] > 0).mean() > 0.2, "almost nothing rendered"
    lit = img[:3][:, img[3] > 0]
    assert lit.std() > 0.01, "suspiciously flat image"


def test_atrium_golden(loaded):
    """Golden pin of the Atrium forward render (VERDICT r1 item 5: a golden for
    the real-asset path).  CPU-deterministic: asset generation and rendering
    are both seeded/pure."""
    import pathlib

    scene, _ = loaded
    cfg = RenderConfig(width=96, height=96, shadow_map_size=128)
    r = Renderer(scene, cfg, path="forward")
    img = np.asarray(r.render_frame())
    path = pathlib.Path(__file__).parent / "goldens" / "atrium_forward.npy"
    if not path.exists():
        path.parent.mkdir(exist_ok=True)
        np.save(path, img.astype(np.float16))
        pytest.skip("golden generated; re-run to compare")
    golden = np.load(path).astype(np.float32)
    err = float(np.sqrt(np.mean(
        (np.clip(img, 0, 1) - np.clip(golden, 0, 1)) ** 2
    )))
    assert err <= 2e-3, f"atrium golden RMSE {err:.5f}"


# ---------------------------------------------------------------------------
# Sponza-class benchmark asset (round-3, VERDICT item 9)
# ---------------------------------------------------------------------------
def test_sponza_class_glb(tmp_path):
    """The Sponza-scale generated GLB loads through the full reader with its
    asset-scale properties intact: at scale=1 it carries >= 250k triangles
    and >= 32 distinct textures (BASELINE.md configs 3/5 are real-asset
    scale); a scaled-down variant renders finite frames through the hybrid
    path on CPU."""
    from vulkanhybridrenderer_tpu.core.config import HybridSettings, ShadowMode

    # full-scale structural check (geometry build only -- no render)
    path = tmp_path / "SponzaClass.glb"
    truth = sample_asset.build_sponza_class_glb(path)
    scene = gltf.load_scene(path)
    assert scene.buffers.num_triangles >= 250_000
    assert scene.buffers.atlas.num_textures >= 32
    assert truth["textures"] >= 32
    assert scene.buffers.num_primitives == truth["prims"] >= 300
    assert scene.buffers.has_alpha_mask
    assert scene.buffers.has_normal_maps
    assert scene.buffers.has_mr_textures

    # small-scale end-to-end render (same generator, fewer subdivisions)
    path_s = tmp_path / "SponzaClassSmall.glb"
    sample_asset.build_sponza_class_glb(path_s, scale=0.12)
    small = gltf.load_scene(path_s)
    assert small.buffers.num_triangles > 1000
    cfg = RenderConfig(
        width=128, height=96, shadow_map_size=128,
        hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED),
    )
    r = Renderer(small, cfg, path="hybrid")
    img = np.asarray(r.render_frame())
    assert np.isfinite(img).all()
    assert (img[3] > 0).mean() > 0.5, "frame mostly covered"
