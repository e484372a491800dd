"""glTF 2.0 / GLB scene loader (host side).

A from-scratch reader of the glTF spec subset the reference consumes via cgltf
(scene_loader.cpp:30-350): triangle meshes with POSITION/NORMAL/TANGENT/TEXCOORD_0/1,
indexed geometry, PBR metallic-roughness materials (base color / metallic-roughness /
normal textures, MASK alpha mode), perspective cameras, and KHR_lights_punctual
directional lights.  Produces SoA device buffers + a packed texture atlas instead of
interleaved Vertex structs + bindless textures.

Parity notes:
  * camera -> infinite reverse-Z projection from yfov/aspect/znear
    (scene_loader.cpp:43-71), yaw/pitch extracted YXZ for the fly camera.
  * directional light -> ortho(-8..8, 12, 0.1) projview, direction = rot * (0,0,-1),
    lookAt(-dir * 12, 0, +Y) (scene_loader.cpp:73-100); intensity 2 for Pica.glb else
    30; fallback light (0,-1,0.01) dir, zero intensity when the scene has none
    (scene_loader.cpp:322-329).
  * base-color textures are sRGB, the rest linear (scene_loader.cpp:241-274).
"""
from __future__ import annotations

import base64
import dataclasses
import io
import json
import struct
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.types import (
    DirectionalLight,
    MaterialsSoA,
    SceneBuffers,
)
from vulkanhybridrenderer_tpu.scene.atlas import build_atlas
from vulkanhybridrenderer_tpu.utils import math3d as m3


@dataclasses.dataclass
class Camera:
    """Host-side camera (reference Scene::camera, scene/scene.h)."""

    yfov: float = np.deg2rad(60.0)
    znear: float = 0.1
    aspect: float = 16.0 / 9.0
    yaw: float = 0.0
    pitch: float = 0.0
    roll: float = 0.0
    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32)
    )

    def transform(self) -> np.ndarray:
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = self.position
        return t @ m3.yaw_pitch_roll(self.yaw, self.pitch, self.roll)

    def view(self) -> np.ndarray:
        return np.linalg.inv(self.transform()).astype(np.float32)

    def projection(self, aspect: float | None = None) -> np.ndarray:
        return m3.infinite_reverse_z_projection(
            self.yfov, self.aspect if aspect is None else aspect, self.znear
        )


@dataclasses.dataclass
class Scene:
    """Host-side loaded scene: device buffers + camera + light + name."""

    name: str
    buffers: SceneBuffers
    camera: Camera
    light: DirectionalLight


# ---------------------------------------------------------------------------
# Light / camera construction shared with procedural scenes
# ---------------------------------------------------------------------------
def make_directional_light(
    direction, color=(1.0, 1.0, 1.0), intensity=30.0
) -> DirectionalLight:
    """Reference scene_loader.cpp:84-99."""
    direction = np.asarray(direction, np.float32)
    direction = direction / np.linalg.norm(direction)
    light_perspective = m3.ortho(-8.0, 8.0, -8.0, 8.0, 12.0, 0.1)
    light_view = m3.look_at(-direction * 12.0, [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    return DirectionalLight(
        projview=jnp.asarray(light_perspective @ light_view),
        direction=jnp.asarray(np.append(direction, 0.0).astype(np.float32)),
        color=jnp.asarray(np.append(np.asarray(color, np.float32), 1.0)),
        intensity=jnp.full((4,), float(intensity), jnp.float32),
    )


def fallback_directional_light() -> DirectionalLight:
    """scene_loader.cpp:322-329: present but zero-intensity."""
    return DirectionalLight(
        projview=jnp.eye(4, dtype=jnp.float32),
        direction=jnp.asarray(np.array([0.0, -1.0, 0.01, 0.0], np.float32)),
        color=jnp.asarray(np.array([1.0, 1.0, 1.0, 0.0], np.float32)),
        intensity=jnp.zeros(4, jnp.float32),
    )


def build_scene_buffers(
    positions: np.ndarray,
    normals: np.ndarray,
    tangents: np.ndarray,
    uv0: np.ndarray,
    uv1: np.ndarray,
    indices: np.ndarray,
    primitives: list[dict],
    images: list[np.ndarray] | None = None,
    srgb: list[bool] | None = None,
    atlas_dtype=jnp.float32,
) -> SceneBuffers:
    """Assemble a SceneBuffers pytree from host arrays.

    primitives: list of dicts with keys transform (4,4), vertex_offset, index_offset,
    index_count, and material fields (base_color, base_color_texture,
    metallic_roughness_texture, normal_map, metallic_factor, roughness_factor,
    alpha_mask, alpha_cutoff) -- mirroring glsl_common.h:94-99.
    """
    num_prims = len(primitives)
    prim_transform = np.stack(
        [np.asarray(p["transform"], np.float32) for p in primitives]
    )
    prim_normal = np.stack([m3.normal_matrix(t) for t in prim_transform])

    def field(name, default):
        return np.asarray(
            [p.get(name, default) for p in primitives], dtype=np.float32
        )

    def ifield(name, default):
        return np.asarray([p.get(name, default) for p in primitives], dtype=np.int32)

    materials = MaterialsSoA(
        base_color=jnp.asarray(
            np.stack(
                [np.asarray(p.get("base_color", (1, 1, 1, 1)), np.float32) for p in primitives]
            )
            if num_prims
            else np.zeros((0, 4), np.float32)
        ),
        base_color_texture=jnp.asarray(ifield("base_color_texture", -1)),
        metallic_roughness_texture=jnp.asarray(
            ifield("metallic_roughness_texture", -1)
        ),
        normal_map=jnp.asarray(ifield("normal_map", -1)),
        metallic_factor=jnp.asarray(field("metallic_factor", 1.0)),
        roughness_factor=jnp.asarray(field("roughness_factor", 1.0)),
        alpha_mask=jnp.asarray(ifield("alpha_mask", 0)),
        alpha_cutoff=jnp.asarray(field("alpha_cutoff", 0.0)),
    )

    vtx_off = ifield("vertex_offset", 0)
    idx_off = ifield("index_offset", 0)
    idx_cnt = ifield("index_count", 0)

    # Flatten to a global triangle list (what the rasterizer / LBVH consume).
    tri_vertex = []
    tri_prim = []
    indices = np.asarray(indices, np.int32)
    for p in range(num_prims):
        idx = indices[idx_off[p] : idx_off[p] + idx_cnt[p]].reshape(-1, 3)
        tri_vertex.append(idx + vtx_off[p])
        tri_prim.append(np.full(len(idx), p, np.int32))
    tri_vertex = (
        np.concatenate(tri_vertex) if tri_vertex else np.zeros((0, 3), np.int32)
    )
    tri_prim = np.concatenate(tri_prim) if tri_prim else np.zeros((0,), np.int32)

    # Alpha-masked triangle subset (consumed by the tiled rasterizer, which
    # rasterizes masked geometry separately -- see ops/rasterizer_tiled.py).
    alpha_mask_np = np.asarray([p.get("alpha_mask", 0) for p in primitives], np.int32)
    tri_masked = alpha_mask_np[tri_prim] == 1 if len(tri_prim) else np.zeros(0, bool)
    alpha_tri_idx = np.nonzero(tri_masked)[0].astype(np.int32)
    has_alpha = bool(alpha_tri_idx.size)

    return SceneBuffers(
        positions=jnp.asarray(positions, jnp.float32),
        normals=jnp.asarray(normals, jnp.float32),
        tangents=jnp.asarray(tangents, jnp.float32),
        uv0=jnp.asarray(uv0, jnp.float32),
        uv1=jnp.asarray(uv1, jnp.float32),
        indices=jnp.asarray(indices, jnp.int32),
        prim_vertex_offset=jnp.asarray(vtx_off),
        prim_index_offset=jnp.asarray(idx_off),
        prim_index_count=jnp.asarray(idx_cnt),
        tri_vertex=jnp.asarray(tri_vertex),
        tri_prim=jnp.asarray(tri_prim),
        prim_transform=jnp.asarray(prim_transform),
        prim_normal_mat=jnp.asarray(prim_normal),
        materials=materials,
        atlas=build_atlas(images or [], srgb, dtype=atlas_dtype),
        alpha_tri_idx=jnp.asarray(alpha_tri_idx),
        has_alpha_mask=has_alpha,
        has_normal_maps=bool((np.asarray(ifield("normal_map", -1)) >= 0).any()),
        has_mr_textures=bool(
            (np.asarray(ifield("metallic_roughness_texture", -1)) >= 0).any()
        ),
    )


# ---------------------------------------------------------------------------
# glTF parsing
# ---------------------------------------------------------------------------
_COMPONENT_DTYPES = {
    5120: np.int8,
    5121: np.uint8,
    5122: np.int16,
    5123: np.uint16,
    5125: np.uint32,
    5126: np.float32,
}
_TYPE_COUNTS = {
    "SCALAR": 1,
    "VEC2": 2,
    "VEC3": 3,
    "VEC4": 4,
    "MAT2": 4,
    "MAT3": 9,
    "MAT4": 16,
}


class _Gltf:
    def __init__(self, path: Path):
        self.path = path
        raw = path.read_bytes()
        if raw[:4] == b"glTF":
            magic, version, length = struct.unpack_from("<III", raw, 0)
            offset = 12
            self.json = None
            self.bin = None
            while offset < length:
                chunk_len, chunk_type = struct.unpack_from("<II", raw, offset)
                chunk = raw[offset + 8 : offset + 8 + chunk_len]
                if chunk_type == 0x4E4F534A:  # JSON
                    self.json = json.loads(chunk)
                elif chunk_type == 0x004E4942:  # BIN
                    self.bin = chunk
                offset += 8 + chunk_len
        else:
            self.json = json.loads(raw)
            self.bin = None
        self.buffers = [self._load_buffer(b) for b in self.json.get("buffers", [])]

    def _load_buffer(self, buf: dict) -> bytes:
        uri = buf.get("uri")
        if uri is None:
            return self.bin
        if uri.startswith("data:"):
            return base64.b64decode(uri.split(",", 1)[1])
        return (self.path.parent / uri).read_bytes()

    def buffer_view_bytes(self, view_idx: int) -> bytes:
        view = self.json["bufferViews"][view_idx]
        data = self.buffers[view["buffer"]]
        off = view.get("byteOffset", 0)
        return data[off : off + view["byteLength"]]

    def accessor(self, idx: int) -> np.ndarray:
        acc = self.json["accessors"][idx]
        dtype = _COMPONENT_DTYPES[acc["componentType"]]
        ncomp = _TYPE_COUNTS[acc["type"]]
        count = acc["count"]
        if "bufferView" not in acc:
            out = np.zeros((count, ncomp), dtype)
        else:
            view = self.json["bufferViews"][acc["bufferView"]]
            data = self.buffers[view["buffer"]]
            base = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
            stride = view.get("byteStride") or (np.dtype(dtype).itemsize * ncomp)
            if stride == np.dtype(dtype).itemsize * ncomp:
                out = np.frombuffer(
                    data, dtype, count * ncomp, offset=base
                ).reshape(count, ncomp)
            else:
                rows = np.frombuffer(
                    data, np.uint8, count * stride, offset=base
                ).reshape(count, stride)
                out = rows[:, : np.dtype(dtype).itemsize * ncomp].copy().view(dtype)
        sparse = acc.get("sparse")
        if sparse:
            # glTF 2.0 sparse accessors: substitute `count` rows of `values`
            # at positions `indices` (both tightly packed in their own views).
            # (The reference gets this from cgltf, scene_loader.cpp:334-349.)
            n = sparse["count"]
            isec = sparse["indices"]
            idt = _COMPONENT_DTYPES[isec["componentType"]]
            iview = self.json["bufferViews"][isec["bufferView"]]
            ibase = iview.get("byteOffset", 0) + isec.get("byteOffset", 0)
            sidx = np.frombuffer(
                self.buffers[iview["buffer"]], idt, n, offset=ibase
            ).astype(np.int64)
            vsec = sparse["values"]
            vview = self.json["bufferViews"][vsec["bufferView"]]
            vbase = vview.get("byteOffset", 0) + vsec.get("byteOffset", 0)
            vals = np.frombuffer(
                self.buffers[vview["buffer"]], dtype, n * ncomp, offset=vbase
            ).reshape(n, ncomp)
            out = np.array(out)
            out[sidx] = vals
        if acc.get("normalized"):
            info = np.iinfo(dtype)
            out = out.astype(np.float32) / float(info.max)
        return np.array(out)

    def image_pixels(self, image_idx: int) -> np.ndarray:
        from PIL import Image  # stbi_load equivalent (scene_loader.cpp:283-291)

        img = self.json["images"][image_idx]
        if "uri" in img and not img["uri"].startswith("data:"):
            pil = Image.open(self.path.parent / img["uri"])
        else:
            if "uri" in img:
                blob = base64.b64decode(img["uri"].split(",", 1)[1])
            else:
                blob = self.buffer_view_bytes(img["bufferView"])
            pil = Image.open(io.BytesIO(blob))
        return np.asarray(pil.convert("RGBA"))


def _node_world_transforms(doc: dict) -> list[np.ndarray]:
    nodes = doc.get("nodes", [])
    parents = {}
    for i, n in enumerate(nodes):
        for c in n.get("children", []):
            parents[c] = i

    def local(n):
        if "matrix" in n:
            return np.asarray(n["matrix"], np.float32).reshape(4, 4).T  # column-major
        t = np.eye(4, dtype=np.float32)
        if "translation" in n:
            tt = np.eye(4, dtype=np.float32)
            tt[:3, 3] = n["translation"]
            t = t @ tt
        if "rotation" in n:
            x, y, z, w = n["rotation"]
            r = np.eye(4, dtype=np.float32)
            q = np.array([w, x, y, z])
            r[:3, :3] = np.stack(
                [
                    m3.quat_rotate(q, np.array([1.0, 0, 0])),
                    m3.quat_rotate(q, np.array([0, 1.0, 0])),
                    m3.quat_rotate(q, np.array([0, 0, 1.0])),
                ],
                axis=1,
            )
            t = t @ r
        if "scale" in n:
            s = np.eye(4, dtype=np.float32)
            s[0, 0], s[1, 1], s[2, 2] = n["scale"]
            t = t @ s
        return t

    memo: dict[int, np.ndarray] = {}

    def world(i):
        if i in memo:
            return memo[i]
        m = local(nodes[i])
        if i in parents:
            m = world(parents[i]) @ m
        memo[i] = m
        return m

    return [world(i) for i in range(len(nodes))]


def load_scene(path: str | Path, atlas_dtype=jnp.float32) -> Scene:
    """Load a .gltf/.glb file into a Scene (reference SceneLoader::LoadScene)."""
    path = Path(path)
    g = _Gltf(path)
    doc = g.json
    name = path.name

    # ---- textures: classify sRGB (base color) vs linear, dedupe ----------------
    materials = doc.get("materials", [])
    tex_format_srgb: dict[int, bool] = {}
    for mat in materials:
        pbr = mat.get("pbrMetallicRoughness", {})
        if "baseColorTexture" in pbr:
            tex_format_srgb.setdefault(pbr["baseColorTexture"]["index"], True)
        if "metallicRoughnessTexture" in pbr:
            tex_format_srgb.setdefault(pbr["metallicRoughnessTexture"]["index"], False)
        if "normalTexture" in mat:
            tex_format_srgb.setdefault(mat["normalTexture"]["index"], False)
    tex_ids = sorted(tex_format_srgb)
    tex_slot = {t: i for i, t in enumerate(tex_ids)}
    images, srgb_flags = [], []
    textures = doc.get("textures", [])
    for t in tex_ids:
        images.append(g.image_pixels(textures[t]["source"]))
        srgb_flags.append(tex_format_srgb[t])

    def slot(tex_index):
        return tex_slot.get(tex_index, -1) if tex_index is not None else -1

    # ---- meshes -----------------------------------------------------------------
    world = _node_world_transforms(doc)
    positions, normals, tangents, uv0s, uv1s, indices = [], [], [], [], [], []
    prims: list[dict] = []
    v_total = 0
    i_total = 0
    camera = None
    light = None

    ext_lights = (
        doc.get("extensions", {}).get("KHR_lights_punctual", {}).get("lights", [])
    )

    for ni, node in enumerate(doc.get("nodes", [])):
        xform = world[ni]
        if "camera" in node:
            cam = doc["cameras"][node["camera"]]
            if cam.get("type") == "perspective":
                p = cam["perspective"]
                yaw, pitch, roll = m3.extract_euler_yxz(xform)
                camera = Camera(
                    yfov=p["yfov"],
                    znear=p.get("znear", 0.1),
                    aspect=p.get("aspectRatio", 16.0 / 9.0),
                    yaw=yaw,
                    pitch=pitch,
                    roll=roll,
                    position=np.asarray(xform[:3, 3], np.float32),
                )
            continue
        nl = node.get("extensions", {}).get("KHR_lights_punctual", {}).get("light")
        if nl is not None and ext_lights and ext_lights[nl]["type"] == "directional":
            q = m3.decompose_rotation(xform)
            direction = m3.quat_rotate(q, np.array([0.0, 0.0, -1.0]))
            intensity = 2.0 if name == "Pica.glb" else 30.0
            light = make_directional_light(
                direction,
                color=ext_lights[nl].get("color", [1.0, 1.0, 1.0]),
                intensity=intensity,
            )
            continue
        if "mesh" not in node:
            continue
        mesh = doc["meshes"][node["mesh"]]
        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:  # triangles only, like the reference
                continue
            attrs = prim["attributes"]
            pos = g.accessor(attrs["POSITION"]).astype(np.float32)
            vcount = len(pos)
            nrm = (
                g.accessor(attrs["NORMAL"]).astype(np.float32)
                if "NORMAL" in attrs
                else np.zeros((vcount, 3), np.float32)
            )
            tan = (
                g.accessor(attrs["TANGENT"]).astype(np.float32)
                if "TANGENT" in attrs
                else np.zeros((vcount, 4), np.float32)
            )
            uv0 = (
                g.accessor(attrs["TEXCOORD_0"]).astype(np.float32)
                if "TEXCOORD_0" in attrs
                else np.zeros((vcount, 2), np.float32)
            )
            uv1 = (
                g.accessor(attrs["TEXCOORD_1"]).astype(np.float32)
                if "TEXCOORD_1" in attrs
                else np.zeros((vcount, 2), np.float32)
            )
            idx = g.accessor(prim["indices"]).reshape(-1).astype(np.int32)

            mat = materials[prim["material"]] if "material" in prim else {}
            pbr = mat.get("pbrMetallicRoughness", {})
            base_color_tex = slot(pbr.get("baseColorTexture", {}).get("index"))
            entry = {
                "transform": xform,
                "vertex_offset": v_total,
                "index_offset": i_total,
                "index_count": len(idx),
                # cgltf semantics (scene_loader.cpp:195-203): factor defaults to 1s
                # and is only taken when there is no base color texture.
                "base_color": np.asarray(
                    pbr.get("baseColorFactor", [1, 1, 1, 1]), np.float32
                )
                if base_color_tex < 0
                else np.ones(4, np.float32),
                "base_color_texture": base_color_tex,
                "metallic_roughness_texture": slot(
                    pbr.get("metallicRoughnessTexture", {}).get("index")
                ),
                "normal_map": slot(mat.get("normalTexture", {}).get("index")),
                "metallic_factor": pbr.get("metallicFactor", 1.0),
                "roughness_factor": pbr.get("roughnessFactor", 1.0),
                "alpha_mask": 1 if mat.get("alphaMode") == "MASK" else 0,
                "alpha_cutoff": mat.get("alphaCutoff", 0.5)
                if mat.get("alphaMode") == "MASK"
                else 0.0,
            }
            positions.append(pos)
            normals.append(nrm)
            tangents.append(tan)
            uv0s.append(uv0)
            uv1s.append(uv1)
            indices.append(idx)
            prims.append(entry)
            v_total += vcount
            i_total += len(idx)

    if light is None:
        light = fallback_directional_light()
    if camera is None:
        camera = Camera(position=np.array([0.0, 1.0, 3.0], np.float32))

    buffers = build_scene_buffers(
        np.concatenate(positions) if positions else np.zeros((0, 3), np.float32),
        np.concatenate(normals) if normals else np.zeros((0, 3), np.float32),
        np.concatenate(tangents) if tangents else np.zeros((0, 4), np.float32),
        np.concatenate(uv0s) if uv0s else np.zeros((0, 2), np.float32),
        np.concatenate(uv1s) if uv1s else np.zeros((0, 2), np.float32),
        np.concatenate(indices) if indices else np.zeros((0,), np.int32),
        prims,
        images,
        srgb_flags,
        atlas_dtype=atlas_dtype,
    )
    return Scene(name=name, buffers=buffers, camera=camera, light=light)
