"""Core pytree types shared by host and kernels.

These mirror the C++/GLSL ABI structs of the reference (glsl_common.h:22-99) but as
structure-of-arrays JAX pytrees: interleaved ``Vertex`` becomes parallel (V, k) arrays,
the per-primitive ``Primitive``/``Material`` structs become (P, k) tables, and the
bindless 2048-texture array (resource_manager.h:13) becomes a single texture atlas with
per-texture UV transforms (TPUs have no bindless samplers; the atlas turns texture
sampling into plain gathers from one array).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

pytree = partial(
    jax.tree_util.register_dataclass,
)


def _fields(cls):
    return [f.name for f in dataclasses.fields(cls)]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DirectionalLight:
    """glsl_common.h:52-57."""

    projview: Any  # (4, 4) light-space projection * view
    direction: Any  # (4,) unit direction the light travels (w unused)
    color: Any  # (4,) rgb + 1
    intensity: Any  # (4,) scalar broadcast like the reference's vec4


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PerFrameData:
    """glsl_common.h:59-72 -- per-frame camera/light constants.

    ``frame_index`` is a uint32 scalar array (traced, so frame advance does not
    retrigger compilation).
    """

    camera_view: Any
    camera_proj: Any
    camera_view_inverse: Any
    camera_proj_inverse: Any
    camera_viewproj_inverse: Any
    camera_view_prev_frame: Any
    camera_proj_prev_frame: Any
    directional_light: DirectionalLight
    display_size: Any  # (2,) f32 (w, h)
    display_size_inverse: Any  # (2,) f32
    frame_index: Any  # () uint32
    #: cycling blue-noise texture index (glsl_common.h:71; the reference
    #: cycles 0..3 per frame, renderer.cpp:32-36 — and, like here, no shader
    #: of any render path samples it; the textures ride along for parity and
    #: for user pipelines, Renderer.blue_noise)
    blue_noise_index: Any = None  # () uint32

    @property
    def camera_position(self):
        """World-space camera origin = camera_view_inverse[:, 3] (composition.frag:76)."""
        return self.camera_view_inverse[:3, 3]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaterialsSoA:
    """glsl_common.h:83-92 as (P,)-tables.  Texture slots hold -1 for 'none'."""

    base_color: Any  # (P, 4)
    base_color_texture: Any  # (P,) int32
    metallic_roughness_texture: Any  # (P,) int32
    normal_map: Any  # (P,) int32
    metallic_factor: Any  # (P,)
    roughness_factor: Any  # (P,)
    alpha_mask: Any  # (P,) int32 (1 = masked)
    alpha_cutoff: Any  # (P,)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TextureAtlas:
    """All scene textures packed into one (4, AH, AW) array.

    Per texture t: atlas texel = uv_offset[t] + wrap(uv) * uv_scale[t] (in texels).
    sRGB decode happens at load time like the reference (scene_loader.cpp:239-274
    classifies base-color as SRGB; we convert to linear floats on upload).
    """

    data: Any  # (4, AH, AW) float32 or bfloat16, linear color
    uv_offset: Any  # (N, 2) f32 texel offset (x, y)
    uv_scale: Any  # (N, 2) f32 texel scale (w, h)

    @property
    def num_textures(self) -> int:
        return self.uv_offset.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneBuffers:
    """The device-resident scene: SoA vertices, flattened triangle list, primitive
    table, materials, atlas.  Replaces ResourceManager's global vertex/index/object
    buffers + BLAS/TLAS (resource_manager.cpp:13-28, 593-801); the LBVH over the
    flattened world-space triangles is built separately (ops/bvh.py).
    """

    # Vertices (object space), V total across all primitives
    positions: Any  # (V, 3)
    normals: Any  # (V, 3)
    tangents: Any  # (V, 4)
    uv0: Any  # (V, 2)
    uv1: Any  # (V, 2)
    # Global index buffer and primitive ranges (parity with glsl_common.h:94-99)
    indices: Any  # (I,) int32, relative to each primitive's vertex_offset
    prim_vertex_offset: Any  # (P,) int32
    prim_index_offset: Any  # (P,) int32
    prim_index_count: Any  # (P,) int32
    # Flattened triangle list (derived; what the rasterizer/BVH actually consume)
    tri_vertex: Any  # (T, 3) int32 global vertex ids
    tri_prim: Any  # (T,) int32 primitive id per triangle
    # Primitive table
    prim_transform: Any  # (P, 4, 4) model matrices
    prim_normal_mat: Any  # (P, 4, 4) inverse-transpose rotations
    materials: MaterialsSoA
    atlas: TextureAtlas
    # Alpha-masked triangle subset (rasterized separately by the tiled raster path)
    alpha_tri_idx: Any  # (A,) int32 triangle ids with alpha_mask materials
    #: static: whether the scene contains alpha-masked materials at all
    has_alpha_mask: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    #: static: whether any material has a normal map / metallic-roughness texture.
    #: False lets the resolve passes skip a full bilinear atlas sample per pixel
    #: (the reference's dynamic `normal_map != -1` branch, gbuf.frag:35-44, is free
    #: on a GPU but costs ~16M gathers/frame at 1080p on TPU when always taken).
    has_normal_maps: bool = dataclasses.field(
        default=True, metadata=dict(static=True)
    )
    has_mr_textures: bool = dataclasses.field(
        default=True, metadata=dict(static=True)
    )

    @property
    def num_vertices(self) -> int:
        return self.positions.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.tri_vertex.shape[0]

    @property
    def num_primitives(self) -> int:
        return self.prim_transform.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GBuffer:
    """Hybrid-path G-buffer attachments (gbuf.frag:12-15 outputs), channel-planar.

    normal_oid.w carries the object id as float (gbuf.frag:41); depth is reverse-Z.
    """

    albedo: Any  # (4, H, W)
    normal_oid: Any  # (4, H, W) world normal xyz + object id (-1 = sky)
    motion_mr: Any  # (4, H, W) motion vector xy + metallic + roughness
    depth: Any  # (H, W) reverse-Z depth (0 = far/sky)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TemporalState:
    """SVGF cross-frame state (the reference's storage-image history:
    hybrid_render_path.cpp:245-262).  Carried through the jitted frame function and
    donated each frame."""

    shadow_ao_history: Any  # (2, H, W) integrated shadow (0) and AO (1)
    moments_history: Any  # (4, H, W) shadow m1, m2, ao m1, m2
    prev_normal_oid: Any  # (4, H, W) previous frame world normals + object id


def make_temporal_state(height: int, width: int, dtype=jnp.float32) -> TemporalState:
    return TemporalState(
        shadow_ao_history=jnp.zeros((2, height, width), dtype),
        moments_history=jnp.zeros((4, height, width), dtype),
        prev_normal_oid=jnp.full((4, height, width), -1.0, dtype),
    )


def make_per_frame_data(
    view: np.ndarray,
    proj: np.ndarray,
    light: DirectionalLight,
    width: int,
    height: int,
    frame_index: int = 0,
    prev_view: np.ndarray | None = None,
    prev_proj: np.ndarray | None = None,
) -> PerFrameData:
    """Build PerFrameData exactly like Renderer::Render (renderer.cpp:187-205):
    inverses computed host-side, previous-frame matrices default to current."""
    view = np.asarray(view, np.float32)
    proj = np.asarray(proj, np.float32)
    viewproj = proj @ view
    return PerFrameData(
        camera_view=jnp.asarray(view),
        camera_proj=jnp.asarray(proj),
        camera_view_inverse=jnp.asarray(np.linalg.inv(view).astype(np.float32)),
        camera_proj_inverse=jnp.asarray(np.linalg.inv(proj).astype(np.float32)),
        camera_viewproj_inverse=jnp.asarray(np.linalg.inv(viewproj).astype(np.float32)),
        camera_view_prev_frame=jnp.asarray(
            view if prev_view is None else np.asarray(prev_view, np.float32)
        ),
        camera_proj_prev_frame=jnp.asarray(
            proj if prev_proj is None else np.asarray(prev_proj, np.float32)
        ),
        directional_light=light,
        display_size=jnp.array([width, height], jnp.float32),
        display_size_inverse=jnp.array([1.0 / width, 1.0 / height], jnp.float32),
        frame_index=jnp.asarray(frame_index, jnp.uint32),
        # the reference cycles its 4 blue-noise textures by frame
        # (renderer.cpp:200: frame_index % 4)
        blue_noise_index=jnp.asarray(frame_index % 4, jnp.uint32),
    )
