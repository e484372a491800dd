"""Vertex transformation stage.

The reference does per-vertex model/view/projection transforms in vertex shaders
(gbuf.vert:21-28, depth_prepass.vert:14-18).  Here the whole scene transforms in one
batched op per frame: world-space positions/normals via per-vertex gathered primitive
matrices (VPU madds), then a single (V,4) x (4,4) matmul onto clip space (MXU).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.types import SceneBuffers
from vulkanhybridrenderer_tpu.utils.math3d import normalize


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WorldGeometry:
    """Scene vertices in world space (+ per-vertex primitive id)."""

    position: Any  # (V, 3)
    normal: Any  # (V, 3) world-space, normal-matrix transformed
    tangent: Any  # (V, 4) world-space xyz + handedness w
    vertex_prim: Any  # (V,) int32 primitive owning each vertex


def vertex_prim_ids(scene: SceneBuffers) -> jnp.ndarray:
    """(V,) primitive id per vertex.  Vertex ranges per primitive are contiguous
    (scene_loader.cpp:146-147 vertex_offset bookkeeping)."""
    v = scene.num_vertices
    starts = scene.prim_vertex_offset  # (P,) sorted ascending
    vid = jnp.arange(v, dtype=jnp.int32)
    # prim = number of starts <= vid, minus 1
    return (
        jnp.searchsorted(starts, vid, side="right").astype(jnp.int32) - 1
    )


def to_world(scene: SceneBuffers, prim_transform=None, prim_normal_mat=None) -> WorldGeometry:
    """Object -> world for all vertices.

    prim_transform overrides scene.prim_transform for animated scenes (the analogue
    of the reference updating primitive transforms + BLAS refit).
    """
    m = scene.prim_transform if prim_transform is None else prim_transform
    nm = scene.prim_normal_mat if prim_normal_mat is None else prim_normal_mat
    vprim = vertex_prim_ids(scene)

    # ONE packed (P, 24) row gather per vertex: rows 0..2 of the model matrix
    # and of the normal matrix side by side.  Gather cost on TPU is per-INDEX,
    # not per-byte (docs/PERF_STATUS.md rule 2), so this costs V indices where
    # the per-element formulation paid 24 * V — measured 30 ms -> single-digit
    # on the 786k-vertex 1080p frame (round-5 floor attack).  2-D (P, C) row
    # gathers are the proven-fast shape (the BVH8/shadetab tables); gathers
    # with trailing dims like (P, 4, 4) lower ~300x slower.
    packed = jnp.concatenate(
        [m.reshape(-1, 16)[:, :12], nm.reshape(-1, 16)[:, :12]], axis=1
    )  # (P, 24)
    vrows = packed[vprim]  # (V, 24) — THE gather

    def mat_rows(base):
        return [
            [vrows[:, base + i * 4 + j] for j in range(4)] for i in range(3)
        ]  # [i][j] -> (V,)

    def apply(rows, p3, translate):
        x, y, z = p3[:, 0], p3[:, 1], p3[:, 2]
        out = [
            rows[i][0] * x + rows[i][1] * y + rows[i][2] * z
            + (rows[i][3] if translate else 0.0)
            for i in range(3)
        ]
        return jnp.stack(out, axis=-1)

    mv = mat_rows(0)
    nmv = mat_rows(12)
    pos = apply(mv, scene.positions, True)
    nrm = apply(nmv, scene.normals, False)
    tan_xyz = apply(mv, scene.tangents[:, :3], False)
    tan = jnp.concatenate([tan_xyz, scene.tangents[:, 3:]], axis=-1)
    return WorldGeometry(
        position=pos, normal=nrm, tangent=tan, vertex_prim=vprim
    )


def to_clip(world_pos, viewproj) -> jnp.ndarray:
    """(V, 3) world -> (V, 4) clip via one MXU matmul."""
    v4 = jnp.concatenate(
        [world_pos, jnp.ones((world_pos.shape[0], 1), world_pos.dtype)], axis=-1
    )
    return v4 @ viewproj.T


def object_normals_world(scene: SceneBuffers, n_object, prim_ids):
    """Transform per-pixel object-space normals by their primitive's normal matrix
    (gbuf.frag:41: normalize(mat3(normal_matrix) * N))."""
    nm = scene.prim_normal_mat[prim_ids]  # (..., 4, 4)
    n = jnp.einsum("...ij,...j->...i", nm[..., :3, :3], n_object)
    return normalize(n)
