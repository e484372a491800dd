"""Wavefront ray traversal over the threaded LBVH (ops/bvh.py).

Replaces vkCmdTraceRaysKHR / rayQuery (raytracing_execution_context.cpp:4-13,
rayquery default.frag:36-44).  TPU-first formulation: the whole ray wavefront steps
through the tree in lockstep -- per iteration every ray does one uniform
gather + slab-test/triangle-test + select; the skip-pointer (escape) threading means
per-ray state is a single node index, no stacks, no divergence beyond masking.

Ray-flag parity:
  * anyhit=True == gl_RayFlagsTerminateOnFirstHitEXT | SkipClosestHit (shadow/AO
    rays, raygen.rgen:39-55): a ray retires at its first accepted hit.
  * hit_filter implements non-opaque any-hit shaders (shadow_anyhit.rahit:22-26
    alpha testing): return False to ignoreIntersectionEXT.
  * closest-hit (anyhit=False) returns the nearest accepted hit with barycentrics
    matching GPU hitAttribute convention (u, v weights of vertices 1, 2).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.ops.bvh import BVH


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HitRecord:
    t: Any  # (R,) hit distance (== tmax when missed)
    tri: Any  # (R,) original triangle index, -1 = miss
    u: Any  # (R,) barycentric of vertex 1
    v: Any  # (R,) barycentric of vertex 2

    @property
    def hit(self):
        return self.tri >= 0


def moller_trumbore(v0, v1, v2, origin, direction, eps: float = 1e-9):
    """Batch Möller-Trumbore, no backface culling (Vulkan RT default: the reference
    sets no cull flags).  All args (..., 3); returns (t, u, v, ok)."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(direction, e2)
    det = jnp.sum(e1 * p, axis=-1)
    ok = jnp.abs(det) > eps
    inv = 1.0 / jnp.where(ok, det, 1.0)
    tvec = origin - v0
    u = jnp.sum(tvec * p, axis=-1) * inv
    q = jnp.cross(tvec, e1)
    v = jnp.sum(direction * q, axis=-1) * inv
    t = jnp.sum(e2 * q, axis=-1) * inv
    ok &= (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, u, v, ok


@partial(jax.jit, static_argnames=("anyhit", "hit_filter", "max_steps"))
def trace(
    bvh: BVH,
    tri_verts,
    origin,
    direction,
    tmin,
    tmax,
    anyhit: bool = False,
    hit_filter: Callable | None = None,
    max_steps: int | None = None,
) -> HitRecord:
    """Trace rays. origin/direction: (R, 3); tmin/tmax scalars or (R,).

    hit_filter(tri (R,), u, v, leaf_mask) -> (R,) bool accept (False = ignore the
    intersection, like ignoreIntersectionEXT).
    """
    r = origin.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))

    d = direction
    safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    inv_d = 1.0 / safe_d

    root = jnp.full((r,), bvh.root, jnp.int32)
    n_nodes = bvh.left.shape[0]
    if max_steps is None:
        max_steps = 4 * n_nodes + 4

    def cond(state):
        node, t_best, tri_best, u_best, v_best, steps = state
        return jnp.any(node >= 0) & (steps < max_steps)

    def body(state):
        node, t_best, tri_best, u_best, v_best, steps = state
        live = node >= 0
        nd = jnp.maximum(node, 0)
        tri_sorted = bvh.leaf_tri[nd]
        is_leaf = tri_sorted >= 0

        # slab test against the node AABB, bounded by the current best t
        lo = bvh.aabb_min[nd]
        hi = bvh.aabb_max[nd]
        t0 = (lo - origin) * inv_d
        t1 = (hi - origin) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = jnp.maximum(tn, tmin) <= jnp.minimum(tf, t_best)

        # leaf: triangle intersection
        tri = jnp.maximum(tri_sorted, 0)
        tv = tri_verts[tri]  # (R, 3, 3)
        t, u, v, ok = moller_trumbore(tv[:, 0], tv[:, 1], tv[:, 2], origin, d)
        ok &= is_leaf & live & (t >= tmin) & (t < t_best)
        if hit_filter is not None:
            ok &= hit_filter(tri, u, v, ok)

        t_best = jnp.where(ok, t, t_best)
        tri_best = jnp.where(ok, tri, tri_best)
        u_best = jnp.where(ok, u, u_best)
        v_best = jnp.where(ok, v, v_best)

        nxt = jnp.where(is_leaf | ~box_hit, bvh.escape[nd], bvh.left[nd])
        if anyhit:
            nxt = jnp.where(ok, -1, nxt)  # terminate on first hit
        node = jnp.where(live, nxt, node)
        return node, t_best, tri_best, u_best, v_best, steps + 1

    init = (
        root,
        tmax,
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
        jnp.int32(0),
    )
    node, t_best, tri_best, u_best, v_best, _ = jax.lax.while_loop(cond, body, init)
    return HitRecord(t=t_best, tri=tri_best, u=u_best, v=v_best)


def make_alpha_hit_filter(scene):
    """Non-opaque any-hit alpha test (shadow_anyhit.rahit:10-26): reject hits whose
    base-color alpha at the hit uv is below the material's cutoff."""
    from vulkanhybridrenderer_tpu.ops.texture import sample_atlas_bilinear

    def hit_filter(tri, u, v, candidate):
        prim = scene.tri_prim[tri]
        masked = scene.materials.alpha_mask[prim] == 1
        tex = scene.materials.base_color_texture[prim]
        vidx = scene.tri_vertex[tri]
        uv0 = scene.uv0[vidx]  # (R, 3, 2)
        w0 = 1.0 - u - v
        uv = (
            uv0[:, 0] * w0[:, None] + uv0[:, 1] * u[:, None] + uv0[:, 2] * v[:, None]
        )
        alpha = sample_atlas_bilinear(scene.atlas, tex, uv)[..., 3]
        reject = masked & (tex >= 0) & (alpha < scene.materials.alpha_cutoff[prim])
        return ~reject

    return hit_filter
