"""LBVH build + refit (replaces the reference's BLAS/TLAS hardware acceleration
structures, resource_manager.cpp:593-801).

TPU-first design decisions:
  * The whole scene gets ONE binary LBVH over its world-space triangles -- the
    reference builds one BLAS whose geometries are the primitives and a TLAS with a
    single identity-transform instance (resource_manager.cpp:703-801), so a single
    tree is semantically equivalent.
  * Construction is the Karras 2012 parallel radix-tree build, expressed entirely as
    vectorized jnp ops (clz/δ prefix comparisons, masked binary searches) so it runs
    on-device and can rebuild inside a jitted step; per-frame *refit* (animated
    scenes, like the reference's UpdateBLAS on geometry change) reuses the topology
    and only recomputes AABBs bottom-up.
  * Nodes carry *escape links* (skip pointers): traversal needs no per-ray stack --
    per step a ray holds just one node index.  Divergent stack walks are the worst
    fit for a vector machine; the threaded tree turns traversal into uniform
    gather + select steps over the whole ray wavefront (see ops/traverse.py).

Layout (2N-1 nodes, SoA): node ids 0..N-2 internal, N-1..2N-2 leaves (leaf k holds
sorted-triangle k).  INVALID = -1 terminates traversal.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

INVALID = jnp.int32(-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BVH:
    """Threaded LBVH over L = ceil(T / leaf_size) leaves.

    leaf_size > 1 groups `leaf_size` morton-consecutive triangles per leaf: the
    tree has ~leaf_size x fewer nodes, so the lockstep traversal walks far fewer
    steps at the cost of `leaf_size` triangle tests per leaf visit (a good trade
    on TPU, where per-step full-wavefront overhead dominates).
    """

    aabb_min: Any  # (2L-1, 3)
    aabb_max: Any  # (2L-1, 3)
    left: Any  # (2L-1,) global node id of left child (-1 for leaves)
    right: Any  # (2L-1,) global node id of right child (-1 for leaves)
    escape: Any  # (2L-1,) next node if this subtree is skipped / done (-1 = exit)
    #: for leaves: start index into `order` (= group * leaf_size); -1 for internal
    leaf_tri: Any  # (2L-1,)
    #: (L * leaf_size,) morton-sorted original triangle ids, padded with -1
    order: Any
    #: (8, 2L-1) per-direction-octant ordered threading: next8[o, i] = first-visited
    #: child of internal node i for rays in octant o (near child first); esc8[o, i] =
    #: the node after i's subtree in octant-o order (-1 = exit).  Octant bit
    #: convention: o = (dx<0)<<2 | (dy<0)<<1 | (dz<0).  See octant_links().
    next8: Any = None
    esc8: Any = None
    leaf_size: int = dataclasses.field(default=1, metadata=dict(static=True))

    @property
    def num_leaves(self) -> int:
        return self.order.shape[0] // self.leaf_size

    @property
    def root(self) -> int:
        return 0 if self.num_leaves > 1 else self.num_leaves - 1  # L==1 -> leaf 0


def _clz32(x):
    return jax.lax.clz(x.astype(jnp.int32)).astype(jnp.int32)


def _expand_bits(v):
    """Spread 10 bits to every 3rd position (standard morton interleave)."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(points, lo, hi):
    """30-bit morton codes of points normalized into the scene AABB [lo, hi]."""
    x = jnp.clip((points - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
    q = jnp.minimum((x * 1024.0).astype(jnp.uint32), jnp.uint32(1023))
    return (
        (_expand_bits(q[..., 0]) << 2)
        | (_expand_bits(q[..., 1]) << 1)
        | _expand_bits(q[..., 2])
    )


def triangle_aabbs(tri_verts, pad: float = 1e-6):
    """tri_verts: (T, 3, 3) -> (lo (T,3), hi (T,3)), epsilon-padded for flat tris."""
    lo = jnp.min(tri_verts, axis=1) - pad
    hi = jnp.max(tri_verts, axis=1) + pad
    return lo, hi


def _ceil_log2(n: int) -> int:
    return max(1, (n - 1).bit_length())


def _octant_links(left_g, right_g, amin, amax, num_internal, max_depth):
    """Per-direction-octant ordered threading: (next8, esc8), each (8, total) i32.

    Ordered traversal is the TPU replacement for the GPU's hardware traversal
    ordering: for internal node i, octant-o rays visit the NEAR child first (the
    child whose centroid is lower along the node's dominant separation axis when
    the ray direction is positive along it, the other child otherwise).  Near-
    child-first makes tmax shortening (closest hit) and terminate-on-first-hit
    (shadow/AO anyhit, raygen.rgen:31-41) prune most of the tree.  Octant bits:
    o = (dx<0)<<2 | (dy<0)<<1 | (dz<0).
    """
    total = left_g.shape[0]
    idx = jnp.arange(num_internal, dtype=jnp.int32)
    li, ri = left_g[:num_internal], right_g[:num_internal]
    c_l = 0.5 * (amin[li] + amax[li])
    c_r = 0.5 * (amin[ri] + amax[ri])
    diff = c_r - c_l  # (n-1, 3)
    axis = jnp.argmax(jnp.abs(diff), axis=-1)
    left_is_lower = jnp.take_along_axis(diff, axis[:, None], axis=-1)[:, 0] >= 0

    next_list, esc_list = [], []
    for o in range(8):
        pos = jnp.asarray(
            [(o >> 2) & 1 == 0, (o >> 1) & 1 == 0, (o & 1) == 0]
        )
        pos_a = pos[axis]  # direction positive along the split axis?
        first_is_left = left_is_lower == pos_a
        first = jnp.where(first_is_left, li, ri)
        second = jnp.where(first_is_left, ri, li)
        nxt = jnp.concatenate(
            [first, jnp.full((total - num_internal,), -1, jnp.int32)]
        )
        esc = jnp.full((total,), -1, jnp.int32).at[first].set(second)

        def esc_body(_, e, second=second):
            return e.at[second].set(e[idx])

        esc = jax.lax.fori_loop(0, max_depth, esc_body, esc)
        next_list.append(nxt)
        esc_list.append(esc)
    return jnp.stack(next_list), jnp.stack(esc_list)


def _group_leaf_aabbs(tri_verts, order_padded, leaf_size):
    """Per-leaf AABBs over `leaf_size` morton-consecutive triangles (padding ids
    of -1 contribute empty boxes)."""
    lo, hi = triangle_aabbs(tri_verts)
    safe = jnp.maximum(order_padded, 0)
    valid = (order_padded >= 0)[:, None]
    mlo = jnp.where(valid, lo[safe], jnp.inf)
    mhi = jnp.where(valid, hi[safe], -jnp.inf)
    l = order_padded.shape[0] // leaf_size
    return (
        mlo.reshape(l, leaf_size, 3).min(axis=1),
        mhi.reshape(l, leaf_size, 3).max(axis=1),
    )


@partial(jax.jit, static_argnames=("max_depth", "leaf_size"))
def build(tri_verts, max_depth: int = 64, leaf_size: int = 1) -> BVH:
    """Build the LBVH from (T, 3, 3) world-space triangle vertices.

    Fully vectorized Karras radix-tree construction; T must be >= 1 and is a static
    shape.  max_depth bounds the bottom-up/top-down propagation sweeps (tree depth
    is bounded by the 30-bit morton + 32-bit index tie-break prefix length).
    leaf_size groups morton-consecutive triangles per leaf (see BVH docstring).
    """
    t_count = tri_verts.shape[0]
    tri_lo, tri_hi = triangle_aabbs(tri_verts)
    centroids = 0.5 * (tri_lo + tri_hi)
    scene_lo = jnp.min(tri_lo, axis=0)
    scene_hi = jnp.max(tri_hi, axis=0)
    tcodes = morton_codes(centroids, scene_lo, scene_hi)
    torder = jnp.argsort(tcodes).astype(jnp.int32)
    tcodes_sorted = tcodes[torder]

    n = (t_count + leaf_size - 1) // leaf_size  # leaves
    pad = n * leaf_size - t_count
    order = jnp.concatenate([torder, jnp.full((pad,), -1, jnp.int32)]) if pad else torder
    # leaf key = morton code of its first member
    codes = tcodes_sorted[:: leaf_size][:n] if leaf_size > 1 else tcodes_sorted
    leaf_lo, leaf_hi = _group_leaf_aabbs(tri_verts, order, leaf_size)

    if n == 1:
        # Single node tree: the leaf is the root.
        return BVH(
            aabb_min=leaf_lo,
            aabb_max=leaf_hi,
            left=jnp.full((1,), -1, jnp.int32),
            right=jnp.full((1,), -1, jnp.int32),
            escape=jnp.full((1,), -1, jnp.int32),
            leaf_tri=jnp.zeros((1,), jnp.int32),
            order=order,
            next8=jnp.full((8, 1), -1, jnp.int32),
            esc8=jnp.full((8, 1), -1, jnp.int32),
            leaf_size=leaf_size,
        )

    num_internal = n - 1
    kbits = _ceil_log2(n) + 1
    idx = jnp.arange(num_internal, dtype=jnp.int32)

    def delta(i, j):
        """Common-prefix length of keys i and j; -1 when j out of range.  Equal
        morton codes tie-break on the index bits (Karras sec. 4)."""
        valid = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        x = codes[i] ^ codes[jc]
        d = jnp.where(
            x == 0,
            32 + _clz32(i ^ jc),
            _clz32(x.astype(jnp.int32)),
        )
        return jnp.where(valid, d, -1)

    # -- direction + range length (vectorized binary search) ----------------------
    d = jnp.sign(delta(idx, idx + 1) - delta(idx, idx - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)
    delta_min = delta(idx, idx - d)

    l = jnp.zeros(num_internal, jnp.int32)
    for k in range(kbits, -1, -1):
        t = jnp.int32(1 << k)
        cand = l + t
        ok = delta(idx, idx + cand * d) > delta_min
        l = jnp.where(ok, cand, l)
    j = idx + l * d
    delta_node = delta(idx, j)

    # -- split search (vectorized do { t=(t+1)>>1 ... } while (t>1)) ---------------
    s = jnp.zeros(num_internal, jnp.int32)
    t = l
    active = jnp.ones(num_internal, bool)
    for _ in range(kbits + 2):
        t = (t + 1) >> 1
        cand = s + t
        ok = active & (delta(idx, idx + cand * d) > delta_node)
        s = jnp.where(ok, cand, s)
        active = active & (t > 1)
    gamma = idx + s * d + jnp.minimum(d, 0)

    lo_r = jnp.minimum(idx, j)
    hi_r = jnp.maximum(idx, j)
    left_is_leaf = lo_r == gamma
    right_is_leaf = hi_r == gamma + 1
    left = jnp.where(left_is_leaf, gamma + num_internal, gamma)
    right = jnp.where(right_is_leaf, gamma + 1 + num_internal, gamma + 1)

    total = 2 * n - 1
    left_g = jnp.concatenate([left, jnp.full((n,), -1, jnp.int32)])
    right_g = jnp.concatenate([right, jnp.full((n,), -1, jnp.int32)])
    # leaves store the START index into `order` of their triangle group
    leaf_tri = jnp.concatenate(
        [
            jnp.full((num_internal,), -1, jnp.int32),
            jnp.arange(n, dtype=jnp.int32) * leaf_size,
        ]
    )

    # -- escape links: left child escapes to its right sibling; right child
    #    escapes to the parent's escape (propagates one level per sweep) ----------
    escape = jnp.full((total,), -1, jnp.int32)
    escape = escape.at[left].set(right)

    def esc_body(_, esc):
        return esc.at[right].set(esc[idx])

    escape = jax.lax.fori_loop(0, max_depth, esc_body, escape)

    # -- bottom-up AABB refit ------------------------------------------------------
    aabb_min, aabb_max = _refit_sweeps(
        left_g, right_g, leaf_lo, leaf_hi, num_internal, max_depth
    )

    next8, esc8 = _octant_links(
        left_g, right_g, aabb_min, aabb_max, num_internal, max_depth
    )

    return BVH(
        aabb_min=aabb_min,
        aabb_max=aabb_max,
        left=left_g,
        right=right_g,
        escape=escape,
        leaf_tri=leaf_tri,
        order=order,
        next8=next8,
        esc8=esc8,
        leaf_size=leaf_size,
    )


def _refit_sweeps(left_g, right_g, leaf_lo_sorted, leaf_hi_sorted, num_internal,
                  max_depth):
    n = leaf_lo_sorted.shape[0]
    total = 2 * n - 1
    amin = jnp.full((total, 3), jnp.inf, jnp.float32)
    amax = jnp.full((total, 3), -jnp.inf, jnp.float32)
    amin = amin.at[num_internal:].set(leaf_lo_sorted)
    amax = amax.at[num_internal:].set(leaf_hi_sorted)
    li = left_g[:num_internal]
    ri = right_g[:num_internal]

    def body(_, carry):
        amin, amax = carry
        new_min = jnp.minimum(amin[li], amin[ri])
        new_max = jnp.maximum(amax[li], amax[ri])
        return amin.at[:num_internal].set(new_min), amax.at[:num_internal].set(new_max)

    amin, amax = jax.lax.fori_loop(0, max_depth, body, (amin, amax))
    return amin, amax


@partial(jax.jit, static_argnames=("max_depth",))
def with_octant_links(bvh: BVH, max_depth: int = 64) -> BVH:
    """Attach per-octant ordered threading to any binary BVH (e.g. one built by
    the native C++ builder, native_bridge.build_lbvh)."""
    n = bvh.num_leaves
    if n == 1:
        links = jnp.full((8, 1), -1, jnp.int32)
        return dataclasses.replace(bvh, next8=links, esc8=links)
    next8, esc8 = _octant_links(
        bvh.left, bvh.right, bvh.aabb_min, bvh.aabb_max, n - 1, max_depth
    )
    return dataclasses.replace(bvh, next8=next8, esc8=esc8)


@partial(jax.jit, static_argnames=("max_depth",))
def refit(bvh: BVH, tri_verts, max_depth: int = 64) -> BVH:
    """Recompute all AABBs for new vertex positions, keeping the topology -- the
    per-frame update path for animated scenes (reference UpdateBLAS,
    resource_manager.cpp:593-701, rebuilt each geometry update)."""
    n = bvh.num_leaves
    leaf_lo, leaf_hi = _group_leaf_aabbs(tri_verts, bvh.order, bvh.leaf_size)
    if n == 1:
        return dataclasses.replace(bvh, aabb_min=leaf_lo, aabb_max=leaf_hi)
    amin, amax = _refit_sweeps(
        bvh.left, bvh.right, leaf_lo, leaf_hi, n - 1, max_depth
    )
    return dataclasses.replace(bvh, aabb_min=amin, aabb_max=amax)


def world_triangles(world_pos, tri_vertex):
    """(V, 3) world positions + (T, 3) indices -> (T, 3, 3) triangle vertices.

    ONE (V, 3) row gather at 3T indices — gather cost on TPU is per-index
    and flat in row width (docs/PERF_STATUS.md rule 2), so this is 3x
    cheaper than the 9 per-axis flat gathers it replaces."""
    t = tri_vertex.shape[0]
    return world_pos[tri_vertex.reshape(-1)].reshape(t, 3, 3)


def validate_host(bvh: BVH) -> None:
    """Host-side structural check (testing aid): every leaf reachable exactly once
    via (left, escape) threading AND via every octant's ordered (next8, esc8)
    threading, AABBs contain children."""
    import numpy as np

    left = np.asarray(bvh.left)
    escape = np.asarray(bvh.escape)
    leaf_tri = np.asarray(bvh.leaf_tri)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    n = bvh.num_leaves
    order = np.asarray(bvh.order)

    def walk(nxt, esc):
        seen = []
        node = bvh.root
        steps = 0
        while node != -1:
            steps += 1
            assert steps <= 4 * (2 * n - 1) + 4, (
                "threaded traversal does not terminate"
            )
            if leaf_tri[node] >= 0:
                start = leaf_tri[node]
                seen += [t for t in order[start : start + bvh.leaf_size] if t >= 0]
                node = esc[node]
            else:
                node = nxt[node]
        return seen

    expected = sorted(t for t in order.tolist() if t >= 0)
    assert sorted(walk(left, escape)) == expected
    if bvh.next8 is not None:
        next8 = np.asarray(bvh.next8)
        esc8 = np.asarray(bvh.esc8)
        for o in range(8):
            assert sorted(walk(next8[o], esc8[o])) == expected, (
                f"octant {o} ordered threading misses leaves"
            )
    # children contained in parents
    for i in range(max(0, n - 1)):
        for c in (left[i], np.asarray(bvh.right)[i]):
            assert (amin[i] <= amin[c] + 1e-5).all()
            assert (amax[i] >= amax[c] - 1e-5).all()
