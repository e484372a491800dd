"""8-wide BVH (BVH8) — the TPU-native acceleration structure for ray traversal.

Replaces the reference's hardware BLAS/TLAS (resource_manager.cpp:593-801) like
ops/bvh.py, but shaped by the measured XLA-on-TPU gather cost model
(docs/PERF_STATUS.md):

  * gather cost is per-INDEX, not per-byte: a (N, 128) f32 row gather costs the
    same as a (N, 8) one.  So each node packs EIGHT child AABBs (internal) or
    EIGHT full triangles (leaf) into one 128-float row -> one gather tests 8x
    the geometry of the binary tree's step.
  * gathers from tables whose padded size fits VMEM (~16 MB; N * 128 lanes * 4 B)
    run ~3.6x faster (3 ns/idx vs 11).  Collapsing to 8-wide with 8-triangle
    leaves shrinks a 108k-tri scene from 217k binary nodes to ~20k rows = 10 MB,
    inside the fast regime.

Traversal (ops/traverse.py:trace8) uses a short per-ray stack held as an
(R, D) select-updated array (no per-lane scatters) and orders children by the
CWBVH-style slot-XOR-octant trick: child slots are assigned by centroid octant
relative to the parent center at build time, so visiting slots in the order
``k ^ ray_octant`` approximates near-child-first for free.

Row layout ((N, 128) f32, slot-major SoA groups of 8):
  internal: [0:8]=lo.x[slot] [8:16]=lo.y [16:24]=lo.z [24:32]=hi.x [32:40]=hi.y
            [40:48]=hi.z  [48]=child base row (children live at base+slot;
            empty slots carry inverted-infinite boxes)  [127]=0
  leaf:     [0:72] = v0.x[8] v0.y[8] v0.z[8] v1.x[8] ... v2.z[8]
            [72:80] = original triangle ids (-1 = empty slot)  [127]=1

Host collapse (numpy) greedily expands the largest-count binary subtrees of an
LBVH/SAH binary BVH (ops/bvh.py / native sah.cpp) into 8 roots per node, like
the PREFER_FAST_TRACE collapse drivers do for RT cores.  refit8() recomputes
leaf triangles + internal AABBs on-device for animated scenes (the analogue of
the reference's per-update UpdateBLAS, resource_manager.cpp:593-701).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

LEAF_MAX = 8  # triangles per leaf row


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BVH8:
    rows: Any  # (N, 128) f32 gather table (layout above)
    #: refit metadata (all (N, ...)): child base row (-1 for leaves), per-slot
    #: validity, per-slot original triangle ids (-1 invalid / internal)
    base: Any  # (N,) int32
    valid8: Any  # (N, 8) bool
    tri8: Any  # (N, 8) int32
    depth: int = dataclasses.field(default=16, metadata=dict(static=True))

    @property
    def root(self) -> int:
        return 0

    @property
    def num_rows(self) -> int:
        return self.rows.shape[0]


def _subtree_counts(left, right, leaf_tri, order, leaf_size):
    """Per-node triangle counts of a binary BVH, bottom-up (numpy)."""
    total = left.shape[0]
    count = np.zeros(total, np.int64)
    is_leaf = leaf_tri >= 0
    if leaf_size == 1:
        count[is_leaf] = (order[leaf_tri[is_leaf]] >= 0).astype(np.int64)
    else:
        for i in np.nonzero(is_leaf)[0]:
            s = leaf_tri[i]
            count[i] = int((order[s : s + leaf_size] >= 0).sum())
    # children always have higher... not guaranteed; sweep until fixpoint
    internal = np.nonzero(~is_leaf)[0]
    for _ in range(64):
        new = count[left[internal]] + count[right[internal]]
        if (new == count[internal]).all():
            break
        count[internal] = new
    return count


def _collect_tris(node, left, right, leaf_tri, order, leaf_size):
    """All original triangle ids in a binary subtree (host walk)."""
    out, stack = [], [node]
    while stack:
        n = stack.pop()
        if leaf_tri[n] >= 0:
            s = leaf_tri[n]
            out.extend(
                int(t) for t in order[s : s + leaf_size] if t >= 0
            )
        else:
            stack.append(left[n])
            stack.append(right[n])
    return out


def build_bvh8_host(bvh, tri_verts) -> BVH8:
    """Collapse a binary BVH (ops/bvh.py BVH, leaf_size any) into a BVH8.

    Host (numpy) build — load-time only, like the reference's BLAS build
    (resource_manager.cpp:593-701).  Animated scenes refit on-device.
    """
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    leaf_tri = np.asarray(bvh.leaf_tri)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    order = np.asarray(bvh.order)
    tris = np.asarray(tri_verts, dtype=np.float32)
    ls = bvh.leaf_size
    count = _subtree_counts(left, right, leaf_tri, order, ls)

    def expand_roots(n):
        """Greedily split binary subtrees (largest first) into <= 8 roots."""
        roots = [n]
        while len(roots) < 8:
            # expand the largest subtree that is internal and still > LEAF_MAX
            cand = [r for r in roots if leaf_tri[r] < 0 and count[r] > LEAF_MAX]
            if not cand:
                break
            r = max(cand, key=lambda x: count[x])
            roots.remove(r)
            roots.append(int(left[r]))
            roots.append(int(right[r]))
        return roots

    # BFS over BVH8 nodes.  Each entry: (binary node, assigned row).
    rows_meta = {}  # row -> ("internal", base, slots{slot: child_row}) | ("leaf", tri_ids)
    row_aabb = {}
    next_row = [1]  # row 0 = root
    pending = [(int(bvh.root), 0)]
    while pending:
        bnode, row = pending.pop()
        row_aabb[row] = (amin[bnode], amax[bnode])
        if count[bnode] <= LEAF_MAX:
            ids = _collect_tris(bnode, left, right, leaf_tri, order, ls)
            rows_meta[row] = ("leaf", ids)
            continue
        roots = expand_roots(bnode)
        base = next_row[0]
        next_row[0] += 8
        # slot by centroid octant relative to parent center (XOR-octant order)
        center = 0.5 * (amin[bnode] + amax[bnode])
        taken = {}
        for r in roots:
            c = 0.5 * (amin[r] + amax[r])
            want = (
                (4 if c[0] >= center[0] else 0)
                | (2 if c[1] >= center[1] else 0)
                | (1 if c[2] >= center[2] else 0)
            )
            slot = want
            for probe in range(8):
                slot = (want + probe) % 8
                if slot not in taken:
                    break
            taken[slot] = r
            pending.append((int(r), base + slot))
        rows_meta[row] = ("internal", base, taken)

    n_rows = next_row[0]
    rows = np.zeros((n_rows, 128), np.float32)
    base_arr = np.full(n_rows, -1, np.int32)
    valid8 = np.zeros((n_rows, 8), bool)
    tri8 = np.full((n_rows, 8), -1, np.int32)
    for row, meta in rows_meta.items():
        if meta[0] == "leaf":
            ids = meta[1]
            rows[row, 127] = 1.0
            for s, t in enumerate(ids):
                tri8[row, s] = t
                v = tris[t]  # (3, 3)
                for corner in range(3):
                    for axis in range(3):
                        rows[row, (corner * 3 + axis) * 8 + s] = v[corner, axis]
            rows[row, 72:80] = tri8[row]
        else:
            _, base, taken = meta
            base_arr[row] = base
            rows[row, 48] = float(base)
            # empty slots: inverted-infinite boxes (slab test always fails)
            rows[row, 0:24] = 3.0e38
            rows[row, 24:48] = -3.0e38
            for s, child in taken.items():
                valid8[row, s] = True
                clo, chi = amin[child], amax[child]
                for axis in range(3):
                    rows[row, axis * 8 + s] = clo[axis]
                    rows[row, (3 + axis) * 8 + s] = chi[axis]

    # max stack depth: longest root-to-leaf chain of internal rows
    depth = 1
    stack = [(0, 1)]
    while stack:
        row, d = stack.pop()
        depth = max(depth, d)
        meta = rows_meta[row]
        if meta[0] == "internal":
            for s in meta[2]:
                stack.append((meta[1] + s, d + 1))
    return BVH8(
        rows=jnp.asarray(rows),
        base=jnp.asarray(base_arr),
        valid8=jnp.asarray(valid8),
        tri8=jnp.asarray(tri8),
        depth=int(depth) + 2,
    )


@partial(jax.jit, static_argnames=("sweeps",))
def refit8(b: BVH8, tri_verts, sweeps: int = 24) -> BVH8:
    """Recompute leaf triangle rows + all AABBs for new vertex positions keeping
    the topology — the per-frame update for animated scenes (reference
    UpdateBLAS, resource_manager.cpp:593-701)."""
    n = b.num_rows
    is_leaf = b.base < 0
    safe_tri = jnp.maximum(b.tri8, 0)  # (N, 8)
    tvalid = b.tri8 >= 0

    # leaf geometry: 9 coordinate planes, each a 1-D gather of (N*8,) ids
    tflat = tri_verts.reshape(-1, 9)  # (T, 9) [v0.xyz v1.xyz v2.xyz]
    coords = [
        tflat[:, c][safe_tri.reshape(-1)].reshape(n, 8) for c in range(9)
    ]  # 9 x (N, 8)

    # leaf AABBs over valid slots
    big = jnp.float32(3.0e38)
    xs = jnp.stack([coords[0], coords[3], coords[6]], 0)  # (3corner, N, 8)
    ys = jnp.stack([coords[1], coords[4], coords[7]], 0)
    zs = jnp.stack([coords[2], coords[5], coords[8]], 0)
    vm = tvalid[None]
    leaf_lo = jnp.stack(
        [
            jnp.min(jnp.where(vm, xs, big), axis=(0, 2)),
            jnp.min(jnp.where(vm, ys, big), axis=(0, 2)),
            jnp.min(jnp.where(vm, zs, big), axis=(0, 2)),
        ],
        -1,
    )  # (N, 3)
    leaf_hi = jnp.stack(
        [
            jnp.max(jnp.where(vm, xs, -big), axis=(0, 2)),
            jnp.max(jnp.where(vm, ys, -big), axis=(0, 2)),
            jnp.max(jnp.where(vm, zs, -big), axis=(0, 2)),
        ],
        -1,
    )

    amin = jnp.where(is_leaf[:, None], leaf_lo, big)
    amax = jnp.where(is_leaf[:, None], leaf_hi, -big)
    child = jnp.maximum(b.base, 0)[:, None] + jnp.arange(8, dtype=jnp.int32)

    def sweep(_, boxes):
        amin, amax = boxes
        cmin = jnp.stack(
            [amin[:, a][child.reshape(-1)].reshape(n, 8) for a in range(3)], -1
        )  # (N, 8, 3)
        cmax = jnp.stack(
            [amax[:, a][child.reshape(-1)].reshape(n, 8) for a in range(3)], -1
        )
        v = b.valid8[..., None]
        new_min = jnp.min(jnp.where(v, cmin, big), axis=1)
        new_max = jnp.max(jnp.where(v, cmax, -big), axis=1)
        return (
            jnp.where(is_leaf[:, None], amin, new_min),
            jnp.where(is_leaf[:, None], amax, new_max),
        )

    amin, amax = jax.lax.fori_loop(0, sweeps, sweep, (amin, amax))

    # re-pack rows
    rows = b.rows
    # leaf coordinate planes (cols 0:72)
    leaf_cols = jnp.concatenate(coords, axis=1)  # (N, 72)
    # internal child boxes per slot (cols 0:48), empty slots inverted-infinite
    cmin = jnp.stack(
        [amin[:, a][child.reshape(-1)].reshape(n, 8) for a in range(3)], 0
    )  # (3, N, 8)
    cmax = jnp.stack(
        [amax[:, a][child.reshape(-1)].reshape(n, 8) for a in range(3)], 0
    )
    v = b.valid8[None]
    int_lo = jnp.where(v, cmin, big).transpose(1, 0, 2).reshape(n, 24)
    int_hi = jnp.where(v, cmax, -big).transpose(1, 0, 2).reshape(n, 24)
    geom = jnp.where(
        is_leaf[:, None],
        leaf_cols,
        jnp.concatenate([int_lo, int_hi, rows[:, 48:72]], axis=1),
    )
    rows = jnp.concatenate([geom, rows[:, 72:]], axis=1)
    return dataclasses.replace(b, rows=rows)


def validate_host(b: BVH8, tri_verts) -> None:
    """Structural check (testing aid): every triangle appears in exactly one
    leaf slot, child boxes are contained in parents, leaf rows carry their
    triangles' coordinates, stack depth bound holds."""
    rows = np.asarray(b.rows)
    base = np.asarray(b.base)
    valid8 = np.asarray(b.valid8)
    tri8 = np.asarray(b.tri8)
    tris = np.asarray(tri_verts)
    n = rows.shape[0]

    seen = []
    depth_max = 0
    stack = [(0, 1)]
    while stack:
        row, d = stack.pop()
        depth_max = max(depth_max, d)
        if base[row] < 0:  # leaf
            assert rows[row, 127] == 1.0
            for s in range(8):
                t = tri8[row, s]
                if t < 0:
                    continue
                seen.append(int(t))
                for corner in range(3):
                    for axis in range(3):
                        assert (
                            rows[row, (corner * 3 + axis) * 8 + s]
                            == np.float32(tris[t, corner, axis])
                        )
        else:
            assert rows[row, 127] == 0.0
            assert rows[row, 48] == base[row]
            for s in range(8):
                if not valid8[row, s]:
                    # empty slot: inverted-infinite box, never intersected
                    assert rows[row, s] > rows[row, 24 + s]
                    continue
                # child box contained in the slot box recorded at the parent
                child = int(base[row]) + s
                stack.append((child, d + 1))
    assert sorted(seen) == list(range(tris.shape[0])), "triangle coverage"
    assert depth_max <= b.depth, f"depth {depth_max} > bound {b.depth}"
