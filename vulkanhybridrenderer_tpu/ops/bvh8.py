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
            [40:48]=hi.z  [48]=first-child row  [49]=offset map (3 bits per
            slot: rank of the slot among valid slots, so child row =
            base + (offmap >> 3*slot) & 7 -- children are allocated compactly,
            empty slots carry inverted-infinite boxes and waste no rows)
            [127]=0
  leaf:     [0:72] = v0.x[8] v0.y[8] v0.z[8] v1.x[8] ... v2.z[8]
            [72:80] = original triangle ids (-1 = empty slot)  [127]=1

Host collapse (numpy) greedily expands the largest-count binary subtrees of an
LBVH/SAH binary BVH (ops/bvh.py / native sah.cpp) until >= 8 child bins exist,
bin-packing small sibling subtrees together into full 8-triangle leaves (the
binary tree fragments into ~4-triangle subtrees otherwise; packed leaves keep
the row count -- and thus the gather table -- inside the fast VMEM-resident
regime).  Like the PREFER_FAST_TRACE collapse drivers do for RT cores.
refit8() recomputes leaf triangles + internal AABBs on-device for animated
scenes (the analogue of per-update UpdateBLAS, resource_manager.cpp:593-701).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

LEAF_MAX = 8  # default triangles per leaf row (12 fits the 128-float row too)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BVH8:
    rows: Any  # (N, 128) f32 gather table (layout above)
    #: refit metadata (all (N, ...)): per-slot child row ids (-1 = empty slot /
    #: leaf row), per-slot validity, per-slot original triangle ids
    child8: Any  # (N, 8) int32
    valid8: Any  # (N, 8) bool
    tri8: Any  # (N, leaf_max) int32
    depth: int = dataclasses.field(default=16, metadata=dict(static=True))
    #: triangles per leaf row (static; leaf row layout: 9 coordinate groups of
    #: `leaf_max` lanes at [0 : 9*leaf_max), ids at [9*leaf_max : 10*leaf_max))
    leaf_max: int = dataclasses.field(default=8, metadata=dict(static=True))

    @property
    def is_leaf_rows(self):
        return self.rows[:, 127] > 0.5

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
    # child ids are not ordered relative to parents; sweep until fixpoint
    # (converges in <= tree-depth iterations, which can exceed any fixed cap
    # on degenerate trees — so iterate to convergence and assert it)
    internal = np.nonzero(~is_leaf)[0]
    converged = internal.size == 0
    for _ in range(total + 1):
        new = count[left[internal]] + count[right[internal]]
        if (new == count[internal]).all():
            converged = True
            break
        count[internal] = new
    assert converged, "subtree-count fixpoint did not converge (cyclic tree?)"
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


def build_bvh8_host(bvh, tri_verts, prefer_native: bool = True,
                    leaf_max: int = LEAF_MAX) -> BVH8:
    """Collapse a binary BVH (ops/bvh.py BVH, leaf_size any) into a BVH8.

    Host build — load-time only, like the reference's BLAS build
    (resource_manager.cpp:593-701).  Uses the native C++ collapse
    (native/bvh8.cpp, bit-identical output, ~50x faster on big scenes) when
    available; animated scenes refit on-device.  leaf_max: triangles per leaf
    row (8 or 12; 12 * 9 coords + 12 ids = 120 <= 127 fits the row).
    """
    assert leaf_max in (8, 12)
    if prefer_native:
        from vulkanhybridrenderer_tpu import native_bridge

        out = native_bridge.bvh8_collapse_host(bvh, tri_verts, leaf_max=leaf_max)
        if out is not None:
            return out
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    leaf_tri = np.asarray(bvh.leaf_tri)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    order = np.asarray(bvh.order)
    tris = np.asarray(tri_verts, dtype=np.float32)
    ls = bvh.leaf_size
    count = _subtree_counts(left, right, leaf_tri, order, ls)

    def make_bins(n):
        """Expand the binary subtree under n into up to 8 child bins.

        A bin is ("node", binary_node) for subtrees that stay internal
        (count > leaf_max) or ("leaf", [roots], lo, hi) packing one or more
        small sibling subtrees (<= leaf_max triangles total) into one full
        leaf row.  Greedy largest-first expansion + first-fit-decreasing
        packing keeps leaves near-full, which shrinks the row table."""

        def pack(roots):
            big = [r for r in roots if count[r] > leaf_max]
            small = sorted(
                (r for r in roots if count[r] <= leaf_max),
                key=lambda r: -count[r],
            )
            bins = [("node", r) for r in big]
            packs = []  # [(tris_total, [roots])]
            for r in small:
                for p in packs:
                    if p[0] + count[r] <= leaf_max:
                        p[0] += count[r]
                        p[1].append(r)
                        break
                else:
                    packs.append([count[r], [r]])
            for _, rs in packs:
                lo = np.min([amin[r] for r in rs], axis=0)
                hi = np.max([amax[r] for r in rs], axis=0)
                bins.append(("leaf", rs, lo, hi))
            return bins

        roots = [n]
        while True:
            bins = pack(roots)
            splittable = [r for r in roots if count[r] > leaf_max]
            if len(bins) >= 8 or not splittable:
                return bins
            r = max(splittable, key=lambda x: count[x])
            roots.remove(r)
            roots.append(int(left[r]))
            roots.append(int(right[r]))

    def bin_box(b):
        if b[0] == "node":
            return amin[b[1]], amax[b[1]]
        return b[2], b[3]

    # BFS over BVH8 nodes.  rows_meta[row] =
    #   ("internal", {slot: (child_row, lo, hi)}) | ("leaf", tri_ids)
    rows_meta = {}
    next_row = [1]  # row 0 = root
    root_bnode = int(bvh.root)
    if count[root_bnode] <= leaf_max:
        pending = [(("leaf", [root_bnode], amin[root_bnode], amax[root_bnode]), 0)]
    else:
        pending = [(("node", root_bnode), 0)]
    while pending:
        b, row = pending.pop()
        if b[0] == "leaf":
            ids = []
            for r in b[1]:
                ids.extend(_collect_tris(r, left, right, leaf_tri, order, ls))
            rows_meta[row] = ("leaf", ids)
            continue
        bnode = b[1]
        bins = make_bins(bnode)
        # slot by centroid octant relative to parent center (XOR-octant order)
        center = 0.5 * (amin[bnode] + amax[bnode])
        slotted = {}
        for child_bin in bins:
            lo, hi = bin_box(child_bin)
            c = 0.5 * (lo + hi)
            want = (
                (4 if c[0] >= center[0] else 0)
                | (2 if c[1] >= center[1] else 0)
                | (1 if c[2] >= center[2] else 0)
            )
            for probe in range(8):
                slot = (want + probe) % 8
                if slot not in slotted:
                    break
            slotted[slot] = child_bin
        # compact child allocation: rows in slot order, no gaps
        taken = {}
        for slot in sorted(slotted):
            child_row = next_row[0]
            next_row[0] += 1
            lo, hi = bin_box(slotted[slot])
            taken[slot] = (child_row, lo, hi)
            pending.append((slotted[slot], child_row))
        rows_meta[row] = ("internal", taken)

    n_rows = next_row[0]
    rows = np.zeros((n_rows, 128), np.float32)
    child8 = np.full((n_rows, 8), -1, np.int32)
    valid8 = np.zeros((n_rows, 8), bool)
    tri8 = np.full((n_rows, leaf_max), -1, np.int32)
    for row, meta in rows_meta.items():
        if meta[0] == "leaf":
            ids = meta[1]
            rows[row, 127] = 1.0
            for s, t in enumerate(ids):
                tri8[row, s] = t
                v = tris[t]  # (3, 3)
                for corner in range(3):
                    for axis in range(3):
                        rows[row, (corner * 3 + axis) * leaf_max + s] = (
                            v[corner, axis]
                        )
            rows[row, 9 * leaf_max:10 * leaf_max] = tri8[row]
        else:
            taken = meta[1]
            base = min(cr for cr, _, _ in taken.values())
            offmap = 0
            # empty slots: inverted-infinite boxes (slab test always fails)
            rows[row, 0:24] = 3.0e38
            rows[row, 24:48] = -3.0e38
            for s, (child_row, clo, chi) in taken.items():
                child8[row, s] = child_row
                valid8[row, s] = True
                offmap |= (child_row - base) << (3 * s)
                for axis in range(3):
                    rows[row, axis * 8 + s] = clo[axis]
                    rows[row, (3 + axis) * 8 + s] = chi[axis]
            assert offmap < (1 << 24)
            rows[row, 48] = float(base)
            rows[row, 49] = float(offmap)

    # max stack depth: longest root-to-leaf chain of internal rows
    depth = 1
    stack = [(0, 1)]
    while stack:
        row, d = stack.pop()
        depth = max(depth, d)
        meta = rows_meta[row]
        if meta[0] == "internal":
            for cr, _, _ in meta[1].values():
                stack.append((cr, d + 1))
    return BVH8(
        rows=jnp.asarray(rows),
        child8=jnp.asarray(child8),
        valid8=jnp.asarray(valid8),
        tri8=jnp.asarray(tri8),
        depth=int(depth) + 2,
        leaf_max=leaf_max,
    )


#: the measured VMEM-residency cliff for the traversal's gather operand:
#: a sharp step between 15 MB (3.86 ns/idx) and 17 MB (5.98) on the v5e
#: (round-5 cliff-shape sweep over synthetic (N, 128) tables; see
#: docs/PERF_STATUS.md rules 2/5).  Budget = the last measured-fast size.
VMEM_TABLE_BUDGET_BYTES = 15 << 20


def _bf16_directed(x, up: bool):
    """Conservative bf16 cast of f32 values: result >= x (up) or <= x (down).

    Bit trick: truncating an f32's low 16 bits rounds the magnitude DOWN
    (toward zero) for any sign; adding 0xFFFF first rounds it UP (away from
    zero).  Directed rounding = away-from-zero exactly when the sign
    disagrees with the direction.  Exactly-representable values (low bits
    zero) are unchanged either way."""
    import ml_dtypes

    bits = np.ascontiguousarray(x, np.float32).view(np.uint32)
    away = (bits >> 31).astype(bool) != up  # sign XOR direction
    bits = np.where(away, bits + np.uint32(0xFFFF), bits) & np.uint32(0xFFFF0000)
    return (bits >> 16).astype(np.uint16).view(ml_dtypes.bfloat16)


def table_to_bf16(b: BVH8) -> BVH8:
    """Re-encode the (N, 128) f32 gather table in bf16 — the VMEM-residency
    lever for scenes whose f32 table spills the ~15 MB gather-fast budget
    while half the bytes fit (measured 1.65x per-index penalty over the
    cliff, scripts/bench_vmem_cliff.py / bench_bf16_table.py).

    bf16 layout (decode: ops/traverse.py:_decode_row):
      internal rows: [0:48] child slabs with DIRECTED rounding (lo down, hi
        up: every box only grows, so traversal stays conservative — extra
        false-positive descents, never a missed intersection; the
        inverted-infinite empty-slot sentinels +-3.0e38 survive truncation
        inverted).  [48:51] = child-base bytes (lo, mid, hi), [51:54] =
        offmap bytes: bf16 has 8 significand bits, so 8-bit pieces are
        exact, and the f32 reassembly lo + mid*256 + hi*65536 is exact
        below 2^24.
      leaf rows: [0:72] vertices round-to-nearest RELATIVE to the row's
        vertex centroid (the one real precision trade: half-ULP 2^-8 of the
        LEAF extent, not of the global coordinate — ~10x tighter than plain
        bf16 on off-origin scenes; the cost is sub-quantization cracks
        where leaves sharing a vertex quantize against different
        centroids), [72:80] / [80:88] / [88:96] = (tri_id + 1) byte pieces
        (0 = empty slot), [96:99] = centroid hi bf16, [99:102] = centroid
        residual (c - f32(hi), a second bf16: combined error ~2^-16
        relative).  Internal rows keep [96:102] zero, so the decode's
        centroid add is a no-op for them.
      [127] flag unchanged (0/1 exact).

    leaf_max must be 8 (12 * 3 id pieces would not fit the row).  Static
    scenes only — refit8 writes f32 rows (and animated tables are small)."""
    import ml_dtypes

    assert b.leaf_max == 8, "bf16 rows need lanes [72:96] free (leaf_max=8)"
    rows = np.asarray(b.rows, np.float32)
    n = rows.shape[0]
    leaf = rows[:, 127] > 0.5
    out = np.zeros((n, 128), ml_dtypes.bfloat16)
    out[:, 127] = rows[:, 127].astype(ml_dtypes.bfloat16)

    def bytes3(v):
        v = v.astype(np.int64)
        return (v & 255), ((v >> 8) & 255), ((v >> 16) & 255)

    # internal rows
    ri = rows[~leaf]
    oi = out[~leaf]
    oi[:, 0:24] = _bf16_directed(ri[:, 0:24], up=False)  # lo slabs
    oi[:, 24:48] = _bf16_directed(ri[:, 24:48], up=True)  # hi slabs
    for j, piece in enumerate(bytes3(np.round(ri[:, 48]))):
        oi[:, 48 + j] = piece.astype(ml_dtypes.bfloat16)
    for j, piece in enumerate(bytes3(np.round(ri[:, 49]))):
        oi[:, 51 + j] = piece.astype(ml_dtypes.bfloat16)
    out[~leaf] = oi

    # leaf rows
    rl = rows[leaf]
    ol = out[leaf]
    ids1 = np.round(rl[:, 72:80]).astype(np.int64) + 1  # -1 (empty) -> 0
    valid = ids1 > 0  # (L, 8)
    # per-axis vertex centroid over valid slots (lane k holds axis k % 3)
    vmask = np.concatenate([valid] * 9, axis=1)  # (L, 72)
    verts = rl[:, 0:72]
    cnt = np.maximum(valid.sum(axis=1, keepdims=True) * 3, 1)
    cen = np.zeros((rl.shape[0], 3), np.float32)
    for ax in range(3):
        lanes = np.concatenate(
            [np.arange(k * 8, k * 8 + 8) for k in range(ax, 9, 3)]
        )
        sel = verts[:, lanes] * vmask[:, lanes]
        cen[:, ax] = sel.sum(axis=1) / np.maximum(
            vmask[:, lanes].sum(axis=1), 1
        )
    del cnt
    c_hi = cen.astype(ml_dtypes.bfloat16)
    c_lo = (cen - c_hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    cexp = np.concatenate(
        [cen[:, k % 3:k % 3 + 1].repeat(8, axis=1) for k in range(9)], axis=1
    )
    rel = np.where(vmask, verts - cexp, 0.0).astype(np.float32)
    ol[:, 0:72] = rel.astype(ml_dtypes.bfloat16)  # round-nearest
    for j, piece in enumerate(bytes3(ids1)):
        ol[:, 72 + 8 * j:80 + 8 * j] = piece.astype(ml_dtypes.bfloat16)
    ol[:, 96:99] = c_hi
    ol[:, 99:102] = c_lo
    out[leaf] = ol
    return dataclasses.replace(b, rows=jnp.asarray(out))


def build_bvh8_auto(bvh, tri_verts, budget: int = VMEM_TABLE_BUDGET_BYTES
                    ) -> BVH8:
    """leaf_max auto-selection: leaf-8 rows trace fastest when the table is
    VMEM-resident (fatter leaves only add masked Moller-Trumbore VPU work,
    measured round 4), but a table past the residency cliff pays 1.65x per
    gather (3.6 -> 6.0 ns/idx measured) — there the ~25% smaller leaf-12
    table wins IF it crosses back under.  Build leaf-8 first; rebuild at 12
    only when that rescues residency.  Applies to scenes whose leaf-8 table
    lands in the ~15-21 MB band (~150-200k triangles); measured examples
    sit outside it (Sponza 10.5 MB fits @8; realglb 19 MB and Bistro
    32 MB miss even @12 — scripts/bench_vmem_cliff.py), so those keep
    leaf-8 and its lower per-leaf-step VPU cost."""
    b8 = build_bvh8_host(bvh, tri_verts, leaf_max=8)
    if b8.num_rows * 512 <= budget:
        return b8
    b12 = build_bvh8_host(bvh, tri_verts, leaf_max=12)
    if b12.num_rows * 512 <= budget:
        return b12
    return b8  # both miss VMEM: gather rate is equal, leaf-8 has less VPU


@partial(jax.jit, static_argnames=("sweeps",))
def refit8(b: BVH8, tri_verts, sweeps: int | None = None) -> BVH8:
    """Recompute leaf triangle rows + all AABBs for new vertex positions keeping
    the topology — the per-frame update for animated scenes (reference
    UpdateBLAS, resource_manager.cpp:593-701).

    sweeps: bottom-up propagation iterations; None (default) = the tree's own
    static depth (a fixed cap smaller than the depth would leave upper internal
    AABBs stale — silently missed intersections on animated scenes)."""
    if sweeps is None:
        sweeps = b.depth  # static dataclass field: resolvable under jit
    if b.rows.dtype != jnp.float32:
        raise ValueError(
            "refit8 needs an f32 table — bf16 rows (table_to_bf16) are a "
            "static-scene residency lever; use bvh_dtype='f32' when animating"
        )
    n = b.num_rows
    lm = b.leaf_max
    is_leaf = b.rows[:, 127] > 0.5
    safe_tri = jnp.maximum(b.tri8, 0)  # (N, leaf_max)
    tvalid = b.tri8 >= 0

    # leaf geometry: 9 coordinate planes, each a 1-D gather of (N*lm,) ids
    tflat = tri_verts.reshape(-1, 9)  # (T, 9) [v0.xyz v1.xyz v2.xyz]
    coords = [
        tflat[:, c][safe_tri.reshape(-1)].reshape(n, lm) for c in range(9)
    ]  # 9 x (N, leaf_max)

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
    child = jnp.maximum(b.child8, 0)  # (N, 8)

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
        jnp.concatenate([int_lo, int_hi, rows[:, 48:9 * lm]], axis=1),
    )
    rows = jnp.concatenate([geom, rows[:, 9 * lm:]], axis=1)
    return dataclasses.replace(b, rows=rows)


def validate_host(b: BVH8, tri_verts) -> None:
    """Structural check (testing aid): every triangle appears in exactly one
    leaf slot, child boxes are contained in parents, leaf rows carry their
    triangles' coordinates, stack depth bound holds."""
    rows = np.asarray(b.rows)
    child8 = np.asarray(b.child8)
    valid8 = np.asarray(b.valid8)
    tri8 = np.asarray(b.tri8)
    tris = np.asarray(tri_verts)

    seen = []
    depth_max = 0
    visited = set()
    stack = [(0, 1)]
    while stack:
        row, d = stack.pop()
        assert row not in visited, "row reachable twice"
        visited.add(row)
        depth_max = max(depth_max, d)
        if rows[row, 127] == 1.0:  # leaf
            assert (child8[row] == -1).all() and not valid8[row].any()
            for s in range(b.leaf_max):
                t = tri8[row, s]
                if t < 0:
                    continue
                seen.append(int(t))
                for corner in range(3):
                    for axis in range(3):
                        assert (
                            rows[row, (corner * 3 + axis) * b.leaf_max + s]
                            == np.float32(tris[t, corner, axis])
                        )
        else:
            base = int(rows[row, 48])
            offmap = int(rows[row, 49])
            for s in range(8):
                if not valid8[row, s]:
                    # empty slot: inverted box (lo > hi) — _trace8 masks these
                    # out explicitly via its lo.x <= hi.x slot-validity compare
                    # (the orderless slab test alone would un-invert them)
                    assert rows[row, s] > rows[row, 24 + s]
                    assert child8[row, s] == -1
                    continue
                child = base + ((offmap >> (3 * s)) & 7)
                assert child == child8[row, s], "offmap/child8 mismatch"
                stack.append((child, d + 1))
    assert sorted(seen) == list(range(tris.shape[0])), "triangle coverage"
    assert len(visited) == rows.shape[0], "unreachable rows (wasted table)"
    assert depth_max <= b.depth, f"depth {depth_max} > bound {b.depth}"
