"""Wavefront ray traversal over the BVH8 (ops/bvh8.py).

Replaces vkCmdTraceRaysKHR / rayQuery (raytracing_execution_context.cpp:4-13,
rayquery default.frag:36-44).  TPU-first formulation: ray wavefronts step
through the tree in lockstep; the per-step (N, 128) BVH8 row gathers dominate
cost (docs/PERF_STATUS.md cost model), so the production schedules all trade
extra lane-dense VPU work for fewer gathers:

  * _trace8_packet: K rays (production: 128) share one walk — 1 gather per
    packet-step — for coherent wavefronts (shadow, primary).
  * _trace8_packet_phased: staged compaction at packet granularity for
    heavy-tailed walks (reflections), with an exact overflow fallback.
  * _trace8: per-ray walk — incoherent wavefronts (AO hemispheres), where
    every packet size measured slower (round-4 postmortem: the lockstep
    strip pays packet-count x max-UNION-walk gathers; the round-3
    sub-packet kernels this module once carried lost 3-14x on every
    production wavefront and were deleted in round 5).
  * _trace_flat: simple skip-pointer walk over the legacy threaded LBVH
    (ops/bvh.py) — the independent test ORACLE, not a production path.
  * rays are traced in `strips` sequential slices (lax.map): the lockstep loop
    pays for the *worst* ray in a slice, so slicing coherent ray batches (image
    tiles, shadow rays) lets early-converging strips retire instead of idling
    behind the globally worst ray.

Ray-flag parity with the reference:
  * anyhit=True == TerminateOnFirstHit | SkipClosestHit (shadow/AO rays).
  * hit_filter implements non-opaque any-hit alpha testing
    (shadow_anyhit.rahit:22-26): return False to ignoreIntersectionEXT.
  * closest-hit returns the nearest accepted hit with GPU-convention
    barycentrics (u, v weight vertices 1, 2).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.ops.bvh import BVH
from vulkanhybridrenderer_tpu.ops.bvh8 import BVH8


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


def pack_nodes(bvh: BVH):
    """(2L-1, 8) f32 node rows: [lo.xyz, hi.xyz, next_or_start, escape].

    Internal nodes: next = left child id (>= 0).  Leaves: next = -(start + 2)
    (< -1) where start indexes bvh.order's triangle group.  escape = -1
    terminates; ids stay exact as floats (< 2^24)."""
    is_leaf = bvh.leaf_tri >= 0
    nxt = jnp.where(is_leaf, -(bvh.leaf_tri + 2), bvh.left).astype(jnp.float32)
    esc = bvh.escape.astype(jnp.float32)
    return jnp.concatenate(
        [bvh.aabb_min, bvh.aabb_max, nxt[:, None], esc[:, None]], axis=1
    )


def pack_tris(tri_verts):
    """(T, 3, 3) -> (T, 9) rows for single-gather vertex fetch."""
    return tri_verts.reshape(tri_verts.shape[0], 9)


def ray_octants(direction):
    """Per-ray direction octant, matching bvh._octant_links' bit convention:
    o = (dx<0)<<2 | (dy<0)<<1 | (dz<0)."""
    return (
        ((direction[..., 0] < 0).astype(jnp.int32) << 2)
        | ((direction[..., 1] < 0).astype(jnp.int32) << 1)
        | (direction[..., 2] < 0).astype(jnp.int32)
    )


def _decode_row(row, lm: int):
    """Normalize gathered BVH8 rows to f32 + exact integer fields.

    f32 tables store integer lanes as exact floats (< 2^24) directly.  bf16
    tables (ops/bvh8.py:table_to_bf16 — the VMEM-residency lever for
    15-30 MB f32 tables) store each integer as three 8-bit pieces, exact in
    bf16's 8 significand bits; the reassembly below is exact f32 arithmetic.
    Returns (row_f32, child_base, offmap, tri_ids) with the slab/vertex
    lanes at the f32 layout's positions in both cases.  Reading base/offmap
    lanes of LEAF rows (or id lanes of internal rows) yields garbage ints in
    either encoding — callers mask on the [127] flag exactly as before."""
    if row.dtype == jnp.bfloat16:
        rf = row.astype(jnp.float32)

        def i3(lo, mid, hi):
            return (lo + mid * 256.0 + hi * 65536.0).astype(jnp.int32)

        base = i3(rf[..., 48], rf[..., 49], rf[..., 50])
        offmap = i3(rf[..., 51], rf[..., 52], rf[..., 53])
        tri = i3(
            rf[..., 9 * lm:10 * lm],
            rf[..., 10 * lm:11 * lm],
            rf[..., 11 * lm:12 * lm],
        ) - 1
        # leaf vertices are centroid-relative; internal rows carry zeros at
        # the centroid lanes [96:102], so the add is a no-op for them
        cen = rf[..., 96:99] + rf[..., 99:102]  # (..., 3)
        cexp = jnp.concatenate(
            [
                jnp.broadcast_to(
                    cen[..., k % 3:k % 3 + 1], rf.shape[:-1] + (lm,)
                )
                for k in range(9)
            ],
            axis=-1,
        )
        rf = jnp.concatenate(
            [rf[..., 0:72] + cexp, rf[..., 72:]], axis=-1
        )
        return rf, base, offmap, tri
    return (
        row,
        row[..., 48].astype(jnp.int32),
        row[..., 49].astype(jnp.int32),
        row[..., 9 * lm:10 * lm].astype(jnp.int32),
    )


def _trace8(
    rows,  # (N, 128) BVH8 table (see ops/bvh8.py layout)
    root: int,
    depth: int,
    origin,
    direction,
    tmin,
    tmax,
    anyhit: bool,
    hit_filter,
    max_steps: int,
    init_state=None,
    return_state: bool = False,
    leaf_max: int = 8,
    unroll: int = 1,
):
    """BVH8 wavefront traversal: ONE (N, 128) row gather per step tests 8 child
    AABBs (internal rows) or `leaf_max` full triangles (leaf rows).

    unroll: steps per while-loop iteration.  Each loop iteration carries a
    fixed overhead (cond reduction + scalar branch + issue bubbles,
    ~2-14 us depending on strip width — scripts/bench_ao_r5.py and the
    round-5 synthetic sweep: R=9216 dependent-gather walks sped up 25% at
    unroll=4); checking the cond every `unroll` steps costs at most
    unroll-1 wasted lockstep steps per strip.  Production strips are wide
    enough to be compute-bound, so this stays 1 unless a sweep says
    otherwise.

    Per-ray stack = two (R, depth) int32 arrays updated with lane-mask selects
    (no per-lane scatters; depth is small and static).  Entry A packs
    ``child_base * 256 + remaining_hit_mask``; entry B carries the node's
    3-bit-per-slot child offset map (children are allocated compactly, so
    child row = base + offmap[slot]).  Children are visited in slot order
    ``k ^ ray_octant`` — slots encode centroid octants at build time, so this
    is near-child-first (CWBVH-style) at zero per-step gather cost.
    """
    r = origin.shape[0]
    d = direction
    safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    inv = 1.0 / safe_d
    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]  # (R, 1)
    ix, iy, iz = inv[:, 0:1], inv[:, 1:2], inv[:, 2:3]
    oct_ = ray_octants(d)  # (R,)
    slots8 = jnp.arange(8, dtype=jnp.int32)  # (8,)
    # stacks live as (depth, R): R on the fast (lane) axis — (R, depth) would
    # pad the tiny minor dim to the 128-lane tile on TPU
    lane = jnp.arange(depth, dtype=jnp.int32)[:, None]  # (D, 1)

    def first_slot(mask):
        """First set slot of `mask` in XOR-octant (near-first) order; returns
        (slot, mask_without_slot).  mask == 0 -> slot arbitrary, remaining 0."""
        bits = (mask[:, None] >> (slots8[None, :] ^ oct_[:, None])) & 1  # (R, 8)
        k = jnp.argmax(bits, axis=-1).astype(jnp.int32)
        slot = k ^ oct_
        return slot, mask & ~(1 << slot)

    def cond(state):
        node = state[0]
        steps = state[-1]
        return jnp.any(node >= 0) & (steps < max_steps)

    def body(state):
        node, sp, stack, stack_b, t_best, tri_best, u_best, v_best, steps = state
        live = node >= 0
        row = rows[jnp.maximum(node, 0)]  # (R, 128) — THE gather
        row, base, offmap, tri8 = _decode_row(row, leaf_max)
        is_leaf = row[:, 127] > 0.5

        # -- internal: 8-wide slab test ----------------------------------------
        t0x = (row[:, 0:8] - ox) * ix
        t1x = (row[:, 24:32] - ox) * ix
        t0y = (row[:, 8:16] - oy) * iy
        t1y = (row[:, 32:40] - oy) * iy
        t0z = (row[:, 16:24] - oz) * iz
        t1z = (row[:, 40:48] - oz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        hit8 = jnp.maximum(tn, tmin[:, None]) <= jnp.minimum(tf, t_best[:, None])
        # Empty slots carry inverted boxes (lo > hi), but the orderless
        # min/max slab test above would un-invert them into universe boxes —
        # every empty slot would "hit" and redundantly re-descend child base+0.
        # One compare masks them out (a real box always has lo.x <= hi.x).
        hit8 &= row[:, 0:8] <= row[:, 24:32]
        mask = jnp.sum(
            jnp.where(hit8, jnp.int32(1) << slots8[None, :], 0), axis=-1
        )

        # -- leaf: leaf_max-wide Möller-Trumbore (slot-major coordinate groups) --
        lm = leaf_max
        g = lambda k: row[:, k * lm:(k + 1) * lm]
        v0x, v0y, v0z = g(0), g(1), g(2)
        e1x = g(3) - v0x
        e1y = g(4) - v0y
        e1z = g(5) - v0z
        e2x = g(6) - v0x
        e2y = g(7) - v0y
        e2z = g(8) - v0z
        dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        okd = jnp.abs(det) > 1e-9
        invdet = 1.0 / jnp.where(okd, det, 1.0)
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        u8 = (tvx * px + tvy * py + tvz * pz) * invdet
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v8 = (dx * qx + dy * qy + dz * qz) * invdet
        t8 = (e2x * qx + e2y * qy + e2z * qz) * invdet
        ok8 = (
            okd
            & (u8 >= 0.0)
            & (v8 >= 0.0)
            & (u8 + v8 <= 1.0)
            & (tri8 >= 0)
            & (t8 >= tmin[:, None])
            & (t8 < t_best[:, None])
            & (is_leaf & live)[:, None]
        )
        if hit_filter is not None:
            ok8 &= hit_filter(
                jnp.maximum(tri8, 0).reshape(-1),
                u8.reshape(-1),
                v8.reshape(-1),
                ok8.reshape(-1),
            ).reshape(r, lm)
        t8m = jnp.where(ok8, t8, jnp.inf)
        sbest = jnp.argmin(t8m, axis=-1)
        onehot = jnp.arange(lm, dtype=jnp.int32)[None, :] == sbest[:, None]
        have = jnp.any(ok8, axis=-1)
        tc = jnp.sum(jnp.where(onehot, t8m, 0.0), axis=-1)
        upd = have & (tc < t_best)
        t_best = jnp.where(upd, tc, t_best)
        tri_best = jnp.where(
            upd, jnp.sum(jnp.where(onehot, tri8, 0), axis=-1), tri_best
        )
        u_best = jnp.where(upd, jnp.sum(jnp.where(onehot, u8, 0.0), axis=-1), u_best)
        v_best = jnp.where(upd, jnp.sum(jnp.where(onehot, v8, 0.0), axis=-1), v_best)

        # -- next node: descend / pop ------------------------------------------
        slot, remaining = first_slot(mask)
        descend = live & ~is_leaf & (mask != 0)
        child = base + ((offmap >> (3 * slot)) & 7)
        push = descend & (remaining != 0)
        entry = base * 256 + remaining
        at_sp = lane == sp[None, :]  # (D, R)
        pushm = at_sp & push[None, :]
        stack = jnp.where(pushm, entry[None, :], stack)
        stack_b = jnp.where(pushm, offmap[None, :], stack_b)
        sp_desc = sp + push.astype(jnp.int32)

        need_pop = live & (is_leaf | (mask == 0))
        if anyhit:
            need_pop &= ~have  # terminate on first accepted hit
        can_pop = need_pop & (sp > 0)
        at_top = lane == (sp - 1)[None, :]  # (D, R)
        top = jnp.sum(jnp.where(at_top, stack, 0), axis=0)
        top_off = jnp.sum(jnp.where(at_top, stack_b, 0), axis=0)
        pmask = top & 255
        pslot, prem = first_slot(pmask)
        pchild = (top >> 8) + ((top_off >> (3 * pslot)) & 7)
        new_top = (top & ~jnp.int32(255)) | prem
        stack = jnp.where(at_top & can_pop[None, :], new_top[None, :], stack)
        sp = jnp.where(
            can_pop & (prem == 0), sp - 1, jnp.where(descend, sp_desc, sp)
        )

        node = jnp.where(
            descend, child, jnp.where(can_pop, pchild, jnp.int32(-1))
        )
        node = jnp.where(live, node, -1)
        return node, sp, stack, stack_b, t_best, tri_best, u_best, v_best, steps + 1

    if init_state is None:
        init = (
            jnp.full((r,), root, jnp.int32),
            jnp.zeros((r,), jnp.int32),
            jnp.zeros((depth, r), jnp.int32),
            jnp.zeros((depth, r), jnp.int32),
            tmax,
            jnp.full((r,), -1, jnp.int32),
            jnp.zeros((r,), jnp.float32),
            jnp.zeros((r,), jnp.float32),
            jnp.int32(0),
        )
    else:
        init = tuple(init_state) + (jnp.int32(0),)

    if unroll > 1:
        # chain `unroll` steps per while iteration: finished rays no-op
        # (live=False masks every update), so the only cost is up to
        # unroll-1 wasted lockstep steps per strip in exchange for 1/unroll
        # of the loop-condition pipeline bubbles.
        def body_u(state):
            for _ in range(unroll):
                state = body(state)
            return state

        out = jax.lax.while_loop(cond, body_u, init)
    else:
        out = jax.lax.while_loop(cond, body, init)
    if return_state:
        return out[:8]
    return out[4], out[5], out[6], out[7]


def _trace8_packet(
    rows,  # (N, 128) BVH8 table (ops/bvh8.py layout)
    root: int,
    depth: int,
    origin,  # (R, 3), R = P * K, rays in image order (coherent packets)
    direction,
    tmin,  # (R,)
    tmax,  # (R,)
    anyhit: bool,
    hit_filter,
    max_steps: int,
    k_rays: int = 128,
    leaf_max: int = 8,
    init_state=None,
    return_state: bool = False,
):
    """PACKET traversal: K=128 rays share one BVH8 walk — one (N, 128) row
    gather per PACKET-step instead of per ray-step (the classic packet/beam
    traversal, laid out TPU-first: packets on the sublane axis, the packet's
    128 rays on the lane axis, so every slab/triangle test is a full-width
    (P, 128) VPU op with zero relayouts).

    A packet visits the UNION of its rays' walks, so this wins when rays are
    coherent (shadow wavefronts from contiguous pixels, primary rays): the
    per-step gather count drops 128x and the extra VPU work (every ray tests
    every visited box/triangle) is nearly free next to the gather-issue
    bound (docs/PERF_STATUS.md).  Incoherent wavefronts (AO hemispheres)
    degrade toward the union of everything — use the per-ray path there.

    Per-ray state: t_best/tri/u/v (P, K).  A ray leaves the active set when
    anyhit finds its hit (or its tmax < tmin: dead-ray elimination); boxes
    are entered if ANY active ray hits them; the packet retires when its
    stack empties or no ray is active.  Child visit order is XOR-octant by
    the packet's first ray (coherent packets share the octant; for mixed
    packets it is just a weaker heuristic, never a correctness issue)."""
    k = k_rays
    r = origin.shape[0]
    p = r // k
    d3 = direction
    safe_d = jnp.where(jnp.abs(d3) < 1e-12,
                       jnp.where(d3 >= 0, 1e-12, -1e-12), d3)
    inv = 1.0 / safe_d
    ox = origin[:, 0].reshape(p, k)
    oy = origin[:, 1].reshape(p, k)
    oz = origin[:, 2].reshape(p, k)
    ix = inv[:, 0].reshape(p, k)
    iy = inv[:, 1].reshape(p, k)
    iz = inv[:, 2].reshape(p, k)
    dx = d3[:, 0].reshape(p, k)
    dy = d3[:, 1].reshape(p, k)
    dz = d3[:, 2].reshape(p, k)
    tmin2 = tmin.reshape(p, k)
    tmax2 = tmax.reshape(p, k)
    oct_ = ray_octants(d3.reshape(p, k, 3)[:, 0, :])  # (P,) first-ray octant
    slots8 = jnp.arange(8, dtype=jnp.int32)
    lane = jnp.arange(depth, dtype=jnp.int32)[:, None]  # (D, 1)

    def first_slot(mask):
        bits = (mask[:, None] >> (slots8[None, :] ^ oct_[:, None])) & 1
        kk = jnp.argmax(bits, axis=-1).astype(jnp.int32)
        slot = kk ^ oct_
        return slot, mask & ~(1 << slot)

    def cond(state):
        node = state[0]
        steps = state[-1]
        return jnp.any(node >= 0) & (steps < max_steps)

    def body(state):
        node, sp, stack, stack_b, t_best, tri_best, u_best, v_best, steps = state
        live = node >= 0  # (P,)
        row = rows[jnp.maximum(node, 0)]  # (P, 128) — THE gather (one/packet)
        row, base, offmap, tri8 = _decode_row(row, leaf_max)
        is_leaf = row[:, 127] > 0.5
        if anyhit:
            ray_active = tri_best < 0
        else:
            ray_active = jnp.ones_like(tri_best, dtype=bool)
        ray_active &= tmax2 >= tmin2  # dead rays never participate

        # -- internal: 8 child boxes vs all K rays ---------------------------
        mask = jnp.zeros((p,), jnp.int32)
        for s in range(8):
            lox, loy, loz = row[:, s], row[:, 8 + s], row[:, 16 + s]
            hix, hiy, hiz = row[:, 24 + s], row[:, 32 + s], row[:, 40 + s]
            t0x = (lox[:, None] - ox) * ix
            t1x = (hix[:, None] - ox) * ix
            t0y = (loy[:, None] - oy) * iy
            t1y = (hiy[:, None] - oy) * iy
            t0z = (loz[:, None] - oz) * iz
            t1z = (hiz[:, None] - oz) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            hit_s = (jnp.maximum(tn, tmin2) <= jnp.minimum(tf, t_best)) & ray_active
            any_s = jnp.any(hit_s, axis=-1) & (lox <= hix)  # empty-slot guard
            mask |= jnp.where(any_s, jnp.int32(1) << s, 0)
        mask = jnp.where(live & ~is_leaf, mask, 0)

        # -- leaf: leaf_max triangles vs all K rays --------------------------
        lm = leaf_max
        leaf_active = is_leaf & live
        for s in range(lm):
            v0x, v0y, v0z = (
                row[:, 0 * lm + s], row[:, 1 * lm + s], row[:, 2 * lm + s]
            )
            v1x, v1y, v1z = (
                row[:, 3 * lm + s], row[:, 4 * lm + s], row[:, 5 * lm + s]
            )
            v2x, v2y, v2z = (
                row[:, 6 * lm + s], row[:, 7 * lm + s], row[:, 8 * lm + s]
            )
            e1x = (v1x - v0x)[:, None]
            e1y = (v1y - v0y)[:, None]
            e1z = (v1z - v0z)[:, None]
            e2x = (v2x - v0x)[:, None]
            e2y = (v2y - v0y)[:, None]
            e2z = (v2z - v0z)[:, None]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            okd = jnp.abs(det) > 1e-9
            invdet = 1.0 / jnp.where(okd, det, 1.0)
            tvx = ox - v0x[:, None]
            tvy = oy - v0y[:, None]
            tvz = oz - v0z[:, None]
            u8 = (tvx * px + tvy * py + tvz * pz) * invdet
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v8 = (dx * qx + dy * qy + dz * qz) * invdet
            t8 = (e2x * qx + e2y * qy + e2z * qz) * invdet
            tri_s = tri8[:, s]  # (P,)
            ok = (
                okd & (u8 >= 0.0) & (v8 >= 0.0) & (u8 + v8 <= 1.0)
                & (tri_s >= 0)[:, None]
                & (t8 >= tmin2) & (t8 < t_best)
                & leaf_active[:, None] & ray_active
            )
            if hit_filter is not None:
                ok &= hit_filter(
                    jnp.broadcast_to(
                        jnp.maximum(tri_s, 0)[:, None], (p, k)
                    ).reshape(-1),
                    u8.reshape(-1),
                    v8.reshape(-1),
                    ok.reshape(-1),
                ).reshape(p, k)
            t_best = jnp.where(ok, t8, t_best)
            tri_best = jnp.where(ok, tri_s[:, None], tri_best)
            u_best = jnp.where(ok, u8, u_best)
            v_best = jnp.where(ok, v8, v_best)
            if anyhit:
                ray_active &= tri_best < 0

        # -- next node: descend / pop (packet granularity, as in _trace8) ----
        slot, remaining = first_slot(mask)
        descend = live & ~is_leaf & (mask != 0)
        child = base + ((offmap >> (3 * slot)) & 7)
        push = descend & (remaining != 0)
        entry = base * 256 + remaining
        at_sp = lane == sp[None, :]
        pushm = at_sp & push[None, :]
        stack = jnp.where(pushm, entry[None, :], stack)
        stack_b = jnp.where(pushm, offmap[None, :], stack_b)
        sp_desc = sp + push.astype(jnp.int32)

        need_pop = live & (is_leaf | (mask == 0))
        if anyhit:
            # packet retires early once every ray found its hit (or is dead)
            need_pop |= live & ~jnp.any(ray_active, axis=-1)
        can_pop = need_pop & (sp > 0)
        at_top = lane == (sp - 1)[None, :]
        top = jnp.sum(jnp.where(at_top, stack, 0), axis=0)
        top_off = jnp.sum(jnp.where(at_top, stack_b, 0), axis=0)
        pmask = top & 255
        pslot, prem = first_slot(pmask)
        pchild = (top >> 8) + ((top_off >> (3 * pslot)) & 7)
        new_top = (top & ~jnp.int32(255)) | prem
        stack = jnp.where(at_top & can_pop[None, :], new_top[None, :], stack)
        sp = jnp.where(
            can_pop & (prem == 0), sp - 1, jnp.where(descend, sp_desc, sp)
        )
        all_done = jnp.zeros((p,), bool)
        if anyhit:
            all_done = live & ~jnp.any(ray_active, axis=-1)
        node = jnp.where(
            descend & ~all_done, child,
            jnp.where(can_pop & ~all_done, pchild, jnp.int32(-1)),
        )
        node = jnp.where(live, node, -1)
        return (
            node, sp, stack, stack_b, t_best, tri_best, u_best, v_best,
            steps + 1,
        )

    if init_state is None:
        init = (
            jnp.full((p,), root, jnp.int32),
            jnp.zeros((p,), jnp.int32),
            jnp.zeros((depth, p), jnp.int32),
            jnp.zeros((depth, p), jnp.int32),
            tmax2,
            jnp.full((p, k), -1, jnp.int32),
            jnp.zeros((p, k), jnp.float32),
            jnp.zeros((p, k), jnp.float32),
            jnp.int32(0),
        )
    else:
        # phase continuation (_trace8_packet_phased): resume a prior phase's
        # state with the step counter rezeroed so max_steps bounds THIS phase
        init = init_state[:-1] + (jnp.int32(0),)
    out = jax.lax.while_loop(cond, body, init)
    if return_state:
        return out
    return (
        out[4].reshape(r), out[5].reshape(r), out[6].reshape(r),
        out[7].reshape(r),
    )


def _trace8_packet_phased(
    rows,
    root: int,
    depth: int,
    origin,
    direction,
    tmin,
    tmax,
    anyhit: bool,
    hit_filter,
    max_steps: int,
    packet_phases=((64, 8),),
    k_rays: int = 128,
    leaf_max: int = 8,
):
    """_trace8_packet with staged compaction at PACKET granularity.

    The packet loop pays every step for every packet, but almost all packets
    retire quickly — the surviving tail is grazing rays (e.g. shadow rays
    from N.L <= 0 pixels skimming parallel to their surface, measured ~800 ms
    of the 1080p full-hybrid frame) whose union walks run 10-100x longer than
    the median.  Compaction at RAY granularity was retired (nonzero/scatter
    at multi-million width costs ~100-200 ms, docs/PERF_STATUS.md rule 5),
    but at PACKET granularity the index vectors are ~16k elements — the
    nonzero, the (cap, K) state gathers, and the scatter-back are all cheap.

    Each (p_steps, frac) phase runs the full-width loop p_steps steps, then
    compacts live packets into a P/frac buffer.  Exactness is unconditional:
    overflow of any compaction buffer triggers one top-level uncompacted
    re-trace (lax.cond, costs nothing unless taken), and padding uses the
    out-of-range index + mode='drop' scatters (fill_value=0 would clobber
    packet 0 with stale pre-phase state whenever it survives)."""
    k = k_rays
    r0 = origin.shape[0]
    p0 = r0 // k

    state = None
    o_c, d_c, tn_c, tx_c = origin, direction, tmin, tmax
    overflow = jnp.bool_(False)
    levels = []  # (idx, packet-shaped t/tri/u/v before compaction)
    steps_used = 0
    for p_steps, frac in packet_phases:
        take = max(0, min(p_steps, max_steps - steps_used))
        state = _trace8_packet(
            rows, root, depth, o_c, d_c, tn_c, tx_c, anyhit, hit_filter,
            take, k_rays=k, leaf_max=leaf_max, init_state=state,
            return_state=True,
        )
        steps_used += take
        p = o_c.shape[0] // k
        cap = max(8, p // frac)
        if cap >= p:
            continue
        alive = state[0] >= 0
        overflow |= jnp.sum(alive.astype(jnp.int32)) > cap
        (idx,) = jnp.nonzero(alive, size=cap, fill_value=p)
        ok = idx < p
        safe = jnp.minimum(idx, p - 1)
        levels.append((idx, state[4], state[5], state[6], state[7]))
        state = (
            jnp.where(ok, state[0][safe], -1),
            state[1][safe],
            state[2][:, safe],
            state[3][:, safe],
            state[4][safe],
            state[5][safe],
            state[6][safe],
            state[7][safe],
            state[8],
        )
        pk = lambda a: a.reshape((p, k) + a.shape[1:])[safe].reshape(
            (cap * k,) + a.shape[1:]
        )
        o_c, d_c, tn_c, tx_c = pk(o_c), pk(d_c), pk(tn_c), pk(tx_c)

    t, tri, u, v = _trace8_packet(
        rows, root, depth, o_c, d_c, tn_c, tx_c, anyhit, hit_filter,
        max(0, max_steps - steps_used), k_rays=k, leaf_max=leaf_max,
        init_state=state,
    )
    cap = o_c.shape[0] // k
    t, tri = t.reshape(cap, k), tri.reshape(cap, k)
    u, v = u.reshape(cap, k), v.reshape(cap, k)
    for idx, t_b, tri_b, u_b, v_b in reversed(levels):
        t = t_b.at[idx].set(t, mode="drop")
        tri = tri_b.at[idx].set(tri, mode="drop")
        u = u_b.at[idx].set(u, mode="drop")
        v = v_b.at[idx].set(v, mode="drop")
    out = (t.reshape(r0), tri.reshape(r0), u.reshape(r0), v.reshape(r0))
    if not levels:
        return out

    def fallback(_):
        return _trace8_packet(
            rows, root, depth, origin, direction, tmin, tmax, anyhit,
            hit_filter, max_steps, k_rays=k, leaf_max=leaf_max,
        )

    return jax.lax.cond(overflow, fallback, lambda _: out, None)


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


def _trace_flat(
    nodes,  # (2L-1, 8) packed
    tris9,  # (T, 9) packed
    order,  # (L * leaf_size,) triangle ids per leaf group (-1 padding)
    leaf_size: int,
    root: int,
    origin,
    direction,
    tmin,
    tmax,
    anyhit: bool,
    hit_filter,
    max_steps: int,
):
    r = origin.shape[0]
    d = direction
    safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    inv_d = 1.0 / safe_d

    def cond(state):
        node, t_best, tri_best, u_best, v_best, steps = state
        return jnp.any(node >= 0) & (steps < max_steps)

    def body(state):
        node, t_best, tri_best, u_best, v_best, steps = state
        live = node >= 0
        row = nodes[jnp.maximum(node, 0)]  # (R, 8) single gather
        nxt = row[:, 6]
        esc = row[:, 7].astype(jnp.int32)
        is_leaf = nxt < -1.5

        # slab test against the node AABB, bounded by the current best t
        t0 = (row[:, 0:3] - origin) * inv_d
        t1 = (row[:, 3:6] - origin) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = jnp.maximum(tn, tmin) <= jnp.minimum(tf, t_best)

        # leaf: test the leaf's triangle group (leaf_size row gathers, one step)
        start = jnp.where(is_leaf, (-nxt - 2.0).astype(jnp.int32), 0)
        any_ok = jnp.zeros_like(is_leaf)
        for jj in range(leaf_size):
            tri = order[start + jj] if leaf_size > 1 else order[start]
            tri_ok = tri >= 0
            tri_s = jnp.maximum(tri, 0)
            tv = tris9[tri_s]  # (R, 9)
            t, u, v, ok = moller_trumbore(
                tv[:, 0:3], tv[:, 3:6], tv[:, 6:9], origin, d
            )
            ok &= is_leaf & live & tri_ok & (t >= tmin) & (t < t_best)
            if hit_filter is not None:
                ok &= hit_filter(tri_s, u, v, ok)
            t_best = jnp.where(ok, t, t_best)
            tri_best = jnp.where(ok, tri_s, tri_best)
            u_best = jnp.where(ok, u, u_best)
            v_best = jnp.where(ok, v, v_best)
            any_ok |= ok

        nxt_node = jnp.where(
            is_leaf | ~box_hit, esc, nxt.astype(jnp.int32)
        )
        if anyhit:
            nxt_node = jnp.where(any_ok, -1, nxt_node)  # terminate on first hit
        node = jnp.where(live, nxt_node, node)
        return node, t_best, tri_best, u_best, v_best, steps + 1

    init = (
        jnp.full((r,), root, jnp.int32),
        tmax,
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
        jnp.int32(0),
    )
    node, t_best, tri_best, u_best, v_best, _ = jax.lax.while_loop(cond, body, init)
    return t_best, tri_best, u_best, v_best


@partial(
    jax.jit,
    static_argnames=(
        "anyhit", "hit_filter", "max_steps", "strips", "compact",
        "sort_rays", "packets", "packet_phases", "unroll",
    ),
)
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
    strips: int = 32,
    compact: bool = False,
    sort_rays: bool = False,
    packets: int = 0,
    packet_phases=((64, 8),),
    unroll: int = 1,
) -> HitRecord:
    """Trace rays. origin/direction: (R, 3); tmin/tmax scalars or (R,).

    Production paths all take a BVH8 (ops/bvh8.py):
      * packets=K groups every K consecutive rays into a (sub-)packet sharing
        one BVH8 walk — K=128 fills the lane axis (_trace8_packet, coherent
        wavefronts); K<128 runs the same kernel with a narrower lane axis
        (padded to 128 lanes — exactness tool, not a production schedule).
      * compact (requires packets): staged compaction at (sub-)packet
        granularity, schedule packet_phases — use when a small tail of
        long-walking packets (grazing rays) would otherwise stretch the
        lockstep loop (per-packet nonzero/scatter is cheap at ~16k packets).
      * packets=0: per-ray BVH8 walk (_trace8) — fallback when the wavefront
        can't be packet-tiled.
    A legacy threaded-LBVH `BVH` routes to the simple skip-pointer walk
    (_trace_flat), kept as the independent ORACLE for BVH8/native-builder
    tests — never the production path.

    strips: number of sequential ray slices (see module docstring); rays are
    padded to a multiple.  sort_rays: stable-sort rays by direction octant
    before stripping (and unsort after) so each lockstep strip is
    direction-coherent.  hit_filter(tri (R,), u, v, candidate) -> accept mask.
    """
    r = origin.shape[0]
    tmin_a = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax_a = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))

    wide = isinstance(bvh, BVH8)
    if wide:
        n_nodes = bvh.num_rows
    else:
        nodes = pack_nodes(bvh)
        tris9 = pack_tris(tri_verts)
        n_nodes = nodes.shape[0]
    if compact and not packets:
        raise ValueError(
            "compact=True requires packets>0 (ray-level phased compaction "
            "was retired: measured loser vs packet-level, round 3)"
        )
    if max_steps is None:
        # The threaded walk visits at most ~2 nodes per descend/skip; bounding
        # the lockstep loop caps the pathological worst ray (a grazing miss that
        # walks a large fraction of the tree) at negligible quality cost.
        max_steps = min(4 * n_nodes + 4, 32768)

    perm = None
    if sort_rays:
        # stable sort: within an octant, rays keep their (already spatially
        # coherent) image order.  argsort + 1-D index gathers are cheap on TPU.
        perm = jnp.argsort(ray_octants(direction), stable=True)
        origin = origin[perm]
        direction = direction[perm]
        tmin_a = tmin_a[perm]
        tmax_a = tmax_a[perm]

    strips = max(1, min(strips, max(1, r // 1024)))
    if packets:
        assert isinstance(bvh, BVH8), "packet traversal needs a BVH8"
        # strip width must hold whole packets
        strips = max(1, min(strips, max(1, r // (8 * packets))))
        pad = (-r) % (strips * packets)
    else:
        pad = (-r) % strips
    if pad:
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3), origin.dtype)])
        direction = jnp.concatenate(
            [direction, jnp.ones((pad, 3), direction.dtype)]
        )
        tmin_a = jnp.concatenate([tmin_a, jnp.zeros((pad,), jnp.float32)])
        # padding rays get tmax < tmin -> never hit, exit instantly
        tmax_a = jnp.concatenate([tmax_a, jnp.full((pad,), -1.0, jnp.float32)])
    rp = r + pad

    def strip_fn(args):
        o, dd, tn, tx = args
        if wide:
            if packets:
                if compact:
                    return _trace8_packet_phased(
                        bvh.rows, bvh.root, bvh.depth, o, dd, tn, tx, anyhit,
                        hit_filter, max_steps, packet_phases=packet_phases,
                        k_rays=packets, leaf_max=bvh.leaf_max,
                    )
                return _trace8_packet(
                    bvh.rows, bvh.root, bvh.depth, o, dd, tn, tx, anyhit,
                    hit_filter, max_steps, k_rays=packets,
                    leaf_max=bvh.leaf_max,
                )
            return _trace8(
                bvh.rows, bvh.root, bvh.depth, o, dd, tn, tx, anyhit,
                hit_filter, max_steps, leaf_max=bvh.leaf_max, unroll=unroll,
            )
        return _trace_flat(
            nodes, tris9, bvh.order, bvh.leaf_size, bvh.root, o, dd, tn, tx,
            anyhit, hit_filter, max_steps
        )

    if strips > 1:
        shaped = (
            origin.reshape(strips, rp // strips, 3),
            direction.reshape(strips, rp // strips, 3),
            tmin_a.reshape(strips, rp // strips),
            tmax_a.reshape(strips, rp // strips),
        )
        t_best, tri_best, u_best, v_best = jax.lax.map(strip_fn, shaped)
        t_best = t_best.reshape(rp)[:r]
        tri_best = tri_best.reshape(rp)[:r]
        u_best = u_best.reshape(rp)[:r]
        v_best = v_best.reshape(rp)[:r]
    else:
        t_best, tri_best, u_best, v_best = strip_fn(
            (origin, direction, tmin_a, tmax_a)
        )
        t_best, tri_best = t_best[:r], tri_best[:r]
        u_best, v_best = u_best[:r], v_best[:r]

    if perm is not None:
        inv = jnp.argsort(perm)
        t_best, tri_best = t_best[inv], tri_best[inv]
        u_best, v_best = u_best[inv], v_best[inv]

    return HitRecord(t=t_best, tri=tri_best, u=u_best, v=v_best)


def make_alpha_hit_filter(scene, tables=None):
    """Non-opaque any-hit alpha test (shadow_anyhit.rahit:10-26): reject hits whose
    base-color alpha at the hit uv is below the material's cutoff.

    Gathers through the fused shade tables (ops/shadetab.py): 1 tri-static row
    (3 vertex uvs + the folded material fields) + 1 quad-atlas row for the
    bilinear tap = 2 indices/candidate, vs 6 in round 4 and ~26 on the
    round-1 per-channel path.  `tables=None` rebuilds them in-trace (test
    convenience); production callers pass the scene-cached tables."""
    from vulkanhybridrenderer_tpu.ops import shadetab

    if tables is None:
        tables = shadetab.build_shade_tables(scene)

    def hit_filter(tri, u, v, candidate):
        pm = shadetab.fetch_tri_static(tables, tri)  # ONE row gather
        w0 = 1.0 - u - v
        wts = jnp.stack([w0, u, v], axis=-1)  # (R, 3)
        uv = shadetab.interpolate3(pm["uv0"], wts)
        alpha = shadetab.sample_atlas4(
            tables, pm["base_tex"], pm["base_scale"], pm["base_offset"], uv
        )[..., 3]
        reject = (
            (pm["alpha_mask"] == 1.0)
            & (pm["base_tex"] >= 0)
            & (alpha < pm["alpha_cutoff"])
        )
        return ~reject

    return hit_filter
