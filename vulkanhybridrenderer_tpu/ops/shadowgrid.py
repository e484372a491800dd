"""Light-space 2D grid for directional-light shadow rays.

The hybrid path's shadow rays (raygen.rgen:31-41) all point within a
0.18-degree cone of ONE direction (cos_theta_max = 0.999995) — they are
near-parallel.  In a frame aligned to the light, such a ray stays inside a
single (u, v) column of a 2D grid (its lateral drift over the whole scene
depth is bounded by depth * tan(theta_max)).  So occlusion queries need no
tree walk at all:

  1. build: project every triangle onto the light's (u, v) plane, take its
     2D bbox DILATED by the maximum ray drift plus one cell of slack, and
     emit one entry per covered cell — the same sort-based binning as the
     rasterizer, with the full world-space triangle INLINED in the entry row
     (one gather per test, per-index cost model of docs/PERF_STATUS.md);
  2. trace: a ray looks up its origin's cell and Möller-Trumbore-tests the
     cell's entries in lockstep.  Tests are EXACT world-space intersections —
     the grid only culls, and the dilation makes the culling conservative, so
     the hit/miss answer equals brute force over all triangles (verified in
     tests against the BVH traversal).

Wired behind ``RenderConfig.shadow_accel = "grid"`` (models/hybrid.py
"Shadow Grid Build" pass; prebuilt host-side for static scenes, rebuilt
in-frame for animated ones) and proven frame-identical to the BVH8 shadow
trace (tests/test_hybrid_path.py::test_hybrid_shadow_accel_grid_matches_bvh).
The default stays "bvh8": for this project's scene densities the mean cell
occupancy (~30 entries/ray on SponzaProxy) does not beat the BVH8 mean walk
(14.5 steps) whose table is also VMEM-resident.  "grid" wins when triangles
are tiny relative to the light footprint (dense foliage/terrain) or when
build cost matters more than trace cost.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.ops.traverse import moller_trumbore
from vulkanhybridrenderer_tpu.utils.math3d import normalize

BIG_CAP = 128  # global big-tier capacity (huge occluders)
MED1_SPAN = 64  # compacted medium tier 1 span ceiling (cells)
MED2_SPAN = 256  # tier 2; beyond this -> global big list


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShadowGrid:
    entries: Any  # (E, 12) f32 [v0.xyz v1.xyz v2.xyz tri_id pad pad], cell-sorted
    offsets: Any  # (G*G + 1,) int32 entry range per cell
    u_axis: Any  # (3,) light-frame u
    v_axis: Any  # (3,) light-frame v
    origin_uv: Any  # (2,) grid window min in (u, v)
    inv_cell: Any  # (2,) 1 / cell size
    #: (BIG_CAP, 12) rows of triangles whose dilated span exceeds span_cap
    #: (huge floors/walls): tested by EVERY ray with a broadcast scan (no
    #: gathers — each row is a scalar-indexed slice)
    big: Any
    num_big: Any  # () int32
    grid: int = dataclasses.field(default=512, metadata=dict(static=True))
    span_cap: int = dataclasses.field(default=16, metadata=dict(static=True))
    overflow: Any = None  # () int32: big-tier candidates beyond BIG_CAP


def _light_frame(direction):
    """Orthonormal (u, v) spanning the plane perpendicular to the light."""
    d = normalize(jnp.asarray(direction, jnp.float32))
    up = jnp.where(jnp.abs(d[1]) < 0.9, jnp.array([0.0, 1.0, 0.0]),
                   jnp.array([1.0, 0.0, 0.0]))
    u = normalize(jnp.cross(up, d))
    v = jnp.cross(d, u)
    return d, u, v


def build_shadow_grid(tri_verts, light_direction, cone_tan: float = 3.163e-3,
                      grid: int | None = None, span_cap: int = 16) -> ShadowGrid:
    """tri_verts: (T, 3, 3) world triangles; light_direction: the direction the
    light TRAVELS (rays go along -light_direction).  cone_tan =
    tan(acos(0.999995)), the raygen cone half-angle.  grid=None picks a
    resolution matched to triangle density (cells ~ mean triangle size, so
    per-triangle spans stay under span_cap and cell lists stay short)."""
    if grid is None:
        # pick cell size ~ mean dilated triangle footprint (host-side sizing;
        # the structure itself is rebuilt in-jit for animated scenes with the
        # same static grid)
        import numpy as np

        tv = np.asarray(tri_verts)
        d = np.asarray(light_direction, np.float32)
        d = d / max(np.linalg.norm(d), 1e-9)
        up = np.array([0, 1, 0], np.float32) if abs(d[1]) < 0.9 else np.array(
            [1, 0, 0], np.float32
        )
        u = np.cross(up, d)
        u /= max(np.linalg.norm(u), 1e-9)
        v = np.cross(d, u)
        pu = tv @ u
        pv = tv @ v
        span = max(pu.max() - pu.min(), pv.max() - pv.min(), 1e-3)
        depth = (tv @ d).max() - (tv @ d).min()
        dilate = depth * cone_tan
        mean_size = float(
            np.mean(pu.max(1) - pu.min(1)) + np.mean(pv.max(1) - pv.min(1))
        ) * 0.5
        c_target = max(mean_size + 2.0 * dilate, span / 512.0)
        g = 32
        while g * 2 <= span / c_target and g < 512:
            g *= 2
        grid = g
    return _build_shadow_grid(tri_verts, light_direction, cone_tan, grid,
                              span_cap)


@partial(jax.jit, static_argnames=("grid", "span_cap"))
def _build_shadow_grid(tri_verts, light_direction, cone_tan, grid: int,
                       span_cap: int) -> ShadowGrid:
    t = tri_verts.shape[0]
    d, u, v = _light_frame(light_direction)
    pu = jnp.einsum("tvk,k->tv", tri_verts, u)  # (T, 3)
    pv = jnp.einsum("tvk,k->tv", tri_verts, v)
    pd = jnp.einsum("tvk,k->tv", tri_verts, d)

    lo_u, hi_u = jnp.min(pu), jnp.max(pu)
    lo_v, hi_v = jnp.min(pv), jnp.max(pv)
    depth = jnp.max(pd) - jnp.min(pd)
    dilate = depth * cone_tan  # max lateral drift of a cone-jittered ray
    pad = dilate + 1e-3
    span_u = jnp.maximum(hi_u - lo_u, 1e-3)
    span_v = jnp.maximum(hi_v - lo_v, 1e-3)
    cell = jnp.stack([span_u, span_v]) / grid
    inv_cell = 1.0 / cell
    origin_uv = jnp.stack([lo_u, lo_v])

    tu0 = (jnp.min(pu, 1) - pad - lo_u) * inv_cell[0]
    tu1 = (jnp.max(pu, 1) + pad - lo_u) * inv_cell[0]
    tv0 = (jnp.min(pv, 1) - pad - lo_v) * inv_cell[1]
    tv1 = (jnp.max(pv, 1) + pad - lo_v) * inv_cell[1]
    cu0 = jnp.clip(jnp.floor(tu0).astype(jnp.int32), 0, grid - 1)
    cu1 = jnp.clip(jnp.floor(tu1).astype(jnp.int32), 0, grid - 1)
    cv0 = jnp.clip(jnp.floor(tv0).astype(jnp.int32), 0, grid - 1)
    cv1 = jnp.clip(jnp.floor(tv1).astype(jnp.int32), 0, grid - 1)
    wspan = cu1 - cu0 + 1
    hspan = cv1 - cv0 + 1
    span = wspan * hspan
    ncells = grid * grid
    # tiers like the raster binning: dense enumeration for small spans,
    # COMPACTED side lists for medium spans, a global broadcast list beyond
    ok = span <= span_cap
    med1 = (span > span_cap) & (span <= MED1_SPAN)
    med2 = (span > MED1_SPAN) & (span <= MED2_SPAN)
    big_mask = span > MED2_SPAN
    med1_cap = max(4096, t // 8)
    med2_cap = max(1024, t // 16)
    n_big = jnp.sum(big_mask.astype(jnp.int32))
    overflow = (
        jnp.maximum(n_big - BIG_CAP, 0)
        + jnp.maximum(jnp.sum(med1.astype(jnp.int32)) - med1_cap, 0)
        + jnp.maximum(jnp.sum(med2.astype(jnp.int32)) - med2_cap, 0)
    )

    k = jnp.arange(span_cap, dtype=jnp.int32)[None, :]
    cu = cu0[:, None] + k % wspan[:, None]
    cv = cv0[:, None] + k // wspan[:, None]
    valid = ok[:, None] & (k < span[:, None])
    cell_id = jnp.where(valid, cv * grid + cu, ncells).reshape(-1)
    tri_id = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32)[:, None], (t, span_cap)
    ).reshape(-1)

    def med_entries(mask, cap, scap):
        (idx,) = jnp.nonzero(mask, size=cap, fill_value=0)
        n = jnp.sum(mask.astype(jnp.int32))
        slot_ok = jnp.arange(cap) < n
        kk = jnp.arange(scap, dtype=jnp.int32)[None, :]
        ws = wspan[idx][:, None]
        cuk = cu0[idx][:, None] + kk % ws
        cvk = cv0[idx][:, None] + kk // ws
        okk = slot_ok[:, None] & (kk < span[idx][:, None])
        cells = jnp.where(okk, cvk * grid + cuk, ncells).reshape(-1)
        tris_ = jnp.broadcast_to(idx[:, None].astype(jnp.int32),
                                 cells.shape[:1] and (cap, scap)).reshape(-1)
        return cells, tris_

    m1c, m1t = med_entries(med1, med1_cap, MED1_SPAN)
    m2c, m2t = med_entries(med2, med2_cap, MED2_SPAN)
    cell_id = jnp.concatenate([cell_id, m1c, m2c])
    tri_id = jnp.concatenate([tri_id, m1t, m2t])

    order = jnp.argsort(cell_id, stable=True)
    cell_sorted = cell_id[order]
    tri_sorted = tri_id[order]
    offsets = jnp.searchsorted(
        cell_sorted, jnp.arange(ncells + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    # inline the world triangle into each entry row: ONE gather per test
    tv9 = tri_verts.reshape(t, 9)
    safe = jnp.where(cell_sorted < ncells, tri_sorted, 0)
    rows = jnp.concatenate(
        [
            tv9[safe],
            jnp.where(cell_sorted < ncells, tri_sorted, -1).astype(
                jnp.float32
            )[:, None],
            jnp.zeros((tri_sorted.shape[0], 2), jnp.float32),
        ],
        axis=1,
    )
    (big_idx,) = jnp.nonzero(big_mask, size=BIG_CAP, fill_value=0)
    big_valid = jnp.arange(BIG_CAP) < jnp.minimum(n_big, BIG_CAP)
    big_rows = jnp.concatenate(
        [
            tv9[big_idx],
            jnp.where(big_valid, big_idx, -1).astype(jnp.float32)[:, None],
            jnp.zeros((BIG_CAP, 2), jnp.float32),
        ],
        axis=1,
    )
    return ShadowGrid(
        entries=rows, offsets=offsets, u_axis=u, v_axis=v,
        origin_uv=origin_uv, inv_cell=inv_cell, big=big_rows,
        num_big=jnp.minimum(n_big, BIG_CAP), grid=grid,
        span_cap=span_cap, overflow=overflow,
    )


def trace_shadow(sg: ShadowGrid, origin, direction, tmin, tmax,
                 hit_filter=None, strips: int = 32, max_steps: int = 4096):
    """anyhit occlusion for near-parallel rays: (R,) bool hit mask.

    Exact world-space Möller-Trumbore over the origin cell's entry list;
    rays whose origin projects outside the grid window test the edge cell,
    whose dilated lists still cover them conservatively only if they started
    inside the scene footprint — callers use this for surface-born shadow
    rays, which always do."""
    r = origin.shape[0]
    tmin_a = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax_a = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))

    pu = origin @ sg.u_axis
    pv = origin @ sg.v_axis
    cu = jnp.clip(
        jnp.floor((pu - sg.origin_uv[0]) * sg.inv_cell[0]).astype(jnp.int32),
        0, sg.grid - 1,
    )
    cv = jnp.clip(
        jnp.floor((pv - sg.origin_uv[1]) * sg.inv_cell[1]).astype(jnp.int32),
        0, sg.grid - 1,
    )
    cell = cv * sg.grid + cu
    start = sg.offsets[cell]
    count = sg.offsets[cell + 1] - start

    strips = max(1, min(strips, max(1, r // 1024)))
    pad = (-r) % strips
    if pad:
        zf = lambda a, fill: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]
        )
        origin = zf(origin, 0.0)
        direction = zf(direction, 1.0)
        tmin_a = zf(tmin_a, 0.0)
        tmax_a = zf(tmax_a, -1.0)
        start = zf(start, 0)
        count = zf(count, 0)
    rp = r + pad

    def strip_fn(args):
        o, dd, tn, tx, st, ct = args

        def cond(state):
            k, steps, hit = state
            return jnp.any(~hit & (k < ct)) & (steps < max_steps)

        def body(state):
            k, steps, hit = state
            live = ~hit & (k < ct)
            row = sg.entries[st + jnp.minimum(k, jnp.maximum(ct - 1, 0))]
            tri = row[:, 9].astype(jnp.int32)
            t, uu, vv, ok = moller_trumbore(
                row[:, 0:3], row[:, 3:6], row[:, 6:9], o, dd
            )
            ok &= live & (tri >= 0) & (t >= tn) & (t <= tx)
            if hit_filter is not None:
                ok &= hit_filter(jnp.maximum(tri, 0), uu, vv, ok)
            return jnp.where(live, k + 1, k), steps + 1, hit | ok

        k0 = jnp.zeros(o.shape[0], jnp.int32)
        hit0 = jnp.zeros(o.shape[0], bool)
        _, _, hit = jax.lax.while_loop(cond, body, (k0, jnp.int32(0), hit0))

        # big tier: broadcast scan, no gathers (each row is a static slice)
        def big_body(i, hit):
            row = sg.big[i]
            t, uu, vv, ok = moller_trumbore(
                row[0:3], row[3:6], row[6:9], o, dd
            )
            tri = row[9].astype(jnp.int32)
            ok &= (~hit) & (i < sg.num_big) & (tri >= 0) & (t >= tn) & (t <= tx)
            if hit_filter is not None:
                ok &= hit_filter(
                    jnp.broadcast_to(jnp.maximum(tri, 0), uu.shape), uu, vv, ok
                )
            return hit | ok

        hit = jax.lax.fori_loop(0, BIG_CAP, big_body, hit)
        return hit

    if strips > 1:
        shaped = tuple(
            a.reshape((strips, rp // strips) + a.shape[1:])
            for a in (origin, direction, tmin_a, tmax_a, start, count)
        )
        hit = jax.lax.map(strip_fn, shaped).reshape(rp)[:r]
    else:
        hit = strip_fn((origin, direction, tmin_a, tmax_a, start, count))[:r]
    return hit
