"""Production tiled rasterizer: sort-based triangle binning + a Pallas per-tile
depth-test kernel with an MXU (matmul) inner loop.

The brute-force reference rasterizer (ops/rasterizer.py) tests every triangle
against every pixel -- O(T * P) makes 1080p x 200k-triangle scenes impossible at
60 FPS.  This module implements the classic GPU binned approach, TPU-first:

  1. `bin_triangles` (pure jnp, fully vectorized): per-triangle screen bbox ->
     covered tile range; entries are enumerated COMPACTLY at their true count
     (sum of per-triangle tile spans) via the head-marking trick -- scatter a
     1 at each triangle's exclusive-cumsum(span) start, cumsum to recover the
     owning triangle per entry -- so the sort/scatter/gather machinery runs at
     ~sum(span) width instead of the round-2 dense (T * 16 + tier caps) width
     (2.6M -> ~0.4M entries on SponzaProxy@1080p: this was ~100 ms of every
     raster pass).  Any span is exact -- there are no capped side tiers and no
     per-tile-tested "big" list; one static `e_cap` bounds total entries and
     is validated host-side (Bins.overflow / Renderer.check_binning).  One
     multi-operand stable `lax.sort` by tile id carries the triangle ids with
     the keys (no post-sort permutation gathers), a searchsorted + aligned
     re-pack yields CHUNK-aligned per-tile entry ranges -- no atomics (the
     GPU version's per-bin atomic counters don't exist on TPU; sorting is the
     idiomatic replacement).  Entries are the HOMOGENEOUS plane equations of
     ops/rasterizer.triangle_setup (lambda_i/w and ndc-z are affine in screen
     space): 13 coefficients [l0|l1|l2|z as A*px+B*py+C, tri_id], gathered as
     one row per entry from a per-triangle plane table.

  2. `rasterize_binned`: a Pallas kernel, grid = one program per pixel tile.
     Per-tile entry ranges arrive via PrefetchScalarGridSpec; chunks of CHUNK
     triangles are DMA'd from HBM with double buffering, and the depth-test inner
     loop is pure matrix math on the MXU: with P = (pixels, 3) homogeneous pixel
     coords and C = (3, CHUNK) plane coefficients,

         lam_k = P @ C_k   (pixels, CHUNK)  for k = 0,1,2;   z = P @ C_z

     coverage = all lam_k >= 0 plus the reverse-Z depth-range test (which, in
     the homogeneous formulation, IS the near/behind-camera clip), then lane
     reductions extract the max-depth winner (tri id, l1, l2, and the 1/w sum
     for perspective-correct weights) per pixel.

Alpha-masked geometry is *excluded* from the opaque binned pass (its
per-fragment texture kill needs atlas gathers, impossible in-kernel) and
rendered by `rasterize_alpha_peeled`: a binned DEPTH-PEELING raster of the
masked subset whose per-pixel winners are alpha-tested through the fused
shade tables between rounds, with a (z, id) peel bound as a tile-kernel
input; the result merges via `merge_visibility`.

Tie-break parity: within a tile, equal-depth coverage resolves to the largest
triangle id of the tie (the brute rasterizer resolves to the *last submitted*);
they differ only on exactly-coplanar overlapping pixels (tested tolerance).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vulkanhybridrenderer_tpu.ops.rasterizer import TriangleSetup, VisibilityBuffer

TILE_H = 8
TILE_W = 128
CHUNK = 128  # triangles per DMA chunk (lane count of a plane-coefficient block)
TILES_PER_PROG = 128  # tiles (columns) per grid program
GROUP = 8  # entry blocks fetched per DMA (amortizes DMA latency)

# rows of the packed plane SoA (16, CHUNK):
# 0..2  lam0 = A*px + B*py + C          3..5  lam1        6..8  lam2
# 9..11 z plane                         12    tri id (exact float)
_NFIELDS = 16


def default_e_cap(t: int, npix: int) -> int:
    """Static total-entry capacity: ~sum of per-triangle tile spans plus slack.
    Spans grow with resolution (a triangle's pixel area scales with npix), so
    high-res targets (4096^2 shadow maps) get a larger multiple.  Validated
    against the actual count by Bins.overflow / Renderer.check_binning."""
    mult = 4 if npix <= (1 << 22) else 10
    return max(65536, mult * t)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Bins:
    entry_data: Any  # (nblocks, 16, CHUNK) f32 plane rows, tile-sorted + aligned
    offsets: Any  # (ntiles_pad + 1,) int32 CHUNK-aligned entry start per tile
    counts: Any  # (ntiles_pad,) int32 actual entry count per tile
    chunk_tile: Any  # (nblocks,) int32 owning tile of each 128-entry block
    #: (1,) int32 excess of total tile entries over the static e_cap.
    #: Nonzero = triangles were dropped; rasterize_scene NaN-poisons the
    #: depth buffer on-device EVERY frame when this trips, and
    #: Renderer.check_binning raises a friendly host-side error on frame 1.
    overflow: Any = None


def _tile_counts(width: int, height: int, tile_h: int, tile_w: int):
    return math.ceil(width / tile_w), math.ceil(height / tile_h)


def _plane_table(setup: TriangleSetup, tri_ids=None):
    """Per-TRIANGLE plane-coefficient table (T + 1, 16) f32 from the setup's
    homogeneous planes (ops/rasterizer.triangle_setup), plus the float id in
    col 12.  Row T is a poison row (l0 == -1 everywhere: never covers) used for
    padding entries.  Entry packing costs ONE row gather per entry — gather
    cost on TPU is per-index regardless of row width (docs/PERF_STATUS.md).

    tri_ids: optional (T,) int ids to bake into col 12 instead of arange —
    subset rasters (alpha peeling) emit GLOBAL triangle ids directly, so no
    per-pixel local->global remap gather is ever paid."""
    t = setup.planes.shape[0]
    ids = (
        jnp.arange(t, dtype=jnp.float32)
        if tri_ids is None
        else tri_ids.astype(jnp.float32)
    )
    tab = jnp.zeros((t + 1, _NFIELDS), jnp.float32)
    tab = tab.at[:t, 0:12].set(setup.planes)
    tab = tab.at[:t, 12].set(ids)
    tab = tab.at[t, 2].set(-1.0)  # poison: l0 == -1 everywhere
    return tab


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "e_cap",
                     "cull_backface"),
)
def bin_triangles(
    setup: TriangleSetup,
    width: int,
    height: int,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    e_cap: int | None = None,
    cull_backface: bool = True,
    exclude_mask=None,
    tri_ids=None,
) -> Bins:
    ntx, nty = _tile_counts(width, height, tile_h, tile_w)
    ntiles = ntx * nty
    t = setup.sx.shape[0]
    if e_cap is None:
        e_cap = default_e_cap(t, width * height)

    alive = setup.valid & setup.w_any  # fully-behind-camera: never visible
    if cull_backface:
        alive &= setup.front  # det < 0 (see ops/rasterizer.py)
    if exclude_mask is not None:
        alive &= ~exclude_mask

    # setup.bbox is the conservative VISIBLE-projection bbox, correct for
    # triangles crossing the camera plane (ops/rasterizer.triangle_setup).
    xmin, ymin = setup.bbox[:, 0], setup.bbox[:, 1]
    xmax, ymax = setup.bbox[:, 2], setup.bbox[:, 3]
    alive &= (xmax > 0) & (xmin < width) & (ymax > 0) & (ymin < height)

    tx0 = jnp.clip(jnp.floor(xmin / tile_w).astype(jnp.int32), 0, ntx - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile_w).astype(jnp.int32), 0, ntx - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile_h).astype(jnp.int32), 0, nty - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile_h).astype(jnp.int32), 0, nty - 1)
    wspan = tx1 - tx0 + 1
    span = jnp.where(alive, wspan * (ty1 - ty0 + 1), 0)

    # ---- compact entry enumeration (head marking) ------------------------------
    # Entry e belongs to the triangle whose exclusive-cumsum(span) segment
    # contains e.  Scatter-max each alive triangle's id+1 at its segment
    # start, cummax back to fill the segments: every array here is e_cap-wide
    # (~sum(span)), not dense T x span_cap.  (Scatter-max, not add: several
    # triangles can share a start position when zero-span ones sit between.)
    #
    # Gather discipline (measured, scripts/attr_gbuffer.py): a 1-D gather from
    # a (T,) table pays the HBM per-index rate (~11 ns) because XLA pads the
    # operand to 128 lanes (T x 128 x 4 B >> VMEM).  Four separate per-entry
    # gathers (cum/wspan/ty0/tx0) were 18 ms of the 31 ms binning cost at
    # 1080p/Sponza.  So: (a) segment starts are recovered by a SECOND cummax
    # over head-scattered cum values (exclusive starts are monotone in
    # triangle id, so segment-fill-by-cummax is exact), and (b) the tile-bbox
    # info is packed into ONE int32 per triangle -> one row gather total.
    cum = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(span).astype(jnp.int32)]
    )  # (T + 1,) exclusive starts; cum[T] = true total entry count
    total = cum[t]
    overflow = jnp.maximum(total - e_cap, 0)[None]
    tri_ids1 = jnp.where(span > 0, jnp.arange(t, dtype=jnp.int32) + 1, 0)
    heads = (
        jnp.zeros(e_cap, jnp.int32).at[cum[:t]].max(tri_ids1, mode="drop")
    )
    # scatter-max the segment start position itself (cum is monotone, and
    # only span>0 triangles may win a slot: scatter cum+1 so a zero-span
    # triangle sharing the slot can never shadow position 0)
    starts = (
        jnp.zeros(e_cap, jnp.int32)
        .at[cum[:t]]
        .max(jnp.where(span > 0, cum[:t] + 1, 0), mode="drop")
    )
    tri_of = jnp.clip(jax.lax.cummax(heads) - 1, 0, t - 1)
    cum_of = jax.lax.cummax(starts) - 1  # exclusive start of e's segment
    # packed per-triangle tile-bbox row: tile_base * (ntx + 1) + wspan, with
    # tile_base = ty0 * ntx + tx0  (fits int32 for any realistic target:
    # ntiles * (ntx + 1) at 4096^2 is ~541k)
    pack_t = (ty0 * ntx + tx0) * (ntx + 1) + wspan
    packed_of = pack_t[tri_of]  # the ONE per-entry gather
    e_iota = jnp.arange(e_cap, dtype=jnp.int32)
    k = e_iota - cum_of  # row-major index into the triangle's tile bbox
    ws = jnp.maximum(packed_of % (ntx + 1), 1)
    tile_base = packed_of // (ntx + 1)
    # k // ws via f32: the +0.5 bias keeps the true quotient a safe distance
    # from integers, so floor is exact — but only while k + 0.5 is itself
    # exactly representable, i.e. k < 2^23 (measured: ~7% wrong quotients
    # just past 2^23).  e_cap is static, so branch at trace time: huge entry
    # totals (>~840k tris at shadow-map res) pay the exact integer-divide
    # VPU sequence instead of silently mis-binning.
    if e_cap <= (1 << 23):
        kq = jnp.floor((k.astype(jnp.float32) + 0.5) / ws.astype(jnp.float32))
        kq = kq.astype(jnp.int32)
    else:
        kq = jnp.maximum(k, 0) // ws
    tile = tile_base + kq * ntx + (k - kq * ws)
    valid_e = e_iota < jnp.minimum(total, e_cap)
    tile = jnp.where(valid_e, tile, ntiles).astype(jnp.int32)

    # ---- group by tile: ONE multi-operand stable sort --------------------------
    # (carrying tri ids through lax.sort avoids the two e_cap-wide permutation
    # gathers an argsort + apply formulation pays)
    tile_sorted, tri_sorted = jax.lax.sort(
        (tile, tri_of), dimension=0, is_stable=True, num_keys=1
    )
    offsets_raw = jnp.searchsorted(
        tile_sorted, jnp.arange(ntiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    # Re-pack per-tile ranges to CHUNK-aligned starts (whole-block DMA: Mosaic
    # requires aligned lane-dim slices, so the kernel indexes 128-entry blocks).
    counts = offsets_raw[1:] - offsets_raw[:-1]  # (ntiles,)
    aligned_counts = ((counts + CHUNK - 1) // CHUNK) * CHUNK
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned_counts).astype(jnp.int32)]
    )
    # pad tile tables to a multiple of TILES_PER_PROG (padding tiles are empty)
    ntiles_pad = ((ntiles + TILES_PER_PROG - 1) // TILES_PER_PROG) * TILES_PER_PROG
    if ntiles_pad != ntiles:
        offsets_pad = jnp.concatenate(
            [offsets, jnp.broadcast_to(offsets[-1:], (ntiles_pad - ntiles,))]
        )
        counts_pad = jnp.concatenate(
            [counts, jnp.zeros(ntiles_pad - ntiles, jnp.int32)]
        )
    else:
        offsets_pad, counts_pad = offsets, counts
    # static dense size: every tile's alignment waste is < CHUNK (+GROUP slack)
    d_total = (((e_cap + CHUNK - 1) // CHUNK) + ntiles + GROUP) * CHUNK
    valid_entry = tile_sorted < ntiles
    # one (ntiles, 2) row gather for both per-entry offset lookups
    offs2 = jnp.stack([offsets_raw[:ntiles], offsets[:ntiles]], axis=1)
    offs2_of = offs2[jnp.minimum(tile_sorted, ntiles - 1)]
    rank = e_iota - offs2_of[:, 0]
    dest = jnp.where(
        valid_entry,
        offs2_of[:, 1] + rank,
        d_total,  # dumped into the trailing scratch slot
    )
    # one fused scatter: slot value = tri + 1, 0 = empty (avoids a second
    # boolean-validity scatter; scatters cost ~8 ns per index)
    tri_plus = (
        jnp.zeros(d_total + 1, jnp.int32)
        .at[dest]
        .set(jnp.where(valid_entry, tri_sorted + 1, 0))[:-1]
    )
    plane_tab = _plane_table(setup, tri_ids)  # (T + 1, 16), no gathers
    safe_dense = jnp.where(tri_plus > 0, tri_plus - 1, t)
    packed = plane_tab[safe_dense]  # ONE row gather for all entries
    entry_data = packed.reshape(d_total // CHUNK, CHUNK, _NFIELDS).transpose(0, 2, 1)

    # ---- chunk -> tile ownership table (drives the flat stream loop) ------------
    nblocks = d_total // CHUNK
    block_starts = jnp.arange(nblocks, dtype=jnp.int32) * CHUNK
    chunk_tile = (
        jnp.searchsorted(offsets_pad, block_starts, side="right").astype(jnp.int32)
        - 1
    )
    chunk_tile = jnp.clip(chunk_tile, 0, ntiles_pad - 1)

    return Bins(
        entry_data=entry_data,
        offsets=offsets_pad,
        counts=counts_pad,
        chunk_tile=chunk_tile,
        overflow=overflow,
    )


def _raster_kernel(
    # refs, in order:
    # offsets_ref  (ntiles_pad + 1,) SMEM (CHUNK-aligned starts)
    # counts_ref   (ntiles_pad,) SMEM (true entry counts)
    # ctile_ref    (nblocks,) SMEM (owning tile per block)
    # [tileid_ref  (ntiles_pad,) SMEM, only when remap: PHYSICAL screen tile
    #   per (compact) tile index — pixel coords come from the physical tile
    #   while entry ranges / output columns stay compact.  Lets the
    #   alpha-peel rounds raster only the tiles that still have killed
    #   pixels (a compacted tile list) instead of the whole screen.]
    # entry_hbm    (nblocks, 16, CHUNK) ANY/HBM
    # [zcap_ref, captid_ref]  ((npx, TILES_PER_PROG) VMEM, only when use_zcap:
    #   per-pixel depth-peel bound — a fragment is covered only when
    #   (z, tri_id) < (zcap, captid) lexicographically (reverse-Z: strictly
    #   BELOW the previously killed winner, ties broken by the kernel's
    #   largest-id-wins rule).  Drives the binned alpha-mask peeling.]
    # outputs ((npx, TILES_PER_PROG) block: one column per tile of this program)
    # scratch
    #   chunk_vmem (2, GROUP, 16, CHUNK) DMA landing buffers, sem (2,)
    *refs,
    tile_h: int,
    tile_w: int,
    ntx: int,
    ntiles: int,
    use_zcap: bool = False,
    remap: bool = False,
):
    """Flat-stream formulation: one fori_loop over this program's entry BLOCKS
    (not per-tile loops -- per-tile setup cost dominated the previous design).
    Each block knows its owning tile via ctile_ref; per block: DMA wait/start,
    (npx, CHUNK) broadcast-FMA coverage/depth, winner reduction, and a masked merge
    into the owning tile's output column.  Pixels on sublanes, triangles on lanes:
    zero relayouts.  (Arbitrary-span triangles get exact per-tile entries from
    the compact binning enumeration -- there is no separate "big" list.)"""
    refs = list(refs)
    offsets_ref, counts_ref, ctile_ref = refs[:3]
    del refs[:3]
    tileid_ref = refs.pop(0) if remap else None
    entry_hbm = refs.pop(0)
    if use_zcap:
        zcap_ref, captid_ref = refs[:2]
        del refs[:2]
    else:
        zcap_ref = captid_ref = None
    (depth_out, tri_out, b1_out, b2_out, bs_out, chunk_vmem, sem) = refs
    j = pl.program_id(0)
    npx = tile_h * tile_w
    flat = jax.lax.broadcasted_iota(jnp.int32, (npx, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    colid = jax.lax.broadcasted_iota(jnp.int32, (1, TILES_PER_PROG), 1)

    blk0 = offsets_ref[j * TILES_PER_PROG] // CHUNK
    blk1 = offsets_ref[(j + 1) * TILES_PER_PROG] // CHUNK
    nblk = blk1 - blk0
    ngroups = (nblk + GROUP - 1) // GROUP

    def tile_coords(tile):
        tile_y = tile // ntx
        tile_x = tile % ntx
        pxg = (
            (flat % tile_w).astype(jnp.float32)
            + tile_x.astype(jnp.float32) * tile_w + 0.5
        )
        pyg = (
            (flat // tile_w).astype(jnp.float32)
            + tile_y.astype(jnp.float32) * tile_h + 0.5
        )
        return pxg, pyg

    def tile_update(planes, col, n_valid, pxg, pyg, blocks):
        """Depth-test `planes` (16, CHUNK) against one tile; merge the winner into
        column `col` of the (npx, TILES_PER_PROG) accumulators."""
        bz, bt, bb1, bb2, bbs = blocks

        def plane(kk):
            return (
                pxg * planes[kk : kk + 1]
                + pyg * planes[kk + 1 : kk + 2]
                + planes[kk + 2 : kk + 3]
            )

        lam0 = plane(0)
        lam1 = plane(3)
        lam2 = plane(6)
        z = plane(9)
        tid = planes[12:13]  # (1, CHUNK) float ids

        covered = (
            (lam0 >= 0.0) & (lam1 >= 0.0) & (lam2 >= 0.0)
            & (z >= 0.0) & (z <= 1.0) & (lane < n_valid)
        )
        if use_zcap:
            # depth-peel bound: only fragments strictly (z, id)-below the
            # previously killed winner are candidates (one-hot column pick
            # is a (npx, T) mul+reduce — cheap next to the 16 plane FMAs)
            sel = colid == col
            zc = jnp.sum(
                jnp.where(sel, zcap_ref[...], 0.0), axis=1, keepdims=True
            )
            tc = jnp.sum(
                jnp.where(sel, captid_ref[...], 0.0), axis=1, keepdims=True
            )
            covered &= (z < zc) | ((z == zc) & (tid < tc))
        zm = jnp.where(covered, z, -1.0)
        zb = jnp.max(zm, axis=1, keepdims=True)  # (npx, 1)
        winners = covered & (zm == zb)
        tidw = jnp.where(winners, tid, -1.0)
        tb = jnp.max(tidw, axis=1, keepdims=True)
        w2 = winners & (tidw == tb)
        l1b = jnp.max(
            jnp.where(w2, lam1, -jnp.float32(3.4e38)), axis=1, keepdims=True
        )
        l2b = jnp.max(
            jnp.where(w2, lam2, -jnp.float32(3.4e38)), axis=1, keepdims=True
        )
        lsb = jnp.max(
            jnp.where(w2, lam0 + lam1 + lam2, -jnp.float32(3.4e38)),
            axis=1, keepdims=True,
        )

        # reverse-Z >= merge: later chunks of the same tile keep improving
        better = (colid == col) & (zb > -0.5) & (tb >= 0.0) & (zb >= bz)
        return (
            jnp.where(better, zb, bz),
            jnp.where(better, tb, bt),
            jnp.where(better, l1b, bb1),
            jnp.where(better, l2b, bb2),
            jnp.where(better, lsb, bbs),
        )

    def get_dma(slot, g):
        # one DMA per GROUP of blocks (small per-block DMAs are latency-bound)
        return pltpu.make_async_copy(
            entry_hbm.at[pl.ds(blk0 + g * GROUP, GROUP)],
            chunk_vmem.at[slot],
            sem.at[slot],
        )

    @pl.when(ngroups > 0)
    def _():
        get_dma(0, 0).start()

    def group_body(g, blocks):
        slot = g % 2

        @pl.when(g + 1 < ngroups)
        def _():
            get_dma((g + 1) % 2, g + 1).start()

        get_dma(slot, g).wait()

        for gg in range(GROUP):
            k = g * GROUP + gg
            b = blk0 + k
            bc = jnp.minimum(b, blk1 - 1)  # clamp for scalar reads when OOB
            tile = ctile_ref[bc]
            col = tile - j * TILES_PER_PROG
            # remap: `tile` indexes a COMPACT tile list (entry ranges /
            # output columns); pixel coords come from the physical tile
            pxg, pyg = tile_coords(tileid_ref[tile] if remap else tile)
            n_valid = jnp.where(
                k < nblk, counts_ref[tile] + offsets_ref[tile] - bc * CHUNK, 0
            )
            blocks = tile_update(
                chunk_vmem[slot, gg], col, n_valid, pxg, pyg, blocks
            )
        return blocks

    blocks0 = (
        jnp.zeros((npx, TILES_PER_PROG), jnp.float32),
        jnp.full((npx, TILES_PER_PROG), -1.0, jnp.float32),
        jnp.zeros((npx, TILES_PER_PROG), jnp.float32),
        jnp.zeros((npx, TILES_PER_PROG), jnp.float32),
        jnp.ones((npx, TILES_PER_PROG), jnp.float32),
    )
    blocks = jax.lax.fori_loop(0, ngroups, group_body, blocks0)

    bz, bt, bb1, bb2, bbs = blocks
    depth_out[...] = bz
    tri_out[...] = bt.astype(jnp.int32)
    b1_out[...] = bb1
    b2_out[...] = bb2
    bs_out[...] = bbs


def untile_image(a, width: int, height: int, tile_h: int = TILE_H,
                 tile_w: int = TILE_W):
    """(npx, ntiles_pad) tile-major kernel output -> (H, W) image."""
    ntx, nty = _tile_counts(width, height, tile_h, tile_w)
    ntiles = ntx * nty
    ntiles_pad = a.shape[1]
    # single 4D transpose (a.T-then-reshape chains compile to slow copies)
    img = (
        a.reshape(tile_h, tile_w, ntiles_pad)[:, :, :ntiles]
        .reshape(tile_h, tile_w, nty, ntx)
        .transpose(2, 0, 3, 1)
        .reshape(nty * tile_h, ntx * tile_w)
    )
    return img[:height, :width]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "interpret",
                     "tiled"),
)
def rasterize_binned(
    bins: Bins,
    width: int,
    height: int,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    interpret: bool = False,
    z_cap=None,
    tid_cap=None,
    tiled: bool = False,
    tile_ids=None,
):
    """Run the tile kernel over `bins`.

    z_cap/tid_cap: optional (npx, ntiles_pad) per-pixel depth-peel bounds
    (see _raster_kernel).  tiled=True returns the raw tile-major
    (depth, tri, b1, b2, bs) arrays — the alpha-peel loop stays in tile
    space between rounds; default returns an untiled VisibilityBuffer.

    tile_ids: optional (L_pad,) int32 PHYSICAL screen tile per compact tile —
    `bins` then describes a compacted tile list of length L_pad (the
    alpha-peel live-tile subset), the kernel grid shrinks to L_pad columns,
    and tiled=True is required (the tile-major output is in compact order)."""
    ntx, nty = _tile_counts(width, height, tile_h, tile_w)
    ntiles = ntx * nty
    remap = tile_ids is not None
    if remap:
        assert tiled, "compact-tile rasterization returns tile-major blocks"
        ntiles_pad = tile_ids.shape[0]
        assert ntiles_pad % TILES_PER_PROG == 0
    else:
        ntiles_pad = (
            (ntiles + TILES_PER_PROG - 1) // TILES_PER_PROG
        ) * TILES_PER_PROG
    npx = tile_h * tile_w
    use_zcap = z_cap is not None

    col_spec = pl.BlockSpec(
        (npx, TILES_PER_PROG), lambda j, *_: (0, j),
        memory_space=pltpu.VMEM,
    )
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # entry_data stays in HBM
    inputs = [bins.entry_data]
    if use_zcap:
        in_specs += [col_spec, col_spec]
        inputs += [z_cap, tid_cap]
    scalars = [bins.offsets, bins.counts, bins.chunk_tile]
    if remap:
        scalars.append(tile_ids)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(ntiles_pad // TILES_PER_PROG,),
        in_specs=in_specs,
        # one column per tile, TILES_PER_PROG columns per program block
        out_specs=[col_spec] * 5,
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, _NFIELDS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _raster_kernel, tile_h=tile_h, tile_w=tile_w, ntx=ntx, ntiles=ntiles,
        use_zcap=use_zcap, remap=remap,
    )
    depth, tri_f, b1, b2, bs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npx, ntiles_pad), jnp.float32),
            jax.ShapeDtypeStruct((npx, ntiles_pad), jnp.int32),
            jax.ShapeDtypeStruct((npx, ntiles_pad), jnp.float32),
            jax.ShapeDtypeStruct((npx, ntiles_pad), jnp.float32),
            jax.ShapeDtypeStruct((npx, ntiles_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        *scalars,
        *inputs,
    )
    if tiled:
        return depth, tri_f, b1, b2, bs

    def untile(a):
        return untile_image(a, width, height, tile_h, tile_w)

    return VisibilityBuffer(
        tri_id=untile(tri_f),
        depth=untile(depth),
        bary=jnp.stack([untile(b1), untile(b2), untile(bs)], axis=-1),
    )


def _subset_setup(setup: TriangleSetup, idx, valid_count=None) -> TriangleSetup:
    """Gather the setup rows of a (static) triangle subset."""
    return TriangleSetup(
        planes=setup.planes[idx], sx=setup.sx[idx], sy=setup.sy[idx],
        bbox=setup.bbox[idx], w_any=setup.w_any[idx], front=setup.front[idx],
        valid=setup.valid[idx]
        & (jnp.arange(idx.shape[0]) < valid_count
           if valid_count is not None else True),
    )


def rasterize_alpha_peeled(
    scene,
    setup: TriangleSetup,
    width: int,
    height: int,
    tables,
    rounds: int = 4,
    interpret: bool = False,
    cull_backface: bool = True,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    unroll_rounds: bool = True,
    compact_tiles: bool = True,
    live_tile_cap: int | None = None,
    sub_block_cap: int | None = None,
):
    """Binned raster of the alpha-MASK triangle subset with per-fragment alpha
    kill (gbuf.frag:22-32 semantics) via DEPTH PEELING.

    The per-fragment texture kill can't run inside the tile kernel (no
    in-kernel atlas gathers), and the brute per-triangle scan costs
    O(A * H * W) atlas taps (~seconds for a 600-leaf scene at 1080p).
    Instead: rasterize the masked subset binned (cheap — only its own entry
    blocks do work), alpha-test each pixel's WINNING fragment through the
    fused tables (2 gather idx/px), and re-rasterize killed pixels with a
    per-pixel (z, id) depth-peel bound so the next-deepest fragment
    surfaces.  Pixels whose winner passes are final (nothing deeper can
    win), so each round only pays where the previous round's winner was
    killed; rounds after global convergence are skipped via lax.cond.

    `rounds` bounds the peel depth: a pixel with more than `rounds`
    consecutively-REJECTED masked fragments resolves as uncovered (the
    reference's any-depth discard would show the next fragment).  Leaf-quad
    foliage rarely stacks rejected fragments 4 deep; the brute path
    (config.raster='brute') remains the exact oracle and tests compare the
    two.  Returns an image-space VisibilityBuffer of accepted masked
    fragments (+ the subset binning overflow, merged by the caller into the
    frame's poison guard).

    compact_tiles: rounds 2+ touch only tiles whose previous winner was
    KILLED (foliage cutout edges — typically a few % of the screen), yet
    the full-width round re-rasters every subset entry block and
    alpha-tests the whole image.  With compaction, each later round
    gathers the live tiles (<= live_tile_cap) and their entry blocks
    (<= sub_block_cap) into a compacted tile list, rasters it with the
    remapped kernel (pixel coords from the physical tile, columns
    compact), alpha-tests only those columns, and scatters the updates
    back — all index vectors are tile/block-granular (~2k wide at 1080p),
    so the compaction itself is cheap (the packet-phased pattern,
    ops/traverse.py).  Exactness is unconditional: if either cap
    overflows, that round falls back to the full-width body via lax.cond.
    """
    from vulkanhybridrenderer_tpu.ops import shadetab
    from vulkanhybridrenderer_tpu.ops.rasterizer import weights_from_bary

    idx = scene.alpha_tri_idx  # (A,) global ids, static length
    sub = _subset_setup(setup, idx)
    a_count = int(idx.shape[0])
    bins = bin_triangles(
        sub, width, height, tile_h=tile_h, tile_w=tile_w,
        e_cap=max(8192, 8 * a_count), cull_backface=cull_backface,
        tri_ids=idx,
    )

    ntx, nty = _tile_counts(width, height, tile_h, tile_w)
    ntiles_pad = bins.counts.shape[0]
    npx = tile_h * tile_w
    big = jnp.float32(3.4e38)

    def alpha_pass(bt, bb1, bb2, bbs):
        """Per-pixel alpha test of the winning fragments (tile space)."""
        has = bt >= 0
        pm = shadetab.fetch_tri_static(tables, jnp.maximum(bt, 0))
        wts = weights_from_bary(jnp.stack([bb1, bb2, bbs], axis=-1))
        uv = shadetab.interpolate3(pm["uv0"], wts)
        alpha = shadetab.sample_atlas4(
            tables, pm["base_tex"], pm["base_scale"], pm["base_offset"], uv
        )[..., 3]
        needs = (pm["alpha_mask"] == 1.0) & (pm["base_tex"] >= 0)
        killed = has & needs & (alpha < pm["alpha_cutoff"])
        return has & ~killed, killed

    nblocks = bins.entry_data.shape[0]
    l_cap = live_tile_cap or min(
        ntiles_pad,
        max(TILES_PER_PROG,
            -(-(ntiles_pad // 8) // TILES_PER_PROG) * TILES_PER_PROG),
    )
    sb_cap = sub_block_cap or max(2 * GROUP, nblocks // 4)

    def round_body(state, first: bool):
        (zcap, captid, fz, ft, f1, f2, fs, live) = state

        def run(_):
            bz, bt, bb1, bb2, bbs = rasterize_binned(
                bins, width, height, tile_h=tile_h, tile_w=tile_w,
                interpret=interpret, z_cap=zcap, tid_cap=captid, tiled=True,
            )
            accept, killed = alpha_pass(bt, bb1, bb2, bbs)
            nz = jnp.where(killed, bz, -big)
            nt = jnp.where(killed, bt.astype(jnp.float32), -big)
            return (
                nz, nt,
                jnp.where(accept, bz, fz),
                jnp.where(accept, bt, ft),
                jnp.where(accept, bb1, f1),
                jnp.where(accept, bb2, f2),
                jnp.where(accept, bbs, fs),
                jnp.any(killed),
            )

        def run_live(_):
            if not compact_tiles or l_cap >= ntiles_pad:
                return run(None)
            # ---- live-tile compaction (cheap: every vector here is tile-
            # or block-granular) ------------------------------------------
            killed_map = zcap >= 0.0  # peel bounds are z in [0,1] or -big
            tl = jnp.any(killed_map, axis=0)  # (ntiles_pad,)
            n_live = jnp.sum(tl.astype(jnp.int32))
            (idx,) = jnp.nonzero(tl, size=l_cap, fill_value=ntiles_pad)
            ok = idx < ntiles_pad
            safe = jnp.minimum(idx, ntiles_pad - 1)
            off0 = bins.offsets[safe]
            acnt = jnp.where(ok, bins.offsets[safe + 1] - off0, 0)
            cnt = jnp.where(ok, bins.counts[safe], 0)
            nb = acnt // CHUNK
            cum_b = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(nb).astype(jnp.int32)]
            )  # (l_cap + 1,) compact block starts
            total_sb = cum_b[l_cap]
            ovf = (n_live > l_cap) | (total_sb > sb_cap)
            # sub-block -> owning compact tile (head-mark + cummax, the
            # bin_triangles enumeration trick at block granularity)
            s_iota = jnp.arange(sb_cap, dtype=jnp.int32)
            heads = jnp.zeros(sb_cap, jnp.int32).at[cum_b[:l_cap]].max(
                jnp.where(nb > 0, jnp.arange(l_cap, dtype=jnp.int32) + 1, 0),
                mode="drop",
            )
            owner = jnp.clip(jax.lax.cummax(heads) - 1, 0, l_cap - 1)
            srcb = (off0 // CHUNK)[owner] + (s_iota - cum_b[owner])
            # + GROUP slack blocks: the kernel's grouped DMA may read up to
            # GROUP blocks past the last live one (same slack the full
            # bins build puts in d_total); content is never used
            srcb = jnp.concatenate([srcb, jnp.zeros(GROUP, jnp.int32)])
            srcb = jnp.clip(srcb, 0, nblocks - 1)

            def run_compact(_):
                sub_bins = Bins(
                    entry_data=bins.entry_data[srcb],  # (sb_cap+GROUP, 16, CHUNK)
                    offsets=cum_b * CHUNK,
                    counts=cnt,
                    chunk_tile=owner,
                    overflow=bins.overflow,
                )
                tile_ids = jnp.where(ok, safe, 0).astype(jnp.int32)
                gat = lambda a: jnp.take(a, safe, axis=1)  # (npx, l_cap)
                bz, bt, bb1, bb2, bbs = rasterize_binned(
                    sub_bins, width, height, tile_h=tile_h, tile_w=tile_w,
                    interpret=interpret, z_cap=gat(zcap), tid_cap=gat(captid),
                    tiled=True, tile_ids=tile_ids,
                )
                accept, killed = alpha_pass(bt, bb1, bb2, bbs)

                def back(full, new_cols):
                    old = gat(full)
                    return full.at[:, idx].set(
                        jnp.where(accept, new_cols, old), mode="drop"
                    )

                # non-live tiles are final: their next-round peel bound is
                # -big (nothing killed), so start from a -big canvas
                nz = jnp.full_like(zcap, -big).at[:, idx].set(
                    jnp.where(killed, bz, -big), mode="drop"
                )
                nt = jnp.full_like(captid, -big).at[:, idx].set(
                    jnp.where(killed, bt.astype(jnp.float32), -big),
                    mode="drop",
                )
                return (
                    nz, nt,
                    back(fz, bz),
                    back(ft, bt),
                    back(f1, bb1),
                    back(f2, bb2),
                    back(fs, bbs),
                    jnp.any(killed),
                )

            return jax.lax.cond(ovf, run, run_compact, None)

        if first:
            return run(None)
        # skip converged rounds entirely (costs nothing when no pixel was
        # killed last round — the common case after round 1)
        return jax.lax.cond(
            live, run_live, lambda _: (
                jnp.full_like(zcap, -big), jnp.full_like(captid, -big),
                fz, ft, f1, f2, fs, jnp.bool_(False),
            ), None,
        )

    state = (
        jnp.full((npx, ntiles_pad), big), jnp.full((npx, ntiles_pad), big),
        jnp.zeros((npx, ntiles_pad), jnp.float32),
        jnp.full((npx, ntiles_pad), -1, jnp.int32),
        jnp.zeros((npx, ntiles_pad), jnp.float32),
        jnp.zeros((npx, ntiles_pad), jnp.float32),
        jnp.ones((npx, ntiles_pad), jnp.float32),
        jnp.bool_(True),
    )
    state = round_body(state, first=True)
    if rounds > 1:
        # unrolled rounds measured faster than a lax.scan body on the v5e
        # (rounds=4: 130.6 vs 163.2 ms live) at a modest compile-surface
        # cost; unroll_rounds=False keeps the scan for compile-bound uses
        if unroll_rounds:
            for _ in range(rounds - 1):
                state = round_body(state, first=False)
        else:
            state, _ = jax.lax.scan(
                lambda st, _: (round_body(st, first=False), None),
                state, None, length=rounds - 1,
            )
    _, _, fz, ft, f1, f2, fs, _ = state

    def untile(a):
        return untile_image(a, width, height, tile_h, tile_w)

    vis = VisibilityBuffer(
        tri_id=untile(ft),
        depth=untile(fz),
        bary=jnp.stack([untile(f1), untile(f2), untile(fs)], axis=-1),
    )
    return vis, bins.overflow


def _subset_brute(setup, idx, valid_count, width, height, chunk, frag_mask_fn=None,
                  remap=None):
    """Brute-rasterize a (small, static) triangle subset and remap ids to global."""
    from vulkanhybridrenderer_tpu.ops import rasterizer as _raster

    sub = TriangleSetup(
        planes=setup.planes[idx], sx=setup.sx[idx], sy=setup.sy[idx],
        bbox=setup.bbox[idx], w_any=setup.w_any[idx], front=setup.front[idx],
        valid=setup.valid[idx]
        & (jnp.arange(idx.shape[0]) < valid_count if valid_count is not None else True),
    )
    vis = _raster.rasterize(
        sub, width, height, chunk=min(chunk, max(1, idx.shape[0])),
        frag_mask_fn=frag_mask_fn,
    )
    return VisibilityBuffer(
        tri_id=jnp.where(vis.tri_id >= 0, idx[jnp.maximum(vis.tri_id, 0)], -1),
        depth=vis.depth,
        bary=vis.bary,
    )


def rasterize_scene(
    scene,
    clip,
    width: int,
    height: int,
    interpret: bool | None = None,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    alpha: bool = True,
    cull_backface: bool = True,
    tables=None,
    alpha_rounds: int = 4,
) -> VisibilityBuffer:
    """Full-scene visibility buffer via the binned Pallas kernel.

    Two streams, depth-merged:
      * opaque triangles (any screen span -- the compact binning enumerates
        exact per-tile entries) -> binning + the flat-stream tile kernel;
      * alpha-masked triangles -> brute with the per-fragment alpha kill
        (gbuf.frag:27-32 semantics; needs atlas taps).
    `alpha=False` renders masked geometry solid (the shadow-map depth prepass has
    an empty fragment shader, depth_prepass.frag).  `interpret=None` auto-selects
    Pallas interpreter mode off TPU so CPU tests exercise the same kernel.
    """
    import jax as _jax

    from vulkanhybridrenderer_tpu.ops import gbuffer as _gbuffer
    from vulkanhybridrenderer_tpu.ops import rasterizer as _raster

    if interpret is None:
        # Auto-select interpreter mode off TPU.  Respect an active
        # jax.default_device(...) override first: the multi-chip dryrun runs the
        # frame on a VIRTUAL CPU mesh while the session's default backend is still
        # the real TPU, and Mosaic can only lower for TPU.
        dev = getattr(_jax.config, "jax_default_device", None)
        platform = getattr(dev, "platform", None) or _jax.default_backend()
        interpret = platform != "tpu"

    setup = _raster.triangle_setup(clip, scene.tri_vertex, width, height)
    use_alpha = scene.has_alpha_mask and alpha
    tri_masked = (
        scene.materials.alpha_mask[scene.tri_prim] == 1 if use_alpha else None
    )

    # resolve the entry cap HERE (not inside bin_triangles' trace) so the jit
    # cache keys on the actual value — a changed default_e_cap takes effect
    bins = bin_triangles(
        setup, width, height, tile_h=tile_h, tile_w=tile_w,
        e_cap=default_e_cap(setup.sx.shape[0], width * height),
        exclude_mask=tri_masked, cull_backface=cull_backface,
    )
    vis = rasterize_binned(
        bins, width, height, tile_h=tile_h, tile_w=tile_w, interpret=interpret
    )
    # EVERY-frame on-device overflow guard (not just the first-frame host
    # check): if the camera/scene later pushes total tile entries over the
    # static e_cap, triangles were dropped and the frame is wrong — poison the
    # depth buffer with NaN so the fault is LOUD (bench.py's isfinite check
    # trips; Renderer.find_nonfinite_pass isolates it to this pass) instead of
    # silently rendering holes.  Costs one fused where/multiply.
    poison = jnp.where(bins.overflow[0] > 0, jnp.float32(jnp.nan),
                       jnp.float32(1.0))
    vis = VisibilityBuffer(
        tri_id=vis.tri_id, depth=vis.depth * poison, bary=vis.bary
    )

    if use_alpha:
        if tables is None:
            from vulkanhybridrenderer_tpu.ops import shadetab as _shadetab

            tables = _shadetab.build_shade_tables(scene)
        vis_m, overflow_m = rasterize_alpha_peeled(
            scene, setup, width, height, tables, rounds=alpha_rounds,
            interpret=interpret, cull_backface=cull_backface, tile_h=tile_h,
            tile_w=tile_w,
        )
        vis = merge_visibility(vis, vis_m)
        # poison AFTER the merge: a NaN depth inside merge_visibility's >=
        # compare would silently lose (NaN compares false), hiding the fault
        poison_m = jnp.where(overflow_m[0] > 0, jnp.float32(jnp.nan),
                             jnp.float32(1.0))
        vis = VisibilityBuffer(
            tri_id=vis.tri_id, depth=vis.depth * poison_m, bary=vis.bary
        )
    return vis


# Standard Vulkan sample positions (VkSpec "Multisampling", offsets from the
# pixel center in units of 1/16 pixel) — the grid the reference's
# max-sample-count MSAA attachments resolve over.
MSAA_PATTERNS = {
    1: ((0, 0),),
    2: ((4, 4), (-4, -4)),
    4: ((-2, -6), (6, -2), (-6, 2), (2, 6)),
    8: ((1, -3), (-1, 3), (5, 1), (-3, -5), (-5, 5), (-7, -1), (3, 7),
        (7, -7)),
}


def offset_bins(bins: Bins, dx: float, dy: float) -> Bins:
    """Shift every binned plane equation to evaluate at pixel-center + (dx, dy)
    instead of the center: lam(px+dx, py+dy) = A*px + B*py + (C + A*dx + B*dy),
    so only the C constants change — the tile kernel runs unmodified at any
    sample position, and the binning (bbox/tile assignment, which is
    conservative for any in-pixel sample) is shared across all samples."""
    e = bins.entry_data  # (nblocks, 16, CHUNK); rows: A=(0,3,6,9) B=(1,4,7,10) C=(2,5,8,11)
    a = e[:, (0, 3, 6, 9), :]
    b = e[:, (1, 4, 7, 10), :]
    e = e.at[:, (2, 5, 8, 11), :].add(a * dx + b * dy)
    return dataclasses.replace(bins, entry_data=e)


def _offset_setup(setup: TriangleSetup, dx: float, dy: float) -> TriangleSetup:
    """Same C-constant shift on a raw TriangleSetup (brute/alpha path)."""
    p = setup.planes
    shifted = p.at[:, (2, 5, 8, 11)].add(
        p[:, (0, 3, 6, 9)] * dx + p[:, (1, 4, 7, 10)] * dy
    )
    return dataclasses.replace(setup, planes=shifted)


def rasterize_scene_msaa(
    scene,
    clip,
    width: int,
    height: int,
    samples: int,
    interpret: bool | None = None,
    alpha: bool = True,
    cull_backface: bool = True,
    tables=None,
) -> list[VisibilityBuffer]:
    """Multisampled visibility: one VisibilityBuffer per sample position of the
    standard Vulkan pattern, at BASE resolution.  Triangle setup, binning, and
    the entry sort/scatter run ONCE; each sample reruns only the (cheap) tile
    kernel on C-shifted plane constants (offset_bins) — the TPU mapping of
    multisampled attachments (forward_raster_render_path.cpp:59), where the
    raster hardware likewise evaluates shared edge equations per sample."""
    import jax as _jax

    from vulkanhybridrenderer_tpu.ops import gbuffer as _gbuffer
    from vulkanhybridrenderer_tpu.ops import rasterizer as _raster

    if samples not in MSAA_PATTERNS:
        raise ValueError(f"msaa_samples must be one of {list(MSAA_PATTERNS)}")
    if interpret is None:
        dev = getattr(_jax.config, "jax_default_device", None)
        platform = getattr(dev, "platform", None) or _jax.default_backend()
        interpret = platform != "tpu"

    setup = _raster.triangle_setup(clip, scene.tri_vertex, width, height)
    use_alpha = scene.has_alpha_mask and alpha
    tri_masked = (
        scene.materials.alpha_mask[scene.tri_prim] == 1 if use_alpha else None
    )
    bins = bin_triangles(
        setup, width, height,
        e_cap=default_e_cap(setup.sx.shape[0], width * height),
        exclude_mask=tri_masked, cull_backface=cull_backface,
    )
    poison = jnp.where(bins.overflow[0] > 0, jnp.float32(jnp.nan),
                       jnp.float32(1.0))

    out = []
    for sx16, sy16 in MSAA_PATTERNS[samples]:
        dx, dy = sx16 / 16.0, sy16 / 16.0
        vis = rasterize_binned(
            offset_bins(bins, dx, dy), width, height, interpret=interpret
        )
        vis = VisibilityBuffer(
            tri_id=vis.tri_id, depth=vis.depth * poison, bary=vis.bary
        )
        if use_alpha:
            if tables is None:
                from vulkanhybridrenderer_tpu.ops import shadetab as _shadetab

                tables = _shadetab.build_shade_tables(scene)
            vis_m, overflow_m = rasterize_alpha_peeled(
                scene, _offset_setup(setup, dx, dy), width, height, tables,
                interpret=interpret, cull_backface=cull_backface,
            )
            vis = merge_visibility(vis, vis_m)
            poison_m = jnp.where(overflow_m[0] > 0, jnp.float32(jnp.nan),
                                 jnp.float32(1.0))
            vis = VisibilityBuffer(
                tri_id=vis.tri_id, depth=vis.depth * poison_m, bary=vis.bary
            )
        out.append(vis)
    return out


def merge_visibility(a: VisibilityBuffer, b: VisibilityBuffer) -> VisibilityBuffer:
    """Depth-merge two visibility buffers (reverse-Z GREATER_OR_EQUAL; b wins
    ties, matching later-draw-wins).  Used to composite the separately-rasterized
    alpha-masked geometry over the binned opaque pass."""
    b_cov = b.tri_id >= 0
    take_b = b_cov & (b.depth >= a.depth)
    return VisibilityBuffer(
        tri_id=jnp.where(take_b, b.tri_id, a.tri_id),
        depth=jnp.where(take_b, b.depth, a.depth),
        bary=jnp.where(take_b[..., None], b.bary, a.bary),
    )
