"""Production tiled rasterizer: sort-based triangle binning + a Pallas per-tile
depth-test kernel with an MXU (matmul) inner loop.

The brute-force reference rasterizer (ops/rasterizer.py) tests every triangle
against every pixel -- O(T * P) makes 1080p x 200k-triangle scenes impossible at
60 FPS.  This module implements the classic GPU binned approach, TPU-first:

  1. `bin_triangles` (pure jnp, fully vectorized): per-triangle screen bbox ->
     covered tile range; triangles spanning <= `expand_cap` tiles emit one entry per
     covered tile into a fixed (T * expand_cap) entry table (padding entries sort to
     a sentinel tile); triangles spanning more tiles go to a small "big" list that
     every tile tests (walls/floors).  A single stable argsort by tile id + a
     searchsorted + an aligned re-pack yields CHUNK-aligned per-tile entry ranges --
     no atomics (the GPU version's per-bin atomic counters don't exist on TPU;
     sorting is the idiomatic replacement).  Entries are stored as *plane
     equations*: barycentrics and depth are affine in screen space, so each
     triangle becomes 13 coefficients [lam0|lam1|lam2|z as A*px+B*py+C, tri_id].

  2. `rasterize_binned`: a Pallas kernel, grid = one program per pixel tile.
     Per-tile entry ranges arrive via PrefetchScalarGridSpec; chunks of CHUNK
     triangles are DMA'd from HBM with double buffering, and the depth-test inner
     loop is pure matrix math on the MXU: with P = (pixels, 3) homogeneous pixel
     coords and C = (3, CHUNK) plane coefficients,

         lam_k = P @ C_k   (pixels, CHUNK)  for k = 0,1,2;   z = P @ C_z

     coverage = all lam_k >= 0, then two lane reductions extract the max-depth
     winner (and its tri id / barycentrics) per pixel.  No per-triangle scalar
     reads -- the original scalar-broadcast formulation stalled ~1000 cycles per
     triangle on VMEM scalar loads; the matmul form does 128 triangles at once.

Alpha-masked geometry is *excluded* from the binned pass (its per-fragment texture
kill needs atlas gathers) and rasterized by the caller via the reference path over
the (few) masked triangles, then merged with `merge_visibility`.

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


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Bins:
    entry_data: Any  # (nblocks, 16, CHUNK) f32 plane rows, tile-sorted + aligned
    offsets: Any  # (ntiles_pad + 1,) int32 CHUNK-aligned entry start per tile
    counts: Any  # (ntiles_pad,) int32 actual entry count per tile
    chunk_tile: Any  # (nblocks,) int32 owning tile of each 128-entry block
    big_data: Any  # (16, CHUNK) f32 plane rows of the "big" triangles
    num_big: Any  # () int32


def _tile_counts(width: int, height: int, tile_h: int, tile_w: int):
    return math.ceil(width / tile_w), math.ceil(height / tile_h)


def _pack_planes(setup: TriangleSetup, tri_ids, valid=None):
    """Gather + convert triangles to plane-coefficient rows -> (16, K) f32.

    All gathers are flat 1-D (per column): XLA TPU lowers (T, 3)[ids] row gathers
    ~300x slower than 1-D gathers (measured 76 ms vs 9 x 0.3 ms at 2M entries)."""
    x0 = setup.sx[:, 0][tri_ids]
    x1 = setup.sx[:, 1][tri_ids]
    x2 = setup.sx[:, 2][tri_ids]
    y0 = setup.sy[:, 0][tri_ids]
    y1 = setup.sy[:, 1][tri_ids]
    y2 = setup.sy[:, 2][tri_ids]
    z = jnp.stack(
        [setup.z[:, 0][tri_ids], setup.z[:, 1][tri_ids], setup.z[:, 2][tri_ids]],
        axis=1,
    )
    area2 = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    inv_area = 1.0 / jnp.where(jnp.abs(area2) > 1e-12, area2, 1.0)

    def edge(xa, ya, xb, yb):
        # e(p) = (xb-xa)*(py-ya) - (yb-ya)*(px-xa), normalized by area
        a = -(yb - ya) * inv_area
        b = (xb - xa) * inv_area
        c = ((yb - ya) * xa - (xb - xa) * ya) * inv_area
        return a, b, c

    a0, b0, c0 = edge(x1, y1, x2, y2)  # lam0: edge opposite vertex 0
    a1, b1, c1 = edge(x2, y2, x0, y0)
    a2, b2, c2 = edge(x0, y0, x1, y1)
    za = a0 * z[:, 0] + a1 * z[:, 1] + a2 * z[:, 2]
    zb = b0 * z[:, 0] + b1 * z[:, 1] + b2 * z[:, 2]
    zc = c0 * z[:, 0] + c1 * z[:, 1] + c2 * z[:, 2]

    rows = [a0, b0, c0, a1, b1, c1, a2, b2, c2, za, zb, zc,
            tri_ids.astype(jnp.float32)]
    if valid is not None:
        # poison invalid/padding rows so they never produce coverage
        rows = [jnp.where(valid, r, jnp.float32(0.0)) for r in rows[:12]] + [rows[12]]
        rows[2] = jnp.where(valid, rows[2], -1.0)  # lam0 == -1 everywhere
    k = tri_ids.shape[0]
    pad = jnp.zeros((_NFIELDS - len(rows), k), jnp.float32)
    return jnp.concatenate([jnp.stack(rows), pad], axis=0)


def _blocks(packed):
    """(16, K) -> (K // CHUNK, 16, CHUNK) block-major layout for whole-block DMA."""
    nf, k = packed.shape
    nblocks = k // CHUNK
    return packed.reshape(nf, nblocks, CHUNK).transpose(1, 0, 2)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "expand_cap", "big_cap",
                     "cull_backface"),
)
def bin_triangles(
    setup: TriangleSetup,
    width: int,
    height: int,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    expand_cap: int = 16,
    big_cap: int = CHUNK,
    cull_backface: bool = True,
    exclude_mask=None,
) -> Bins:
    ntx, nty = _tile_counts(width, height, tile_h, tile_w)
    ntiles = ntx * nty
    t = setup.sx.shape[0]

    sx, sy = setup.sx, setup.sy
    x0, x1, x2 = sx[:, 0], sx[:, 1], sx[:, 2]
    y0, y1, y2 = sy[:, 0], sy[:, 1], sy[:, 2]
    area2 = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    alive = setup.valid
    if cull_backface:
        alive &= area2 < 0  # front face after baked y-flip (see ops/rasterizer.py)
    else:
        alive &= jnp.abs(area2) > 1e-12
    if exclude_mask is not None:
        alive &= ~exclude_mask

    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)
    alive &= (xmax > 0) & (xmin < width) & (ymax > 0) & (ymin < height)

    tx0 = jnp.clip(jnp.floor(xmin / tile_w).astype(jnp.int32), 0, ntx - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile_w).astype(jnp.int32), 0, ntx - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile_h).astype(jnp.int32), 0, nty - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile_h).astype(jnp.int32), 0, nty - 1)
    wspan = tx1 - tx0 + 1
    hspan = ty1 - ty0 + 1
    span = wspan * hspan
    small = alive & (span <= expand_cap)
    big = alive & (span > expand_cap)

    # ---- small-triangle entries: enumerate bbox tiles row-major ----------------
    k = jnp.arange(expand_cap, dtype=jnp.int32)[None, :]  # (1, E)
    ty = ty0[:, None] + k // wspan[:, None]
    tx = tx0[:, None] + k % wspan[:, None]
    valid_e = small[:, None] & (k < span[:, None])
    tile_id = jnp.where(valid_e, ty * ntx + tx, ntiles).astype(jnp.int32)
    tile_flat = tile_id.reshape(-1)
    tri_flat = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32)[:, None], (t, expand_cap)
    ).reshape(-1)

    order = jnp.argsort(tile_flat, stable=True)
    tile_sorted = tile_flat[order]
    tri_sorted = tri_flat[order]
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
    e_total = t * expand_cap
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
    d_total = (((e_total + CHUNK - 1) // CHUNK) + ntiles + GROUP) * CHUNK  # static (+GROUP: group-DMA slack)
    valid_entry = tile_sorted < ntiles
    rank = jnp.arange(e_total, dtype=jnp.int32) - offsets_raw[
        jnp.minimum(tile_sorted, ntiles - 1)
    ]
    dest = jnp.where(
        valid_entry,
        offsets[jnp.minimum(tile_sorted, ntiles - 1)] + rank,
        d_total,  # dumped into the trailing scratch slot
    )
    tri_dense = jnp.zeros(d_total + 1, jnp.int32).at[dest].set(tri_sorted)[:-1]
    dense_valid = jnp.zeros(d_total + 1, bool).at[dest].set(valid_entry)[:-1]
    entry_data = _blocks(_pack_planes(setup, tri_dense, valid=dense_valid))

    # ---- chunk -> tile ownership table (drives the flat stream loop) ------------
    nblocks = d_total // CHUNK
    block_starts = jnp.arange(nblocks, dtype=jnp.int32) * CHUNK
    chunk_tile = (
        jnp.searchsorted(offsets_pad, block_starts, side="right").astype(jnp.int32)
        - 1
    )
    chunk_tile = jnp.clip(chunk_tile, 0, ntiles_pad - 1)

    # ---- big list: one VMEM-resident plane block tested by every tile ----------
    (big_idx,) = jnp.nonzero(big, size=big_cap, fill_value=0)
    num_big = jnp.minimum(jnp.sum(big.astype(jnp.int32)), big_cap)
    big_ids = jnp.pad(big_idx.astype(jnp.int32), (0, CHUNK - big_cap))
    big_valid = jnp.arange(CHUNK) < num_big
    big_data = _pack_planes(setup, big_ids, valid=big_valid)

    return Bins(
        entry_data=entry_data,
        offsets=offsets_pad,
        counts=counts_pad,
        chunk_tile=chunk_tile,
        big_data=big_data,
        num_big=num_big,
    )


def _raster_kernel(
    # scalar prefetch
    offsets_ref,  # (ntiles_pad + 1,) SMEM (CHUNK-aligned starts)
    counts_ref,  # (ntiles_pad,) SMEM (true entry counts)
    ctile_ref,  # (nblocks,) SMEM (owning tile per block)
    nbig_ref,  # (1,) SMEM (number of valid big triangles)
    # inputs
    entry_hbm,  # (nblocks, 16, CHUNK) ANY/HBM
    big_ref,  # (16, CHUNK) VMEM: plane rows of the <=128 "big" triangles
    # outputs ((npx, TILES_PER_PROG) block: one column per tile of this program)
    depth_out,
    tri_out,
    b1_out,
    b2_out,
    # scratch
    chunk_vmem,  # (2, GROUP, 16, CHUNK) DMA landing buffers
    sem,  # DMA semaphores (2,)
    *,
    tile_h: int,
    tile_w: int,
    ntx: int,
    ntiles: int,
):
    """Flat-stream formulation: one fori_loop over this program's entry BLOCKS
    (not per-tile loops -- per-tile setup cost dominated the previous design).
    Each block knows its owning tile via ctile_ref; per block: DMA wait/start,
    (npx, CHUNK) broadcast-FMA coverage/depth, winner reduction, and a masked merge
    into the owning tile's output column.  "Big" triangles (screen span beyond the
    binning cap -- walls/floors, <= CHUNK of them) live in one VMEM-resident block
    tested once per tile after the stream.  Pixels on sublanes, triangles on lanes:
    zero relayouts."""
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
        bz, bt, bb1, bb2 = blocks

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

        # reverse-Z >= merge: later chunks of the same tile keep improving
        better = (colid == col) & (zb > -0.5) & (tb >= 0.0) & (zb >= bz)
        return (
            jnp.where(better, zb, bz),
            jnp.where(better, tb, bt),
            jnp.where(better, l1b, bb1),
            jnp.where(better, l2b, bb2),
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
            pxg, pyg = tile_coords(tile)
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
    )
    blocks = jax.lax.fori_loop(0, ngroups, group_body, blocks0)

    # ---- big triangles: one VMEM block tested against every live tile ----------
    nbig = nbig_ref[0]
    big_planes = big_ref[...]

    def big_body(s, blocks):
        tile = j * TILES_PER_PROG + s
        pxg, pyg = tile_coords(tile)
        n_valid = jnp.where(tile < ntiles, nbig, 0)
        return tile_update(big_planes, s, n_valid, pxg, pyg, blocks)

    blocks = jax.lax.cond(
        nbig > 0,
        lambda blocks: jax.lax.fori_loop(0, TILES_PER_PROG, big_body, blocks),
        lambda blocks: blocks,
        blocks,
    )

    bz, bt, bb1, bb2 = blocks
    depth_out[...] = bz
    tri_out[...] = bt.astype(jnp.int32)
    b1_out[...] = bb1
    b2_out[...] = bb2


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "interpret"),
)
def rasterize_binned(
    bins: Bins,
    width: int,
    height: int,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    interpret: bool = False,
) -> VisibilityBuffer:
    ntx, nty = _tile_counts(width, height, tile_h, tile_w)
    ntiles = ntx * nty
    ntiles_pad = (
        (ntiles + TILES_PER_PROG - 1) // TILES_PER_PROG
    ) * TILES_PER_PROG
    npx = tile_h * tile_w

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ntiles_pad // TILES_PER_PROG,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # entry_data stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # big plane block resident
        ],
        # one column per tile, TILES_PER_PROG columns per program block; untiled
        # to (H, W) below in XLA.
        out_specs=[
            pl.BlockSpec(
                (npx, TILES_PER_PROG), lambda j, *_: (0, j),
                memory_space=pltpu.VMEM,
            )
        ]
        * 4,
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, _NFIELDS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _raster_kernel, tile_h=tile_h, tile_w=tile_w, ntx=ntx, ntiles=ntiles
    )
    depth, tri_f, b1, b2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npx, ntiles_pad), jnp.float32),
            jax.ShapeDtypeStruct((npx, ntiles_pad), jnp.int32),
            jax.ShapeDtypeStruct((npx, ntiles_pad), jnp.float32),
            jax.ShapeDtypeStruct((npx, ntiles_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        bins.offsets,
        bins.counts,
        bins.chunk_tile,
        jnp.reshape(bins.num_big, (1,)),
        bins.entry_data,
        bins.big_data,
    )

    def untile(a):
        # single 4D transpose (a.T-then-reshape chains compile to slow copies)
        img = (
            a.reshape(tile_h, tile_w, ntiles_pad)[:, :, :ntiles]
            .reshape(tile_h, tile_w, nty, ntx)
            .transpose(2, 0, 3, 1)
            .reshape(nty * tile_h, ntx * tile_w)
        )
        return img[:height, :width]

    return VisibilityBuffer(
        tri_id=untile(tri_f),
        depth=untile(depth),
        bary=jnp.stack([untile(b1), untile(b2)], axis=-1),
    )


def _subset_brute(setup, idx, valid_count, width, height, chunk, frag_mask_fn=None,
                  remap=None):
    """Brute-rasterize a (small, static) triangle subset and remap ids to global."""
    from vulkanhybridrenderer_tpu.ops import rasterizer as _raster

    sub = TriangleSetup(
        sx=setup.sx[idx], sy=setup.sy[idx], z=setup.z[idx],
        inv_w=setup.inv_w[idx],
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
) -> VisibilityBuffer:
    """Full-scene visibility buffer via the binned Pallas kernel.

    Three streams, depth-merged:
      * small/medium opaque triangles -> binning + the flat-stream tile kernel;
      * "big" triangles (screen span > expand_cap tiles: near walls/floors, a
        handful) -> the brute full-screen rasterizer (cheap for few triangles,
        and they'd otherwise bloat every tile's entry list);
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

    bins = bin_triangles(
        setup, width, height, tile_h=tile_h, tile_w=tile_w,
        exclude_mask=tri_masked,
    )
    vis = rasterize_binned(
        bins, width, height, tile_h=tile_h, tile_w=tile_w, interpret=interpret
    )

    if use_alpha:
        idx = scene.alpha_tri_idx
        base_mask = _gbuffer.make_alpha_frag_mask(scene, clip)

        def local_mask(tri_local, lam, w_inv):
            return base_mask(idx[tri_local], lam, w_inv)

        # small chunk: the per-fragment alpha taps materialize (chunk, H, W, 4)
        # intermediates, so keep the scan step tiny at high resolutions
        alpha_chunk = 2 if width * height > 512 * 512 else 8
        vis_m = _subset_brute(
            setup, idx, None, width, height, chunk=alpha_chunk,
            frag_mask_fn=local_mask,
        )
        vis = merge_visibility(vis, vis_m)
    return vis


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
