"""Stage-level attribution of the G-Buffer pass on the TPU.

ATTR_full_s1.json: G-Buffer Pass = 129.5 ms, but the standalone pieces only
account for binning 31 + Pallas raster ~10 + resolve ~40 = ~81 ms.  This
script times (a) the pass stages jitted separately and (b) cumulative
prefixes of bin_triangles, so differences attribute enumeration / sort /
scatter+plane-pack individually.

HISTORICAL SNAPSHOT: the prefix() stages mirror the ROUND-3 binning (the
per-entry cum/wspan/ty0/tx0 gather enumeration) — the measurement that
motivated the packed-gather rewrite now shipped in bin_triangles.  Rerunning
attributes the old algorithm, not the current one; the stage-level (a)
timings remain valid.

Run: python scripts/attr_gbuffer.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def timeit(fn, iters=5):
    sync(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
    return best


def main():
    from vulkanhybridrenderer_tpu.core.config import (
        HybridSettings, RenderConfig, ShadowMode,
    )
    from vulkanhybridrenderer_tpu.ops import geometry, gbuffer, rasterizer
    from vulkanhybridrenderer_tpu.ops import rasterizer_tiled as rt
    from vulkanhybridrenderer_tpu.ops.shadetab import (
        build_shade_tables, make_tri_rows,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural

    import os
    h = int(os.environ.get("H", 1080)); w = int(os.environ.get("W", 1920))
    cfg = RenderConfig(width=w, height=h, alpha_raster="off",
                       hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED))
    r = Renderer(procedural.sponza_proxy(), cfg, path="hybrid")
    pfd = r._make_pfd()
    scene = r.scene.buffers
    tables = build_shade_tables(scene)

    @jax.jit
    def geo():
        world = geometry.to_world(scene, None)
        viewproj = pfd.camera_proj @ pfd.camera_view
        clip = geometry.to_clip(world.position, viewproj)
        return world.position, clip

    world_pos, clip = geo()
    sync(clip)
    tri_rows = make_tri_rows(tables, scene, world_pos, clip)
    sync(tri_rows)

    @jax.jit
    def setup_fn():
        return rasterizer.triangle_setup(clip, scene.tri_vertex, w, h)

    setup = setup_fn()
    sync(setup.planes)

    # ---- cumulative prefixes of bin_triangles ---------------------------------
    t = setup.sx.shape[0]
    e_cap = rt.default_e_cap(t, w * h)

    def prefix(stage):
        @jax.jit
        def f():
            import math as _m
            ntx, nty = rt._tile_counts(w, h, rt.TILE_H, rt.TILE_W)
            ntiles = ntx * nty
            alive = setup.valid & setup.w_any & setup.front
            xmin, ymin = setup.bbox[:, 0], setup.bbox[:, 1]
            xmax, ymax = setup.bbox[:, 2], setup.bbox[:, 3]
            alive &= (xmax > 0) & (xmin < w) & (ymax > 0) & (ymin < h)
            tx0 = jnp.clip(jnp.floor(xmin / rt.TILE_W).astype(jnp.int32), 0, ntx - 1)
            tx1 = jnp.clip(jnp.floor(xmax / rt.TILE_W).astype(jnp.int32), 0, ntx - 1)
            ty0 = jnp.clip(jnp.floor(ymin / rt.TILE_H).astype(jnp.int32), 0, nty - 1)
            ty1 = jnp.clip(jnp.floor(ymax / rt.TILE_H).astype(jnp.int32), 0, nty - 1)
            wspan = tx1 - tx0 + 1
            span = jnp.where(alive, wspan * (ty1 - ty0 + 1), 0)
            cum = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(span).astype(jnp.int32)]
            )
            total = cum[t]
            heads = (
                jnp.zeros(e_cap, jnp.int32)
                .at[cum[:t]]
                .max(jnp.where(span > 0, jnp.arange(t, dtype=jnp.int32) + 1, 0),
                     mode="drop")
            )
            tri_of = jnp.clip(jax.lax.cummax(heads) - 1, 0, t - 1)
            e_iota = jnp.arange(e_cap, dtype=jnp.int32)
            k = e_iota - cum[tri_of]
            ws = jnp.maximum(wspan[tri_of], 1)
            tile = (ty0[tri_of] + k // ws) * ntx + (tx0[tri_of] + k % ws)
            valid_e = e_iota < jnp.minimum(total, e_cap)
            tile = jnp.where(valid_e, tile, ntiles).astype(jnp.int32)
            if stage == "enum":
                return tile[:8], tri_of[:8]
            tile_sorted, tri_sorted = jax.lax.sort(
                (tile, tri_of), dimension=0, is_stable=True, num_keys=1
            )
            if stage == "sort":
                return tile_sorted[:8], tri_sorted[:8]
            offsets_raw = jnp.searchsorted(
                tile_sorted, jnp.arange(ntiles + 1, dtype=jnp.int32),
                side="left",
            ).astype(jnp.int32)
            counts = offsets_raw[1:] - offsets_raw[:-1]
            aligned = ((counts + rt.CHUNK - 1) // rt.CHUNK) * rt.CHUNK
            offsets = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned).astype(jnp.int32)]
            )
            d_total = (((e_cap + rt.CHUNK - 1) // rt.CHUNK) + ntiles + rt.GROUP) * rt.CHUNK
            valid_entry = tile_sorted < ntiles
            rank = e_iota - offsets_raw[jnp.minimum(tile_sorted, ntiles - 1)]
            dest = jnp.where(
                valid_entry,
                offsets[jnp.minimum(tile_sorted, ntiles - 1)] + rank,
                d_total,
            )
            tri_plus = (
                jnp.zeros(d_total + 1, jnp.int32)
                .at[dest]
                .set(jnp.where(valid_entry, tri_sorted + 1, 0))[:-1]
            )
            if stage == "scatter":
                return tri_plus[:8]
            plane_tab = rt._plane_table(setup)
            safe_dense = jnp.where(tri_plus > 0, tri_plus - 1, t)
            packed = plane_tab[safe_dense]
            entry_data = packed.reshape(
                d_total // rt.CHUNK, rt.CHUNK, rt._NFIELDS
            ).transpose(0, 2, 1)
            return entry_data[:1, :1, :8]
        return f

    results = {}
    for st in ("enum", "sort", "scatter", "pack"):
        results[st] = timeit(prefix(st))
        print(f"bin prefix {st:<8} {results[st]:8.2f} ms", flush=True)
    print(
        f"  => enum {results['enum']:.1f}, sort +{results['sort']-results['enum']:.1f},"
        f" scatter +{results['scatter']-results['sort']:.1f},"
        f" plane-pack +{results['pack']-results['scatter']:.1f}"
    )

    bin_fn = jax.jit(lambda: rt.bin_triangles(setup, w, h))
    bins = bin_fn()
    sync(bins.offsets)
    ms_bin = timeit(bin_fn)
    print(f"bin_triangles (whole)        {ms_bin:8.2f} ms", flush=True)

    raster_fn = jax.jit(lambda: rt.rasterize_binned(bins, w, h))
    vis = raster_fn()
    sync(vis.depth)
    ms_raster = timeit(raster_fn)
    print(f"rasterize_binned (kernel+untile) {ms_raster:8.2f} ms", flush=True)

    resolve_fn = jax.jit(
        lambda: gbuffer.resolve_gbuffer(scene, tables, tri_rows, vis, pfd)
    )
    gb = resolve_fn()
    sync(gb.depth)
    ms_resolve = timeit(resolve_fn)
    print(f"resolve_gbuffer              {ms_resolve:8.2f} ms", flush=True)

    full_fn = jax.jit(
        lambda: gbuffer.resolve_gbuffer(
            scene, tables, tri_rows,
            rt.rasterize_binned(rt.bin_triangles(setup, w, h), w, h), pfd
        )
    )
    sync(full_fn().depth)
    ms_full = timeit(full_fn)
    print(f"FULL bin+raster+resolve fused {ms_full:8.2f} ms "
          f"(sum of parts {ms_bin + ms_raster + ms_resolve:.1f})", flush=True)

    ms_setup = timeit(setup_fn)
    ms_geo = timeit(geo)
    print(f"triangle_setup {ms_setup:.2f} ms; geometry(world+clip) {ms_geo:.2f} ms")


if __name__ == "__main__":
    main()
