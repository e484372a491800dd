"""CPU simulator: BVH8 packet-union walk lengths U(K) for the real 1080p
SponzaProxy wavefronts (dumped by dump_ao_rays_cpu.py / dump_ao_rays.py):
AO (anyhit, tmax 5), shadow (anyhit, tmax 1e4), reflection (closest).
Decides whether a (K-sublane, M-lane) sub-packet traversal kernel can beat
the current schedules before building it.

Cost model (calibrated: K=1 pred[p99.9] 540 ms vs measured 511 ms):
  - VPU ~1.07 ns per ray-step (8 slab + 8 MT + stack logic, lane-dense)
  - row gather ~3 ns per index (VMEM-resident table)
  - blocked strips pay ~p99.9 of packet walks; ideal compaction pays ~mean

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/sim_packet_union.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

TMIN = 0.01


def packet_steps(rows, root, o, d, tmax, anyhit=True):
    """Union-walk step count for ONE packet with near-first child ordering.
    o,d: (K,3); tmax: (K,).  anyhit retires rays on first hit; closest
    shortens t_best."""
    safe = np.where(np.abs(d) < 1e-12, np.where(d >= 0, 1e-12, -1e-12), d)
    inv = 1.0 / safe
    t_best = tmax.astype(np.float32).copy()
    active = tmax >= TMIN
    steps = 0
    stack = [root]
    while stack and active.any():
        node = stack.pop()
        row = rows[node]
        steps += 1
        if row[127] > 0.5:  # leaf
            for s in range(8):
                if row[72 + s] < 0:
                    continue
                v0 = row[[0 + s, 8 + s, 16 + s]]
                v1 = row[[24 + s, 32 + s, 40 + s]]
                v2 = row[[48 + s, 56 + s, 64 + s]]
                e1, e2 = v1 - v0, v2 - v0
                p = np.cross(d, e2)
                det = (e1 * p).sum(-1)
                okd = np.abs(det) > 1e-9
                invdet = 1.0 / np.where(okd, det, 1.0)
                tv = o - v0
                u = (tv * p).sum(-1) * invdet
                q = np.cross(tv, e1)
                v = (d * q).sum(-1) * invdet
                t = (e2 * q).sum(-1) * invdet
                hit = (okd & (u >= 0) & (v >= 0) & (u + v <= 1)
                       & (t >= TMIN) & (t < t_best) & active)
                if anyhit:
                    active &= ~hit
                else:
                    t_best = np.where(hit, t, t_best)
            if anyhit and not active.any():
                break
        else:
            base = int(row[48])
            offmap = int(row[49])
            kids = []
            for s in range(8):
                lo = row[[0 + s, 8 + s, 16 + s]]
                hi = row[[24 + s, 32 + s, 40 + s]]
                if lo[0] > hi[0]:
                    continue  # empty slot
                t0 = (lo - o) * inv
                t1 = (hi - o) * inv
                tn = np.minimum(t0, t1).max(-1)
                tf = np.maximum(t0, t1).min(-1)
                hit = (np.maximum(tn, TMIN) <= np.minimum(tf, t_best)) & active
                if hit.any():
                    kids.append((float(tn[hit].min()),
                                 base + ((offmap >> (3 * s)) & 7)))
            # near child LAST pushed -> popped first
            for _, c in sorted(kids, key=lambda x: -x[0]):
                stack.append(c)
    return steps


def sweep(name, rows, origin, dir_draws, tmax, anyhit, h, w, n_tiles=300):
    rng = np.random.default_rng(7)
    ys = rng.integers(0, h // 8, n_tiles) * 8
    xs = rng.integers(0, w // 16, n_tiles) * 16
    origin = origin.reshape(h, w, 3)
    dir_draws = [dd.reshape(h, w, 3) for dd in dir_draws]
    tmax = tmax.reshape(h, w)
    total_rays = len(dir_draws) * h * w
    layouts = {1: (1, 1), 4: (2, 2), 8: (2, 4), 16: (4, 4), 32: (4, 8),
               128: (8, 16)}
    print(f"== {name} ({'anyhit' if anyhit else 'closest'}, "
          f"{total_rays / 1e6:.1f}M rays) ==")
    for k, (th, tw) in layouts.items():
        walks = []
        for y0, x0 in zip(ys, xs):
            for dgrid in dir_draws:
                for sy in range(0, 8, th):
                    for sx in range(0, 16, tw):
                        oy, ox = y0 + sy, x0 + sx
                        o = origin[oy:oy + th, ox:ox + tw].reshape(-1, 3)
                        dd = dgrid[oy:oy + th, ox:ox + tw].reshape(-1, 3)
                        tt = tmax[oy:oy + th, ox:ox + tw].reshape(-1)
                        walks.append(packet_steps(rows, 0, o, dd, tt, anyhit))
        a = np.array(walks, np.float64)
        u_mean = a.mean()
        q = {p: np.percentile(a, p) for p in (50, 90, 99, 99.9)}
        m = total_rays / k
        pred = lambda u: (total_rays * 1.07 + m * 3.0) * u * 1e-6  # ms
        print(f"K={k:<4} tile {th}x{tw}: U mean {u_mean:7.1f}  p50 {q[50]:6.0f}"
              f"  p90 {q[90]:6.0f}  p99 {q[99]:6.0f}  p99.9 {q[99.9]:7.0f}"
              f"  max {a.max():7.0f}  pred[mean] {pred(u_mean):6.0f} ms"
              f"  pred[p99.9] {pred(q[99.9]):6.0f} ms")
        sys.stdout.flush()


def main():
    from vulkanhybridrenderer_tpu import native_bridge
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops
    from vulkanhybridrenderer_tpu.ops import geometry
    from vulkanhybridrenderer_tpu.scene import procedural

    import os

    data = np.load(os.environ.get("OUT", "/tmp/ao_rays.npz"))
    h, w = int(data["h"]), int(data["w"])

    scene_name = os.environ.get("SCENE", "sponza")
    scene = (procedural.bistro_proxy() if scene_name == "bistro"
             else procedural.sponza_proxy())
    sc = scene.buffers
    world = geometry.to_world(sc)
    tris = bvh_ops.world_triangles(world.position, sc.tri_vertex)
    binary = native_bridge.build_sah_host(np.asarray(tris))
    b8 = bvh8_ops.build_bvh8_host(binary, tris)
    rows = np.asarray(b8.rows)
    print(f"{scene_name} BVH8: {rows.shape[0]} rows, depth {b8.depth}")

    which = sys.argv[1:] or ["ao", "shadow", "refl"]
    if "ao" in which:
        sweep("AO", rows, data["origin"], [data["dir0"], data["dir1"]],
              data["tmax"], True, h, w)
    if "shadow" in which and "shadow_dir" in data:
        sweep("shadow", rows, data["origin"], [data["shadow_dir"]],
              data["shadow_tmax"], True, h, w)
    if "refl" in which and "refl_dir" in data:
        sweep("reflection", rows, data["origin"], [data["refl_dir"]],
              data["shadow_tmax"], False, h, w)


if __name__ == "__main__":
    main()
