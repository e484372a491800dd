"""CPU simulator: BVH8 packet-union walk lengths U(K) for the real AO
wavefront (dumped by dump_ao_rays.py).  Decides whether a sub-packet
traversal kernel (8 packets of 16 rays sharing one 128-lane row) can beat
the blocked per-ray strips (511 ms) before building it.

Cost model (docs/PERF_STATUS.md + shadow-packet calibration):
  - one 128-lane packet step (8 slab + 8 MT + stack logic) ~ 137 ns
  - one (N,128) row gather from a VMEM-resident table ~ 3 ns/index
  - per-ray path: ~3 ns gather + ~1.1 ns VPU per ray-step
For a sub-packet kernel with S packets of K rays per 128-lane row
(S*K = 128), a super-row pays MAX over its S sub-packets' walks and S row
gathers per step:
  pred = n_super_rows * U_max * (137 + S*3) ns

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/sim_packet_union.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

TMIN = 0.01


def packet_steps(rows, root, o, d, tmax):
    """Union-walk step count for ONE packet (anyhit semantics, slot order
    irrelevant to the union count).  o,d: (K,3); tmax: (K,)."""
    k = o.shape[0]
    safe = np.where(np.abs(d) < 1e-12, np.where(d >= 0, 1e-12, -1e-12), d)
    inv = 1.0 / safe
    active = tmax >= TMIN
    steps = 0
    stack = [root]
    while stack and active.any():
        node = stack.pop()
        row = rows[node]
        steps += 1
        if row[127] > 0.5:  # leaf: 8 triangles (slot-major groups of 8)
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
                       & (t >= TMIN) & (t < tmax) & active)
                active &= ~hit
            if not active.any():
                break
        else:
            base = int(row[48])
            offmap = int(row[49])
            for s in range(8):
                lo = row[[0 + s, 8 + s, 16 + s]]
                hi = row[[24 + s, 32 + s, 40 + s]]
                if lo[0] > hi[0]:
                    continue  # empty slot
                t0 = (lo - o) * inv
                t1 = (hi - o) * inv
                tn = np.minimum(t0, t1).max(-1)
                tf = np.maximum(t0, t1).min(-1)
                hit = (np.maximum(tn, TMIN) <= np.minimum(tf, tmax)) & active
                if hit.any():
                    stack.append(base + ((offmap >> (3 * s)) & 7))
    return steps


def main():
    from vulkanhybridrenderer_tpu import native_bridge
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops
    from vulkanhybridrenderer_tpu.ops import geometry
    from vulkanhybridrenderer_tpu.scene import procedural

    data = np.load("/tmp/ao_rays.npz")
    h, w = int(data["h"]), int(data["w"])
    origin = data["origin"].reshape(h, w, 3)
    dirs = [data["dir0"].reshape(h, w, 3), data["dir1"].reshape(h, w, 3)]
    tmax = data["tmax"].reshape(h, w)

    scene = procedural.sponza_proxy()
    sc = scene.buffers
    world = geometry.to_world(sc)
    tris = bvh_ops.world_triangles(world.position, sc.tri_vertex)
    binary = native_bridge.build_sah_host(np.asarray(tris))
    b8 = bvh8_ops.build_bvh8_host(binary, tris)
    rows = np.asarray(b8.rows)
    print(f"sponza BVH8: {rows.shape[0]} rows, depth {b8.depth}")

    rng = np.random.default_rng(7)
    n_tiles = 400  # 8x16 super-tiles sampled over the frame
    ys = rng.integers(0, h // 8, n_tiles) * 8
    xs = rng.integers(0, w // 16, n_tiles) * 16

    # layouts: K rays/packet from a (th, tw) pixel tile, per draw
    layouts = {1: (1, 1), 8: (2, 4), 16: (4, 4), 32: (4, 8),
               64: (8, 8), 128: (8, 16)}
    total_rays = 2 * h * w
    for k, (th, tw) in layouts.items():
        per_tile = []  # steps of each sub-packet within each super tile
        for y0, x0 in zip(ys, xs):
            subs = []
            for draw in range(2):
                d = dirs[draw]
                for sy in range(0, 8, th):
                    for sx in range(0, 16, tw):
                        oy, ox = y0 + sy, x0 + sx
                        o = origin[oy:oy + th, ox:ox + tw].reshape(-1, 3)
                        dd = d[oy:oy + th, ox:ox + tw].reshape(-1, 3)
                        tt = tmax[oy:oy + th, ox:ox + tw].reshape(-1)
                        subs.append(packet_steps(rows, 0, o, dd, tt))
            per_tile.append(subs)
        a = np.array(per_tile, np.float64)  # (tiles, subpackets)
        u_mean = a.mean()
        # lockstep super-row: S = 128//k packets advance together, pay max
        s_sub = 128 // k
        if s_sub > 1:
            grp = a.reshape(n_tiles, -1, s_sub)  # adjacent sub-packets share a row
            u_max = grp.max(-1).mean()
        else:
            u_max = u_mean
        n_rows = total_rays // 128
        pred_ms = n_rows * u_max * (137 + s_sub * 3) * 1e-9 * 1e3
        print(f"K={k:<4} tile {th}x{tw}: U mean {u_mean:7.1f}  "
              f"lockstep-max {u_max:7.1f}  steps/ray {u_mean / k:6.2f}  "
              f"pred {pred_ms:7.0f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
