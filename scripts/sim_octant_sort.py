"""Does direction-sorted AO packet packing beat pixel-tile packing?

The production AO schedule packs K=4 rays from a 2x2 PIXEL tile into one
sub-packet (U(4) = 25.5 vs per-ray U(1) = 12.0 on SponzaProxy).  VERDICT r3
item 3 asks whether sorting rays by direction inside a screen block (paying a
segmented argsort + 2 permutation gathers at ray width, ~15-40 ms at 1080p)
tightens the unions enough to win.

This sim replays union walks (sim_packet_union.packet_steps, calibrated cost
model) over the REAL dumped wavefront (/tmp/ao_rays.npz) with several
packings:
  - base KxK pixel tiles (production): both draws separately
  - octant-sorted within an SxS pixel block (both draws pooled): key = 3-bit
    sign octant, secondary = dominant-axis quantized direction
  - origin-locality-preserving variant: sort within 8x8 px, key = octant only

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
       python scripts/sim_octant_sort.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

from sim_packet_union import packet_steps


def dir_key(d, bits=2):
    """Sort key: 3-bit sign octant, then quantized |direction| per axis."""
    octant = ((d[:, 0] < 0) << 2) | ((d[:, 1] < 0) << 1) | (d[:, 2] < 0)
    q = np.clip((np.abs(d) * (1 << bits)).astype(np.int64), 0, (1 << bits) - 1)
    return (octant.astype(np.int64) << (3 * bits)) | (q[:, 0] << (2 * bits)) \
        | (q[:, 1] << bits) | q[:, 2]


def stats(walks, total_rays, k, label):
    a = np.array(walks, np.float64)
    m = total_rays / k
    pred = lambda u: (total_rays * 1.07 + m * 3.0) * u * 1e-6
    q = {p: np.percentile(a, p) for p in (50, 99, 99.9)}
    print(f"{label:<36} U mean {a.mean():6.1f}  p50 {q[50]:5.0f}  "
          f"p99 {q[99]:5.0f}  p99.9 {q[99.9]:6.0f}  "
          f"pred[mean] {pred(a.mean()):6.0f} ms  "
          f"pred[p99.9] {pred(q[99.9]):6.0f} ms")
    sys.stdout.flush()


def main():
    from vulkanhybridrenderer_tpu import native_bridge
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops
    from vulkanhybridrenderer_tpu.ops import geometry
    from vulkanhybridrenderer_tpu.scene import procedural

    data = np.load(os.environ.get("OUT", "/tmp/ao_rays.npz"))
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
    print(f"sponza BVH8: {rows.shape[0]} rows; wavefront {2 * h * w / 1e6:.1f}M rays")

    rng = np.random.default_rng(11)
    n_blocks = int(os.environ.get("BLOCKS", 80))
    S = 16  # sort scope: SxS pixels x 2 draws = 512 rays
    ys = rng.integers(0, h // S, n_blocks) * S
    xs = rng.integers(0, w // S, n_blocks) * S
    total = 2 * h * w

    for k, (th, tw) in [(4, (2, 2)), (8, (2, 4))]:
        # --- baseline: pixel-tile packing, draws separate ---
        walks = []
        for y0, x0 in zip(ys, xs):
            for dg in dirs:
                for sy in range(0, S, th):
                    for sx in range(0, S, tw):
                        oy, ox = y0 + sy, x0 + sx
                        o = origin[oy:oy + th, ox:ox + tw].reshape(-1, 3)
                        dd = dg[oy:oy + th, ox:ox + tw].reshape(-1, 3)
                        tt = tmax[oy:oy + th, ox:ox + tw].reshape(-1)
                        walks.append(packet_steps(rows, 0, o, dd, tt, True))
        stats(walks, total, k, f"K={k} base {th}x{tw} pixel tiles")

        # --- octant+quantized sort within SxS block, draws pooled ---
        for bits, blabel in [(0, "octant"), (2, "octant+quant2")]:
            walks = []
            for y0, x0 in zip(ys, xs):
                o = np.concatenate(
                    [origin[y0:y0 + S, x0:x0 + S].reshape(-1, 3)] * 2)
                dd = np.concatenate(
                    [dg[y0:y0 + S, x0:x0 + S].reshape(-1, 3) for dg in dirs])
                tt = np.concatenate(
                    [tmax[y0:y0 + S, x0:x0 + S].reshape(-1)] * 2)
                order = np.argsort(dir_key(dd, bits), kind="stable")
                o, dd, tt = o[order], dd[order], tt[order]
                for i in range(0, len(tt), k):
                    walks.append(packet_steps(
                        rows, 0, o[i:i + k], dd[i:i + k], tt[i:i + k], True))
            stats(walks, total, k, f"K={k} {blabel}-sorted {S}x{S}x2")

        # --- octant sort within 8x8 block (tighter origins) ---
        walks = []
        for y0, x0 in zip(ys, xs):
            for sy in range(0, S, 8):
                for sx in range(0, S, 8):
                    oy, ox = y0 + sy, x0 + sx
                    o = np.concatenate(
                        [origin[oy:oy + 8, ox:ox + 8].reshape(-1, 3)] * 2)
                    dd = np.concatenate(
                        [dg[oy:oy + 8, ox:ox + 8].reshape(-1, 3)
                         for dg in dirs])
                    tt = np.concatenate(
                        [tmax[oy:oy + 8, ox:ox + 8].reshape(-1)] * 2)
                    order = np.argsort(dir_key(dd, 0), kind="stable")
                    o, dd, tt = o[order], dd[order], tt[order]
                    for i in range(0, len(tt), k):
                        walks.append(packet_steps(
                            rows, 0, o[i:i + k], dd[i:i + k], tt[i:i + k],
                            True))
        stats(walks, total, k, f"K={k} octant-sorted 8x8x2")


if __name__ == "__main__":
    main()
