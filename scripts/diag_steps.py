"""Walk-length diagnostic: steps per ray for threaded traversal variants.

Pure numpy host walk over the same threaded arrays the device traversal uses —
no jit, so variants iterate in seconds.  Informs the ordered/BVH8 decisions:
the device per-step cost is roughly constant, so expected steps ~ frame time.

Run CPU-only:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/diag_steps.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def walk_steps(nodes_lo, nodes_hi, nxt, esc, leaf_tri_id, root, o, d, tmax,
               tris=None, anyhit=False, cap=40000):
    """Vectorized numpy skip-pointer walk; returns per-ray step counts.
    leaf_tri_id: (total,) original triangle id at leaf nodes, -1 internal.
    tris: (T, 3, 3) for real triangle tests (t_best shortening + anyhit)."""
    r = o.shape[0]
    node = np.full(r, root, np.int64)
    steps = np.zeros(r, np.int64)
    t_best = np.full(r, tmax, np.float32)
    safe_d = np.where(np.abs(d) < 1e-12, 1e-12, d)
    inv_d = 1.0 / safe_d
    it = 0
    while (node >= 0).any() and it < cap:
        it += 1
        live = node >= 0
        ns = np.maximum(node, 0)
        tri = leaf_tri_id[ns]
        is_leaf = tri >= 0
        lo = nodes_lo[ns]
        hi = nodes_hi[ns]
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        box_hit = np.maximum(tn, 0.01) <= np.minimum(tf, t_best)
        ok = np.zeros(r, bool)
        if tris is not None:
            ts = np.maximum(tri, 0)
            v0, v1, v2 = tris[ts, 0], tris[ts, 1], tris[ts, 2]
            e1, e2 = v1 - v0, v2 - v0
            p = np.cross(d, e2)
            det = (e1 * p).sum(-1)
            okd = np.abs(det) > 1e-9
            inv = 1.0 / np.where(okd, det, 1.0)
            tv = o - v0
            u = (tv * p).sum(-1) * inv
            q = np.cross(tv, e1)
            v = (d * q).sum(-1) * inv
            t = (e2 * q).sum(-1) * inv
            ok = okd & (u >= 0) & (v >= 0) & (u + v <= 1) & is_leaf & live
            ok &= (t >= 0.01) & (t < t_best)
            t_best = np.where(ok, t, t_best)
        nxt_node = np.where(is_leaf | ~box_hit, esc[ns], nxt[ns])
        if anyhit:
            nxt_node = np.where(ok, -1, nxt_node)
        steps += live
        node = np.where(live, nxt_node, node)
    return steps


def main():
    import jax.numpy as jnp

    from vulkanhybridrenderer_tpu import native_bridge
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops.geometry import to_world
    from vulkanhybridrenderer_tpu.scene import procedural

    rcount = int(os.environ.get("RAYS", 65536))
    scene = procedural.sponza_proxy()
    world = to_world(scene.buffers, scene.buffers.prim_transform)
    tris_j = bvh_ops.world_triangles(world.position, scene.buffers.tri_vertex)
    tris = np.asarray(tris_j)
    print(f"{scene.name}: {tris.shape[0]} tris, {rcount} rays", flush=True)

    trees = {
        "lbvh": bvh_ops.build(tris_j, leaf_size=1),
        "sah ": native_bridge.build_sah_host(tris),
    }

    rng = np.random.default_rng(0)
    lo = tris.reshape(-1, 3).min(0)
    hi = tris.reshape(-1, 3).max(0)
    side = int(np.sqrt(rcount)) + 1
    gx, gz = np.meshgrid(np.linspace(lo[0], hi[0], side), np.linspace(lo[2], hi[2], side))
    o = np.stack([gx.ravel(), np.full(gx.size, lo[1] + 0.5), gz.ravel()], -1)[:rcount]
    o = (o + rng.normal(scale=0.05, size=o.shape)).astype(np.float32)

    l = np.array([0.35, 0.8, 0.3], np.float32)
    l /= np.linalg.norm(l)
    d_sh = np.broadcast_to(l, (rcount, 3))
    v = rng.normal(size=(rcount, 3)).astype(np.float32)
    v[:, 1] = np.abs(v[:, 1]) + 0.05
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    d_ao = v

    for tname, b in trees.items():
        tri_at = np.asarray(
            jnp.where(b.leaf_tri >= 0, b.order[jnp.maximum(b.leaf_tri, 0)], -1)
        )
        nlo = np.asarray(b.aabb_min)
        nhi = np.asarray(b.aabb_max)
        n8 = np.asarray(b.next8)
        e8 = np.asarray(b.esc8)
        left = np.asarray(b.left)
        esc = np.asarray(b.escape)
        for rays_name, d, anyhit in (
            ("shadow anyhit", d_sh, True),
            ("ao     anyhit", d_ao, True),
            ("shadow closest", d_sh, False),
        ):
            oct_ = ((d[:, 0] < 0) << 2) | ((d[:, 1] < 0) << 1) | (d[:, 2] < 0)
            for lname in ("unord", "ordrd"):
                if lname == "unord":
                    s = walk_steps(nlo, nhi, left, esc, tri_at, int(b.root),
                                   o, d, 1e4, tris, anyhit)
                else:
                    # per-ray octant links: emulate via per-octant sub-walks
                    s = np.zeros(rcount, np.int64)
                    for q in range(8):
                        m = oct_ == q
                        if not m.any():
                            continue
                        s[m] = walk_steps(nlo, nhi, n8[q], e8[q], tri_at,
                                          int(b.root), o[m], d[m], 1e4, tris,
                                          anyhit)
                print(f"{tname} {rays_name} {lname}: mean {s.mean():8.1f}  "
                      f"p50 {np.percentile(s, 50):7.0f}  p99 "
                      f"{np.percentile(s, 99):7.0f}  max {s.max():7d}", flush=True)


if __name__ == "__main__":
    main()
