"""CPU fallback for dump_ao_rays.py (use when the TPU tunnel is down):
reconstruct the 1080p SponzaProxy AO wavefront by casting primary rays with a
vectorized numpy walk over the SAH binary BVH, interpolating vertex normals at
the hits, and drawing cosine-hemisphere AO directions (numpy RNG — walk-length
statistics are insensitive to the exact RNG stream).  Writes the same
/tmp/ao_rays.npz consumed by sim_packet_union.py.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/dump_ao_rays_cpu.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

TMIN = 0.01


def walk_closest(nlo, nhi, nxt, esc, leaf_tri_id, root, o, d, tmax, tris,
                 cap=40000):
    """Vectorized threaded closest-hit walk; returns (t, tri, u, v)."""
    r = o.shape[0]
    node = np.full(r, root, np.int64)
    t_best = np.full(r, tmax, np.float32)
    tri_best = np.full(r, -1, np.int64)
    u_best = np.zeros(r, np.float32)
    v_best = np.zeros(r, np.float32)
    safe_d = np.where(np.abs(d) < 1e-12, 1e-12, d)
    inv_d = 1.0 / safe_d
    it = 0
    while (node >= 0).any() and it < cap:
        it += 1
        live = node >= 0
        ns = np.maximum(node, 0)
        tri = leaf_tri_id[ns]
        is_leaf = tri >= 0
        lo = nlo[ns]
        hi = nhi[ns]
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        box_hit = (np.maximum(tn, TMIN) <= np.minimum(tf, t_best)) & live
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
        ok = (okd & (u >= 0) & (v >= 0) & (u + v <= 1) & is_leaf & live
              & (t >= TMIN) & (t < t_best))
        t_best = np.where(ok, t, t_best)
        tri_best = np.where(ok, tri, tri_best)
        u_best = np.where(ok, u, u_best)
        v_best = np.where(ok, v, v_best)
        nxt_node = np.where(is_leaf | ~box_hit, esc[ns], nxt[ns])
        node = np.where(live, nxt_node, node)
    return t_best, tri_best, u_best, v_best


def main():
    import jax.numpy as jnp

    from vulkanhybridrenderer_tpu import native_bridge
    from vulkanhybridrenderer_tpu.core.config import (
        HybridSettings, RenderConfig, ShadowMode,
    )
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import screen
    from vulkanhybridrenderer_tpu.ops.geometry import to_world
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural

    import os

    h, w = 1080, 1920
    scene_name = os.environ.get("SCENE", "sponza")
    scene = (procedural.bistro_proxy() if scene_name == "bistro"
             else procedural.sponza_proxy())
    cfg = RenderConfig(width=w, height=h, alpha_raster="off",
                       hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED))
    r = Renderer(scene, cfg, path="hybrid")
    pfd = r._make_pfd()
    sc = r.scene.buffers
    world = to_world(sc, None)
    tris = np.asarray(bvh_ops.world_triangles(world.position, sc.tri_vertex))

    # primary ray per pixel: unproject the pixel center at an arbitrary depth
    uv = screen.pixel_uv_grid(h, w)
    p_mid = screen.position_from_depth(
        jnp.full((h, w), 0.5, jnp.float32), uv, pfd.camera_viewproj_inverse
    )
    cam = np.asarray(pfd.camera_position, np.float32)
    d = np.asarray(p_mid, np.float32).reshape(-1, 3) - cam
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(cam, d.shape).astype(np.float32)

    t0 = time.time()
    b = native_bridge.build_sah_host(tris)
    tri_at = np.asarray(
        jnp.where(b.leaf_tri >= 0, b.order[jnp.maximum(b.leaf_tri, 0)], -1)
    )
    t, tri, uu, vv = walk_closest(
        np.asarray(b.aabb_min), np.asarray(b.aabb_max), np.asarray(b.left),
        np.asarray(b.escape), tri_at, int(b.root), o, d, 1e4, tris,
    )
    print(f"primary cast: {time.time() - t0:.0f}s, "
          f"{(tri >= 0).mean() * 100:.1f}% hit", flush=True)

    # vertex-normal interpolation at the hits (gbuffer resolve parity)
    tvi = np.asarray(sc.tri_vertex)  # (T, 3)
    nrm = np.asarray(world.normal)  # (V, 3)
    ts = np.maximum(tri, 0)
    n0, n1, n2 = nrm[tvi[ts, 0]], nrm[tvi[ts, 1]], nrm[tvi[ts, 2]]
    n = (n0 * (1 - uu - vv)[:, None] + n1 * uu[:, None] + n2 * vv[:, None])
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    hitmask = tri >= 0
    p_world = o + d * t[:, None]
    origin = (p_world + n * 0.1).astype(np.float32)

    rng = np.random.default_rng(12345)
    dirs = []
    for _ in range(2):
        r1 = rng.random(n.shape[0]).astype(np.float32)
        r2 = rng.random(n.shape[0]).astype(np.float32)
        # cosine hemisphere around n (concentric not needed for stats)
        phi = 2 * np.pi * r1
        sq = np.sqrt(r2)
        local = np.stack(
            [np.cos(phi) * sq, np.sin(phi) * sq, np.sqrt(1 - r2)], -1
        ).astype(np.float32)
        up = np.where(np.abs(n[:, 2:3]) < 0.999,
                      np.array([0, 0, 1], np.float32),
                      np.array([1, 0, 0], np.float32))
        tx = np.cross(up, n)
        tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
        ty = np.cross(n, tx)
        dirs.append((local[:, 0:1] * tx + local[:, 1:2] * ty
                     + local[:, 2:3] * n).astype(np.float32))

    tmax = np.where(hitmask, 5.0, -1.0).astype(np.float32)

    # shadow wavefront: cone around L is ~L for union statistics
    light = np.asarray(pfd.directional_light.direction, np.float32)[:3]
    ldir = -light / np.linalg.norm(light)
    shadow_dir = np.broadcast_to(ldir, origin.shape).astype(np.float32)
    shadow_tmax = np.where(hitmask, 1e4, -1.0).astype(np.float32)

    # mirror-reflection wavefront (closest-hit)
    refl_dir = (d - 2.0 * (d * n).sum(-1, keepdims=True) * n).astype(np.float32)

    np.savez(os.environ.get("OUT", "/tmp/ao_rays.npz"), origin=origin, dir0=dirs[0], dir1=dirs[1],
             tmax=tmax, h=h, w=w, shadow_dir=shadow_dir,
             shadow_tmax=shadow_tmax, refl_dir=refl_dir)
    print("wrote", os.environ.get("OUT", "/tmp/ao_rays.npz"))


if __name__ == "__main__":
    main()
