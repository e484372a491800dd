"""AO-wavefront profile with REAL rays: both cosine-hemisphere draws per
pixel from the rendered 1080p SponzaProxy G-buffer, exactly as
ops/raygen.py:176-204 builds them (4.1M rays, tmax=5, anyhit).  The AO trace
is the single largest line item of the full-hybrid frame (~700 ms) — it was
masked as "15 ms marginal" in earlier decompositions because toggling
ao_mode=OFF did not remove the trace until the feature gating landed
(XLA cannot DCE one operand of a stacked array consumed by SVGF)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, iters=3):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
    return best


def main():
    from vulkanhybridrenderer_tpu.core.config import (
        HybridSettings, RenderConfig, ShadowMode,
    )
    from vulkanhybridrenderer_tpu.ops import raygen, traverse
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
    from vulkanhybridrenderer_tpu.ops import geometry, screen
    from vulkanhybridrenderer_tpu.ops.sampling import (
        to_basis, uniform_sample_cosine_hemisphere,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural
    from vulkanhybridrenderer_tpu.utils import rng

    h, w = 1080, 1920
    cfg = RenderConfig(width=w, height=h, alpha_raster="off",
                       hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED))
    r = Renderer(procedural.sponza_proxy(), cfg, path="hybrid")
    pfd = r._make_pfd()
    depth = r.fetch_resource("Depth")
    normal_oid = r.fetch_resource("World Space Normals and Object IDs")
    scene = r.scene.buffers
    bvh = r._get_bvh()
    world = geometry.to_world(scene, None)
    tris = bvh_ops.world_triangles(world.position, scene.tri_vertex)

    uv = screen.pixel_uv_grid(h, w)
    p_world = screen.position_from_depth(depth, uv,
                                         pfd.camera_viewproj_inverse)
    n = normal_oid[:3].transpose(1, 2, 0)
    origin = (p_world + n * 0.1).reshape(-1, 3)
    n_flat = n.reshape(-1, 3)
    # identical RNG draw order: 2 shadow draws then 2 per AO ray
    state = rng.pixel_seed(w, h, pfd.frame_index)
    for _ in range(2):
        state, _ = rng.random01(state)
    dirs = []
    for _ in range(2):
        state, r1 = rng.random01(state)
        state, r2 = rng.random01(state)
        u2 = jnp.stack([r1, r2], axis=-1).reshape(-1, 2)
        dirs.append(to_basis(n_flat, uniform_sample_cosine_hemisphere(u2)))
    sky_flat = (depth == 0.0).reshape(-1)
    ao_tmax = jnp.where(sky_flat, -1.0, raygen.AO_TMAX)
    o2 = jnp.concatenate([origin, origin])
    d2 = jnp.concatenate(dirs)
    t2 = jnp.concatenate([ao_tmax, ao_tmax])
    print(f"AO rays: {o2.shape[0]}")

    def block(a, bh, bw):
        """(H*W, ...) row-major -> block-major: contiguous (bh, bw) screen
        blocks (pure reshapes/transpose — no gather)."""
        s = a.shape[1:]
        a = a.reshape((h // bh, bh, w // bw, bw) + s)
        a = jnp.moveaxis(a, 2, 1)
        return a.reshape((h * w,) + s)

    def blocked(strips, bh, bw):
        ob = jnp.concatenate([block(origin, bh, bw)] * 2)
        db = jnp.concatenate([block(d, bh, bw) for d in dirs])
        tb = jnp.concatenate([block(ao_tmax, bh, bw)] * 2)
        return traverse.trace(bvh, tris, ob, db, raygen.SHADOW_TMIN, tb,
                              anyhit=True, strips=strips).t.sum()

    def subpkt(k, nby, nbx, th, tw, strips=None, phases=None):
        tl, _ = raygen.make_block_tiler(h, w, nby, nbx, th, tw)
        assert tl is not None, (nby, nbx, th, tw)
        ob = jnp.concatenate([tl(origin)] * 2)
        db = jnp.concatenate([tl(d) for d in dirs])
        tb = jnp.concatenate([tl(ao_tmax)] * 2)
        if strips is None:
            strips = 2 * nby * nbx  # one strip per block per draw
        kw = dict(anyhit=True, strips=strips, packets=k)
        if phases is not None:
            kw.update(compact=True, packet_phases=phases)
        return traverse.trace(bvh, tris, ob, db, raygen.SHADOW_TMIN, tb,
                              **kw).t.sum()

    import os

    cases = [
        ("block135x240 s128 (prod)", blocked, (128, 135, 240)),
        ("subpkt K4 2x2 b4x8", subpkt, (4, 4, 8, 2, 2)),
        ("subpkt K4 2x2 b6x16", subpkt, (4, 6, 16, 2, 2)),
        ("subpkt K8 2x4 b4x8", subpkt, (8, 4, 8, 2, 4)),
        ("subpkt K8 2x4 b6x16", subpkt, (8, 6, 16, 2, 4)),
        ("subpkt K8 4x2 b4x8", subpkt, (8, 4, 8, 4, 2)),
        ("subpkt K16 4x4 b4x8", subpkt, (16, 4, 8, 4, 4)),
        ("subpkt K8 2x4 s1 ph40/4+40/16", subpkt,
         (8, 4, 8, 2, 4, 1, ((40, 4), (40, 16)))),
        ("subpkt K4 2x2 s1 ph28/4+28/16", subpkt,
         (4, 4, 8, 2, 2, 1, ((28, 4), (28, 16)))),
    ]
    only = os.environ.get("AO_CASES")
    for label, fn, args in cases:
        if only and only not in label:
            continue
        ms = timeit(fn, *args)
        print(f"ao {label:<32} {ms:8.1f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
