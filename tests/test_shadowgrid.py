"""Light-space shadow grid (ops/shadowgrid.py): conservative-culling
correctness — the hit/miss mask for cone-jittered directional shadow rays must
EQUAL the BVH anyhit traversal's (the grid only culls; tests are the same
world-space Möller-Trumbore)."""
import numpy as np
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops
from vulkanhybridrenderer_tpu.ops import shadowgrid, traverse
from vulkanhybridrenderer_tpu.ops.geometry import to_world
from vulkanhybridrenderer_tpu.ops.sampling import to_basis, uniform_sample_cone
from vulkanhybridrenderer_tpu.scene import procedural
from vulkanhybridrenderer_tpu.utils.math3d import normalize


def _scene_rays(sc, n, seed=0):
    world = to_world(sc.buffers, sc.buffers.prim_transform)
    tris = bvh_ops.world_triangles(world.position, sc.buffers.tri_vertex)
    t = np.asarray(tris)
    rng = np.random.default_rng(seed)
    # origins on triangle surfaces + 0.1 * up (like raygen's P + 0.1 N)
    ti = rng.integers(0, t.shape[0], n)
    b = rng.dirichlet([1, 1, 1], n).astype(np.float32)
    o = np.einsum("nk,nkj->nj", b, t[ti]) + np.array([0, 0.1, 0], np.float32)
    l = -np.asarray(sc.light.direction[:3])
    # cone jitter exactly like raygen (cos_theta_max = 0.999995)
    u2 = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    cone = normalize(uniform_sample_cone(jnp.asarray(u2), 0.999995))
    d = to_basis(jnp.broadcast_to(jnp.asarray(l), (n, 3)), cone)
    return tris, jnp.asarray(o), d, jnp.asarray(l)


def _check(sc, n=4096, seed=1):
    tris, o, d, l = _scene_rays(sc, n, seed)
    sg = shadowgrid.build_shadow_grid(tris, -l)
    assert int(sg.overflow) == 0, "big-tier overflow"
    hit_grid = np.asarray(shadowgrid.trace_shadow(sg, o, d, 0.01, 1e4))
    b8 = bvh8_ops.build_bvh8_host(bvh_ops.build(tris, leaf_size=1), tris)
    rec = traverse.trace(b8, tris, o, d, 0.01, 1e4, anyhit=True)
    np.testing.assert_array_equal(hit_grid, np.asarray(rec.hit))


def test_grid_matches_bvh_cornell():
    _check(procedural.cornell_box())


def test_grid_matches_bvh_sponza_small():
    _check(procedural.sponza_proxy(columns=4, segments=8, extra_boxes=24,
                                   grid_res=8), n=8192)


def test_grid_stats_sponza():
    sc = procedural.sponza_proxy()
    tris, o, d, l = _scene_rays(sc, 1024)
    sg = shadowgrid.build_shadow_grid(tris, -l)
    counts = np.asarray(sg.offsets[1:] - sg.offsets[:-1])
    print(f"\nentries={int(counts.sum())} num_big={int(sg.num_big)} "
          f"overflow={int(sg.overflow)} mean/cell={counts.mean():.1f} "
          f"p99={np.percentile(counts, 99):.0f} max={counts.max()}")
    assert int(sg.overflow) == 0
