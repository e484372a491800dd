"""BVH8 (ops/bvh8.py) structure + trace8 traversal tests: collapse validity,
closest/anyhit equivalence vs the binary trace and brute force, refit, alpha
hit-filter, and XOR-octant ordering correctness across all ray octants."""
import numpy as np
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops
from vulkanhybridrenderer_tpu.ops import traverse
from vulkanhybridrenderer_tpu.ops.geometry import to_world
from vulkanhybridrenderer_tpu.scene import procedural


def _random_soup(n, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (n, 1, 3))
    tri = base + rng.uniform(-0.5, 0.5, (n, 3, 3))
    return jnp.asarray(tri.astype(np.float32))


def _bvh8(tris):
    return bvh8_ops.build_bvh8_host(bvh_ops.build(tris, leaf_size=1), tris)


def _rand_rays(n, seed, spread=12.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_collapse_structure():
    for n in (1, 7, 8, 9, 37, 300):
        tris = _random_soup(n, seed=n)
        b8 = _bvh8(tris)
        bvh8_ops.validate_host(b8, tris)


def test_closest_matches_binary_all_octants():
    tris = _random_soup(400, seed=3)
    b1 = bvh_ops.build(tris, leaf_size=1)
    b8 = _bvh8(tris)
    # rays in every direction octant (XOR-ordering correctness depends on octant)
    o, d = _rand_rays(512, seed=1)
    assert len(np.unique(np.asarray(traverse.ray_octants(d)))) == 8
    r1 = traverse.trace(b1, tris, o, d, 0.01, 1e4)
    r8 = traverse.trace(b8, tris, o, d, 0.01, 1e4)
    np.testing.assert_array_equal(np.asarray(r1.tri), np.asarray(r8.tri))
    np.testing.assert_allclose(np.asarray(r1.t), np.asarray(r8.t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(r1.u), np.asarray(r8.u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(r1.v), np.asarray(r8.v), atol=1e-4)


def test_anyhit_matches_binary_hitset():
    tris = _random_soup(200, seed=5)
    b1 = bvh_ops.build(tris, leaf_size=1)
    b8 = _bvh8(tris)
    o, d = _rand_rays(256, seed=2)
    a1 = traverse.trace(b1, tris, o, d, 0.01, 1e4, anyhit=True)
    a8 = traverse.trace(b8, tris, o, d, 0.01, 1e4, anyhit=True)
    np.testing.assert_array_equal(
        np.asarray(a1.tri >= 0), np.asarray(a8.tri >= 0)
    )
    # an anyhit t is a real intersection: >= the closest t
    c8 = traverse.trace(b8, tris, o, d, 0.01, 1e4)
    m = np.asarray(c8.tri >= 0)
    assert (np.asarray(a8.t)[m] >= np.asarray(c8.t)[m] - 1e-5).all()


def test_single_and_tiny_scenes():
    for n in (1, 3, 8):
        tris = _random_soup(n, seed=40 + n)
        b8 = _bvh8(tris)
        c = np.asarray(tris[n - 1]).mean(0)
        o = jnp.asarray((c + np.array([0, 0, 5], np.float32))[None])
        d = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
        rec = traverse.trace(b8, tris, o, d, 0.01, 100.0)
        assert int(rec.tri[0]) >= 0


def test_refit8():
    tris = _random_soup(100, seed=7)
    b8 = _bvh8(tris)
    moved = tris + jnp.asarray([5.0, 0.0, 0.0])
    b8m = bvh8_ops.refit8(b8, moved)
    bvh8_ops.validate_host(b8m, moved)
    # traversal over the refit tree matches a fresh binary build on moved tris
    bref = bvh_ops.build(moved, leaf_size=1)
    o, d = _rand_rays(128, seed=9)
    r_ref = traverse.trace(bref, moved, o, d, 0.01, 1e4)
    r_f = traverse.trace(b8m, moved, o, d, 0.01, 1e4)
    np.testing.assert_array_equal(np.asarray(r_ref.tri), np.asarray(r_f.tri))
    np.testing.assert_allclose(np.asarray(r_ref.t), np.asarray(r_f.t), atol=1e-4)


def test_refit8_sweeps_cover_depth():
    """Regression (round-2 advisor): refit8's default sweep count must cover
    the tree's full depth — a fixed cap leaves upper internal AABBs stale
    after large moves (silently missed intersections on animated scenes)."""
    tris = _random_soup(900, seed=21, spread=30.0)
    b8 = _bvh8(tris)
    assert b8.depth >= 3
    moved = tris + jnp.asarray([0.0, 40.0, 0.0])
    good = bvh8_ops.refit8(b8, moved)
    # default == full-depth propagation, bit-identical
    full = bvh8_ops.refit8(b8, moved, sweeps=b8.depth)
    np.testing.assert_array_equal(np.asarray(good.rows), np.asarray(full.rows))
    # traversal over the default refit matches a fresh build on moved tris
    bref = bvh_ops.build(moved, leaf_size=1)
    o, d = _rand_rays(256, seed=13, spread=35.0)
    o = o + jnp.asarray([0.0, 40.0, 0.0])
    r_ref = traverse.trace(bref, moved, o, d, 0.01, 1e4)
    r_f = traverse.trace(good, moved, o, d, 0.01, 1e4)
    np.testing.assert_array_equal(np.asarray(r_ref.tri), np.asarray(r_f.tri))
    # an UNDER-swept refit demonstrably misses hits (the failure mode the
    # depth default prevents): upper boxes still cover the old location
    bad = bvh8_ops.refit8(b8, moved, sweeps=1)
    r_bad = traverse.trace(bad, moved, o, d, 0.01, 1e4)
    assert (np.asarray(r_bad.tri) != np.asarray(r_ref.tri)).any()


def test_alpha_hit_filter_bvh8():
    sc = procedural.checker_quad(alpha_leaf=True)
    world = to_world(sc.buffers)
    tris = bvh_ops.world_triangles(world.position, sc.buffers.tri_vertex)
    b8 = _bvh8(tris)
    filt = traverse.make_alpha_hit_filter(sc.buffers)
    o = jnp.asarray(np.array([[1.9, 2.0, 1.9], [0.0, 2.0, 0.0]], np.float32))
    d = jnp.asarray(np.tile([[0.0, -1.0, 0.0]], (2, 1)).astype(np.float32))
    rec_f = traverse.trace(b8, tris, o, d, 0.01, 10.0, anyhit=True, hit_filter=filt)
    rec_o = traverse.trace(b8, tris, o, d, 0.01, 10.0, anyhit=True)
    assert np.asarray(rec_o.tri >= 0).all()
    hits_f = np.asarray(rec_f.tri >= 0)
    assert not hits_f[0] and hits_f[1]


def test_sah_collapse_cornell_shadows():
    sc = procedural.cornell_box()
    world = to_world(sc.buffers)
    tris = bvh_ops.world_triangles(world.position, sc.buffers.tri_vertex)
    b8 = _bvh8(tris)
    bvh8_ops.validate_host(b8, tris)
    l = -np.asarray(sc.light.direction[:3])
    p_open = np.array([1.5, 0.01, 1.5], np.float32)
    p_under = np.asarray(np.array([-0.7, 0.01, -0.6]) - l * 0.5, np.float32)
    o = jnp.asarray(np.stack([p_open, p_under]))
    d = jnp.asarray(np.tile(l[None], (2, 1)).astype(np.float32))
    rec = traverse.trace(b8, tris, o, d, 0.01, 1e4, anyhit=True)
    hits = np.asarray(rec.tri >= 0)
    assert not hits[0] and hits[1]


def test_phased_compaction_packet0_survives():
    """Regression (round-2 advisor, high; ray-level variant retired round 4):
    the compacted branch pads its nonzero index list; padding lanes must not
    scatter stale pre-phase state onto packet 0 (the old fill_value=0 +
    duplicate-index .set clobber).  Builds a wavefront where packet 0 (rays
    0..63 at K=64) is one of few survivors of a short phase 1, so the
    compaction branch executes with packet 0 alive."""
    tris = _random_soup(600, seed=11, spread=3.0)
    b8 = _bvh8(tris)
    n = 4096
    o = np.zeros((n, 3), np.float32)
    d = np.zeros((n, 3), np.float32)
    # rays 0..63: aimed from afar at the centroids of triangles 0..63
    # (guaranteed hits, long walks through the dense cluster -> survive the
    # 2-step phase); the rest start beyond it pointing away (die at the root
    # in one step)
    cent = np.asarray(tris[:64]).mean(axis=1)
    o[:64] = [0.0, 0.0, -50.0]
    d[:64] = cent - o[:64]
    o[64:] = [0.0, 0.0, 100.0]
    d[64:, 2] = 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    for anyhit in (False, True):
        a = traverse.trace(b8, tris, o_j, d_j, 0.01, 1e4, anyhit=anyhit,
                           strips=1, packets=64, compact=False)
        c = traverse.trace(b8, tris, o_j, d_j, 0.01, 1e4, anyhit=anyhit,
                           strips=1, packets=64, compact=True,
                           packet_phases=((2, 2), (8, 8)))
        assert int(a.tri[0]) >= 0, "test setup: ray 0 must hit"
        if anyhit:
            np.testing.assert_array_equal(
                np.asarray(a.tri >= 0), np.asarray(c.tri >= 0)
            )
        else:
            np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(c.tri))
            np.testing.assert_allclose(np.asarray(a.t), np.asarray(c.t),
                                       atol=1e-5)


def test_empty_slots_cost_no_steps():
    """Regression (round-2 advisor): empty slots carry inverted boxes which the
    orderless slab test un-inverts into universe boxes; unmasked, every empty
    slot would hit and re-descend child base+0, wasting ~6 steps at this root.
    Two well-separated 8-triangle clusters -> root with children in slots 0
    and 7 (centroid octants); a +++ ray hitting only cluster B must find it
    within 4 lockstep steps (root + B leaf; phantom descends would need ~9)."""
    rng = np.random.default_rng(3)
    a = rng.uniform(-5.5, -4.5, (8, 1, 3)) + rng.uniform(-0.3, 0.3, (8, 3, 3))
    b = rng.uniform(4.5, 5.5, (8, 1, 3)) + rng.uniform(-0.3, 0.3, (8, 3, 3))
    tris = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    b8 = _bvh8(tris)
    o_np = np.array([[4.0, 4.0, -20.0]], np.float32)
    cent = np.asarray(tris[8]).mean(axis=0)  # first cluster-B triangle
    d_np = cent[None] - o_np  # all-positive direction -> ray octant 0
    assert (d_np > 0).all()
    o = jnp.asarray(o_np)
    d = jnp.asarray(d_np / np.linalg.norm(d_np))
    free = traverse.trace(b8, tris, o, d, 0.01, 1e4)
    assert int(free.tri[0]) >= 8, "test setup: must hit cluster B"
    tight = traverse.trace(b8, tris, o, d, 0.01, 1e4, max_steps=4)
    assert int(tight.tri[0]) == int(free.tri[0])


def test_packet_trace_matches_per_ray():
    """Packet traversal (K rays sharing one walk) must produce exactly the
    plain per-ray results: closest hits bit-equal, anyhit hit set equal,
    including packets mixing hit/miss/dead (tmax < tmin) rays."""
    tris = _random_soup(500, seed=23)
    b8 = _bvh8(tris)
    n = 1024
    o, d = _rand_rays(n, seed=31)
    tmax = np.full(n, 1e4, np.float32)
    tmax[::7] = -1.0  # dead rays sprinkled through packets
    tmax_j = jnp.asarray(tmax)
    for anyhit in (False, True):
        for k in (32, 128):
            a = traverse.trace(b8, tris, o, d, 0.01, tmax_j, anyhit=anyhit,
                               strips=1)
            pkt = traverse.trace(b8, tris, o, d, 0.01, tmax_j, anyhit=anyhit,
                                 strips=1, packets=k)
            if anyhit:
                np.testing.assert_array_equal(
                    np.asarray(a.tri >= 0), np.asarray(pkt.tri >= 0)
                )
            else:
                np.testing.assert_array_equal(
                    np.asarray(a.tri), np.asarray(pkt.tri)
                )
                np.testing.assert_allclose(
                    np.asarray(a.t), np.asarray(pkt.t), atol=1e-5
                )
    # alpha hit-filter parity through the packet path
    sc = procedural.checker_quad(alpha_leaf=True)
    world = to_world(sc.buffers)
    trs = bvh_ops.world_triangles(world.position, sc.buffers.tri_vertex)
    bq = _bvh8(trs)
    filt = traverse.make_alpha_hit_filter(sc.buffers)
    o2, d2 = _rand_rays(256, seed=5, spread=3.0)
    a = traverse.trace(bq, trs, o2, d2, 0.01, 1e4, anyhit=True,
                       hit_filter=filt, strips=1)
    pkt = traverse.trace(bq, trs, o2, d2, 0.01, 1e4, anyhit=True,
                         hit_filter=filt, strips=1, packets=64)
    np.testing.assert_array_equal(
        np.asarray(a.tri >= 0), np.asarray(pkt.tri >= 0)
    )


def test_narrow_packet_trace_matches_per_ray():
    """Narrow packets (K < 128 rays sharing one walk through _trace8_packet
    with a padded lane axis) and the phased-compaction variant must produce
    exactly the plain per-ray results, including packets mixing
    hit/miss/dead rays and multi-strip schedules."""
    tris = _random_soup(400, seed=41)
    b8 = _bvh8(tris)
    n = 4096
    o, d = _rand_rays(n, seed=43)
    tmax = np.full(n, 1e4, np.float32)
    tmax[::5] = -1.0
    tmax_j = jnp.asarray(tmax)
    for anyhit in (False, True):
        a = traverse.trace(b8, tris, o, d, 0.01, tmax_j, anyhit=anyhit,
                           strips=1)
        for k in (4, 8, 16):
            for strips in (1, 4):
                pkt = traverse.trace(b8, tris, o, d, 0.01, tmax_j,
                                     anyhit=anyhit, strips=strips, packets=k)
                if anyhit:
                    np.testing.assert_array_equal(
                        np.asarray(a.tri >= 0), np.asarray(pkt.tri >= 0)
                    )
                else:
                    np.testing.assert_array_equal(
                        np.asarray(a.tri), np.asarray(pkt.tri)
                    )
                    np.testing.assert_allclose(
                        np.asarray(a.t), np.asarray(pkt.t), atol=1e-5
                    )
        # phased packet compaction at K=8: both the compacted path (big
        # strip, caps smaller than the packet count) and overflow fallback
        ph = traverse.trace(b8, tris, o, d, 0.01, tmax_j, anyhit=anyhit,
                            strips=1, packets=8, compact=True,
                            packet_phases=((6, 2), (12, 8)))
        if anyhit:
            np.testing.assert_array_equal(
                np.asarray(a.tri >= 0), np.asarray(ph.tri >= 0)
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(a.tri), np.asarray(ph.tri)
            )


def test_traversal_fuzz_vs_brute_force():
    """Randomized stress: BVH8 closest hits must equal brute-force
    Möller-Trumbore over ALL triangles, across degenerate-ish geometry
    (slivers, shared vertices, axis-aligned walls) and extreme ray setups."""
    rng = np.random.default_rng(99)
    for trial in range(4):
        n = int(rng.integers(20, 600))
        kind = trial % 4
        if kind == 0:  # random soup
            tris = np.asarray(_random_soup(n, seed=trial))
        elif kind == 1:  # thin slivers
            base = rng.uniform(-5, 5, (n, 1, 3))
            e1 = rng.normal(size=(n, 1, 3)) * 2.0
            e2 = e1 * rng.uniform(0.9, 1.1, (n, 1, 1)) + rng.normal(
                size=(n, 1, 3)) * 1e-3
            tris = np.concatenate([base, base + e1, base + e2], axis=1)
        elif kind == 2:  # axis-aligned quads (walls/floors)
            tris = []
            for _ in range(n):
                axis = rng.integers(0, 3)
                c = rng.uniform(-5, 5, 3)
                s_ = rng.uniform(0.1, 4)
                a = np.zeros(3); b = np.zeros(3)
                a[(axis + 1) % 3] = s_
                b[(axis + 2) % 3] = s_
                tris.append([c, c + a, c + b])
            tris = np.asarray(tris, np.float32)
        else:  # clustered fan sharing a vertex
            apex = rng.uniform(-2, 2, 3)
            spokes = rng.normal(size=(n, 2, 3)) * 1.5 + apex
            tris = np.concatenate(
                [np.broadcast_to(apex, (n, 1, 3)), spokes], axis=1
            ).astype(np.float32)
        tris = jnp.asarray(np.ascontiguousarray(tris, np.float32))
        b8 = _bvh8(tris)
        bvh8_ops.validate_host(b8, tris)
        o, d = _rand_rays(256, seed=trial + 50, spread=8.0)
        rec = traverse.trace(b8, tris, o, d, 1e-3, 1e4)
        t_all, _, _, ok = traverse.moller_trumbore(
            tris[None, :, 0], tris[None, :, 1], tris[None, :, 2],
            o[:, None], d[:, None],
        )
        t_all = np.asarray(jnp.where(ok & (t_all >= 1e-3), t_all, np.inf))
        bf_t = t_all.min(axis=1)
        hit_bf = np.isfinite(bf_t)
        np.testing.assert_array_equal(np.asarray(rec.hit), hit_bf)
        np.testing.assert_allclose(
            np.asarray(rec.t)[hit_bf], bf_t[hit_bf], rtol=1e-5, atol=1e-5
        )
        # narrow-packet closest hits through the same degenerate geometry
        sub = traverse.trace(b8, tris, o, d, 1e-3, 1e4, packets=8, strips=1)
        np.testing.assert_array_equal(np.asarray(sub.hit), hit_bf)
        np.testing.assert_allclose(
            np.asarray(sub.t)[hit_bf], bf_t[hit_bf], rtol=1e-5, atol=1e-5
        )


def test_leaf_max_12_matches_8():
    """12-triangle leaf rows (layout: 9 coordinate groups of 12 + ids) must
    produce identical closest hits; native and Python builders bit-identical."""
    from vulkanhybridrenderer_tpu import native_bridge

    tris = _random_soup(500, seed=17)
    b1 = bvh_ops.build(tris, leaf_size=1)
    b8 = bvh8_ops.build_bvh8_host(b1, tris, prefer_native=False)
    b12 = bvh8_ops.build_bvh8_host(b1, tris, prefer_native=False, leaf_max=12)
    bvh8_ops.validate_host(b12, tris)
    assert b12.num_rows < b8.num_rows
    o, d = _rand_rays(512, seed=4)
    r8 = traverse.trace(b8, tris, o, d, 0.01, 1e4)
    r12 = traverse.trace(b12, tris, o, d, 0.01, 1e4)
    np.testing.assert_array_equal(np.asarray(r8.tri), np.asarray(r12.tri))
    np.testing.assert_allclose(np.asarray(r8.t), np.asarray(r12.t), atol=1e-5)
    if native_bridge.native_available():
        nat = native_bridge.bvh8_collapse_host(b1, tris, leaf_max=12)
        np.testing.assert_array_equal(np.asarray(nat.rows), np.asarray(b12.rows))
    # refit keeps the 12-wide layout intact
    moved = tris + jnp.asarray([2.0, 0.0, 0.0])
    b12m = bvh8_ops.refit8(b12, moved)
    bvh8_ops.validate_host(b12m, moved)


def test_packet_phased_compaction_exact():
    """Packet-level staged compaction (_trace8_packet_phased) must match the
    plain packet trace exactly, in all three regimes: the compacted branch
    actually running (few survivors), multiple phases chaining scatter-backs,
    and overflow (survivors > cap) falling back to the uncompacted re-trace."""
    tris = _random_soup(600, seed=41)
    b8 = _bvh8(tris)
    n = 4096
    o, d = _rand_rays(n, seed=43)
    tmax = np.full(n, 1e4, np.float32)
    tmax[::5] = -1.0
    tmax_j = jnp.asarray(tmax)
    for anyhit in (False, True):
        ref = traverse.trace(b8, tris, o, d, 0.01, tmax_j, anyhit=anyhit,
                             strips=1, packets=64)
        for phases in (
            ((64, 4),),            # one compaction, generous steps
            ((8, 2), (16, 4)),     # two chained compactions
            ((1, 16),),            # tiny cap after 1 step -> certain overflow
        ):
            got = traverse.trace(
                b8, tris, o, d, 0.01, tmax_j, anyhit=anyhit, strips=1,
                packets=64, compact=True, packet_phases=phases,
            )
            if anyhit:
                np.testing.assert_array_equal(
                    np.asarray(ref.tri >= 0), np.asarray(got.tri >= 0),
                    err_msg=f"phases={phases}",
                )
            else:
                np.testing.assert_array_equal(
                    np.asarray(ref.tri), np.asarray(got.tri),
                    err_msg=f"phases={phases}",
                )
                np.testing.assert_allclose(
                    np.asarray(ref.t), np.asarray(got.t), atol=1e-5
                )
