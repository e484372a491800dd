"""Hybrid ray-trace pass: RT shadows + AO + mirror reflections from the G-buffer
(reference raygen.rgen:14-67 + reflection_hit.rchit + miss shaders).

Parity notes (cited to raygen.rgen):
  * RNG: seed_thread((y * H + x) * frame_index), xorshift draws in the reference's
    exact order: shadow rnd1, rnd2, then per-AO-ray rnd1, rnd2 (:18, :32-33, :46-47).
  * shadow = ONE cone direction around L (cos_theta_max = 0.999995) -- the reference
    loops traceRayEXT 4x with the *same* direction and payload (:39-41), which is
    semantically a single any-hit trace; we trace once.  miss -> lit (1.0).
  * AO = 2 cosine-hemisphere rays around N, tmax 5.0 (:44-55), averaged.
  * reflection = mirror reflect() of the camera ray, closest-hit shaded by
    reflection_hit.rchit, miss -> 0 (:58-66).
  * all rays start at P + N * 0.1 with tmin 0.01 (:29, :41).
  * sky pixels (depth == 0): shadow_ao = (1, 1, 0, 1), reflections = 0 (:20-24).
"""
from __future__ import annotations

import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.types import PerFrameData, SceneBuffers
from vulkanhybridrenderer_tpu.ops import rt_shade, screen, traverse
from vulkanhybridrenderer_tpu.ops.sampling import (
    to_basis,
    uniform_sample_cone,
    uniform_sample_cosine_hemisphere,
)
from vulkanhybridrenderer_tpu.utils import rng
from vulkanhybridrenderer_tpu.utils.math3d import normalize, reflect

CONE_COS_THETA_MAX = 0.999995
SHADOW_TMIN = 0.01
SHADOW_TMAX = 10000.0
AO_TMAX = 5.0
PACKET_TILE = (8, 16)  # pixel tile grouped into one 128-ray packet

# Trace-time probe (tests): hybrid_raytrace records which traversal schedule
# each wavefront actually compiled with, e.g. {"shadow": "packet128/...",
# "sharded_rows": 8}.  Written during jit tracing, so it reflects the real
# compiled kernels of the LAST (re)trace.
LAST_SCHEDULES: dict = {}


def make_tiler(h: int, w: int):
    """(tile, untile) permutations turning image-order (H*W, ...) arrays into
    8x16-pixel-tile order — pure reshape/transpose (no gathers), so each
    packet of 128 consecutive rays covers a compact screen tile and the
    packet traversal's union walk stays tight.  Returns (None, None) when
    the resolution doesn't tile evenly."""
    th, tw = PACKET_TILE
    if h % th or w % tw:
        return None, None

    def tile(a):
        rest = a.shape[1:]
        x = a.reshape(h // th, th, w // tw, tw, *rest)
        return x.transpose(0, 2, 1, 3, *range(4, 4 + len(rest))).reshape(
            h * w, *rest
        )

    def untile(a):
        rest = a.shape[1:]
        x = a.reshape(h // th, w // tw, th, tw, *rest)
        return x.transpose(0, 2, 1, 3, *range(4, 4 + len(rest))).reshape(
            h * w, *rest
        )

    return tile, untile


def make_block_tiler(h: int, w: int, nby: int, nbx: int, th: int, tw: int):
    """(tile, untile) permutations for SUB-packet traversal: image-order
    (H*W, ...) arrays -> (block-major, then (th, tw)-pixel-tile-major) order.
    Each tile's th*tw pixels become one K-ray sub-packet (consecutive rays);
    each of the nby*nbx screen blocks holds a contiguous run of sub-packets,
    so a traversal STRIP covering one block pays the block's (spatially
    correlated) max union walk.  Pure reshape/transpose, no gathers.
    Returns (None, None) when the resolution doesn't split evenly."""
    if h % (nby * th) or w % (nbx * tw):
        return None, None
    bh, bw = h // nby, w // nbx  # block pixel size

    def tile(a):
        rest = a.shape[1:]
        x = a.reshape(nby, bh // th, th, nbx, bw // tw, tw, *rest)
        x = x.transpose(0, 3, 1, 4, 2, 5, *range(6, 6 + len(rest)))
        return x.reshape(h * w, *rest)

    def untile(a):
        rest = a.shape[1:]
        x = a.reshape(nby, nbx, bh // th, bw // tw, th, tw, *rest)
        x = x.transpose(0, 2, 4, 1, 3, 5, *range(6, 6 + len(rest)))
        return x.reshape(h * w, *rest)

    return tile, untile


def pick_block_tiler(h: int, w: int, th: int, tw: int, max_blocks: int = 8):
    """First (tile, untile, nby, nbx) block-tiler whose grid divides the
    resolution, searching from max_blocks x max_blocks down (more blocks =
    finer strips = closer to mean walk length).  (None, None, 0, 0) if none."""
    for nby in range(max_blocks, 0, -1):
        if h % (nby * th):
            continue
        for nbx in range(max_blocks, 0, -1):
            if w % (nbx * tw):
                continue
            tile, untile = make_block_tiler(h, w, nby, nbx, th, tw)
            if tile is not None:
                return tile, untile, nby, nbx
    return None, None, 0, 0


def padded_block_tiler(h: int, w: int, th: int, tw: int, max_blocks: int = 8):
    """Block tiler that NEVER falls back: pads rows/cols up to (th, tw)
    multiples and picks the largest block grid dividing the padded
    resolution (nby = nbx = 1 always divides, so this always succeeds).
    Padding pixels are dead rays — callers tile tmax with fill=-1.0 so they
    exit the lockstep walk at step one and cost nothing.

    Returns (tile, untile, nby, nbx): tile(a, fill) maps (h*w, ...) image-
    order arrays to (hp*wp, ...) block-tile order; untile inverts and slices
    the padding back off.  Replaces the round-3 divisibility-gated tilers
    whose silent fallback dropped odd-sized slabs (e.g. 135-row mesh shards
    at 1080p) onto the non-packet paths."""
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    base_tile, base_untile, nby, nbx = pick_block_tiler(
        hp, wp, th, tw, max_blocks
    )

    def tile(a, fill=0.0):
        rest = a.shape[1:]
        x = a.reshape(h, w, *rest)
        if hp != h or wp != w:
            pads = [(0, hp - h), (0, wp - w)] + [(0, 0)] * len(rest)
            x = jnp.pad(x, pads, constant_values=fill)
        return base_tile(x.reshape(hp * wp, *rest))

    def untile(a):
        rest = a.shape[1:]
        x = base_untile(a).reshape(hp, wp, *rest)
        return x[:h, :w].reshape(h * w, *rest)

    return tile, untile, nby, nbx


def make_blocker(h: int, w: int, nb: int = 8):
    """(block, unblock) permutations turning image-order (H*W, ...) arrays into
    coarse block-major order: nb x nb contiguous screen blocks of (h/nb, w/nb)
    pixels each — pure reshape/transpose, no gathers.  Used so each traversal
    STRIP covers one compact screen block: strips pay their own max walk
    length, and walk lengths are spatially correlated, so block-uniform strips
    beat full-width image bands ~12% on the AO wavefront
    (scripts/bench_ao_real.py: block135x240 s128 = 511 ms vs plain s64 = 579).
    Returns (None, None) when the resolution doesn't split evenly."""
    if h % nb or w % nb:
        return None, None
    bh, bw = h // nb, w // nb

    def block(a):
        rest = a.shape[1:]
        x = a.reshape(nb, bh, nb, bw, *rest)
        return jnp.moveaxis(x, 2, 1).reshape(h * w, *rest)

    def unblock(a):
        rest = a.shape[1:]
        x = a.reshape(nb, nb, bh, bw, *rest)
        return jnp.moveaxis(x, 1, 2).reshape(h * w, *rest)

    return block, unblock


def hybrid_raytrace(
    scene: SceneBuffers,
    tables,
    tri_rows,
    bvh,
    tri_verts,
    pfd: PerFrameData,
    depth,
    normal_oid,
    ao_rays: int = 2,
    settings=None,
    shadow_grid=None,
    mesh=None,
):
    """depth: (H, W); normal_oid: (4, H, W).  Returns
    ("Raytraced Shadows and Ambient Occlusion" (4, H, W),
     "Raytraced Reflections" (4, H, W)).

    Schedule (round-3 sweeps: scripts/bench_trace_real.py,
    sim_packet_union.py, bench_refl.py): RAY-level staged compaction loses
    everywhere (per-strip nonzero/scatter costs more than the tail it saves
    at tree depth ~9).  Each wavefront gets the packet size its coherence
    supports — shadow (parallel rays, flat unions): 128-wide packets over
    8x16 tiles, strips = screen blocks; AO (incoherent hemispheres): K=4
    sub-packets over 2x2 tiles, strips = screen blocks; reflection
    (closest-hit, heavy walk tail): K=16 sub-packets over 4x4 tiles with
    staged sub-packet compaction.

    Dead-ray elimination: rays whose result cannot affect any output get
    tmax = -1 < tmin, exiting the lockstep walk at step one; strips covering
    only dead rays retire after a single iteration.  Sky pixels (depth == 0)
    are always dead — their shadow/AO/reflection values are overridden after
    the trace (raygen.rgen:20-24), bit-identically.  Shadow rays from pixels
    facing away from the light (N.L <= 0) are dead ONLY when denoise and
    reflections are both off: composition multiplies shadow by max(N.L, 0)
    (exactly 0 there), but SVGF spreads the raw channel spatially and the
    reflection modes multiply reflections by shadow (composition.frag /
    ops/composition.py:73,79,86), so those configs keep the rays.

    Feature gating: the reference's raygen.rgen traces shadow+AO+reflection
    unconditionally and lets composition's spec constants pick the sources —
    on RT cores the dead traces are nearly free, on TPU they are the most
    expensive ops in the frame.  Channels no active mode consumes are
    therefore not traced at all (shadow/ao -> 1.0, refl -> 0): output-
    identical, because composition ignores them (composition.frag:81-156)
    and SVGF's per-channel weights never mix shadow and AO.  XLA's DCE
    already pruned dead traces in denoise-OFF configs (slice-through-stack);
    with denoise ON the SVGF pass consumes all 4 channels, so the gating
    must be explicit.  (Only observable difference vs the reference: the
    SVGF *history* of a disabled channel holds its fill value, so the first
    frames after live-enabling a mode converge from 1.0 instead of from a
    pre-traced history — the price of not tracing rays nothing displays.)
    """
    h, w = depth.shape
    uv = screen.pixel_uv_grid(h, w)
    p_world = screen.position_from_depth(depth, uv, pfd.camera_viewproj_inverse)
    n = normal_oid[:3].transpose(1, 2, 0)  # (H, W, 3)
    l = -pfd.directional_light.direction[:3]

    origin = (p_world + n * 0.1).reshape(-1, 3)
    state = rng.pixel_seed(w, h, pfd.frame_index)
    sky_flat = (depth == 0.0).reshape(-1)

    from vulkanhybridrenderer_tpu.core.config import (
        AmbientOcclusionMode, ReflectionMode, ShadowMode,
    )

    # (composition multiplies reflections by its SELECTED shadow source —
    # ops/composition.py:79,86 — so a non-RAYTRACED shadow mode never reads
    # the RT shadow channel, even with reflections on)
    trace_shadow = settings is None or (
        settings.shadow_mode == ShadowMode.RAYTRACED
    )
    trace_ao = settings is None or (
        settings.ao_mode == AmbientOcclusionMode.RAYTRACED
    )
    trace_refl = settings is None or (
        settings.reflection_mode == ReflectionMode.RAYTRACED
    )

    # ---- shadow: one cone sample around L (:31-41) -----------------------------
    state, r1 = rng.random01(state)
    state, r2 = rng.random01(state)
    u2 = jnp.stack([r1, r2], axis=-1).reshape(-1, 2)
    cone = normalize(uniform_sample_cone(u2, CONE_COS_THETA_MAX))
    l_grid = jnp.broadcast_to(l, (h * w, 3))
    shadow_dir = to_basis(l_grid, cone)
    shadow_tmax = jnp.where(sky_flat, -1.0, SHADOW_TMAX)
    from vulkanhybridrenderer_tpu.core.config import ReflectionMode

    nl_skip_exact = settings is not None and not settings.denoise and (
        settings.reflection_mode == ReflectionMode.OFF
    )
    if nl_skip_exact:
        ndl = jnp.sum(n.reshape(-1, 3) * l, axis=-1)
        shadow_tmax = jnp.where(ndl <= 0.0, -1.0, shadow_tmax)
    # ---- AO directions: `ao_rays` cosine-hemisphere samples (:43-55) ------------
    # All AO rays trace as ONE wavefront (ao_rays * H * W): identical RNG draw
    # order to the reference's per-ray loop; fixed per-trace overheads are
    # paid once.  Octant pre-sorting is strictly worse (BVH8's
    # slot-XOR-octant ordering already handles per-ray direction).
    n_flat = n.reshape(-1, 3)
    dirs = []
    for _ in range(ao_rays):
        state, r1 = rng.random01(state)
        state, r2 = rng.random01(state)
        u2 = jnp.stack([r1, r2], axis=-1).reshape(-1, 2)
        dirs.append(to_basis(n_flat, uniform_sample_cosine_hemisphere(u2)))
    ao_tmax = jnp.where(sky_flat, -1.0, AO_TMAX)

    # ---- mirror reflection directions (:57-66) -----------------------------------
    cam = pfd.camera_position
    i_dir = normalize(p_world - cam).reshape(-1, 3)
    r_dir = reflect(i_dir, n_flat)
    refl_tmax = jnp.where(sky_flat, -1.0, SHADOW_TMAX)

    want_bvh_shadow = trace_shadow and shadow_grid is None
    LAST_SCHEDULES.clear()

    def trace_wavefronts(bvh_a, tv_a, h_l, origin_l, sdir_l, stmax_l,
                         adirs_l, atmax_l, rdir_l, rtmax_l):
        """Production traversal schedules over one h_l x w pixel slab — the
        whole image single-device, ONE ROW SHARD under a mesh (so sharding
        runs the exact same kernels).  All tilers are padded_block_tiler:
        never a divisibility fallback.  Returns image-order (h_l*w,) arrays
        (shadow_hit, ao, refl t/tri/u/v); disabled wavefronts return zeros.
        """
        r_l = h_l * w
        zero = jnp.zeros((r_l,), jnp.float32)
        shadow_hit = zero
        ao_l = zero
        refl_tuv = (zero, jnp.zeros((r_l,), jnp.int32), zero, zero)
        if want_bvh_shadow:
            # coherent wavefront -> 128-ray PACKETs over 8x16-pixel tiles
            # (~25-35% over plain strips, scripts/bench_packets.py).  Strips
            # are screen BLOCKS: shadow union walks are nearly flat in packet
            # size (parallel rays) and the cost is the per-strip MAX walk, so
            # small spatially-correlated strips approach the mean
            # (sim_packet_union: p99.9 38 steps vs mean 12.9 at K=128).
            tile, untile, nby, nbx = padded_block_tiler(h_l, w, *PACKET_TILE)
            strips = nby * nbx if nby * nbx >= 8 else 16
            rec = traverse.trace(
                bvh_a, tv_a, tile(origin_l), tile(sdir_l), SHADOW_TMIN,
                tile(stmax_l, fill=-1.0), anyhit=True, strips=strips,
                packets=128,
            )
            shadow_hit = untile(rec.hit.astype(jnp.float32))
            LAST_SCHEDULES["shadow"] = f"packet128/blocks{nby}x{nbx}"
        if trace_ao:
            # PER-RAY walks over block-major strips.  AO hemisphere draws are
            # incoherent, and on hardware every (sub-)packet size loses: the
            # lockstep strip pays M_subpackets x max-walk GATHERS per strip,
            # so round-3's sim-picked K=4 sub-packets measured 2.5-2.7 s vs
            # per-ray's 504.8 ms on the real 1080p wavefront (K8 1.36-1.44 s,
            # K16 807 ms — monotone in K toward packet128's 1141 ms; round-4
            # sweep, scripts/bench_trace_real.py).  Per-ray minimizes steps
            # (U(1)=12.0 mean) and block strips keep each strip's max walk
            # near its local p99; the block-granularity sweep
            # (scripts/bench_ao_r4.py) is 15x15 > 8x8 > 4x4 on 1080p
            # (402 / 480 / 662 ms): finer strips pay closer-to-local max
            # walks until per-strip dispatch overhead wins (b20+ flat/worse,
            # and rt_scale=2's quarter wavefront measured 614 -> 836 ms when
            # its strips shrank to 2.3k rays) — so scale the block grid to
            # keep strips >= ~8k rays.
            mb = max(1, min(15, int((h_l * w / 8192) ** 0.5)))
            blk, unblk, nby, nbx = padded_block_tiler(
                h_l, w, 1, 1, max_blocks=mb
            )
            rec = traverse.trace(
                bvh_a,
                tv_a,
                jnp.concatenate([blk(origin_l)] * ao_rays),
                jnp.concatenate([blk(d) for d in adirs_l]),
                SHADOW_TMIN,
                jnp.concatenate([blk(atmax_l, fill=-1.0)] * ao_rays),
                anyhit=True,
                strips=ao_rays * nby * nbx,
            )
            miss = jnp.where(rec.hit, 0.0, 1.0).reshape(ao_rays, -1)
            ao_l = unblk(jnp.sum(miss, axis=0) / ao_rays)
            LAST_SCHEDULES["ao"] = f"perray/blocks{nby}x{nbx}"
        if trace_refl:
            # mirror rays off mostly-smooth G-buffer normals are tile-
            # coherent, so K=128 packets over 8x16 tiles win (fewest gathers
            # per step); their closest-hit walks are LONG with a heavy tail
            # (p99.9/p50 = 4.3), so staged PACKET compaction trims the
            # surviving tail: phase 1 (48 steps ~ p90, cap 1/4) retires ~90%
            # of packets; <1% survive phase 2 (cap 1/16).  Measured 186.6 ms
            # on the real wavefront vs sub-packet K16 901 / K32 650 (round-4
            # sweep — sub-packets lose for the same per-strip gather-volume
            # reason as AO).  Overflow of either cap triggers the exact
            # full-width fallback (correctness is never at risk).
            rtile, runtile, nby, nbx = padded_block_tiler(h_l, w, *PACKET_TILE)
            rc = traverse.trace(
                bvh_a, tv_a, rtile(origin_l), rtile(rdir_l), SHADOW_TMIN,
                rtile(rtmax_l, fill=-1.0), strips=1, packets=128,
                compact=True, packet_phases=((48, 4), (96, 16)),
            )
            refl_tuv = (
                runtile(rc.t), runtile(rc.tri), runtile(rc.u), runtile(rc.v)
            )
            LAST_SCHEDULES["refl"] = "packet128/phased(48,4)(96,16)"
        return (shadow_hit, ao_l) + refl_tuv

    n_dev = mesh.devices.size if mesh is not None else 1
    if mesh is not None and n_dev > 1 and h % n_dev == 0:
        # shard_map over image rows: rays are embarrassingly parallel and the
        # BVH/scene stay replicated, so each device runs the FULL production
        # packet schedules on its own row slab with zero collectives (GSPMD
        # over the global block-tiler transposes would instead reshuffle the
        # whole wavefront across devices every trace).
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from vulkanhybridrenderer_tpu.parallel.mesh import ROW_AXIS

        LAST_SCHEDULES["sharded_rows"] = h // n_dev

        def to_img(a):  # (H*W, C...) -> (H, W, C...)
            return a.reshape((h, w) + a.shape[1:])

        def body(bvh_a, tv_a, o2, sd2, st2, ad3, at2, rd2, rt2):
            def fl(a):  # (h_l, w, C...) -> (h_l*w, C...)
                return a.reshape((-1,) + a.shape[2:])

            outs = trace_wavefronts(
                bvh_a, tv_a, o2.shape[0], fl(o2), fl(sd2), fl(st2),
                [fl(ad3[i]) for i in range(ao_rays)], fl(at2), fl(rd2),
                fl(rt2),
            )
            return tuple(o.reshape(o2.shape[0], w) for o in outs)

        # image-shaped args shard on their HEIGHT axis: (h, w[, c]) -> axis 0,
        # the stacked AO dirs (ao_rays, h, w, 3) -> axis 1
        img2, img3 = P(ROW_AXIS, None), P(ROW_AXIS, None, None)
        dirs4 = P(None, ROW_AXIS, None, None)
        in_specs = (P(), P(), img3, img3, img2, dirs4, img2, img3, img2)
        try:
            fn = shard_map(
                body, mesh=mesh, in_specs=in_specs,
                out_specs=(img2,) * 6, check_vma=False,
            )
        except TypeError:  # older jax: check_rep instead of check_vma
            fn = shard_map(
                body, mesh=mesh, in_specs=in_specs,
                out_specs=(img2,) * 6, check_rep=False,
            )
        outs = fn(
            bvh, tri_verts, to_img(origin), to_img(shadow_dir),
            to_img(shadow_tmax), jnp.stack([to_img(d) for d in dirs]),
            to_img(ao_tmax), to_img(r_dir), to_img(refl_tmax),
        )
        outs = tuple(o.reshape(h * w) for o in outs)
    else:
        outs = trace_wavefronts(
            bvh, tri_verts, h, origin, shadow_dir, shadow_tmax, dirs,
            ao_tmax, r_dir, refl_tmax,
        )
    shadow_hit_f, ao_flat, rt_t, rt_tri, rt_u, rt_v = outs

    # ---- shadow source ----------------------------------------------------------
    if not trace_shadow:
        shadow = jnp.ones((h, w), jnp.float32)
    elif shadow_grid is not None:
        # alternative AS (config.shadow_accel="grid"): light-space grid cell
        # lookup + lockstep entry tests, exact same hit/miss answers as the
        # BVH traversal (ops/shadowgrid.py)
        from vulkanhybridrenderer_tpu.ops import shadowgrid as sg_ops

        hit = sg_ops.trace_shadow(
            shadow_grid, origin, shadow_dir, SHADOW_TMIN, shadow_tmax,
            strips=64,
        )
        shadow = jnp.where(hit, 0.0, 1.0).reshape(h, w)
    else:
        shadow = jnp.where(shadow_hit_f > 0.5, 0.0, 1.0).reshape(h, w)

    # ---- AO source ---------------------------------------------------------------
    ao = jnp.ones((h, w), jnp.float32) if not trace_ao else ao_flat.reshape(h, w)

    # ---- reflection shading (reflection_hit.rchit) --------------------------------
    if not trace_refl:
        refl = jnp.zeros((h, w, 4), jnp.float32)
    else:
        rec = traverse.HitRecord(t=rt_t, tri=rt_tri, u=rt_u, v=rt_v)
        shaded = rt_shade.reflection_hit_shade(
            scene, tables, tri_rows, pfd, rec.tri, rec.u, rec.v
        )
        refl = jnp.where(rec.hit[:, None], shaded, 0.0).reshape(h, w, 4)

    # ---- sky override (:20-24) ------------------------------------------------------
    sky = depth == 0.0
    shadow = jnp.where(sky, 1.0, shadow)
    ao_out = jnp.where(sky, 1.0, ao)
    shadow_ao = jnp.stack(
        [shadow, ao_out, jnp.zeros_like(shadow), jnp.ones_like(shadow)], axis=0
    )
    refl = jnp.where(sky[..., None], 0.0, refl).transpose(2, 0, 1)
    return shadow_ao, refl
