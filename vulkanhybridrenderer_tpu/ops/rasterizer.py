"""Visibility-buffer rasterization (jnp reference implementation).

TPU-first redesign of the reference's raster pipelines (gbuf.vert/frag,
depth_prepass.vert): instead of per-primitive draw calls through fixed-function
hardware (hybrid_render_path.cpp:41-52), we rasterize the *whole scene* into a
visibility buffer -- per pixel: (triangle id, reverse-Z depth, barycentric
planes) -- and defer all attribute work to a separate resolve pass
(ops/gbuffer.py).  That split keeps the depth-test inner loop tiny and
vector-friendly, and turns attribute interpolation + texturing into big batched
gathers that XLA fuses well.

**Homogeneous (2DH) formulation — no near-plane clipping needed.**  The
hardware reference clips triangles against the near plane before rasterizing;
clipping produces a variable number of triangles, which is hostile to XLA's
static shapes.  Instead we rasterize directly from *homogeneous* screen
coordinates (Olano-Greer style): for vertex i with clip coords (x, y, z, w),

    X_i = (0.5 x + 0.5 w) * width,   Y_i = (0.5 y + 0.5 w) * height

and with M = rows (X_i, Y_i, w_i), the functions lambda_i(p)/w(p) are AFFINE in
screen space: plane_i = cross(r_j, r_k) / det(M) (adjugate columns).  Coverage
= all three planes >= 0 (valid for any w signs — the w > 0 restriction falls
out of the depth-range test below), the NDC depth z/w is the affine plane
sum_i z_i * plane_i, and the reference's reverse-Z depth-range test
0 <= z <= 1 doubles as the near/behind-camera clip: for the infinite
reverse-Z projection z_clip == znear so z(p) = znear / w(p), hence z > 0 <=> in
front and z <= 1 <=> w >= znear.  Triangles crossing the camera plane therefore
rasterize exactly without ever being clipped (the round-1 implementation
dropped them wholesale).

The visibility buffer stores the winner's raw plane values (l1, l2, S) where
S = l0 + l1 + l2 = 1/w(p): perspective-correct barycentrics are just
lambda_k = l_k / S (see weights_from_bary), with no per-vertex 1/w gathers at
resolve time.

This module is the *reference* implementation: a `lax.scan` over triangle
chunks with full-image plane evaluation per chunk.  It is exact and runs
anywhere (CPU tests use it at small resolutions); the production Pallas path
(ops/rasterizer_tiled.py) bins triangles to tiles first, consumes the same
`planes`, and must match it bit-for-bit on the visibility buffer.

Pipeline-state parity: back-face culling with the offscreen front-face
convention (pipeline.cpp:99 + :170-173 -- our projections bake the y-flip, see
package docstring; front face <=> det(M) < 0, which equals the signed-screen-
area test for w > 0 triangles), reverse-Z GREATER_OR_EQUAL depth test with
clear depth 0.0 (vulkan_pipeline_presets.h:35-40), later-triangle wins depth
ties.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VisibilityBuffer:
    tri_id: Any  # (H, W) int32, -1 = none
    depth: Any  # (H, W) f32 reverse-Z (0 = far/clear)
    #: (H, W, 3) winner's raw plane values (l1, l2, l0+l1+l2); perspective-
    #: correct barycentrics = l / sum (weights_from_bary)
    bary: Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriangleSetup:
    """Homogeneous per-triangle rasterization data (module docstring)."""

    #: (T, 12) affine screen planes [l0 A,B,C | l1 A,B,C | l2 A,B,C | z A,B,C]
    #: where l_i(p) = lambda_i(p)/w(p) and z(p) = NDC depth; evaluate at pixel
    #: centers (px + .5, py + .5)
    planes: Any
    sx: Any  # (T, 3) projected screen x (w-clamped; debugging/tests)
    sy: Any  # (T, 3)
    #: (T, 4) conservative screen bbox [xmin, ymin, xmax, ymax] of the VISIBLE
    #: projection, correct for any clip-w signs (see triangle_setup) —
    #: binning's tiling source
    bbox: Any
    #: (T,) any clip w > eps: a triangle with ALL vertices behind the camera
    #: can never pass the 0 <= z <= 1 depth-range test (its "phantom"
    #: projection region has 1/w < 0), so binning culls it outright
    w_any: Any
    front: Any  # (T,) front-facing (det < 0, the baked y-flip convention)
    valid: Any  # (T,) non-degenerate


def weights_from_bary(bary, eps: float = 1e-12):
    """(…, 3) visibility-buffer bary -> perspective-correct vertex weights
    (…, 3): lambda = (1 - l1/S - l2/S, l1/S, l2/S)."""
    s = bary[..., 2]
    inv = 1.0 / jnp.where(jnp.abs(s) > eps, s, 1.0)
    l1 = bary[..., 0] * inv
    l2 = bary[..., 1] * inv
    return jnp.stack([1.0 - l1 - l2, l1, l2], axis=-1)


def triangle_setup(clip, tri_vertex, width: int, height: int) -> TriangleSetup:
    """clip: (V, 4) clip-space vertices; tri_vertex: (T, 3) vertex ids."""
    v = clip[tri_vertex]  # (T, 3, 4)
    x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    X = (0.5 * x + 0.5 * w) * width  # homogeneous screen coords
    Y = (0.5 * y + 0.5 * w) * height
    w_ok = jnp.all(w > 1e-6, axis=-1)
    w_any = jnp.any(w > 1e-6, axis=-1)
    safe_w = jnp.where(jnp.abs(w) > 1e-6, w, 1e-6)
    sx = X / safe_w
    sy = Y / safe_w

    # conditioning: build the planes in centroid-centered screen coordinates
    # (adjugate entries are then products of triangle-sized, not screen-sized,
    # values), and fold the translation back into the constant term.
    cx = jnp.where(w_ok, jnp.mean(sx, axis=-1), 0.0)
    cy = jnp.where(w_ok, jnp.mean(sy, axis=-1), 0.0)
    Xc = X - cx[:, None] * w
    Yc = Y - cy[:, None] * w

    def cross_rows(j, k):
        a = jnp.stack([Xc[:, j], Yc[:, j], w[:, j]], axis=-1)
        b = jnp.stack([Xc[:, k], Yc[:, k], w[:, k]], axis=-1)
        return jnp.cross(a, b)  # (T, 3)

    adj0 = cross_rows(1, 2)
    adj1 = cross_rows(2, 0)
    adj2 = cross_rows(0, 1)
    det = Xc[:, 0] * adj0[:, 0] + Yc[:, 0] * adj0[:, 1] + w[:, 0] * adj0[:, 2]
    valid = jnp.abs(det) > 1e-18
    inv_det = 1.0 / jnp.where(valid, det, 1.0)

    def plane(adj):
        a = adj[:, 0] * inv_det
        b = adj[:, 1] * inv_det
        c = adj[:, 2] * inv_det - a * cx - b * cy  # un-center
        return a, b, c

    a0, b0, c0 = plane(adj0)
    a1, b1, c1 = plane(adj1)
    a2, b2, c2 = plane(adj2)
    za = a0 * z[:, 0] + a1 * z[:, 1] + a2 * z[:, 2]
    zb = b0 * z[:, 0] + b1 * z[:, 1] + b2 * z[:, 2]
    zc = c0 * z[:, 0] + c1 * z[:, 1] + c2 * z[:, 2]
    planes = jnp.stack(
        [a0, b0, c0, a1, b1, c1, a2, b2, c2, za, zb, zc], axis=-1
    )
    # poison invalid planes so they can never cover
    planes = jnp.where(valid[:, None], planes, 0.0)
    planes = planes.at[:, 2].set(jnp.where(valid, planes[:, 2], -1.0))
    # Conservative screen bbox, valid for any w signs: hull of the projected
    # w > eps vertices plus, for edges crossing w = eps, the projection of the
    # crossing point (as w -> 0+ the visible region extends toward that
    # point's direction; projecting AT w = eps bounds it conservatively).
    # Fully-behind triangles (no w > eps) get an empty bbox.
    eps = 1e-6
    big = jnp.float32(3.0e38)
    in_front = w > eps
    bxmin = jnp.min(jnp.where(in_front, sx, big), axis=-1)
    bxmax = jnp.max(jnp.where(in_front, sx, -big), axis=-1)
    bymin = jnp.min(jnp.where(in_front, sy, big), axis=-1)
    bymax = jnp.max(jnp.where(in_front, sy, -big), axis=-1)
    for i, j in ((0, 1), (1, 2), (2, 0)):
        crosses = in_front[:, i] ^ in_front[:, j]
        dw = w[:, j] - w[:, i]
        tt = (eps - w[:, i]) / jnp.where(jnp.abs(dw) > 1e-20, dw, 1.0)
        cxp = (X[:, i] + tt * (X[:, j] - X[:, i])) / eps
        cyp = (Y[:, i] + tt * (Y[:, j] - Y[:, i])) / eps
        bxmin = jnp.where(crosses, jnp.minimum(bxmin, cxp), bxmin)
        bxmax = jnp.where(crosses, jnp.maximum(bxmax, cxp), bxmax)
        bymin = jnp.where(crosses, jnp.minimum(bymin, cyp), bymin)
        bymax = jnp.where(crosses, jnp.maximum(bymax, cyp), bymax)
    bbox = jnp.stack([bxmin, bymin, bxmax, bymax], axis=-1)
    return TriangleSetup(
        planes=planes, sx=sx, sy=sy, bbox=bbox, w_any=w_any, front=det < 0,
        valid=valid,
    )


def _pad_to_multiple(arr, chunk, fill):
    t = arr.shape[0]
    pad = (-t) % chunk
    if pad == 0:
        return arr
    pad_block = jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)
    return jnp.concatenate([arr, pad_block], axis=0)


@partial(
    jax.jit,
    static_argnames=("width", "height", "chunk", "cull_backface", "frag_mask_fn",
                     "depth_compare", "depth_clear"),
)
def rasterize(
    setup: TriangleSetup,
    width: int,
    height: int,
    chunk: int = 64,
    cull_backface: bool = True,
    frag_mask_fn: Callable | None = None,
    depth_compare: str = "greater_equal",
    depth_clear: float = 0.0,
) -> VisibilityBuffer:
    """Rasterize all triangles; returns the visibility buffer.

    frag_mask_fn(tri_ids (C,), wts (C, H, W, 3)) -> (C, H, W) bool: optional
    per-fragment kill mask with perspective-correct vertex weights -- the
    alpha-mask discard of gbuf.frag:27-32 (a discarded fragment exposes
    geometry behind it, so it cannot be done at resolve time).
    """
    t_total = setup.planes.shape[0]
    pl = _pad_to_multiple(setup.planes, chunk, 0.0)
    keep = setup.valid & (setup.front if cull_backface else True)
    vv = _pad_to_multiple(keep, chunk, False)
    n_chunks = pl.shape[0] // chunk

    px = jnp.arange(width, dtype=jnp.float32)[None, None, :] + 0.5
    py = jnp.arange(height, dtype=jnp.float32)[None, :, None] + 0.5

    def body(carry, c):
        best_z, best_tri, best_b1, best_b2, best_s = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk, axis=0)
        p, val = sl(pl), sl(vv)
        tri_ids = c * chunk + jnp.arange(chunk, dtype=jnp.int32)

        def ev(k):
            return (
                p[:, k, None, None] * px
                + p[:, k + 1, None, None] * py
                + p[:, k + 2, None, None]
            )

        l0 = ev(0)
        l1 = ev(3)
        l2 = ev(6)
        z_px = ev(9)
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
        inside &= (z_px >= 0.0) & (z_px <= 1.0)
        inside &= val[:, None, None] & (tri_ids < t_total)[:, None, None]

        if frag_mask_fn is not None:
            s = l0 + l1 + l2
            inv = 1.0 / jnp.where(jnp.abs(s) > 1e-12, s, 1.0)
            wts = jnp.stack([l0 * inv, l1 * inv, l2 * inv], axis=-1)
            inside &= frag_mask_fn(tri_ids, wts)

        # Depth compare per config.raster_state (the reference presets:
        # reverse-Z GREATER_OR_EQUAL everywhere, vulkan_pipeline_presets.h:40).
        # Later triangle wins ties.  Merge in submission order with static
        # slices -- argmax + take_along_axis compiles to gathers, which are
        # pathologically slow on TPU.
        for j in range(chunk):
            if depth_compare == "greater_equal":
                passes = z_px[j] >= best_z
            elif depth_compare == "less_equal":
                passes = z_px[j] <= best_z
            elif depth_compare == "always":
                passes = jnp.ones_like(best_z, bool)
            else:
                raise ValueError(f"unknown depth_compare {depth_compare!r}")
            better = inside[j] & passes
            best_z = jnp.where(better, z_px[j], best_z)
            best_tri = jnp.where(better, tri_ids[j], best_tri)
            best_b1 = jnp.where(better, l1[j], best_b1)
            best_b2 = jnp.where(better, l2[j], best_b2)
            best_s = jnp.where(better, l0[j] + l1[j] + l2[j], best_s)
        return (best_z, best_tri, best_b1, best_b2, best_s), None

    init = (
        jnp.full((height, width), depth_clear, jnp.float32),
        jnp.full((height, width), -1, jnp.int32),
        jnp.zeros((height, width), jnp.float32),
        jnp.zeros((height, width), jnp.float32),
        jnp.ones((height, width), jnp.float32),
    )
    (bz, bt, b1, b2, bs), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return VisibilityBuffer(
        tri_id=bt, depth=bz, bary=jnp.stack([b1, b2, bs], axis=-1)
    )
