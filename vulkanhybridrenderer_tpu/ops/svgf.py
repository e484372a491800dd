"""SVGF spatiotemporal variance-guided denoising of RT shadow + AO.

Two kernels, exactly mirroring the reference:
  * temporal reprojection + moments/variance integration (svgf.comp:16-144)
  * edge-stopping 5x5 a-trous filter with 3x3 Gaussian-filtered variance, 5
    iterations with steps 1,2,4,8,16 and ping-pong (svgf_atrous_filter.comp:17-101,
    loop orchestration hybrid_render_path.cpp:288-329)

Temporal state (shadow/AO history, moments history, previous normals+object ids) is
an explicit pytree carried across frames (core/types.py TemporalState), replacing the
reference's persistent storage images (hybrid_render_path.cpp:245-262) -- donated
into the jitted frame function so the update is in-place on device.

Parity details:
  * reprojection validity: in-bounds, same object id, dot(normals) >= cos(pi/4)
    (svgf.comp:16-39);
  * 2x2 bilinear tap at (coords - motion*size + 0.5), 3x3 unweighted fallback
    (:51-97); alpha = moments_alpha = 0.2 (:105-106);
  * history write: shadow/AO history is the *first* a-trous iteration's output
    (hybrid_render_path.cpp:310-314), moments history is written by the temporal
    kernel (:139-144), prev normals copied after the loop (:321).
  * a-trous: B3-spline 5x5 kernel weights, edge-stop = object-id * normal^128 *
    exp(-|lum_p - lum_q| / (4*sqrt(var_p)+1e-6)); variance filtered with w^2
    (svgf_atrous_filter.comp:40-101); center tap has weight 1 and taps outside the
    image are skipped.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.types import TemporalState
from vulkanhybridrenderer_tpu.ops.filters import gather_2d, shifted
from vulkanhybridrenderer_tpu.utils.math3d import COS_PI_4

ALPHA = 0.2
MOMENTS_ALPHA = 0.2

_ATROUS = np.array(
    [
        [1 / 256, 1 / 64, 3 / 128, 1 / 64, 1 / 256],
        [1 / 64, 1 / 16, 3 / 32, 1 / 16, 1 / 64],
        [3 / 128, 3 / 32, 9 / 64, 3 / 32, 3 / 128],
        [1 / 64, 1 / 16, 3 / 32, 1 / 16, 1 / 64],
        [1 / 256, 1 / 64, 3 / 128, 1 / 64, 1 / 256],
    ],
    np.float32,
)
_GAUSS3 = np.array(
    [[1 / 16, 1 / 8, 1 / 16], [1 / 8, 1 / 4, 1 / 8], [1 / 16, 1 / 8, 1 / 16]],
    np.float32,
)


def temporal(
    normal_oid,  # (4, H, W) current
    motion_mr,  # (4, H, W)
    shadow_ao,  # (4, H, W) raytraced (x = shadow, y = ao)
    state: TemporalState,
):
    """Returns (integrated (4,H,W): shadow, ao, var_s, var_a; new moments history)."""
    _, h, w = normal_oid.shape
    cur_n = normal_oid[:3]
    cur_oid = normal_oid[3]
    cur_shadow = shadow_ao[0]
    cur_ao = shadow_ao[1]
    motion = motion_mr[:2]

    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    # svgf.comp:53: prev = coords - motion * display_size + 0.5
    px = xx - motion[0] * w + 0.5
    py = yy - motion[1] * h + 0.5
    fx = px - jnp.floor(px)
    fy = py - jnp.floor(py)
    ix = jnp.floor(px).astype(jnp.int32)
    iy = jnp.floor(py).astype(jnp.int32)

    weights4 = [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy]
    offsets4 = [(0, 0), (1, 0), (0, 1), (1, 1)]

    # Patch-row reprojection: all 13 taps (2x2 bilinear + 3x3 fallback) lie in
    # the 3x3 neighborhood of the reprojected base pixel, so pre-pack that
    # whole neighborhood — 9 static shifts of the 10-channel history — into
    # one (H*W, 90) row table and fetch it with ONE gather per pixel instead
    # of 13 (gather cost is per-INDEX, docs/PERF_STATUS.md: ~27M indices
    # -> ~2M; the shift packing is pure streaming bandwidth).  Out-of-range
    # taps read shift fill / clamped rows and are masked by `inb` exactly as
    # the per-tap-gather formulation did — bit-identical output.
    from vulkanhybridrenderer_tpu.ops.filters import shifted

    nhist = state.shadow_ao_history.shape[0]
    npack = nhist + 8
    packed_chw = jnp.concatenate(
        [state.shadow_ao_history, state.moments_history,
         state.prev_normal_oid],
        axis=0,
    )  # (npack, H, W)
    offs9 = [(oy, ox) for oy in (-1, 0, 1) for ox in (-1, 0, 1)]
    patch = jnp.concatenate(
        [shifted(packed_chw, oy, ox) for oy, ox in offs9], axis=0
    )  # (9 * npack, H, W)
    flat = patch.reshape(9 * npack, h * w).T  # (H*W, 9 * npack)
    base_lin = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
    rows9 = flat[base_lin]  # (H, W, 9 * npack) — THE gather
    cur_n_hwc = cur_n.transpose(1, 2, 0)
    cur_oid_i = cur_oid.astype(jnp.int32)

    def tap(oy, ox):
        """One fused tap -> (valid, sh_ao (H,W,nhist), mom (H,W,4))."""
        k = offs9.index((oy, ox))
        row = rows9[..., k * npack:(k + 1) * npack]
        sy = iy + oy
        sx = ix + ox
        inb = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
        sh_ao = row[..., :nhist]
        mom = row[..., nhist:nhist + 4]
        pn = row[..., nhist + 4:nhist + 7]
        p_oid = row[..., nhist + 7]
        same_obj = cur_oid_i == p_oid.astype(jnp.int32)
        aligned = jnp.sum(cur_n_hwc * pn, axis=-1) >= COS_PI_4
        return inb & same_obj & aligned, sh_ao, mom

    # ---- 2x2 bilinear (svgf.comp:52-77) -----------------------------------------
    acc_shadow = jnp.zeros((h, w), jnp.float32)
    acc_ao = jnp.zeros((h, w), jnp.float32)
    acc_mom = jnp.zeros((h, w, 4), jnp.float32)
    acc_w = jnp.zeros((h, w), jnp.float32)
    for (ox, oy), wgt in zip(offsets4, weights4):
        valid, sh_ao, mom = tap(oy, ox)
        vw = jnp.where(valid, wgt, 0.0)
        acc_shadow += vw * sh_ao[..., 0]
        acc_ao += vw * sh_ao[..., 1]
        acc_mom += vw[..., None] * mom
        acc_w += vw

    bilinear_ok = acc_w > 1e-6

    # ---- 3x3 fallback (svgf.comp:79-97) -------------------------------------------
    f_shadow = jnp.zeros((h, w), jnp.float32)
    f_ao = jnp.zeros((h, w), jnp.float32)
    f_mom = jnp.zeros((h, w, 4), jnp.float32)
    f_w = jnp.zeros((h, w), jnp.float32)
    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            valid, sh_ao, mom = tap(oy, ox)
            vw = jnp.where(valid, 1.0, 0.0)
            f_shadow += vw * sh_ao[..., 0]
            f_ao += vw * sh_ao[..., 1]
            f_mom += vw[..., None] * mom
            f_w += vw

    use_fallback = ~bilinear_ok
    acc_shadow = jnp.where(use_fallback, f_shadow, acc_shadow)
    acc_ao = jnp.where(use_fallback, f_ao, acc_ao)
    acc_mom = jnp.where(use_fallback[..., None], f_mom, acc_mom)
    acc_w = jnp.where(use_fallback, f_w, acc_w)
    valid = acc_w > 1e-6

    sw = jnp.maximum(acc_w, 1e-12)
    prev_shadow = acc_shadow / sw
    prev_ao = acc_ao / sw
    prev_mom = acc_mom / sw[..., None]

    # ---- moments + integration (svgf.comp:99-137) ------------------------------------
    cur_mom = jnp.stack(
        [cur_shadow, cur_shadow * cur_shadow, cur_ao, cur_ao * cur_ao], axis=-1
    )
    mom = jnp.where(
        valid[..., None],
        prev_mom + (cur_mom - prev_mom) * MOMENTS_ALPHA,
        cur_mom,
    )
    var_s = jnp.maximum(0.0, mom[..., 1] - mom[..., 0] * mom[..., 0])
    var_a = jnp.maximum(0.0, mom[..., 3] - mom[..., 2] * mom[..., 2])
    int_shadow = jnp.where(
        valid, prev_shadow + (cur_shadow - prev_shadow) * ALPHA, cur_shadow
    )
    int_ao = jnp.where(valid, prev_ao + (cur_ao - prev_ao) * ALPHA, cur_ao)

    integrated = jnp.stack([int_shadow, int_ao, var_s, var_a], axis=0)
    new_moments = mom.transpose(2, 0, 1)
    return integrated, new_moments


def atrous_iteration(integrated, normal_oid, step: int):
    """One edge-stopping a-trous iteration (svgf_atrous_filter.comp:56-101).
    integrated: (4, H, W) (shadow, ao, var_s, var_a)."""
    _, h, w = integrated.shape
    n_p = normal_oid[:3]
    oid_p = normal_oid[3]

    # 3x3 gaussian of the variance channels (:17-38) -- skipped taps out of bounds
    var = integrated[2:4]
    var_f = jnp.zeros_like(var)
    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            k = _GAUSS3[oy + 1, ox + 1]
            var_f = var_f + k * shifted(var, oy, ox, fill=0.0)
    # (the reference skips out-of-bounds taps without renormalizing; `shifted`'s
    # zero fill reproduces that)

    p_sh = integrated[0]
    p_ao = integrated[1]

    # center tap contributes with weight 1 (:66-67)
    sum_sh = p_sh
    sum_ao = p_ao
    sum_vs = integrated[2]
    sum_va = integrated[3]
    sum_ws = jnp.ones((h, w), jnp.float32)
    sum_wa = jnp.ones((h, w), jnp.float32)

    sigma_s = 4.0 * jnp.sqrt(var_f[0]) + 1e-6
    sigma_a = 4.0 * jnp.sqrt(var_f[1]) + 1e-6

    for oy in range(-2, 3):
        for ox in range(-2, 3):
            if oy == 0 and ox == 0:
                continue
            dy, dx = oy * step, ox * step
            kern = float(_ATROUS[oy + 2, ox + 2])
            # out-of-bounds taps skipped: mask via in-bounds of the shift
            yy = jnp.arange(h)[:, None] + dy
            xx = jnp.arange(w)[None, :] + dx
            inb = ((yy >= 0) & (yy < h)) & ((xx >= 0) & (xx < w))

            q = shifted(integrated, dy, dx, fill=0.0)
            n_q = shifted(n_p, dy, dx, fill=0.0)
            oid_q = shifted(oid_p, dy, dx, fill=-2.0)

            w_norm = jnp.maximum(0.0, jnp.sum(n_p * n_q, axis=0)) ** 128
            w_oid = (oid_p.astype(jnp.int32) == oid_q.astype(jnp.int32)).astype(
                jnp.float32
            )
            base = kern * w_norm * w_oid * inb
            w_s = base * jnp.exp(-jnp.abs(p_sh - q[0]) / sigma_s)
            w_a = base * jnp.exp(-jnp.abs(p_ao - q[1]) / sigma_a)

            sum_sh += w_s * q[0]
            sum_ao += w_a * q[1]
            sum_vs += w_s * w_s * q[2]
            sum_va += w_a * w_a * q[3]
            sum_ws += w_s
            sum_wa += w_a

    return jnp.stack(
        [
            sum_sh / sum_ws,
            sum_ao / sum_wa,
            sum_vs / (sum_ws * sum_ws),
            sum_va / (sum_wa * sum_wa),
        ],
        axis=0,
    )


def _atrous_iteration_dyn(integrated, normal_oid, step, pad_max: int):
    """atrous_iteration with a TRACED step size — the lax.scan body of
    denoise().  Same math tap-for-tap; the static `shifted` slices become one
    padded copy + lax.dynamic_slice per tap (identical values: both pad with
    the same fill and read the same window).  Compiling the body ONCE instead
    of once per iteration cuts the SVGF share of the frame compile ~5x
    (atrous x5 = 18.9 s of the 50 s 1080p full-hybrid CPU compile; one
    iteration = 4.4 s)."""
    import jax

    _, h, w = integrated.shape
    n_p = normal_oid[:3]
    oid_p = normal_oid[3]

    # 3x3 gaussian of the variance channels: step-independent static shifts
    var = integrated[2:4]
    var_f = jnp.zeros_like(var)
    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            k = _GAUSS3[oy + 1, ox + 1]
            var_f = var_f + k * shifted(var, oy, ox, fill=0.0)

    p_sh = integrated[0]
    p_ao = integrated[1]
    sum_sh = p_sh
    sum_ao = p_ao
    sum_vs = integrated[2]
    sum_va = integrated[3]
    sum_ws = jnp.ones((h, w), jnp.float32)
    sum_wa = jnp.ones((h, w), jnp.float32)
    sigma_s = 4.0 * jnp.sqrt(var_f[0]) + 1e-6
    sigma_a = 4.0 * jnp.sqrt(var_f[1]) + 1e-6

    pm = pad_max
    pi = jnp.pad(integrated, ((0, 0), (pm, pm), (pm, pm)))
    pn = jnp.pad(n_p, ((0, 0), (pm, pm), (pm, pm)))
    po = jnp.pad(oid_p, ((pm, pm), (pm, pm)), constant_values=-2.0)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]

    for oy in range(-2, 3):
        for ox in range(-2, 3):
            if oy == 0 and ox == 0:
                continue
            dy, dx = oy * step, ox * step
            kern = float(_ATROUS[oy + 2, ox + 2])
            inb = (((ys + dy) >= 0) & ((ys + dy) < h)
                   & ((xs + dx) >= 0) & ((xs + dx) < w))
            q = jax.lax.dynamic_slice(pi, (0, pm + dy, pm + dx), (4, h, w))
            n_q = jax.lax.dynamic_slice(pn, (0, pm + dy, pm + dx), (3, h, w))
            oid_q = jax.lax.dynamic_slice(po, (pm + dy, pm + dx), (h, w))

            w_norm = jnp.maximum(0.0, jnp.sum(n_p * n_q, axis=0)) ** 128
            w_oid = (oid_p.astype(jnp.int32) == oid_q.astype(jnp.int32)).astype(
                jnp.float32
            )
            base = kern * w_norm * w_oid * inb
            w_s = base * jnp.exp(-jnp.abs(p_sh - q[0]) / sigma_s)
            w_a = base * jnp.exp(-jnp.abs(p_ao - q[1]) / sigma_a)

            sum_sh += w_s * q[0]
            sum_ao += w_a * q[1]
            sum_vs += w_s * w_s * q[2]
            sum_va += w_a * w_a * q[3]
            sum_ws += w_s
            sum_wa += w_a

    return jnp.stack(
        [
            sum_sh / sum_ws,
            sum_ao / sum_wa,
            sum_vs / (sum_ws * sum_ws),
            sum_va / (sum_wa * sum_wa),
        ],
        axis=0,
    )


def denoise(normal_oid, motion_mr, shadow_ao, state: TemporalState,
            iterations: int = 5):
    """Full SVGF: temporal + `iterations` a-trous steps.

    Returns (denoised shadow/AO (4, H, W), new TemporalState).  Mirrors the pass
    callback orchestration (hybrid_render_path.cpp:288-329): history <- output of
    the first a-trous iteration; prev normals <- this frame's normals.

    The a-trous loop runs as ONE lax.scan over the step schedule (1, 2, 4, ...)
    with a dynamic-step iteration body (_atrous_iteration_dyn) — the body
    compiles once instead of once per iteration, value-identical to the
    unrolled atrous_iteration (tested)."""
    import jax

    integrated, new_moments = temporal(normal_oid, motion_mr, shadow_ao, state)
    if iterations == 0:
        cur, new_history = integrated, integrated[:2]
    else:
        steps = jnp.asarray([1 << i for i in range(iterations)], jnp.int32)
        first = jnp.asarray([i == 0 for i in range(iterations)], bool)
        pad_max = 2 << (iterations - 1)  # 2 * max step

        def body(carry, x):
            cur, hist = carry
            step, is_first = x
            nxt = _atrous_iteration_dyn(cur, normal_oid, step, pad_max)
            hist = jnp.where(is_first, nxt[:2], hist)
            return (nxt, hist), None

        (cur, new_history), _ = jax.lax.scan(
            body, (integrated, integrated[:2]), (steps, first)
        )
    new_state = TemporalState(
        shadow_ao_history=new_history,
        moments_history=new_moments,
        prev_normal_oid=normal_oid,
    )
    return cur, new_state
