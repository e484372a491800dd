"""END-TO-END independent oracle (VERDICT-r4 weak #8): a pure-numpy (float64)
renderer of the full-RT path, written only from the REFERENCE shader
semantics (raygen.rgen:11-20, closesthit.rchit:26-67, miss.rmiss:7,
shadow ray :43-57), compared full-frame against the framework's raytraced
path at the BASELINE RMSE bar (2e-3).

Unlike the per-pass analytic suite (tests/test_analytic.py) and the
CPU-pinned goldens (which pin the repo's own output), this exercises the
whole pipeline — camera math, BVH build + traversal, hit attributes,
shading, composition — against an implementation that shares NO code with
the production path (brute-force numpy intersection, no shade tables, no
tilers, no graph)."""
import numpy as np

from vulkanhybridrenderer_tpu.core.config import RenderConfig
from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
from vulkanhybridrenderer_tpu.scene import procedural

SKY = np.array([0.3, 0.8, 0.2, 1.0])  # miss.rmiss:7
TMIN, TMAX = 0.1, 10000.0


def _intersect_all(o, d, v0, v1, v2, tmin, tbound):
    """Möller-Trumbore of ONE ray against all T triangles (float64).
    Returns (t, bary_u, bary_v, ok) arrays of shape (T,)."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = np.cross(d, e2)
    det = (e1 * p).sum(-1)
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tv = o - v0
    u = (tv * p).sum(-1) * inv
    q = np.cross(tv, e1)
    v = (d * q).sum(-1) * inv
    t = (e2 * q).sum(-1) * inv
    ok &= (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= tmin) & (t < tbound)
    return t, u, v, ok


def _oracle_render(scene, w, h):
    """The raytraced path, from the reference GLSL alone, in numpy f64."""
    buf = scene.buffers
    cam = scene.camera
    view = np.asarray(cam.view(), np.float64)
    proj = np.asarray(cam.projection(aspect=w / h), np.float64)
    view_inv = np.linalg.inv(view)
    proj_inv = np.linalg.inv(proj)

    tv = np.asarray(buf.tri_vertex)
    pos = np.asarray(buf.positions, np.float64)
    nrm = np.asarray(buf.normals, np.float64)
    prim_of_tri = np.asarray(buf.tri_prim)
    # object -> world per primitive (cornell uses per-primitive transforms)
    m = np.asarray(buf.prim_transform, np.float64)  # (P, 4, 4)
    vprim = np.zeros(pos.shape[0], np.int32)
    starts = np.asarray(buf.prim_vertex_offset)
    vprim = np.searchsorted(starts, np.arange(pos.shape[0]), side="right") - 1
    pw = np.einsum("vij,vj->vi", m[vprim][:, :3, :3], pos) + m[vprim][:, :3, 3]
    v0, v1, v2 = pw[tv[:, 0]], pw[tv[:, 1]], pw[tv[:, 2]]
    n0, n1, n2 = nrm[tv[:, 0]], nrm[tv[:, 1]], nrm[tv[:, 2]]

    base_color = np.asarray(buf.materials.base_color, np.float64)
    light = scene.light
    l_dir = -np.asarray(light.direction, np.float64)[:3]
    l_color = np.asarray(light.color, np.float64)[:3]
    l_intensity = np.asarray(light.intensity, np.float64)[:3]

    img = np.zeros((h, w, 4))
    cam_o = view_inv[:3, 3]
    for y in range(h):
        for x in range(w):
            # raygen.rgen:11-18
            uvx = (x + 0.5) / w * 2.0 - 1.0
            uvy = (y + 0.5) / h * 2.0 - 1.0
            target = proj_inv @ np.array([uvx, uvy, 1.0, 1.0])
            dv = target[:3] / np.linalg.norm(target[:3])
            d = view_inv[:3, :3] @ dv

            t, u, v, ok = _intersect_all(cam_o, d, v0, v1, v2, TMIN, TMAX)
            if not ok.any():
                img[y, x] = SKY
                continue
            ti = np.where(ok, t, np.inf).argmin()
            bu, bv = u[ti], v[ti]
            wts = np.array([1.0 - bu - bv, bu, bv])
            p_hit = wts[0] * v0[ti] + wts[1] * v1[ti] + wts[2] * v2[ti]
            # closesthit.rchit: raw interpolated object-space normal (:18)
            n = wts[0] * n0[ti] + wts[1] * n1[ti] + wts[2] * n2[ti]
            albedo = base_color[prim_of_tri[ti]][:3]

            # secondary shadow ray (closesthit.rchit:43-57): origin = hit
            # position, tmin 0.1, anyhit
            _, _, _, sok = _intersect_all(p_hit, l_dir, v0, v1, v2, TMIN,
                                          TMAX)
            lit = not sok.any()
            ndl = max(float(n @ l_dir), 0.0)
            rgb = albedo / np.pi
            if lit:
                rgb = rgb + albedo * ndl * l_intensity * l_color
            img[y, x, :3] = rgb
            img[y, x, 3] = 1.0
    return img.transpose(2, 0, 1)  # (4, H, W)


def test_raytraced_path_matches_numpy_oracle():
    w = h = 64
    scene = procedural.cornell_box()
    r = Renderer(scene, RenderConfig(width=w, height=h), path="raytraced")
    ours = np.asarray(r.render_frame(), np.float64)
    ref = _oracle_render(scene, w, h)

    # edge pixels may resolve to a different (equally valid) closest triangle
    # under f32 vs f64 — bound their share, then demand the BASELINE RMSE on
    # the full frame
    diff = np.abs(ours - ref).max(axis=0)
    assert (diff > 0.05).mean() < 0.01, "too many mismatched pixels"
    rmse = float(np.sqrt(((ours - ref) ** 2).mean()))
    assert rmse <= 2e-3, f"end-to-end RMSE vs independent oracle: {rmse}"
