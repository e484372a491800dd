"""ctypes bridge to the native C++ components (native/libvhr_native.so).

The reference's runtime is C++ end-to-end; here the host-side pieces that benefit
from native code live in native/ (currently the LBVH builder, the counterpart of
the reference's host-driven BLAS/TLAS build at scene load).  The bridge
auto-compiles the library on first use (g++ is in the image) and every entry point
has a pure-JAX fallback, so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libvhr_native.so"
_lib = None
_lib_failed = False


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        srcs = [p for p in _NATIVE_DIR.glob("*.cpp")]
        if not _LIB_PATH.exists() or any(
            _LIB_PATH.stat().st_mtime < s.stat().st_mtime for s in srcs
        ):
            subprocess.run(
                ["make", "-s", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.lbvh_build.restype = ctypes.c_int
        lib.lbvh_build.argtypes = [f32p, ctypes.c_int] + [i32p] * 5 + [f32p] * 2
        lib.lbvh_refit.restype = ctypes.c_int
        lib.lbvh_refit.argtypes = [f32p, ctypes.c_int, i32p, i32p, i32p, f32p, f32p]
        lib.sah_build.restype = ctypes.c_int
        lib.sah_build.argtypes = [f32p, ctypes.c_int] + [i32p] * 5 + [f32p] * 2
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.bvh8_collapse.restype = ctypes.c_int
        lib.bvh8_collapse.argtypes = [
            f32p, ctypes.c_int, i32p, i32p, i32p, i32p, f32p, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, i32p, u8p, i32p, ctypes.c_int, i32p,
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_bvh_host(tri_verts):
    """Host LBVH build via the native library; returns an ops.bvh.BVH pytree.

    tri_verts: (T, 3, 3) array-like.  Falls back to the device builder when the
    native library is unavailable.
    """
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops

    lib = _load()
    tris = np.ascontiguousarray(np.asarray(tri_verts, np.float32)).reshape(-1, 9)
    n = tris.shape[0]
    if lib is None or n == 0:
        import jax.numpy as jnp

        return bvh_ops.build(jnp.asarray(tri_verts))
    total = 2 * n - 1
    left = np.empty(total, np.int32)
    right = np.empty(total, np.int32)
    escape = np.empty(total, np.int32)
    leaf_tri = np.empty(total, np.int32)
    order = np.empty(n, np.int32)
    amin = np.empty((total, 3), np.float32)
    amax = np.empty((total, 3), np.float32)
    rc = lib.lbvh_build(
        _f32p(tris), n, _i32p(left), _i32p(right), _i32p(escape), _i32p(leaf_tri),
        _i32p(order), _f32p(amin), _f32p(amax),
    )
    if rc != 0:
        raise RuntimeError(f"lbvh_build failed with code {rc}")
    import jax.numpy as jnp

    # convert the C++ builder's leaf triangle ids to order-start-index semantics
    # (BVH.leaf_tri; for leaf_size == 1 the start index is the sorted position)
    num_internal = n - 1
    node_ids = np.arange(total, dtype=np.int32)
    leaf_start = np.where(leaf_tri >= 0, node_ids - num_internal, -1).astype(np.int32)

    bvh = bvh_ops.BVH(
        aabb_min=jnp.asarray(amin),
        aabb_max=jnp.asarray(amax),
        left=jnp.asarray(left),
        right=jnp.asarray(right),
        escape=jnp.asarray(escape),
        leaf_tri=jnp.asarray(leaf_start),
        order=jnp.asarray(order),
        leaf_size=1,
    )
    # ordered-traversal octant links (ops/bvh._octant_links) are derived on device
    return bvh_ops.with_octant_links(bvh)


def build_sah_host(tri_verts):
    """Host binned-SAH build (native/sah.cpp); returns an ops.bvh.BVH pytree.

    Higher tree quality than the LBVH (shorter expected traversal paths) — the
    TPU-side counterpart of the driver's PREFER_FAST_TRACE acceleration-structure
    build (resource_manager.cpp:652).  Static scenes only (refit still works, but
    animated scenes should rebuild via the in-jit LBVH).  Falls back to the LBVH
    when the native library is unavailable.
    """
    from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops

    lib = _load()
    tris = np.ascontiguousarray(np.asarray(tri_verts, np.float32)).reshape(-1, 9)
    n = tris.shape[0]
    if lib is None or n == 0:
        import jax.numpy as jnp

        return bvh_ops.build(jnp.asarray(tri_verts))
    total = 2 * n - 1
    left = np.empty(total, np.int32)
    right = np.empty(total, np.int32)
    escape = np.empty(total, np.int32)
    leaf_tri = np.empty(total, np.int32)
    order = np.empty(n, np.int32)
    amin = np.empty((total, 3), np.float32)
    amax = np.empty((total, 3), np.float32)
    rc = lib.sah_build(
        _f32p(tris), n, _i32p(left), _i32p(right), _i32p(escape), _i32p(leaf_tri),
        _i32p(order), _f32p(amin), _f32p(amax),
    )
    if rc != 0:
        raise RuntimeError(f"sah_build failed with code {rc}")
    import jax.numpy as jnp

    bvh = bvh_ops.BVH(
        aabb_min=jnp.asarray(amin),
        aabb_max=jnp.asarray(amax),
        left=jnp.asarray(left),
        right=jnp.asarray(right),
        escape=jnp.asarray(escape),
        leaf_tri=jnp.asarray(leaf_tri),
        order=jnp.asarray(order),
        leaf_size=1,
    )
    return bvh_ops.with_octant_links(bvh)


def bvh8_collapse_host(bvh, tri_verts, leaf_max: int = 8):
    """Native BVH8 collapse (native/bvh8.cpp) of a binary BVH pytree; bit-
    identical to ops/bvh8.build_bvh8_host's Python collapse (tested).  Returns
    None when the native library is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    import ctypes as ct

    import jax.numpy as jnp

    from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops

    tris = np.ascontiguousarray(np.asarray(tri_verts, np.float32)).reshape(-1, 9)
    left = np.ascontiguousarray(np.asarray(bvh.left, np.int32))
    right = np.ascontiguousarray(np.asarray(bvh.right, np.int32))
    leaf_tri = np.ascontiguousarray(np.asarray(bvh.leaf_tri, np.int32))
    order = np.ascontiguousarray(np.asarray(bvh.order, np.int32))
    amin = np.ascontiguousarray(np.asarray(bvh.aabb_min, np.float32))
    amax = np.ascontiguousarray(np.asarray(bvh.aabb_max, np.float32))
    total = left.shape[0]
    t = tris.shape[0]
    cap = 2 * max(t, 8) + 16
    rows = np.zeros((cap, 128), np.float32)
    child8 = np.zeros((cap, 8), np.int32)
    valid8 = np.zeros((cap, 8), np.uint8)
    tri8 = np.zeros((cap, leaf_max), np.int32)
    out = np.zeros(2, np.int32)
    rc = lib.bvh8_collapse(
        _f32p(tris), t, _i32p(left), _i32p(right), _i32p(leaf_tri),
        _i32p(order), _f32p(amin), _f32p(amax), total, int(bvh.leaf_size),
        int(bvh.root), leaf_max, _f32p(rows),
        _i32p(child8), valid8.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        _i32p(tri8), cap, _i32p(out),
    )
    if rc != 0:
        raise RuntimeError(f"bvh8_collapse failed with code {rc}")
    n_rows, depth = int(out[0]), int(out[1])
    return bvh8_ops.BVH8(
        rows=jnp.asarray(rows[:n_rows]),
        child8=jnp.asarray(child8[:n_rows]),
        valid8=jnp.asarray(valid8[:n_rows].astype(bool)),
        tri8=jnp.asarray(tri8[:n_rows]),
        depth=depth,
        leaf_max=leaf_max,
    )
