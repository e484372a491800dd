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
