"""Persistent XLA compilation cache (VERDICT r3 item 6: compile latency is
this framework's UX tax — the reference rebuilds Vulkan pipelines in
milliseconds, pipeline.cpp, while a 1080p flagship frame compiles in minutes
on the tunneled TPU).

jax's persistent cache stores serialized executables keyed by (platform, HLO
hash): the first process pays the full compile, every later process — driver
bench reruns, viewer restarts, harvest scripts, repeated test runs — reloads
in seconds.  Measured on this box (CPU backend, 192x128 rt-shadows hybrid):
fresh 17.3 s -> warm-process 7.7 s end-to-end.

Enabled on first Renderer construction; opt out with VHR_NO_COMPILE_CACHE=1,
relocate with VHR_COMPILE_CACHE_DIR (default ~/.cache/vhr_jax).  Loading a
CPU cache entry logs a harmless XLA machine-feature notice (the
`prefer-no-scatter/gather` pseudo-features never match the host string);
backends that cannot serialize executables silently skip caching.
"""
from __future__ import annotations

import os

_enabled = False


def enable_compile_cache() -> None:
    """Idempotently point jax at the persistent compilation cache dir."""
    global _enabled
    if _enabled or os.environ.get("VHR_NO_COMPILE_CACHE"):
        return
    _enabled = True
    import jax

    path = os.environ.get(
        "VHR_COMPILE_CACHE_DIR",
        os.path.expanduser("~/.cache/vhr_jax"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default threshold is 1 s: everything that hurts (frame fns, traces)
    # is far above it, tiny test kernels stay out of the cache

    # The cache key strips MLIR debug locations (strip-debuginfo) BUT cannot
    # reach inside the serialized Mosaic module a pallas_call embeds in its
    # tpu_custom_call backend_config — and that payload records the FULL user
    # traceback of the jit call site.  Any frame fn containing a Pallas
    # kernel (the tiled rasterizer) therefore got a different cache key per
    # calling script: bench.py, harvest scripts and the viewer each paid a
    # full recompile of byte-identical programs.  Limiting locations to the
    # primitive frame (inside this package, fixed lines) makes the payload —
    # and the key — call-site independent; verified by lowering the same
    # kernel from two drivers differing only in line numbers.
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
