"""Persistent-compile-cache regression tests.

The load-bearing property: a frame function containing a Pallas kernel must
produce a call-site-independent serialized Mosaic payload, or the XLA
persistent cache re-keys (and recompiles) per calling script.  XLA's cache
key strips MLIR debug locations, but it cannot reach inside the serialized
module a `pallas_call` embeds in its tpu_custom_call `backend_config` —
which, with `jax_include_full_tracebacks_in_locations=True` (jax's default),
records the full user traceback of the jit call site.
`enable_compile_cache` therefore turns that flag off; these tests pin both
the fix and the failure mode it guards against.
"""
import hashlib
import re
import textwrap
import types

import jax
import jax.numpy as jnp
import pytest

_KERNEL_MODULE = textwrap.dedent(
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    def f(x):
        return pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    """
)

_DRIVER = textwrap.dedent(
    """
    import jax
    import jax.numpy as jnp
    from jax import export

    def lower(kernel_mod):
        # AOT cross-platform lowering: embeds the serialized Mosaic payload
        # without needing a live TPU device (the suite is CPU-pinned).
        x = jnp.ones((256, 256), jnp.float32)
        return export.export(jax.jit(kernel_mod.f), platforms=["tpu"])(x)
    """
)


def _exec_module(name, src):
    mod = types.ModuleType(name)
    mod.__file__ = f"<{name}>"
    exec(compile(src, f"<{name}>", "exec"), mod.__dict__)
    return mod


def _payload_hash(line_pad):
    """Lower the SAME pallas fn from a driver whose call site sits at a
    different line number, and hash every custom-call backend_config."""
    kernel_mod = _exec_module("cc_kernel_mod", _KERNEL_MODULE)
    driver = _exec_module(f"cc_driver_{line_pad}", "\n" * line_pad + _DRIVER)
    text = driver.lower(kernel_mod).mlir_module()
    cfgs = re.findall(r'backend_config = "([^"]*)"', text)
    assert cfgs, "expected a serialized Mosaic payload in the lowering"
    return hashlib.sha256("".join(cfgs).encode()).hexdigest()


@pytest.fixture
def _traceback_flag():
    old = jax.config.jax_include_full_tracebacks_in_locations
    yield
    jax.config.update("jax_include_full_tracebacks_in_locations", old)


def test_pallas_payload_call_site_independent(_traceback_flag):
    """With the enable_compile_cache setting, byte-identical programs jitted
    from different scripts share one cache entry."""
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    assert _payload_hash(0) == _payload_hash(37)


def test_pallas_payload_depends_on_call_site_without_fix(_traceback_flag):
    """The failure mode being guarded: full tracebacks leak the call site
    into the Mosaic payload (and thus the cache key).  If this ever starts
    passing with equal hashes, jax fixed it upstream and the config override
    in enable_compile_cache can be retired."""
    jax.config.update("jax_include_full_tracebacks_in_locations", True)
    assert _payload_hash(0) != _payload_hash(37)


def test_enable_compile_cache_sets_flags(tmp_path, monkeypatch):
    import vulkanhybridrenderer_tpu.utils.compile_cache as cc

    monkeypatch.setattr(cc, "_enabled", False)
    monkeypatch.setenv("VHR_COMPILE_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.delenv("VHR_NO_COMPILE_CACHE", raising=False)
    old_dir = jax.config.jax_compilation_cache_dir
    old_tb = jax.config.jax_include_full_tracebacks_in_locations
    try:
        cc.enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")
        assert jax.config.jax_include_full_tracebacks_in_locations is False
        assert (tmp_path / "cache").is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_include_full_tracebacks_in_locations", old_tb)
