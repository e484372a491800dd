import numpy as np
import jax
import pytest

from vulkanhybridrenderer_tpu.core.config import (
    AmbientOcclusionMode,
    HybridSettings,
    RenderConfig,
    ShadowMode,
)
from vulkanhybridrenderer_tpu.parallel.mesh import make_mesh
from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
from vulkanhybridrenderer_tpu.scene import procedural


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_frame_matches_single_device():
    sc = procedural.cornell_box()
    cfg = RenderConfig(
        width=96, height=64, shadow_map_size=128,
        hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED,
                              ao_mode=AmbientOcclusionMode.RAYTRACED),
    )
    img_single = np.asarray(Renderer(sc, cfg, path="hybrid").render_frame())
    mesh = make_mesh(jax.devices()[:8])
    img_mesh = np.asarray(Renderer(sc, cfg, path="hybrid", mesh=mesh).render_frame())
    # sharding must not change the result (pure data-parallel + XLA halo exchange)
    np.testing.assert_allclose(img_mesh, img_single, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    img = np.asarray(out["RENDER_OUTPUT"])
    assert np.isfinite(img).all()
