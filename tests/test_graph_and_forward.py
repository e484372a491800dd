import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vulkanhybridrenderer_tpu.graph.render_graph import (
    RENDER_OUTPUT,
    GraphError,
    PassStats,
    RenderGraph,
)
from vulkanhybridrenderer_tpu.core.config import RenderConfig, ForwardSettings
from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
from vulkanhybridrenderer_tpu.scene import procedural


# ---------------------------- graph mechanics ----------------------------------
def test_topo_order_and_pruning():
    g = RenderGraph()
    g.add_pass("a", lambda r: {"A": r["x"] + 1}, inputs=("x",), outputs=("A",))
    g.add_pass("b", lambda r: {"B": r["A"] * 2}, inputs=("A",), outputs=("B",))
    g.add_pass("unused", lambda r: {"U": r["x"]}, inputs=("x",), outputs=("U",))
    g.add_pass(
        "out", lambda r: {RENDER_OUTPUT: r["B"] + r["A"]}, inputs=("B", "A"),
        outputs=(RENDER_OUTPUT,),
    )
    order = g.find_execution_order()
    assert order.index("a") < order.index("b") < order.index("out")
    assert "unused" not in order  # pruned like the reference's backward walk
    res = g.run({"x": jnp.asarray(1.0)})
    assert float(res[RENDER_OUTPUT]) == 6.0


def test_graph_errors():
    g = RenderGraph()
    g.add_pass("a", lambda r: {"A": 1}, inputs=(), outputs=("A",))
    with pytest.raises(GraphError):
        g.add_pass("a", lambda r: {}, inputs=(), outputs=())
    with pytest.raises(GraphError):
        g.find_execution_order()  # no RENDER_OUTPUT writer
    g.add_pass("dup", lambda r: {"A": 2}, inputs=(), outputs=("A",))
    with pytest.raises(GraphError):
        g.writers()


def test_graph_cycle_detection():
    g = RenderGraph()
    g.add_pass("a", lambda r: {"A": r["B"]}, inputs=("B",), outputs=("A",))
    g.add_pass("b", lambda r: {"B": r["A"]}, inputs=("A",), outputs=("B",))
    g.add_pass("o", lambda r: {RENDER_OUTPUT: r["A"]}, inputs=("A",), outputs=(RENDER_OUTPUT,))
    with pytest.raises(GraphError):
        g.find_execution_order()


def test_missing_external_validation():
    g = RenderGraph()
    g.add_pass("o", lambda r: {RENDER_OUTPUT: r["ghost"]}, inputs=("ghost",),
               outputs=(RENDER_OUTPUT,))
    with pytest.raises(GraphError):
        g.run({})


def test_pass_stats_ema():
    s = PassStats()
    s.update({"p": 10.0})
    s.update({"p": 20.0})
    assert abs(s.timings["p"] - (0.95 * 10 + 0.05 * 20)) < 1e-9
    s.update_frame(16.0)
    assert s.fps == pytest.approx(62.5)


# ---------------------------- forward path end-to-end ---------------------------
def _small_config(**kw):
    return RenderConfig(width=96, height=64, shadow_map_size=128, **kw)


def test_forward_path_end_to_end():
    sc = procedural.cornell_box()
    r = Renderer(sc, _small_config(), path="forward")
    img = np.asarray(r.render_frame())
    assert img.shape == (4, 64, 96)
    assert np.isfinite(img).all()
    # interior lit: center pixel nonzero, some colored walls visible
    assert img[:3, 32, 48].max() > 0.01
    # red wall on the left half, green on the right half
    left = img[:3, 32, 12]
    right = img[:3, 32, 83]
    assert left[0] > left[1] and right[1] > right[0]
    # second frame reuses the jitted fn and advances frame_index
    img2 = np.asarray(r.render_frame())
    assert img2.shape == img.shape
    assert r.frame_index == 2


def test_forward_msaa_resolve():
    sc = procedural.cornell_box()
    cfg = _small_config(forward=ForwardSettings(msaa_samples=4))
    r = Renderer(sc, cfg, path="forward")
    img = np.asarray(r.render_frame())
    assert img.shape == (4, 64, 96)
    assert np.isfinite(img).all()


def test_forward_msaa_coverage_semantics():
    """Coverage MSAA (the default, true multisampling semantics): interior
    pixels match the 1-sample render exactly (same fragment, shaded once);
    only edge pixels change, taking coverage-weighted intermediate values
    close to the supersampled reference."""
    sc = procedural.cornell_box()
    base = np.asarray(
        Renderer(sc, _small_config(), path="forward").render_frame()
    )
    cov = np.asarray(
        Renderer(
            sc, _small_config(forward=ForwardSettings(msaa_samples=4)),
            path="forward",
        ).render_frame()
    )
    ss = np.asarray(
        Renderer(
            sc,
            _small_config(
                forward=ForwardSettings(msaa_samples=4,
                                        msaa_mode="supersample")
            ),
            path="forward",
        ).render_frame()
    )
    assert np.isfinite(cov).all()
    differs = ~np.isclose(cov, base, atol=1e-5).all(axis=0)
    # anti-aliasing touches SOME pixels, but only a small edge fraction
    assert 0.0 < differs.mean() < 0.15
    # edge values agree with the supersampled reference closely on average
    assert np.abs(cov - ss).mean() < 0.01


def test_forward_pass_timing_table():
    sc = procedural.cornell_box()
    r = Renderer(sc, _small_config(), path="forward")
    t = r.time_passes(iters=1)
    assert set(t) == {"Geometry", "Depth Prepass", "Forward Pass"}
    assert all(v >= 0 for v in t.values())
    assert "Forward Pass" in r.stats.table()
