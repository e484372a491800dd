"""Scripted interactive driving (runtime/app.run_script): the headless
analogue of the reference's ImGui live path/settings switching
(user_interface.cpp:100-126, renderer.cpp:159-181).  Exercises mid-run path
switches, settings rebuilds, camera motion, and compiled-variant caching."""
import numpy as np

from vulkanhybridrenderer_tpu.core.config import RenderConfig
from vulkanhybridrenderer_tpu.runtime.app import main, run_script
from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
from vulkanhybridrenderer_tpu.scene import procedural


def test_script_mode_switches():
    r = Renderer(
        procedural.cornell_box(),
        RenderConfig(width=64, height=64, shadow_map_size=64),
        path="hybrid",
    )
    out = run_script(
        r,
        "frames 1; path forward; frames 1; path hybrid; "
        "set shadows=rasterized ao=ssao; frames 1; "
        "set shadows=raytraced ao=raytraced reflections=raytraced denoise=true; "
        "frames 2; camera w; frames 1",
    )
    img = np.asarray(out)
    assert np.isfinite(img).all() and (img[3] > 0).any()
    # four distinct (path, config) variants were compiled and cached
    assert len(r._frame_fns) == 4
    # switching back to an existing mode must NOT recompile
    run_script(r, "set denoise=false shadows=rasterized ao=ssao "
                  "reflections=off; frames 1")
    assert len(r._frame_fns) == 4


def test_script_via_cli(tmp_path):
    out = tmp_path / "f.png"
    rc = main([
        "--scene", "cornell", "--width", "48", "--height", "48",
        "--shadow-map-size", "64",
        "--script", "frames 1; path forward; frames 1",
        "--out", str(out),
    ])
    assert rc == 0 and out.exists()
