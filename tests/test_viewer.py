"""Live viewer (runtime/viewer.py) endpoint tests — the TPU stand-in for the
reference's ImGui layer (user_interface.cpp:81-159): frame streaming, live
settings toggles with deferred rebuild, camera fly controls, and the
debug-resource dropdown."""
import json
import urllib.request

import numpy as np


def test_viewer_endpoints():
    from vulkanhybridrenderer_tpu.core.config import RenderConfig
    from vulkanhybridrenderer_tpu.runtime import viewer
    from vulkanhybridrenderer_tpu.scene import procedural

    cfg = RenderConfig(width=96, height=64, shadow_map_size=64)
    httpd, state = viewer.serve(
        procedural.cornell_box(), cfg, path="forward", port=0, block=False
    )
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        page = urllib.request.urlopen(base + "/").read()
        assert b"vulkanhybridrenderer_tpu" in page

        r = urllib.request.urlopen(base + "/frame?keys=&dx=0&dy=0&drag=0")
        png1 = r.read()
        meta = json.loads(r.headers["x-meta"])
        assert png1[:8] == b"\x89PNG\r\n\x1a\n"
        assert "RENDER_OUTPUT" in meta["state"]["resources"]

        # camera moves -> frame changes
        pos0 = state.renderer.scene.camera.position.copy()
        urllib.request.urlopen(base + "/frame?keys=w&dx=0&dy=0&drag=0").read()
        assert not np.allclose(state.renderer.scene.camera.position, pos0)

        # live settings toggle cycles the mode
        s = json.loads(urllib.request.urlopen(base + "/toggle?k=ao").read())
        assert s["ao"] == "ssao"

        # path switch + debug-resource selection
        urllib.request.urlopen(base + "/set?path=hybrid").read()
        urllib.request.urlopen(base + "/set?resource=Depth").read()
        r = urllib.request.urlopen(base + "/frame?keys=&dx=0&dy=0&drag=0")
        assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
        assert state.renderer.path_name == "hybrid"

        # parameter sliders (reference hybrid_render_path.cpp:423-432 ImGui
        # sliders + the rt_scale knob): values land in the static config and
        # are reported back for UI sync
        urllib.request.urlopen(base + "/set?param=ssao_radius&value=1.5").read()
        urllib.request.urlopen(
            base + "/set?param=ssr_bsearch_steps&value=9"
        ).read()
        urllib.request.urlopen(base + "/set?param=rt_scale&value=2").read()
        s = state.renderer.config.hybrid
        assert s.ssao.radius == 1.5
        assert s.ssr.bsearch_steps == 9
        assert s.rt_scale == 2
        meta = json.loads(
            urllib.request.urlopen(base + "/toggle?k=denoise").read()
        )
        assert meta["params"]["ssao_radius"] == 1.5
        assert meta["params"]["rt_scale"] == 2

        # per-path toggles from the other paths' ImGui panels: forward MSAA
        # (forward_raster_render_path.cpp:100-106) and raytraced alpha test
        # (raytraced_render_path.cpp:80-86)
        s2 = json.loads(urllib.request.urlopen(base + "/toggle?k=msaa").read())
        assert s2["msaa"] == "4x"
        assert state.renderer.config.forward.msaa_samples == 4
        s2 = json.loads(
            urllib.request.urlopen(base + "/toggle?k=test_alpha").read()
        )
        assert s2["test_alpha"] == "on"
        assert state.renderer.config.raytraced.test_alpha
        # a frame still renders under the new static config (deferred rebuild)
        urllib.request.urlopen(base + "/set?resource=").read()
        r = urllib.request.urlopen(base + "/frame?keys=&dx=0&dy=0&drag=0")
        assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        httpd.shutdown()
