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
    finally:
        httpd.shutdown()
