"""Dump the REAL full-hybrid AO wavefront (origins/dirs/tmax from the rendered
1080p SponzaProxy G-buffer, identical RNG draw order to ops/raygen.py) to
/tmp/ao_rays.npz for the CPU packet-union simulator (sim_packet_union.py)."""
import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np


def main():
    from vulkanhybridrenderer_tpu.core.config import (
        HybridSettings, RenderConfig, ShadowMode,
    )
    from vulkanhybridrenderer_tpu.ops import raygen, screen
    from vulkanhybridrenderer_tpu.ops.sampling import (
        to_basis, uniform_sample_cosine_hemisphere,
    )
    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
    from vulkanhybridrenderer_tpu.scene import procedural
    from vulkanhybridrenderer_tpu.utils import rng

    h, w = 1080, 1920
    cfg = RenderConfig(width=w, height=h, alpha_raster="off",
                       hybrid=HybridSettings(shadow_mode=ShadowMode.RAYTRACED))
    r = Renderer(procedural.sponza_proxy(), cfg, path="hybrid")
    pfd = r._make_pfd()
    depth, normal_oid = r.fetch_resource(
        "Depth", "World Space Normals and Object IDs"
    )

    uv = screen.pixel_uv_grid(h, w)
    p_world = screen.position_from_depth(depth, uv, pfd.camera_viewproj_inverse)
    n = normal_oid[:3].transpose(1, 2, 0)
    origin = (p_world + n * 0.1).reshape(-1, 3)
    n_flat = n.reshape(-1, 3)
    state = rng.pixel_seed(w, h, pfd.frame_index)
    for _ in range(2):  # shadow draws first (draw-order parity)
        state, _ = rng.random01(state)
    dirs = []
    for _ in range(2):
        state, r1 = rng.random01(state)
        state, r2 = rng.random01(state)
        u2 = jnp.stack([r1, r2], axis=-1).reshape(-1, 2)
        dirs.append(to_basis(n_flat, uniform_sample_cosine_hemisphere(u2)))
    sky = (depth == 0.0).reshape(-1)
    ao_tmax = jnp.where(sky, -1.0, raygen.AO_TMAX)
    np.savez(
        "/tmp/ao_rays.npz",
        origin=np.asarray(origin, np.float32),
        dir0=np.asarray(dirs[0], np.float32),
        dir1=np.asarray(dirs[1], np.float32),
        tmax=np.asarray(ao_tmax, np.float32),
        h=h, w=w,
    )
    print("wrote /tmp/ao_rays.npz")


if __name__ == "__main__":
    main()
