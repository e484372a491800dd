"""Full benchmark matrix in one process (PERF_STATUS refresh): every
BASELINE.md config on the real TPU, pipelined min-of-batches like bench.py."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def run_case(label, scene, cfg, frames=12, animate=None):
    import jax

    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer

    r = Renderer(scene, cfg, path="hybrid")
    t_c0 = time.perf_counter()
    if animate is not None:
        r.animate(animate(0.0))
    out = r.render_frame(srgb8=True)
    np.asarray(out)
    compile_s = time.perf_counter() - t_c0
    out = r.render_frame(srgb8=True)
    np.asarray(out)
    batch = max(1, frames // 3)
    best = float("inf")
    for b in range(3):
        t0 = time.perf_counter()
        for i in range(batch):
            if animate is not None:
                r.animate(animate(0.1 * (b * batch + i)))
            out = r.render_frame(sync=False, srgb8=True)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / batch)
    print(f"{label:<44} {best:9.1f} ms/frame   (compile+first {compile_s:.0f}s)")
    sys.stdout.flush()
    del r


def main():
    from vulkanhybridrenderer_tpu.core.config import (
        AmbientOcclusionMode, HybridSettings, ReflectionMode, RenderConfig,
        ShadowMode,
    )
    from vulkanhybridrenderer_tpu.scene import procedural

    rt = HybridSettings(shadow_mode=ShadowMode.RAYTRACED)
    full = HybridSettings(
        shadow_mode=ShadowMode.RAYTRACED,
        ao_mode=AmbientOcclusionMode.RAYTRACED,
        reflection_mode=ReflectionMode.RAYTRACED,
        denoise=True,
    )
    raster = HybridSettings(
        shadow_mode=ShadowMode.RASTERIZED, ao_mode=AmbientOcclusionMode.SSAO
    )

    def cfg(hs, animated=False):
        return RenderConfig(width=1920, height=1080, hybrid=hs,
                            alpha_raster="off", animated=animated)

    sponza = procedural.sponza_proxy()
    which = sys.argv[1:] or ["rt", "full", "raster", "cornell", "bistro",
                             "realglb", "pica"]
    if "rt" in which:
        run_case("sponza rt-shadows", sponza, cfg(rt))
    if "full" in which:
        run_case("sponza FULL hybrid (sh+AO+refl+SVGF)", sponza, cfg(full))
    if "raster" in which:
        run_case("sponza raster (shadow map + SSAO)", sponza, cfg(raster))
    if "cornell" in which:
        run_case("cornell rt-shadows", procedural.cornell_box(), cfg(rt))
    if "bistro" in which:
        run_case("bistro rt-shadows (434k tris)",
                 procedural.bistro_proxy(), cfg(rt))
    if "realglb" in which:
        import os

        from vulkanhybridrenderer_tpu.scene import gltf, sample_asset

        glb = "/tmp/vhr_sponza_class.glb"
        if not os.path.exists(glb):
            sample_asset.build_sponza_class_glb(glb)
        real = gltf.load_scene(glb)
        c = cfg(rt)
        run_case(f"realglb rt-shadows ({real.buffers.num_triangles} tris, "
                 f"{real.buffers.atlas.num_textures} tex)", real, c)
    if "pica" in which:
        pica = procedural.pica_proxy()
        run_case(
            "pica ANIMATED sh+AO+SVGF (refit/frame)", pica,
            RenderConfig(
                width=1920, height=1080, animated=True, alpha_raster="off",
                hybrid=HybridSettings(
                    shadow_mode=ShadowMode.RAYTRACED,
                    ao_mode=AmbientOcclusionMode.RAYTRACED,
                    denoise=True,
                ),
            ),
            animate=lambda t: procedural.animate_pica(pica, t),
        )


if __name__ == "__main__":
    main()
