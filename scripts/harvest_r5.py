"""Round-5 measurement harvest: the full config matrix after the round-5
perf work (quad-atlas resolve, prim-folded TriRows, pool-chunked BVH8
packing, binned alpha peel, single-gather geometry), ONE process,
priority-ordered; each case appends a JSON line to docs/HARVEST_r5.jsonl
the moment it finishes.

Cases (priority order):
  1. FLAGSHIP: full hybrid realglb 1080p, alpha=brute  (BENCH parity row)
  2. full hybrid Sponza 1080p (alpha off: r4-comparable; r4 = 1153.9 ms)
  3. rt-shadows Sponza 1080p   (headline series; r4 = 156.7)
  4. rt-shadows realglb        (r4 = 451.6; VMEM-cliff + resolve work)
  5. rt-shadows Bistro 434k    (r4 = 369.2; bar = 2x Sponza)
  6. rt-shadows Cornell 74     (frame floor; r4 = 71.1)
  7. full hybrid Sponza rt_scale=2  (r4 = 627.5)
  8. pica animated full        (r4 = 769.2)

Run: python scripts/harvest_r5.py [first_case] [last_case]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = "/root/repo/docs/HARVEST_r5.jsonl"


def emit(row):
    row["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("HARVEST", json.dumps(row))
    sys.stdout.flush()


def run_case(label, scene, cfg, frames=12, animate=None):
    import jax

    from vulkanhybridrenderer_tpu.runtime.renderer import Renderer

    t_c0 = time.perf_counter()
    r = Renderer(scene, cfg, path="hybrid")
    if animate is not None:
        r.animate(animate(0.0))
    lin = np.asarray(r.render_frame())
    compile_s = time.perf_counter() - t_c0
    finite = bool(np.isfinite(lin).all())
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
        # scalar sync: all frames complete on device, readback untimed
        np.asarray(jax.numpy.max(out))
        best = min(best, (time.perf_counter() - t0) * 1e3 / batch)
    emit({"case": label, "ms_frame": round(best, 1),
          "compile_first_s": round(compile_s, 1), "finite": finite,
          "tris": int(scene.buffers.num_triangles)})
    del r


def main():
    from vulkanhybridrenderer_tpu.core.config import (
        AmbientOcclusionMode, HybridSettings, ReflectionMode, RenderConfig,
        ShadowMode,
    )
    from vulkanhybridrenderer_tpu.scene import procedural

    first = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    last = int(sys.argv[2]) if len(sys.argv) > 2 else 99

    def rt(scale=1):
        return HybridSettings(shadow_mode=ShadowMode.RAYTRACED, rt_scale=scale)

    def full(scale=1):
        return HybridSettings(
            shadow_mode=ShadowMode.RAYTRACED,
            ao_mode=AmbientOcclusionMode.RAYTRACED,
            reflection_mode=ReflectionMode.RAYTRACED,
            denoise=True, rt_scale=scale,
        )

    def cfg(hs, animated=False, alpha="off"):
        return RenderConfig(width=1920, height=1080, hybrid=hs,
                            alpha_raster=alpha, animated=animated)

    def realglb_scene():
        from vulkanhybridrenderer_tpu.scene import gltf, sample_asset

        glb = "/tmp/vhr_sponza_class.glb"
        if not os.path.exists(glb):
            sample_asset.build_sponza_class_glb(glb)
        return gltf.load_scene(glb)

    def _pica(c):
        sc = procedural.pica_proxy()
        run_case("pica animated full", sc, c, frames=6,
                 animate=lambda t: procedural.animate_pica(sc, t))

    sponza = procedural.sponza_proxy() if first <= 7 else None
    cases = {
        1: lambda: run_case("FLAGSHIP full realglb alpha=brute",
                            realglb_scene(), cfg(full(), alpha="brute"),
                            frames=9),
        2: lambda: run_case("full sponza", sponza, cfg(full())),
        3: lambda: run_case("rt-shadows sponza", sponza, cfg(rt())),
        4: lambda: run_case("rt-shadows realglb", realglb_scene(), cfg(rt())),
        5: lambda: run_case("rt-shadows bistro", procedural.bistro_proxy(),
                            cfg(rt())),
        6: lambda: run_case("rt-shadows cornell", procedural.cornell_box(),
                            cfg(rt())),
        7: lambda: run_case("full sponza rt_scale=2", sponza, cfg(full(2))),
        8: lambda: _pica(cfg(full(), animated=True)),
    }

    for i in sorted(cases):
        if not (first <= i <= last):
            continue
        try:
            cases[i]()
        except Exception as e:  # keep harvesting later cases
            emit({"case": f"case{i}", "error": repr(e)[:300]})


if __name__ == "__main__":
    main()
