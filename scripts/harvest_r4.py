"""Round-4 measurement harvest: every VERDICT-r3-demanded number in ONE
process, priority-ordered so a mid-run tunnel outage still lands the top
rows.  Each case appends a JSON line to docs/HARVEST_r4.jsonl the moment it
finishes (results survive any crash).

Cases (priority order):
  1. rt-shadows Sponza 1080p          (headline, BASELINE config 2)
  2. full hybrid Sponza 1080p         (BASELINE config 3, round-3 rewire check)
  3. full hybrid Sponza rt_scale=2    (half-res RT + upsample)
  4. rt-shadows Sponza rt_scale=2
  5. rt-shadows Cornell 74 tris       (frame floor)
  6. rt-shadows BistroProxy 434k      (VMEM-cliff claim, BASELINE config ~4)
  7. rt-shadows realglb 253k          (full GLB loader asset, config 3/5 scale)
  8. pica animated full (refit+SVGF)  (BASELINE config 5)

Run: python scripts/harvest_r4.py [first_case] [last_case]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = "/root/repo/docs/HARVEST_r4.jsonl"


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

    def cfg(hs, animated=False):
        return RenderConfig(width=1920, height=1080, hybrid=hs,
                            alpha_raster="off", animated=animated)

    sponza = None
    if first <= 4:
        sponza = procedural.sponza_proxy()
    cases = {
        1: lambda: run_case("rt-shadows sponza", sponza, cfg(rt())),
        2: lambda: run_case("full sponza", sponza, cfg(full())),
        3: lambda: run_case("full sponza rt_scale=2", sponza, cfg(full(2))),
        4: lambda: run_case("rt-shadows sponza rt_scale=2", sponza,
                            cfg(rt(2))),
        5: lambda: run_case("rt-shadows cornell", procedural.cornell_box(),
                            cfg(rt())),
        6: lambda: run_case("rt-shadows bistro", procedural.bistro_proxy(),
                            cfg(rt())),
        7: lambda: _realglb(cfg(rt())),
        8: lambda: _pica(cfg(full(), animated=True)),
    }

    def _realglb(c):
        from vulkanhybridrenderer_tpu.scene import gltf, sample_asset

        glb = "/tmp/vhr_sponza_class.glb"
        if not os.path.exists(glb):
            sample_asset.build_sponza_class_glb(glb)
        run_case("rt-shadows realglb", gltf.load_scene(glb), c)

    def _pica(c):
        sc = procedural.pica_proxy()
        run_case("pica animated full", sc, c, frames=6,
                 animate=lambda t: procedural.animate_pica(sc, t))

    cases[7] = lambda: _realglb(cfg(rt()))
    cases[8] = lambda: _pica(cfg(full(), animated=True))

    for i in sorted(cases):
        if not (first <= i <= last):
            continue
        try:
            cases[i]()
        except Exception as e:  # keep harvesting later cases
            emit({"case": f"case{i}", "error": repr(e)[:300]})


if __name__ == "__main__":
    main()
