"""Host application shell (reference main.cpp + user_interface.cpp, TPU-native).

The reference opens a Win32 window with an ImGui overlay; the TPU renderer is
headless, so the app shell is a CLI driving the same capabilities:

  * scene loading (glTF file or named procedural scene)
  * render-path selection + per-path settings (the ImGui menus,
    user_interface.cpp:100-159) via flags / JSON config
  * frame loop with scripted camera motion (WASD-equivalent)
  * per-pass performance statistics table (render_graph.cpp:203-220)
  * debug dump of any named graph resource (the debug-texture viewer,
    user_interface.cpp:129-150)
  * checkpoint save/restore of camera + settings + temporal state

Run:  python -m vulkanhybridrenderer_tpu.runtime.app --scene sponza --path hybrid
      --frames 60 --out out.png --stats
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

from vulkanhybridrenderer_tpu.core.config import (
    AmbientOcclusionMode,
    HybridSettings,
    ReflectionMode,
    RenderConfig,
    ShadowMode,
    SSAOSettings,
    SSRSettings,
    ForwardSettings,
    RaytracedSettings,
)
from vulkanhybridrenderer_tpu.runtime.renderer import Renderer
from vulkanhybridrenderer_tpu.scene import gltf, procedural

PROCEDURAL_SCENES = {
    "cornell": procedural.cornell_box,
    "checker": procedural.checker_quad,
    "sponza": procedural.sponza_proxy,
    "pica": procedural.pica_proxy,
}


def load_any_scene(name: str) -> gltf.Scene:
    if name in PROCEDURAL_SCENES:
        return PROCEDURAL_SCENES[name]()
    return gltf.load_scene(name)


def config_from_args(args) -> RenderConfig:
    hybrid = HybridSettings(
        shadow_mode=ShadowMode[args.shadows.upper()],
        ao_mode=AmbientOcclusionMode[args.ao.upper()],
        reflection_mode=ReflectionMode[args.reflections.upper()],
        denoise=args.denoise,
        ssao=SSAOSettings(radius=args.ssao_radius),
        ssr=SSRSettings(),
    )
    return RenderConfig(
        width=args.width,
        height=args.height,
        shadow_map_size=args.shadow_map_size,
        animated=args.animate,
        raster=args.raster,
        hybrid=hybrid,
        forward=ForwardSettings(msaa_samples=args.msaa),
        raytraced=RaytracedSettings(test_alpha=args.test_alpha),
    )


def save_checkpoint(path: str, renderer: Renderer) -> None:
    """Persist camera + config + temporal state (the reference has no checkpointing
    -- its only cross-frame state is the SVGF history, which we save too)."""
    cam = renderer.scene.camera
    state = {
        "camera": {
            "yfov": cam.yfov,
            "znear": cam.znear,
            "aspect": cam.aspect,
            "yaw": cam.yaw,
            "pitch": cam.pitch,
            "roll": cam.roll,
            "position": np.asarray(cam.position).tolist(),
        },
        "path": renderer.path_name,
        "config": dataclasses.asdict(renderer.config),
        "frame_index": renderer.frame_index,
    }
    np.savez(
        path,
        meta=json.dumps(state, default=float),
        shadow_ao_history=np.asarray(renderer.temporal_state.shadow_ao_history),
        moments_history=np.asarray(renderer.temporal_state.moments_history),
        prev_normal_oid=np.asarray(renderer.temporal_state.prev_normal_oid),
    )


def load_checkpoint(path: str, renderer: Renderer) -> None:
    import jax.numpy as jnp

    from vulkanhybridrenderer_tpu.core.types import TemporalState

    data = np.load(path, allow_pickle=False)
    state = json.loads(str(data["meta"]))
    cam = renderer.scene.camera
    for k, v in state["camera"].items():
        setattr(cam, k, np.asarray(v, np.float32) if k == "position" else v)
    renderer.frame_index = int(state["frame_index"])
    renderer.temporal_state = TemporalState(
        shadow_ao_history=jnp.asarray(data["shadow_ao_history"]),
        moments_history=jnp.asarray(data["moments_history"]),
        prev_normal_oid=jnp.asarray(data["prev_normal_oid"]),
    )


def run_script(renderer: Renderer, script: str):
    """Scripted interactive driving — the headless analogue of the reference's
    ImGui loop switching render paths and settings LIVE mid-run
    (user_interface.cpp:100-126 deferred path switch, renderer.cpp:159-181
    rebuild; settings changes rebuild via RenderPath::Rebuild).  Compiled
    variants are cached per (path, config) key, so switching back to a
    previously-used mode reuses the jitted frame function (the reference
    rebuilds pipelines from scratch — the cache is a TPU-side upgrade).

    Commands (semicolon-separated):
      frames N                         render N frames
      path forward|hybrid|raytraced|rayquery
      set shadows|ao|reflections|denoise|msaa|test_alpha = VALUE
      camera w|a|s|d                   one fly-camera step (1/60 s)

    Returns the last rendered frame (device array).
    """
    out = None
    for raw in script.split(";"):
        cmd = raw.strip().split()
        if not cmd:
            continue
        op = cmd[0]
        if op == "frames":
            for _ in range(int(cmd[1])):
                out = renderer.render_frame()
        elif op == "path":
            renderer.set_path(cmd[1])
        elif op == "camera":
            renderer.update_camera(1.0 / 60.0, keys=set(cmd[1:]))
        elif op == "set":
            cfg = renderer.config
            hybrid = cfg.hybrid
            forward = cfg.forward
            raytraced = cfg.raytraced
            for kv in cmd[1:]:
                k, v = kv.split("=")
                if k == "shadows":
                    hybrid = dataclasses.replace(
                        hybrid, shadow_mode=ShadowMode[v.upper()]
                    )
                elif k == "ao":
                    hybrid = dataclasses.replace(
                        hybrid, ao_mode=AmbientOcclusionMode[v.upper()]
                    )
                elif k == "reflections":
                    hybrid = dataclasses.replace(
                        hybrid, reflection_mode=ReflectionMode[v.upper()]
                    )
                elif k == "denoise":
                    hybrid = dataclasses.replace(hybrid, denoise=v in ("1", "true"))
                elif k == "msaa":
                    forward = dataclasses.replace(forward, msaa_samples=int(v))
                elif k == "test_alpha":
                    raytraced = dataclasses.replace(
                        raytraced, test_alpha=v in ("1", "true")
                    )
                else:
                    raise ValueError(f"unknown setting {k!r}")
            renderer.set_config(
                dataclasses.replace(
                    cfg, hybrid=hybrid, forward=forward, raytraced=raytraced
                )
            )
        else:
            raise ValueError(f"unknown script command {op!r}")
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", default="cornell",
                    help="procedural name (cornell/checker/sponza/pica) or .glb/.gltf path")
    ap.add_argument("--path", default="hybrid",
                    choices=["forward", "hybrid", "raytraced", "rayquery"])
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--shadows", default="raytraced",
                    choices=["raytraced", "rasterized", "off"])
    ap.add_argument("--ao", default="off", choices=["raytraced", "ssao", "off"])
    ap.add_argument("--reflections", default="off",
                    choices=["raytraced", "ssr", "off"])
    ap.add_argument("--denoise", action="store_true")
    ap.add_argument("--ssao-radius", type=float, default=0.75)
    ap.add_argument("--msaa", type=int, default=1)
    ap.add_argument("--test-alpha", action="store_true")
    ap.add_argument("--shadow-map-size", type=int, default=4096)
    ap.add_argument("--raster", default="binned", choices=["binned", "brute"])
    ap.add_argument("--animate", action="store_true",
                    help="per-frame transforms + BVH refit (pica scene)")
    ap.add_argument("--orbit", type=float, default=0.0,
                    help="orbit the camera by this many rad/s")
    ap.add_argument("--out", default=None, help="PNG path for the final frame")
    ap.add_argument("--dump", default=None,
                    help="name of a graph resource to dump alongside --out")
    ap.add_argument("--stats", action="store_true",
                    help="print the per-pass performance table")
    ap.add_argument("--save-checkpoint", default=None)
    ap.add_argument("--load-checkpoint", default=None)
    ap.add_argument("--script", default=None,
                    help="scripted interactive sequence, e.g. "
                    "'frames 2; path forward; frames 1; "
                    "set shadows=rasterized ao=ssao; frames 2' "
                    "(the ImGui live-switch loop, headless)")
    args = ap.parse_args(argv)

    scene = load_any_scene(args.scene)
    renderer = Renderer(scene, config_from_args(args), path=args.path)
    if args.load_checkpoint:
        load_checkpoint(args.load_checkpoint, renderer)

    if args.script:
        t_start = time.perf_counter()
        out = run_script(renderer, args.script)
        wall = time.perf_counter() - t_start
        print(f"script done in {wall*1e3:.1f} ms; "
              f"{len(renderer._frame_fns)} compiled variant(s) cached")
        if args.out:
            from vulkanhybridrenderer_tpu.utils.image import save_png

            save_png(args.out, np.asarray(out))
            print(f"wrote {args.out}")
        return 0

    t_start = time.perf_counter()
    for i in range(args.frames):
        if args.animate and args.scene == "pica":
            renderer.animate(procedural.animate_pica(scene, i / 60.0))
        if args.orbit:
            renderer.update_camera(
                1.0 / 60.0, mouse_delta=(args.orbit * 60.0, 0.0), mouse_down=True
            )
        out = renderer.render_frame()
    wall = time.perf_counter() - t_start
    print(
        f"{args.frames} frame(s) {args.width}x{args.height} [{args.path}] in "
        f"{wall*1e3:.1f} ms ({renderer.stats.frame_ms or 0:.2f} ms/frame EMA, "
        f"{renderer.stats.fps:.1f} FPS)"
    )

    if args.stats:
        renderer.time_passes()
        print(renderer.stats.table())
    if args.out:
        from vulkanhybridrenderer_tpu.utils.image import save_png

        save_png(args.out, np.asarray(out))
        print(f"wrote {args.out}")
    if args.dump:
        p = str(Path(args.out or "frame.png").with_suffix("")) + f".{args.dump.replace(' ', '_')}.png"
        renderer.debug_dump(args.dump, p, srgb=False)
        print(f"wrote {p}")
    if args.save_checkpoint:
        save_checkpoint(args.save_checkpoint, renderer)
        print(f"checkpoint -> {args.save_checkpoint}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
