"""Host frame driver (reference Renderer, renderer.cpp).

Owns the scene, the active render path, the compiled frame function cache, temporal
state, previous-frame matrices, and per-pass statistics.  The fence/acquire/submit
dance of Renderer::Present (renderer.cpp:103-182) collapses into a single jitted call
with donated temporal state; render-path/mode switches re-jit (the reference rebuilds
pipelines, renderer.cpp:159-181) and compiled variants are cached per config.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vulkanhybridrenderer_tpu.core.config import RenderConfig
from vulkanhybridrenderer_tpu.core.types import (
    PerFrameData,
    make_per_frame_data,
    make_temporal_state,
)
from vulkanhybridrenderer_tpu.graph.render_graph import RENDER_OUTPUT, PassStats
from vulkanhybridrenderer_tpu.models.base import get_path
from vulkanhybridrenderer_tpu.runtime import camera as cam_ctl
from vulkanhybridrenderer_tpu.scene.gltf import Scene
from vulkanhybridrenderer_tpu.utils.image import save_png


@jax.jit
def _encode_srgb8(planar):
    """(4, H, W) linear -> (H, W, 4) uint8 sRGB, on device (the swapchain
    format conversion the reference's present path does in hardware)."""
    img = jnp.clip(planar.transpose(1, 2, 0), 0.0, 1.0)
    rgb = img[..., :3]
    srgb = jnp.where(
        rgb <= 0.0031308, rgb * 12.92, 1.055 * rgb ** (1.0 / 2.4) - 0.055
    )
    out = jnp.concatenate([srgb, img[..., 3:4]], axis=-1)
    return jnp.round(out * 255.0).astype(jnp.uint8)


class Renderer:
    def __init__(self, scene: Scene, config: RenderConfig | None = None,
                 path: str = "hybrid", mesh=None, dispatch: str = "fused",
                 auto_precompile: bool = True):
        """mesh: optional jax.sharding.Mesh -- shards the frame's pixel rows across
        devices (parallel/mesh.py); None = single device like the reference.

        dispatch: "fused" (default) compiles the whole graph into ONE XLA
        program — fastest frames, minutes of first-compile at 1080p;
        "per_pass" jits each pass separately — ~6% slower frames, but
        pipeline (re)builds drop from minutes to seconds (see
        _run_per_pass), the right mode for interactive viewer sessions
        with live mode switching.

        auto_precompile: in per_pass mode, AOT-compile all passes of a new
        mode tuple CONCURRENTLY on first use (precompile_passes) instead of
        lazily one-by-one — the cold pipeline build drops from the SUM of
        per-pass compiles to ~the max."""
        from vulkanhybridrenderer_tpu.utils.compile_cache import (
            enable_compile_cache,
        )

        enable_compile_cache()
        self.scene = scene
        self.config = config or RenderConfig()
        self.path_name = path
        self.mesh = mesh
        # config validation (the reference validates pipeline state at build
        # time, pipeline.cpp): coverage MSAA's shared-binning raster is
        # single-device by design — fail here with the supported alternative
        # instead of deep inside a sharded trace.
        if (
            mesh is not None
            and path == "forward"
            and self.config.forward.msaa_samples > 1
            and self.config.forward.msaa_mode == "coverage"
        ):
            raise ValueError(
                "forward msaa_mode='coverage' is single-device; use "
                "msaa_mode='supersample' on a mesh"
            )
        if dispatch not in ("fused", "per_pass"):
            raise ValueError(f"dispatch={dispatch!r}: 'fused' or 'per_pass'")
        self.dispatch = dispatch
        self.auto_precompile = auto_precompile
        self.stats = PassStats()
        self.frame_index = 0
        self._prev_view: np.ndarray | None = None
        self._prev_proj: np.ndarray | None = None
        self._frame_fns: dict[Any, Any] = {}
        self._pass_fns: dict[Any, dict] = {}
        self._pass_compiled: dict[Any, dict] = {}
        self._graphs: dict[Any, Any] = {}
        self.temporal_state = make_temporal_state(*self._temporal_dims())
        self.prim_transform = scene.buffers.prim_transform
        self._bvh = None
        self._shade_tables = None
        self._shadow_grid = None
        self._binning_checked = False

    # -- path / config switching (renderer.cpp:159-181) ---------------------------
    def set_path(self, name: str):
        self.path_name = name

    def set_config(self, config: RenderConfig):
        old_dims = self._temporal_dims()
        self.config = config
        if self._temporal_dims() != old_dims:
            self.temporal_state = make_temporal_state(*self._temporal_dims())

    def _temporal_dims(self):
        """SVGF temporal state lives at TRACE resolution: full res normally,
        1/rt_scale when the hybrid path traces half-res (ops/upsample.py)."""
        rs = max(1, int(getattr(self.config.hybrid, "rt_scale", 1)))
        return -(-self.config.height // rs), -(-self.config.width // rs)

    def _key(self):
        return (self.path_name, self.config)

    @staticmethod
    def _platform() -> str:
        """Effective execution platform, honoring jax.default_device overrides
        (the multichip dryrun runs on a virtual CPU mesh while the session
        backend is still the real TPU)."""
        dev = getattr(jax.config, "jax_default_device", None)
        return getattr(dev, "platform", None) or jax.default_backend()

    def _get_frame_fn(self):
        key = self._key()
        if key not in self._frame_fns:
            path = get_path(self.path_name, self.config)
            graph = path.build_graph()
            keep = ("TemporalStateOut",) if path.uses_temporal_state else ()
            if self.mesh is not None:
                from vulkanhybridrenderer_tpu.parallel.mesh import make_sharded_frame_fn

                fn = make_sharded_frame_fn(
                    graph, self.mesh, self.config.height, self.config.width,
                    RENDER_OUTPUT, keep=keep,
                )
            else:
                fn = graph.make_frame_fn(RENDER_OUTPUT, keep=keep)
            self._graphs[key] = graph
            if path.uses_temporal_state:
                # The temporal-state pytree is DONATED: XLA aliases the history
                # buffers in-place instead of copying them every frame (the
                # reference's in-place storage-image history,
                # hybrid_render_path.cpp:245-262).  Donation is a no-op (with a
                # warning) on CPU, so only request it on TPU.
                def fn2(resources, temporal_state, _fn=fn):
                    return _fn({**resources, "temporal_state": temporal_state})

                donate = (1,) if self._platform() == "tpu" else ()
                jfn = jax.jit(fn2, donate_argnums=donate)
            else:
                jfn = jax.jit(fn)
            self._frame_fns[key] = (jfn, path)
        return self._frame_fns[key]

    # -- per-frame data (renderer.cpp:187-205) -------------------------------------
    def _make_pfd(self) -> PerFrameData:
        cam = self.scene.camera
        view = cam.view()
        proj = cam.projection(aspect=self.config.width / self.config.height)
        pfd = make_per_frame_data(
            view,
            proj,
            self.scene.light,
            self.config.width,
            self.config.height,
            frame_index=self.frame_index,
            prev_view=self._prev_view,
            prev_proj=self._prev_proj,
        )
        self._prev_view, self._prev_proj = view, proj
        return pfd

    def _get_bvh(self):
        """Build the scene LBVH once (reference: BLAS/TLAS built at scene load,
        resource_manager.cpp:291-307).  Animated paths refit it in-frame."""
        if self._bvh is None:
            from vulkanhybridrenderer_tpu import native_bridge
            from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
            from vulkanhybridrenderer_tpu.ops.geometry import to_world

            world = to_world(self.scene.buffers, self.prim_transform)
            tris = bvh_ops.world_triangles(world.position, self.scene.buffers.tri_vertex)
            # Host binned-SAH build, collapsed to an 8-wide BVH8: the TPU
            # counterpart of the driver's PREFER_FAST_TRACE BLAS build
            # (resource_manager.cpp:652).  The BVH8 packs 8 child boxes /
            # 8 triangles per 128-float row so traversal is one gather per
            # step from a VMEM-sized table (see ops/bvh8.py).  Animated paths
            # refit it in-jit every frame (models/passes.py refit8).
            from vulkanhybridrenderer_tpu.ops import bvh8 as bvh8_ops

            if native_bridge.native_available():
                binary = native_bridge.build_sah_host(np.asarray(tris))
            else:
                binary = bvh_ops.build(tris, leaf_size=1)
            lm = self.config.bvh_leaf_max
            dt = self.config.bvh_dtype
            if lm == 0 and dt != "f32" and not self.config.animated:
                # auto residency: before falling back to fatter f32 leaf-12
                # rows, try halving the bytes instead — bf16 leaf-8 keeps the
                # lower per-leaf-step VPU cost AND restores the VMEM gather
                # rate for f32 tables in the ~15-30 MB band (realglb: 24.9 MB
                # f32 -> 12.4 MB bf16; see ops/bvh8.py:table_to_bf16)
                b8 = bvh8_ops.build_bvh8_host(binary, tris, leaf_max=8)
                budget = bvh8_ops.VMEM_TABLE_BUDGET_BYTES
                if dt == "bf16" or (
                    b8.num_rows * 512 > budget and b8.num_rows * 256 <= budget
                ):
                    self._bvh = bvh8_ops.table_to_bf16(b8)
                elif b8.num_rows * 512 > budget:
                    # both bf16@8 and f32@8 spill: leaf-12 if THAT fits
                    # (build_bvh8_auto's rule), else keep the leaf-8 rows
                    b12 = bvh8_ops.build_bvh8_host(binary, tris, leaf_max=12)
                    self._bvh = b12 if b12.num_rows * 512 <= budget else b8
                else:
                    self._bvh = b8
            elif lm == 0:
                self._bvh = bvh8_ops.build_bvh8_auto(binary, tris)
            else:
                self._bvh = bvh8_ops.build_bvh8_host(
                    binary, tris, leaf_max=lm
                )
                if dt == "bf16":
                    self._bvh = bvh8_ops.table_to_bf16(self._bvh)
        return self._bvh

    def _get_shade_tables(self):
        """Pack the fused gather tables once per scene (ops/shadetab.py) -- the
        TPU analogue of building bindless descriptor tables at scene load
        (resource_manager.cpp:366-463)."""
        if self._shade_tables is None:
            from vulkanhybridrenderer_tpu.ops import shadetab

            self._shade_tables = shadetab.build_shade_tables(self.scene.buffers)
        return self._shade_tables

    def _get_shadow_grid(self):
        """Build the light-space shadow grid (shadow_accel="grid"): the
        alternative shadow-ray AS (ops/shadowgrid.py).  Host-sized from the
        static scene; animated paths rebuild it in-frame at the same (static)
        resolution (models/hybrid.py Shadow Grid Build).  The grid's cell
        frame is light-aligned, so it is cached keyed on the light direction
        and rebuilt when the light moves (the BVH needs no such rebuild)."""
        light_key = tuple(np.asarray(self.scene.light.direction[:3]).tolist())
        if self._shadow_grid is None or self._shadow_grid[0] != light_key:
            from vulkanhybridrenderer_tpu.ops import bvh as bvh_ops
            from vulkanhybridrenderer_tpu.ops import shadowgrid
            from vulkanhybridrenderer_tpu.ops.geometry import to_world

            world = to_world(self.scene.buffers, self.prim_transform)
            tris = bvh_ops.world_triangles(
                world.position, self.scene.buffers.tri_vertex
            )
            self._shadow_grid = (
                light_key,
                shadowgrid.build_shadow_grid(
                    tris, self.scene.light.direction[:3]
                ),
            )
        return self._shadow_grid[1]

    def _uses_shadow_grid(self) -> bool:
        """Mirror of models/hybrid.py's use_grid: the grid resource exists
        only when a pass actually consumes it."""
        from vulkanhybridrenderer_tpu.core.config import ShadowMode

        return (
            self.config.shadow_accel == "grid"
            and self.path_name == "hybrid"
            and self.config.hybrid.shadow_mode == ShadowMode.RAYTRACED
        )

    @property
    def blue_noise(self):
        """(4, 128, 128, 4) blue-noise texture stack, generated once per
        renderer (the reference uploads 4 prebaked LDR_RGBA PNGs at startup,
        renderer.cpp:32-36, and exposes the cycling index through
        PerFrameData.blue_noise_texture_index; like the reference, no
        built-in shader samples it — it rides along for user pipelines)."""
        if getattr(self, "_blue_noise", None) is None:
            import numpy as np

            from vulkanhybridrenderer_tpu.utils.bluenoise import (
                blue_noise_rgba,
            )

            self._blue_noise = jnp.asarray(
                np.stack([blue_noise_rgba(128, seed=i) for i in range(4)])
            )
        return self._blue_noise

    def _resources(self, pfd):
        res = {
            "scene": self.scene.buffers,
            "pfd": pfd,
            "prim_transform": self.prim_transform,
            "temporal_state": self.temporal_state,
            "bvh": self._get_bvh(),
            "shade_tables": self._get_shade_tables(),
            "blue_noise": self.blue_noise,
        }
        if self._uses_shadow_grid():
            res["shadow_grid"] = self._get_shadow_grid()
        return res

    def check_binning(self, pfd=None) -> None:
        """Host-side validation that no triangles overflow the binned
        rasterizer's static tier caps (Bins.overflow) for the current camera
        and light views.  Called automatically on the first frame (one sync)
        for a friendly error; LATER frames are guarded on-device — any
        overflow NaN-poisons the depth buffer (rasterize_scene), so a
        camera/scene change that overflows a cap can never silently drop
        triangles (it trips bench.py's isfinite check and is isolated by
        find_nonfinite_pass)."""
        if self.config.raster != "binned":
            return
        import numpy as np

        from vulkanhybridrenderer_tpu.ops import geometry, rasterizer
        from vulkanhybridrenderer_tpu.ops import rasterizer_tiled as rt

        pfd = pfd if pfd is not None else self._make_pfd()
        scene = self.scene.buffers
        world = geometry.to_world(scene, self.prim_transform)
        views = [
            (pfd.camera_proj @ pfd.camera_view, self.config.width,
             self.config.height),
            (pfd.directional_light.projview, self.config.shadow_map_size,
             self.config.shadow_map_size),
        ]
        for vp, w, h in views:
            clip = geometry.to_clip(world.position, vp)
            setup = rasterizer.triangle_setup(clip, scene.tri_vertex, w, h)
            bins = rt.bin_triangles(setup, w, h)
            ov = np.asarray(bins.overflow)
            if (ov > 0).any():
                raise RuntimeError(
                    f"binned rasterizer entry overflow at {w}x{h}: "
                    f"{int(ov[0])} tile entries over the static e_cap — "
                    "triangles would be dropped; raise e_cap "
                    "(ops/rasterizer_tiled.default_e_cap) for this scene"
                )

    # -- frame loop -----------------------------------------------------------------

    def render_frame(self, sync: bool = True, srgb8: bool = False):
        """Render one frame; returns the (4, H, W) linear RENDER_OUTPUT (device).

        srgb8=True instead returns the (H, W, 4) uint8 sRGB swapchain image
        (the reference presents B8G8R8A8_SRGB, vulkan_context.cpp:309-369) --
        encoded on-device, so host readback moves 4x fewer bytes."""
        pfd = self._make_pfd()
        if not self._binning_checked:
            self._binning_checked = True
            self.check_binning(pfd)
        t0 = time.perf_counter()
        res = self._resources(pfd)
        if self.dispatch == "per_pass":
            out = self._run_per_pass(res)
            path = get_path(self.path_name, self.config)
            uses_ts = path.uses_temporal_state
        else:
            fn, path = self._get_frame_fn()
            uses_ts = path.uses_temporal_state
            if uses_ts:
                ts = res.pop("temporal_state")
                out = fn(res, ts)
            else:
                out = fn(res)
        if sync:
            jax.block_until_ready(out)
            self.stats.update_frame((time.perf_counter() - t0) * 1e3)
        if uses_ts:
            self.temporal_state = out["TemporalStateOut"]
        self.frame_index += 1
        if srgb8:
            return _encode_srgb8(out[RENDER_OUTPUT])
        return out[RENDER_OUTPUT]

    def _run_per_pass(self, res):
        """dispatch="per_pass": execute the graph as one jitted call PER PASS
        instead of one fused frame function.

        The fused frame costs minutes of whole-graph XLA optimization on
        first compile (full hybrid 1080p: 200-545 s) while its individual
        passes compile in SECONDS each (scripts/bench_compile.py: traces
        4-8 s, binned raster 29.7, SVGF 7.8) — so this mode trades ~6%
        frame time (lost cross-pass fusion; measured pass-sum 1058 vs
        fused 999 ms on full sponza) for pipeline-build latency much
        closer to the reference's millisecond rebuilds
        (hybrid_render_path.cpp Build/Rebuild).  Mode switches win twice:
        passes shared with the previous mode produce byte-identical
        per-pass HLO, so the persistent compilation cache
        (utils/compile_cache.py) serves them in seconds."""
        key = self._key()
        self._get_graph()
        graph = self._graphs[key]
        if self.auto_precompile and key not in self._pass_compiled:
            try:
                self.precompile_passes()
            except Exception:
                # AOT path is an optimization only: any lowering/compile
                # surprise falls back to the lazy per-pass jits below
                self._pass_compiled[key] = {}
        compiled = self._pass_compiled.get(key, {})
        fns = self._pass_fns.setdefault(key, {})
        for name in graph.find_execution_order():
            p = graph.passes[name]
            exe = compiled.get(name)
            produced = None
            if exe is not None:
                try:
                    produced = exe(res)
                except Exception:
                    compiled.pop(name, None)  # aval drift: re-jit lazily
            if produced is None:
                if name not in fns:
                    fns[name] = jax.jit(p.fn)
                produced = fns[name](res)
            res.update({k: produced[k] for k in p.outputs})
        return res

    def precompile_passes(self, max_workers: int | None = None) -> dict[str, float]:
        """AOT-build every pass executable of the active (path, config)
        CONCURRENTLY; per-pass dispatch then calls the compiled executables
        directly.

        The fused frame pays minutes of whole-graph XLA optimization while
        its passes compile in seconds each (docs/PERF_STATUS.md compile
        attribution), but the lazy per-pass path still compiles them
        SEQUENTIALLY — a cold pipeline build costs the sum.  Here each pass
        is traced once in dependency order (downstream input shapes come
        from Lowered.out_info, no execution), then all passes compile on a
        thread pool, so a cold build costs ~the slowest pass plus tracing.
        Returns per-pass compile seconds (plus __trace_s__/__wall_s__)."""
        from concurrent.futures import ThreadPoolExecutor

        key = self._key()
        self._get_graph()
        graph = self._graphs[key]
        # tracing must not perturb the frame loop's prev-frame matrices
        prev = (self._prev_view, self._prev_proj)
        pfd = self._make_pfd()
        self._prev_view, self._prev_proj = prev
        res_ab: dict = dict(self._resources(pfd))
        order = graph.find_execution_order()
        t0 = time.perf_counter()
        lowered: dict[str, Any] = {}
        for name in order:
            p = graph.passes[name]
            low = jax.jit(p.fn).lower(res_ab)
            lowered[name] = low
            out_info = low.out_info
            res_ab.update({k: out_info[k] for k in p.outputs})
        trace_s = time.perf_counter() - t0

        def compile_one(low):
            t = time.perf_counter()
            return low.compile(), time.perf_counter() - t

        workers = max_workers or min(8, max(1, len(order)))
        with ThreadPoolExecutor(workers) as ex:
            futs = {n: ex.submit(compile_one, lo) for n, lo in lowered.items()}
            results = {n: f.result() for n, f in futs.items()}
        self._pass_compiled[key] = {n: c for n, (c, _) in results.items()}
        times = {n: s for n, (_, s) in results.items()}
        times["__trace_s__"] = trace_s
        times["__wall_s__"] = time.perf_counter() - t0
        return times

    def _get_graph(self):
        """Ensure the active config's graph exists (builds the fused frame fn
        as a side effect; per-pass dispatch only needs the graph object)."""
        self._get_frame_fn()

    def update_camera(self, dt, keys=frozenset(), mouse_delta=(0.0, 0.0),
                      mouse_down=False):
        cam_ctl.update_camera(self.scene.camera, dt, keys, mouse_delta, mouse_down)

    def animate(self, prim_transform):
        """Set this frame's primitive transforms (animated scenes)."""
        self.prim_transform = prim_transform

    # -- observability ---------------------------------------------------------------
    def time_passes(self, iters: int = 5) -> dict[str, float]:
        """Per-pass attribution table (reference perf-stats window)."""
        key = self._key()
        self._get_frame_fn()
        graph = self._graphs[key]
        pfd = self._make_pfd()
        timings = graph.time_passes(self._resources(pfd), iters=iters)
        self.stats.update(timings)
        return timings

    def list_resources(self) -> list[str]:
        """All named resources the active graph produces (the debug-texture
        dropdown contents, user_interface.cpp:129-150)."""
        key = self._key()
        self._get_frame_fn()
        graph = self._graphs[key]
        out: list[str] = []
        for name in graph.find_execution_order():
            out.extend(graph.passes[name].outputs)
        return out

    def fetch_resource(self, *resources: str):
        """Render one frame and return named graph resources (jitted -- the
        whole graph compiles; eager graph.run would dispatch op-by-op).
        Pass several names to fetch them from ONE compiled graph run (each
        call compiles separately, ~minutes at 1080p on the tunneled TPU)."""
        key = self._key()
        self._get_frame_fn()
        graph = self._graphs[key]
        pfd = self._make_pfd()
        fetch = jax.jit(
            lambda res: tuple(graph.run(res)[r] for r in resources)
        )
        out = fetch(self._resources(pfd))
        return out[0] if len(resources) == 1 else out

    def debug_dump(self, resource: str, path: str, srgb: bool = True):
        """Render and save any named graph resource as PNG (the reference's
        debug-texture viewer, user_interface.cpp:129-150)."""
        arr = np.asarray(self.fetch_resource(resource))
        save_png(path, arr, srgb=srgb)
        return arr

    def save_frame(self, path: str):
        img = np.asarray(self.render_frame())
        save_png(path, img)
        return img

    def profile(self, trace_dir: str = "/tmp/vhr_trace", frames: int = 3):
        """Capture a jax.profiler trace of `frames` frames (the TPU-native
        counterpart of the reference's RenderDoc debug labels,
        render_graph.cpp:160-165)."""
        import jax.profiler

        self.render_frame()  # ensure compiled outside the trace
        with jax.profiler.trace(trace_dir):
            out = None
            for _ in range(frames):
                out = self.render_frame(sync=False)
            jax.block_until_ready(out)
        return trace_dir

    def find_nonfinite_pass(self) -> str | None:
        """Failure detection: run each pass separately and report the first whose
        outputs contain non-finite values (None if the frame is clean).  The
        functional pass graph makes fault isolation trivial compared to the
        reference's validation-layer printouts (vulkan_context.cpp:122-146)."""
        key = self._key()
        self._get_frame_fn()
        graph = self._graphs[key]
        pfd = self._make_pfd()
        res = self._resources(pfd)
        for name in graph.find_execution_order():
            p = graph.passes[name]
            produced = jax.jit(p.fn)(res)
            for out_name in p.outputs:
                leaves = jax.tree_util.tree_leaves(produced[out_name])
                for leaf in leaves:
                    arr = np.asarray(leaf)
                    if arr.dtype.kind == "f" and not np.isfinite(arr).all():
                        return name
            res.update({k: produced[k] for k in p.outputs})
        return None
