"""Render configuration.

The reference configures everything through compile-time constants + ImGui state that
reaches shaders as specialization constants (hybrid_render_path.cpp:362-369,
pipeline.cpp:25-43).  Here the same knobs are frozen dataclasses used as *static* jit
arguments: each distinct config traces/compiles its own frame function, exactly like
the reference builds a new pipeline per spec-constant tuple.
"""
from __future__ import annotations

import dataclasses
import enum


class ShadowMode(enum.IntEnum):  # common.glsl:13-16
    RAYTRACED = 0
    RASTERIZED = 1
    OFF = 2


class AmbientOcclusionMode(enum.IntEnum):  # common.glsl:18-21
    RAYTRACED = 0
    SSAO = 1
    OFF = 2


class ReflectionMode(enum.IntEnum):  # common.glsl:23-26
    RAYTRACED = 0
    SSR = 1
    OFF = 2


@dataclasses.dataclass(frozen=True)
class SSAOSettings:
    radius: float = 0.75  # hybrid_render_path.cpp default


@dataclasses.dataclass(frozen=True)
class SSRSettings:
    """SSRPushConstants defaults (hybrid_render_path.cpp:203-208)."""

    ray_distance: float = 20.0
    step_size: float = 0.1
    thickness: float = 0.75
    bsearch_steps: int = 4


@dataclasses.dataclass(frozen=True)
class HybridSettings:
    """Hybrid path modes (defaults mirror hybrid_render_path.h:32-35: RT shadows on,
    AO off, reflections off, denoise off)."""

    shadow_mode: ShadowMode = ShadowMode.RAYTRACED
    ao_mode: AmbientOcclusionMode = AmbientOcclusionMode.OFF
    reflection_mode: ReflectionMode = ReflectionMode.OFF
    denoise: bool = False
    ssao: SSAOSettings = dataclasses.field(default_factory=SSAOSettings)
    ssr: SSRSettings = dataclasses.field(default_factory=SSRSettings)
    # Trace RT shadows/AO/reflections on a 1/rt_scale-resolution G-buffer
    # (1/rt_scale^2 the rays) and joint-bilaterally upsample the results
    # (ops/upsample.py).  1 = full-res reference parity; 2 = the standard
    # real-time half-res recipe.  Perf knob only — pass semantics unchanged.
    rt_scale: int = 1


@dataclasses.dataclass(frozen=True)
class ForwardSettings:
    """Forward raster path (forward_raster_render_path.h:14).

    msaa_samples: multisampled coverage like the reference's max-sample-count
    attachments (forward_raster_render_path.cpp:59).  msaa_mode="coverage"
    (default) rasterizes depth/coverage at the standard Vulkan sample
    positions sharing ONE binning pass and shades at most two distinct
    fragments per pixel (true MSAA cost semantics: k x coverage, ~1 x
    shading); "supersample" is the legacy ordered-grid k x shading variant."""

    msaa_samples: int = 1
    msaa_mode: str = "coverage"  # "coverage" | "supersample"


@dataclasses.dataclass(frozen=True)
class RaytracedSettings:
    """Full-RT path (raytraced_render_path.h:14)."""

    test_alpha: bool = False


@dataclasses.dataclass(frozen=True)
class RayquerySettings:
    pass


@dataclasses.dataclass(frozen=True)
class RasterState:
    """Raster/depth pipeline state (vulkan_pipeline_presets.h:35-78 as data).

    The reference hardcodes these per preset: RASTERIZATION_STATE_DEFAULT
    (back-face cull) vs _CULL_NONE, and DEPTH_STENCIL_STATE_RW_GREATER_OR_
    EQUAL for its reverse-Z pipelines.  All reference pipelines use
    greater_equal + clear 0.0; the knobs exist for parity and for user
    pipelines.  The production binned kernel implements the reverse-Z
    greater_equal preset; other compare ops run via the reference rasterizer
    (config.raster = "brute").
    """

    cull_mode: str = "back"  # "back" | "none"
    depth_compare: str = "greater_equal"  # "greater_equal" | "less_equal" | "always"
    depth_clear: float = 0.0


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Top-level static configuration for one compiled frame function."""

    width: int = 1920
    height: int = 1080
    #: animated scenes refit the LBVH every frame inside the frame function
    animated: bool = False
    #: "binned" = sort-binned Pallas tile rasterizer (production);
    #: "brute" = O(T*P) reference rasterizer (small scenes / validation)
    raster: str = "binned"
    #: alpha-masked geometry in raster passes (gbuf.frag:22-32 parity):
    #: "brute" = per-fragment alpha kill — the binned path serves it with the
    #: depth-peeling subset raster (ops/rasterizer_tiled.rasterize_alpha_
    #: peeled), the reference rasterizer with exact per-fragment taps;
    #: "off" = skip masked triangles in raster passes entirely (they remain
    #: in the BVH for RT effects)
    alpha_raster: str = "brute"
    #: depth-peel rounds for the binned alpha raster = max consecutive
    #: REJECTED masked fragments resolved per pixel (measured Sponza 1080p,
    #: 288 masked tris: rounds 1/2/4 = 21.7/36.0/162.2 ms — each live round
    #: pays a full-image alpha eval + subset re-raster; converged rounds are
    #: lax.cond-skipped).  4 covers all bundled scenes; drop to 2-3 to trade
    #: deep-stacked-foliage exactness for ~60-120 ms at 1080p.
    alpha_peel_rounds: int = 4
    shadow_map_size: int = 4096  # hybrid depth prepass target (hybrid_render_path.cpp)
    #: acceleration structure for RT shadow rays (TPU-native extension; the
    #: reference has only the hardware BVH): "bvh8" = the BVH8 packet
    #: traversal; "grid" = light-space 2D grid (ops/shadowgrid.py) -- exact
    #: same hit/miss answers, wins when triangles are tiny relative to the
    #: light footprint (dense foliage/terrain)
    shadow_accel: str = "bvh8"
    #: triangles per BVH8 leaf row: 0 = auto, or 8 / 12 (the 128-float row
    #: fits 12).  Fatter leaves cut the row count ~25% but MEASURED SLOWER
    #: on VMEM-resident tables (scripts/bench_leafmax.py, Sponza 1080p:
    #: shadow 63.5 -> 92.3 ms): the walk barely shortens while every leaf
    #: step pays 1.5x the masked Moller-Trumbore VPU work.  On tables past
    #: the ~16 MB VMEM-residency cliff the per-step gather rate triples
    #: (docs/PERF_STATUS.md rules 2/5), so auto picks 12 exactly when the
    #: leaf-8 table misses VMEM and the leaf-12 one fits
    #: (runtime/renderer._get_bvh).
    bvh_leaf_max: int = 0
    #: BVH8 gather-table element type (TPU-native residency lever; the
    #: reference's hardware BVH has its own driver-side compression,
    #: resource_manager.cpp:652 PREFER_FAST_TRACE): "f32" = exact table;
    #: "bf16" = half the bytes (ops/bvh8.py:table_to_bf16 — conservative
    #: directed-rounded boxes, exact integer lanes, vertices quantized to
    #: bf16; static scenes only); "auto" = bf16 exactly when the f32 table
    #: spills the ~15 MB VMEM gather budget while the bf16 one fits (the
    #: measured over-cliff penalty is 1.65x per gather,
    #: scripts/bench_vmem_cliff.py) and the scene is static.
    bvh_dtype: str = "auto"
    # NOTE: no shadow-ray-count knob: the reference's raygen.rgen:39-41 loop
    # re-traces the SAME direction/payload 4x, which is semantically one
    # any-hit trace (ops/raygen.py traces once, bit-equal result).
    ao_rays: int = 2  # raygen.rgen:45-55
    raster_state: RasterState = dataclasses.field(default_factory=RasterState)
    hybrid: HybridSettings = dataclasses.field(default_factory=HybridSettings)
    forward: ForwardSettings = dataclasses.field(default_factory=ForwardSettings)
    raytraced: RaytracedSettings = dataclasses.field(default_factory=RaytracedSettings)
    rayquery: RayquerySettings = dataclasses.field(default_factory=RayquerySettings)

    def __post_init__(self):
        if self.bvh_leaf_max not in (0, 8, 12):
            raise ValueError(
                f"bvh_leaf_max={self.bvh_leaf_max}: the BVH8 row layout "
                "supports 8 or 12 triangles per leaf (128-float rows), "
                "or 0 = auto-select by table VMEM residency"
            )
        if self.bvh_dtype not in ("auto", "f32", "bf16"):
            raise ValueError(
                f"bvh_dtype={self.bvh_dtype!r}: expected 'auto', 'f32' or "
                "'bf16'"
            )
        if self.bvh_dtype == "bf16" and self.bvh_leaf_max == 12:
            raise ValueError(
                "bvh_dtype='bf16' needs leaf_max 8 (or 0): the 12-triangle "
                "row has no free lanes for the 3x8-bit id pieces"
            )
        if self.bvh_dtype == "bf16" and self.animated:
            raise ValueError(
                "bvh_dtype='bf16' is a static-scene residency lever; "
                "animated scenes refit f32 rows in-frame (use 'f32'/'auto')"
            )
