"""Render path base (reference render_path.h:6-20).

A render path populates a RenderGraph with passes; Build() in the reference maps to
`register()` here, and the reference's Rebuild-on-settings-change (render_path.cpp:22)
maps to re-registering + re-jitting with a new static config -- the runtime caches
compiled frame functions per (path, config) key, mirroring the spec-constant
specialized pipelines (hybrid_render_path.cpp:362-369).

External resources every path may read:
  "scene"           SceneBuffers
  "pfd"             PerFrameData
  "prim_transform"  (P, 4, 4) current primitive transforms (animation)
  "temporal_state"  TemporalState (paths that integrate temporally)
"""
from __future__ import annotations

from vulkanhybridrenderer_tpu.core.config import RenderConfig
from vulkanhybridrenderer_tpu.graph.render_graph import RenderGraph

_REGISTRY: dict[str, type] = {}


class RenderPath:
    name: str = "base"
    #: resources the path consumes beyond "scene"/"pfd"/"prim_transform"
    uses_temporal_state: bool = False

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        if getattr(cls, "name", None) and cls.name != "base":
            _REGISTRY[cls.name] = cls

    def __init__(self, config: RenderConfig):
        self.config = config

    def register(self, graph: RenderGraph) -> None:
        """Add this path's passes to `graph` (reference RegisterPath)."""
        raise NotImplementedError

    def build_graph(self) -> RenderGraph:
        g = RenderGraph()
        self.register(g)
        return g


def get_path(name: str, config: RenderConfig) -> RenderPath:
    """Instantiate a registered path by name ("forward", "hybrid", "raytraced",
    "rayquery" -- the reference's render-path menu, user_interface.cpp:100-119)."""
    # ensure concrete paths are imported
    from vulkanhybridrenderer_tpu.models import (  # noqa: F401
        forward,
        hybrid,
        raytraced,
        rayquery,
    )

    if name not in _REGISTRY:
        raise KeyError(
            f"unknown render path {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](config)
