"""Pass graph -> one jitted XLA frame function.

TPU-native redesign of the reference render graph (render_graph.{h,cpp}): passes are
*pure functions* over named resources (arrays / pytrees), dependencies are data flow,
and `Build()`'s barrier machinery (render_graph.cpp:722-796) disappears -- XLA's
dataflow scheduling and fusion replace image layout tracking and pipeline barriers.

Parity mapping:
  * AddGraphicsPass/AddRaytracingPass/AddComputePass (render_graph.cpp:70-116)
    -> add_pass(name, fn, inputs, outputs)
  * FindExecutionOrder: backward walk from the unique writer of "RENDER_OUTPUT",
    reversed and deduped (render_graph.cpp:686-720) -> find_execution_order()
  * SanityCheck on resource consistency (render_graph.cpp:980-1021)
    -> build-time validation of reader/writer relationships
  * per-pass GPU timestamps + EMA (render_graph.cpp:189-220) -> time_passes(), which
    jits each pass separately, and PassStats.update() applying the same
    0.95/0.05 EMA
  * the whole Execute() loop compiles into ONE jitted function via run()/make_frame_fn
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax

RENDER_OUTPUT = "RENDER_OUTPUT"


class GraphError(RuntimeError):
    pass


@dataclasses.dataclass(frozen=True)
class Pass:
    name: str
    fn: Callable[[dict], dict]  # resources-in -> dict of produced resources
    inputs: tuple[str, ...]
    outputs: tuple[str, ...]


class RenderGraph:
    """Declarative pass registry (reference RenderGraph, render_graph.h:10-27)."""

    def __init__(self):
        self._passes: dict[str, Pass] = {}

    def add_pass(self, name: str, fn, inputs, outputs):
        """Register a pass.  `fn(res: dict) -> dict` must be pure/traceable and
        return exactly its declared outputs."""
        if name in self._passes:
            raise GraphError(f"duplicate pass {name!r}")
        self._passes[name] = Pass(name, fn, tuple(inputs), tuple(outputs))
        return self

    @property
    def passes(self) -> dict[str, Pass]:
        return dict(self._passes)

    # -- structure ---------------------------------------------------------------
    def writers(self) -> dict[str, str]:
        """resource -> unique producing pass (render_graph.cpp:118-149 writers map).
        Duplicate writers are a graph error, mirroring the reference's assumption of
        a unique RENDER_OUTPUT writer."""
        w: dict[str, str] = {}
        for p in self._passes.values():
            for out in p.outputs:
                if out in w:
                    raise GraphError(
                        f"resource {out!r} written by both {w[out]!r} and {p.name!r}"
                    )
                w[out] = p.name
        return w

    def find_execution_order(self, target: str = RENDER_OUTPUT) -> list[str]:
        """Backward walk from the writer of `target`, reversed, deduped keeping the
        earliest occurrence (reference FindExecutionOrder, render_graph.cpp:686-720).
        Unreached passes are pruned, exactly like passes not feeding RENDER_OUTPUT
        never execute in the reference."""
        w = self.writers()
        if target not in w:
            raise GraphError(f"no pass writes {target!r}")
        order: list[str] = []
        done: set[str] = set()
        visiting: set[str] = set()

        def visit(name: str):
            if name in done:
                return
            if name in visiting:
                raise GraphError(f"cycle detected in pass graph at {name!r}")
            visiting.add(name)
            for dep in self._passes[name].inputs:
                if dep in w:
                    visit(w[dep])
            visiting.discard(name)
            done.add(name)
            order.append(name)

        visit(w[target])
        return order

    def validate(self, external: set[str], target: str = RENDER_OUTPUT):
        """Every input must be produced by some pass or provided externally
        (the reference asserts this via descriptor lookup at Build time)."""
        w = self.writers()
        for name in self.find_execution_order(target):
            p = self._passes[name]
            for dep in p.inputs:
                if dep not in w and dep not in external:
                    raise GraphError(
                        f"pass {name!r} reads {dep!r}: not written by any pass nor external"
                    )

    # -- execution ----------------------------------------------------------------
    def run(self, resources: dict, target: str = RENDER_OUTPUT) -> dict:
        """Execute all passes feeding `target` (traceable; call under jit)."""
        self.validate(set(resources), target)
        res = dict(resources)
        for name in self.find_execution_order(target):
            p = self._passes[name]
            produced = p.fn(res)
            missing = set(p.outputs) - set(produced)
            if missing:
                raise GraphError(f"pass {name!r} did not produce {missing}")
            res.update({k: produced[k] for k in p.outputs})
        return res

    def make_frame_fn(self, target: str = RENDER_OUTPUT, keep: tuple[str, ...] = ()):
        """Close over the graph -> a jittable frame function
        frame_fn(resources: dict) -> dict with `target` (+ `keep`) only."""
        wanted = (target,) + tuple(keep)

        def frame_fn(resources: dict) -> dict:
            res = self.run(resources, target)
            return {k: res[k] for k in wanted}

        return frame_fn

    def time_passes(
        self, resources: dict, target: str = RENDER_OUTPUT, iters: int = 5
    ) -> dict[str, float]:
        """Per-pass wall-clock (ms), each pass jitted separately -- the analogue of
        the reference's per-pass GPU timestamps (render_graph.cpp:189-201).  This
        disables cross-pass fusion, so the sum exceeds the fused frame time; use it
        for attribution, not for the headline number."""
        import jax.numpy as jnp
        import numpy as np

        def sync(produced):
            # block_until_ready can return EARLY on the tunneled TPU runtime
            # (verified: a 1176 s flagship attribution read back 0.2 ms
            # passes) — fetching one scalar forces every dispatched op on
            # the single execution stream to complete (bench.py
            # methodology).  Costs one ~20 ms round trip per sync, shared
            # across `iters` frames.
            leaf = jax.tree_util.tree_leaves(produced)[0]
            np.asarray(jnp.ravel(leaf)[0])

        self.validate(set(resources), target)
        res = dict(resources)
        timings: dict[str, float] = {}
        for name in self.find_execution_order(target):
            p = self._passes[name]
            fitted = jax.jit(p.fn)
            produced = fitted(res)  # compile + warm
            sync(produced)
            t0 = time.perf_counter()
            for _ in range(iters):
                produced = fitted(res)
            sync(produced)
            timings[name] = (time.perf_counter() - t0) * 1e3 / iters
            res.update({k: produced[k] for k in p.outputs})
        return timings


class PassStats:
    """EMA-smoothed per-pass timings (reference render_graph.cpp:199:
    t = 0.95 * old + 0.05 * new) + FPS counter."""

    ALPHA = 0.05

    def __init__(self):
        self.timings: dict[str, float] = {}
        self.frame_ms: float | None = None

    def update(self, new_timings: dict[str, float]):
        for k, v in new_timings.items():
            old = self.timings.get(k)
            self.timings[k] = v if old is None else (1 - self.ALPHA) * old + self.ALPHA * v

    def update_frame(self, ms: float):
        old = self.frame_ms
        self.frame_ms = ms if old is None else (1 - self.ALPHA) * old + self.ALPHA * ms

    @property
    def fps(self) -> float:
        return 1e3 / self.frame_ms if self.frame_ms else 0.0

    def table(self) -> str:
        lines = [f"{'pass':<40} {'ms':>8}"]
        for k, v in self.timings.items():
            lines.append(f"{k:<40} {v:>8.3f}")
        if self.frame_ms is not None:
            lines.append(f"{'[frame]':<40} {self.frame_ms:>8.3f}  ({self.fps:.1f} FPS)")
        return "\n".join(lines)
