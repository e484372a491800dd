"""Multi-chip scaling: shard the frame across a device mesh.

The reference is strictly single-GPU (one graphics queue, vulkan_context.cpp:204-270)
-- there is nothing to translate, so this layer is pure TPU-first design: the frame's
big dimension is the PIXEL GRID, and we scale by sharding image rows across devices
("sp"/data-parallel over pixels), keeping the scene, BVH, and per-frame constants
replicated.  We use the GSPMD recipe (annotate shardings, let XLA insert the
collectives): every image-shaped intermediate gets a with_sharding_constraint on its
row axis, so

  * embarrassingly parallel passes (G-buffer resolve, raygen ray wavefronts, SSAO,
    composition) partition cleanly with zero communication;
  * stencil passes (SSAO blur, SVGF a-trous, SSR's arbitrary-uv gathers) get their
    halos / data exchange via XLA-inserted collective-permutes and all-gathers over
    ICI;
  * the replicated-scene gathers (vertex fetch, BVH node fetch) stay local.

Rasterization and the shadow map currently compute per-device on the replicated
triangle list and are sliced by the constraint afterwards; the binned tile
rasterizer (ops/rasterizer_tiled.py) keeps per-tile work, which GSPMD then assigns
row-block-wise.
"""
from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "sp"  # image rows (the "sequence/pixel" axis of this workload)


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (ROW_AXIS,))


def _image_spec(ndim: int) -> P:
    """Shard the second-to-last axis (rows) of an image-shaped array."""
    spec = [None] * ndim
    spec[-2] = ROW_AXIS
    return P(*spec)


def shard_image_resources(resources: dict, mesh: Mesh, height: int, width: int):
    """Apply row-sharding constraints to every array leaf that looks like a
    full-resolution image (last two dims == (height, width)).  Everything else is
    left for GSPMD to propagate (scene/BVH stay replicated)."""

    def constrain(x):
        if (
            hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[-2] == height
            and x.shape[-1] == width
        ):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, _image_spec(x.ndim))
            )
        return x

    return jax.tree_util.tree_map(constrain, resources)


def make_sharded_frame_fn(graph, mesh: Mesh, height: int, width: int,
                          target: str = "RENDER_OUTPUT", keep: tuple = ()):
    """Like RenderGraph.make_frame_fn but inserting row-sharding constraints after
    every pass, so all image-space intermediates (and therefore the pass
    computations producing them) are partitioned across the mesh."""
    wanted = (target,) + tuple(keep)

    def frame_fn(resources: dict) -> dict:
        res = dict(shard_image_resources(resources, mesh, height, width))
        for name in graph.find_execution_order(target):
            p = graph.passes[name]
            produced = p.fn(res)
            produced = shard_image_resources(produced, mesh, height, width)
            res.update({k: produced[k] for k in p.outputs})
        return {k: res[k] for k in wanted}

    return frame_fn
