"""Bit-exact port of the reference shader RNG (data/shaders/common.glsl:47-76).

Thomas Wang hash seeding + xorshift32, vectorized over pixel grids as uint32 jnp
arrays.  Matching the reference RNG exactly keeps our stochastic passes (RT shadow
cone sampling, AO hemisphere sampling, SSAO disk sampling) statistically comparable
with the Vulkan renderer for RMSE evaluation.
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def seed_thread(seed):
    """Wang hash (common.glsl:50-58). seed: uint32 array."""
    seed = jnp.asarray(seed, _U32)
    seed = (seed ^ _U32(61)) ^ (seed >> _U32(16))
    seed = seed * _U32(9)
    seed = seed ^ (seed >> _U32(4))
    seed = seed * _U32(0x27D4EB2D)
    seed = seed ^ (seed >> _U32(15))
    return seed


def next_u32(state):
    """xorshift32 step (common.glsl:60-66). Returns (new_state, value=new_state)."""
    state = jnp.asarray(state, _U32)
    state = state ^ (state << _U32(13))
    state = state ^ (state >> _U32(17))
    state = state ^ (state << _U32(5))
    return state, state


def random01(state):
    """Uniform float in [0, 1) (common.glsl:68-70).

    Builds a float in [1, 2) from the top 23 random bits then subtracts 1.
    Returns (new_state, f32 array).
    """
    state, bits = next_u32(state)
    f = jnp.asarray((bits >> _U32(9)) | _U32(0x3F800000), _U32)
    return state, f.view(jnp.float32) - 1.0


def pixel_seed(width: int, height: int, frame_index):
    """Per-pixel seeds as used by raygen.rgen:18 and ssao.comp:36.

    raygen: seed_thread((y * LaunchSize.y + x) * frame_index)  -- note the reference
    multiplies the row term by the *height* (LaunchSize.y), and multiplies by the frame
    index (so frame 0 degenerates to seed 0 everywhere; we keep that behavior for
    parity).  Returns an (H, W) uint32 state grid.
    """
    y = jnp.arange(height, dtype=_U32)[:, None]
    x = jnp.arange(width, dtype=_U32)[None, :]
    lin = (y * _U32(height) + x) * jnp.asarray(frame_index, _U32)
    return seed_thread(jnp.broadcast_to(lin, (height, width)))
