"""Texture atlas packing (host-side, numpy).

Replaces the reference's bindless 2048-texture descriptor array
(resource_manager.h:3-13, :366-463): all textures are shelf-packed into one
(4, AH, AW) planar array at scene load.  sRGB -> linear conversion happens here, the
moral equivalent of the reference choosing VK_FORMAT_R8G8B8A8_SRGB per texture at
upload (scene_loader.cpp:239-274).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vulkanhybridrenderer_tpu.core.types import TextureAtlas


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    """IEC 61966-2-1 EOTF, vectorized; c in [0,1]."""
    c = np.asarray(c, np.float32)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4).astype(
        np.float32
    )


def _shelf_pack(sizes: list[tuple[int, int]], max_width: int = 8192):
    """Simple shelf packer: returns (positions, atlas_w, atlas_h).

    sizes: list of (w, h).  Sorted by height desc for decent occupancy; positions are
    returned in the original order.
    """
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i][1])
    pos = [None] * len(sizes)
    shelf_y = 0
    shelf_h = 0
    x = 0
    atlas_w = 0
    for i in order:
        w, h = sizes[i]
        if w > max_width:
            raise ValueError(f"texture {i} wider than atlas max width {max_width}")
        if x + w > max_width:
            shelf_y += shelf_h
            x = 0
            shelf_h = 0
        pos[i] = (x, shelf_y)
        x += w
        shelf_h = max(shelf_h, h)
        atlas_w = max(atlas_w, x)
    atlas_h = shelf_y + shelf_h
    return pos, atlas_w, atlas_h


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def build_atlas(
    images: list[np.ndarray],
    srgb: list[bool] | None = None,
    dtype=jnp.float32,
) -> TextureAtlas:
    """Pack RGBA images into a TextureAtlas.

    images: list of (H, W, 4) uint8 (or float in [0,1]) arrays.
    srgb: per-image flag; sRGB images are linearized on the color channels
    (alpha stays linear).  Defaults to False for all.
    """
    n = len(images)
    if n == 0:
        # 1x1 white dummy so downstream shapes stay static
        data = np.ones((4, 8, 128), np.float32)
        return TextureAtlas(
            data=jnp.asarray(data, dtype),
            uv_offset=jnp.zeros((1, 2), jnp.float32),
            uv_scale=jnp.ones((1, 2), jnp.float32),
        )
    srgb = srgb or [False] * n
    # Each texture is packed with a 1-texel WRAP BORDER (its first column
    # duplicated on the right, first row below, plus the corner): any texel's
    # atlas-space +1 neighbor is then its REPEAT-wrap neighbor, which lets
    # the quad-packed bilinear table (ops/shadetab.py atlas_q) be built with
    # whole-atlas rolls and sampled with ONE gather per tap.
    sizes = [(im.shape[1] + 1, im.shape[0] + 1) for im in images]
    pos, aw, ah = _shelf_pack(sizes)
    # Pad to TPU-friendly tile multiples (f32 tile = 8 x 128).
    aw = _round_up(max(aw, 128), 128)
    ah = _round_up(max(ah, 8), 8)
    atlas = np.zeros((ah, aw, 4), np.float32)
    offsets = np.zeros((n, 2), np.float32)
    scales = np.zeros((n, 2), np.float32)
    for i, im in enumerate(images):
        im = np.asarray(im)
        if im.ndim == 2:
            im = np.repeat(im[..., None], 4, axis=-1)
        if im.shape[-1] == 3:
            im = np.concatenate([im, np.ones_like(im[..., :1])], axis=-1)
        if im.dtype == np.uint8:
            im = im.astype(np.float32) / 255.0
        im = im.astype(np.float32)
        if srgb[i]:
            im = np.concatenate([srgb_to_linear(im[..., :3]), im[..., 3:]], axis=-1)
        x, y = pos[i]
        h, w = im.shape[:2]
        atlas[y : y + h, x : x + w] = im
        atlas[y : y + h, x + w] = im[:, 0]  # wrap border column
        atlas[y + h, x : x + w] = im[0, :]  # wrap border row
        atlas[y + h, x + w] = im[0, 0]  # wrap corner
        offsets[i] = (x, y)
        scales[i] = (w, h)
    return TextureAtlas(
        data=jnp.asarray(atlas.transpose(2, 0, 1), dtype),
        uv_offset=jnp.asarray(offsets),
        uv_scale=jnp.asarray(scales),
    )
