"""TPU-native hybrid renderer.

A from-scratch, TPU-first (JAX/XLA/Pallas) real-time hybrid rendering framework with the
capabilities of the Vulkan reference (RMichelsen/VulkanHybridRenderer): glTF 2.0 scene
loading into SoA device buffers, a render graph compiling to a single jitted XLA frame
function, four switchable render paths (forward raster / hybrid / full ray-traced /
ray-query), tiled rasterization, LBVH ray tracing, Alchemy SSAO, world-space-raymarch SSR,
shadow mapping with PCF, and SVGF spatiotemporal denoising.

Conventions (documented once, used everywhere):
  * Matrices are (4, 4) float32 applied as ``clip = M @ [x, y, z, 1]``.  This matches the
    mathematical convention of GLM (the reference stores column-major but the math is
    identical).
  * Camera/view space is right-handed, looking down -Z (GLM lookAt convention, reference
    scene_loader.cpp:43-100).
  * NDC is Vulkan-style: x right, **y down**, depth in [0, 1] with **reverse-Z**
    (1 at znear, 0 at infinity; reference vulkan_utils.h:494-503 and
    GLM_FORCE_DEPTH_ZERO_TO_ONE in pch.h:37).  Projections produced by this package bake
    the y-flip in (the reference instead flips the viewport at present time,
    pipeline.cpp:170-178) so that image row 0 is the top of the final image everywhere.
  * Images are channel-planar float32 arrays shaped (C, H, W) (last two dims tile onto
    the TPU's (8, 128) vector registers); row 0 = top.  Pixel (x, y) covers
    uv = ((x + .5)/W, (y + .5)/H) and ndc.xy = uv * 2 - 1.
"""

__version__ = "0.1.0"

from vulkanhybridrenderer_tpu.core import types as types  # noqa: F401
