"""Fly camera controller (reference Renderer::Update, renderer.cpp:46-101).

Same constants: movement 10 units/s on WASD along the view-forward axis, mouse-look
0.75 rad/s per pixel-delta, pitch clamped to +-1.55 rad.
"""
from __future__ import annotations

import numpy as np

from vulkanhybridrenderer_tpu.scene.gltf import Camera

MOVEMENT_SPEED = 10.0
CAMERA_SPEED = 0.75
PITCH_LIMIT = 1.55


def update_camera(
    camera: Camera,
    dt: float,
    keys: set[str] = frozenset(),
    mouse_delta: tuple[float, float] = (0.0, 0.0),
    mouse_down: bool = False,
) -> Camera:
    """Returns the camera mutated in place (reference mutates scene.camera)."""
    view = camera.view()
    forward = view[2, :3]  # row 2 of the view matrix (renderer.cpp:66)
    forward = forward / np.linalg.norm(forward)
    pos = np.array(camera.position, np.float32)
    if "w" in keys:
        pos -= forward * MOVEMENT_SPEED * dt
    if "s" in keys:
        pos += forward * MOVEMENT_SPEED * dt
    if "a" in keys:
        pos += np.cross(forward, [0.0, 1.0, 0.0]) * MOVEMENT_SPEED * dt
    if "d" in keys:
        pos -= np.cross(forward, [0.0, 1.0, 0.0]) * MOVEMENT_SPEED * dt
    camera.position = pos.astype(np.float32)

    if mouse_down and (mouse_delta[0] != 0.0 or mouse_delta[1] != 0.0):
        camera.yaw -= mouse_delta[0] * CAMERA_SPEED * dt
        camera.pitch -= mouse_delta[1] * CAMERA_SPEED * dt
        camera.pitch = float(np.clip(camera.pitch, -PITCH_LIMIT, PITCH_LIMIT))
    return camera
