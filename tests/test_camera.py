"""Camera ray-grid and orientation tests against the scalar loop the
reference runs on the CPU (`Raytracer/Camera.cpp:51-68`)."""

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu.models.camera import (
    Camera,
    camera_ray_grid,
    orient_from_pan_pitch,
)
from raytracercuda_tpu.errors import ERROR_ALL_FINE, ERROR_INVALID_PARAMETER


def scalar_ray_grid(w, h, left, right, top, bottom, zoom):
    """Direct transcription of the double loop at `Camera.cpp:51-68`."""
    dx = (right - left) / w
    dy = (bottom - top) / h
    out = np.zeros((h * w, 3), np.float32)
    ry = top + dy * 0.5
    for y in range(h):
        rx = left + dx * 0.5
        for x in range(w):
            d = 1.0 / np.sqrt(zoom * zoom + rx * rx + ry * ry)
            out[y * w + x] = (rx * d, ry * d, zoom * d)
            rx += dx
        ry += dy
    return out


def test_ray_grid_matches_scalar_loop():
    for args in [(8, 6, -1, 1, -1, 1, 1.0), (5, 5, -1, 1, 1, -1, 2.0),
                 (16, 4, -2, 2, -1, 1, 0.5)]:
        got = np.asarray(camera_ray_grid(*args))
        want = scalar_ray_grid(*args)
        assert np.allclose(got, want, atol=1e-6), args


def test_rays_are_normalized():
    rays = np.asarray(camera_ray_grid(32, 32))
    norms = np.linalg.norm(rays, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-6)


def test_center_ray_points_forward():
    rays = np.asarray(camera_ray_grid(101, 101)).reshape(101, 101, 3)
    center = rays[50, 50]
    assert np.allclose(center, [0, 0, 1], atol=2e-2)


def test_orient_identity_and_yaw():
    ident = orient_from_pan_pitch(0.0, 0.0)
    assert np.allclose(ident, np.eye(3), atol=1e-7)
    # yaw of +90deg about +Y maps +Z to +X (glm column convention).
    yaw = orient_from_pan_pitch(np.pi / 2, 0.0)
    assert np.allclose(yaw @ np.array([0, 0, 1.0]), [1, 0, 0], atol=1e-6)
    # pitch of +90deg about +X maps +Y to +Z.
    pitch = orient_from_pan_pitch(0.0, np.pi / 2)
    assert np.allclose(pitch @ np.array([0, 1.0, 0]), [0, 0, 1], atol=1e-6)


def test_camera_api_validation():
    cam = Camera.create()
    assert cam.set_initial_rays(0, 10) == ERROR_INVALID_PARAMETER
    assert cam.set_initial_rays(10, 0) == ERROR_INVALID_PARAMETER
    assert cam.set_initial_rays(16, 16) == ERROR_ALL_FINE
    assert cam.initial_rays.shape == (256, 3)
    # Defaults mirror Beam.h:69 (left=-1,right=1,top=1,bottom=-1,zoom=1).
    want = scalar_ray_grid(16, 16, -1, 1, 1, -1, 1)
    assert np.allclose(np.asarray(cam.initial_rays), want, atol=1e-6)
