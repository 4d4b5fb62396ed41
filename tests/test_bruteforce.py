"""End-to-end brute-force trace tests on the reference's hand-built quad
fixture (the commented 2-triangle scene at `TestProgram/Program.cpp:153-185`)."""

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu import (
    Camera,
    Mesh,
    RenderConfig,
    Scene,
    AccelKind,
    VERTEX_DATA_NORMAL,
    VERTEX_DATA_POSITION,
)
from raytracercuda_tpu.config import TraceConfig
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.trace.bruteforce import any_hit_brute, trace_brute
from raytracercuda_tpu.trace.pipeline import trace_to_buffer
from raytracercuda_tpu.trace.shade import MISS_COLOR_PACKED
import dataclasses


def quad_mesh():
    """The reference's hand-built fixture (`Program.cpp:153-185`): a quad of
    two triangles at z=1.56 with -z normals."""
    mesh = Mesh.create()
    verts = np.array(
        [[-1, -1, 1.56], [0, 1, 1.56], [1, -1, 1.56], [2, 1, 1.56]], np.float32
    )
    normals = np.tile(np.array([[0, 0, -1]], np.float32), (4, 1))
    indices = np.array([0, 1, 2, 1, 2, 3], np.uint32)
    assert mesh.set_indices(indices, 6) == 0
    assert mesh.set_vertex_data(verts, 4, 3, VERTEX_DATA_POSITION) == 0
    assert mesh.set_vertex_data(normals, 4, 3, VERTEX_DATA_NORMAL) == 0
    return mesh


def quad_scene():
    scene = Scene.create(RenderConfig(accel=AccelKind.BRUTE))
    scene.add_mesh(quad_mesh())
    return scene


def test_center_ray_hits_quad():
    data = quad_scene().data()
    origin = jnp.zeros((1, 3))
    direction = jnp.array([[0.0, 0.0, 1.0]])
    hit = trace_brute(data.positions, data.faces, origin, direction)
    assert int(hit.face[0]) >= 0
    assert np.isclose(float(hit.t[0]), 1.56, atol=1e-5)


def test_ray_misses_quad():
    data = quad_scene().data()
    hit = trace_brute(
        data.positions, data.faces,
        jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, -1.0]]),
    )
    assert int(hit.face[0]) == -1
    assert float(hit.t[0]) > 1e30


def test_closest_of_two_triangles():
    # Two stacked triangles; the nearer must win regardless of face order.
    verts = np.array(
        [[-1, -1, 2], [1, -1, 2], [0, 1, 2],
         [-1, -1, 1], [1, -1, 1], [0, 1, 1]], np.float32
    )
    faces = np.array([[0, 1, 2, 0], [3, 4, 5, 0]], np.int32)
    hit = trace_brute(
        jnp.asarray(verts), jnp.asarray(faces),
        jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, 1.0]]),
    )
    assert int(hit.face[0]) == 1
    assert np.isclose(float(hit.t[0]), 1.0, atol=1e-6)


def test_backward_hit_clipping_toggle():
    data = quad_scene().data()
    origin = jnp.zeros((1, 3))
    direction = jnp.array([[0.0, 0.0, -1.0]])  # quad is behind
    # Default config clips hits behind the origin -> miss.
    hit = trace_brute(data.positions, data.faces, origin, direction)
    assert int(hit.face[0]) == -1
    # Parity mode (reference `bmTriIntersect` has no positivity check,
    # `CudaComon.cuh:117-155`) reports the behind-hit with negative t.
    cfg = TraceConfig(clip_backward_hits=False)
    hit = trace_brute(data.positions, data.faces, origin, direction, cfg)
    assert int(hit.face[0]) >= 0
    assert float(hit.t[0]) < 0


def test_full_frame_parity_shading():
    scene = quad_scene()
    w = h = 33
    rays = camera_ray_grid(w, h)
    buf = np.asarray(
        trace_to_buffer(
            scene.data(), None, rays,
            jnp.zeros(3), jnp.eye(3), scene.config,
        )
    ).reshape(h, w)
    # Center pixel: normal (0,0,-1) -> (u32)(abs(-1)*255)<<16 == red 255.
    assert buf[h // 2, w // 2] == np.uint32(255 << 16)
    # Top-left corner ray points far off the quad -> background 255<<8.
    assert buf[0, 0] == np.uint32(int(MISS_COLOR_PACKED))
    # There must be both hit and miss pixels.
    assert (buf == int(MISS_COLOR_PACKED)).any() and (buf == 255 << 16).any()


def test_any_hit_shadow_query():
    data = quad_scene().data()
    origin = jnp.zeros((2, 3))
    dirs = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    occluded = any_hit_brute(
        data.positions, data.faces, origin, dirs,
        t_max=jnp.full((2,), 10.0),
    )
    assert bool(occluded[0]) and not bool(occluded[1])


def test_tiling_padding_edges():
    # Ray/face counts that do not divide the tile sizes.
    cfg = dataclasses.replace(TraceConfig(), tile_rays_brute=8, tile_faces=4)
    rng = np.random.default_rng(3)
    verts = rng.normal(size=(30, 3)).astype(np.float32)
    faces = np.stack(
        [rng.integers(0, 30, 7), rng.integers(0, 30, 7),
         rng.integers(0, 30, 7), np.zeros(7, np.int64)], axis=1
    ).astype(np.int32)
    dirs = rng.normal(size=(13, 3)).astype(np.float32)
    hit = trace_brute(jnp.asarray(verts), jnp.asarray(faces),
                      jnp.zeros((13, 3)), jnp.asarray(dirs), cfg)
    hit_big = trace_brute(jnp.asarray(verts), jnp.asarray(faces),
                          jnp.zeros((13, 3)), jnp.asarray(dirs))
    assert np.array_equal(np.asarray(hit.face), np.asarray(hit_big.face))
    assert np.allclose(np.asarray(hit.t), np.asarray(hit_big.t))
