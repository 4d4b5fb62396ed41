"""Beam (tile-frustum) traversal tests: must match the brute-force oracle
exactly on pinhole frames, including queue-overflow rounds."""

import pytest

#: Oracle-comparison suites dominate runtime; the smoke tier skips them.
pytestmark = pytest.mark.slow

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu.accel.bvh import build_bvh
from raytracercuda_tpu.config import BvhConfig, TraceConfig
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.trace.beam import trace_beam
from raytracercuda_tpu.trace.bruteforce import trace_brute


def random_mesh(num_faces, seed=0, spread=1.5, z_shift=3.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (num_faces, 3)).astype(np.float32)
    base[:, 2] += z_shift
    offs = rng.normal(scale=0.3, size=(num_faces, 2, 3)).astype(np.float32)
    verts = np.concatenate([base[:, None], base[:, None] + offs], axis=1).reshape(-1, 3)
    faces = np.arange(num_faces * 3, dtype=np.int32).reshape(-1, 3)
    faces = np.concatenate([faces, np.zeros((num_faces, 1), np.int32)], axis=1)
    return jnp.asarray(verts), jnp.asarray(faces)


def _check_beam(num_faces, seed, queue=256, tile_px=8, side=32, leaf=4):
    positions, faces = random_mesh(num_faces, seed=seed)
    cfg = BvhConfig(max_leaf_faces=leaf)
    bvh = build_bvh(positions, faces, cfg)
    dirs = camera_ray_grid(side, side)
    eye = jnp.zeros(3)
    got = trace_beam(bvh, eye, dirs, height=side, width=side,
                     tile_px=tile_px, queue=queue, cfg=cfg)
    want = trace_brute(positions, faces, jnp.zeros((side * side, 3)), dirs)
    np.testing.assert_array_equal(np.asarray(got.face), np.asarray(want.face))
    hit = np.asarray(want.face) >= 0
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(want.t)[hit],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.u)[hit], np.asarray(want.u)[hit],
                               rtol=1e-4, atol=1e-5)
    assert hit.any(), "fixture rendered nothing"


def test_beam_matches_brute():
    _check_beam(num_faces=120, seed=31)


def test_beam_tiny_queue_overflow_rounds_exact():
    # queue=2 forces many walk/test rounds; results must stay exact.
    _check_beam(num_faces=120, seed=32, queue=2)


def test_beam_single_leaf_tree():
    # One big triangle dead ahead (F==1 builds the single-node BVH).
    positions = jnp.asarray(
        np.array([[-2, -2, 3], [2, -2, 3], [0, 2.5, 3]], np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2, 0]], np.int32))
    cfg = BvhConfig()
    bvh = build_bvh(positions, faces, cfg)
    dirs = camera_ray_grid(16, 16)
    got = trace_beam(bvh, jnp.zeros(3), dirs, height=16, width=16,
                     tile_px=8, queue=4, cfg=cfg)
    want = trace_brute(positions, faces, jnp.zeros((256, 3)), dirs)
    np.testing.assert_array_equal(np.asarray(got.face), np.asarray(want.face))
    assert (np.asarray(got.face) >= 0).any()


def test_beam_tile_sizes():
    _check_beam(num_faces=60, seed=34, tile_px=16, side=32)
    _check_beam(num_faces=60, seed=35, tile_px=4, side=16)


def test_beam_offset_eye_and_orientation():
    positions, faces = random_mesh(100, seed=36)
    cfg = BvhConfig()
    bvh = build_bvh(positions, faces, cfg)
    side = 32
    rays = camera_ray_grid(side, side)
    # Rotate the camera and move the eye: beam planes must follow.
    from raytracercuda_tpu.models.camera import orient_from_pan_pitch

    orient = jnp.asarray(orient_from_pan_pitch(0.4, -0.25))
    dirs = rays @ orient.T
    eye = jnp.asarray(np.array([0.5, -0.3, 0.2], np.float32))
    got = trace_beam(bvh, eye, dirs, height=side, width=side, cfg=cfg)
    want = trace_brute(positions, faces,
                       jnp.broadcast_to(eye, (side * side, 3)), dirs)
    np.testing.assert_array_equal(np.asarray(got.face), np.asarray(want.face))


def test_beam_through_pipeline():
    from raytracercuda_tpu import AccelKind, RenderConfig
    from raytracercuda_tpu.models.scene import SceneData
    from raytracercuda_tpu.trace.pipeline import trace_to_buffer

    positions, faces = random_mesh(50, seed=37)
    normals = np.tile([[0, 0, -1]], (positions.shape[0], 1)).astype(np.float32)
    scene = SceneData(
        positions=positions,
        faces=faces,
        attrs={1: jnp.asarray(normals)},
        mesh_material=jnp.zeros(1, jnp.int32),
        albedo=jnp.ones((1, 3), jnp.float32),
        texture_id=jnp.asarray([-1], jnp.int32),
        textures=jnp.zeros((1, 1, 1, 3), jnp.float32),
    )
    config = RenderConfig(accel=AccelKind.BVH)
    bvh = build_bvh(positions, faces, config.bvh)
    rays = camera_ray_grid(32, 32)
    with_beam = trace_to_buffer(scene, bvh, rays, jnp.zeros(3), jnp.eye(3),
                                config, frame_hw=(32, 32))
    without = trace_to_buffer(scene, bvh, rays, jnp.zeros(3), jnp.eye(3),
                              config, frame_hw=None)
    np.testing.assert_array_equal(np.asarray(with_beam), np.asarray(without))


def test_occlusion_beam_matches_brute():
    from raytracercuda_tpu.trace.beam import occlusion_beam
    from raytracercuda_tpu.trace.bruteforce import any_hit_brute
    from raytracercuda_tpu.types import FLT_MAX

    positions, faces = random_mesh(100, seed=41)
    cfg = BvhConfig()
    bvh = build_bvh(positions, faces, cfg)
    side = 32
    rng = np.random.default_rng(41)
    # Shadow origins spread through the cloud; ~half the rays active.
    origins = jnp.asarray(rng.uniform(-1.5, 1.5, (side * side, 3)).astype(np.float32))
    origins = origins.at[:, 2].add(3.0)
    active = jnp.asarray(rng.random(side * side) < 0.6)
    light = jnp.asarray(np.array([0.3, 0.8, -0.5], np.float32))
    light = light / jnp.linalg.norm(light)
    got = occlusion_beam(bvh, origins, light, active, height=side, width=side,
                         tile_px=8, queue=64, cfg=cfg)
    want = any_hit_brute(
        positions, faces, origins,
        jnp.broadcast_to(light, (side * side, 3)),
        jnp.full((side * side,), float(FLT_MAX)),
    ) & active
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.asarray(want).any(), "fixture has no occlusions"


def test_occlusion_beam_no_active_rays():
    from raytracercuda_tpu.trace.beam import occlusion_beam

    positions, faces = random_mesh(10, seed=42)
    bvh = build_bvh(positions, faces, BvhConfig())
    origins = jnp.zeros((64, 3))
    out = occlusion_beam(bvh, origins, jnp.array([0.0, 0.0, 1.0]),
                         jnp.zeros(64, bool), height=8, width=8, tile_px=8)
    assert not bool(np.asarray(out).any())
