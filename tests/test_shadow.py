"""Light-space 2D shadow grid: must match the brute-force any-hit oracle
exactly, including overflow triangles and out-of-grid query points."""

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu.trace.bruteforce import any_hit_brute
from raytracercuda_tpu.trace.shadow import build_shadow_grid, occlusion_grid
from raytracercuda_tpu.types import FLT_MAX


def random_mesh(num_faces, seed=0, spread=1.5, z_shift=3.0, scale=0.3):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (num_faces, 3)).astype(np.float32)
    base[:, 2] += z_shift
    offs = rng.normal(scale=scale, size=(num_faces, 2, 3)).astype(np.float32)
    verts = np.concatenate([base[:, None], base[:, None] + offs], axis=1).reshape(-1, 3)
    faces = np.arange(num_faces * 3, dtype=np.int32).reshape(-1, 3)
    faces = np.concatenate([faces, np.zeros((num_faces, 1), np.int32)], axis=1)
    return jnp.asarray(verts), jnp.asarray(faces)


def _check(num_faces, seed, res, kmax, light, n_pts=512, chunk=8, scale=0.3):
    positions, faces = random_mesh(num_faces, seed=seed, scale=scale)
    light = jnp.asarray(np.asarray(light, np.float32))
    grid = build_shadow_grid(positions, faces, light, res=res,
                             max_cells_per_face=kmax)
    rng = np.random.default_rng(seed + 1)
    # Origins spread through and beyond the cloud (tests boundary clamp).
    origins = jnp.asarray(rng.uniform(-2.5, 2.5, (n_pts, 3)).astype(np.float32))
    origins = origins.at[:, 2].add(3.0)
    active = jnp.asarray(rng.random(n_pts) < 0.7)
    got = occlusion_grid(grid, origins, active, chunk=chunk)
    l = light / jnp.linalg.norm(light)
    want = any_hit_brute(
        positions, faces, origins,
        jnp.broadcast_to(l, (n_pts, 3)),
        jnp.full((n_pts,), float(FLT_MAX)),
    ) & active
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.asarray(want).any(), "fixture has no occlusions"


def test_shadow_grid_matches_brute():
    _check(num_faces=120, seed=7, res=32, kmax=16, light=[0.3, 0.8, -0.5])


def test_shadow_grid_axis_aligned_light():
    # Light along +x exercises the helper-axis switch in the basis.
    _check(num_faces=80, seed=8, res=16, kmax=16, light=[1.0, 0.0, 0.0])


def test_shadow_grid_overflow_bucket_exact():
    # Tiny kmax on a fine grid forces most triangles into the overflow
    # bucket; results must stay exact.
    _check(num_faces=60, seed=9, res=64, kmax=2, light=[0.2, -0.7, 0.6],
           scale=0.8)


def test_shadow_grid_no_active_rays():
    positions, faces = random_mesh(10, seed=10)
    grid = build_shadow_grid(positions, faces, jnp.array([0.0, 0.0, 1.0]))
    out = occlusion_grid(grid, jnp.zeros((64, 3)), jnp.zeros(64, bool))
    assert not bool(np.asarray(out).any())


def test_shadow_grid_single_occluder_geometry():
    # A wall at z=5 lit from behind the camera: points in front of the wall
    # along -z are occluded for light (0,0,1); points past it are not.
    positions = jnp.asarray(np.array(
        [[-10, -10, 5], [10, -10, 5], [0, 18, 5]], np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2, 0]], np.int32))
    grid = build_shadow_grid(positions, faces, jnp.array([0.0, 0.0, 1.0]))
    origins = jnp.asarray(np.array(
        [[0, 0, 0], [0, 0, 6], [0, 0, 4.9]], np.float32))
    active = jnp.ones(3, bool)
    out = np.asarray(occlusion_grid(grid, origins, active))
    np.testing.assert_array_equal(out, [True, False, True])
