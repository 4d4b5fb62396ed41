"""Dense (matrix-form) fast-path tests: cluster build invariants, primary
trace vs the brute-force oracle, directional occlusion vs any-hit oracle,
and the arbitrary-bundle cluster sweep."""

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu.accel.clusters import build_clusters
from raytracercuda_tpu.config import ClusterConfig, TraceConfig
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.trace.bruteforce import any_hit_brute, trace_brute
from raytracercuda_tpu.trace.dense import (
    occlusion_dense,
    trace_clusters_rays,
    trace_dense,
)
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


# ---------------------------------------------------------------------------
# Build invariants.
# ---------------------------------------------------------------------------

def test_clusters_cover_all_faces_once():
    positions, faces = random_mesh(100, seed=1)
    cs = build_clusters(positions, faces, ClusterConfig(cluster_size=16))
    order = np.asarray(cs.face_order)
    real = order[order >= 0]
    assert sorted(real.tolist()) == list(range(100))
    assert (order < 0).sum() == cs.num_clusters * cs.cluster_size - 100


def test_cluster_aabbs_contain_their_triangles():
    positions, faces = random_mesh(73, seed=2)
    cs = build_clusters(positions, faces, ClusterConfig(cluster_size=8))
    tris = np.asarray(cs.tris).reshape(cs.num_clusters, cs.cluster_size, 3, 3)
    order = np.asarray(cs.face_order).reshape(cs.num_clusters, -1)
    cmin, cmax = np.asarray(cs.cmin), np.asarray(cs.cmax)
    for c in range(cs.num_clusters):
        real = order[c] >= 0
        if not real.any():
            continue
        v = tris[c][real].reshape(-1, 3)
        assert (v.min(axis=0) >= cmin[c] - 1e-5).all()
        assert (v.max(axis=0) <= cmax[c] + 1e-5).all()


# ---------------------------------------------------------------------------
# Primary trace vs oracle.
# ---------------------------------------------------------------------------

def _check_primary(num_faces, seed, tile_px=8, side=32, cluster_size=8,
                   round_k=4, cluster_chunk=8192, tiles_per_chunk=4):
    positions, faces = random_mesh(num_faces, seed=seed)
    cs = build_clusters(positions, faces, ClusterConfig(cluster_size=cluster_size))
    dirs = camera_ray_grid(side, side)
    eye = jnp.zeros(3)
    got = trace_dense(cs, eye, dirs, height=side, width=side, tile_px=tile_px,
                      round_k=round_k, tiles_per_chunk=tiles_per_chunk,
                      cluster_chunk=cluster_chunk)
    want = trace_brute(positions, faces, jnp.zeros((side * side, 3)), dirs)
    hit_got = np.asarray(got.face) >= 0
    hit_want = np.asarray(want.face) >= 0
    np.testing.assert_array_equal(hit_got, hit_want)
    np.testing.assert_allclose(np.asarray(got.t)[hit_want],
                               np.asarray(want.t)[hit_want], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.u)[hit_want],
                               np.asarray(want.u)[hit_want], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.v)[hit_want],
                               np.asarray(want.v)[hit_want], rtol=1e-4, atol=1e-4)
    # Winner identity can differ only between near-equal-t faces.
    same = np.asarray(got.face) == np.asarray(want.face)
    assert same[hit_want].mean() > 0.99
    assert hit_want.any(), "fixture rendered nothing"


def test_dense_matches_brute():
    _check_primary(num_faces=120, seed=31)


def test_dense_many_rounds_exact():
    # round_k=1 forces one cluster per round: the cursor must drop nothing.
    _check_primary(num_faces=90, seed=32, round_k=1)


def test_dense_cluster_chunking_exact():
    # Tiny column chunk: multiple full cull/sort/sweep passes must merge.
    _check_primary(num_faces=120, seed=33, cluster_chunk=4)


def test_dense_tile_sizes():
    _check_primary(num_faces=60, seed=34, tile_px=16, side=32)
    _check_primary(num_faces=60, seed=35, tile_px=4, side=16)


def test_dense_partial_last_cluster_padding_misses():
    # 3 faces in clusters of 16: 13 degenerate padding rows must never hit.
    positions, faces = random_mesh(3, seed=36)
    cs = build_clusters(positions, faces, ClusterConfig(cluster_size=16))
    dirs = camera_ray_grid(16, 16)
    got = trace_dense(cs, jnp.zeros(3), dirs, height=16, width=16, tile_px=8)
    want = trace_brute(positions, faces, jnp.zeros((256, 3)), dirs)
    np.testing.assert_array_equal(np.asarray(got.face) >= 0,
                                  np.asarray(want.face) >= 0)
    assert (np.asarray(got.face) < 3).all()


def test_dense_offset_eye_orientation():
    from raytracercuda_tpu.models.camera import orient_from_pan_pitch
    from raytracercuda_tpu.trace.pipeline import rotate_rays

    positions, faces = random_mesh(100, seed=37)
    cs = build_clusters(positions, faces, ClusterConfig(cluster_size=8))
    side = 32
    rays = camera_ray_grid(side, side)
    orient = jnp.asarray(orient_from_pan_pitch(0.4, -0.25), jnp.float32)
    dirs = rotate_rays(rays, orient)
    eye = jnp.asarray([0.5, -0.3, 0.8], jnp.float32)
    got = trace_dense(cs, eye, dirs, height=side, width=side, tile_px=8)
    want = trace_brute(positions, faces,
                       jnp.broadcast_to(eye, (side * side, 3)), dirs)
    hit = np.asarray(want.face) >= 0
    np.testing.assert_array_equal(np.asarray(got.face) >= 0, hit)
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(want.t)[hit],
                               rtol=1e-5)
    assert hit.any()


# ---------------------------------------------------------------------------
# Occlusion vs any-hit oracle.
# ---------------------------------------------------------------------------

def _check_occlusion(num_faces, seed, light, side=16, tile_px=8, round_k=4,
                     cluster_chunk=8192):
    positions, faces = random_mesh(num_faces, seed=seed)
    cs = build_clusters(positions, faces, ClusterConfig(cluster_size=8))
    rng = np.random.default_rng(seed + 1)
    n = side * side
    origins = jnp.asarray(rng.uniform(-2.0, 2.0, (n, 3)).astype(np.float32))
    origins = origins.at[:, 2].add(3.0)
    active = jnp.asarray(rng.random(n) < 0.8)
    light = jnp.asarray(np.asarray(light, np.float32))
    l = light / jnp.linalg.norm(light)
    got = occlusion_dense(cs, origins, l, active, height=side, width=side,
                          tile_px=tile_px, round_k=round_k,
                          cluster_chunk=cluster_chunk)
    want = any_hit_brute(
        positions, faces, origins, jnp.broadcast_to(l, (n, 3)),
        jnp.full((n,), float(FLT_MAX)),
    ) & active
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.asarray(want).any(), "fixture has no occlusions"


def test_occlusion_dense_matches_brute():
    _check_occlusion(120, seed=7, light=[0.3, 0.8, -0.5])


def test_occlusion_dense_axis_light_and_chunks():
    _check_occlusion(90, seed=8, light=[0.0, 1.0, 0.0], cluster_chunk=4,
                     round_k=1)


def test_occlusion_dense_no_active_rays():
    positions, faces = random_mesh(20, seed=9)
    cs = build_clusters(positions, faces)
    out = occlusion_dense(cs, jnp.zeros((64, 3)),
                          jnp.asarray([0.0, 1.0, 0.0]), jnp.zeros(64, bool),
                          height=8, width=8, tile_px=8)
    assert not np.asarray(out).any()


# ---------------------------------------------------------------------------
# Arbitrary bundles.
# ---------------------------------------------------------------------------

def test_clusters_rays_matches_brute():
    positions, faces = random_mesh(100, seed=11)
    cs = build_clusters(positions, faces, ClusterConfig(cluster_size=8))
    rng = np.random.default_rng(12)
    n = 300
    origins = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    dirs = rng.standard_normal((n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = jnp.asarray(dirs)
    got = trace_clusters_rays(cs, origins, dirs, round_k=4, ray_chunk=128,
                              cluster_chunk=8)
    want = trace_brute(positions, faces, origins, dirs)
    hit = np.asarray(want.face) >= 0
    np.testing.assert_array_equal(np.asarray(got.face) >= 0, hit)
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(want.t)[hit],
                               rtol=1e-5)
    assert hit.any()
