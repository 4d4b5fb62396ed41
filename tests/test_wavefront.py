"""Wavefront traversal tests: must agree exactly with the single-step
traversal and the brute-force oracle (the rounds formulation is exact,
unlike the reference's overflow-dropping 16-entry hit clusters)."""

import pytest

#: Oracle-comparison suites dominate runtime; the smoke tier skips them.
pytestmark = pytest.mark.slow

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu.accel.bvh import build_bvh
from raytracercuda_tpu.config import BvhConfig, WavefrontConfig
from raytracercuda_tpu.trace.bruteforce import trace_brute
from raytracercuda_tpu.trace.wavefront import trace_wavefront


def _mesh(num_faces, seed, spread=2.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (num_faces, 3)).astype(np.float32)
    offs = rng.normal(scale=0.3, size=(num_faces, 2, 3)).astype(np.float32)
    verts = np.concatenate([base[:, None], base[:, None] + offs], axis=1).reshape(-1, 3)
    faces = np.arange(num_faces * 3, dtype=np.int32).reshape(-1, 3)
    faces = np.concatenate([faces, np.zeros((num_faces, 1), np.int32)], axis=1)
    return jnp.asarray(verts), jnp.asarray(faces)


def _check(num_faces, seed, q_cap, leaf_faces=2):
    positions, faces = _mesh(num_faces, seed)
    rng = np.random.default_rng(seed + 1)
    origin = jnp.asarray(rng.uniform(-4, 4, (150, 3)).astype(np.float32))
    direction = jnp.asarray(rng.normal(size=(150, 3)).astype(np.float32))
    cfg = BvhConfig(max_leaf_faces=leaf_faces)
    bvh = build_bvh(positions, faces, cfg)
    got = trace_wavefront(
        bvh, positions, faces, origin, direction, cfg,
        wf_cfg=WavefrontConfig(max_hits_per_ray=q_cap),
    )
    want = trace_brute(positions, faces, origin, direction)
    np.testing.assert_array_equal(np.asarray(got.face), np.asarray(want.face))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t), rtol=1e-5)


def test_wavefront_matches_brute():
    _check(80, seed=21, q_cap=16)


def test_wavefront_tiny_queue_still_exact():
    # Queue capacity 2 forces many rounds; rounds make overflow exact
    # (the reference's fixed cluster would drop hits here).
    _check(80, seed=22, q_cap=2)


def test_wavefront_single_leaf_queue():
    _check(40, seed=23, q_cap=1, leaf_faces=1)


def test_wavefront_ray_chunking_matches_unchunked():
    """Frame-scale ray counts run in ray_chunk blocks (the whole-bundle
    formulation OOMed at 512² — r4); chunked results must equal the
    single-chunk path exactly, including the padded tail."""
    import dataclasses

    from raytracercuda_tpu.config import TraceConfig
    from raytracercuda_tpu.models.camera import camera_ray_grid

    positions, faces = _mesh(60, seed=2)
    bvh = build_bvh(positions, faces, BvhConfig())
    rays = camera_ray_grid(20, 20)  # 400 rays
    origin = jnp.zeros_like(rays)
    small = WavefrontConfig(ray_chunk=128)  # 400 -> 4 chunks, padded tail
    a = trace_wavefront(bvh, positions, faces, origin, rays,
                        BvhConfig(), TraceConfig(), small)
    b = trace_wavefront(bvh, positions, faces, origin, rays,
                        BvhConfig(), TraceConfig(), WavefrontConfig())
    np.testing.assert_array_equal(np.asarray(a.face), np.asarray(b.face))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
