"""Pallas all-pairs sweep vs the XLA brute oracle: identical hits on
random scenes (interpret mode on CPU, Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu.config import TraceConfig
from raytracercuda_tpu.trace.bruteforce import trace_brute
from raytracercuda_tpu.trace.pallas_brute import trace_brute_pallas


def rand_scene(num_faces, seed, spread=1.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (num_faces, 3)).astype(np.float32)
    offs = rng.normal(scale=0.3, size=(num_faces, 2, 3)).astype(np.float32)
    verts = np.concatenate([base[:, None], base[:, None] + offs],
                           axis=1).reshape(-1, 3)
    faces = np.arange(num_faces * 3, dtype=np.int32).reshape(-1, 3)
    faces = np.concatenate([faces, np.zeros((num_faces, 1), np.int32)], axis=1)
    return jnp.asarray(verts), jnp.asarray(faces)


def rand_rays(n, seed):
    rng = np.random.default_rng(seed)
    origin = jnp.asarray(
        np.array([0.0, 0.0, -4.0], np.float32)
        + rng.normal(scale=0.2, size=(n, 3)).astype(np.float32))
    target = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    return origin, jnp.asarray(target) - origin


def _check(num_faces, num_rays, seed, **kw):
    positions, faces = rand_scene(num_faces, seed)
    origin, direction = rand_rays(num_rays, seed + 1)
    a = trace_brute(positions, faces, origin, direction)
    b = trace_brute_pallas(positions, faces, origin, direction, **kw)
    np.testing.assert_array_equal(np.asarray(a.face), np.asarray(b.face))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.u), np.asarray(b.u))
    np.testing.assert_array_equal(np.asarray(a.v), np.asarray(b.v))
    assert (np.asarray(a.face) >= 0).any()  # scene actually gets hit


def test_pallas_brute_matches_oracle():
    _check(100, 333, seed=5)


def test_pallas_brute_padding_edges():
    # Ray and face counts straddling block boundaries.
    _check(130, 70, seed=7, block_r=64, block_f=128)


def test_pallas_brute_no_backward_clip():
    positions, faces = rand_scene(60, 11)
    origin, direction = rand_rays(50, 12)
    cfg = TraceConfig(clip_backward_hits=False)
    a = trace_brute(positions, faces, origin, direction, cfg)
    b = trace_brute_pallas(positions, faces, origin, direction, cfg)
    np.testing.assert_array_equal(np.asarray(a.face), np.asarray(b.face))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
