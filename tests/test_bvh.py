"""LBVH build + stackless traversal tests: structural invariants and
allclose validation against the brute-force oracle (the strategy SURVEY.md
§4 mandates: acceleration structures validate against the `CUDA 0`-style
reference tracer)."""

import pytest

#: Oracle-comparison suites dominate runtime; the smoke tier skips them.
pytestmark = pytest.mark.slow

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu.accel.bvh import build_bvh, morton3d
from raytracercuda_tpu.config import BvhConfig, TraceConfig
from raytracercuda_tpu.trace.bruteforce import trace_brute
from raytracercuda_tpu.trace.traverse import any_hit_bvh, trace_bvh


def random_mesh(num_faces, seed=0, spread=2.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (num_faces, 3)).astype(np.float32)
    offs = rng.normal(scale=0.3, size=(num_faces, 2, 3)).astype(np.float32)
    verts = np.concatenate(
        [base[:, None], base[:, None] + offs], axis=1
    ).reshape(-1, 3)
    faces = np.arange(num_faces * 3, dtype=np.int32).reshape(-1, 3)
    faces = np.concatenate(
        [faces, np.zeros((num_faces, 1), np.int32)], axis=1
    )
    return jnp.asarray(verts), jnp.asarray(faces)


def test_morton_interleave():
    q = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [3, 3, 3]], jnp.uint32)
    codes = np.asarray(morton3d(q))
    assert codes[0] == 0b100
    assert codes[1] == 0b010
    assert codes[2] == 0b001
    assert codes[3] == 0b111111


def test_bvh_structure_invariants():
    positions, faces = random_mesh(37, seed=1)
    bvh = build_bvh(positions, faces, BvhConfig(max_leaf_faces=1))
    n = 37
    # Root AABB covers all triangles.
    assert np.allclose(np.asarray(bvh.node_min[0]),
                       np.asarray(positions.min(axis=0)), atol=1e-6)
    assert np.allclose(np.asarray(bvh.node_max[0]),
                       np.asarray(positions.max(axis=0)), atol=1e-6)
    # face_order is a permutation.
    assert sorted(np.asarray(bvh.face_order).tolist()) == list(range(n))
    # Karras leaves partition the faces: leaf nodes' counts sum to n.
    is_leaf = np.asarray(bvh.is_leaf)
    counts = np.asarray(bvh.leaf_count)
    assert counts[is_leaf].sum() == n
    # Every leaf's range is within bounds.
    firsts = np.asarray(bvh.leaf_first)[is_leaf]
    lasts = firsts + counts[is_leaf]
    assert firsts.min() >= 0 and lasts.max() <= n


def test_bvh_walk_visits_all_leaves():
    """Walk the skip-link threading on the host: the hit-link/skip-link
    order must enumerate each leaf exactly once."""
    positions, faces = random_mesh(23, seed=2)
    bvh = build_bvh(positions, faces, BvhConfig(max_leaf_faces=2))
    is_leaf = np.asarray(bvh.is_leaf)
    hitl = np.asarray(bvh.hit_link)
    skipl = np.asarray(bvh.skip_link)
    firsts = np.asarray(bvh.leaf_first)
    counts = np.asarray(bvh.leaf_count)
    seen = np.zeros(23, bool)
    cur, steps = 0, 0
    while cur != -1 and steps < 1000:
        if is_leaf[cur]:
            for k in range(counts[cur]):
                slot = firsts[cur] + k
                assert not seen[slot], "face visited twice"
                seen[slot] = True
            cur = skipl[cur]
        else:
            cur = hitl[cur]
        steps += 1
    assert seen.all(), "skip-link walk missed faces"


def _compare_with_brute(num_faces, num_rays, seed, leaf_faces):
    positions, faces = random_mesh(num_faces, seed=seed)
    rng = np.random.default_rng(seed + 100)
    origin = jnp.asarray(rng.uniform(-4, 4, (num_rays, 3)).astype(np.float32))
    direction = jnp.asarray(rng.normal(size=(num_rays, 3)).astype(np.float32))
    cfg = BvhConfig(max_leaf_faces=leaf_faces)
    hit_bvh = trace_bvh(build_bvh(positions, faces, cfg), positions, faces,
                        origin, direction, cfg)
    hit_ref = trace_brute(positions, faces, origin, direction)
    np.testing.assert_array_equal(np.asarray(hit_bvh.face), np.asarray(hit_ref.face))
    np.testing.assert_allclose(np.asarray(hit_bvh.t), np.asarray(hit_ref.t),
                               rtol=1e-5)
    m = np.asarray(hit_ref.face) >= 0
    np.testing.assert_allclose(np.asarray(hit_bvh.u)[m], np.asarray(hit_ref.u)[m],
                               rtol=1e-4, atol=1e-5)


def test_traversal_allclose_vs_brute_small():
    _compare_with_brute(num_faces=50, num_rays=200, seed=3, leaf_faces=1)


def test_traversal_allclose_vs_brute_collapsed_leaves():
    _compare_with_brute(num_faces=64, num_rays=200, seed=4, leaf_faces=4)


def test_traversal_allclose_vs_brute_larger():
    _compare_with_brute(num_faces=300, num_rays=128, seed=5, leaf_faces=4)


def test_single_face_bvh():
    positions = jnp.asarray(
        np.array([[-1, -1, 3], [1, -1, 3], [0, 1, 3]], np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2, 0]], np.int32))
    bvh = build_bvh(positions, faces)
    hit = trace_bvh(bvh, positions, faces,
                    jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, 1.0]]))
    assert int(hit.face[0]) == 0
    assert np.isclose(float(hit.t[0]), 3.0, atol=1e-6)


def test_two_faces_bvh():
    positions, faces = random_mesh(2, seed=6)
    _o = jnp.zeros((8, 3))
    rng = np.random.default_rng(6)
    d = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    bvh = build_bvh(positions, faces)
    hb = trace_bvh(bvh, positions, faces, _o, d)
    hr = trace_brute(positions, faces, _o, d)
    np.testing.assert_array_equal(np.asarray(hb.face), np.asarray(hr.face))


def test_any_hit_shadow_vs_brute():
    positions, faces = random_mesh(80, seed=7)
    rng = np.random.default_rng(7)
    origin = jnp.asarray(rng.uniform(-4, 4, (100, 3)).astype(np.float32))
    direction = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    t_max = jnp.full((100,), 3.0)
    cfg = BvhConfig(max_leaf_faces=4)
    got = any_hit_bvh(build_bvh(positions, faces, cfg), positions, faces,
                      origin, direction, t_max, cfg)
    ref = trace_brute(positions, faces, origin, direction)
    want = (np.asarray(ref.t) > 1e-4) & (np.asarray(ref.t) < 3.0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_duplicate_centroids():
    # Identical triangles -> identical Morton codes: the index tie-break
    # must still produce a valid tree.
    v = np.array([[-1, -1, 2], [1, -1, 2], [0, 1, 2]], np.float32)
    positions = jnp.asarray(np.tile(v, (16, 1)))
    faces_np = np.arange(48, dtype=np.int32).reshape(-1, 3)
    faces = jnp.asarray(
        np.concatenate([faces_np, np.zeros((16, 1), np.int32)], axis=1))
    bvh = build_bvh(positions, faces)
    hit = trace_bvh(bvh, positions, faces,
                    jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, 1.0]]))
    assert int(hit.face[0]) >= 0
    assert np.isclose(float(hit.t[0]), 2.0, atol=1e-6)
