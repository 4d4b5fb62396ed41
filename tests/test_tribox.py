"""SAT triangle/box overlap tests: hand-picked cases + randomized
cross-check against an independent scalar SAT implementation."""

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu.ops.tribox import tri_box_overlap


def ref_sat(center, half, t0, t1, t2):
    """Independent scalar SAT (all 13 axes, interval projection)."""
    v = np.stack([t0, t1, t2]) - center
    edges = [v[1] - v[0], v[2] - v[1], v[0] - v[2]]
    axes = []
    for e in edges:
        for j in range(3):
            unit = np.zeros(3)
            unit[j] = 1.0
            axes.append(np.cross(e, unit))
    axes += [np.eye(3)[j] for j in range(3)]
    axes.append(np.cross(edges[0], edges[1]))
    for ax in axes:
        p = v @ ax
        r = np.abs(ax) @ half
        if p.min() > r or p.max() < -r:
            return False
    return True


def _overlap(center, half, t0, t1, t2):
    return bool(
        tri_box_overlap(
            jnp.array(center, jnp.float32),
            jnp.array(half, jnp.float32),
            jnp.array(t0, jnp.float32),
            jnp.array(t1, jnp.float32),
            jnp.array(t2, jnp.float32),
        )
    )


def test_triangle_inside_box():
    assert _overlap([0, 0, 0], [1, 1, 1], [-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.5, 0])


def test_triangle_outside_box():
    assert not _overlap([0, 0, 0], [1, 1, 1], [2, 2, 2], [3, 2, 2], [2, 3, 2])


def test_triangle_aabb_overlaps_but_plane_separates():
    # Large diagonal triangle whose AABB overlaps the box but whose plane
    # does not reach it: SAT must reject where a pure AABB test accepts.
    assert not _overlap(
        [0, 0, 0], [0.1, 0.1, 0.1],
        [1, -1, 1.5], [-1, 1, 1.5], [1, 1, 1.5],
    )


def test_triangle_pierces_box_face():
    assert _overlap([0, 0, 0], [1, 1, 1], [0, 0, -2], [0, 0, 2], [0.1, 0.1, 0])


def test_randomized_vs_scalar_sat():
    rng = np.random.default_rng(7)
    n = 500
    center = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    half = rng.uniform(0.05, 1.0, (n, 3)).astype(np.float32)
    tri = rng.uniform(-2, 2, (n, 3, 3)).astype(np.float32)
    got = np.asarray(
        tri_box_overlap(
            jnp.array(center), jnp.array(half),
            jnp.array(tri[:, 0]), jnp.array(tri[:, 1]), jnp.array(tri[:, 2]),
        )
    )
    want = np.array([ref_sat(center[i], half[i], *tri[i]) for i in range(n)])
    assert np.array_equal(got, want)
    # Sanity: the random mix exercises both outcomes.
    assert want.sum() > 20 and (~want).sum() > 20


def test_batched_shapes():
    centers = jnp.zeros((4, 3))
    halves = jnp.ones((4, 3))
    t0 = jnp.array([[0, 0, 0]] * 4, jnp.float32)
    t1 = jnp.array([[1, 0, 0]] * 4, jnp.float32)
    t2 = jnp.array([[0, 1, 0]] * 4, jnp.float32)
    out = tri_box_overlap(centers, halves, t0, t1, t2)
    assert out.shape == (4,)
    assert bool(jnp.all(out))
