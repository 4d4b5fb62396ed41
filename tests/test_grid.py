"""Hashed-grid build + DDA march tests: Fletcher16 parity, CSR structure,
and closest-hit agreement with the brute-force oracle."""

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu.accel.grid import (
    build_grid,
    fletcher16,
    hash3_cells,
    map_cell,
)
from raytracercuda_tpu.config import GridConfig
from raytracercuda_tpu.trace.bruteforce import trace_brute
from raytracercuda_tpu.trace.grid_march import trace_grid


def scalar_fletcher16(h: int) -> int:
    """Direct transcription of `Hash.cu:17-32`."""
    s1 = s2 = 0
    for k in range(4):
        b = (h >> (8 * k)) & 0xFF
        s1 = (s1 + b) % 255
        s2 = (s2 + s1) % 255
    return (s2 << 8) | s1


def test_fletcher16_parity():
    vals = np.array([0, 1, 255, 256, 0xDEADBEEF, 0xFFFFFFFF, 12345], np.uint32)
    got = np.asarray(fletcher16(jnp.asarray(vals)))
    want = np.array([scalar_fletcher16(int(v)) for v in vals], np.uint32)
    np.testing.assert_array_equal(got, want)
    assert got.max() < 65536  # the bmHash assert (`Hash.cu:30`)


def test_hash3_negative_coords():
    # Negative cell coords go through the u32 two's-complement cast, as the
    # CUDA make_uint3 cast does (`Hash.cu:173-174,259`).
    cells = jnp.asarray(np.array([[-1, -2, -3], [0, 0, 0], [5, -5, 7]], np.int32))
    h = np.asarray(hash3_cells(cells, 65536))
    assert ((0 <= h) & (h < 65536)).all()
    w0 = (
        scalar_fletcher16(0xFFFFFFFF)
        + scalar_fletcher16(0xFFFFFFFE)
        + scalar_fletcher16(0xFFFFFFFD)
    ) % 65536
    assert h[0] == w0


def test_map_cell_floor():
    p = jnp.asarray(np.array([[0.0, 0.031, -0.001]], np.float32))
    c = np.asarray(map_cell(p, jnp.float32(0.03)))
    assert (c == [[0, 1, -1]]).all()


def _mesh(num_faces, seed, spread=0.15):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (num_faces, 3)).astype(np.float32)
    offs = rng.normal(scale=0.02, size=(num_faces, 2, 3)).astype(np.float32)
    verts = np.concatenate([base[:, None], base[:, None] + offs], axis=1).reshape(-1, 3)
    faces = np.arange(num_faces * 3, dtype=np.int32).reshape(-1, 3)
    faces = np.concatenate([faces, np.zeros((num_faces, 1), np.int32)], axis=1)
    return jnp.asarray(verts), jnp.asarray(faces)


def test_grid_build_csr_structure():
    positions, faces = _mesh(40, seed=11)
    cfg = GridConfig()
    grid = build_grid(positions, faces, cfg)
    start = np.asarray(grid.cell_start)
    assert start.shape == (cfg.num_cells + 1,)
    assert (np.diff(start) >= 0).all()
    # Every face appears at least once (it overlaps its own cells).
    valid_entries = np.asarray(grid.entries)[: start[-1]]
    assert set(np.unique(valid_entries)) == set(range(40))


def test_grid_march_matches_brute():
    positions, faces = _mesh(60, seed=12)
    rng = np.random.default_rng(12)
    # Rays from outside the cloud, aimed at it (the DDA walks cells from
    # the eye; far-flung rays would exhaust MAX_SEARCH_ITERS as in the
    # reference).
    origin = jnp.broadcast_to(jnp.asarray(np.array([0, 0, -1.0], np.float32)), (300, 3))
    targets = rng.uniform(-0.12, 0.12, (300, 3)).astype(np.float32)
    direction = jnp.asarray(targets) - origin
    grid = build_grid(positions, faces)
    got = trace_grid(grid, positions, faces, origin, direction)
    want = trace_brute(positions, faces, origin, direction)
    g_face, w_face = np.asarray(got.face), np.asarray(want.face)
    g_t, w_t = np.asarray(got.t), np.asarray(want.t)
    # The hash grid (like the reference's) stops at the first cell with any
    # hit, and collisions can surface far faces; but every brute-force hit
    # through the cloud must be found, with identical t where faces agree.
    hit_both = (g_face >= 0) & (w_face >= 0)
    assert (w_face[~(g_face >= 0)] >= 0).sum() == 0, "grid missed hits"
    same = g_face == w_face
    np.testing.assert_allclose(g_t[hit_both & same], w_t[hit_both & same], rtol=1e-5)
    # Overwhelming majority of rays agree exactly.
    assert (same | (w_face < 0)).mean() > 0.95


def test_grid_miss_background():
    positions, faces = _mesh(10, seed=13)
    grid = build_grid(positions, faces)
    origin = jnp.broadcast_to(jnp.asarray(np.array([5.0, 5.0, 5.0], np.float32)), (4, 3))
    direction = jnp.broadcast_to(jnp.asarray(np.array([1.0, 0.0, 0.0], np.float32)), (4, 3))
    hit = trace_grid(grid, positions, faces, origin, direction)
    assert (np.asarray(hit.face) == -1).all()


def test_grid_collision_surfaces_far_face():
    """Characterizes the inherited hash-collision approximation
    (`Hash.cu:280` + `grid_march.py:10-13`): Fletcher16(255) == 0 ==
    Fletcher16(0), so cell (0,0,255) shares bucket 0 with cell (0,0,0).
    A ray standing in cell (0,0,0) therefore tests the colliding far
    cell's faces, and a GENUINE intersection there stops the walk — the
    grid reports a real-but-not-closest hit where brute force finds the
    nearer face it never walked to."""
    cfg = GridConfig()
    res = cfg.cell_res  # 0.03
    assert scalar_fletcher16(255) == 0 and scalar_fletcher16(0) == 0

    def tri_at(z):
        return np.array(
            [[0.002, 0.002, z], [0.028, 0.002, z], [0.015, 0.028, z]],
            np.float32,
        )

    near_z = 100 * res + 0.0015   # cell (0,0,100): bucket != 0
    far_z = 255 * res + 0.0015    # cell (0,0,255): collides with (0,0,0)
    positions = jnp.asarray(np.concatenate([tri_at(near_z), tri_at(far_z)]))
    faces = jnp.asarray(
        np.array([[0, 1, 2, 0], [3, 4, 5, 0]], np.int32))
    grid = build_grid(positions, faces, cfg)

    origin = jnp.asarray(np.array([[0.015, 0.012, 0.0005]], np.float32))
    direction = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
    got = trace_grid(grid, positions, faces, origin, direction, cfg)
    want = trace_brute(positions, faces, origin, direction)

    # Brute force finds the closest face (the near one).
    assert int(np.asarray(want.face)[0]) == 0
    np.testing.assert_allclose(np.asarray(want.t)[0], near_z - 0.0005,
                               rtol=1e-5)
    # The grid reports the FAR face, surfaced by the bucket collision in
    # the very first cell.
    assert int(np.asarray(got.face)[0]) == 1
    # ... but the hit is genuine geometry: t is the oracle's t for that
    # face, never a phantom intersection.
    np.testing.assert_allclose(np.asarray(got.t)[0], far_z - 0.0005,
                               rtol=1e-5)
