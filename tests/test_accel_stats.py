"""Accel introspection (`accel/stats.py`) — the `BuildTree.cu:307-360` /
`Hash.cu:223-228` debugging-backend analog."""

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu.accel.bvh import build_bvh
from raytracercuda_tpu.accel.clusters import build_clusters
from raytracercuda_tpu.accel.grid import build_grid
from raytracercuda_tpu.accel.stats import (accel_stats, bvh_stats,
                                           cluster_stats,
                                           cluster_traversal_stats,
                                           grid_stats)
from raytracercuda_tpu.config import BvhConfig, ClusterConfig, GridConfig
from raytracercuda_tpu.models.camera import camera_ray_grid


def soup(n=200, seed=1):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    base[:, 2] += 3.0
    offs = rng.normal(scale=0.2, size=(n, 2, 3)).astype(np.float32)
    verts = np.concatenate([base[:, None], base[:, None] + offs],
                           axis=1).reshape(-1, 3)
    faces = np.concatenate(
        [np.arange(3 * n, dtype=np.int32).reshape(-1, 3),
         np.zeros((n, 1), np.int32)], axis=1)
    return jnp.asarray(verts), jnp.asarray(faces)


def test_bvh_stats():
    pos, faces = soup()
    bvh = build_bvh(pos, faces, BvhConfig())
    s = bvh_stats(bvh)
    assert s["faces"] == 200
    assert s["leaves"] > 0
    # Every leaf reached by the link walk; faces partition into leaves.
    total = s["faces_per_leaf"]["mean"] * s["leaves"]
    assert abs(total - 200) / 200 < 0.05
    assert s["leaf_depth"]["max"] >= s["leaf_depth"]["p50"] > 0


def test_cluster_stats_and_traversal():
    pos, faces = soup()
    cs = build_clusters(pos, faces, ClusterConfig(cluster_size=16))
    s = cluster_stats(cs)
    assert s["faces"] == 200
    assert s["fill"]["max"] <= 16
    assert accel_stats(cs)["structure"] == "cluster"

    rays = camera_ray_grid(32, 32)
    t = cluster_traversal_stats(cs, jnp.zeros(3), jnp.eye(3), rays, 32, 32,
                                tile_px=16)
    assert t["tiles"] == 4
    assert 0 <= t["survivors_per_tile"]["max"] <= s["clusters"]
    assert t["sweep_segments_total"] >= t["survivors_per_tile"]["p50"]


def test_grid_stats():
    pos, faces = soup()
    grid = build_grid(pos, faces, GridConfig())
    s = grid_stats(grid)
    assert s["entries"] > 0
    assert s["live_cells"] <= s["cells"]
    assert s["faces_per_live_cell"]["min"] >= 1
    assert accel_stats(grid)["structure"] == "grid"
