"""Tile-coalesced scatter-add (`diff/scatter.py`): exact equality with
``segment_sum`` on every path — windowed, stray-fallback, and the gather
custom-vjp wrapper."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracercuda_tpu.diff.scatter import (gather_rows_tiled, tile_bases,
                                            tile_scatter_add)
from raytracercuda_tpu.ops import pallas_util


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    # CPU tier: run the kernel through the Pallas interpreter (the gather
    # vjp would otherwise take its segment_sum shortcut off-TPU).
    monkeypatch.setattr(pallas_util, "interpret_mode", lambda: True)
    import raytracercuda_tpu.diff.scatter as sc
    monkeypatch.setattr(sc, "interpret_mode", lambda: True)
    yield


def _ref(g, idx, f):
    d = g.shape[1]
    flat = np.maximum(np.asarray(idx).reshape(-1), 0)
    gs = np.asarray(g).transpose(0, 2, 1).reshape(-1, d)
    out = np.zeros((f, d), np.float32)
    np.add.at(out, flat, gs)
    return out


def test_windowed_exact():
    rng = np.random.default_rng(0)
    t, b, d, f = 4, 256, 12, 1024
    # Coherent ids: each tile concentrated in one 300-wide region.
    centers = rng.integers(0, f - 320, t)
    idx = (centers[:, None] + rng.integers(0, 300, (t, b))).astype(np.int32)
    g = rng.normal(size=(t, d, b)).astype(np.float32)
    base = tile_bases(jnp.asarray(idx), 512)
    out = tile_scatter_add(jnp.asarray(g), jnp.asarray(idx), base, f,
                           window=512, chunk=128)
    np.testing.assert_allclose(np.asarray(out), _ref(g, idx, f),
                               rtol=1e-6, atol=1e-6)


def test_stray_fallback_exact():
    rng = np.random.default_rng(1)
    t, b, d, f = 3, 128, 8, 2048
    idx = rng.integers(0, f, (t, b)).astype(np.int32)  # fully random: most stray
    g = rng.normal(size=(t, d, b)).astype(np.float32)
    base = tile_bases(jnp.asarray(idx), 256)
    out = tile_scatter_add(jnp.asarray(g), jnp.asarray(idx), base, f,
                           window=256, chunk=128)
    np.testing.assert_allclose(np.asarray(out), _ref(g, idx, f),
                               rtol=1e-5, atol=1e-5)


def test_misses_accumulate_to_row_zero():
    # The forward gathers rows[max(idx, 0)], so idx = -1 must behave as 0.
    t, b, d, f = 2, 128, 4, 512
    rng = np.random.default_rng(2)
    idx = rng.integers(-1, 40, (t, b)).astype(np.int32)
    g = rng.normal(size=(t, d, b)).astype(np.float32)
    eff = np.maximum(idx, 0).astype(np.int32)
    base = tile_bases(jnp.asarray(eff), 128)
    out = tile_scatter_add(jnp.asarray(g), jnp.asarray(eff), base, f,
                           window=128, chunk=128)
    np.testing.assert_allclose(np.asarray(out), _ref(g, idx, f),
                               rtol=1e-6, atol=1e-6)


def test_gather_vjp_matches_autodiff():
    rng = np.random.default_rng(3)
    t, b, d, f = 4, 128, 10, 768
    centers = rng.integers(0, f - 260, t)
    idx = (centers[:, None] + rng.integers(0, 250, (t, b))).astype(np.int32)
    idx[0, :5] = -1  # some misses
    rows = jnp.asarray(rng.normal(size=(f, d)).astype(np.float32))
    idxj = jnp.asarray(idx.reshape(-1))
    ct = jnp.asarray(rng.normal(size=(t * b, d)).astype(np.float32))

    def loss_fast(r):
        return jnp.sum(gather_rows_tiled(r, idxj, 512, (t, b)) * ct)

    def loss_ref(r):
        return jnp.sum(r[jnp.maximum(idxj, 0)] * ct)

    gf = jax.grad(loss_fast)(rows)
    gr = jax.grad(loss_ref)(rows)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)
    # Forward values identical too.
    np.testing.assert_allclose(np.asarray(loss_fast(rows)),
                               np.asarray(loss_ref(rows)), rtol=1e-6)


def test_two_windows_bimodal_exact():
    """A tile seeing two meshes scatters into two distant id groups —
    covered by two disjoint windows, no fallback needed."""
    rng = np.random.default_rng(4)
    t, b, d, f = 4, 256, 16, 8192
    g1 = rng.integers(0, 300, (t, b // 2))
    g2 = rng.integers(6000, 6300, (t, b // 2))
    idx = np.concatenate([g1, g2], axis=1).astype(np.int32)
    g = rng.normal(size=(t, d, b)).astype(np.float32)
    base = tile_bases(jnp.asarray(idx), 512, n_windows=2)
    bnp = np.asarray(base)
    assert (bnp >= 0).all() and (np.diff(bnp, axis=1) >= 512).all()
    out = tile_scatter_add(jnp.asarray(g), jnp.asarray(idx), base, f,
                           window=512, chunk=128)
    np.testing.assert_allclose(np.asarray(out), _ref(g, idx, f),
                               rtol=1e-6, atol=1e-6)


def test_render_grad_tiled_route_matches_plain(monkeypatch):
    """End-to-end: gradients through `_rows_recompute_shade`'s tiled
    (slot-ordered, Pallas-backward) route equal the plain XLA route."""
    import raytracercuda_tpu.diff.render_grad as rg
    from raytracercuda_tpu.accel.clusters import build_clusters
    from raytracercuda_tpu.config import (AccelKind, ClusterConfig,
                                          RenderConfig)
    from raytracercuda_tpu.models.camera import camera_ray_grid
    from raytracercuda_tpu.models.procedural import bumpy_sphere_mesh
    from raytracercuda_tpu.models.scene import Scene

    config = RenderConfig(accel=AccelKind.CLUSTER)
    scene = Scene.create(config)
    scene.add_mesh(bumpy_sphere_mesh(2000, radius=1.0, center=(0, 0, 3)))
    data = scene.data()
    accel = build_clusters(data.positions, data.faces, ClusterConfig())
    side = 32  # 1024 rays = 4 tiles of 256
    rays = camera_ray_grid(side, side)
    eye = jnp.zeros(3)
    orient = jnp.eye(3)
    target = jnp.zeros((side * side, 3), jnp.float32)

    def loss(p):
        return rg.l2_image_loss(data._replace(positions=p), accel, rays,
                                eye, orient, target, config,
                                frame_hw=(side, side))

    g_plain = jax.grad(loss)(data.positions)
    monkeypatch.setattr(rg, "_FORCE_TILED", True)
    # The render is jitted on static (config, shapes): drop the cached
    # plain-route executable so the flag actually retraces.
    jax.clear_caches()
    g_tiled = jax.grad(loss)(data.positions)
    assert bool((np.asarray(g_tiled) != 0).any())
    np.testing.assert_allclose(np.asarray(g_tiled), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-7)
