"""Mosaic compile gate: every Pallas entry point compiled + run ON CHIP.

Run with ``RT_ONCHIP=1 python -m pytest tests -m onchip -q`` on a box with
a real TPU.  In the default CPU suite every test here auto-skips.

This tier exists because interpret mode (`ops/pallas_util.interpret_mode`)
is what the CPU suite exercises — it validates semantics but NOT Mosaic
legalization (lane alignment, memref tiling, DMA shapes), which is exactly
how rounds 1 and 2 shipped final commits whose kernels failed to compile
on the chip.  Rule: any commit touching `bench.py`, `trace/pallas_*.py`,
or `ops/{clear,gradient,blob}.py` runs this tier first.

Shapes are tiny so each kernel costs seconds, and the persistent
compilation cache (tests/conftest.py) makes re-runs near-instant.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracercuda_tpu.accel.clusters import build_clusters
from raytracercuda_tpu.config import ClusterConfig, TraceConfig
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.trace.bruteforce import any_hit_brute, trace_brute
from raytracercuda_tpu.types import FLT_MAX

from test_pallas_sweep import setup, sphere_scene

pytestmark = [
    pytest.mark.onchip,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="needs a real TPU (RT_ONCHIP=1)"),
]


def test_onchip_trace_dense_pallas():
    positions, faces, cs, blocks, dirs, eye = setup(num_faces=900, seed=7)
    got = trace_dense_pallas_run(cs, blocks, eye, dirs)
    want = trace_brute(positions, faces, eye, dirs)
    np.testing.assert_array_equal(np.asarray(got.face), np.asarray(want.face))
    assert (np.asarray(want.face) >= 0).any()


def trace_dense_pallas_run(cs, blocks, eye, dirs):
    from raytracercuda_tpu.trace.pallas_sweep import trace_dense_pallas

    return trace_dense_pallas(cs, blocks, eye, dirs, 64, 64)


def test_onchip_occlusion_dense_pallas():
    from raytracercuda_tpu.trace.pallas_sweep import occlusion_dense_pallas

    positions, faces, cs, blocks, dirs, eye = setup(num_faces=900, seed=5)
    hit = trace_brute(positions, faces, eye, dirs)
    light = jnp.asarray([0.3, 0.9, -0.3], jnp.float32)
    light = light / jnp.linalg.norm(light)
    p = eye[None, :] + dirs * jnp.minimum(hit.t, 1e6)[..., None]
    so = jnp.where(hit.hit_mask[..., None], p, eye[None, :]) + light * 1e-3
    got = occlusion_dense_pallas(cs, blocks, so, light, hit.hit_mask, 64, 64)
    want = any_hit_brute(positions, faces, so,
                         jnp.broadcast_to(light, dirs.shape),
                         jnp.full(dirs.shape[:1], float(FLT_MAX)),
                         TraceConfig()) & hit.hit_mask
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_onchip_fused_trace_shade():
    from raytracercuda_tpu.models.scene import SceneData
    from raytracercuda_tpu.ops.interpolate import face_interpolate
    from raytracercuda_tpu.trace.dense import tile_pixels
    from raytracercuda_tpu.trace.pallas_sweep import (
        shade_segment_blocks, trace_shade_tiles_pallas)

    rng = np.random.default_rng(11)
    positions, faces = sphere_scene(900, seed=11)
    nv = positions.shape[0]
    normals = jnp.asarray(rng.standard_normal((nv, 3)).astype(np.float32))
    uvs = jnp.asarray(rng.random((nv, 2)).astype(np.float32))
    scene = SceneData(
        positions=positions, faces=faces,
        attrs={1: normals, 2: uvs},
        mesh_material=jnp.asarray([1], jnp.int32),
        albedo=jnp.asarray(rng.random((2, 3)).astype(np.float32)),
        texture_id=jnp.asarray([-1, 0], jnp.int32),
        textures=jnp.zeros((1, 4, 4, 3), jnp.float32),
    )
    cs = build_clusters(positions, faces, ClusterConfig(cluster_size=128))
    blocks, has_uv = shade_segment_blocks(cs, scene)
    dirs = camera_ray_grid(64, 64)
    eye = jnp.zeros(3, jnp.float32)
    d_tiles = tile_pixels(dirs, 64, 64, 16)
    hit, normal, albedo, tex_uv = trace_shade_tiles_pallas(
        cs, blocks, has_uv, eye, d_tiles)
    want = trace_brute(positions, faces, eye, d_tiles.reshape(-1, 3))
    np.testing.assert_array_equal(np.asarray(hit.face), np.asarray(want.face))
    m = np.asarray(hit.hit_mask)
    assert m.any()
    n_ref = face_interpolate(normals, faces, hit.face, hit.u, hit.v)
    np.testing.assert_allclose(np.asarray(normal)[m], np.asarray(n_ref)[m],
                               rtol=1e-4, atol=1e-5)


def test_onchip_trace_brute_pallas():
    from raytracercuda_tpu.trace.pallas_brute import trace_brute_pallas

    positions, faces = sphere_scene(600, seed=3)
    dirs = camera_ray_grid(32, 32)
    eye = jnp.zeros(3, jnp.float32)
    origin = jnp.broadcast_to(eye[None, :], dirs.shape)
    got = trace_brute_pallas(positions, faces, origin, dirs)
    want = trace_brute(positions, faces, eye, dirs)
    np.testing.assert_array_equal(np.asarray(got.face), np.asarray(want.face))


def test_onchip_frame_kernels():
    from raytracercuda_tpu.ops.blob import blob
    from raytracercuda_tpu.ops.clear import clear_buffer
    from raytracercuda_tpu.ops.gradient import color_gradient

    buf = clear_buffer(64 * 64, jnp.uint32(0xFF00FF00))
    assert (np.asarray(buf) == 0xFF00FF00).all()
    grad = color_gradient(64, 64)
    assert grad.shape == (64 * 64,) and grad.dtype == jnp.uint32
    img = blob(64, 64, 0.5)
    assert img.shape == (64 * 64,) and img.dtype == jnp.uint32
