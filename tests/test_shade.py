"""Shading tests: FaceTables fast path must match the generic
attribute-interpolation chain bit-for-bit (same gathers, same math order
per quantity), with and without textures/shadows."""

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu.models.scene import SceneData
from raytracercuda_tpu.trace.shade import (
    build_face_tables,
    shade_lambert_rgb,
)
from raytracercuda_tpu.types import FLT_MAX, Hit


def rand_scene(num_faces=50, with_uv=False, num_mats=3, seed=0):
    rng = np.random.default_rng(seed)
    nv = num_faces * 3
    positions = rng.standard_normal((nv, 3)).astype(np.float32)
    normals = rng.standard_normal((nv, 3)).astype(np.float32)
    faces = np.arange(nv, dtype=np.int32).reshape(-1, 3)
    mesh_id = np.zeros((num_faces, 1), np.int32)
    attrs = {1: jnp.asarray(normals)}
    if with_uv:
        attrs[2] = jnp.asarray(rng.random((nv, 2)).astype(np.float32))
    return SceneData(
        positions=jnp.asarray(positions),
        faces=jnp.asarray(np.concatenate([faces, mesh_id], axis=1)),
        attrs=attrs,
        mesh_material=jnp.asarray(rng.integers(0, num_mats, 1).astype(np.int32)),
        albedo=jnp.asarray(rng.random((num_mats, 3)).astype(np.float32)),
        texture_id=jnp.asarray(
            np.array([0, -1, 0][:num_mats], np.int32)),
        textures=jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32)),
    )


def rand_hits(num_rays, num_faces, seed=1, miss_frac=0.3):
    rng = np.random.default_rng(seed)
    face = rng.integers(0, num_faces, num_rays).astype(np.int32)
    miss = rng.random(num_rays) < miss_frac
    face[miss] = -1
    u = rng.random(num_rays).astype(np.float32) * 0.5
    v = rng.random(num_rays).astype(np.float32) * 0.5
    t = np.where(miss, FLT_MAX, rng.random(num_rays) + 0.5).astype(np.float32)
    return Hit(t=jnp.asarray(t), u=jnp.asarray(u), v=jnp.asarray(v),
               face=jnp.asarray(face))


def _compare(with_uv, shadows, seed):
    scene = rand_scene(with_uv=with_uv, seed=seed)
    hit = rand_hits(128, 50, seed=seed + 1)
    rng = np.random.default_rng(seed + 2)
    origin = jnp.zeros((128, 3), jnp.float32)
    dirs = jnp.asarray(rng.standard_normal((128, 3)).astype(np.float32))
    shadow = (jnp.asarray(rng.random(128) < 0.5) & hit.hit_mask
              if shadows else None)
    tables = build_face_tables(scene)
    a = shade_lambert_rgb(scene, hit, origin, dirs, shadow_mask=shadow)
    b = shade_lambert_rgb(scene, hit, origin, dirs, shadow_mask=shadow,
                          tables=tables)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6,
                               atol=2e-7)


def test_tables_match_generic_plain():
    _compare(with_uv=False, shadows=False, seed=10)


def test_tables_match_generic_textured():
    _compare(with_uv=True, shadows=False, seed=20)


def test_tables_match_generic_shadowed():
    _compare(with_uv=True, shadows=True, seed=30)
