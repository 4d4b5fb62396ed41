"""Pallas tile-sweep traversal vs the brute oracle (interpret mode on
CPU, Mosaic on TPU): same winners for pinhole frames and directional
occlusion, across segment counts and survivor skews."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracercuda_tpu.accel.clusters import build_clusters
from raytracercuda_tpu.config import ClusterConfig, TraceConfig
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.trace.bruteforce import any_hit_brute, trace_brute
from raytracercuda_tpu.trace.pallas_sweep import (
    occlusion_dense_pallas,
    segment_blocks,
    trace_dense_pallas,
)
from raytracercuda_tpu.types import FLT_MAX


def sphere_scene(num_faces=700, seed=3, spread=0.8, center=(0, 0, 3.0)):
    rng = np.random.default_rng(seed)
    base = (rng.standard_normal((num_faces, 3)) * spread).astype(np.float32)
    base /= np.maximum(np.linalg.norm(base, axis=1, keepdims=True), 1e-6)
    base = base * spread + np.asarray(center, np.float32)
    offs = rng.normal(scale=0.1, size=(num_faces, 2, 3)).astype(np.float32)
    verts = np.concatenate([base[:, None], base[:, None] + offs],
                           axis=1).reshape(-1, 3)
    faces = np.arange(num_faces * 3, dtype=np.int32).reshape(-1, 3)
    faces = np.concatenate([faces, np.zeros((num_faces, 1), np.int32)],
                           axis=1)
    return jnp.asarray(verts), jnp.asarray(faces)


def setup(num_faces=700, side=64, g=128, seed=3):
    positions, faces = sphere_scene(num_faces, seed=seed)
    cs = build_clusters(positions, faces, ClusterConfig(cluster_size=g))
    blocks = segment_blocks(cs)
    dirs = camera_ray_grid(side, side)
    eye = jnp.zeros(3, jnp.float32)
    return positions, faces, cs, blocks, dirs, eye


def test_primary_matches_brute():
    positions, faces, cs, blocks, dirs, eye = setup()
    got = trace_dense_pallas(cs, blocks, eye, dirs, 64, 64)
    want = trace_brute(positions, faces, eye, dirs)
    np.testing.assert_array_equal(np.asarray(got.face), np.asarray(want.face))
    hit = np.asarray(want.face) >= 0
    assert hit.any()
    np.testing.assert_allclose(np.asarray(got.t)[hit],
                               np.asarray(want.t)[hit], rtol=1e-6)


def test_primary_multi_segment():
    # Enough faces for several segments; some tiles see many, some none.
    positions, faces, cs, blocks, dirs, eye = setup(num_faces=2500, seed=9)
    assert cs.num_clusters >= 10
    got = trace_dense_pallas(cs, blocks, eye, dirs, 64, 64)
    want = trace_brute(positions, faces, eye, dirs)
    np.testing.assert_array_equal(np.asarray(got.face), np.asarray(want.face))


def test_primary_all_miss():
    positions, faces, cs, blocks, dirs, eye = setup()
    # Aim away from the scene: everything misses, counts are zero.
    got = trace_dense_pallas(cs, blocks, eye, -dirs, 64, 64)
    assert (np.asarray(got.face) == -1).all()
    assert (np.asarray(got.t) == FLT_MAX).all()


def test_occlusion_matches_brute():
    positions, faces, cs, blocks, dirs, eye = setup(num_faces=1200, seed=5)
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
    assert np.asarray(want).any()  # the scene actually self-shadows


def test_pipeline_routes_pallas_sweep():
    """TraceConfig.use_pallas_sweep routes pinhole frames through the
    kernel with identical results to the XLA dense path."""
    import dataclasses

    from raytracercuda_tpu.config import AccelKind, RenderConfig
    from raytracercuda_tpu.trace.pipeline import trace_hit

    positions, faces, cs, blocks, dirs, eye = setup(num_faces=900, seed=13)
    base = RenderConfig(accel=AccelKind.CLUSTER,
                        cluster=dataclasses.replace(
                            RenderConfig().cluster, cluster_size=128))
    flagged = dataclasses.replace(
        base, trace=dataclasses.replace(base.trace, use_pallas_sweep=True))

    class SceneStub:
        pass

    scene = SceneStub()
    scene.positions, scene.faces = positions, faces
    origin = jnp.broadcast_to(eye[None, :], dirs.shape)
    a = trace_hit(scene, cs, origin, dirs, base, frame_hw=(64, 64),
                  common_origin=eye)
    b = trace_hit(scene, cs, origin, dirs, flagged, frame_hw=(64, 64),
                  common_origin=eye)
    np.testing.assert_array_equal(np.asarray(a.face), np.asarray(b.face))


def test_fused_trace_shade_matches_generic():
    """The fused trace+interpolate kernel returns the same winners as
    brute and the same interpolated normal/albedo/uv as the generic
    attribute chain."""
    from raytracercuda_tpu.models.scene import SceneData
    from raytracercuda_tpu.ops.interpolate import face_interpolate
    from raytracercuda_tpu.trace.dense import tile_pixels
    from raytracercuda_tpu.trace.pallas_sweep import (
        shade_segment_blocks, trace_shade_tiles_pallas)

    rng = np.random.default_rng(21)
    positions, faces = sphere_scene(900, seed=21)
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
    assert has_uv
    dirs = camera_ray_grid(64, 64)
    eye = jnp.zeros(3, jnp.float32)
    d_tiles = tile_pixels(dirs, 64, 64, 16)
    hit, normal, albedo, tex_uv = trace_shade_tiles_pallas(
        cs, blocks, has_uv, eye, d_tiles)
    dirs_t = d_tiles.reshape(-1, 3)

    want = trace_brute(positions, faces, eye, dirs_t)
    np.testing.assert_array_equal(np.asarray(hit.face), np.asarray(want.face))
    m = np.asarray(hit.hit_mask)
    assert m.any()

    n_ref = face_interpolate(normals, faces, hit.face, hit.u, hit.v)
    np.testing.assert_allclose(np.asarray(normal)[m], np.asarray(n_ref)[m],
                               rtol=1e-5, atol=1e-6)
    alb_ref = scene.albedo[scene.mesh_material[faces[jnp.maximum(hit.face, 0), 3]]]
    np.testing.assert_allclose(np.asarray(albedo)[m],
                               np.asarray(alb_ref)[m], rtol=1e-6)
    uv_ref = face_interpolate(uvs, faces, hit.face, hit.u, hit.v)
    np.testing.assert_allclose(np.asarray(tex_uv)[m, 1:],
                               np.asarray(uv_ref)[m], rtol=1e-5, atol=1e-6)
    # tex id column: material 1 has texture 0.
    np.testing.assert_allclose(np.asarray(tex_uv)[m, 0], 0.0)


def test_mt_subnormal_det_is_miss_not_nan():
    """A subnormal (nonzero) determinant overflows 1/det to inf; with the
    ray origin on the triangle vertex the zero numerator then gives
    t = 0*inf = NaN, which would poison the kernel's min/argmin combine.
    The |det| < smallest-normal guard must flag it as a miss (r3 advisor
    finding)."""
    import jax.numpy as jnp
    import numpy as np
    from raytracercuda_tpu.trace.pallas_sweep import _mt_cols, _mt_rows
    from raytracercuda_tpu.types import FLT_MAX

    one = jnp.ones((1, 1), jnp.float32)
    z = jnp.zeros((1, 1), jnp.float32)
    det = np.float32(1e-20) * np.float32(1e-20)
    assert det != 0.0 and det < 1.1754944e-38  # subnormal, not zero
    # v0 at origin; e1/e2 tiny so det = e1 . (d x e2) is subnormal.
    # _mt_rows takes a [16, G] v0|e1|e2 block; _mt_cols takes the 9-tuple.
    block = np.zeros((16, 1), np.float32)
    block[3, 0] = 1e-20  # e1.x
    block[7, 0] = 1e-20  # e2.y
    t, u, v = _mt_rows(jnp.asarray(block), z, z, z, z, z, one, t_eps=1e-5)
    t = np.asarray(t)
    assert np.isfinite(t).all(), "_mt_rows produced NaN/inf t"
    assert (t == FLT_MAX).all(), "_mt_rows did not miss"
    tri = (z, z, z, one * 1e-20, z, z, z, one * 1e-20, z)
    t, u, v = _mt_cols(tri, z, z, z, z, z, one, t_eps=1e-5)
    t = np.asarray(t)
    assert np.isfinite(t).all(), "_mt_cols produced NaN/inf t"
    assert (t == FLT_MAX).all(), "_mt_cols did not miss"
