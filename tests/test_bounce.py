"""Multi-bounce rendering: the dense/cluster path must match the brute-force
multi-bounce oracle (identical control flow, oracle traces)."""

import pytest

#: Oracle-comparison suites dominate runtime; the smoke tier skips them.
pytestmark = pytest.mark.slow

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu.accel.clusters import build_clusters
from raytracercuda_tpu.config import AccelKind, ClusterConfig, RenderConfig
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.scene import SceneData
from raytracercuda_tpu.trace.bounce import reflect, render_bounces


def mirror_box_scene(seed=0, num_faces=60):
    """A cloud of tinted triangles in front of the camera plus a big mirror
    triangle behind them angled to reflect the cloud."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1.2, 1.2, (num_faces, 3)).astype(np.float32)
    base[:, 2] += 2.5
    offs = rng.normal(scale=0.25, size=(num_faces, 2, 3)).astype(np.float32)
    verts = np.concatenate([base[:, None], base[:, None] + offs], axis=1).reshape(-1, 3)
    # Mirror: large triangle at z ~ 5 tilted toward the cloud.
    mirror = np.array([[-6, -6, 5.0], [6, -6, 5.5], [0, 8, 5.2]], np.float32)
    positions = np.concatenate([verts, mirror])
    faces = np.arange(num_faces * 3, dtype=np.int32).reshape(-1, 3)
    faces = np.concatenate([faces, np.zeros((num_faces, 1), np.int32)], axis=1)
    mface = np.array([[num_faces * 3, num_faces * 3 + 1, num_faces * 3 + 2, 1]],
                     np.int32)
    faces = np.concatenate([faces, mface])
    # Flat normals per vertex (geometric) for shading.
    v = positions[faces[:, 0]], positions[faces[:, 1]], positions[faces[:, 2]]
    n = np.cross(v[1] - v[0], v[2] - v[0])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-9)
    normals = np.zeros_like(positions)
    for i, f in enumerate(faces):
        for k in range(3):
            normals[f[k]] = n[i]
    return SceneData(
        positions=jnp.asarray(positions),
        faces=jnp.asarray(faces),
        attrs={1: jnp.asarray(normals.astype(np.float32))},
        mesh_material=jnp.asarray(np.array([0, 1], np.int32)),
        albedo=jnp.asarray(np.array([[0.8, 0.5, 0.3], [0.2, 0.2, 0.9]], np.float32)),
        texture_id=jnp.asarray(np.array([-1, -1], np.int32)),
        textures=jnp.zeros((1, 1, 1, 3), jnp.float32),
        reflectivity=jnp.asarray(np.array([0.0, 0.8], np.float32)),
    )


def _scene_faces_mesh_ids_fixed(scene):
    # faces[:,3] is the mesh id; mesh_material maps mesh->material.
    return scene


def test_reflect_basic():
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    n = jnp.asarray([[0.0, 0.0, -1.0]])
    out = np.asarray(reflect(d, n))
    np.testing.assert_allclose(out, [[0.0, 0.0, -1.0]], atol=1e-7)


def _compare(num_bounces, side=32, seed=3):
    scene = mirror_box_scene(seed=seed)
    config = RenderConfig(accel=AccelKind.CLUSTER)
    cs = build_clusters(scene.positions, scene.faces, ClusterConfig(cluster_size=8))
    dirs = camera_ray_grid(side, side)
    eye = jnp.zeros(3)
    got = render_bounces(cs, scene, eye, dirs, side, side, config,
                         num_bounces=num_bounces, with_shadows=False)
    want = render_bounces(cs, scene, eye, dirs, side, side, config,
                          num_bounces=num_bounces, with_shadows=False,
                          use_brute=True)
    got, want = np.asarray(got), np.asarray(want)
    # Winner ties at cluster seams may flip a few pixels; the frame as a
    # whole must agree.
    close = np.isclose(got, want, rtol=1e-4, atol=1e-4).all(axis=-1)
    assert close.mean() > 0.995, f"only {close.mean():.4f} pixels match"
    return got, want


def test_one_bounce_matches_oracle():
    got, want = _compare(num_bounces=1)
    # The mirror must actually contribute (reflection visible).
    assert not np.allclose(got, _nobounce_frame(), atol=1e-6)


def _nobounce_frame(side=32, seed=3):
    scene = mirror_box_scene(seed=seed)
    config = RenderConfig(accel=AccelKind.CLUSTER)
    cs = build_clusters(scene.positions, scene.faces, ClusterConfig(cluster_size=8))
    dirs = camera_ray_grid(side, side)
    return np.asarray(render_bounces(cs, scene, jnp.zeros(3), dirs, side, side,
                                     config, num_bounces=0, with_shadows=False))


def test_two_bounces_match_oracle():
    _compare(num_bounces=2)


def test_bounce_with_shadows_matches_oracle():
    scene = mirror_box_scene(seed=5)
    config = RenderConfig(accel=AccelKind.CLUSTER)
    cs = build_clusters(scene.positions, scene.faces, ClusterConfig(cluster_size=8))
    side = 32
    dirs = camera_ray_grid(side, side)
    eye = jnp.zeros(3)
    got = np.asarray(render_bounces(cs, scene, eye, dirs, side, side, config,
                                    num_bounces=1, with_shadows=True))
    want = np.asarray(render_bounces(cs, scene, eye, dirs, side, side, config,
                                     num_bounces=1, with_shadows=True,
                                     use_brute=True))
    close = np.isclose(got, want, rtol=1e-4, atol=1e-4).all(axis=-1)
    assert close.mean() > 0.995


def test_zero_reflectivity_stops_bounces():
    scene = mirror_box_scene(seed=7)
    scene = scene._replace(reflectivity=jnp.zeros(2, jnp.float32))
    config = RenderConfig(accel=AccelKind.CLUSTER)
    cs = build_clusters(scene.positions, scene.faces, ClusterConfig(cluster_size=8))
    side = 16
    dirs = camera_ray_grid(side, side)
    a = np.asarray(render_bounces(cs, scene, jnp.zeros(3), dirs, side, side,
                                  config, num_bounces=0, with_shadows=False))
    b = np.asarray(render_bounces(cs, scene, jnp.zeros(3), dirs, side, side,
                                  config, num_bounces=3, with_shadows=False))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_energy_conserving_no_background_double_count():
    """r3 verdict Weak #6: the old additive model gave mirror pixels
    primary_shade + refl*background, pushing the green channel past 1.0.
    The blend model's path weights sum to 1, so no channel can exceed the
    max of (local shades, background) = 1.0."""
    scene = mirror_box_scene(seed=3)
    config = RenderConfig(accel=AccelKind.CLUSTER)
    cs = build_clusters(scene.positions, scene.faces,
                        ClusterConfig(cluster_size=8))
    side = 32
    dirs = camera_ray_grid(side, side)
    for nb in (1, 2, 3):
        rgb = np.asarray(render_bounces(cs, scene, jnp.zeros(3), dirs, side,
                                        side, config, num_bounces=nb,
                                        with_shadows=False))
        assert rgb.max() <= 1.0 + 1e-5, f"bounces={nb}: max {rgb.max()}"
    # And the blend is exact: a fully-reflective white world stays white.
    white = scene._replace(
        albedo=jnp.ones((2, 3), jnp.float32),
        reflectivity=jnp.asarray(np.array([1.0, 1.0], np.float32)))
    rgb = np.asarray(render_bounces(cs, white, jnp.zeros(3), dirs, side, side,
                                    config, num_bounces=2, with_shadows=False,
                                    background=(1.0, 1.0, 1.0),
                                    light_dir=(0.0, 0.0, -1.0), use_brute=True))
    # ambient + (1-ambient)*ndotl <= 1 and bg = 1: every path weight sums
    # to 1 so nothing exceeds 1 even with r = 1 everywhere.
    assert rgb.max() <= 1.0 + 1e-5


# ---------------------------------------------------------------------------
# Pallas bounce path (`trace/pallas_bounce.py`): force the kernels on (CPU
# runs them through the interpreter) and compare against the same brute
# oracle as the XLA path.
# ---------------------------------------------------------------------------

from raytracercuda_tpu.config import TraceConfig


def _pallas_config():
    return RenderConfig(accel=AccelKind.CLUSTER,
                        trace=TraceConfig(use_pallas_sweep=True))


def _compare_pallas(num_bounces, side=32, seed=3, with_shadows=False):
    scene = mirror_box_scene(seed=seed)
    config = _pallas_config()
    cs = build_clusters(scene.positions, scene.faces,
                        ClusterConfig(cluster_size=128))
    dirs = camera_ray_grid(side, side)
    eye = jnp.zeros(3)
    got = render_bounces(cs, scene, eye, dirs, side, side, config,
                         num_bounces=num_bounces, with_shadows=with_shadows)
    want = render_bounces(cs, scene, eye, dirs, side, side, config,
                          num_bounces=num_bounces, with_shadows=with_shadows,
                          use_brute=True)
    got, want = np.asarray(got), np.asarray(want)
    close = np.isclose(got, want, rtol=1e-4, atol=1e-4).all(axis=-1)
    assert close.mean() > 0.99, f"only {close.mean():.4f} pixels match"
    return got, want


def test_pallas_one_bounce_matches_oracle():
    got, _ = _compare_pallas(num_bounces=1)
    assert not np.allclose(got, _nobounce_frame(), atol=1e-6)


def test_pallas_two_bounces_match_oracle():
    _compare_pallas(num_bounces=2)


def test_pallas_bounce_with_shadows_matches_oracle():
    _compare_pallas(num_bounces=1, seed=5, with_shadows=True)


def test_pallas_zero_bounces_matches_oracle():
    _compare_pallas(num_bounces=0, with_shadows=True)
