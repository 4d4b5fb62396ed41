"""Silhouette (coverage) gradients: the edge-sampling boundary estimator
(`diff/edge_grad.py`) must AGREE with finite differences of a
supersampled (box-filtered) render at coverage flips — the exact case
`render_rgb_vjp` documents as out of contract
(`test_diff.py::test_silhouette_gradients_disagree_with_fd`)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from raytracercuda_tpu import AccelKind, RenderConfig
from raytracercuda_tpu.config import DiffConfig
from raytracercuda_tpu.diff.edge_grad import build_edge_table
from raytracercuda_tpu.diff.render_grad import (render_rgb,
                                                render_rgb_silhouette)
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.scene import SceneData

W = H = 9
EYE = jnp.zeros(3)
ORIENT = jnp.eye(3)


def flat_tri_scene():
    """One flat-shaded triangle: interior pixel values are
    translation-invariant, so the ENTIRE gradient of a translation is the
    silhouette boundary term."""
    positions = np.array(
        [[-2.0, -2.0, 3.0], [2.0, -2.0, 3.4], [0.0, 2.5, 3.2]], np.float32)
    n = np.array([[0.0, 0.0, -1.0]] * 3, np.float32)
    faces = np.array([[0, 1, 2, 0]], np.int32)
    return SceneData(
        positions=jnp.asarray(positions),
        faces=jnp.asarray(faces),
        attrs={1: jnp.asarray(n)},
        mesh_material=jnp.zeros(1, jnp.int32),
        albedo=jnp.asarray([[0.8, 0.6, 0.4]], jnp.float32),
        texture_id=jnp.asarray([-1], jnp.int32),
        textures=jnp.zeros((1, 1, 1, 3), jnp.float32),
    )


def box_filtered(scene, config, ss=16):
    """Supersampled forward: the box-filter ground truth the boundary
    estimator differentiates."""
    rays = camera_ray_grid(W * ss, H * ss)
    img = render_rgb(scene, None, rays, EYE, ORIENT, config)
    img = np.asarray(img).reshape(H, ss, W, ss, 3).mean(axis=(1, 3))
    return img.reshape(-1, 3)


def test_edge_table():
    faces = np.array([[0, 1, 2, 0], [1, 3, 2, 0]], np.int32)
    ev, ef = build_edge_table(faces)
    assert ev.shape[0] == 5  # 6 directed edges, 1 shared
    shared = [(tuple(v), tuple(f)) for v, f in zip(ev, ef) if f[1] >= 0]
    assert shared == [((1, 2), (0, 1))]
    boundary = [tuple(f) for f in ef if f[1] < 0]
    assert len(boundary) == 4 and all(f[1] == -1 for f in boundary)


@pytest.mark.parametrize("axis", [0, 1])
def test_silhouette_gradient_matches_fd(axis):
    """Linear loss sum(w * I): with flat shading, a translation's gradient
    is PURELY the boundary term; it must match central finite differences
    of the box-filtered image.

    The FD secant over [-eps, +eps] equals the AVERAGE of the true
    gradient over that interval (fundamental theorem), and the loss has
    real curvature at pixel scale — so the analytic side is averaged the
    same way with Simpson's rule (exact to O(eps^4)); what remains is
    only the box-filter staircase noise and the estimator's sampling
    noise."""
    scene = flat_tri_scene()
    config = RenderConfig(
        accel=AccelKind.BRUTE,
        diff=DiffConfig(silhouette=True, edge_samples=2048,
                        edge_offset_px=0.02))
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.uniform(0.2, 1.0, (H * W, 3)).astype(np.float32))
    step = jnp.zeros(3).at[axis].set(1.0)

    def loss(dx):
        sc = scene._replace(positions=scene.positions + step * dx)
        img = render_rgb_silhouette(sc, None, EYE, ORIENT, config, W, H)
        return jnp.sum(img * w)

    g = jax.grad(loss)
    eps = 0.1
    analytic0 = float(g(jnp.float32(0.0)))
    simpson = (float(g(jnp.float32(-eps))) + 4.0 * analytic0
               + float(g(jnp.float32(+eps)))) / 6.0

    fd_imgs = []
    for s in (+eps, -eps):
        sc = scene._replace(positions=scene.positions + step * s)
        fd_imgs.append(box_filtered(sc, config, ss=64))
    fd = float(np.sum((fd_imgs[0] - fd_imgs[1]) * np.asarray(w)) / (2 * eps))

    assert abs(fd) > 0.05, f"fixture too weak: fd={fd}"
    assert analytic0 != 0.0
    assert np.isclose(simpson, fd, rtol=0.12), (simpson, fd)


def test_silhouette_flag_off_reduces_to_interior():
    scene = flat_tri_scene()
    on = RenderConfig(accel=AccelKind.BRUTE,
                      diff=DiffConfig(silhouette=True))
    off = RenderConfig(accel=AccelKind.BRUTE,
                       diff=DiffConfig(silhouette=False))

    def loss(cfg):
        def f(pos):
            sc = scene._replace(positions=pos)
            img = render_rgb_silhouette(sc, None, EYE, ORIENT, cfg, W, H)
            return jnp.sum(img ** 2)
        return np.asarray(jax.grad(f)(scene.positions))

    rays = camera_ray_grid(W, H)

    def interior(pos):
        sc = scene._replace(positions=pos)
        return jnp.sum(render_rgb(sc, None, rays, EYE, ORIENT, off) ** 2)

    g_off = loss(off)
    g_interior = np.asarray(jax.grad(interior)(scene.positions))
    np.testing.assert_allclose(g_off, g_interior, rtol=1e-5, atol=1e-7)
    # And the boundary term actually changes the answer.
    g_on = loss(on)
    assert not np.allclose(g_on, g_off)


def test_silhouette_forward_matches_render_rgb():
    """The silhouette wrapper changes ONLY the backward pass."""
    scene = flat_tri_scene()
    config = RenderConfig(accel=AccelKind.BRUTE)
    rays = camera_ray_grid(W, H)
    a = np.asarray(render_rgb_silhouette(scene, None, EYE, ORIENT, config,
                                         W, H))
    b = np.asarray(render_rgb(scene, None, rays, EYE, ORIENT, config,
                              frame_hw=(H, W)))
    np.testing.assert_array_equal(a, b)
