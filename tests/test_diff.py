"""Differentiable-rendering tests: pixel gradients vs central finite
differences on interior (non-silhouette) pixels — the BASELINE.json
validation ("pixel-grad allclose ... vs finite differences").

FD comparisons mask the loss to interior pixels: at silhouettes the true
derivative includes coverage discontinuities that the stop-gradient
formulation (correctly) does not model — SURVEY.md §7 hard-part #2.
"""

import pytest

#: Oracle-comparison suites dominate runtime; the smoke tier skips them.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from raytracercuda_tpu import AccelKind, RenderConfig
from raytracercuda_tpu.accel.bvh import build_bvh
from raytracercuda_tpu.diff.render_grad import l2_image_loss, render_rgb
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.scene import SceneData

BRUTE = RenderConfig(accel=AccelKind.BRUTE)
BVH = RenderConfig(accel=AccelKind.BVH)

grad_scene = lambda f: jax.grad(f, allow_int=True)  # int leaves: faces etc.


def tilted_tri_scene():
    """One tilted triangle filling the image center, with per-vertex
    normals that VARY so the interpolated normal depends on (u,v) and
    gradients flow from shading into geometry and camera."""
    positions = np.array(
        [[-2.0, -2.0, 3.0], [2.0, -2.0, 3.4], [0.0, 2.5, 3.2]], np.float32
    )
    normals = np.array(
        [[0.3, 0.1, -0.95], [-0.2, 0.25, -0.94], [0.05, -0.3, -0.95]], np.float32
    )
    faces = np.array([[0, 1, 2, 0]], np.int32)
    return SceneData(
        positions=jnp.asarray(positions),
        faces=jnp.asarray(faces),
        attrs={1: jnp.asarray(normals)},
        mesh_material=jnp.zeros(1, jnp.int32),
        albedo=jnp.asarray([[0.8, 0.6, 0.4]], jnp.float32),
        texture_id=jnp.asarray([-1], jnp.int32),
        textures=jnp.zeros((1, 1, 1, 3), jnp.float32),
    )


W = H = 9
RAYS = camera_ray_grid(W, H)
EYE = jnp.zeros(3)
ORIENT = jnp.eye(3)

# Interior mask: the center 3x3 pixels (far from the triangle silhouette).
_mask = np.zeros((H, W), np.float32)
_mask[3:6, 3:6] = 1.0
MASK = jnp.asarray(_mask.reshape(-1, 1))


def masked_loss(scene, eye=EYE, orient=ORIENT, config=BRUTE, accel=None):
    img = render_rgb(scene, accel, RAYS, eye, orient, config)
    return jnp.sum((img * MASK) ** 2)


def test_forward_render_shapes_and_values():
    scene = tilted_tri_scene()
    img = render_rgb(scene, None, RAYS, EYE, ORIENT, BRUTE)
    assert img.shape == (81, 3)
    img = np.asarray(img).reshape(9, 9, 3)
    # Center hits (albedo-tinted), corners are background green.
    assert img[4, 4, 0] > 0.01
    assert np.allclose(img[0, 0], [0, 1, 0])


def test_vertex_gradient_matches_finite_difference():
    scene = tilted_tri_scene()
    grad = grad_scene(masked_loss)(scene)
    g_pos = np.asarray(grad.positions)
    assert np.isfinite(g_pos).all() and (np.abs(g_pos) > 0).any()

    eps = 1e-3
    for vi in range(3):
        for ci in (2, 0):
            p = np.asarray(scene.positions).copy()
            p[vi, ci] += eps
            lp = float(masked_loss(scene._replace(positions=jnp.asarray(p))))
            p[vi, ci] -= 2 * eps
            lm = float(masked_loss(scene._replace(positions=jnp.asarray(p))))
            fd = (lp - lm) / (2 * eps)
            assert np.isclose(g_pos[vi, ci], fd, rtol=0.05, atol=1e-4), (
                vi, ci, g_pos[vi, ci], fd)


def test_albedo_and_normal_gradients():
    scene = tilted_tri_scene()
    grad = grad_scene(masked_loss)(scene)
    assert (np.abs(np.asarray(grad.albedo)) > 0).any()
    assert (np.abs(np.asarray(grad.attrs[1])) > 0).any()
    eps = 1e-3
    a = np.asarray(scene.albedo).copy()
    a[0, 0] += eps
    lp = float(masked_loss(scene._replace(albedo=jnp.asarray(a))))
    a[0, 0] -= 2 * eps
    lm = float(masked_loss(scene._replace(albedo=jnp.asarray(a))))
    fd = (lp - lm) / (2 * eps)
    assert np.isclose(float(np.asarray(grad.albedo)[0, 0]), fd, rtol=0.05)


def test_camera_gradient():
    scene = tilted_tri_scene()

    def loss_eye(eye):
        return masked_loss(scene, eye=eye)

    g = np.asarray(jax.grad(loss_eye)(EYE))
    eps = 1e-3
    for ci in range(3):
        e = np.zeros(3, np.float32)
        e[ci] = eps
        fd = (float(loss_eye(jnp.asarray(e))) - float(loss_eye(jnp.asarray(-e)))) / (2 * eps)
        assert np.isclose(g[ci], fd, rtol=0.05, atol=1e-5), (ci, g[ci], fd)
    assert (np.abs(g) > 1e-6).any(), "camera gradient vanished"


def test_texture_gradient_flows():
    scene = tilted_tri_scene()
    uvs = jnp.asarray(np.array([[0.1, 0.1], [0.9, 0.1], [0.5, 0.9]], np.float32))
    scene = scene._replace(
        attrs={**scene.attrs, 2: uvs},
        texture_id=jnp.asarray([0], jnp.int32),
        textures=jnp.ones((1, 4, 4, 3), jnp.float32) * 0.5,
    )
    grad = grad_scene(masked_loss)(scene)
    g_tex = np.asarray(grad.textures)
    assert np.isfinite(g_tex).all()
    assert (np.abs(g_tex) > 0).any(), "no gradient reached the texture"


def test_gradients_with_bvh_backend():
    scene = tilted_tri_scene()
    accel = build_bvh(scene.positions, scene.faces, BVH.bvh)
    g_brute = grad_scene(masked_loss)(scene)
    g_bvh = grad_scene(
        lambda s: masked_loss(s, config=BVH, accel=accel)
    )(scene)
    np.testing.assert_allclose(
        np.asarray(g_bvh.positions), np.asarray(g_brute.positions), rtol=1e-5
    )


def test_shadowed_render_differentiable():
    positions = np.array(
        [[-2, -2, 3], [2, -2, 3], [0, 2.5, 3],
         [-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.5, 2.0]], np.float32
    )
    faces = np.array([[0, 1, 2, 0], [3, 4, 5, 0]], np.int32)
    normals = np.tile([[0, 0, -1]], (6, 1)).astype(np.float32)
    scene = tilted_tri_scene()._replace(
        positions=jnp.asarray(positions),
        faces=jnp.asarray(faces),
        attrs={1: jnp.asarray(normals)},
    )

    def loss(s):
        img = render_rgb(s, None, RAYS, EYE, ORIENT, BRUTE,
                         with_shadows=True, light_dir=(0.0, 0.0, -1.0))
        return jnp.mean(img ** 2)

    g = grad_scene(loss)(scene)
    assert np.isfinite(np.asarray(g.positions)).all()


def test_shadow_darkens_occluded_region():
    # Big back wall at z=4; an occluder panel ABOVE the view axis at z=2.
    # With light direction (0, 0.4, -1) the shadow ray from a wall point
    # near y~1 crosses z=2 at y~1.8 — inside the occluder — while the
    # camera ray to that same wall point crossed z=2 at y~0.5, below the
    # occluder: the point is visible AND shadowed.
    positions = np.array(
        [[-4, -4, 4], [4, -4, 4], [0, 6, 4],            # back wall
         [-1.5, 1.2, 2.0], [1.5, 1.2, 2.0], [0.0, 2.4, 2.0]],  # occluder
        np.float32,
    )
    faces = np.array([[0, 1, 2, 0], [3, 4, 5, 0]], np.int32)
    normals = np.tile([[0, 0, -1]], (6, 1)).astype(np.float32)
    scene = tilted_tri_scene()._replace(
        positions=jnp.asarray(positions),
        faces=jnp.asarray(faces),
        attrs={1: jnp.asarray(normals)},
    )
    light = (0.0, 0.4, -1.0)
    lit = np.asarray(render_rgb(scene, None, RAYS, EYE, ORIENT, BRUTE,
                                with_shadows=False, light_dir=light))
    shad = np.asarray(render_rgb(scene, None, RAYS, EYE, ORIENT, BRUTE,
                                 with_shadows=True, light_dir=light))
    assert (shad <= lit + 1e-6).all()
    assert (shad < lit - 1e-3).any(), "no pixel was shadow-darkened"


# ---------------------------------------------------------------------------
# Formal custom-VJP wrapper + the explicit silhouette contract.
# ---------------------------------------------------------------------------

def test_custom_vjp_matches_autodiff_gradients():
    from raytracercuda_tpu.diff.render_grad import render_rgb_vjp

    scene = tilted_tri_scene()

    def loss_auto(pos, alb):
        img = render_rgb(scene._replace(positions=pos, albedo=alb), None,
                         RAYS, EYE, ORIENT, BRUTE)
        return jnp.sum((img * MASK) ** 2)

    def loss_vjp(pos, alb):
        img = render_rgb_vjp(scene._replace(positions=pos, albedo=alb), None,
                             RAYS, EYE, ORIENT, BRUTE)
        return jnp.sum((img * MASK) ** 2)

    args = (scene.positions, scene.albedo)
    f0, g0 = jax.value_and_grad(loss_auto, argnums=(0, 1))(*args)
    f1, g1 = jax.value_and_grad(loss_vjp, argnums=(0, 1))(*args)
    np.testing.assert_allclose(float(f0), float(f1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0[0]), np.asarray(g1[0]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]),
                               rtol=1e-5, atol=1e-7)


def test_custom_vjp_with_shadows_and_cluster_backend():
    from raytracercuda_tpu.accel.clusters import build_clusters
    from raytracercuda_tpu.diff.render_grad import render_rgb_vjp

    config = RenderConfig(accel=AccelKind.CLUSTER)
    scene = tilted_tri_scene()
    cs = build_clusters(scene.positions, scene.faces, config.cluster)

    def loss(pos):
        img = render_rgb_vjp(scene._replace(positions=pos), cs, RAYS, EYE,
                             ORIENT, config, "lambert", True)
        return jnp.sum((img * MASK) ** 2)

    val, grads = jax.value_and_grad(loss)(scene.positions)
    assert np.isfinite(float(val))
    g = np.asarray(grads)
    assert np.isfinite(g).all() and (g != 0).any()


def test_silhouette_gradients_disagree_with_fd():
    """The documented contract: coverage is a step function, so finite
    differences SEE the silhouette jump while the analytic gradient (which
    models only interior shading) does not.  Uses a flat-shaded triangle:
    interior pixel values are translation-invariant, so the entire FD
    signal at a silhouette-crossing perturbation is the unmodeled Dirac
    term."""
    scene = tilted_tri_scene()
    # Flat normals: shading constant over the face -> interior-only
    # analytic gradient of a translation is ~0.
    n = np.array([[0.0, 0.0, -1.0]] * 3, np.float32)
    scene = scene._replace(attrs={1: jnp.asarray(n)},
                           positions=scene.positions)

    def full_loss(dx):
        sc = scene._replace(positions=scene.positions + jnp.array([1.0, 0, 0]) * dx)
        img = render_rgb(sc, None, RAYS, EYE, ORIENT, BRUTE)
        return jnp.sum(img ** 2)  # NO interior mask: silhouette included

    # Pick a perturbation large enough to move the silhouette across at
    # least one pixel center (coverage must actually change).
    def coverage(dx):
        sc = scene._replace(positions=scene.positions + jnp.array([1.0, 0, 0]) * dx)
        img = render_rgb(sc, None, RAYS, EYE, ORIENT, BRUTE)
        return int((np.asarray(img)[:, 1] < 0.5).sum())  # non-background px

    eps = None
    for cand in (0.05, 0.1, 0.2, 0.35, 0.5):
        if coverage(cand) != coverage(-cand):
            eps = cand
            break
    assert eps is not None, "no coverage flip found; fixture broken"
    fd = (float(full_loss(eps)) - float(full_loss(-eps))) / (2 * eps)
    analytic = float(jax.grad(full_loss)(0.0))
    # Coverage changed across the perturbation -> FD carries a large jump
    # term the analytic gradient must NOT contain.
    assert abs(fd) > 1.0, f"fixture too weak: fd={fd}"
    assert abs(analytic) < 0.05 * abs(fd), (analytic, fd)


def test_fused_shade_matches_generic_route_textured():
    """The fused row-gather shade (`_rows_recompute_shade`, the 1024²
    fast path) must match the generic recompute_hit + shade_lambert_rgb
    route on a TEXTURED scene — including the quad-row bilinear fetch
    (vs sample_texture's four scattered taps) — to fp-noise tolerance,
    and its gradients must preserve exact-zero structure."""
    from raytracercuda_tpu.diff.render_grad import (_rows_recompute_shade,
                                                    hit_nondiff,
                                                    recompute_hit)
    from raytracercuda_tpu.trace.pipeline import rotate_rays
    from raytracercuda_tpu.trace.shade import shade_lambert_rgb

    scene = tilted_tri_scene()
    uvs = jnp.asarray(np.array([[0.05, 0.1], [0.92, 0.13], [0.5, 0.95]],
                               np.float32))
    rng = np.random.default_rng(3)
    scene = scene._replace(
        attrs={**scene.attrs, 2: uvs},
        texture_id=jnp.asarray([0], jnp.int32),
        textures=jnp.asarray(rng.random((1, 8, 8, 3), np.float32)),
    )
    dirs = rotate_rays(RAYS, ORIENT)
    origin = jnp.broadcast_to(EYE[None, :], dirs.shape)
    ids = hit_nondiff(scene, None, origin, dirs, BRUTE).face
    assert int((ids >= 0).sum()) > 10

    fused, _, _ = _rows_recompute_shade(scene, ids, EYE, dirs,
                                        (0.4, 0.8, -0.45),
                                        rays=RAYS, orient=ORIENT)
    hit = recompute_hit(scene, ids, origin, dirs)
    generic = shade_lambert_rgb(scene, hit, origin, dirs)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(generic),
                               rtol=2e-5, atol=2e-6)

    # Gradient zero-structure parity (adam amplifies ANY spurious nonzero
    # into a full-lr step — the r4 regression this guards against).
    def loss_fused(pos):
        img, _, _ = _rows_recompute_shade(
            scene._replace(positions=pos), ids, EYE, dirs,
            (0.4, 0.8, -0.45), rays=RAYS, orient=ORIENT)
        return jnp.sum(img ** 2)

    def loss_generic(pos):
        sc = scene._replace(positions=pos)
        h = recompute_hit(sc, ids, origin, dirs)
        return jnp.sum(shade_lambert_rgb(sc, h, origin, dirs) ** 2)

    gf = np.asarray(jax.grad(loss_fused)(scene.positions))
    gg = np.asarray(jax.grad(loss_generic)(scene.positions))
    np.testing.assert_allclose(gf, gg, rtol=1e-3, atol=1e-6)
    np.testing.assert_array_equal(gf == 0, gg == 0)
