"""Progressive accumulation tests: deterministic Halton jitter,
bit-stable accumulation, convergence behavior, differentiability."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracercuda_tpu import AccelKind, RenderConfig
from raytracercuda_tpu.diff.render_grad import render_rgb
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.scene import SceneData
from raytracercuda_tpu.trace.progressive import (
    halton,
    init_progressive,
    jittered_ray_grid,
    progressive_step,
)

BRUTE = RenderConfig(accel=AccelKind.BRUTE)


def tri_scene():
    positions = np.array(
        [[-2.0, -2.0, 3.0], [2.0, -2.0, 3.4], [0.0, 2.5, 3.2]], np.float32
    )
    normals = np.array(
        [[0.3, 0.1, -0.95], [-0.2, 0.25, -0.94], [0.05, -0.3, -0.95]], np.float32
    )
    return SceneData(
        positions=jnp.asarray(positions),
        faces=jnp.asarray(np.array([[0, 1, 2, 0]], np.int32)),
        attrs={1: jnp.asarray(normals)},
        mesh_material=jnp.zeros(1, jnp.int32),
        albedo=jnp.asarray([[0.8, 0.6, 0.4]], jnp.float32),
        texture_id=jnp.asarray([-1], jnp.int32),
        textures=jnp.zeros((1, 1, 1, 3), jnp.float32),
    )


def test_halton_sequence_values():
    # Known radical-inverse values: base 2 -> 1/2, 1/4, 3/4, 1/8...
    got = [float(halton(jnp.int32(i), 2)) for i in (1, 2, 3, 4)]
    assert np.allclose(got, [0.5, 0.25, 0.75, 0.125])
    got3 = [float(halton(jnp.int32(i), 3)) for i in (1, 2, 3)]
    assert np.allclose(got3, [1 / 3, 2 / 3, 1 / 9])


def test_jittered_grid_half_offset_matches_camera_grid():
    a = jittered_ray_grid(8, 8, jnp.float32(0.5), jnp.float32(0.5))
    b = camera_ray_grid(8, 8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_accumulation_is_deterministic():
    scene = tri_scene()
    eye, orient = jnp.zeros(3), jnp.eye(3)

    def run():
        state = init_progressive(64)
        for _ in range(3):
            state = progressive_step(state, scene, None, eye, orient, 8, 8, BRUTE)
        return np.asarray(state.image)

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)  # bit-stable, fixed-order


def test_progressive_mean_matches_average_of_samples():
    scene = tri_scene()
    eye, orient = jnp.zeros(3), jnp.eye(3)
    state = init_progressive(64)
    manual = np.zeros((64, 3), np.float32)
    for s in range(4):
        state = progressive_step(state, scene, None, eye, orient, 8, 8, BRUTE)
        jx, jy = halton(jnp.int32(s + 1), 2), halton(jnp.int32(s + 1), 3)
        rays = jittered_ray_grid(8, 8, jx, jy)
        manual += np.asarray(render_rgb(scene, None, rays, eye, orient, BRUTE))
    assert int(state.count) == 4
    np.testing.assert_allclose(np.asarray(state.image), manual / 4, rtol=1e-6)


def test_progressive_antialiases_edges():
    """Multi-sample accumulation must produce intermediate edge values a
    single center-sample render cannot."""
    scene = tri_scene()
    eye, orient = jnp.zeros(3), jnp.eye(3)
    state = init_progressive(32 * 32)
    for _ in range(8):
        state = progressive_step(state, scene, None, eye, orient, 32, 32, BRUTE)
    img = np.asarray(state.image)
    single = np.asarray(
        render_rgb(scene, None, camera_ray_grid(32, 32), eye, orient, BRUTE)
    )
    # Red channel: single-sample is bimodal (bg 0 / surface value); the
    # accumulated image must contain blends strictly between the modes.
    red = img[:, 0]
    hit_vals = single[single[:, 0] > 0.01, 0]
    lo = hit_vals.min() if hit_vals.size else 0.3
    blended = (red > 0.02) & (red < lo - 0.02)
    assert blended.any(), "no anti-aliased edge pixels found"


def test_progressive_gradients_flow():
    scene = tri_scene()
    eye, orient = jnp.zeros(3), jnp.eye(3)

    def loss(positions):
        s = scene._replace(positions=positions)
        state = init_progressive(64)
        for _ in range(2):
            state = progressive_step(state, s, None, eye, orient, 8, 8, BRUTE)
        return jnp.sum(state.image ** 2)

    g = np.asarray(jax.grad(loss)(scene.positions))
    assert np.isfinite(g).all() and (np.abs(g) > 0).any()


def test_progressive_bit_identical_across_mesh_sizes():
    """SURVEY §7 hard-part #5: the accumulated frame must be BIT-identical
    whether each sample frame renders on 1 device or sharded over 8 —
    fixed-order Halton accumulation plus pixel-band sharding guarantee it."""
    import jax
    from raytracercuda_tpu.parallel.mesh import make_ray_mesh
    from raytracercuda_tpu.parallel.shard import render_sharded
    from raytracercuda_tpu.trace.progressive import (
        halton, init_progressive, jittered_ray_grid)

    scene = tri_scene()
    side = 16
    config = BRUTE

    def accumulate(mesh_devices):
        mesh = make_ray_mesh(mesh_devices)
        state = init_progressive(side * side)
        for s in range(3):
            jx = halton(jnp.int32(s + 1), 2)
            jy = halton(jnp.int32(s + 1), 3)
            rays = jittered_ray_grid(side, side, jx, jy)
            rgb = render_sharded(scene, None, rays, jnp.zeros(3), jnp.eye(3),
                                 config, mesh, frame_hw=(side, side))
            state = state._replace(accum=state.accum + rgb,
                                   count=state.count + 1)
        return np.asarray(state.image)

    a = accumulate(1)
    b = accumulate(8)
    np.testing.assert_array_equal(a, b)
    assert (a != a[0:1]).any(), "fixture rendered a constant frame"
