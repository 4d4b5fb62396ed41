"""Checkpoint/resume (`utils/checkpoint.py`): a resumed inverse-rendering
run and a resumed progressive accumulation must be BIT-IDENTICAL to the
uninterrupted run (fixed accumulation order + deterministic steps)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracercuda_tpu import AccelKind, RenderConfig
from raytracercuda_tpu.accel.bvh import build_bvh
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.scene import SceneData
from raytracercuda_tpu.utils.checkpoint import (
    CheckpointStore,
    restore_train_state,
    save_train_state,
)

BRUTE = RenderConfig(accel=AccelKind.BRUTE)


def tri_scene(jitter=0.0):
    positions = np.array(
        [[-2.0, -2.0, 3.0], [2.0, -2.0, 3.4], [0.0, 2.5, 3.2]], np.float32
    ) + jitter
    normals = np.array(
        [[0.3, 0.1, -0.95], [-0.2, 0.25, -0.94], [0.05, -0.3, -0.95]],
        np.float32)
    return SceneData(
        positions=jnp.asarray(positions),
        faces=jnp.asarray(np.array([[0, 1, 2, 0]], np.int32)),
        attrs={1: jnp.asarray(normals)},
        mesh_material=jnp.zeros(1, jnp.int32),
        albedo=jnp.asarray([[0.8, 0.6, 0.4]], jnp.float32),
        texture_id=jnp.asarray([-1], jnp.int32),
        textures=jnp.zeros((1, 1, 1, 3), jnp.float32),
    )


def _train_setup():
    import optax

    from raytracercuda_tpu.diff.render_grad import render_rgb

    scene = tri_scene()
    target_scene = tri_scene(jitter=0.05)
    rays = camera_ray_grid(16, 16)
    eye, orient = jnp.zeros(3), jnp.eye(3)
    target = render_rgb(target_scene, None, rays, eye, orient, BRUTE)
    optimizer = optax.adam(1e-2)
    params = {"positions": scene.positions}
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            img = render_rgb(scene._replace(positions=p["positions"]),
                             None, rays, eye, orient, BRUTE)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return params, opt_state, step


def test_train_resume_bit_identical(tmp_path):
    params, opt_state, step = _train_setup()
    ckdir = str(tmp_path / "ck")

    # Uninterrupted: 5 steps.
    p, s = params, opt_state
    for i in range(5):
        p, s, loss = step(p, s)
        if i == 2:
            assert save_train_state(ckdir, i, p, s)
    p_full = jax.tree.map(np.asarray, p)

    # Resume from step 2 and run the remaining 2 steps.
    step_idx, state = restore_train_state(ckdir, params, opt_state)
    assert step_idx == 2
    p, s = state["params"], state["opt_state"]
    for _ in range(step_idx + 1, 5):
        p, s, _ = step(p, s)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        p, p_full)


def test_restore_empty_dir_returns_none(tmp_path):
    step, state = restore_train_state(str(tmp_path / "none"), {}, ())
    assert step is None and state is None


def test_store_retention_and_latest(tmp_path):
    with CheckpointStore(str(tmp_path / "r"), max_to_keep=2) as store:
        for i in range(4):
            store.save(i, {"x": jnp.full((3,), float(i))})
        assert store.latest_step() == 3
        got = store.restore({"x": jnp.zeros((3,))})
        np.testing.assert_array_equal(np.asarray(got["x"]),
                                      np.full((3,), 3.0))
        # Retention: oldest steps dropped.
        assert 0 not in store._mgr.all_steps()


def test_progressive_resume_bit_identical(tmp_path):
    from raytracercuda_tpu.trace.progressive import (
        init_progressive,
        progressive_step,
    )

    scene = tri_scene()
    eye, orient = jnp.zeros(3), jnp.eye(3)

    st = init_progressive(16 * 16)
    for _ in range(4):
        st = progressive_step(st, scene, None, eye, orient, 16, 16, BRUTE)
    full = np.asarray(st.image)

    st = init_progressive(16 * 16)
    for _ in range(2):
        st = progressive_step(st, scene, None, eye, orient, 16, 16, BRUTE)
    with CheckpointStore(str(tmp_path / "p")) as store:
        store.save(int(st.count), st._asdict())
        got = store.restore(init_progressive(16 * 16)._asdict())
    from raytracercuda_tpu.trace.progressive import ProgressiveState

    st2 = ProgressiveState(**got)
    assert int(st2.count) == 2
    for _ in range(2):
        st2 = progressive_step(st2, scene, None, eye, orient, 16, 16, BRUTE)
    np.testing.assert_array_equal(np.asarray(st2.image), full)
