"""A genuine 2-process `jax.distributed` bring-up test (CPU backend).

The reference is strictly single-process (`Program.cpp:121-124`); multi-host
support is a new capability, so it must be exercised by a REAL multi-process
launch, not just a single-process mesh.  Two subprocesses initialize a
distributed CPU runtime via `parallel.mesh.initialize_distributed` (explicit
coordinator args), verify the global device/process view, and run a
cross-process collective."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from raytracercuda_tpu.parallel.mesh import initialize_distributed

pid = int(sys.argv[1])
ok = initialize_distributed(coordinator_address={addr!r}, num_processes=2,
                            process_id=pid)
assert ok, "initialize_distributed returned False for a configured launch"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

import numpy as np
from jax.experimental import multihost_utils

got = multihost_utils.process_allgather(np.array([pid], np.int32))
assert sorted(np.asarray(got).ravel().tolist()) == [0, 1], got
print(f"proc {{pid}}: OK devices={{jax.device_count()}}")
"""


_WORKER_E2E = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from raytracercuda_tpu import AccelKind, RenderConfig, Scene
from raytracercuda_tpu.accel.clusters import build_clusters
from raytracercuda_tpu.diff.render_grad import render_rgb
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.procedural import bumpy_sphere_mesh
from raytracercuda_tpu.parallel.mesh import (initialize_distributed,
                                             make_ray_mesh)
from raytracercuda_tpu.parallel.shard import make_train_step

pid = int(sys.argv[1])
assert initialize_distributed(coordinator_address={addr!r}, num_processes=2,
                              process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 4

# Identical tiny scene on both hosts (deterministic construction).
config = RenderConfig(accel=AccelKind.CLUSTER)
scene = Scene.create(config)
scene.add_mesh(bumpy_sphere_mesh(500, radius=1.0, center=(0.0, 0.0, 3.0),
                                 seed=0))
data = scene.data()
accel = build_clusters(data.positions, data.faces, config.cluster)
jax.block_until_ready(accel)

rays = np.asarray(camera_ray_grid(32, 32))
eye = np.zeros((3,), np.float32)
orient = np.eye(3, dtype=np.float32)
target = np.zeros((rays.shape[0], 3), np.float32)

mesh = make_ray_mesh()
rep = NamedSharding(mesh, P())
shd = NamedSharding(mesh, P("rays"))


def to_global(x, s):
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])


def glob(tree):
    return jax.tree_util.tree_map(lambda l: to_global(l, rep), tree)


import optax
params = {{"positions": np.asarray(data.positions)}}
opt_state = optax.adam(1e-2).init(
    {{k: jnp.asarray(v) for k, v in params.items()}})

step, _ = make_train_step(config, mesh)
out = step(glob(params), glob(opt_state), glob(data), glob(accel),
           to_global(rays, shd), to_global(eye, rep), to_global(orient, rep),
           to_global(target, shd))
new_params, _, loss = jax.block_until_ready(out)
loss = float(np.asarray(loss.addressable_data(0)))

# Single-process full-frame reference on the local default device: the
# distributed psum-reduced loss must equal the undistributed value.
img = render_rgb(data, accel, jnp.asarray(rays), jnp.asarray(eye),
                 jnp.asarray(orient), config)
ref = float(jnp.sum((img - jnp.asarray(target)) ** 2) / (rays.shape[0] * 3))
assert abs(loss - ref) <= 1e-5 * max(1.0, abs(ref)), (loss, ref)

npos = np.asarray(new_params["positions"].addressable_data(0))
assert np.isfinite(npos).all()
assert (npos != np.asarray(data.positions)).any(), "optimizer made no update"
print(f"proc {{pid}}: E2E OK loss={{loss:.6f}}")
"""


def _launch_two(script_tmpl, repo, tag, timeout=420):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = script_tmpl.format(repo=repo, addr=f"localhost:{port}")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: {tag}" in out, out
    return outs


@pytest.mark.slow
def test_two_process_train_step_end_to_end():
    """2 real processes x 2 devices run the FULL distributed train step
    (render -> grad -> cross-process psum -> adam) and the psum-reduced
    loss must equal the single-process full-frame value (SURVEY §4 item 7:
    the multihost regression coverage the bring-up test can't provide)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _launch_two(_WORKER_E2E, repo, "E2E OK")


@pytest.mark.slow
def test_two_process_distributed_cpu(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"
    script = _WORKER.format(repo=repo, addr=addr)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: OK devices=4" in out


def test_initialize_distributed_noop_when_unconfigured(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    from raytracercuda_tpu.parallel.mesh import initialize_distributed

    assert initialize_distributed() is False
