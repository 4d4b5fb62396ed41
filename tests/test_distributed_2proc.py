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
