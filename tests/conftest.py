"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``--xla_force_host_platform_device_count=8`` exactly as SURVEY.md §4.7
prescribes.  Pallas kernels detect the CPU backend and run in interpreter
mode.

Note: this environment's sitecustomize registers an `axon` TPU PJRT
plugin and pins ``jax_platforms`` to it before user code runs, so the
usual ``JAX_PLATFORMS=cpu`` env var is NOT sufficient — the config must be
updated after import, before any backend touch.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
