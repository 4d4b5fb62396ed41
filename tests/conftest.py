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

_ONCHIP = os.environ.get("RT_ONCHIP") == "1"

_flags = os.environ.get("XLA_FLAGS", "")
if not _ONCHIP and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if _ONCHIP:
    # On-chip tier (`RT_ONCHIP=1 pytest tests -m onchip`): keep whatever
    # real accelerator the environment provides so every Pallas kernel
    # compiles under Mosaic instead of the interpreter — the structural
    # fix for two rounds of final commits shipping uncompiled kernels.
    # Persist executables: the remote-compile tunnel costs minutes.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
else:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
