"""Shared helpers for Pallas TPU tile kernels.

Full-frame kernels address the framebuffer as tiles of ``(8, 128)`` u32
lanes — the TPU-native replacement for the reference's 256-thread CUDA
blocks over a linear pixel index (e.g. `RTClear.cu:24`, `Gradient.cu:50`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SUBLANES = 8
LANES = 128
TILE = SUBLANES * LANES  # pixels per grid step


def interpret_mode() -> bool:
    """Run Pallas in interpreter mode off-TPU (CPU tests use an 8-device
    virtual mesh; Mosaic only targets real TPU)."""
    return jax.default_backend() != "tpu"


def padded_rows(n: int) -> int:
    """Rows of 128 lanes covering n elements, rounded up to a sublane tile."""
    rows = -(-n // LANES)
    return -(-rows // SUBLANES) * SUBLANES


def tile_linear_index(program_id) -> jnp.ndarray:
    """Linear element indices for this grid step's ``(8,128)`` tile."""
    base = program_id * TILE
    row = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    return base + row * LANES + col
