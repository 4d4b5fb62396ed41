"""Pallas all-pairs Möller–Trumbore sweep — the fused-VMEM oracle kernel.

The XLA brute tracer (`trace/bruteforce.py`) scans triangle chunks with a
``lax.scan``, writing each chunk's ``[R, F_chunk]`` t-matrix through HBM
before the argmin.  This kernel is the same sweep written as a single
Pallas program in the flash-attention shape: a ray block stays resident in
VMEM while triangle blocks stream through, and the compare/select epilogue
and the running (t, index) min-reduction happen in registers/VMEM — the
only HBM traffic is the inputs once and ``[R]`` outputs.

Role parity: the reference's brute kernel `Raytracer/Trace.cu:39-185`
(one thread per ray, full face loop) and the BASELINE north star's
"ray-triangle intersection traversal as a Pallas kernel".

The math mirrors `ops/math.tri_intersect` term for term, and the winner is
re-intersected with the oracle formula outside the kernel, so results are
bit-identical to `trace_brute` for the same winner (ties broken the same
way: first face in scan order wins).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TraceConfig
from ..ops.math import tri_intersect
from ..ops.pallas_util import interpret_mode
from ..types import FLT_MAX, Hit


def _mt_kernel(t_eps: float, block_f: int):
    """Kernel body: rays [BR,3] x triangle block [16,BF] -> running min."""

    def kernel(o_ref, d_ref, tri_ref, bt_ref, bi_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            bt_ref[:] = jnp.full_like(bt_ref, FLT_MAX)
            bi_ref[:] = jnp.zeros_like(bi_ref)

        ox, oy, oz = o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3]  # [BR,1]
        dx, dy, dz = d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3]
        v0x, v0y, v0z = tri_ref[0:1, :], tri_ref[1:2, :], tri_ref[2:3, :]
        v1x, v1y, v1z = tri_ref[3:4, :], tri_ref[4:5, :], tri_ref[5:6, :]
        v2x, v2y, v2z = tri_ref[6:7, :], tri_ref[7:8, :], tri_ref[8:9, :]

        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z  # [1,BF]
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z

        # pvec = d x e2 — outer-product broadcasting [BR,1]*[1,BF].
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv = 1.0 / det  # inf for parallel rays, as in the oracle
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        # qvec = tvec x e1.
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        miss = (u < 0.0) | (u > 1.0) | (v < 0.0) | (u + v > 1.0)
        miss = miss | jnp.isnan(u) | jnp.isnan(v) | jnp.isnan(t)
        t = jnp.where(miss, FLT_MAX, t)
        if t_eps is not None:
            t = jnp.where(t < t_eps, FLT_MAX, t)

        bt_blk = jnp.min(t, axis=1, keepdims=True)  # [BR,1]
        bi_blk = jnp.argmin(t, axis=1).astype(jnp.int32)[:, None] + j * block_f
        better = bt_blk < bt_ref[:]
        bi_ref[:] = jnp.where(better, bi_blk, bi_ref[:])
        bt_ref[:] = jnp.where(better, bt_blk, bt_ref[:])

    return kernel


@partial(jax.jit, static_argnames=("cfg", "block_r", "block_f"))
def trace_brute_pallas(
    positions: jnp.ndarray,
    faces: jnp.ndarray,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    cfg: TraceConfig = TraceConfig(),
    block_r: int = 256,
    block_f: int = 512,
) -> Hit:
    """Closest hit of each ray against all faces (Pallas sweep).

    Drop-in equivalent of ``trace_brute`` (same Hit, same tie-breaking)."""
    num_rays = direction.shape[0]
    num_faces = faces.shape[0]
    if origin.ndim == 1:
        origin = jnp.broadcast_to(origin[None, :], direction.shape)

    v0 = positions[faces[:, 0]]
    v1 = positions[faces[:, 1]]
    v2 = positions[faces[:, 2]]

    # Triangle matrix [16, Fp]: 9 component rows (v0|v1|v2 xyz), transposed
    # so faces ride the 128-wide lane axis; padded rows keep the sublane
    # count tile-aligned, padded faces are degenerate (0/0 -> NaN -> miss).
    fp = -(-num_faces // block_f) * block_f
    tri = jnp.zeros((16, fp), jnp.float32)
    tri = tri.at[0:9, :num_faces].set(
        jnp.concatenate([v0, v1, v2], axis=1).T)

    rp = -(-num_rays // block_r) * block_r
    pad_r = rp - num_rays
    o_p = jnp.pad(origin, ((0, pad_r), (0, 0)))
    d_p = jnp.pad(direction, ((0, pad_r), (0, 0)), constant_values=1.0)

    t_eps = float(cfg.t_epsilon) if cfg.clip_backward_hits else None
    grid = (rp // block_r, fp // block_f)
    bt, bi = pl.pallas_call(
        _mt_kernel(t_eps, block_f),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, block_f), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp, 1), jnp.int32),
        ),
        interpret=interpret_mode(),
    )(o_p, d_p, tri)

    bt = bt[:num_rays, 0]
    bi = jnp.minimum(bi[:num_rays, 0], num_faces - 1)

    # Winner re-intersection with the oracle formula: t/u/v bit-identical
    # to `trace_brute` for the same winning face.
    t, u, v = tri_intersect(origin, direction, v0[bi], v1[bi], v2[bi])
    hit = bt < FLT_MAX
    t = jnp.where(t < FLT_MAX, t, bt)
    return Hit(
        t=jnp.where(hit, t, FLT_MAX),
        u=jnp.where(hit, u, 0.0),
        v=jnp.where(hit, v, 0.0),
        face=jnp.where(hit, bi, -1),
    )
