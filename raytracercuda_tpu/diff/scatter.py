"""Tile-coalesced scatter-add: the Pallas backward for per-ray row gathers.

The differentiable shade path gathers one attribute row per ray
(`render_grad._rows_recompute_shade`); its autodiff backward is an
``[N, D] -> [F, D]`` scatter-add, which XLA lowers to a serial
one-update-at-a-time loop on TPU — measured 78 + 96 ms for the two
gathers of a 1024² frame (MEASUREMENTS.md "r4 close-out"), the single
wall between the config-4 grad step and its 150 ms target.

The TPU-native replacement exploits the renderer's own spatial
structure instead of sorting: rays arrive in PIXEL TILES, and when row
ids live in the acceleration structure's Morton-sorted slot space,
each tile's winners span a narrow, nearly-contiguous id range.  So the
backward becomes, per tile:

  1. take the tile's cotangents ``g [D, B]`` (planar, rays on lanes);
  2. build a one-hot ``[B, R]`` over the tile's id WINDOW
     ``[base, base + R)`` and accumulate ``g @ onehot`` on the MXU —
     a dense matmul instead of N serial updates;
  3. read-modify-write the ``[D, R]`` output slab via async DMA.
     Pallas TPU grid programs execute sequentially on the core, so
     cross-tile accumulation into overlapping slabs is race-free by
     construction (the same reasoning that replaced the reference's
     atomicAdd trees with sort/scan builds — SURVEY.md §2 row 8).

Rays whose id falls outside their tile's window contribute through an
exact XLA scatter fallback that only runs when such rays exist
(``lax.cond`` — the common frame never pays it).  Misses (id < 0)
carry zero cotangent and are dropped by the one-hot.

Reference precedent: none — the reference has no gradients at all; this
is the backward of the capability `BuildTree.cu:367-499` computes
forward-only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_util import interpret_mode


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _scatter_kernel(d_pad: int, b: int, window: int, chunk: int,
                    n_windows: int):
    """One grid program per tile: per window, one-hot matmul + RMW DMA.

    Multiple windows cover multi-modal id groups (a pixel tile seeing two
    meshes scatters into two distant id clusters); a negative base marks
    an unused window slot."""

    def kernel(base_ref, g_ref, idx_ref, in_alias_ref, out_hbm, acc, sem):
        del in_alias_ref  # same buffer as out_hbm (input_output_aliases)
        t = pl.program_id(0)
        idx = idx_ref[0, 0, :]  # [B] int32
        g = g_ref[0, :, :]  # [d_pad, B]

        def window_body(k, _):
            # base is passed flattened [T*K]: a 2-D [T, K] scalar-prefetch
            # operand would be lane-padded K->128 in SMEM (4096 tiles x
            # 128 lanes x 4 B = 2 MB > the 1 MB SMEM budget).
            base_raw = base_ref[t * n_windows + k]
            # Bases are built 128-aligned (`tile_bases`); the hint is what
            # lets Mosaic slice the tiled lane dim at a dynamic offset.
            base = pl.multiple_of(jnp.maximum(base_raw, 0), 128)

            @pl.when(base_raw >= 0)
            def _():
                inb = pltpu.make_async_copy(
                    out_hbm.at[:, pl.ds(base, window)], acc, sem)
                inb.start()
                local = idx - base  # negatives never match the iota
                inb.wait()

                def chunk_body(c, _):
                    r0 = pl.multiple_of(c * chunk, chunk)
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (b, chunk), 1) + r0
                    onehot = (local[:, None] == iota).astype(jnp.float32)
                    # [d_pad, chunk] = g @ onehot (contract rays).  The
                    # one-hot is exact in any precision but DEFAULT would
                    # round g to bf16 on the MXU — gradients must come
                    # out at full f32 (measured 4e-3 rel error without).
                    acc[:, pl.ds(r0, chunk)] += jnp.dot(
                        g, onehot, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    return 0

                jax.lax.fori_loop(0, window // chunk, chunk_body, 0)

                outb = pltpu.make_async_copy(
                    acc, out_hbm.at[:, pl.ds(base, window)], sem)
                outb.start()
                outb.wait()
            return 0

        jax.lax.fori_loop(0, n_windows, window_body, 0)

    return kernel


@partial(jax.jit, static_argnames=("num_rows", "window", "chunk",
                                   "stray_cap"))
def tile_scatter_add(
    g: jnp.ndarray,
    idx: jnp.ndarray,
    base: jnp.ndarray,
    num_rows: int,
    window: int = 2048,
    chunk: int | None = None,
    stray_cap: int = 16384,
) -> jnp.ndarray:
    """Accumulate ``out[:, idx[t,j]] += g[:, t, j]`` -> ``[D, num_rows]``.

    Args:
      g: ``[T, D, B]`` float32 cotangents, rays on lanes (planar).
      idx: ``[T, B]`` int32 target rows; ``< 0`` entries are dropped.
      base: ``[T, K]`` int32 window starts (``K`` disjoint windows per
        tile; ``-1`` = unused slot), each 128-aligned, with
        ``base + window <= padded rows``; ids outside every window go
        through the exact XLA fallback.
      num_rows: F — the real output row count.
      window: per-tile slab width R (multiple of ``chunk``).
      chunk: one-hot matmul column block (multiple of 128).  Default =
        ``window``: ONE matmul dispatch per window — MXU dispatch latency
        inside a Mosaic fori_loop is not pipelined (MEASUREMENTS r3), so
        four [D,B]@[B,512] chunks cost ~4x one [D,B]@[B,2048].
      stray_cap: out-of-window rays are handled by an exact
        sort-compacted segment-sum over at most this many rays; only a
        frame with MORE strays pays the full-size XLA fallback.

    Returns ``[num_rows, D]`` float32 — exactly
    ``segment_sum``-equivalent including out-of-window rays (ids ``< 0``
    are dropped).
    """
    if chunk is None:
        chunk = window
    t, d, b_ = g.shape
    if base.ndim == 1:
        base = base[:, None]
    n_windows = base.shape[1]
    assert idx.shape == (t, b_) and base.shape == (t, n_windows)
    assert window % chunk == 0 and chunk % 128 == 0
    d_pad = _round_up(max(d, 8), 8)
    rows_pad = _round_up(num_rows, 128) + window
    g_pad = jnp.pad(g, ((0, 0), (0, d_pad - d), (0, 0)))

    out = pl.pallas_call(
        _scatter_kernel(d_pad, b_, window, chunk, n_windows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, d_pad, b_), lambda i, _: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, b_), lambda i, _: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                # The accumulator must LIVE in HBM whatever its size: the
                # kernel slices it at a dynamic (per-tile) offset for the
                # RMW DMA, which Mosaic cannot do on a VMEM-resident ref.
                pl.BlockSpec(memory_space=pltpu.HBM),  # out alias
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((d_pad, window), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((d_pad, rows_pad), jnp.float32),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret_mode(),
    )(base.reshape(-1), g_pad, idx.reshape(t, 1, b_),
      jnp.zeros((d_pad, rows_pad), jnp.float32))
    out = out[:d, :num_rows].T

    # Exact fallback for ids outside every window.  Strays are first
    # sort-compacted to the front and only ``stray_cap`` rows hit the XLA
    # scatter (its cost is linear in update rows: a full-frame fallback
    # is the 78-96 ms wall this kernel exists to avoid); a frame with
    # more strays than the cap pays the full-size exact path.  All
    # branches compile; at most one executes.
    covered = jnp.zeros(idx.shape, bool)
    for k in range(n_windows):
        bk = base[:, k:k + 1]
        covered |= (bk >= 0) & (idx >= bk) & (idx < bk + window)
    stray = ((idx >= 0) & ~covered).reshape(-1)
    flat_idx = jnp.where(stray, idx.reshape(-1), num_rows)
    gflat = g.transpose(0, 2, 1).reshape(-1, d)  # [T*B, D]
    cap = min(stray_cap, flat_idx.shape[0])

    def with_stray_full(out):
        gs = jnp.where(stray[:, None], gflat, 0.0)
        return out + jax.ops.segment_sum(
            gs, flat_idx, num_segments=num_rows + 1)[:num_rows]

    def with_stray_compact(out):
        sel = jnp.argsort(~stray, stable=True)[:cap]
        return out + jax.ops.segment_sum(
            jnp.where(stray[sel, None], gflat[sel], 0.0), flat_idx[sel],
            num_segments=num_rows + 1)[:num_rows]

    n_stray = jnp.sum(stray)
    return jax.lax.cond(
        n_stray == 0, lambda o: o,
        lambda o: jax.lax.cond(n_stray <= cap, with_stray_compact,
                               with_stray_full, o),
        out)


def _pallas_ok() -> bool:
    return jax.default_backend() == "tpu" or interpret_mode()


def tile_bases(idx: jnp.ndarray, window: int,
               n_windows: int = 1) -> jnp.ndarray:
    """Per-tile 128-aligned window starts covering the ids present.

    ``idx`` ``[T, B]`` int32 (< 0 ignored) -> ``[T, n_windows]`` int32.
    Greedy: window k starts at the minimum id not covered by windows
    ``< k`` (so windows are disjoint and ascending); unused slots are
    ``-1``.  Multi-modal tiles (e.g. one pixel tile seeing two meshes)
    get one window per id group; anything past the last window takes the
    exact fallback."""
    big = jnp.int32(1 << 30)
    rem = jnp.where(idx >= 0, idx, big)
    bases = []
    for _ in range(n_windows):
        lo = jnp.min(rem, axis=1)
        bk = jnp.where(lo == big, jnp.int32(-1), (lo // 128) * 128)
        bases.append(bk)
        # Remove everything the (aligned) window covers so the next
        # window starts past it — windows stay disjoint.
        rem = jnp.where(rem < bk[:, None] + window, big, rem)
    return jnp.stack(bases, axis=1)


def _retile_2d(x, frame_hw, tp):
    """Row-major ``[H*W, ...]`` -> pixel-tile-major ``[T, tp*tp, ...]``.

    A ``tp x tp`` pixel square spans a far narrower Morton-slot id range
    than the same count of consecutive row-major pixels (a 1 x 256 strip
    crosses many Morton blocks; a 16 x 16 square stays inside a few), so
    windowing the backward on squares is what keeps strays rare."""
    h, w = frame_hw
    lead = x.shape[1:]
    x = x.reshape(h // tp, tp, w // tp, tp, *lead)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((h // tp) * (w // tp), tp * tp, *lead)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def gather_rows_tiled(rows, idx, window, tile_shape, n_windows=2,
                      frame_hw=None):
    """``rows[idx] -> [N, D]`` with a tile-coalesced scatter backward.

    Forward is a plain XLA row gather (fast).  ``idx [N]`` int32 must be
    spatially coherent in blocks of ``tile_shape = (T, B)`` (pixel-tile
    order); ``window`` is the per-tile id span the Pallas backward
    covers directly, ``n_windows`` how many disjoint windows per tile
    (strays beyond them fall back exactly).  When ``frame_hw`` is given
    and divisible, the backward re-tiles rays into 2-D pixel squares
    (`_retile_2d`) instead of row-major strips.  Negative ids gather row
    0 (their cotangent is credited to row 0, exactly like the plain
    gather's backward).
    """
    return rows[jnp.maximum(idx, 0)]


def _gather_fwd(rows, idx, window, tile_shape, n_windows, frame_hw):
    return rows[jnp.maximum(idx, 0)], (idx, rows.shape[0])


def _gather_bwd(window, tile_shape, n_windows, frame_hw, res, gr):
    idx, f = res
    t, b_ = tile_shape
    if not _pallas_ok():
        d_rows = jax.ops.segment_sum(gr, jnp.maximum(idx, 0).reshape(-1),
                                     num_segments=f)
        return (d_rows, None)
    tp = int(b_ ** 0.5)
    if (frame_hw is not None and tp * tp == b_
            and frame_hw[0] % tp == 0 and frame_hw[1] % tp == 0):
        idx_t = _retile_2d(idx, frame_hw, tp)
        g_t = _retile_2d(gr, frame_hw, tp).transpose(0, 2, 1)  # [T, D, B]
    else:
        idx_t = idx.reshape(t, b_)
        g_t = gr.reshape(t, b_, -1).transpose(0, 2, 1)
    # Window on TRUE ids: misses (id < 0) must not burn a window on slot
    # 0 — with them mapped to 0, every sky-containing tile wasted window
    # 1 on [0, 2048) and real geometry strayed into the full-size XLA
    # fallback (the r5 326 ms regression).  The kernel drops id < 0; the
    # forward gathered row 0 for them, so credit their cotangent to row
    # 0 with one masked reduction.
    base = tile_bases(idx_t, window, n_windows)
    d_rows = tile_scatter_add(g_t, idx_t, base, f, window=window)
    miss = jnp.any(idx < 0)
    d_rows = jax.lax.cond(
        miss,
        lambda o: o.at[0].add(
            jnp.sum(jnp.where((idx < 0)[:, None], gr, 0.0), axis=0)),
        lambda o: o,
        d_rows)
    return (d_rows, None)


gather_rows_tiled.defvjp(_gather_fwd, _gather_bwd)
