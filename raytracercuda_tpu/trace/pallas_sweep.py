"""Pallas tile-sweep traversal: ray tiles in VMEM, triangle segments
DMA'd from HBM by survivor list — the BASELINE north star's kernel shape.

This is the Pallas counterpart of `trace/dense.py`'s SWEEP phase, replacing
its sort + gather + chunked-map machinery with one kernel per pixel tile:

  * the tile's 256 ray directions stay resident in VMEM;
  * the per-tile survivor list (segment ids from the conservative frustum
    cull, compacted in XLA) arrives as a per-tile SMEM block (~2 KB/tile;
    the full [T,S] table would blow the 1 MB SMEM budget as a
    scalar-prefetch operand), so the kernel computes DMA source addresses
    from scalars before touching data;
  * each listed segment's triangle block (`[16, G]` component-major, built
    once per scene by `segment_blocks`) is copied HBM -> VMEM with
    double-buffered async DMA — the next segment's copy overlaps the
    current segment's Möller-Trumbore sweep;
  * intersection, compare epilogue, and the running (t, slot) min live
    entirely in VMEM/registers; only `[R]` winners reach HBM.

Reference roles: the kd-tree march `BuildTree.cu:367-499` (per-ray
traversal loop) and the wavefront leaf/face stages `Trace2.cu:69-137`,
fused into one on-chip program per tile.

Exactness: the cull is conservative, every listed segment is swept, and
t/u/v come from the kernel's Möller–Trumbore — the SAME formula as the
oracle, term for term (on-chip it selects the same winners as the exact
all-pairs oracle where the XLA dense path's rearranged algebra flips ~1%
of near-tie pixels; see MEASUREMENTS.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.clusters import ClusterSet
from ..config import TraceConfig
from ..ops.pallas_util import interpret_mode
from ..types import FLT_MAX, Hit
from .occlusion_cull import beam_survive_matrix, swept_tile_beams
from .dense import (
    _CULLED,
    _compact,
    _cull_frustum,
    tile_frustum_planes,
    tile_pixels,
    untile_pixels,
)

# HBM->VMEM triangle-block pipeline: prefetch DMA_DEPTH segments ahead
# through N_BUF rotating buffers (N_BUF > DMA_DEPTH so no in-flight copy
# targets the buffer being swept).  Measured NEUTRAL vs classic depth-1
# double buffering on the bunny frame (stage1 6.6 vs 6.5 ms) — the sweep
# is VPU-bound, not DMA-latency-bound; kept at 3 as free headroom for
# scenes with shorter survivor lists per tile.
N_BUF = 4
DMA_DEPTH = 3

# Smallest normal float32: dets below this overflow 1/det to inf, which a
# zero numerator turns into NaN t — treat as degenerate (miss).
_DET_TINY = 1.1754944e-38


def segment_blocks(cs: ClusterSet) -> jnp.ndarray:
    """``[C, 16, G]`` component-major triangle blocks (9 rows: v0|e1|e2
    xyz with e1 = v1-v0, e2 = v2-v0; 7 zero rows pad the sublane tile).
    Built once per scene.  The edges are precomputed HOST-side — the same
    f32 subtraction the kernel would do, so results are bit-identical to
    the oracle's `tri_intersect`, minus 6 VPU ops per sweep round."""
    v0 = cs.tris[..., 0:3]
    e = jnp.concatenate([v0, cs.tris[..., 3:6] - v0, cs.tris[..., 6:9] - v0],
                        axis=-1)
    t = e.transpose(0, 2, 1)  # [C, 9, G]
    return jnp.pad(t, ((0, 0), (0, 7), (0, 0)))


def _mt_rows(tri, ox, oy, oz, dx, dy, dz, t_eps):
    """MT of rays (scalar o, [R,1] d) against a [16,G] v0|e1|e2 block ->
    t [R,G].  Mirrors `ops/math.tri_intersect` term for term (the edge
    subtractions are precomputed host-side, bit-identically)."""
    v0x, v0y, v0z = tri[0:1, :], tri[1:2, :], tri[2:3, :]
    e1x, e1y, e1z = tri[3:4, :], tri[4:5, :], tri[5:6, :]
    e2x, e2y, e2z = tri[6:7, :], tri[7:8, :], tri[8:9, :]
    # pvec = d x e2 : [R,G]
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv = 1.0 / det
    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z  # [1,G] or [R,G]
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    # qvec = tvec x e1 : [1,G] (or [R,G] when origins vary per ray)
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
    miss = (u < 0.0) | (u > 1.0) | (v < 0.0) | (u + v > 1.0)
    # |det| below the smallest normal is the only finite-input source of
    # NaN t (1/det overflows to inf; a zero numerator then gives 0*inf).
    # A nonzero numerator over a degenerate det gives +/-inf, which the
    # range tests already reject — so one magnitude compare replaces the
    # oracle's three isnan guards (`ops/math.tri_intersect:103-106`).
    # det==0 alone is NOT enough: a subnormal det (|det| < 2^-126) also
    # overflows 1/det, and the resulting NaN t would poison the kernel's
    # min/argmin combine for the whole block.
    miss = miss | (jnp.abs(det) < _DET_TINY)
    if t_eps is not None:
        miss = miss | (t < t_eps)
    t = jnp.where(miss, FLT_MAX, t)
    return t, u, v


def _primary_kernel(rays_per_tile: int, g: int, t_eps, tiles_per_program: int):
    R = rays_per_tile
    B = tiles_per_program

    def kernel(lists_ref, counts_ref, eye_ref, d_ref, tris_hbm,
               bt_ref, bu_ref, bv_ref, bs_ref, buf, sems):
        ox, oy, oz = eye_ref[0], eye_ref[1], eye_ref[2]

        # B tiles per program amortize the fixed per-program cost
        # (measured ~3.5 us each: an EMPTY 1024-program frame cost 7 ms).
        def tile_body(b, _):
            count = counts_ref[b, 0, 0]

            # Empty tiles (most of a typical frame) write miss defaults
            # and skip the whole sweep apparatus (~4 us/tile even idle).
            @pl.when(count == 0)
            def _():
                row = pl.ds(b * R, R)
                bt_ref[row, :] = jnp.full((R, 1), FLT_MAX, jnp.float32)
                bu_ref[row, :] = jnp.zeros((R, 1), jnp.float32)
                bv_ref[row, :] = jnp.zeros((R, 1), jnp.float32)
                bs_ref[row, :] = jnp.zeros((R, 1), jnp.int32)

            @pl.when(count > 0)
            def _():
                swept_tile(b, count)
            return 0

        def swept_tile(b, count):
            def dma(slot, r):
                s = lists_ref[b, 0, r]
                return pltpu.make_async_copy(
                    tris_hbm.at[s], buf.at[slot], sems.at[slot])

            for p in range(DMA_DEPTH):
                @pl.when(p < count)
                def _(p=p):
                    dma(p % N_BUF, p).start()

            d = d_ref[pl.ds(b, 1)][0]  # [R,3]
            dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]

            def body(r, carry):
                bt, bu, bv, bs = carry
                slot = jax.lax.rem(r, N_BUF)

                @pl.when(r + DMA_DEPTH < count)
                def _():
                    dma(jax.lax.rem(r + DMA_DEPTH, N_BUF),
                        r + DMA_DEPTH).start()

                dma(slot, r).wait()
                tri = buf[pl.ds(slot, 1)][0]  # [16,G]
                t, u, v = _mt_rows(tri, ox, oy, oz, dx, dy, dz, t_eps)
                bt_blk = jnp.min(t, axis=1, keepdims=True)
                j = jnp.argmin(t, axis=1).astype(jnp.int32)[:, None]
                # Winner u/v by one-hot select (no lane gather on TPU).
                sel = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) == j
                u_blk = jnp.sum(jnp.where(sel, u, 0.0), axis=1, keepdims=True)
                v_blk = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
                cand = lists_ref[b, 0, r] * g + j
                better = bt_blk < bt
                return (jnp.where(better, bt_blk, bt),
                        jnp.where(better, u_blk, bu),
                        jnp.where(better, v_blk, bv),
                        jnp.where(better, cand, bs))

            init = (jnp.full((R, 1), FLT_MAX, jnp.float32),
                    jnp.zeros((R, 1), jnp.float32),
                    jnp.zeros((R, 1), jnp.float32),
                    jnp.zeros((R, 1), jnp.int32))
            bt, bu, bv, bs = jax.lax.fori_loop(0, count, body, init)
            row = pl.ds(b * R, R)
            bt_ref[row, :] = bt
            bu_ref[row, :] = bu
            bv_ref[row, :] = bv
            bs_ref[row, :] = bs

        jax.lax.fori_loop(0, B, tile_body, 0)

    return kernel


def _occlusion_kernel(rays_per_tile: int, g: int, t_eps: float,
                      tiles_per_program: int):
    R = rays_per_tile
    B = tiles_per_program

    def kernel(lists_ref, counts_ref, light_ref, o_ref, act_ref, tris_hbm,
               occ_ref, buf, sems):
        dx, dy, dz = light_ref[0], light_ref[1], light_ref[2]

        def tile_body(b, _):
            count = counts_ref[b, 0, 0]

            # 94% of shadow tiles cull to nothing (empty beams or fully
            # inactive) — write the no-occlusion default and skip.
            @pl.when(count == 0)
            def _():
                occ_ref[pl.ds(b * R, R), :] = jnp.zeros((R, 1), jnp.int32)

            @pl.when(count > 0)
            def _():
                swept_tile(b, count)
            return 0

        def swept_tile(b, count):
            def dma(slot, r):
                s = lists_ref[b, 0, r]
                return pltpu.make_async_copy(
                    tris_hbm.at[s], buf.at[slot], sems.at[slot])

            for p in range(DMA_DEPTH):
                @pl.when(p < count)
                def _(p=p):
                    dma(p % N_BUF, p).start()

            o = o_ref[pl.ds(b, 1)][0]  # [R,3] per-ray origins
            ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
            active = act_ref[pl.ds(b, 1)][0] > 0  # [R,1]

            def body(r, occ):
                slot = jax.lax.rem(r, N_BUF)

                @pl.when(r + DMA_DEPTH < count)
                def _():
                    dma(jax.lax.rem(r + DMA_DEPTH, N_BUF),
                        r + DMA_DEPTH).start()

                dma(slot, r).wait()
                tri = buf[pl.ds(slot, 1)][0]
                t, _, _ = _mt_rows(tri, ox, oy, oz, dx, dy, dz, t_eps)
                hit_any = jnp.any(t < FLT_MAX, axis=1, keepdims=True)
                # int32 carry: Mosaic cannot legalize bool-vector carries.
                return jnp.maximum(occ, (hit_any & active).astype(jnp.int32))

            occ = jax.lax.fori_loop(
                0, count, body, jnp.zeros((R, 1), jnp.int32))
            occ_ref[pl.ds(b * R, R), :] = occ

        jax.lax.fori_loop(0, B, tile_body, 0)

    return kernel


def _tile_lists(survive, num_segments, max_w: int = 32, order=None,
                keys=None):
    """Compact the [T,S] cull mask into per-tile segment lists.

    Fast path: one-hot MATMUL compaction — ``lists[t,r] = Σ_s E[t,s,r]·id``
    with ``E = (cumsum(mask)==r+1) & mask`` — pure VPU compares plus one
    f32 contraction, measured far below the row sort's fixed ~2.5 ms
    floor.  Exactness guard: covers ranks < ``max_w``; the rare frame
    where some tile exceeds it takes the full-width sort instead
    (``lax.cond``, one branch executes).  Output ids are clamped so padded
    entries address segment 0 harmlessly (the kernel never reads past
    ``counts``).

    ``order``: optional [S] permutation — lists come out in that column
    order (e.g. ascending eye distance, enabling in-kernel early exit).
    ``keys``: optional [S] float32 per-segment values (indexed by REAL
    segment id); when given, also returns ``klists`` aligned with lists.
    """
    t, s = survive.shape
    if order is not None:
        survive = survive[:, order]
        ids = order.astype(jnp.float32)
        kvals = keys[order] if keys is not None else None
    else:
        ids = jnp.arange(s, dtype=jnp.float32)
        kvals = keys
    counts = jnp.sum(survive, axis=1).astype(jnp.int32)
    w = min(max_w, s)
    out_w = -(-s // 128) * 128  # kernel SMEM block width (Mosaic 128 rule)

    def onehot(_):
        def rows(sv):  # [tc, S] -> ([tc, w], [tc, w])
            rank = jnp.cumsum(sv.astype(jnp.int32), axis=1)
            r_ids = jnp.arange(w, dtype=jnp.int32)
            e = (rank[:, :, None] == (r_ids[None, None] + 1)) & sv[:, :, None]
            ef = e.astype(jnp.float32)
            ls = jnp.einsum("tsr,s->tr", ef, ids,
                            preferred_element_type=jnp.float32)
            if kvals is None:
                return ls, ls
            return ls, jnp.einsum("tsr,s->tr", ef, kvals,
                                  preferred_element_type=jnp.float32)

        # The [tc, S, w] one-hot is the big intermediate: chunk tiles so
        # it stays <=128 MB however large the frame/scene gets (weak spot
        # flagged in r2: 1080p x 515k tris would be ~2.4 GB unchunked).
        chunk = max(8, (1 << 25) // max(s * w, 1))
        if t <= chunk:
            lf, kf = rows(survive)
        else:
            nc = -(-t // chunk)
            padded = jnp.pad(survive, ((0, nc * chunk - t), (0, 0)))
            lf, kf = jax.lax.map(rows, padded.reshape(nc, chunk, s))
            lf = lf.reshape(nc * chunk, w)[:t]
            kf = kf.reshape(nc * chunk, w)[:t]
        lists = jnp.pad(lf.astype(jnp.int32), ((0, 0), (0, out_w - w)))
        if kvals is None:
            return lists, lists.astype(jnp.float32)
        return lists, jnp.pad(kf, ((0, 0), (0, out_w - w)))

    def sortpath(_):
        pos, _ = _compact(survive, 1)  # ascending positions in `order` space
        pos = jnp.minimum(pos, s - 1)
        pos = jnp.pad(pos, ((0, 0), (0, out_w - pos.shape[1])))
        lists = (order[pos] if order is not None else pos).astype(jnp.int32)
        lists = jnp.minimum(lists, num_segments - 1)
        if kvals is None:
            return lists, lists.astype(jnp.float32)
        return lists, kvals[pos]

    if s <= w:  # one-hot always exact; no guard needed
        lists, klists = onehot(None)
    else:
        lists, klists = jax.lax.cond(jnp.max(counts) <= w, onehot, sortpath,
                                     None)
    # Mosaic block rule: the last two dims of a blocked operand must be
    # 8/128-divisible or span the whole array — so ship lists as
    # [T, 1, W128] and counts as [T, 1, 1], blocked (1, full, full).
    lists = lists.reshape(t, 1, out_w)
    counts = counts.reshape(t, 1, 1)
    if keys is None:
        return lists, counts
    return lists, counts, klists.reshape(t, 1, out_w)


def trace_tiles_pallas(
    cs: ClusterSet,
    tri_blocks: jnp.ndarray,
    eye: jnp.ndarray,
    d_tiles: jnp.ndarray,
    tile_px: int = 16,
    tiles_per_program: int = 8,
    trace_cfg: TraceConfig = TraceConfig(),
) -> Hit:
    """TILE-MAJOR core: ``d_tiles [T,R,3]`` -> Hit with ``[T*R]`` fields
    in tile order.  Callers that stay tile-major through shading (the
    bench frame) skip the measured-4.4 ms per-field untile epilogue —
    only the final packed framebuffer pays one reorder."""
    g = cs.cluster_size
    assert g % 128 == 0, f"segment width {g} must be a multiple of 128"
    rays_per_tile = tile_px * tile_px
    s = cs.num_clusters
    t_eps = float(trace_cfg.t_epsilon) if trace_cfg.clip_backward_hits else None

    planes = tile_frustum_planes(d_tiles, tile_px)
    survive = _cull_frustum(planes, eye, cs.cmin, cs.cmax)  # [T,S]
    lists, counts = _tile_lists(survive, s, trace_cfg.sweep_list_width)
    num_tiles = d_tiles.shape[0]
    b = tiles_per_program
    while num_tiles % b:
        b //= 2  # frames with few tiles fall back to smaller batches

    # Each program sees only ITS B tiles' survivor rows as (B, 1, W) SMEM
    # blocks (~2 KB/tile) — the whole [T, S] table would blow the 1 MB
    # SMEM budget as a scalar-prefetch operand.
    w = lists.shape[2]
    bt, bu, bv, bs = pl.pallas_call(
        _primary_kernel(rays_per_tile, g, t_eps, b),
        grid=(num_tiles // b,),
        in_specs=[
            pl.BlockSpec((b, 1, w), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eye [3]
            pl.BlockSpec((b, rays_per_tile, 3), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # tri blocks stay in HBM
        ],
        out_specs=tuple(
            pl.BlockSpec((b * rays_per_tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles * rays_per_tile, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * rays_per_tile, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * rays_per_tile, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * rays_per_tile, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, tri_blocks.shape[1], g), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
        interpret=interpret_mode(),
    )(lists, counts, eye.astype(jnp.float32), d_tiles, tri_blocks)

    bt, bu, bv, bslot = bt[:, 0], bu[:, 0], bv[:, 0], bs[:, 0]

    # t/u/v come straight from the kernel — the SAME formula as the
    # oracle's `tri_intersect`, term for term, so no re-intersection pass
    # (and no 36-byte scattered gather per pixel) is needed.  The only
    # remaining gather maps winning slots to original face ids.
    hit = bt < FLT_MAX
    face = jnp.where(hit, cs.face_order[bslot], -1)
    return Hit(
        t=jnp.where(hit, bt, FLT_MAX),
        u=jnp.where(hit, bu, 0.0),
        v=jnp.where(hit, bv, 0.0),
        face=face,
    )


@partial(jax.jit, static_argnames=("height", "width", "tile_px",
                                   "tiles_per_program", "trace_cfg"))
def trace_dense_pallas(
    cs: ClusterSet,
    tri_blocks: jnp.ndarray,
    eye: jnp.ndarray,
    dirs: jnp.ndarray,
    height: int,
    width: int,
    tile_px: int = 16,
    tiles_per_program: int = 8,
    trace_cfg: TraceConfig = TraceConfig(),
) -> Hit:
    """Closest hit for a pinhole frame (row-major pixels) via the Pallas
    tile-sweep kernel.

    ``cs`` must be built with a lane-aligned ``cluster_size`` (the segment
    width G, a multiple of 128); ``tri_blocks = segment_blocks(cs)``.
    """
    d_tiles = tile_pixels(dirs, height, width, tile_px)  # [T,R,3]
    hit = trace_tiles_pallas(cs, tri_blocks, eye, d_tiles, tile_px,
                             tiles_per_program, trace_cfg)
    num_tiles = d_tiles.shape[0]
    rays_per_tile = tile_px * tile_px

    def unt(x):
        return untile_pixels(x.reshape(num_tiles, rays_per_tile), height,
                             width, tile_px)

    return Hit(t=unt(hit.t), u=unt(hit.u), v=unt(hit.v), face=unt(hit.face))


def occlusion_tiles_pallas(
    cs: ClusterSet,
    tri_blocks: jnp.ndarray,
    o_tiles: jnp.ndarray,
    light_dir: jnp.ndarray,
    a_tiles: jnp.ndarray,
    tile_px: int = 16,
    tiles_per_program: int = 8,
    trace_cfg: TraceConfig = TraceConfig(),
) -> jnp.ndarray:
    """TILE-MAJOR core: ``o_tiles [T,R,3]`` + ``a_tiles [T,R]`` bool ->
    ``[T*R]`` bool occlusion in tile order."""
    g = cs.cluster_size
    assert g % 128 == 0
    rays_per_tile = tile_px * tile_px
    s = cs.num_clusters
    t_eps = float(trace_cfg.t_epsilon)
    num_tiles = o_tiles.shape[0]

    beam = swept_tile_beams(o_tiles, a_tiles, light_dir)
    l = beam.l
    survive = beam_survive_matrix(beam, cs.cmin, cs.cmax)
    lists, counts = _tile_lists(survive, s, trace_cfg.sweep_list_width)

    w = lists.shape[2]
    b = tiles_per_program
    while num_tiles % b:
        b //= 2
    occ = pl.pallas_call(
        _occlusion_kernel(rays_per_tile, g, t_eps, b),
        grid=(num_tiles // b,),
        in_specs=[
            pl.BlockSpec((b, 1, w), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # light [3]
            pl.BlockSpec((b, rays_per_tile, 3), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, rays_per_tile, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b * rays_per_tile, 1), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles * rays_per_tile, 1),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, tri_blocks.shape[1], g), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
        interpret=interpret_mode(),
    )(lists, counts, l.astype(jnp.float32), o_tiles,
      a_tiles.astype(jnp.int32)[..., None], tri_blocks)

    return (occ[:, 0] > 0) & a_tiles.reshape(-1)


@partial(jax.jit, static_argnames=("height", "width", "tile_px",
                                   "tiles_per_program", "trace_cfg"))
def occlusion_dense_pallas(
    cs: ClusterSet,
    tri_blocks: jnp.ndarray,
    origins: jnp.ndarray,
    light_dir: jnp.ndarray,
    active: jnp.ndarray,
    height: int,
    width: int,
    tile_px: int = 16,
    tiles_per_program: int = 8,
    trace_cfg: TraceConfig = TraceConfig(),
) -> jnp.ndarray:
    """Any-hit occlusion for a directional light (row-major pixels).

    Same beam cull as `occlusion_dense` (origin AABB swept along the
    light), same results; the sweep runs on-chip per tile."""
    o_tiles = tile_pixels(origins, height, width, tile_px)
    a_tiles = tile_pixels(active, height, width, tile_px)
    occ = occlusion_tiles_pallas(cs, tri_blocks, o_tiles, light_dir,
                                 a_tiles, tile_px, tiles_per_program,
                                 trace_cfg)
    num_tiles = o_tiles.shape[0]
    return untile_pixels(occ.reshape(num_tiles, tile_px * tile_px),
                         height, width, tile_px)


# ---------------------------------------------------------------------------
# Fused trace+interpolate variant: the kernel also interpolates the
# winner's shading attributes (smooth normal, albedo, texture uv) by
# one-hot selection per round, so the shade stage needs NO scattered
# gathers at all — the reference's bmFaceInterpolate (`CudaComon.cuh:
# 253-266`) runs inside the traversal kernel.
# ---------------------------------------------------------------------------


def shade_segment_blocks(cs: ClusterSet, scene) -> tuple[jnp.ndarray, bool]:
    """``[C, G, 128]`` fused blocks: attribute columns 0-8 v0|e1|e2, 9-17
    vertex normals, 18-20 per-face albedo, 21 tex id, 22-27 vertex uvs
    (zeros when the scene has none), 28 material reflectivity (for the
    multi-bounce path); columns 29-127 zero-pad the LANE dim to the 128
    tile so the per-segment HBM->VMEM DMA slices a full lane tile (Mosaic
    rejects 32-lane slices of a 128-tiled memref — the r2 bench failure).
    The 4x DMA padding costs ~0.4 ms/frame at bunny scale, measured noise
    next to the sweep.  Built once per scene."""
    from ..models.mesh import VERTEX_DATA_NORMAL, VERTEX_DATA_UV1

    c, g = cs.num_clusters, cs.cluster_size
    order = jnp.maximum(cs.face_order, 0)
    f = scene.faces[order]  # [C*G, 4]
    pad_ok = (cs.face_order >= 0)[:, None].astype(jnp.float32)

    n = scene.attrs[VERTEX_DATA_NORMAL]
    v0 = cs.tris[..., 0:3]
    edges = jnp.concatenate(
        [v0, cs.tris[..., 3:6] - v0, cs.tris[..., 6:9] - v0], axis=-1)
    rows = [edges.reshape(c * g, 9)]
    rows.append(jnp.concatenate(
        [n[f[:, 0]], n[f[:, 1]], n[f[:, 2]]], axis=1) * pad_ok)
    mat = scene.mesh_material[f[:, 3]]
    rows.append(scene.albedo[mat] * pad_ok)
    rows.append(scene.texture_id[mat].astype(jnp.float32)[:, None])
    has_uv = VERTEX_DATA_UV1 in scene.attrs
    if has_uv:
        uv = scene.attrs[VERTEX_DATA_UV1]
        rows.append(jnp.concatenate(
            [uv[f[:, 0], :2], uv[f[:, 1], :2], uv[f[:, 2], :2]], axis=1)
            * pad_ok)
    else:
        rows.append(jnp.zeros((c * g, 6), jnp.float32))
    if scene.reflectivity is not None:
        rows.append(scene.reflectivity[mat][:, None] * pad_ok)
    else:
        rows.append(jnp.zeros((c * g, 1), jnp.float32))
    flat = jnp.concatenate(rows, axis=1)  # [C*G, 29]
    flat = jnp.pad(flat, ((0, 0), (0, 128 - flat.shape[1])))
    # [C, G, 128]: slots ride SUBLANES, attribute columns ride lanes — the
    # kernel computes [G, R] matrices (rays on lanes) so results land in
    # lane-major [1, R] rows and outputs tile as [T, R] with no padding
    # (a [N,1] output layout tile-pads 128x and OOMs the ~16 MB VMEM).
    return flat.reshape(c, g, 128), has_uv


def _primary_shade_kernel(rays_per_tile: int, g: int, t_eps, has_uv: bool,
                          tiles_per_program: int, with_refl: bool = False):
    R = rays_per_tile
    B = tiles_per_program
    # Outputs: t, slot, u, v, nx, ny, nz, ar, ag, ab (+ tex, tu, tv)
    # (+ refl when the multi-bounce path asks for it — appended LAST so
    # existing consumers' indices stay stable).
    n_out = (13 if has_uv else 10) + (1 if with_refl else 0)

    def kernel(lists_ref, counts_ref, eye_ref, d_ref, tris_hbm, *refs):
        out_refs, (buf, sems) = refs[:n_out], refs[n_out:]
        ox, oy, oz = eye_ref[0], eye_ref[1], eye_ref[2]

        def tile_body(b, _):
            count = counts_ref[b, 0, 0]

            # 92% of a bunny-frame's tiles cull to NOTHING (the model
            # only covers the frame's center), and the sweep apparatus
            # below costs ~4 us/tile even at count==0 — so empty tiles
            # write their miss defaults and skip everything else.
            @pl.when(count == 0)
            def _():
                row = pl.ds(b, 1)
                out_refs[0][row, :] = jnp.full((1, R), FLT_MAX, jnp.float32)
                out_refs[1][row, :] = jnp.zeros((1, R), jnp.int32)
                for ref in out_refs[2:]:
                    ref[row, :] = jnp.zeros((1, R), jnp.float32)

            @pl.when(count > 0)
            def _():
                swept_tile(b, count)
            return 0

        def swept_tile(b, count):
            def dma(slot, r):
                s = lists_ref[b, 0, r]
                return pltpu.make_async_copy(
                    tris_hbm.at[s], buf.at[slot], sems.at[slot])

            for p in range(DMA_DEPTH):
                @pl.when(p < count)
                def _(p=p):
                    dma(p % N_BUF, p).start()

            d = d_ref[pl.ds(b, 1)][0]  # [3,R]
            dx, dy, dz = d[0:1, :], d[1:2, :], d[2:3, :]  # [1,R]

            def body(r, carry):
                bt, bs, attrs = carry[0], carry[1], carry[2:]
                slot = jax.lax.rem(r, N_BUF)

                @pl.when(r + DMA_DEPTH < count)
                def _():
                    dma(jax.lax.rem(r + DMA_DEPTH, N_BUF),
                        r + DMA_DEPTH).start()

                dma(slot, r).wait()
                blk = buf[pl.ds(slot, 1)][0]  # [G,128]: slots x attr cols

                def col(k):  # [G,1] attribute column
                    return blk[:, k:k + 1]

                tri = (col(0), col(1), col(2), col(3), col(4), col(5),
                       col(6), col(7), col(8))
                t, u, v = _mt_cols(tri, ox, oy, oz, dx, dy, dz, t_eps)
                # [G,R]: candidates on sublanes, rays on lanes.
                bt_blk = jnp.min(t, axis=0, keepdims=True)  # [1,R]
                j = jnp.argmin(t, axis=0).astype(jnp.int32)[None, :]
                sel = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) == j
                better = bt_blk < bt

                def pick(x):  # [G,R] -> winner [1,R]
                    return jnp.sum(jnp.where(sel, x, 0.0), axis=0,
                                   keepdims=True)

                w_ = 1.0 - u - v
                cand = [u, v]
                for k in range(3):  # smooth normal components
                    cand.append(col(9 + k) * w_ + col(12 + k) * u
                                + col(15 + k) * v)
                for k in range(3):  # per-face albedo
                    cand.append(jnp.broadcast_to(col(18 + k), t.shape))
                if has_uv:
                    cand.append(jnp.broadcast_to(col(21), t.shape))
                    cand.append(col(22) * w_ + col(24) * u + col(26) * v)
                    cand.append(col(23) * w_ + col(25) * u + col(27) * v)
                if with_refl:
                    cand.append(jnp.broadcast_to(col(28), t.shape))

                new_attrs = tuple(
                    jnp.where(better, pick(cx), ax)
                    for cx, ax in zip(cand, attrs))
                cand_slot = lists_ref[b, 0, r] * g + j
                return (jnp.where(better, bt_blk, bt),
                        jnp.where(better, cand_slot, bs)) + new_attrs

            init = (jnp.full((1, R), FLT_MAX, jnp.float32),
                    jnp.zeros((1, R), jnp.int32)) + tuple(
                        jnp.zeros((1, R), jnp.float32)
                        for _ in range(n_out - 2))
            out = jax.lax.fori_loop(0, count, body, init)
            for ref, val in zip(out_refs, out):
                ref[pl.ds(b, 1), :] = val

        jax.lax.fori_loop(0, B, tile_body, 0)

    return kernel


def _mt_cols(tri, ox, oy, oz, dx, dy, dz, t_eps):
    """Möller–Trumbore with candidates on SUBLANES ([G,1] v0|e1|e2
    columns) and rays on LANES ([1,R]) -> t/u/v [G,R].  Same formula as
    `_mt_rows`."""
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = tri
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv = 1.0 / det
    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
    miss = (u < 0.0) | (u > 1.0) | (v < 0.0) | (u + v > 1.0)
    # One |det|-below-smallest-normal compare replaces three isnan guards
    # — covers det==0 AND subnormal det whose 1/det overflows (see
    # `_mt_rows` for the full argument).
    miss = miss | (jnp.abs(det) < _DET_TINY)
    if t_eps is not None:
        miss = miss | (t < t_eps)
    t = jnp.where(miss, FLT_MAX, t)
    return t, u, v


def tile_planes_planar(d3_tiles: jnp.ndarray, tile_px: int) -> jnp.ndarray:
    """`tile_frustum_planes` for PLANAR ``[T, 3, R]`` direction tiles.

    Same corner/mean construction on ``[T,3]`` slices — identical planes,
    no ``[T,R,3]`` intermediate."""
    rays_per_tile = tile_px * tile_px
    c00 = d3_tiles[:, :, 0]
    c01 = d3_tiles[:, :, tile_px - 1]
    c10 = d3_tiles[:, :, (tile_px - 1) * tile_px]
    c11 = d3_tiles[:, :, rays_per_tile - 1]
    mean_dir = d3_tiles.mean(axis=2)

    def plane(a, b):
        n = jnp.cross(a, b)
        s = jnp.sign(jnp.sum(n * mean_dir, axis=-1, keepdims=True))
        return n * jnp.where(s == 0, 1.0, s)

    return jnp.stack(
        [plane(c00, c01), plane(c01, c11), plane(c11, c10), plane(c10, c00),
         mean_dir],
        axis=1,
    )


def trace_shade_tiles_planar(
    cs: ClusterSet,
    shade_blocks: jnp.ndarray,
    has_uv: bool,
    eye: jnp.ndarray,
    d3_tiles: jnp.ndarray,
    tile_px: int = 16,
    tiles_per_program: int = 8,
    trace_cfg: TraceConfig = TraceConfig(),
    with_refl: bool = False,
):
    """Fused trace+interpolate on PLANAR ``[T, 3, R]`` direction tiles.

    Returns the kernel's outputs as a tuple of PLANAR ``[T, R]`` arrays
    ``(t, slot, u, v, nx, ny, nz, ar, ag, ab[, tex, tu, tv][, refl])`` —
    no ``[N,3]`` stacking, no face gather: minor-dim-3 layouts waste 125
    of 128 lanes on this hardware and the measured epilogue cost (~2 ms
    at 512²) exceeded the sweep itself.  Callers that need face ids
    gather ``cs.face_order[slot]`` themselves; the frame path never
    does."""
    g = cs.cluster_size
    assert g % 128 == 0
    rays_per_tile = tile_px * tile_px
    s = cs.num_clusters
    t_eps = float(trace_cfg.t_epsilon) if trace_cfg.clip_backward_hits else None

    planes = tile_planes_planar(d3_tiles, tile_px)
    survive = _cull_frustum(planes, eye, cs.cmin, cs.cmax)
    lists, counts = _tile_lists(survive, s, trace_cfg.sweep_list_width)
    num_tiles = d3_tiles.shape[0]
    b = tiles_per_program
    while num_tiles % b:
        b //= 2

    n_out = (13 if has_uv else 10) + (1 if with_refl else 0)
    w = lists.shape[2]
    # Rays ride the LANE axis inside the kernel ([T, 3, R] directions in,
    # [T, R] outputs — naturally (8,128)-tiled).
    outs = pl.pallas_call(
        _primary_shade_kernel(rays_per_tile, g, t_eps, has_uv, b,
                              with_refl=with_refl),
        grid=(num_tiles // b,),
        in_specs=[
            pl.BlockSpec((b, 1, w), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eye [3]
            pl.BlockSpec((b, 3, rays_per_tile), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(
            pl.BlockSpec((b, rays_per_tile), lambda t: (t, 0),
                         memory_space=pltpu.VMEM) for _ in range(n_out)),
        out_shape=tuple(
            jax.ShapeDtypeStruct(
                (num_tiles, rays_per_tile),
                jnp.int32 if i == 1 else jnp.float32)
            for i in range(n_out)),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, g, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
        interpret=interpret_mode(),
    )(lists, counts, eye.astype(jnp.float32), d3_tiles, shade_blocks)
    return outs


def trace_shade_tiles_pallas(
    cs: ClusterSet,
    shade_blocks: jnp.ndarray,
    has_uv: bool,
    eye: jnp.ndarray,
    d_tiles: jnp.ndarray,
    tile_px: int = 16,
    tiles_per_program: int = 8,
    trace_cfg: TraceConfig = TraceConfig(),
):
    """Fused trace+interpolate, tile-major (``[T, R, 3]`` directions).

    Compatibility wrapper over `trace_shade_tiles_planar`: stacks the
    planar outputs into ``(Hit, normal [N,3], albedo [N,3], tex_uv [N,3]
    or None)`` and gathers face ids.  The frame path calls the planar
    form directly and skips all of this."""
    outs = trace_shade_tiles_planar(
        cs, shade_blocks, has_uv, eye, d_tiles.transpose(0, 2, 1),
        tile_px=tile_px, tiles_per_program=tiles_per_program,
        trace_cfg=trace_cfg)
    outs = [o.reshape(-1) for o in outs]
    bt, bs, bu, bv = outs[0], outs[1], outs[2], outs[3]
    normal = jnp.stack([outs[4], outs[5], outs[6]], axis=1)
    albedo = jnp.stack([outs[7], outs[8], outs[9]], axis=1)
    tex_uv = jnp.stack([outs[10], outs[11], outs[12]],
                       axis=1) if has_uv else None
    hit = Hit(
        t=jnp.where(bt < FLT_MAX, bt, FLT_MAX),
        u=bu, v=bv,
        face=jnp.where(bt < FLT_MAX, cs.face_order[bs], -1),
    )
    return hit, normal, albedo, tex_uv


# ---------------------------------------------------------------------------
# Planar occlusion: same [G, R] orientation as the fused trace kernel,
# reading the SAME shade blocks (v0|e1|e2 columns 0-8) — one triangle
# operand in HBM serves both kernels, and every host-side array stays
# lane-major [T, R] (minor-dim-3 layouts waste 125/128 lanes on TPU).
# ---------------------------------------------------------------------------


def _occlusion_cols_kernel(rays_per_tile: int, g: int, t_eps: float,
                           tiles_per_program: int):
    R = rays_per_tile
    B = tiles_per_program

    def kernel(lists_ref, counts_ref, light_ref, o_ref, act_ref, blocks_hbm,
               occ_ref, buf, sems):
        dx, dy, dz = light_ref[0], light_ref[1], light_ref[2]  # scalars

        def tile_body(b, _):
            count = counts_ref[b, 0, 0]

            # 94% of shadow tiles cull to nothing — write the default.
            @pl.when(count == 0)
            def _():
                occ_ref[pl.ds(b, 1), :] = jnp.zeros((1, R), jnp.int32)

            @pl.when(count > 0)
            def _():
                swept_tile(b, count)
            return 0

        def swept_tile(b, count):
            def dma(slot, r):
                s = lists_ref[b, 0, r]
                return pltpu.make_async_copy(
                    blocks_hbm.at[s], buf.at[slot], sems.at[slot])

            for p in range(DMA_DEPTH):
                @pl.when(p < count)
                def _(p=p):
                    dma(p % N_BUF, p).start()

            o = o_ref[pl.ds(b, 1)][0]  # [3,R]
            ox, oy, oz = o[0:1, :], o[1:2, :], o[2:3, :]  # [1,R]
            active = act_ref[pl.ds(b, 1)][0:1, :] > 0  # [1,R] bool

            def body(r, occ):
                slot = jax.lax.rem(r, N_BUF)

                @pl.when(r + DMA_DEPTH < count)
                def _():
                    dma(jax.lax.rem(r + DMA_DEPTH, N_BUF),
                        r + DMA_DEPTH).start()

                dma(slot, r).wait()
                blk = buf[pl.ds(slot, 1)][0]  # [G,128]

                def col(k):
                    return blk[:, k:k + 1]

                tri = (col(0), col(1), col(2), col(3), col(4), col(5),
                       col(6), col(7), col(8))
                t, _, _ = _mt_cols(tri, ox, oy, oz, dx, dy, dz, t_eps)
                hit_any = jnp.any(t < FLT_MAX, axis=0, keepdims=True)
                return jnp.maximum(occ, (hit_any & active).astype(jnp.int32))

            occ = jax.lax.fori_loop(
                0, count, body, jnp.zeros((1, R), jnp.int32))
            occ_ref[pl.ds(b, 1), :] = occ

        jax.lax.fori_loop(0, B, tile_body, 0)

    return kernel


def occlusion_tiles_planar(
    cs: ClusterSet,
    shade_blocks: jnp.ndarray,
    o3_tiles: jnp.ndarray,
    light_dir: jnp.ndarray,
    a_tiles: jnp.ndarray,
    tile_px: int = 16,
    tiles_per_program: int = 8,
    trace_cfg: TraceConfig = TraceConfig(),
) -> jnp.ndarray:
    """Directional-light any-hit on PLANAR tiles: ``o3_tiles [T,3,R]`` +
    ``a_tiles [T,R]`` bool -> ``[T,R]`` bool occlusion.

    Same swept-beam cull and same Möller–Trumbore terms as
    `occlusion_tiles_pallas` — results are identical; the operand is the
    fused kernel's shade blocks (columns 0-8), so scenes carry ONE
    triangle table for both kernels."""
    from .occlusion_cull import swept_tile_beams_planar

    g = cs.cluster_size
    assert g % 128 == 0
    rays_per_tile = tile_px * tile_px
    s = cs.num_clusters
    t_eps = float(trace_cfg.t_epsilon)
    num_tiles = o3_tiles.shape[0]

    beam = swept_tile_beams_planar(o3_tiles, a_tiles, light_dir)
    survive = beam_survive_matrix(beam, cs.cmin, cs.cmax)
    lists, counts = _tile_lists(survive, s, trace_cfg.sweep_list_width)

    w = lists.shape[2]
    b = tiles_per_program
    while num_tiles % b:
        b //= 2
    occ = pl.pallas_call(
        _occlusion_cols_kernel(rays_per_tile, g, t_eps, b),
        grid=(num_tiles // b,),
        in_specs=[
            pl.BlockSpec((b, 1, w), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # light [3]
            pl.BlockSpec((b, 3, rays_per_tile), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, rays_per_tile), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b, rays_per_tile), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles, rays_per_tile),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, g, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
        interpret=interpret_mode(),
    )(lists, counts, beam.l.astype(jnp.float32), o3_tiles,
      a_tiles.astype(jnp.int32), shade_blocks)

    return (occ > 0) & a_tiles
