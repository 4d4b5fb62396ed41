"""General-ray Pallas sweep + the multi-bounce frame on the fused kernels.

The reference's wavefront path (`Trace2.cu:69-176`) re-dispatches rays in
bulk between bounce stages.  Round-4 completed that idea in XLA
(`trace/bounce.py`), but its secondary sweeps (`dense.trace_clusters_rays`)
never touched the fused Pallas kernel that makes the headline — the r4
verdict's config-5 gap.  This module closes it:

  * `_general_shade_kernel` is the per-ray-origin AND per-ray-direction
    variant of `pallas_sweep._primary_shade_kernel`: `_mt_cols` already
    broadcasts ``[1, R]`` origins against ``[G, 1]`` triangle columns, so
    the only changes are a per-ray direction operand and an activity mask
    (exhausted rays write miss defaults).
  * `general_tile_cull` replaces the pinhole frustum: secondary bounces
    stay tile-coherent (the bounce loop never re-orders rays), so each
    tile culls clusters with a conservative interval test — per-axis
    reachability from the tile's origin box along its direction box, plus
    a bounding-cone test around the mean direction.  Both are
    conservative: a cluster is skipped only when provably unreachable.
  * `render_bounces_pallas` runs the whole multi-bounce frame PLANAR
    (lane-major ``[T, R]`` fields end to end) on the fused kernels:
    primary + shadows exactly like `trace/frame.py`, then per bounce one
    general-ray sweep.  No per-bounce argsort compaction — inactive
    tiles cull to zero and cost one count check in the kernel, which is
    the TPU shape of the wavefront's queue-compaction step.

Light model parity: term-for-term the energy-conserving blend of
`trace/bounce.py` (``L = (1-r)*local + r*bounce``), validated against the
brute-force oracle by `tests/test_bounce.py::test_pallas_matches_*`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.clusters import ClusterSet
from ..config import RenderConfig, TraceConfig
from ..ops.pallas_util import interpret_mode
from ..types import FLT_MAX
from .dense import tile_pixels_planar, untile_pixels
from .pallas_sweep import (DMA_DEPTH, N_BUF, _mt_cols, _tile_lists,
                           occlusion_tiles_planar, tile_planes_planar)

_BIG = jnp.float32(3.0e37)


def general_tile_cull(
    o3_tiles: jnp.ndarray,
    d3_tiles: jnp.ndarray,
    a_tiles: jnp.ndarray,
    cmin: jnp.ndarray,
    cmax: jnp.ndarray,
) -> jnp.ndarray:
    """Conservative ``[T, C]`` cluster cull for an arbitrary (but
    tile-coherent) ray bundle.

    Per tile, over its ACTIVE rays only:
      * axis reachability — if every ray moves in +x, nothing at
        ``x < min(origin.x)`` is reachable (and symmetrically); mixed
        signs disable that axis's constraint;
      * bounding cone — reject clusters whose AABB lies entirely outside
        the cone around the tile's mean direction that contains every
        active direction (disabled when the bundle spreads past 90°).

    Fully-inactive tiles cull everything (the kernel skips them on
    ``count == 0``).  All tests are conservative; exactness of the frame
    never depends on cull quality.
    """
    act = a_tiles[:, None, :]  # [T,1,R]
    omin = jnp.min(jnp.where(act, o3_tiles, _BIG), axis=2)  # [T,3]
    omax = jnp.max(jnp.where(act, o3_tiles, -_BIG), axis=2)
    dmin = jnp.min(jnp.where(act, d3_tiles, _BIG), axis=2)
    dmax = jnp.max(jnp.where(act, d3_tiles, -_BIG), axis=2)
    any_act = jnp.any(a_tiles, axis=1)  # [T]

    # Mean direction + cone cosine over active rays (directions are unit).
    dsum = jnp.sum(jnp.where(act, d3_tiles, 0.0), axis=2)  # [T,3]
    dlen = jnp.sqrt(jnp.maximum(jnp.sum(dsum * dsum, axis=1), 1e-30))
    m = dsum / dlen[:, None]
    cosr = jnp.sum(d3_tiles * m[:, :, None], axis=1)  # [T,R]
    cos_min = jnp.min(jnp.where(a_tiles, cosr, 1.0), axis=1)  # [T]

    # Accumulate per axis to avoid [T,C,3] materialization.
    ok = jnp.broadcast_to(any_act[:, None], (a_tiles.shape[0], cmin.shape[0]))
    sup = jnp.zeros_like(ok, jnp.float32)
    gap2 = jnp.zeros_like(ok, jnp.float32)
    for i in range(3):
        reach_lo = jnp.where(dmin[:, i] >= 0.0, omin[:, i], -_BIG)[:, None]
        reach_hi = jnp.where(dmax[:, i] <= 0.0, omax[:, i], _BIG)[:, None]
        ok = ok & (cmax[None, :, i] >= reach_lo) & (cmin[None, :, i] <= reach_hi)
        wlo = cmin[None, :, i] - omax[:, i, None]  # [T,C]
        whi = cmax[None, :, i] - omin[:, i, None]
        mi = m[:, i, None]
        sup = sup + jnp.maximum(mi * wlo, mi * whi)
        g = jnp.maximum(jnp.maximum(wlo, -whi), 0.0)
        gap2 = gap2 + g * g
    # Cone test only constrains when the bundle fits in a half-space.
    cone_ok = (cos_min[:, None] <= 0.0) | (
        sup >= cos_min[:, None] * jnp.sqrt(gap2))
    return ok & cone_ok


def _general_shade_kernel(rays_per_tile: int, g: int, t_eps, has_uv: bool,
                          tiles_per_program: int):
    """Fused trace+interpolate for per-ray origins AND directions, with an
    activity mask.  Outputs (t, slot, u, v, nx, ny, nz, ar, ag, ab
    [, tex, tu, tv], refl) — always with reflectivity (its only caller is
    the bounce loop)."""
    R = rays_per_tile
    B = tiles_per_program
    n_out = (13 if has_uv else 10) + 1

    def kernel(lists_ref, counts_ref, o_ref, d_ref, act_ref, tris_hbm,
               *refs):
        out_refs, (buf, sems) = refs[:n_out], refs[n_out:]

        def tile_body(b, _):
            count = counts_ref[b, 0, 0]

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

            o = o_ref[pl.ds(b, 1)][0]  # [3,R]
            d = d_ref[pl.ds(b, 1)][0]  # [3,R]
            ox, oy, oz = o[0:1, :], o[1:2, :], o[2:3, :]
            dx, dy, dz = d[0:1, :], d[1:2, :], d[2:3, :]
            active = act_ref[pl.ds(b, 1)][0:1, :] > 0  # [1,R]

            def body(r, carry):
                bt, bs, attrs = carry[0], carry[1], carry[2:]
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
                t, u, v = _mt_cols(tri, ox, oy, oz, dx, dy, dz, t_eps)
                bt_blk = jnp.min(t, axis=0, keepdims=True)  # [1,R]
                j = jnp.argmin(t, axis=0).astype(jnp.int32)[None, :]
                sel = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) == j
                better = bt_blk < bt

                def pick(x):
                    return jnp.sum(jnp.where(sel, x, 0.0), axis=0,
                                   keepdims=True)

                w_ = 1.0 - u - v
                cand = [u, v]
                for k in range(3):
                    cand.append(col(9 + k) * w_ + col(12 + k) * u
                                + col(15 + k) * v)
                for k in range(3):
                    cand.append(jnp.broadcast_to(col(18 + k), t.shape))
                if has_uv:
                    cand.append(jnp.broadcast_to(col(21), t.shape))
                    cand.append(col(22) * w_ + col(24) * u + col(26) * v)
                    cand.append(col(23) * w_ + col(25) * u + col(27) * v)
                cand.append(jnp.broadcast_to(col(28), t.shape))  # refl

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
            # Exhausted rays report miss whatever the sweep found.
            row = pl.ds(b, 1)
            out_refs[0][row, :] = jnp.where(active, out[0], FLT_MAX)
            out_refs[1][row, :] = jnp.where(active, out[1], 0)
            for ref, val in zip(out_refs[2:], out[2:]):
                ref[row, :] = jnp.where(active, val, 0.0)

        jax.lax.fori_loop(0, B, tile_body, 0)

    return kernel


def trace_shade_general_planar(
    cs: ClusterSet,
    shade_blocks: jnp.ndarray,
    has_uv: bool,
    o3_tiles: jnp.ndarray,
    d3_tiles: jnp.ndarray,
    a_tiles: jnp.ndarray,
    tile_px: int = 16,
    tiles_per_program: int = 8,
    trace_cfg: TraceConfig = TraceConfig(),
):
    """Fused trace+interpolate for an arbitrary tile-coherent bundle.

    ``o3_tiles``/``d3_tiles`` PLANAR ``[T, 3, R]``; ``a_tiles [T, R]``
    bool activity.  Returns planar ``[T, R]`` outputs
    ``(t, slot, u, v, nx, ny, nz, ar, ag, ab[, tex, tu, tv], refl)``."""
    g = cs.cluster_size
    assert g % 128 == 0
    rays_per_tile = tile_px * tile_px
    s = cs.num_clusters
    t_eps = float(trace_cfg.t_epsilon) if trace_cfg.clip_backward_hits else None
    num_tiles = o3_tiles.shape[0]

    survive = general_tile_cull(o3_tiles, d3_tiles, a_tiles, cs.cmin, cs.cmax)
    lists, counts = _tile_lists(survive, s, trace_cfg.sweep_list_width)
    b = tiles_per_program
    while num_tiles % b:
        b //= 2

    n_out = (13 if has_uv else 10) + 1
    w = lists.shape[2]
    outs = pl.pallas_call(
        _general_shade_kernel(rays_per_tile, g, t_eps, has_uv, b),
        grid=(num_tiles // b,),
        in_specs=[
            pl.BlockSpec((b, 1, w), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 3, rays_per_tile), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 3, rays_per_tile), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, rays_per_tile), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(
            pl.BlockSpec((b, rays_per_tile), lambda t: (t, 0),
                         memory_space=pltpu.VMEM) for _ in range(n_out)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((num_tiles, rays_per_tile),
                                 jnp.int32 if i == 1 else jnp.float32)
            for i in range(n_out)),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, g, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
        interpret=interpret_mode(),
    )(lists, counts, o3_tiles, d3_tiles, a_tiles.astype(jnp.int32),
      shade_blocks)
    return outs


# ---------------------------------------------------------------------------
# Coherent re-binning of secondary rays (wavefront ray sorting).
# ---------------------------------------------------------------------------


def _coherence_perm(ox, oy, oz, dx, dy, dz, active, lo, hi):
    """``[N]`` permutation + inverse: inactive rays last; active rays
    grouped by quantized DIRECTION (3 bits/axis — sign + magnitude), then
    by origin Morton code (5 bits/axis).

    Reflected bundles off curved/bumpy surfaces spread over the sphere,
    which disables `general_tile_cull`'s cone test and leaves the axis
    test toothless — measured 558 surviving blocks per active tile and a
    538 ms bounce sweep on the config-5 scene (probe_c5).  This is the
    TPU shape of the wavefront tracer's ray-sorting stage
    (`Trace2.cu:69-176` re-dispatches in bulk but never re-sorts): sort +
    gather are dense XLA-friendly ops; results return to pixel order
    with one inverse-permutation gather per output plane.

    MEASURED OFF by default (`sort_bounces=False`): on the config-5
    scene neither key order beats the unsorted tile bundles — a Morton
    cell on a bumpy sphere still reflects across the whole scene, so
    per-bundle survivor sets stay large while the sort/unsort adds ~2×
    overhead (direction-major 1537 ms, morton-major 1283 ms vs 660 ms
    unsorted for one bounce at 1080p).  Kept because scenes with FLAT
    reflectors (the classic mirror-floor case) do produce coherent
    bundles; flip the flag per scene."""
    from ..accel.bvh import morton_codes

    def q3(v):  # direction component -> 3 bits (sign folded in)
        return jnp.clip((v + 1.0) * 4.0, 0.0, 7.999).astype(jnp.uint32)

    dirb = (q3(dx) << 6) | (q3(dy) << 3) | q3(dz)  # 9 bits
    o = jnp.stack([ox, oy, oz], axis=-1)
    m = morton_codes(o, lo, hi, bits=5)  # 15 bits
    # Origin-Morton MAJOR, direction bucket minor: the cull needs a tight
    # origin box even more than a tight cone (its cone test measures the
    # cluster gap FROM the origin box — a bundle whose origins span the
    # scene has gap 0 to everything and the cone never rejects).
    # Direction-major was measured 2.3x WORSE than no sorting at all.
    key = (m << jnp.uint32(9)) | dirb
    key = jnp.where(active, key, jnp.uint32(1) << jnp.uint32(30))
    perm = jnp.argsort(key)
    inv = jnp.argsort(perm)
    return perm, inv


# ---------------------------------------------------------------------------
# The planar multi-bounce frame.
# ---------------------------------------------------------------------------


def _planar_shade(outs, d3_tiles, light, textures, has_uv, ambient,
                  shadow=None):
    """Planar Lambert shade of one depth's kernel outputs.

    Returns ``(r, g, b, hitm, nx, ny, nz, refl)`` flat ``[N]`` planes —
    the normals already normalized and faced against the rays (reused by
    the bounce geometry).  Mirrors `shade_lambert_rgb` term for term."""
    t_ = outs[0].reshape(-1)
    nx, ny, nz = (o.reshape(-1) for o in outs[4:7])
    ar, ag, ab = (o.reshape(-1) for o in outs[7:10])
    refl = outs[-1].reshape(-1)
    dx = d3_tiles[:, 0, :].reshape(-1)
    dy = d3_tiles[:, 1, :].reshape(-1)
    dz = d3_tiles[:, 2, :].reshape(-1)
    hitm = t_ < FLT_MAX

    nlen = jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
    nx, ny, nz = nx / nlen, ny / nlen, nz / nlen
    flip = nx * dx + ny * dy + nz * dz > 0.0
    nx = jnp.where(flip, -nx, nx)
    ny = jnp.where(flip, -ny, ny)
    nz = jnp.where(flip, -nz, nz)
    ndotl = jnp.maximum(nx * light[0] + ny * light[1] + nz * light[2], 0.0)
    if shadow is not None:
        ndotl = jnp.where(shadow, 0.0, ndotl)
    if has_uv and textures is not None and textures.shape[0] > 0:
        from .shade import sample_texture

        tex_id = outs[10].reshape(-1).astype(jnp.int32)
        tex_rgb = sample_texture(textures, tex_id, outs[11].reshape(-1),
                                 outs[12].reshape(-1))
        texd = tex_id >= 0
        ar = jnp.where(texd, ar * tex_rgb[:, 0], ar)
        ag = jnp.where(texd, ag * tex_rgb[:, 1], ag)
        ab = jnp.where(texd, ab * tex_rgb[:, 2], ab)
    lit = ambient + (1.0 - ambient) * ndotl
    return ar * lit, ag * lit, ab * lit, hitm, nx, ny, nz, refl


@partial(jax.jit, static_argnames=("height", "width", "num_bounces",
                                   "with_shadows", "has_uv", "tile_px",
                                   "trace_cfg", "sort_bounces"))
def render_bounces_pallas(
    cs: ClusterSet,
    shade_blocks: jnp.ndarray,
    has_uv: bool,
    textures,
    eye: jnp.ndarray,
    dirs: jnp.ndarray,
    height: int,
    width: int,
    tile_px: int = 16,
    num_bounces: int = 2,
    light_dir=(0.4, 0.8, -0.45),
    with_shadows: bool = True,
    background=(0.0, 1.0, 0.0),
    ambient: float = 0.08,
    trace_cfg: TraceConfig = TraceConfig(),
    sort_bounces: bool = False,
) -> jnp.ndarray:
    """Pinhole frame with mirror bounces, everything on the fused Pallas
    kernels -> ``[H*W, 3]`` float RGB (row-major).

    Same energy-conserving blend as `trace/bounce.py::render_bounces`
    (each depth contributes ``T_k (1-r_k) local_k``; the final depth and
    misses close the telescoping sum)."""
    from .pallas_sweep import trace_shade_tiles_planar

    eps = jnp.float32(trace_cfg.t_epsilon) * jnp.maximum(
        jnp.max(cs.cmax) - jnp.min(cs.cmin), 1.0)
    light = jnp.asarray(light_dir, jnp.float32)
    light = light / jnp.linalg.norm(light)
    bg = jnp.asarray(background, jnp.float32)
    T = (height // tile_px) * (width // tile_px)
    R = tile_px * tile_px

    d3_tiles = tile_pixels_planar(dirs.T, height, width, tile_px)
    outs = trace_shade_tiles_planar(cs, shade_blocks, has_uv, eye, d3_tiles,
                                    tile_px=tile_px, trace_cfg=trace_cfg,
                                    with_refl=True)

    dx = d3_tiles[:, 0, :].reshape(-1)
    dy = d3_tiles[:, 1, :].reshape(-1)
    dz = d3_tiles[:, 2, :].reshape(-1)
    t0 = outs[0].reshape(-1)
    hitm0 = t0 < FLT_MAX

    shadow = None
    if with_shadows:
        # Same active-set tightening as the frame path: back-facing
        # surfaces shade to ambient regardless of occlusion.
        nx0, ny0, nz0 = (o.reshape(-1) for o in outs[4:7])
        nl = jnp.sqrt(jnp.maximum(nx0 * nx0 + ny0 * ny0 + nz0 * nz0, 1e-30))
        ncos = (nx0 * dx + ny0 * dy + nz0 * dz) / nl
        ndl = (nx0 * light[0] + ny0 * light[1] + nz0 * light[2]) / nl
        ndl = jnp.where(ncos > 0, -ndl, ndl)
        sactive = hitm0 & (ndl > 0.0)
        tmin = jnp.minimum(t0, 1e6)
        sox = jnp.where(sactive, eye[0] + dx * tmin, eye[0]) + light[0] * eps
        soy = jnp.where(sactive, eye[1] + dy * tmin, eye[1]) + light[1] * eps
        soz = jnp.where(sactive, eye[2] + dz * tmin, eye[2]) + light[2] * eps
        o3 = jnp.stack([sox.reshape(T, R), soy.reshape(T, R),
                        soz.reshape(T, R)], axis=1)
        shadow = occlusion_tiles_planar(
            cs, shade_blocks, o3, light, sactive.reshape(T, R),
            tile_px=tile_px, trace_cfg=trace_cfg).reshape(-1)

    r0, g0, b0, hitm, nx, ny, nz, refl = _planar_shade(
        outs, d3_tiles, light, textures, has_uv, ambient, shadow)
    r0 = jnp.where(hitm, r0, bg[0])
    g0 = jnp.where(hitm, g0, bg[1])
    b0 = jnp.where(hitm, b0, bg[2])
    refl = jnp.where(hitm, refl, 0.0)

    if num_bounces == 0:
        rgb = jnp.stack([r0, g0, b0], axis=-1)
        return untile_pixels(rgb.reshape(T, R, 3), height, width, tile_px)

    cr = (1.0 - refl) * r0
    cg = (1.0 - refl) * g0
    cb = (1.0 - refl) * b0
    throughput = refl
    active = hitm & (refl > 0.0)

    # Bounce geometry (planar): reflect d about the faced normal at the
    # hit point, offset along the normal.
    t_ = jnp.minimum(t0, _BIG)
    px = eye[0] + dx * t_
    py = eye[1] + dy * t_
    pz = eye[2] + dz * t_
    ddn = dx * nx + dy * ny + dz * nz
    ndx = dx - 2.0 * ddn * nx
    ndy = dy - 2.0 * ddn * ny
    ndz = dz - 2.0 * ddn * nz
    ox_, oy_, oz_ = px + nx * eps, py + ny * eps, pz + nz * eps

    scene_lo = jnp.min(cs.cmin, axis=0)
    scene_hi = jnp.max(cs.cmax, axis=0)
    for b in range(num_bounces):
        if sort_bounces:
            # Wavefront re-binning: bundle rays by direction bucket +
            # origin Morton so the cone cull bites (see _coherence_perm).
            perm, invp = _coherence_perm(ox_, oy_, oz_, ndx, ndy, ndz,
                                         active, scene_lo, scene_hi)
            o3 = jnp.stack([ox_[perm].reshape(T, R),
                            oy_[perm].reshape(T, R),
                            oz_[perm].reshape(T, R)], axis=1)
            d3s = jnp.stack([ndx[perm].reshape(T, R),
                             ndy[perm].reshape(T, R),
                             ndz[perm].reshape(T, R)], axis=1)
            outs = trace_shade_general_planar(
                cs, shade_blocks, has_uv, o3, d3s, active[perm].reshape(T, R),
                tile_px=tile_px, trace_cfg=trace_cfg)
            # Back to pixel order: one gather per output plane.
            outs = tuple(o.reshape(-1)[invp].reshape(T, R) for o in outs)
        else:
            o3 = jnp.stack([ox_.reshape(T, R), oy_.reshape(T, R),
                            oz_.reshape(T, R)], axis=1)
            d3s = jnp.stack([ndx.reshape(T, R), ndy.reshape(T, R),
                             ndz.reshape(T, R)], axis=1)
            outs = trace_shade_general_planar(
                cs, shade_blocks, has_uv, o3, d3s, active.reshape(T, R),
                tile_px=tile_px, trace_cfg=trace_cfg)
        d3 = jnp.stack([ndx.reshape(T, R), ndy.reshape(T, R),
                        ndz.reshape(T, R)], axis=1)
        lr, lg, lb, hitm, nx, ny, nz, refl = _planar_shade(
            outs, d3, light, textures, has_uv, ambient)
        lr = jnp.where(hitm, lr, bg[0])
        lg = jnp.where(hitm, lg, bg[1])
        lb = jnp.where(hitm, lb, bg[2])
        refl = jnp.where(hitm, refl, 0.0)
        if b == num_bounces - 1:
            refl = jnp.zeros_like(refl)
        wgt = jnp.where(active, throughput * (1.0 - refl), 0.0)
        cr = cr + wgt * lr
        cg = cg + wgt * lg
        cb = cb + wgt * lb
        throughput = throughput * refl

        dx = d3[:, 0, :].reshape(-1)
        dy = d3[:, 1, :].reshape(-1)
        dz = d3[:, 2, :].reshape(-1)
        t_ = jnp.minimum(outs[0].reshape(-1), _BIG)
        px = ox_ + dx * t_
        py = oy_ + dy * t_
        pz = oz_ + dz * t_
        ddn = dx * nx + dy * ny + dz * nz
        ndx = dx - 2.0 * ddn * nx
        ndy = dy - 2.0 * ddn * ny
        ndz = dz - 2.0 * ddn * nz
        ox_, oy_, oz_ = px + nx * eps, py + ny * eps, pz + nz * eps
        active = active & hitm & (refl > 0.0)

    rgb = jnp.stack([cr, cg, cb], axis=-1)
    return untile_pixels(rgb.reshape(T, R, 3), height, width, tile_px)
