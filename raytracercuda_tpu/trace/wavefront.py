"""Wavefront (queue-based) BVH traversal — the completed "PROGRESSIVE" path.

The reference sketches a streaming formulation in `Raytracer/Trace2.cu`:
ray-box expansion queues (`bmRayBoxKernel`), leaf expansion
(`bmLeafExpandKernel`), batched ray-face tests appending into bounded
per-ray hit clusters (`bmFaceTestKernel`, ``bmRayFaceHitCluster[16]``,
`Trace2.cu:3,100-137`), and a closest-hit reduction invoking a shade
callback (`bmFindClosestHit`, `Trace2.cu:139-176`) — but its host launcher
is stubbed out (`Trace2.cu:188-215`, `SceneProgressive.cpp:27-77`).

This module FINISHES that design the TPU way, in rounds:

  Stage A (expand): every ray walks the skip-link BVH until it has queued
    up to Q leaf nodes (the bounded hit-cluster analog) or exhausted the
    tree — pure gather/compare lockstep work.
  Stage B (test):   all queued (ray x leaf-face) pairs are Möller-Trumbore
    tested as one big ``[R, Q*K]`` batch — maximal VPU occupancy.
  Stage C (reduce): per-ray min-reduction updates the closest hit, which
    then PRUNES the next round's expansion (box_d < best_t).

Unlike the reference's fixed 16-entry cluster (which silently drops
overflow hits), rounds make the formulation exact: a ray whose queue
fills simply resumes walking next round.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..accel.bvh import Bvh
from ..config import BvhConfig, TraceConfig, WavefrontConfig
from ..ops.math import box_ray_intersect, tri_intersect
from ..types import FLT_MAX, Hit


@partial(jax.jit, static_argnames=("cfg", "trace_cfg", "wf_cfg"))
def trace_wavefront(
    bvh: Bvh,
    positions: jnp.ndarray,
    faces: jnp.ndarray,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    cfg: BvhConfig = BvhConfig(),
    trace_cfg: TraceConfig = TraceConfig(),
    wf_cfg: WavefrontConfig = WavefrontConfig(),
) -> Hit:
    """Closest hit via round-based wavefront traversal.  Produces results
    identical to `trace_bvh` (validated against the brute-force oracle).

    Rays are processed in ``wf_cfg.ray_chunk`` blocks: stage B's batched
    face test materializes [rays, Q*K, 3] intermediates whose minor dim
    pads to 128 lanes — at full-frame ray counts that exceeded HBM
    (34 GB requested at 512²; the whole-bundle formulation only ever ran
    at test scale before r4)."""
    if origin.ndim == 1:
        origin = jnp.broadcast_to(origin[None, :], direction.shape)
    num_rays = direction.shape[0]
    chunk = min(wf_cfg.ray_chunk, num_rays)
    if num_rays > chunk:
        pad = (-num_rays) % chunk
        o = jnp.pad(origin, ((0, pad), (0, 0)))
        d = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)
        hits = jax.lax.map(
            lambda od: _trace_wavefront_chunk(
                bvh, positions, faces, od[0], od[1], cfg, trace_cfg, wf_cfg),
            (o.reshape(-1, chunk, 3), d.reshape(-1, chunk, 3)),
        )
        return jax.tree_util.tree_map(
            lambda x: x.reshape(-1)[:num_rays], hits)
    return _trace_wavefront_chunk(bvh, positions, faces, origin, direction,
                                  cfg, trace_cfg, wf_cfg)


def _trace_wavefront_chunk(
    bvh: Bvh,
    positions: jnp.ndarray,
    faces: jnp.ndarray,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    cfg: BvhConfig,
    trace_cfg: TraceConfig,
    wf_cfg: WavefrontConfig,
) -> Hit:
    num_rays = direction.shape[0]
    inv_dir = 1.0 / direction
    t_eps = jnp.float32(trace_cfg.t_epsilon)
    q_cap = wf_cfg.max_hits_per_ray
    num_faces = bvh.face_order.shape[0]

    def outer_cond(state):
        rounds, cur, *_ = state
        return (rounds < cfg.max_iters) & jnp.any(cur >= 0)

    def outer_body(state):
        rounds, cur, bt, bu, bv, bf = state

        # ---- Stage A: expand until queues fill (bmRayBoxKernel +
        # bmLeafExpandKernel analog) --------------------------------------
        def walk_cond(wstate):
            steps, wcur, qcount, _ = wstate
            walking = (wcur >= 0) & (qcount < q_cap)
            return (steps < cfg.max_iters) & jnp.any(walking)

        def walk_body(wstate):
            steps, wcur, qcount, queue = wstate
            walking = (wcur >= 0) & (qcount < q_cap)
            nid = jnp.maximum(wcur, 0)
            box_d = box_ray_intersect(
                bvh.node_min[nid], bvh.node_max[nid], origin, inv_dir
            )
            enter = walking & (box_d < bt)
            leaf = bvh.is_leaf[nid]
            # Queue the leaf (bounded append, like the atomicAdd append at
            # `Trace2.cu:127-133` but deterministic).
            append = enter & leaf
            queue = queue.at[jnp.arange(num_rays), jnp.minimum(qcount, q_cap - 1)].set(
                jnp.where(append, nid, queue[jnp.arange(num_rays), jnp.minimum(qcount, q_cap - 1)])
            )
            qcount = qcount + append.astype(jnp.int32)
            nxt = jnp.where(enter & ~leaf, bvh.hit_link[nid], bvh.skip_link[nid])
            wcur = jnp.where(walking, nxt, wcur)
            return steps + 1, wcur, qcount, queue

        queue0 = jnp.zeros((num_rays, q_cap), jnp.int32)
        qcount0 = jnp.zeros((num_rays,), jnp.int32)
        _, cur, qcount, queue = jax.lax.while_loop(
            walk_cond, walk_body, (jnp.int32(0), cur, qcount0, queue0)
        )

        # ---- Stage B+C: batched face tests + closest reduce
        # (bmFaceTestKernel + bmFindClosestHit analog) --------------------
        q_ids = jnp.arange(q_cap, dtype=jnp.int32)[None, :]
        q_valid = q_ids < qcount[:, None]  # [R,Q]
        qnode = jnp.where(q_valid, queue, 0)
        lfirst = bvh.leaf_first[qnode]  # [R,Q]
        lcount = bvh.leaf_count[qnode]
        # All queued (leaf, offset) pairs as ONE [R, Q*K] batch — traced
        # once, not unrolled K times.
        k_ids = jnp.arange(cfg.max_leaf_faces, dtype=jnp.int32)
        in_range = q_valid[:, :, None] & (k_ids[None, None, :] < lcount[:, :, None])
        slot = jnp.clip(lfirst[:, :, None] + k_ids[None, None, :], 0,
                        num_faces - 1)
        qk = q_cap * cfg.max_leaf_faces
        fid = bvh.face_order[slot.reshape(num_rays, qk)]  # [R,Q*K]
        frow = faces[fid]  # [R,Q*K,4]
        t, u, v = tri_intersect(
            origin[:, None, :],
            direction[:, None, :],
            positions[frow[..., 0]],
            positions[frow[..., 1]],
            positions[frow[..., 2]],
        )
        if trace_cfg.clip_backward_hits:
            t = jnp.where(t < t_eps, FLT_MAX, t)
        t = jnp.where(in_range.reshape(num_rays, qk), t, FLT_MAX)
        j = jnp.argmin(t, axis=1)
        rows = jnp.arange(num_rays)
        ct, cu, cv, cf = t[rows, j], u[rows, j], v[rows, j], fid[rows, j]
        closer = ct < bt
        bt = jnp.where(closer, ct, bt)
        bu = jnp.where(closer, cu, bu)
        bv = jnp.where(closer, cv, bv)
        bf = jnp.where(closer, cf, bf)

        return rounds + 1, cur, bt, bu, bv, bf

    init = (
        jnp.int32(0),
        jnp.zeros((num_rays,), jnp.int32),
        jnp.full((num_rays,), FLT_MAX, jnp.float32),
        jnp.zeros((num_rays,), jnp.float32),
        jnp.zeros((num_rays,), jnp.float32),
        jnp.full((num_rays,), -1, jnp.int32),
    )
    _, _, bt, bu, bv, bf = jax.lax.while_loop(outer_cond, outer_body, init)
    bf = jnp.where(bt == FLT_MAX, -1, bf)
    return Hit(t=bt, u=bu, v=bv, face=bf)
