"""Stackless skip-link BVH traversal — the TPU-native march kernel.

Replaces the reference's per-thread 38-deep-stack kd-tree descent
(`Raytracer/BuildTree.cu:367-499`).  A per-ray stack does not vectorize on
a TPU; instead every ray carries ONE integer — its current node in the
threaded (hit-link/skip-link) LBVH — and the whole ray population steps in
lockstep: gather node AABBs, slab-test, advance to hit-link or skip-link,
intersect leaf faces with Möller–Trumbore, keep the closest.  Pure
VPU + gather work with no divergence beyond masking.

Where the reference early-breaks on the first leaf containing any hit
(`BuildTree.cu:427-431` — an approximation that relies on near-to-far
ordering), this kernel prunes by comparing the AABB entry distance against
the current best hit (exact closest-hit, strictly stronger).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..accel.bvh import Bvh
from ..config import BvhConfig, TraceConfig
from ..ops.math import box_ray_intersect, tri_intersect
from ..types import FLT_MAX, Hit


@partial(jax.jit, static_argnames=("cfg", "trace_cfg"))
def trace_bvh(
    bvh: Bvh,
    positions: jnp.ndarray,
    faces: jnp.ndarray,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    cfg: BvhConfig = BvhConfig(),
    trace_cfg: TraceConfig = TraceConfig(),
) -> Hit:
    """Closest hit for ``[R,3]`` rays against the threaded LBVH."""
    if origin.ndim == 1:
        origin = jnp.broadcast_to(origin[None, :], direction.shape)
    num_rays = direction.shape[0]
    inv_dir = 1.0 / direction
    t_eps = jnp.float32(trace_cfg.t_epsilon)

    def cond(state):
        step, cur, *_ = state
        return (step < cfg.max_iters) & jnp.any(cur >= 0)

    def body(state):
        step, cur, bt, bu, bv, bf = state
        active = cur >= 0
        nid = jnp.maximum(cur, 0)

        nmin = bvh.node_min[nid]
        nmax = bvh.node_max[nid]
        box_d = box_ray_intersect(nmin, nmax, origin, inv_dir)
        # Prune: only enter boxes that could contain a closer hit.
        enter = active & (box_d < bt)

        leaf = bvh.is_leaf[nid]
        hitl = bvh.hit_link[nid]
        skipl = bvh.skip_link[nid]

        # Leaf: test up to max_leaf_faces sorted faces (bounded unrolled
        # loop — the MAX_FACES_PER_BOX-bounded leaf sweep analog,
        # `BuildTree.cu:413-426`).
        at_leaf = enter & leaf
        lfirst = bvh.leaf_first[nid]
        lcount = bvh.leaf_count[nid]
        for k in range(cfg.max_leaf_faces):
            in_range = at_leaf & (k < lcount)
            slot = jnp.clip(lfirst + k, 0, bvh.face_order.shape[0] - 1)
            fid = bvh.face_order[slot]
            frow = faces[fid]
            t, u, v = tri_intersect(
                origin,
                direction,
                positions[frow[..., 0]],
                positions[frow[..., 1]],
                positions[frow[..., 2]],
            )
            if trace_cfg.clip_backward_hits:
                t = jnp.where(t < t_eps, FLT_MAX, t)
            closer = in_range & (t < bt)
            bt = jnp.where(closer, t, bt)
            bu = jnp.where(closer, u, bu)
            bv = jnp.where(closer, v, bv)
            bf = jnp.where(closer, fid, bf)

        nxt = jnp.where(enter & ~leaf, hitl, skipl)
        cur = jnp.where(active, nxt, -1)
        return step + 1, cur, bt, bu, bv, bf

    init = (
        jnp.int32(0),
        jnp.zeros((num_rays,), jnp.int32),  # start at the root
        jnp.full((num_rays,), FLT_MAX, jnp.float32),
        jnp.zeros((num_rays,), jnp.float32),
        jnp.zeros((num_rays,), jnp.float32),
        jnp.full((num_rays,), -1, jnp.int32),
    )
    _, _, bt, bu, bv, bf = jax.lax.while_loop(cond, body, init)
    bf = jnp.where(bt == FLT_MAX, -1, bf)
    return Hit(t=bt, u=bu, v=bv, face=bf)


@partial(jax.jit, static_argnames=("cfg", "trace_cfg"))
def any_hit_bvh(
    bvh: Bvh,
    positions: jnp.ndarray,
    faces: jnp.ndarray,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    t_max: jnp.ndarray,
    cfg: BvhConfig = BvhConfig(),
    trace_cfg: TraceConfig = TraceConfig(),
) -> jnp.ndarray:
    """Occlusion (shadow-ray) query: True where anything lies in
    ``(t_eps, t_max)``.  Rays deactivate on first hit."""
    if origin.ndim == 1:
        origin = jnp.broadcast_to(origin[None, :], direction.shape)
    num_rays = direction.shape[0]
    inv_dir = 1.0 / direction
    t_eps = jnp.float32(trace_cfg.t_epsilon)

    def cond(state):
        step, cur, _ = state
        return (step < cfg.max_iters) & jnp.any(cur >= 0)

    def body(state):
        step, cur, occluded = state
        active = cur >= 0
        nid = jnp.maximum(cur, 0)
        box_d = box_ray_intersect(bvh.node_min[nid], bvh.node_max[nid], origin, inv_dir)
        enter = active & (box_d < t_max)
        leaf = bvh.is_leaf[nid]
        at_leaf = enter & leaf
        lfirst = bvh.leaf_first[nid]
        lcount = bvh.leaf_count[nid]
        for k in range(cfg.max_leaf_faces):
            in_range = at_leaf & (k < lcount)
            slot = jnp.clip(lfirst + k, 0, bvh.face_order.shape[0] - 1)
            fid = bvh.face_order[slot]
            frow = faces[fid]
            t, _, _ = tri_intersect(
                origin,
                direction,
                positions[frow[..., 0]],
                positions[frow[..., 1]],
                positions[frow[..., 2]],
            )
            occluded = occluded | (in_range & (t > t_eps) & (t < t_max))
        nxt = jnp.where(enter & ~leaf, bvh.hit_link[nid], bvh.skip_link[nid])
        cur = jnp.where(active & ~occluded, nxt, -1)
        return step + 1, cur, occluded

    init = (
        jnp.int32(0),
        jnp.zeros((num_rays,), jnp.int32),
        jnp.zeros((num_rays,), bool),
    )
    _, _, occluded = jax.lax.while_loop(cond, body, init)
    return occluded
