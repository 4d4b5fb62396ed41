#!/usr/bin/env python
"""Where do the LBVH build's 52 ms go (bunny, 69,630 tris)?

Times each stage of `accel/bvh.build_bvh` in isolation on-chip:
morton+sort, Karras ranges, parent scatters, RMQ sparse tables,
skip-link threading, pack layouts — to decide whether <20 ms is
reachable or the LBVH should be demoted to the large-scene alternate
(r3 verdict item 8)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from raytracercuda_tpu import RenderConfig, Scene
from raytracercuda_tpu.accel import bvh as B
from raytracercuda_tpu.models.loader import load_model
from raytracercuda_tpu.utils import content

scene = Scene.create(RenderConfig())
load_model(content.find("bunny.obj"), scene)
data = scene.data()
positions, faces = data.positions, data.faces
cfg = RenderConfig().bvh

def timed(name, fn, *a, iters=10):
    out = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:32s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms")
    return out

timed("FULL build_bvh", jax.jit(lambda p: B.build_bvh(p, faces, cfg)), positions)

@jax.jit
def stage_boxes(p):
    v0, v1, v2 = p[faces[:,0]], p[faces[:,1]], p[faces[:,2]]
    tmin = jnp.minimum(v0, jnp.minimum(v1, v2)); tmax = jnp.maximum(v0, jnp.maximum(v1, v2))
    cent = (tmin + tmax) * 0.5
    return tmin, tmax, cent
tmin, tmax, cent = timed("boxes+centroids", stage_boxes, positions)

@jax.jit
def stage_morton(cent, tmin, tmax):
    smin = jnp.min(tmin, axis=0); smax = jnp.max(tmax, axis=0)
    return B.morton_codes(cent, smin, smax, cfg.morton_bits)
codes = timed("morton codes", stage_morton, cent, tmin, tmax)

@jax.jit
def stage_sort(codes):
    order = jnp.argsort(codes, stable=True).astype(jnp.int32)
    return order, codes[order]
order, scodes = timed("argsort + permute", stage_sort, codes)

timed("karras ranges", jax.jit(B._karras_ranges), scodes)

n = faces.shape[0]
leaf_min = tmin[order]; leaf_max = tmax[order]
log2n = max(1, (n-1).bit_length())
@jax.jit
def stage_rmq(leaf_min, leaf_max):
    def sparse_table(leaf_vals, combine):
        tbl = [leaf_vals]
        for k in range(1, log2n + 1):
            prev = tbl[-1]
            sh = 1 << (k - 1)
            shifted = prev[jnp.minimum(jnp.arange(n) + sh, n - 1)]
            tbl.append(combine(prev, shifted))
        return jnp.stack(tbl)
    return sparse_table(leaf_min, jnp.minimum), sparse_table(leaf_max, jnp.maximum)
timed("RMQ sparse tables", stage_rmq, leaf_min, leaf_max)

v0, v1, v2 = positions[faces[:,0]], positions[faces[:,1]], positions[faces[:,2]]
@jax.jit
def stage_pack_tris(order):
    vv0, vv1, vv2 = v0[order], v1[order], v2[order]
    t = jnp.concatenate([vv0, vv1, vv2], axis=1)
    return jnp.pad(t, ((0, B.LEAF_PACK), (0, 0)))
timed("pack sorted tris", stage_pack_tris, order)
