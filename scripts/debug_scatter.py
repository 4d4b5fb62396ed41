#!/usr/bin/env python
"""On-chip exactness + timing probe for diff/scatter.tile_scatter_add at
config-4 scale (T=4096 tiles of B=256 rays, F=350k rows, D=28)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracercuda_tpu.diff.scatter import tile_bases, tile_scatter_add

T, B, F, D = 4096, 256, 350000, 28
WINDOW, NW = 2048, 2

rng = np.random.default_rng(0)
# Realistic ids: each tile draws from 1-2 narrow windows of slot space,
# plus a few strays; ~20% misses (id 0 after the eff-max).
idx = np.zeros((T, B), np.int32)
for t in range(T):
    c1 = rng.integers(0, F - 3000)
    c2 = rng.integers(0, F - 3000) if rng.random() < 0.5 else c1
    pick = rng.random(B)
    ids = np.where(pick < 0.5, c1 + rng.integers(0, 1500, B),
                   c2 + rng.integers(0, 1500, B))
    stray = rng.random(B) < 0.01
    ids = np.where(stray, rng.integers(0, F, B), ids)
    miss = rng.random(B) < 0.2
    idx[t] = np.where(miss, 0, ids)

g = rng.standard_normal((T, D, B), np.float32)

idxj = jnp.asarray(idx)
gj = jnp.asarray(g)
base = tile_bases(idxj, WINDOW, NW)
jax.block_until_ready(base)

fn = jax.jit(lambda g_, i_, b_: tile_scatter_add(g_, i_, b_, F,
                                                 window=WINDOW))
out = jax.block_until_ready(fn(gj, idxj, base))
print("finite:", bool(jnp.isfinite(out).all()))

ref = jax.jit(lambda g_, i_: jax.ops.segment_sum(
    g_.transpose(0, 2, 1).reshape(-1, D), i_.reshape(-1),
    num_segments=F))(gj, idxj)
err = float(jnp.max(jnp.abs(out - ref)))
rel = err / float(jnp.max(jnp.abs(ref)))
print("max abs err:", err, "rel:", rel)

t0 = time.perf_counter()
for _ in range(5):
    out = fn(gj, idxj, base)
jax.block_until_ready(out)
print("tile_scatter_add ms:", (time.perf_counter() - t0) / 5 * 1e3)

t0 = time.perf_counter()
for _ in range(5):
    r = jax.jit(lambda g_, i_: jax.ops.segment_sum(
        g_.transpose(0, 2, 1).reshape(-1, D), i_.reshape(-1),
        num_segments=F))(gj, idxj)
jax.block_until_ready(r)
print("segment_sum ms:", (time.perf_counter() - t0) / 5 * 1e3)

# Stray fraction actually present
covered = np.zeros((T, B), bool)
bs = np.asarray(base)
for k in range(NW):
    bk = bs[:, k:k+1]
    covered |= (bk >= 0) & (idx >= bk) & (idx < bk + WINDOW)
print("stray frac:", float((~covered & (idx >= 0)).mean()))
