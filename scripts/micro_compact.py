#!/usr/bin/env python
"""Microbench: per-tile survivor-compaction primitives on the real chip.

Decides how the dense trace path (trace/dense.py) compacts the [T, C]
cull mask into per-tile candidate lists: row sort vs scatter vs top_k,
plus the big row-gather that follows.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T, C, K = 1024, 4353, 512
rng = np.random.default_rng(0)
# ~1.5% survivor density with clustered runs (Morton-coherent survivors).
base = rng.random((T, C)) < 0.01
runs = np.maximum(base, np.roll(base, 1, axis=1))
runs = np.maximum(runs, np.roll(runs, 2, axis=1))
survive = jnp.asarray(runs)
print("mean survivors/tile:", float(runs.sum(1).mean()), "max:", int(runs.sum(1).max()))

cids = jnp.arange(C, dtype=jnp.int32)


@jax.jit
def via_sort(survive):
    key = jnp.where(survive, cids[None, :], jnp.int32(1 << 30))
    s = jnp.sort(key, axis=1)
    return s[:, :K]


@jax.jit
def via_scatter(survive):
    rank = jnp.cumsum(survive.astype(jnp.int32), axis=1)
    slot = jnp.where(survive, rank - 1, K)
    slot = jnp.minimum(slot, K)
    out = jnp.full((T, K + 1), 1 << 30, jnp.int32)
    rows = jnp.arange(T, dtype=jnp.int32)[:, None]
    out = out.at[rows, slot].set(jnp.broadcast_to(cids[None, :], (T, C)),
                                 mode="drop", unique_indices=False)
    return out[:, :K]


@jax.jit
def via_topk(survive):
    key = jnp.where(survive, -cids[None, :].astype(jnp.float32), -jnp.inf)
    _, idx = jax.lax.top_k(key, K)
    return idx.astype(jnp.int32)


tri = jnp.asarray(rng.random((C, 192)), jnp.float32)

@jax.jit
def via_gather(lists):
    safe = jnp.clip(lists, 0, C - 1)
    return tri[safe]  # [T, K, 192]


@jax.jit
def cull_dense(planes, cmid, chalf, eye):
    # planes [T,5,3]; boxes [C,3]: d = n.(c-eye) + |n|.h ; outside = any d<0
    out = jnp.zeros((T, C), bool)
    for p in range(5):
        n = planes[:, p, :]  # [T,3]
        a = n @ (cmid - eye).T          # [T,C]
        b = jnp.abs(n) @ chalf.T        # [T,C]
        out = out | (a + b < 0.0)
    return ~out


def timeit(name, f, *a, iters=20):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{name:18s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms")
    return out


def make_searchsorted(width):
    @jax.jit
    def via_searchsorted(survive):
        cum = jnp.cumsum(survive.astype(jnp.int32), axis=1)
        ranks = 1 + jnp.arange(width, dtype=jnp.int32)
        return jax.vmap(
            lambda c: jnp.searchsorted(c, ranks, side="left")
        )(cum).astype(jnp.int32)
    return via_searchsorted


ls = timeit("sort", via_sort, survive)
lsc = timeit("scatter", via_scatter, survive)
lt = timeit("topk", via_topk, survive)
timeit("searchsorted W=512", make_searchsorted(512), survive)
timeit("searchsorted W=64", make_searchsorted(64), survive)
print("sort==scatter:", bool(jnp.all(ls == lsc)))
timeit("gather[T,K,192]", via_gather, ls)

planes = jnp.asarray(rng.standard_normal((T, 5, 3)), jnp.float32)
cmid = jnp.asarray(rng.standard_normal((C, 3)), jnp.float32)
chalf = jnp.asarray(rng.random((C, 3)), jnp.float32)
eye = jnp.zeros(3, jnp.float32)
timeit("cull_dense", cull_dense, planes, cmid, chalf, eye)

# The MT sweep shape: batched [T,R,3] x [T,3,3K] einsum + epilogue.
R = 256
d_tiles = jnp.asarray(rng.standard_normal((T, R, 3)), jnp.float32)
consts = jnp.asarray(rng.standard_normal((T, 3, K)), jnp.float32)

@jax.jit
def mt_sweep(d_tiles, qu, qv, pp, st):
    ud = jnp.einsum("trk,tkc->trc", d_tiles, qu)
    vd = jnp.einsum("trk,tkc->trc", d_tiles, qv)
    det = -jnp.einsum("trk,tkc->trc", d_tiles, pp)
    s = jnp.sign(det)
    t = st[:, None, :] / det
    ok = (ud * s >= 0) & (vd * s >= 0) & ((ud + vd) * s <= det * s) & (t > 1e-4)
    t = jnp.where(ok, t, 3.4e38)
    j = jnp.argmin(t, axis=-1)
    return jnp.take_along_axis(t, j[..., None], axis=-1)[..., 0], j

st = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
timeit("mt_sweep K=512", mt_sweep, d_tiles, consts, consts, consts, st, iters=5)
