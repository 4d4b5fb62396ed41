#!/usr/bin/env python
"""On-chip parameter sweep for the dense fast path + dispatch-overhead probe.

Answers two questions the phase profile can't:
  1. How much of each measured "phase" is per-dispatch tunnel overhead?
  2. Which (tile_px, cluster_size, round_k) minimizes the real frame?
"""
import itertools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracercuda_tpu import AccelKind, RenderConfig, Scene
from raytracercuda_tpu.accel.clusters import build_clusters
from raytracercuda_tpu.config import ClusterConfig
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.loader import load_model
from raytracercuda_tpu.trace.dense import occlusion_dense, trace_dense
from raytracercuda_tpu.trace.pipeline import rotate_rays
from raytracercuda_tpu.utils import content

W = H = 512

config = RenderConfig(accel=AccelKind.CLUSTER)
scene = Scene.create(config)
load_model(content.find("bunny.obj"), scene)
data = scene.data()

lo = np.asarray(data.positions.min(axis=0)); hi = np.asarray(data.positions.max(axis=0))
center = (lo + hi) / 2; extent = float(np.max(hi - lo))
eye = jnp.asarray(center - np.array([0, 0, 2.0 * extent]), jnp.float32)
rays = camera_ray_grid(W, H)
light = jnp.asarray([0.4, 0.8, -0.45], jnp.float32); light = light / jnp.linalg.norm(light)
dirs = jax.jit(rotate_rays)(rays, jnp.eye(3))
origin = jnp.broadcast_to(eye[None, :], dirs.shape)


def timeit(name, f, *a, iters=10, **kw):
    out = f(*a, **kw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return out, dt


# --- dispatch overhead probe -------------------------------------------------
small = jnp.zeros((8,), jnp.float32)
ident = jax.jit(lambda x: x + 1.0)
timeit("dispatch: jit identity [8]", ident, small, iters=50)
big = jnp.zeros((512 * 512, 3), jnp.float32)
timeit("dispatch: jit x+1 [262k,3]", jax.jit(lambda x: x + 1.0), big, iters=50)
two = jax.jit(lambda x: (x + 1.0) * 0.5)
def chain2(x):
    return two(ident(small)), two(x)
timeit("dispatch: 2 chained jits", chain2, big, iters=50)

# --- config sweep ------------------------------------------------------------
best = (1e9, None)
for L, TP, K in itertools.product((16, 32, 64), (16, 32), (16, 32, 64)):
    cs = build_clusters(data.positions, data.faces,
                        ClusterConfig(cluster_size=L))
    jax.block_until_ready(cs)
    kw = dict(tile_px=TP, round_k=K, tiles_per_chunk=config.trace.dense_tiles_per_chunk,
              cluster_chunk=config.trace.dense_cluster_chunk, trace_cfg=config.trace)
    hit, t_tr = timeit(f"trace L={L} tile={TP} K={K}", trace_dense,
                       cs, eye, dirs, H, W, **kw)
    p = origin + dirs * jnp.minimum(hit.t, 1e6)[..., None]
    so = jnp.where(hit.hit_mask[..., None], p, origin) + light * (1e-4 * extent)
    so = jax.block_until_ready(so)
    hm = jax.block_until_ready(hit.hit_mask)
    _, t_oc = timeit(f"occl  L={L} tile={TP} K={K}", occlusion_dense,
                     cs, so, light, hm, H, W, **kw)
    if t_tr + t_oc < best[0]:
        best = (t_tr + t_oc, (L, TP, K))
print("BEST trace+occl:", best, flush=True)
