#!/usr/bin/env python
"""Per-stage timing of the FrameRenderer product frame on the chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracercuda_tpu import AccelKind, RenderConfig, Scene
from raytracercuda_tpu.accel.clusters import build_clusters
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.loader import load_model
from raytracercuda_tpu.trace.frame import FrameRenderer
from raytracercuda_tpu.utils import content

W = H = 512
config = RenderConfig(accel=AccelKind.CLUSTER)
scene = Scene.create(config)
load_model(content.find("bunny.obj"), scene)
data = scene.data()
accel = build_clusters(data.positions, data.faces, config.cluster)
r = FrameRenderer(data, accel, config, H, W)
jax.block_until_ready((accel, r.blocks))

lo = np.asarray(data.positions.min(axis=0)); hi = np.asarray(data.positions.max(axis=0))
center = (lo + hi) / 2; extent = float(np.max(hi - lo))
eye = jnp.asarray(center - np.array([0, 0, 2.0 * extent]), jnp.float32)
orient = jnp.eye(3)
rays = camera_ray_grid(W, H)


def timeit(name, f, *a, iters=20, **k):
    out = f(*a, **k); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a, **k)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:9.3f} ms", flush=True)
    return out


s1 = timeit("stage1 prep+fused trace (planar)", r._stage_trace, r.accel,
            r.blocks, rays, eye, orient)
d3_tiles, outs = s1
timeit("stage2 shadow+shade (planar)", r._stage_shadow_shade, r.accel,
       r.blocks, r.scene.textures, eye, d3_tiles, outs)
timeit("FULL render single_dispatch", r.render, eye, orient, rays)
r2s = FrameRenderer(data, accel, config, H, W, single_dispatch=False)
timeit("FULL render two-stage", r2s.render, eye, orient, rays)

# ---- sub-phase isolation (planar) ----
from raytracercuda_tpu.trace.dense import _cull_frustum
from raytracercuda_tpu.trace.pallas_sweep import (
    _tile_lists, occlusion_tiles_planar, tile_planes_planar,
    trace_shade_tiles_planar)

@jax.jit
def planes_only(d3_tiles):
    return tile_planes_planar(d3_tiles, 16)

@jax.jit
def cull_only(planes, eye):
    return _cull_frustum(planes, eye, accel.cmin, accel.cmax)

@jax.jit
def lists_only(survive):
    return _tile_lists(survive, accel.num_clusters)

planes = timeit("  planes", planes_only, d3_tiles)
survive = timeit("  cull", cull_only, planes, eye)
timeit("  tile_lists", lists_only, survive)

kern = jax.jit(lambda d3: trace_shade_tiles_planar(
    accel, r.blocks, r.has_uv, eye, d3, tile_px=16,
    trace_cfg=config.trace))
timeit("  planar fused kernel+prologue", kern, d3_tiles)
