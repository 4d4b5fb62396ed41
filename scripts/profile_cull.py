#!/usr/bin/env python
"""Decompose the 1080p Pallas-path prep: cull matmul, tile-list compaction,
and the sweep kernel itself, plus the survivor-count distribution."""
import json
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from profile_r5 import scene5, timed, log
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.trace.dense import (tile_pixels, tile_frustum_planes,
                                           _cull_frustum)
from raytracercuda_tpu.trace.pallas_sweep import _tile_lists


def main():
    config, data, accel, eye = scene5()
    W, H = 1920, 1080
    tp = config.trace.dense_tile_px
    rays = camera_ray_grid(W, H)
    dirs = rays  # orient = I
    d_tiles = tile_pixels(dirs, H, W, tp)
    planes = jax.jit(tile_frustum_planes, static_argnums=1)(d_tiles, tp)
    jax.block_until_ready(planes)
    S = accel.num_clusters
    print("tiles", d_tiles.shape[0], "clusters", S, flush=True)

    cull = jax.jit(_cull_frustum)
    ms, survive = timed(cull, planes, eye, accel.cmin, accel.cmax, iters=5)
    log("cull_frustum", ms)

    counts = np.asarray(jnp.sum(survive, axis=1))
    log("counts", 0.0, max=int(counts.max()), mean=round(float(counts.mean()), 2),
        p99=int(np.percentile(counts, 99)), over32=int((counts > 32).sum()),
        over64=int((counts > 64).sum()), over128=int((counts > 128).sum()))

    for w in (32, 64, 128):
        fn = jax.jit(lambda sv, w=w: _tile_lists(sv, S, w))
        ms, _ = timed(fn, survive, iters=3)
        log(f"tile_lists w={w}", ms)

    # kernel alone (reuse lists from w where exact)
    from raytracercuda_tpu.trace.pallas_sweep import (trace_shade_tiles_planar,
                                                      shade_segment_blocks)
    from raytracercuda_tpu.trace.dense import tile_pixels_planar

    blocks, has_uv = shade_segment_blocks(accel, data)
    jax.block_until_ready(blocks)
    d3 = dirs.T
    d3_tiles = jax.jit(tile_pixels_planar, static_argnums=(1, 2, 3))(
        d3, H, W, tp)
    jax.block_until_ready(d3_tiles)
    fn = jax.jit(lambda d3t: trace_shade_tiles_planar(
        accel, blocks, has_uv, eye, d3t, tile_px=tp,
        trace_cfg=config.trace))
    ms, _ = timed(fn, d3_tiles, iters=3)
    log("trace_shade_tiles_planar total", ms)


if __name__ == "__main__":
    main()
