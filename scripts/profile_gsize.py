#!/usr/bin/env python
"""Cluster-size (G) sweep for the 1080p/515k-face frame: how the cull,
tile-lists, and sweep kernel costs move with segment granularity; plus
survivor run-length stats (are Morton survivors contiguous runs?)."""
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
from raytracercuda_tpu.accel.clusters import build_clusters
from raytracercuda_tpu.config import ClusterConfig
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.trace.dense import (tile_pixels, tile_pixels_planar,
                                           tile_frustum_planes, _cull_frustum)
from raytracercuda_tpu.trace.pallas_sweep import (_tile_lists,
                                                  shade_segment_blocks,
                                                  trace_shade_tiles_planar,
                                                  occlusion_tiles_planar)


def main():
    config, data, accel0, eye = scene5()
    W, H = 1920, 1080
    tp = config.trace.dense_tile_px
    rays = camera_ray_grid(W, H)
    d_tiles = tile_pixels(rays, H, W, tp)
    planes = jax.jit(tile_frustum_planes, static_argnums=1)(d_tiles, tp)
    d3_tiles = jax.jit(tile_pixels_planar, static_argnums=(1, 2, 3))(
        rays.T, H, W, tp)
    jax.block_until_ready((planes, d3_tiles))

    for G in (128, 256, 512):
        cs = build_clusters(data.positions, data.faces,
                            ClusterConfig(cluster_size=G))
        jax.block_until_ready(cs)
        S = cs.num_clusters
        cull = jax.jit(_cull_frustum)
        ms_cull, survive = timed(cull, planes, eye, cs.cmin, cs.cmax, iters=5)
        counts = np.asarray(jnp.sum(survive, axis=1))
        sv = np.asarray(survive)
        starts = sv & ~np.concatenate(
            [np.zeros((sv.shape[0], 1), bool), sv[:, :-1]], axis=1)
        runs = starts.sum(axis=1)
        fn = jax.jit(lambda sv: _tile_lists(sv, S, 32))
        ms_lists, _ = timed(fn, survive, iters=3)
        blocks, has_uv = shade_segment_blocks(cs, data)
        jax.block_until_ready(blocks)
        kfn = jax.jit(lambda d3t: trace_shade_tiles_planar(
            cs, blocks, has_uv, eye, d3t, tile_px=tp,
            trace_cfg=config.trace))
        ms_k, outs = timed(kfn, d3_tiles, iters=3)
        log(f"G={G}", 0.0, S=S, cull_ms=round(ms_cull, 2),
            lists_ms=round(ms_lists, 2), kernel_total_ms=round(ms_k, 2),
            cmax=int(counts.max()), cmean=round(float(counts.mean()), 2),
            rmax=int(runs.max()), rmean=round(float(runs.mean()), 2),
            over32=int((counts > 32).sum()))


if __name__ == "__main__":
    main()
