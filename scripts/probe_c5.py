#!/usr/bin/env python
"""Config-5 kernel variant probe: (sweep_list_width, tiles_per_program)
for the primary planar kernel, plus REAL bounce-phase numbers with the
bench's reflective materials."""
import dataclasses
import json
import os, sys, time
from functools import partial
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from raytracercuda_tpu.config import TraceConfig

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_r5 import log, scene5, timed  # noqa: E402


def main():
    from raytracercuda_tpu.trace.dense import tile_pixels_planar
    from raytracercuda_tpu.trace.pallas_bounce import (
        general_tile_cull, render_bounces_pallas, trace_shade_general_planar,
        _planar_shade)
    from raytracercuda_tpu.trace.pallas_sweep import (
        _tile_lists, occlusion_tiles_planar, shade_segment_blocks,
        trace_shade_tiles_planar)
    from raytracercuda_tpu.trace.pipeline import rotate_rays

    config, data, accel, eye = scene5()
    nm = data.reflectivity.shape[0]
    data = data._replace(reflectivity=jnp.linspace(0.3, 0.6, nm))
    tc = config.trace
    tp = tc.dense_tile_px
    W, Hreal = 1920, 1080
    H = -(-Hreal // tp) * tp
    rays_all = jax.jit(rotate_rays)(
        __import__("raytracercuda_tpu.models.camera",
                   fromlist=["camera_ray_grid"]).camera_ray_grid(W, Hreal),
        jnp.eye(3))
    img = rays_all.reshape(Hreal, W, 3)
    img = jnp.pad(img, ((0, H - Hreal), (0, 0), (0, 0)), mode="edge")
    dirs = img.reshape(H * W, 3)
    blocks, has_uv = shade_segment_blocks(accel, data)
    jax.block_until_ready(blocks)
    d3 = jax.jit(lambda d: tile_pixels_planar(d.T, H, W, tp))(dirs)
    jax.block_until_ready(d3)
    T, R = d3.shape[0], tp * tp
    light = jnp.asarray([0.4, 0.8, -0.45], jnp.float32)
    light = light / jnp.linalg.norm(light)

    which = set(sys.argv[1:]) or {"var", "bounce"}

    if "var" in which:
        for w, b in ((32, 8), (192, 8), (192, 16), (32, 16)):
            tcv = dataclasses.replace(tc, sweep_list_width=w)
            fn = jax.jit(partial(trace_shade_tiles_planar, tile_px=tp,
                                 trace_cfg=tcv, with_refl=True,
                                 tiles_per_program=b), static_argnums=(2,))
            try:
                ms, _ = timed(fn, accel, blocks, has_uv, eye, d3, iters=3)
                log(f"c5v primary w={w} b={b}", ms)
            except Exception as e:
                log(f"c5v primary w={w} b={b} FAILED", 0.0,
                    err=str(e)[:100])

    if "bounce" in which:
        # Real bounce phases with reflective materials.
        fn = jax.jit(partial(trace_shade_tiles_planar, tile_px=tp,
                             trace_cfg=tc, with_refl=True),
                     static_argnums=(2,))
        outs = fn(accel, blocks, has_uv, eye, d3)
        r0, g0, b0, hitm, nx, ny, nz, refl = jax.jit(
            partial(_planar_shade, has_uv=has_uv, ambient=0.08))(
                outs, d3, light, data.textures)
        eps = jnp.float32(tc.t_epsilon) * jnp.maximum(
            jnp.max(accel.cmax) - jnp.min(accel.cmin), 1.0)
        dx = d3[:, 0, :].reshape(-1)
        dy = d3[:, 1, :].reshape(-1)
        dz = d3[:, 2, :].reshape(-1)
        t_ = jnp.minimum(outs[0].reshape(-1), jnp.float32(3e37))
        ddn = dx * nx + dy * ny + dz * nz
        ndx, ndy, ndz = (dx - 2 * ddn * nx, dy - 2 * ddn * ny,
                         dz - 2 * ddn * nz)
        active = hitm & (refl > 0.0)
        o3 = jnp.stack([(eye[0] + dx * t_ + nx * eps).reshape(T, R),
                        (eye[1] + dy * t_ + ny * eps).reshape(T, R),
                        (eye[2] + dz * t_ + nz * eps).reshape(T, R)], axis=1)
        d3b = jnp.stack([ndx.reshape(T, R), ndy.reshape(T, R),
                         ndz.reshape(T, R)], axis=1)
        a2 = active.reshape(T, R)
        jax.block_until_ready((o3, d3b, a2))
        log("c5v active", 0.0, n=int(jnp.sum(a2)),
            frac=round(float(jnp.mean(a2)), 4),
            active_tiles=int(jnp.sum(jnp.any(a2, axis=1))))

        ms, sv = timed(jax.jit(general_tile_cull), o3, d3b, a2,
                       accel.cmin, accel.cmax, iters=5)
        cnt = jnp.sum(sv, axis=1)
        log("c5v bounce cull", ms, survivors=int(jnp.sum(sv)),
            mean=round(float(jnp.mean(cnt)), 1), max=int(jnp.max(cnt)))
        ms, _ = timed(jax.jit(partial(_tile_lists, max_w=tc.sweep_list_width),
                              static_argnums=(1,)), sv, accel.num_clusters,
                      iters=5)
        log("c5v bounce tile_lists", ms)
        ms, _ = timed(jax.jit(partial(trace_shade_general_planar, tile_px=tp,
                                      trace_cfg=tc), static_argnums=(2,)),
                      accel, blocks, has_uv, o3, d3b, a2, iters=3)
        log("c5v bounce general sweep total", ms)

        for nb in (1, 2):
            fn = jax.jit(partial(render_bounces_pallas, tile_px=tp,
                                 num_bounces=nb, trace_cfg=tc),
                         static_argnums=(2, 6, 7))
            ms, _ = timed(fn, accel, blocks, has_uv, data.textures, eye,
                          dirs, H, W, iters=3)
            log(f"c5v reflective render_bounces_pallas nb={nb}", ms)


if __name__ == "__main__":
    main()
