#!/usr/bin/env python
"""Benchmark: rays/sec/chip — bunny.obj 512x512, primary + shadow rays.

The machine-readable successor to the reference's Nsight export
(`/root/reference/aa.xml`: bmMarchKernel 38.41 ms for 250k rays on a
GTX 660 Ti ≈ 6.5 M primary rays/s — see BASELINE.md).  Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"} where vs_baseline is
the multiple of the reference's 6.5 M rays/s.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_RAYS_PER_SEC = 6.5e6  # aa.xml-derived (BASELINE.md)
WIDTH = HEIGHT = 512
ITERS = 5


def main() -> None:
    import jax

    # Persist compiled executables across processes: the remote-compile
    # tunnel costs minutes per program, the cache makes reruns instant.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from raytracercuda_tpu import AccelKind, RenderConfig, Scene
    from raytracercuda_tpu.accel.clusters import build_clusters
    from raytracercuda_tpu.config import ClusterConfig
    from raytracercuda_tpu.models.camera import camera_ray_grid
    from raytracercuda_tpu.models.loader import load_model
    from raytracercuda_tpu.ops.math import normalize
    from raytracercuda_tpu.trace.dense import tile_pixels, untile_pixels
    from raytracercuda_tpu.trace.pallas_sweep import (
        occlusion_tiles_pallas, segment_blocks, shade_segment_blocks,
        trace_shade_tiles_pallas)
    from raytracercuda_tpu.trace.pipeline import rotate_rays
    from raytracercuda_tpu.trace.shade import pack_shaded
    from raytracercuda_tpu.utils import content

    config = RenderConfig(accel=AccelKind.CLUSTER)
    scene = Scene.create(config)
    bunny = content.find("bunny.obj")
    if bunny is not None:
        load_model(bunny, scene)
    else:  # content unavailable: procedural stand-in, still reported
        from raytracercuda_tpu.models.procedural import icosphere_mesh

        scene.add_mesh(icosphere_mesh(subdivisions=5, center=(0, 0, 3)))
    data = scene.data()

    # Frame the model: eye backed off along -z from the AABB center.
    lo = np.asarray(data.positions.min(axis=0))
    hi = np.asarray(data.positions.max(axis=0))
    center = (lo + hi) / 2
    extent = float(np.max(hi - lo))
    eye = jnp.asarray(center - np.array([0, 0, 2.0 * extent]), jnp.float32)
    orient = jnp.eye(3)
    rays = camera_ray_grid(WIDTH, HEIGHT)
    light = jnp.asarray([0.4, 0.8, -0.45], jnp.float32)
    light = light / jnp.linalg.norm(light)

    # Lane-aligned segments for the Pallas tile-sweep kernels (the
    # measured-fastest traversal: see MEASUREMENTS.md / pallas_sweep.py).
    accel = build_clusters(data.positions, data.faces,
                           ClusterConfig(cluster_size=128))
    blocks, has_uv = shade_segment_blocks(accel, data)  # [C,G,128] fused
    occ_blocks = segment_blocks(accel)  # [C,16,G] corners-only (occlusion)
    jax.block_until_ready((accel, blocks, occ_blocks))
    # Shadow-ray offset scaled to the scene, not hardcoded: push the origin
    # toward the light far enough to clear the surface at float precision.
    shadow_eps = jnp.float32(config.trace.t_epsilon * extent)

    tc = config.trace
    TP = tc.dense_tile_px
    kw = dict(tile_px=TP, trace_cfg=tc)

    # Three separately-jitted stages (trace/occlusion/shade) rather than
    # one frame-sized program: device-to-device handoff between them is
    # free (~0.7 ms dispatch each, measured), and a single fused program
    # was measured to push the tunnel's remote compile past 25 minutes.
    # The whole frame runs TILE-MAJOR: rays are tiled once, every stage
    # consumes/produces tile order, and only the final packed framebuffer
    # pays one pixel reorder (the per-field untile epilogue measured
    # 4.4 ms/frame).
    @jax.jit
    def prep(rays, eye, orient):
        dirs = rotate_rays(rays, orient)
        d_tiles = tile_pixels(dirs, HEIGHT, WIDTH, TP)
        origin = jnp.broadcast_to(eye[None, :], (d_tiles.shape[0] * TP * TP, 3))
        return d_tiles, origin

    @jax.jit
    def trace(accel, blocks, eye, d_tiles):
        # Fused trace+interpolate: the kernel returns the winner's smooth
        # normal and albedo, so shading below is pure elementwise math.
        return trace_shade_tiles_pallas(accel, blocks, has_uv, eye,
                                        d_tiles, **kw)

    @jax.jit
    def shadow_pass(accel, occ_blocks, hit_t, hit_mask, origin, d_tiles):
        dirs_flat = d_tiles.reshape(-1, 3)
        p = origin + dirs_flat * jnp.minimum(hit_t, 1e6)[..., None]
        so = jnp.where(hit_mask[..., None], p, origin) + light * shadow_eps
        t = d_tiles.shape[0]
        return occlusion_tiles_pallas(
            accel, occ_blocks, so.reshape(t, TP * TP, 3),
            light, hit_mask.reshape(t, TP * TP), **kw)

    @jax.jit
    def shade(hit, normal, albedo, d_tiles, shadow):
        dirs_flat = d_tiles.reshape(-1, 3)
        n = normalize(normal, eps=1e-30)
        flip = jnp.sum(n * dirs_flat, axis=-1) > 0.0
        n = jnp.where(flip[..., None], -n, n)
        ndotl = jnp.maximum(jnp.sum(n * light, axis=-1), 0.0)
        ndotl = jnp.where(shadow & hit.hit_mask, 0.0, ndotl)
        ambient = 0.08
        rgb = albedo * (ambient + (1.0 - ambient) * ndotl)[..., None]
        bg = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
        rgb = jnp.where(hit.hit_mask[..., None], rgb, bg)
        packed = pack_shaded(rgb)
        t = d_tiles.shape[0]
        return untile_pixels(packed.reshape(t, TP * TP), HEIGHT, WIDTH, TP)

    def frame(scene, accel, rays, eye, orient):
        d_tiles, origin = prep(rays, eye, orient)
        hit, normal, albedo, _ = trace(accel, blocks, eye, d_tiles)
        shadow = shadow_pass(accel, occ_blocks, hit.t, hit.hit_mask, origin,
                             d_tiles)
        return shade(hit, normal, albedo, d_tiles, shadow)

    out = frame(data, accel, rays, eye, orient)
    out.block_until_ready()  # compile + warmup

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = frame(data, accel, rays, eye, orient)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS

    rays_per_sec = WIDTH * HEIGHT / dt
    print(
        json.dumps(
            {
                "metric": "primary+shadow rays/sec/chip (bunny 512x512)",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
