#!/usr/bin/env python
"""Phase-level profiling of the fused Pallas bench frame on the real chip.

Isolates: prep, prologue (cull+lists), fused trace+interpolate kernel,
shadow prologue+kernel, shade epilogue — and sweeps tiles_per_program.
"""
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
from raytracercuda_tpu.config import ClusterConfig
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.loader import load_model
from raytracercuda_tpu.ops.math import normalize
from raytracercuda_tpu.trace.dense import (
    tile_pixels, untile_pixels, tile_frustum_planes, _cull_frustum)
from raytracercuda_tpu.trace.pallas_sweep import (
    _tile_lists, occlusion_tiles_pallas, segment_blocks,
    shade_segment_blocks, trace_shade_tiles_pallas)
from raytracercuda_tpu.trace.pipeline import rotate_rays
from raytracercuda_tpu.trace.shade import pack_shaded
from raytracercuda_tpu.utils import content

W = H = 512
TP = 16
config = RenderConfig(accel=AccelKind.CLUSTER)
scene = Scene.create(config)
load_model(content.find("bunny.obj"), scene)
data = scene.data()
accel = build_clusters(data.positions, data.faces, ClusterConfig(cluster_size=128))
blocks, has_uv = shade_segment_blocks(accel, data)
occ_blocks = blocks
jax.block_until_ready((accel, blocks, occ_blocks))

lo = np.asarray(data.positions.min(axis=0)); hi = np.asarray(data.positions.max(axis=0))
center = (lo + hi) / 2; extent = float(np.max(hi - lo))
eye = jnp.asarray(center - np.array([0, 0, 2.0 * extent]), jnp.float32)
orient = jnp.eye(3)
rays = camera_ray_grid(W, H)
light = jnp.asarray([0.4, 0.8, -0.45], jnp.float32); light = light / jnp.linalg.norm(light)
shadow_eps = jnp.float32(config.trace.t_epsilon * extent)
tc = config.trace


def timeit(name, f, *a, iters=20, **k):
    out = f(*a, **k); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a, **k)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:9.3f} ms", flush=True)
    return out


@jax.jit
def prep(rays, eye, orient):
    dirs = rotate_rays(rays, orient)
    d_tiles = tile_pixels(dirs, H, W, TP)
    origin = jnp.broadcast_to(eye[None, :], (d_tiles.shape[0] * TP * TP, 3))
    return d_tiles, origin


@jax.jit
def prologue(accel, eye, d_tiles):
    planes = tile_frustum_planes(d_tiles, TP)
    survive = _cull_frustum(planes, eye, accel.cmin, accel.cmax)
    return _tile_lists(survive, accel.num_clusters)


d_tiles, origin = prep(rays, eye, orient)
jax.block_until_ready((d_tiles, origin))

timeit("prep (rotate+tile)", prep, rays, eye, orient)
timeit("primary prologue (cull+lists)", prologue, accel, eye, d_tiles)

for B in (8, 16, 32, 64):
    @jax.jit
    def trace(accel, blocks, eye, d_tiles, B=B):
        return trace_shade_tiles_pallas(accel, blocks, has_uv, eye, d_tiles,
                                        tile_px=TP, tiles_per_program=B,
                                        trace_cfg=tc)
    hit, normal, albedo, _ = timeit(f"fused trace+interp B={B}", trace,
                                    accel, blocks, eye, d_tiles)

for B in (8, 16, 32, 64):
    @jax.jit
    def shadow_pass(accel, occ_blocks, hit_t, hit_mask, origin, d_tiles, B=B):
        dirs_flat = d_tiles.reshape(-1, 3)
        p = origin + dirs_flat * jnp.minimum(hit_t, 1e6)[..., None]
        so = jnp.where(hit_mask[..., None], p, origin) + light * shadow_eps
        t = d_tiles.shape[0]
        return occlusion_tiles_pallas(
            accel, occ_blocks, so.reshape(t, TP * TP, 3),
            light, hit_mask.reshape(t, TP * TP), tile_px=TP,
            tiles_per_program=B, trace_cfg=tc)
    shadow = timeit(f"shadow (prologue+kernel) B={B}", shadow_pass,
                    accel, occ_blocks, hit.t, hit.hit_mask, origin, d_tiles)


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
    return untile_pixels(packed.reshape(t, TP * TP), H, W, TP)


timeit("shade epilogue", shade, hit, normal, albedo, d_tiles, shadow)


def full_frame(B):
    @jax.jit
    def trace(accel, blocks, eye, d_tiles):
        return trace_shade_tiles_pallas(accel, blocks, has_uv, eye, d_tiles,
                                        tile_px=TP, tiles_per_program=B,
                                        trace_cfg=tc)
    @jax.jit
    def shadow_pass(accel, occ_blocks, hit_t, hit_mask, origin, d_tiles):
        dirs_flat = d_tiles.reshape(-1, 3)
        p = origin + dirs_flat * jnp.minimum(hit_t, 1e6)[..., None]
        so = jnp.where(hit_mask[..., None], p, origin) + light * shadow_eps
        t = d_tiles.shape[0]
        return occlusion_tiles_pallas(
            accel, occ_blocks, so.reshape(t, TP * TP, 3),
            light, hit_mask.reshape(t, TP * TP), tile_px=TP,
            tiles_per_program=B, trace_cfg=tc)
    def frame(rays, eye, orient):
        d_tiles, origin = prep(rays, eye, orient)
        hit, normal, albedo, _ = trace(accel, blocks, eye, d_tiles)
        shadow = shadow_pass(accel, occ_blocks, hit.t, hit.hit_mask,
                             origin, d_tiles)
        return shade(hit, normal, albedo, d_tiles, shadow)
    return frame


for B in (8, 32, 64):
    timeit(f"FULL FRAME B={B}", full_frame(B), rays, eye, orient)
