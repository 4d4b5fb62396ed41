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
jax.block_until_ready((accel, r.blocks, r.occ_blocks))

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


s1 = timeit("stage1 prep+fused trace", r._stage_trace, r.accel, r.blocks,
            rays, eye, orient)
d_tiles, hit, normal, albedo, tex_uv = s1
timeit("stage2 shadow+shade", r._stage_shadow_shade, r.accel, r.occ_blocks,
       r.scene.textures, eye, d_tiles, hit, normal, albedo, tex_uv)
timeit("FULL render single_dispatch", r.render, eye, orient, rays)
r2s = FrameRenderer(data, accel, config, H, W, single_dispatch=False)
timeit("FULL render two-stage", r2s.render, eye, orient, rays)

# ---- sub-phase isolation ----
from raytracercuda_tpu.trace.dense import tile_frustum_planes, _cull_frustum
from raytracercuda_tpu.trace.pallas_sweep import _tile_lists, occlusion_tiles_pallas
from raytracercuda_tpu.trace.shade import pack_shaded
from raytracercuda_tpu.trace.dense import untile_pixels

d_tiles = s1[0]

@jax.jit
def planes_only(d_tiles):
    return tile_frustum_planes(d_tiles, 16)

@jax.jit
def cull_only(planes, eye):
    return _cull_frustum(planes, eye, accel.cmin, accel.cmax)

@jax.jit
def lists_only(survive):
    return _tile_lists(survive, accel.num_clusters)

planes = timeit("  planes", planes_only, d_tiles)
survive = timeit("  cull", cull_only, planes, eye)
timeit("  tile_lists", lists_only, survive)

hit, normal, albedo = s1[1], s1[2], s1[3]
light = r.light

@jax.jit
def so_active(hit_t, hit_mask, normal, d_tiles):
    dirs_flat = d_tiles.reshape(-1, 3)
    from raytracercuda_tpu.ops.math import normalize
    n = normalize(normal, eps=1e-30)
    flip = jnp.sum(n * dirs_flat, axis=-1) > 0.0
    n = jnp.where(flip[..., None], -n, n)
    ndotl = jnp.maximum(jnp.sum(n * light, axis=-1), 0.0)
    active = hit_mask & (ndotl > 0.0)
    p = eye[None, :] + dirs_flat * jnp.minimum(hit_t, 1e6)[..., None]
    so = jnp.where(active[..., None], p, eye[None, :]) + light * r.shadow_eps
    return so, active, ndotl

soa = timeit("  so+ndotl+active", so_active, hit.t, hit.hit_mask, normal, d_tiles)
so, active, ndotl = soa

@jax.jit
def occl_only(so, active):
    t = d_tiles.shape[0]
    return occlusion_tiles_pallas(accel, r.occ_blocks, so.reshape(t, 256, 3),
                                  light, active.reshape(t, 256),
                                  tile_px=16, trace_cfg=config.trace)

shadow = timeit("  occlusion (cull+lists+kernel)", occl_only, so, active)

@jax.jit
def shade_only(ndotl, shadow, hit_mask, albedo):
    nd = jnp.where(shadow, 0.0, ndotl)
    rgb = albedo * (0.08 + 0.92 * nd)[..., None]
    rgb = jnp.where(hit_mask[..., None], rgb, jnp.asarray([0.,1.,0.]))
    packed = pack_shaded(rgb)
    return untile_pixels(packed.reshape(d_tiles.shape[0], 256), H, W, 16)

timeit("  shade+pack+untile", shade_only, ndotl, shadow, hit.hit_mask, albedo)
