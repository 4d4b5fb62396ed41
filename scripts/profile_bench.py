#!/usr/bin/env python
"""Phase-level profiling of the bench frame on the real chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracercuda_tpu import AccelKind, RenderConfig, Scene
from raytracercuda_tpu.accel.bvh import build_bvh
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.loader import load_model
from raytracercuda_tpu.trace.beam import occlusion_beam, trace_beam
from raytracercuda_tpu.trace.pipeline import rotate_rays
from raytracercuda_tpu.trace.shade import pack_shaded, shade_lambert_rgb
from raytracercuda_tpu.utils import content

W = H = 512
config = RenderConfig(accel=AccelKind.BVH)
scene = Scene.create(config)
load_model(content.find("bunny.obj"), scene)
data = scene.data()
accel = build_bvh(data.positions, data.faces, config.bvh)
jax.block_until_ready(accel)

lo = np.asarray(data.positions.min(axis=0)); hi = np.asarray(data.positions.max(axis=0))
center = (lo + hi) / 2; extent = float(np.max(hi - lo))
eye = jnp.asarray(center - np.array([0, 0, 2.0 * extent]), jnp.float32)
orient = jnp.eye(3)
rays = camera_ray_grid(W, H)
light = jnp.asarray([0.4, 0.8, -0.45], jnp.float32); light = light / jnp.linalg.norm(light)

kw = dict(tile_px=config.trace.beam_tile, queue=config.trace.beam_queue,
          cfg=config.bvh, trace_cfg=config.trace,
          tiles_per_chunk=config.trace.beam_tiles_per_chunk)

dirs = jax.jit(rotate_rays)(rays, orient)
origin = jnp.broadcast_to(eye[None, :], dirs.shape)

def timeit(name, f, *a, iters=5, **k):
    out = f(*a, **k); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a, **k)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1e3:9.2f} ms")
    return out

timeit("build_bvh", build_bvh, data.positions, data.faces, config.bvh)
hit = timeit("trace_beam(primary)", trace_beam, accel, eye, dirs, height=H, width=W, **kw)
p = origin + dirs * jnp.minimum(hit.t, 1e6)[..., None]
shadow_origin = jnp.where(hit.hit_mask[..., None], p, origin) + light * 1e-3
shadow_origin = jax.block_until_ready(shadow_origin)
hm = jax.block_until_ready(hit.hit_mask)
timeit("occlusion_beam(shadow)", occlusion_beam, accel, shadow_origin, light, hm, height=H, width=W, **kw)

from raytracercuda_tpu.trace.shadow import build_shadow_grid, occlusion_grid
sgrid = timeit("build_shadow_grid", build_shadow_grid, data.positions, data.faces, light, res=128)
timeit("occlusion_grid(shadow)", occlusion_grid, sgrid, shadow_origin, hm, trace_cfg=config.trace)
shade = jax.jit(lambda d, h, o, di: pack_shaded(shade_lambert_rgb(d, h, o, di)))
timeit("shade+pack", shade, data, hit, origin, dirs)
