#!/usr/bin/env python
"""Where do config 4's 347 ms progressive step / 415 ms grad step go?

Times each component of the differentiable/progressive route at 1024^2
on the f16+sphere scene (350k tris): the stop-grad Pallas forward trace,
the differentiable recompute+shade, the XLA occlusion_dense shadow pass
vs the Pallas occlusion kernel, and the full composed step."""
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
from raytracercuda_tpu.models.procedural import bumpy_sphere_mesh
from raytracercuda_tpu.utils import content

config = RenderConfig(accel=AccelKind.CLUSTER)
scene = Scene.create(config)
load_model(content.find("f16.obj"), scene)
scene.add_mesh(bumpy_sphere_mesh(345944, radius=4.0, center=(0, -1, 14), seed=2))
data = scene.data()
accel = build_clusters(data.positions, data.faces, config.cluster)
jax.block_until_ready(accel.tris)
lo = np.asarray(data.positions.min(axis=0)); hi = np.asarray(data.positions.max(axis=0))
center = (lo + hi) / 2; extent = float(np.max(hi - lo))
eye = jnp.asarray(center - np.array([0, 0, 2.0 * extent]), jnp.float32)
orient = jnp.eye(3)
W = H = 1024
rays = camera_ray_grid(W, H)
tc = config.trace

def timed(name, fn, *a, iters=5, **kw):
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a, **kw)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:45s} {ms:8.2f} ms")
    return out

from raytracercuda_tpu.trace.pipeline import rotate_rays, trace_hit
from raytracercuda_tpu.trace.pallas_sweep import trace_dense_pallas, segment_blocks, occlusion_dense_pallas
from raytracercuda_tpu.diff.render_grad import render_rgb, recompute_hit, l2_image_loss
from raytracercuda_tpu.trace.shade import shade_lambert_rgb
from raytracercuda_tpu.trace.dense import occlusion_dense

dirs = jax.jit(rotate_rays)(rays, orient)
jax.block_until_ready(dirs)
blocks = accel.tri_blocks if accel.tri_blocks is not None else segment_blocks(accel)

# 1. stop-grad forward traversal (the Pallas trace)
f_trace = jax.jit(lambda d: trace_dense_pallas(accel, blocks, eye, d, height=H, width=W, tile_px=tc.dense_tile_px, trace_cfg=tc))
hit = timed("trace_dense_pallas (fwd ids)", f_trace, dirs)

# 2. differentiable recompute + shade, fixed ids
def rec_shade(d, ids):
    origin = jnp.broadcast_to(eye[None, :], d.shape)
    h = recompute_hit(data, ids, origin, d)
    return shade_lambert_rgb(data, h, origin, d)
f_rs = jax.jit(rec_shade)
timed("recompute_hit + shade_lambert", f_rs, dirs, hit.face)

# 3a. occlusion_dense (XLA) — what render_rgb uses today
l = jnp.asarray([0.4, 0.8, -0.45], jnp.float32); l = l / jnp.linalg.norm(l)
def occ_xla(d, h_t, h_m):
    origin = jnp.broadcast_to(eye[None, :], d.shape)
    p = origin + d * h_t[..., None]
    so = jnp.where(h_m[..., None], p, origin) + l * (10 * tc.t_epsilon)
    return occlusion_dense(accel, so, l, h_m, height=H, width=W,
                           tile_px=tc.dense_tile_px, round_k=tc.dense_round_clusters,
                           tiles_per_chunk=tc.dense_tiles_per_chunk,
                           cluster_chunk=tc.dense_cluster_chunk, trace_cfg=tc)
hm = hit.t < 3.0e38
timed("occlusion_dense (XLA)", jax.jit(occ_xla), dirs, hit.t, hm)

# 3b. occlusion via the Pallas kernel (what FrameRenderer uses)
def occ_pal(d, h_t, h_m):
    origin = jnp.broadcast_to(eye[None, :], d.shape)
    p = origin + d * jnp.minimum(h_t, 1e6)[..., None]
    so = jnp.where(h_m[..., None], p, origin) + l * (10 * tc.t_epsilon)
    return occlusion_dense_pallas(accel, blocks, so, l, h_m, height=H, width=W,
                                  tile_px=tc.dense_tile_px, trace_cfg=tc)
timed("occlusion_dense_pallas", jax.jit(occ_pal), dirs, hit.t, hm)

# 4. full render_rgb (no shadows / shadows)
f_rr = jax.jit(lambda d: render_rgb(data, accel, rays, eye, orient, config, frame_hw=(H, W)))
timed("render_rgb no-shadow", f_rr, dirs)
f_rrs = jax.jit(lambda d: render_rgb(data, accel, rays, eye, orient, config, with_shadows=True, frame_hw=(H, W)))
timed("render_rgb with shadows", f_rrs, dirs)

# 5. grad step
target = jnp.zeros((W * H, 3), jnp.float32)
def loss_fn(positions, textures):
    s = data._replace(positions=positions, textures=textures)
    return l2_image_loss(s, accel, rays, eye, orient, target, config, frame_hw=(H, W))
gfn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
timed("grad step (pos+tex)", gfn, data.positions, data.textures, iters=3)

# 6. FrameRenderer reference point at same scene/size
from raytracercuda_tpu.trace.frame import FrameRenderer
fr = FrameRenderer(data, accel, config, H, W, shadows=True)
timed("FrameRenderer (product path)", fr.render, eye, orient, rays)
