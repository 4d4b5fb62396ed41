#!/usr/bin/env python
"""Batched on-chip validations: Mosaic Pallas brute kernel parity + speed,
LBVH/cluster build timings vs the reference's 51.7 ms (aa.xml row 3)."""
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
from raytracercuda_tpu.accel.bvh import build_bvh
from raytracercuda_tpu.accel.clusters import build_clusters
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.loader import load_model
from raytracercuda_tpu.trace.bruteforce import trace_brute
from raytracercuda_tpu.trace.pallas_brute import trace_brute_pallas
from raytracercuda_tpu.trace.pipeline import rotate_rays
from raytracercuda_tpu.utils import content


def timeit(name, f, *a, iters=10, **kw):
    out = f(*a, **kw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a, **kw)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)
    return out


config = RenderConfig(accel=AccelKind.CLUSTER)
scene = Scene.create(config)
load_model(content.find("suzanne.obj"), scene)
data = scene.data()

# --- Pallas brute vs XLA brute: exact parity + timing (suzanne 128^2) -----
rays = camera_ray_grid(128, 128)
dirs = jax.jit(rotate_rays)(rays, jnp.eye(3))
eye = jnp.asarray([0, 0, -2.1], jnp.float32)
origin = jnp.broadcast_to(eye[None, :], dirs.shape)

a = timeit("brute XLA (suzanne 128^2, 15488 f)", trace_brute,
           data.positions, data.faces, origin, dirs, iters=3)
b = timeit("brute Pallas (same)", trace_brute_pallas,
           data.positions, data.faces, origin, dirs, iters=3)
eq_face = bool(jnp.all(a.face == b.face))
# t can differ by FMA-fusion rounding ACROSS differently-compiled programs
# on TPU (same formula, different mul-add contractions) — allclose, and
# print the observed worst case.
hit = np.asarray(a.face) >= 0
at, bt = np.asarray(a.t)[hit], np.asarray(b.t)[hit]
rel = float(np.max(np.abs(at - bt) / np.maximum(np.abs(at), 1e-20))) if hit.any() else 0.0
print(f"pallas==xla face: {eq_face}  max|dt|/t: {rel:.2e}", flush=True)
assert eq_face and rel < 1e-5

# --- Build timings on bunny (69,630 faces) --------------------------------
sceneb = Scene.create(config)
load_model(content.find("bunny.obj"), sceneb)
db = sceneb.data()
timeit("build_clusters bunny", build_clusters, db.positions, db.faces,
       config.cluster)
timeit("build_bvh bunny (LBVH+skip links)", build_bvh, db.positions,
       db.faces, config.bvh)
print("reference bmInsertTriangleInTree: 51.7 ms for 3.8k tris (aa.xml)")
