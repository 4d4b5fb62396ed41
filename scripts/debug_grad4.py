#!/usr/bin/env python
"""Locate the config-4 non-finite grad: tiled scatter backward vs plain.

CAVEAT (measured): the "plain" pass re-jits the OUTER lambda but
`l2_image_loss` is itself jitted, so its inner trace (which captured the
tiled route) is REUSED - the second row is not an independent plain-path
measurement.  The r4 CONFIGS value (261 ms) is the honest plain-path
baseline; this script's value is the tiled-vs-tiled reproducibility
check plus the finiteness probe."""
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
from raytracercuda_tpu.diff import render_grad
from raytracercuda_tpu.diff.render_grad import l2_image_loss

config = RenderConfig(accel=AccelKind.CLUSTER)
scene = Scene.create(config)
load_model(content.find("f16.obj"), scene)
scene.add_mesh(bumpy_sphere_mesh(345944, radius=4.0, center=(0, -1, 14),
                                 seed=2))
data = scene.data()
accel = build_clusters(data.positions, data.faces, config.cluster)
jax.block_until_ready(accel)
lo = np.asarray(data.positions.min(axis=0))
hi = np.asarray(data.positions.max(axis=0))
eye = jnp.asarray((lo + hi) / 2 - np.array([0, 0, 2.0 * float(np.max(hi - lo))]),
                  jnp.float32)
orient = jnp.eye(3)
W = H = 1024
rays = camera_ray_grid(W, H)
target = jnp.zeros((W * H, 3), jnp.float32)


def run(tag):
    gfn = jax.jit(jax.grad(lambda p, t: l2_image_loss(
        data._replace(positions=p, textures=t), accel, rays, eye, orient,
        target, config, frame_hw=(H, W)), argnums=(0, 1)))
    gp, gt = gfn(data.positions, data.textures)
    jax.block_until_ready((gp, gt))
    t0 = time.perf_counter()
    for _ in range(3):
        gp, gt = gfn(data.positions, data.textures)
    jax.block_until_ready((gp, gt))
    ms = (time.perf_counter() - t0) / 3 * 1e3
    gp, gt = np.asarray(gp), np.asarray(gt)
    bad = ~np.isfinite(gp)
    print(f"{tag}: ms={ms:.1f} pos_finite={bool(np.isfinite(gp).all())} "
          f"n_bad={int(bad.sum())} tex_finite={bool(np.isfinite(gt).all())}",
          flush=True)
    if bad.any():
        rows = np.unique(np.nonzero(bad)[0])
        print("  bad rows (first 10):", rows[:10], "of", gp.shape[0])
        print("  bad vals:", gp[rows[:5]])
    return gp, gt


gp1, gt1 = run("tiled")
render_grad._SCATTER_B = 1 << 30  # force plain autodiff gathers
gp0, gt0 = run("plain")
fin = np.isfinite(gp1) & np.isfinite(gp0)
print("pos max abs diff (finite):", float(np.abs(np.where(fin, gp1 - gp0, 0)).max()))
print("tex max abs diff:", float(np.abs(gt1 - gt0).max()))
