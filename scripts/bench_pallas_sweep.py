#!/usr/bin/env python
"""On-chip comparison: XLA dense path vs Pallas tile-sweep kernel,
bunny 512x512 primary + shadow, plus parity check."""
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
from raytracercuda_tpu.trace.dense import occlusion_dense, trace_dense
from raytracercuda_tpu.trace.pallas_sweep import (
    occlusion_dense_pallas, segment_blocks, trace_dense_pallas)
from raytracercuda_tpu.trace.pipeline import rotate_rays
from raytracercuda_tpu.utils import content

W = H = 512
G = int(os.environ.get("SEG_G", 128))

config = RenderConfig(accel=AccelKind.CLUSTER)
scene = Scene.create(config)
load_model(content.find("bunny.obj"), scene)
data = scene.data()
cs16 = build_clusters(data.positions, data.faces, config.cluster)
csG = build_clusters(data.positions, data.faces, ClusterConfig(cluster_size=G))
blocks = segment_blocks(csG)
jax.block_until_ready((cs16, csG, blocks))
print(f"XLA clusters {cs16.num_clusters}x{cs16.cluster_size}; "
      f"pallas segments {csG.num_clusters}x{G}", flush=True)

lo = np.asarray(data.positions.min(axis=0)); hi = np.asarray(data.positions.max(axis=0))
center = (lo + hi) / 2; extent = float(np.max(hi - lo))
eye = jnp.asarray(center - np.array([0, 0, 2.0 * extent]), jnp.float32)
rays = camera_ray_grid(W, H)
light = jnp.asarray([0.4, 0.8, -0.45], jnp.float32); light = light / jnp.linalg.norm(light)
dirs = jax.jit(rotate_rays)(rays, jnp.eye(3))
origin = jnp.broadcast_to(eye[None, :], dirs.shape)


def timeit(name, f, *a, iters=10, **kw):
    out = f(*a, **kw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a, **kw)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)
    return out


kw = dict(tile_px=config.trace.dense_tile_px,
          round_k=config.trace.dense_round_clusters,
          tiles_per_chunk=config.trace.dense_tiles_per_chunk,
          cluster_chunk=config.trace.dense_cluster_chunk,
          trace_cfg=config.trace)

hx = timeit("trace XLA dense", trace_dense, cs16, eye, dirs, H, W, **kw)
hp = timeit("trace Pallas sweep", trace_dense_pallas, csG, blocks, eye, dirs,
            H, W, tile_px=16, trace_cfg=config.trace)
same = float(np.mean(np.asarray(hx.face) == np.asarray(hp.face)))
print("   face agreement:", same, flush=True)
if same < 1.0:
    # Referee against the exact-formula oracle (validated vs XLA brute).
    from raytracercuda_tpu.trace.pallas_brute import trace_brute_pallas

    ho = timeit("trace oracle (pallas brute)", trace_brute_pallas,
                data.positions, data.faces, origin, dirs, iters=2)
    fo = np.asarray(ho.face)
    fx, fp_, to = np.asarray(hx.face), np.asarray(hp.face), np.asarray(ho.t)
    tx, tp = np.asarray(hx.t), np.asarray(hp.t)
    print("   XLA==oracle:", float(np.mean(fx == fo)),
          " pallas==oracle:", float(np.mean(fp_ == fo)), flush=True)
    bad = fp_ != fo
    if bad.any():
        dt = np.abs(tp[bad] - to[bad]) / np.maximum(np.abs(to[bad]), 1e-9)
        print(f"   pallas-vs-oracle diffs: {bad.sum()} px; "
          f"t rel-err median {np.median(dt):.2e} max {dt.max():.2e}",
          flush=True)
        print("   miss-vs-hit mismatches:",
              int(np.sum((fp_ < 0) != (fo < 0))), flush=True)

p = origin + dirs * jnp.minimum(hx.t, 1e6)[..., None]
so = jnp.where(hx.hit_mask[..., None], p, origin) + light * (1e-4 * extent)
so = jax.block_until_ready(so)
hm = jax.block_until_ready(hx.hit_mask)
ox = timeit("occl XLA dense", occlusion_dense, cs16, so, light, hm, H, W, **kw)
op = timeit("occl Pallas sweep", occlusion_dense_pallas, csG, blocks, so,
            light, hm, H, W, tile_px=16, trace_cfg=config.trace)
print("   occl agreement:", float(np.mean(np.asarray(ox) == np.asarray(op))),
      flush=True)

# --- phase isolation ---------------------------------------------------------
if os.environ.get("PROFILE_PALLAS"):
    import jax as _jax
    from raytracercuda_tpu.trace.pallas_sweep import (
        _cull_frustum as _cf, _tile_lists, tile_frustum_planes as _tfp,
        tile_pixels as _tp)

    # Empty frame: rays aimed away -> counts ~ 0 -> kernel cost = per-program
    # overhead + prologue.
    timeit("trace Pallas EMPTY frame", trace_dense_pallas, csG, blocks, eye,
           -dirs, H, W, tile_px=16, trace_cfg=config.trace)

    @_jax.jit
    def prologue(dirs_, eye_):
        d_tiles = _tp(dirs_, H, W, 16)
        planes = _tfp(d_tiles, 16)
        survive = _cf(planes, eye_, csG.cmin, csG.cmax)
        return _tile_lists(survive, csG.num_clusters)

    timeit("prologue cull+onehot-lists", prologue, dirs, eye)

if os.environ.get("PROFILE_PALLAS2"):
    from raytracercuda_tpu.trace.dense import untile_pixels as _up

    # Epilogue cost: 4 untiles + face gather + wheres.
    T_, R_ = (H // 16) * (W // 16), 256
    btx = jnp.zeros((T_ * R_, 1), jnp.float32)
    bsx = jnp.zeros((T_ * R_, 1), jnp.int32)

    @jax.jit
    def epilogue(bt, bu, bv, bs):
        def unt(x):
            return _up(x.reshape(T_, R_), H, W, 16)
        bt, bu, bv, bslot = unt(bt), unt(bu), unt(bv), unt(bs)
        hit = bt < 3e38
        face = jnp.where(hit, csG.face_order[bslot], -1)
        return jnp.where(hit, bt, 3e38), bu, bv, face

    timeit("epilogue untile+gather", epilogue, btx, btx, btx, bsx)

    # SMEM width experiment: truncate lists to 128 (bunny max count 53,
    # still exact HERE) to see if the 640-wide SMEM blocks are the cost.
    import raytracercuda_tpu.trace.pallas_sweep as ps
    orig = ps._tile_lists
    def narrow(survive, num_segments, max_w=128):
        lists, counts = orig(survive, num_segments, max_w)
        return lists[:, :, :128], counts
    ps._tile_lists = narrow
    ps.trace_dense_pallas._clear_cache()
    timeit("trace Pallas W=128 lists", ps.trace_dense_pallas, csG, blocks,
           eye, dirs, H, W, tile_px=16, trace_cfg=config.trace)
    timeit("trace Pallas W=128 EMPTY", ps.trace_dense_pallas, csG, blocks,
           eye, -dirs, H, W, tile_px=16, trace_cfg=config.trace)
    ps._tile_lists = orig
