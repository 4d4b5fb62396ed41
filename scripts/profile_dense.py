#!/usr/bin/env python
"""Phase-level profiling of the dense fast path on the real chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracercuda_tpu import AccelKind, RenderConfig, Scene
from raytracercuda_tpu.accel.clusters import build_clusters, origin_consts
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.loader import load_model
from raytracercuda_tpu.trace.dense import (
    _compact, _cull_frustum, occlusion_dense, tile_frustum_planes,
    tile_pixels, trace_dense)
from raytracercuda_tpu.trace.pipeline import rotate_rays
from raytracercuda_tpu.trace.shade import pack_shaded, shade_lambert_rgb
from raytracercuda_tpu.utils import content

W = H = int(os.environ.get("BENCH_SIDE", 512))
TP = int(os.environ.get("TILE_PX", 16))
K = int(os.environ.get("ROUND_K", 32))
TPC = int(os.environ.get("TILES_PER_CHUNK", 32))
config = RenderConfig(accel=AccelKind.CLUSTER)
scene = Scene.create(config)
load_model(content.find("bunny.obj"), scene)
data = scene.data()
cs = build_clusters(data.positions, data.faces, config.cluster)
jax.block_until_ready(cs)
print("clusters:", cs.num_clusters, "x", cs.cluster_size)

lo = np.asarray(data.positions.min(axis=0)); hi = np.asarray(data.positions.max(axis=0))
center = (lo + hi) / 2; extent = float(np.max(hi - lo))
eye = jnp.asarray(center - np.array([0, 0, 2.0 * extent]), jnp.float32)
orient = jnp.eye(3)
rays = camera_ray_grid(W, H)
light = jnp.asarray([0.4, 0.8, -0.45], jnp.float32); light = light / jnp.linalg.norm(light)

dirs = jax.jit(rotate_rays)(rays, orient)
origin = jnp.broadcast_to(eye[None, :], dirs.shape)


def timeit(name, f, *a, iters=10, **kw):
    out = f(*a, **kw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a, **kw)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms")
    return out


kw = dict(tile_px=TP, round_k=K, tiles_per_chunk=TPC,
          cluster_chunk=config.trace.dense_cluster_chunk,
          trace_cfg=config.trace)

timeit("build_clusters", build_clusters, data.positions, data.faces, config.cluster)

if os.environ.get("PROFILE_PHASES"):
    d_tiles = tile_pixels(dirs, H, W, TP)
    planes = tile_frustum_planes(d_tiles, TP)
    cull = jax.jit(lambda p, e: _cull_frustum(p, e, cs.cmin, cs.cmax))
    surv = timeit("cull", cull, planes, eye)
    comp = jax.jit(lambda s: _compact(s, K))
    lists, counts = timeit("compact(sort)", comp, surv)
    cn = np.asarray(counts)
    print(f"   survivors/tile mean {cn.mean():.1f} max {cn.max()} nonzero {np.mean(cn>0):.2f}")
    oc = timeit("origin_consts", jax.jit(lambda e: origin_consts(cs, e)), eye)

hit = timeit("trace_dense", trace_dense, cs, eye, dirs, H, W, **kw)
p = origin + dirs * jnp.minimum(hit.t, 1e6)[..., None]
shadow_origin = jnp.where(hit.hit_mask[..., None], p, origin) + light * (1e-4 * extent)
shadow_origin = jax.block_until_ready(shadow_origin)
hm = jax.block_until_ready(hit.hit_mask)
occ = timeit("occlusion_dense", occlusion_dense, cs, shadow_origin, light, hm, H, W, **kw)
shade = jax.jit(lambda d, h, o, di, sm: pack_shaded(shade_lambert_rgb(d, h, o, di, shadow_mask=sm)))
timeit("shade+pack", shade, data, hit, origin, dirs, occ & hm)
print("hit frac", float(np.asarray(hm).mean()), "shadow frac", float(np.asarray(occ).mean()))

if os.environ.get("PROFILE_L"):
    # Phase cost vs cluster size: cull+sort shrink with C=F/L, sweep grows
    # with survivor waste.  Clean numbers for picking L.
    from raytracercuda_tpu.config import ClusterConfig
    from raytracercuda_tpu.trace.dense import _compact

    d_tiles = tile_pixels(dirs, H, W, TP)
    planes = tile_frustum_planes(d_tiles, TP)
    for Lsz in (int(s) for s in os.environ["PROFILE_L"].split(",")):
        csl = build_clusters(data.positions, data.faces,
                             ClusterConfig(cluster_size=Lsz))
        jax.block_until_ready(csl)
        cull = jax.jit(lambda p, e: _cull_frustum(p, e, csl.cmin, csl.cmax))
        surv = timeit(f"L={Lsz:4d} cull [T,{csl.num_clusters}]", cull, planes, eye)
        comp = jax.jit(lambda s: _compact(s, K))
        lists, counts = timeit(f"L={Lsz:4d} compact(sort)", comp, surv)
        cn = np.asarray(counts)
        timeit(f"L={Lsz:4d} origin_consts", jax.jit(lambda e: origin_consts(csl, e)), eye)
        timeit(f"L={Lsz:4d} trace_dense", trace_dense, csl, eye, dirs, H, W, **kw)
        print(f"   survivors/tile mean {cn.mean():.1f} max {cn.max()} "
              f"tris-tested/tile {cn.mean() * Lsz:.0f}")

if os.environ.get("PROFILE_SHADE"):
    from raytracercuda_tpu.models.mesh import VERTEX_DATA_NORMAL
    from raytracercuda_tpu.ops.interpolate import face_interpolate
    from raytracercuda_tpu.trace.shade import material_albedo

    interp = jax.jit(lambda d, h: face_interpolate(
        d.attrs[VERTEX_DATA_NORMAL], d.faces, h.face, h.u, h.v))
    timeit("  interp normal", interp, data, hit)
    timeit("  material_albedo", jax.jit(material_albedo), data, hit)
    rgbv = jnp.zeros((W * H, 3), jnp.float32)
    timeit("  pack only", jax.jit(pack_shaded), rgbv)
    # Flat face-table alternative: one [F,9] build then one row gather.
    tbl = jax.jit(lambda d: jnp.concatenate(
        [d.attrs[VERTEX_DATA_NORMAL][d.faces[:, i]] for i in range(3)], axis=1))
    ftab = timeit("  face-table build", tbl, data)
    timeit("  face-table gather", jax.jit(lambda t, f: t[jnp.maximum(f, 0)]),
           ftab, hit.face)
