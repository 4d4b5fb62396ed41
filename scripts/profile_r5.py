#!/usr/bin/env python
"""Round-5 phase profiling: decompose config-4 (grad step) and config-5
(multi-bounce) on-chip so the optimization work targets measured walls.

Usage: python scripts/profile_r5.py [4|5|5b]
"""
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

from raytracercuda_tpu import AccelKind, RenderConfig, Scene
from raytracercuda_tpu.accel.clusters import build_clusters
from raytracercuda_tpu.config import TraceConfig
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.loader import load_model
from raytracercuda_tpu.models.procedural import bumpy_sphere_mesh
from raytracercuda_tpu.utils import content


def timed(fn, *a, iters=5, **kw):
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def log(name, ms, **kv):
    print(json.dumps({"phase": name, "ms": round(ms, 2), **kv}), flush=True)


def scene4():
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
    center = (lo + hi) / 2
    extent = float(np.max(hi - lo))
    eye = jnp.asarray(center - np.array([0, 0, 2.0 * extent]), jnp.float32)
    return config, data, accel, eye


def profile4():
    from raytracercuda_tpu.diff.render_grad import (l2_image_loss, render_rgb)

    config, data, accel, eye = scene4()
    orient = jnp.eye(3)
    W = H = 1024
    rays = camera_ray_grid(W, H)
    target = jnp.zeros((W * H, 3), jnp.float32)

    # Forward pieces.
    fwd = jax.jit(lambda p, t: l2_image_loss(
        data._replace(positions=p, textures=t), accel, rays, eye, orient,
        target, config, frame_hw=(H, W)))
    ms, _ = timed(fwd, data.positions, data.textures, iters=3)
    log("c4 loss fwd only", ms)

    ms, _ = timed(lambda: render_rgb(data, accel, rays, eye, orient, config,
                                     with_shadows=True, frame_hw=(H, W)),
                  iters=3)
    log("c4 render_rgb fwd (shadows)", ms)

    gfn = jax.jit(jax.grad(lambda p, t: l2_image_loss(
        data._replace(positions=p, textures=t), accel, rays, eye, orient,
        target, config, frame_hw=(H, W)), argnums=(0, 1)))
    ms, _ = timed(gfn, data.positions, data.textures, iters=3)
    log("c4 grad step (pos+tex)", ms)

    # positions-only and textures-only grads isolate the two scatters.
    gp = jax.jit(jax.grad(lambda p: l2_image_loss(
        data._replace(positions=p), accel, rays, eye, orient, target,
        config, frame_hw=(H, W))))
    ms, _ = timed(gp, data.positions, iters=3)
    log("c4 grad positions only", ms)

    gt = jax.jit(jax.grad(lambda t: l2_image_loss(
        data._replace(textures=t), accel, rays, eye, orient, target,
        config, frame_hw=(H, W))))
    ms, _ = timed(gt, data.textures, iters=3)
    log("c4 grad textures only", ms)

    # FrameRenderer product-path forward for the same scene (Weak #7).
    from raytracercuda_tpu.trace.frame import FrameRenderer

    fr = FrameRenderer(data, accel, config, H, W, shadows=True)
    ms, _ = timed(lambda: fr.render(eye, orient, rays), iters=3)
    log("c4 FrameRenderer fwd", ms)


def profile5p():
    """Phase isolation of the Pallas multi-bounce route at 1080p-pad."""
    from raytracercuda_tpu.trace.dense import tile_pixels_planar
    from raytracercuda_tpu.trace.pallas_bounce import (
        general_tile_cull, render_bounces_pallas, trace_shade_general_planar)
    from raytracercuda_tpu.trace.pallas_sweep import (
        _cull_frustum, _tile_lists, occlusion_tiles_planar,
        shade_segment_blocks, tile_planes_planar, trace_shade_tiles_planar)
    from raytracercuda_tpu.trace.pipeline import rotate_rays

    config, data, accel, eye = scene5()
    tc = config.trace
    tp = tc.dense_tile_px
    W, Hreal = 1920, 1080
    H = -(-Hreal // tp) * tp  # 1088 edge-pad like the product path
    rays = camera_ray_grid(W, Hreal)
    dirs = jax.jit(rotate_rays)(rays, jnp.eye(3))
    img = dirs.reshape(Hreal, W, 3)
    img = jnp.pad(img, ((0, H - Hreal), (0, 0), (0, 0)), mode="edge")
    dirs = img.reshape(H * W, 3)
    blocks, has_uv = shade_segment_blocks(accel, data)
    jax.block_until_ready(blocks)
    d3 = jax.jit(lambda d: tile_pixels_planar(d.T, H, W, tp))(dirs)
    jax.block_until_ready(d3)
    T = d3.shape[0]
    R = tp * tp
    C = accel.num_clusters
    log("c5p shapes", 0.0, tiles=T, rays_per_tile=R, clusters=C,
        tile_px=tp)

    light = jnp.asarray([0.4, 0.8, -0.45], jnp.float32)
    light = light / jnp.linalg.norm(light)

    # Whole-frame nb=0/1/2 on the Pallas route.
    for nb in (0, 1, 2):
        fn = jax.jit(partial(render_bounces_pallas, tile_px=tp,
                             num_bounces=nb, trace_cfg=tc),
                     static_argnums=(2, 6, 7))
        ms, _ = timed(fn, accel, blocks, has_uv, data.textures, eye, dirs,
                      H, W, iters=3)
        log(f"c5p render_bounces_pallas nb={nb}", ms)

    # Primary kernel alone (with refl).
    fn = jax.jit(partial(trace_shade_tiles_planar, tile_px=tp,
                         trace_cfg=tc, with_refl=True),
                 static_argnums=(2,))
    ms, outs = timed(fn, accel, blocks, has_uv, eye, d3, iters=3)
    log("c5p primary planar kernel", ms)

    # Cull + list phases for the primary.
    planes = jax.jit(partial(tile_planes_planar, tile_px=tp))(d3)
    ms, survive = timed(jax.jit(_cull_frustum), planes, eye, accel.cmin,
                        accel.cmax, iters=5)
    log("c5p primary cull", ms, survivors=int(jnp.sum(survive)))
    ms, (lists, counts) = timed(
        jax.jit(partial(_tile_lists, max_w=tc.sweep_list_width),
                static_argnums=(1,)), survive, C, iters=5)
    log("c5p primary tile_lists", ms,
        total_count=int(jnp.sum(counts)),
        mean_count=round(float(jnp.mean(counts)), 2),
        max_count=int(jnp.max(counts)))

    # Bounce geometry from the primary outs (mirror of the route).
    from raytracercuda_tpu.trace.pallas_bounce import _planar_shade
    r0, g0, b0, hitm, nx, ny, nz, refl = jax.jit(
        partial(_planar_shade, has_uv=has_uv, ambient=0.08),
        static_argnums=())(outs, d3, light, data.textures)
    eps = jnp.float32(tc.t_epsilon) * jnp.maximum(
        jnp.max(accel.cmax) - jnp.min(accel.cmin), 1.0)
    dx = d3[:, 0, :].reshape(-1)
    dy = d3[:, 1, :].reshape(-1)
    dz = d3[:, 2, :].reshape(-1)
    t_ = jnp.minimum(outs[0].reshape(-1), jnp.float32(3e37))
    px_, py_, pz_ = eye[0] + dx * t_, eye[1] + dy * t_, eye[2] + dz * t_
    ddn = dx * nx + dy * ny + dz * nz
    ndx, ndy, ndz = (dx - 2 * ddn * nx, dy - 2 * ddn * ny, dz - 2 * ddn * nz)
    active = hitm & (refl > 0.0)
    o3 = jnp.stack([(px_ + nx * eps).reshape(T, R),
                    (py_ + ny * eps).reshape(T, R),
                    (pz_ + nz * eps).reshape(T, R)], axis=1)
    d3b = jnp.stack([ndx.reshape(T, R), ndy.reshape(T, R),
                     ndz.reshape(T, R)], axis=1)
    a2 = active.reshape(T, R)
    jax.block_until_ready((o3, d3b, a2))
    log("c5p active bounce rays", 0.0, n=int(jnp.sum(a2)),
        frac=round(float(jnp.mean(a2)), 4),
        active_tiles=int(jnp.sum(jnp.any(a2, axis=1))))

    # Bounce cull + lists + sweep, isolated.
    ms, surv_b = timed(jax.jit(general_tile_cull), o3, d3b, a2,
                       accel.cmin, accel.cmax, iters=5)
    log("c5p bounce general_tile_cull", ms, survivors=int(jnp.sum(surv_b)))
    ms, (lb, cb) = timed(
        jax.jit(partial(_tile_lists, max_w=tc.sweep_list_width),
                static_argnums=(1,)), surv_b, C, iters=5)
    log("c5p bounce tile_lists", ms, total_count=int(jnp.sum(cb)),
        max_count=int(jnp.max(cb)))
    ms, _ = timed(jax.jit(partial(trace_shade_general_planar, tile_px=tp,
                                  trace_cfg=tc), static_argnums=(2,)),
                  accel, blocks, has_uv, o3, d3b, a2, iters=3)
    log("c5p bounce general sweep (incl cull+lists)", ms)

    # Shadow stage for reference.
    sact = hitm.reshape(T, R)
    ms, _ = timed(jax.jit(partial(occlusion_tiles_planar, tile_px=tp,
                                  trace_cfg=tc)),
                  accel, blocks, o3, light, sact, iters=3)
    log("c5p occlusion planar", ms)


def scene5():
    # 16px tiles = the bench_configs config-5 shape (8px measured 4x the
    # per-tile fixed cost at 1080p).
    config = RenderConfig(accel=AccelKind.CLUSTER)
    scene = Scene.create(config)
    load_model(content.find("bunny.obj"), scene)
    scene.add_mesh(bumpy_sphere_mesh(345944, radius=0.9,
                                     center=(1.6, 0.8, 0.2), seed=2))
    scene.add_mesh(bumpy_sphere_mesh(100002, radius=0.7,
                                     center=(-1.5, 0.6, -0.3), seed=3))
    data = scene.data()
    accel = build_clusters(data.positions, data.faces, config.cluster)
    jax.block_until_ready(accel)
    lo = np.asarray(data.positions.min(axis=0))
    hi = np.asarray(data.positions.max(axis=0))
    center = (lo + hi) / 2
    extent = float(np.max(hi - lo))
    eye = jnp.asarray(center - np.array([0, 0, 1.2 * extent]), jnp.float32)
    return config, data, accel, eye


def profile5():
    from raytracercuda_tpu.trace.bounce import render_bounces
    from raytracercuda_tpu.trace.pipeline import rotate_rays

    config, data, accel, eye = scene5()
    W, H = 1920, 1080
    rays = camera_ray_grid(W, H)
    dirs = jax.jit(rotate_rays)(rays, jnp.eye(3))
    tc = config.trace

    for nb in (0, 1, 2):
        fn = jax.jit(lambda d, nb=nb: render_bounces(
            accel, data, eye, d, H, W, config, num_bounces=nb))
        ms, _ = timed(fn, dirs, iters=3)
        log(f"c5 render_bounces nb={nb}", ms)

    # Pieces: primary dense trace, occlusion, one bounce's general sweep.
    from raytracercuda_tpu.trace.dense import (occlusion_dense, trace_dense,
                                               trace_clusters_rays)

    ms, hit = timed(lambda: trace_dense(
        accel, eye, dirs, height=H, width=W, tile_px=tc.dense_tile_px,
        round_k=tc.dense_round_clusters,
        tiles_per_chunk=tc.dense_tiles_per_chunk,
        cluster_chunk=tc.dense_cluster_chunk, trace_cfg=tc), iters=3)
    log("c5 primary trace_dense (XLA)", ms)

    # Pallas primary for the same frame.
    from raytracercuda_tpu.trace.pallas_sweep import (segment_blocks,
                                                      trace_dense_pallas)
    blocks = accel.tri_blocks if accel.tri_blocks is not None else \
        segment_blocks(accel)
    ms, hitp = timed(lambda: trace_dense_pallas(
        accel, blocks, eye, dirs, height=H, width=W,
        tile_px=tc.dense_tile_px, trace_cfg=tc), iters=3)
    log("c5 primary trace_dense_pallas", ms)
    agree = float(np.mean(np.asarray(hit.face) == np.asarray(hitp.face)))
    log("c5 primary face agreement", 0.0, frac=round(agree, 4))

    # Secondary bundle: mirror-bounce geometry off the primary hits.
    from raytracercuda_tpu.trace.bounce import _bounce_geometry, \
        _hit_reflectivity

    eps = jnp.float32(tc.t_epsilon) * jnp.maximum(
        jnp.max(accel.cmax) - jnp.min(accel.cmin), 1.0)
    origin = jnp.broadcast_to(eye[None, :], dirs.shape)
    o2, d2 = jax.jit(_bounce_geometry, static_argnums=())(
        data, hit, origin, dirs, eps)
    refl = _hit_reflectivity(data, hit)
    active = hit.hit_mask & (refl > 0.0)
    jax.block_until_ready((o2, d2, active))
    nact = int(jnp.sum(active))
    log("c5 active secondary rays", 0.0, n=nact, frac=round(nact / (W * H), 4))

    perm = jnp.argsort(~active, stable=True)
    ms, _ = timed(lambda: trace_clusters_rays(
        accel, o2[perm], d2[perm], tc, active=active[perm]), iters=3)
    log("c5 bounce trace_clusters_rays (compacted)", ms)

    ms, _ = timed(lambda: jnp.argsort(~active, stable=True), iters=5)
    log("c5 one argsort compaction", ms)


def main():
    which = set(sys.argv[1:]) or {"4", "5"}
    print("devices:", jax.devices(), flush=True)
    if "4" in which:
        profile4()
    if "5" in which:
        profile5()
    if "5p" in which:
        profile5p()


if __name__ == "__main__":
    main()
