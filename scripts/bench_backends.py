#!/usr/bin/env python
"""On-chip march benchmark for EVERY traversal backend — one table.

The aa.xml analog (`/root/reference/aa.xml` rows 5-28 time the one
production march kernel) done across all five backends: the same bunny
512x512 primary frame through cluster/Pallas (the product path), the
XLA dense sweep, the BVH skip-link walk, the tile-beam variant, the
wavefront expand/test/reduce rounds, and the spatial-hash DDA.

Prints one JSON line per backend and a markdown table for
MEASUREMENTS.md.  Run on the TPU (the default backend here); pass
backend names as argv to restrict.
"""
import json
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
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.loader import load_model
from raytracercuda_tpu.trace.pipeline import rotate_rays
from raytracercuda_tpu.utils import content

W = H = 512
ITERS = 10

scene = Scene.create(RenderConfig())
load_model(content.find("bunny.obj"), scene)
data = scene.data()
lo = np.asarray(data.positions.min(axis=0))
hi = np.asarray(data.positions.max(axis=0))
center, extent = (lo + hi) / 2, float(np.max(hi - lo))
eye = jnp.asarray(center - np.array([0, 0, 2.0 * extent]), jnp.float32)
orient = jnp.eye(3)
rays = camera_ray_grid(W, H)
dirs = jax.jit(rotate_rays)(rays, orient)
origin = jnp.broadcast_to(eye[None, :], dirs.shape)
jax.block_until_ready(dirs)

RESULTS = []


def rays_at(size):
    """(origin, dirs) for a size x size frame of the standard view."""
    if size == W:
        return origin, dirs
    d = jax.jit(rotate_rays)(camera_ray_grid(size, size), orient)
    return jnp.broadcast_to(eye[None, :], d.shape), d


def bench(name, build_fn, trace_fn, size=W, iters=ITERS):
    """One backend row.

    `first_call_ms` wall-clocks the first build INCLUDING trace/compile
    and constant upload (the user's cold-start experience);
    `steady_build_ms` re-times the build alone once caches are warm —
    the number comparable to aa.xml rows 3-4 (pure kernel time).
    """
    t0 = time.perf_counter()
    try:
        accel = build_fn()
        jax.block_until_ready(accel)
        first_call_ms = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        for _ in range(3):
            accel = build_fn()
            jax.block_until_ready(accel)
        steady_build_ms = (time.perf_counter() - t0) / 3 * 1e3
        fn = jax.jit(lambda: trace_fn(accel))
        hit = jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            hit = fn()
        jax.block_until_ready(hit)
        ms = (time.perf_counter() - t0) / iters * 1e3
        hit_frac = float(jnp.mean(hit.face >= 0))
        rec = {"backend": name,
               "first_call_ms": round(first_call_ms, 2),
               "steady_build_ms": round(steady_build_ms, 2),
               "march_ms": round(ms, 2),
               "mrays_s": round(size * size / ms / 1e3, 2),
               "hit_frac": round(hit_frac, 4)}
        if size != W:
            rec["frame"] = f"{size}x{size}"
    except Exception as e:
        rec = {"backend": name, "error": f"{type(e).__name__}: {e}"}
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)


def main():
    only = set(sys.argv[1:])

    def want(n):
        return not only or n in only

    config = RenderConfig()
    tc = config.trace

    if want("cluster-pallas"):
        from raytracercuda_tpu.accel.clusters import build_clusters
        from raytracercuda_tpu.trace.pallas_sweep import (segment_blocks,
                                                          trace_dense_pallas)

        def build():
            cs = build_clusters(data.positions, data.faces, config.cluster)
            blocks = cs.tri_blocks if cs.tri_blocks is not None else segment_blocks(cs)
            return (cs, blocks)

        bench("cluster-pallas", build,
              lambda a: trace_dense_pallas(a[0], a[1], eye, dirs, height=H,
                                           width=W, tile_px=tc.dense_tile_px,
                                           trace_cfg=tc))

    if want("cluster-xla"):
        from raytracercuda_tpu.accel.clusters import build_clusters
        from raytracercuda_tpu.trace.dense import trace_dense

        bench("cluster-xla",
              lambda: build_clusters(data.positions, data.faces,
                                     config.cluster),
              lambda cs: trace_dense(cs, eye, dirs, height=H, width=W,
                                     tile_px=tc.dense_tile_px,
                                     round_k=tc.dense_round_clusters,
                                     tiles_per_chunk=tc.dense_tiles_per_chunk,
                                     cluster_chunk=tc.dense_cluster_chunk,
                                     trace_cfg=tc))

    if want("bvh-skiplink"):
        from raytracercuda_tpu.accel.bvh import build_bvh
        from raytracercuda_tpu.trace.traverse import trace_bvh

        bench("bvh-skiplink",
              lambda: build_bvh(data.positions, data.faces, config.bvh),
              lambda bvh: trace_bvh(bvh, data.positions, data.faces, origin,
                                    dirs, config.bvh, tc))

    if want("bvh-beam"):
        from raytracercuda_tpu.accel.bvh import build_bvh
        from raytracercuda_tpu.trace.beam import trace_beam

        bench("bvh-beam",
              lambda: build_bvh(data.positions, data.faces, config.bvh),
              lambda bvh: trace_beam(bvh, eye, dirs, height=H, width=W,
                                     tile_px=tc.beam_tile, queue=tc.beam_queue,
                                     cfg=config.bvh, trace_cfg=tc,
                                     tiles_per_chunk=tc.beam_tiles_per_chunk))

    if want("wavefront"):
        from raytracercuda_tpu.accel.bvh import build_bvh
        from raytracercuda_tpu.trace.wavefront import trace_wavefront

        # 256^2 so the queue rounds fit comfortably; ray-chunked since the
        # 512^2 34 GB OOM.  Same BVH-walk class as skiplink/beam.
        wo, wd = rays_at(256)
        bench("wavefront",
              lambda: build_bvh(data.positions, data.faces, config.bvh),
              lambda bvh: trace_wavefront(bvh, data.positions, data.faces,
                                          wo, wd, config.bvh, tc),
              size=256, iters=2)

    if want("grid-dda"):
        import dataclasses

        from raytracercuda_tpu.accel.grid import build_grid
        from raytracercuda_tpu.trace.grid_march import trace_grid

        # The reference's CELL_RES=0.03 is tuned to ITS content scale
        # (`Hash.cu:8`); at the bunny's native units that packs the whole
        # mesh into a handful of cells and the DDA faults the device.
        # Scale the cell edge to ~1/48 of the scene extent instead.
        gcfg = dataclasses.replace(config.grid, cell_res=extent / 48.0)
        # 128^2 and one iteration: the DDA's serial per-cell gather chain
        # runs ~35 s/frame at this size and trips the device watchdog at
        # 512^2.  Demotion to the CPU/correctness tier is FINAL (README).
        go, gd = rays_at(128)
        bench("grid-dda",
              lambda: build_grid(data.positions, data.faces, gcfg),
              lambda g: trace_grid(g, data.positions, data.faces, go,
                                   gd, gcfg, tc),
              size=128, iters=1)

    if want("brute-pallas"):
        from raytracercuda_tpu.trace.pallas_brute import trace_brute_pallas

        bench("brute-pallas", lambda: (),
              lambda _: trace_brute_pallas(data.positions, data.faces,
                                           origin, dirs, tc))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BACKENDS.json")
    # Merge by backend name so a subset rerun (argv filter) updates its
    # rows without dropping the rest of the table.
    try:
        with open(path) as f:
            merged = {r["backend"]: r for r in json.load(f)}
    except Exception:
        merged = {}
    for r in RESULTS:
        merged[r["backend"]] = r
    with open(path, "w") as f:
        json.dump(list(merged.values()), f, indent=1)
    print("wrote", path)
    print("\n| backend | first call ms | steady build ms | march ms | Mrays/s | hit frac |")
    print("|---|---|---|---|---|---|")
    for r in RESULTS:
        if "error" in r:
            print(f"| {r['backend']} | — | — | — | — | {r['error'][:60]} |")
        else:
            print(f"| {r['backend']} | {r['first_call_ms']} | "
                  f"{r['steady_build_ms']} | {r['march_ms']} | "
                  f"{r['mrays_s']} | {r['hit_frac']} |")


if __name__ == "__main__":
    main()
