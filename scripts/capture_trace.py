#!/usr/bin/env python
"""Capture a machine-readable device profile of the bench frame.

The reference ships its Nsight kernel export (`/root/reference/aa.xml`);
this is the TPU analog: a `jax.profiler` trace of the product
FrameRenderer frame (bunny 512², primary+shadow), written to
``profiles/<ts>/`` as Perfetto/XPlane protos, plus a committed
``PROFILE_SUMMARY.json`` with the per-program device times extracted
from the trace so the kernel-level numbers live in the repo in a
greppable form (not just hand-transcribed into MEASUREMENTS.md).
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from raytracercuda_tpu import RenderConfig, Scene
    from raytracercuda_tpu.accel.clusters import build_clusters
    from raytracercuda_tpu.models.camera import camera_ray_grid
    from raytracercuda_tpu.models.loader import load_model
    from raytracercuda_tpu.trace.frame import FrameRenderer
    from raytracercuda_tpu.utils import content

    config = RenderConfig()
    scene = Scene.create(config)
    load_model(content.find("bunny.obj"), scene)
    data = scene.data()
    accel = build_clusters(data.positions, data.faces, config.cluster)
    lo = np.asarray(data.positions.min(axis=0))
    hi = np.asarray(data.positions.max(axis=0))
    eye = jnp.asarray((lo + hi) / 2 - np.array(
        [0, 0, 2.0 * float(np.max(hi - lo))]), jnp.float32)
    orient = jnp.eye(3)
    W = H = 512
    rays = camera_ray_grid(W, H)
    fr = FrameRenderer(data, accel, config, H, W)
    jax.block_until_ready(fr.render(eye, orient, rays))  # warm

    out_dir = os.path.join(ROOT, "profiles", time.strftime("%Y%m%d_%H%M%S"))
    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        for _ in range(5):
            out = fr.render(eye, orient, rays)
        jax.block_until_ready(out)

    # Extract per-event device durations from the Perfetto trace.
    summary = {}
    for path in glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                          recursive=True):
        with gzip.open(path, "rt") as f:
            trace = json.load(f)
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "?")
                s = summary.setdefault(name, {"count": 0, "total_us": 0.0})
                s["count"] += 1
                s["total_us"] += ev["dur"]
    top = sorted(summary.items(), key=lambda kv: -kv[1]["total_us"])[:40]
    rec = {
        "frame": "bunny 512x512 primary+shadow, FrameRenderer, 5 frames",
        "trace_dir": os.path.relpath(out_dir, ROOT),
        "events": [
            {"name": k, "count": v["count"],
             "total_us": round(v["total_us"], 1),
             "avg_us": round(v["total_us"] / v["count"], 1)}
            for k, v in top
        ],
    }
    with open(os.path.join(ROOT, "PROFILE_SUMMARY.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote PROFILE_SUMMARY.json;", len(summary), "event types,"
          " trace at", out_dir)


if __name__ == "__main__":
    main()
