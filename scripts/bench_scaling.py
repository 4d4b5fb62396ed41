#!/usr/bin/env python
"""Scaling-efficiency harness: rays/s vs device count on a virtual CPU mesh.

BASELINE.json demands ">=70% rays/s scaling efficiency 1 chip -> N hosts".
Real multi-chip hardware is not available in this environment, so this
harness measures what CAN be measured honestly:

  * Strong-scaling wall time of the sharded pixel-band render at mesh sizes
    1/2/4/8 on the virtual CPU mesh (`--xla_force_host_platform_device_count`).
  * ``sharding_efficiency`` = T_1 / T_n — the n-device run does the SAME
    total work on the SAME physical cores, so any drop below 1.0 is pure
    sharding overhead (shard_map partitioning, collectives, padding).  This
    is the quantity that transfers to real chips, where per-chip compute
    parallelizes by construction and the forward pass has no collectives.
  * ``linear_efficiency`` = T_1 / (n * T_n) — reported for completeness;
    on a 2-core host it is bounded by cores/n, NOT by the framework.

Writes one JSON line (and SCALING.json) with per-n results.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from raytracercuda_tpu import AccelKind, RenderConfig, Scene  # noqa: E402
from raytracercuda_tpu.accel.clusters import build_clusters  # noqa: E402
from raytracercuda_tpu.models.camera import camera_ray_grid  # noqa: E402
from raytracercuda_tpu.models.procedural import icosphere_mesh  # noqa: E402
from raytracercuda_tpu.parallel.mesh import make_ray_mesh  # noqa: E402
from raytracercuda_tpu.parallel.shard import render_sharded  # noqa: E402

SIDE = int(os.environ.get("SCALING_SIDE", 256))
ITERS = int(os.environ.get("SCALING_ITERS", 3))


def main():
    assert len(jax.devices()) >= 8, jax.devices()
    config = RenderConfig(accel=AccelKind.CLUSTER)
    scene = Scene.create(config)
    scene.add_mesh(icosphere_mesh(subdivisions=4, center=(0.0, 0.0, 3.0)))
    data = scene.data()
    accel = build_clusters(data.positions, data.faces, config.cluster)
    rays = camera_ray_grid(SIDE, SIDE)
    eye = jnp.zeros(3)
    orient = jnp.eye(3)

    results = []
    t1 = None
    for n in (1, 2, 4, 8):
        mesh = make_ray_mesh(n)
        out = render_sharded(data, accel, rays, eye, orient, config, mesh,
                             with_shadows=True, frame_hw=(SIDE, SIDE))
        out.block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = render_sharded(data, accel, rays, eye, orient, config, mesh,
                                 with_shadows=True, frame_hw=(SIDE, SIDE))
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS
        if n == 1:
            t1 = dt
        results.append({
            "devices": n,
            "ms": round(dt * 1e3, 2),
            "rays_per_sec": round(SIDE * SIDE / dt, 1),
            "sharding_efficiency": round(t1 / dt, 4),
            "linear_efficiency": round(t1 / (n * dt), 4),
        })
        print(f"n={n}: {dt*1e3:8.2f} ms  sharding_eff={t1/dt:.3f}")

    summary = {
        "metric": f"sharding efficiency 1->8 CPU devices (icosphere {SIDE}x{SIDE})",
        "value": results[-1]["sharding_efficiency"],
        "unit": "T1/T8",
        "per_device": results,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in ("metric", "value", "unit")}))


if __name__ == "__main__":
    main()
