#!/usr/bin/env python
"""Rigorous timing of the Pallas all-pairs MT sweep: varied inputs per
iteration (defeats any caching), size scaling, and an effective-rate
readout to calibrate the kernel-design constants."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from raytracercuda_tpu.trace.pallas_brute import trace_brute_pallas

rng = np.random.default_rng(0)


def scene(num_faces):
    base = rng.uniform(-1, 1, (num_faces, 3)).astype(np.float32)
    offs = rng.normal(scale=0.1, size=(num_faces, 2, 3)).astype(np.float32)
    verts = np.concatenate([base[:, None], base[:, None] + offs], axis=1).reshape(-1, 3)
    faces = np.arange(num_faces * 3, dtype=np.int32).reshape(-1, 3)
    faces = np.concatenate([faces, np.zeros((num_faces, 1), np.int32)], axis=1)
    return jnp.asarray(verts), jnp.asarray(faces)


def rays(n, salt):
    o = jnp.asarray(np.array([0, 0, -4.0], np.float32)
                    + 0.01 * np.array([salt % 7, salt % 5, 0], np.float32))
    o = jnp.broadcast_to(o, (n, 3))
    tgt = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    return o, jnp.asarray(tgt) - o


for R, F in ((16384, 15872), (16384, 63488), (65536, 63488)):
    positions, faces = scene(F)
    bundles = [rays(R, s) for s in range(4)]
    out = trace_brute_pallas(positions, faces, *bundles[0])
    jax.block_until_ready(out)
    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        out = trace_brute_pallas(positions, faces, *bundles[i % 4])
        jax.block_until_ready(out)  # block EVERY iteration
    dt = (time.perf_counter() - t0) / iters
    tests = R * F
    print(f"R={R} F={F}: {dt*1e3:8.2f} ms  "
          f"{tests/dt/1e9:9.1f} Gtests/s  "
          f"(~{tests*60/dt/1e12:6.1f} TFLOP/s-equiv)", flush=True)
    # sanity: some hits found
    print("   hit frac:", float((np.asarray(out.face) >= 0).mean()), flush=True)
