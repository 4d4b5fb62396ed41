#!/usr/bin/env python
"""Speed-of-light audit of the two product kernels (VERDICT r4 item 4).

For the headline frame (bunny 512x512 primary+shadow through the fused
Pallas kernels) this computes, from the REAL survivor lists of the real
scene:

  * bytes moved per kernel launch: triangle-block DMAs (the dominant
    stream; one [G,128] f32 block per surviving cluster per tile),
    direction/origin inputs, planar outputs;
  * MT tests executed: survivors x G x R per tile;

then divides by TPU v5e peak HBM bandwidth (819 GB/s) and by two compute
ceilings: the VPU's theoretical f32 peak (~7.4 TFLOP/s: 8 sublanes x 128
lanes x 4 ALUs x 2 (FMA) x ~0.9 GHz) and this repo's own measured
all-pairs sweep ceiling (28 Gtest/s ~ 1.7 TFLOP/s-equivalent,
MEASUREMENTS.md r2 "the planning constant").  The larger of the two
lower bounds (bytes-bound, flops-bound) is the speed-of-light for the
kernel; achieved% = bound / measured.

FLOPs per MT test: 52 (pallas_sweep._mt_cols: 3 crosses=27, 3 dots=15,
1 div, 3 subs, ~6 compare/selects).  The trace kernel's fused
interpolation epilogue adds ~45 flop/test (winner one-hot picks over 10
attribute planes); the occlusion kernel adds ~6 (mask carry).

Writes ROOFLINE.json and prints the table for MEASUREMENTS.md.
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
from raytracercuda_tpu.accel.clusters import build_clusters
from raytracercuda_tpu.models.camera import camera_ray_grid
from raytracercuda_tpu.models.loader import load_model
from raytracercuda_tpu.trace.pipeline import rotate_rays
from raytracercuda_tpu.utils import content

HBM_GBS = 819.0          # TPU v5e peak HBM bandwidth
VPU_TFLOPS = 7.4         # theoretical VPU f32 peak (see module docstring)
MEASURED_TEST_CEIL = 28e9  # Gtest/s ceiling from the all-pairs kernel

W = H = 512
FLOP_MT = 52
FLOP_TRACE_EPI = 45
FLOP_OCC_EPI = 6


def main():
    from raytracercuda_tpu.trace.pallas_sweep import (
        _cull_frustum, _tile_lists, beam_survive_matrix,
        occlusion_tiles_planar, tile_planes_planar, trace_shade_tiles_planar,
        shade_segment_blocks)
    from raytracercuda_tpu.trace.occlusion_cull import swept_tile_beams_planar
    from raytracercuda_tpu.trace.dense import tile_pixels_planar

    config = RenderConfig(accel=AccelKind.CLUSTER)
    tc = config.trace
    tp = tc.dense_tile_px
    scene = Scene.create(config)
    load_model(content.find("bunny.obj"), scene)
    data = scene.data()
    cs = build_clusters(data.positions, data.faces, config.cluster)
    blocks, has_uv = shade_segment_blocks(cs, data)
    jax.block_until_ready(blocks)

    lo = np.asarray(data.positions.min(axis=0))
    hi = np.asarray(data.positions.max(axis=0))
    extent = float(np.max(hi - lo))
    eye = jnp.asarray((lo + hi) / 2 - np.array([0, 0, 2.0 * extent]),
                      jnp.float32)
    light = jnp.asarray([0.4, 0.8, -0.45], jnp.float32)
    light = light / jnp.linalg.norm(light)
    dirs = jax.jit(rotate_rays)(camera_ray_grid(W, H), jnp.eye(3))
    d3 = jax.jit(lambda d: tile_pixels_planar(d.T, H, W, tp))(dirs)
    jax.block_until_ready(d3)

    G = cs.cluster_size
    R = tp * tp
    T = d3.shape[0]

    # --- measured kernel times (isolated, steady-state) ---------------
    def timed(fn, iters=20):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3, out

    trace_fn = jax.jit(lambda: trace_shade_tiles_planar(
        cs, blocks, has_uv, eye, d3, tile_px=tp, trace_cfg=tc))
    trace_ms, outs = timed(trace_fn)

    # Shadow stage on the primary hits (same construction as the frame).
    t0_ = outs[0].reshape(-1)
    nx, ny, nz = (o.reshape(-1) for o in outs[4:7])
    dx = d3[:, 0, :].reshape(-1)
    dy = d3[:, 1, :].reshape(-1)
    dz = d3[:, 2, :].reshape(-1)
    nl = jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
    ncos = (nx * dx + ny * dy + nz * dz) / nl
    ndl = (nx * light[0] + ny * light[1] + nz * light[2]) / nl
    ndl = jnp.where(ncos > 0, -ndl, ndl)
    hitm = t0_ < 3e38
    sactive = hitm & (ndl > 0.0)
    eps = jnp.float32(tc.t_epsilon) * extent
    tmin = jnp.minimum(t0_, 1e6)
    sox = jnp.where(sactive, eye[0] + dx * tmin, eye[0]) + light[0] * eps
    soy = jnp.where(sactive, eye[1] + dy * tmin, eye[1]) + light[1] * eps
    soz = jnp.where(sactive, eye[2] + dz * tmin, eye[2]) + light[2] * eps
    o3 = jnp.stack([sox.reshape(T, R), soy.reshape(T, R),
                    soz.reshape(T, R)], axis=1)
    sa = sactive.reshape(T, R)
    jax.block_until_ready((o3, sa))
    occ_fn = jax.jit(lambda: occlusion_tiles_planar(
        cs, blocks, o3, light, sa, tile_px=tp, trace_cfg=tc))
    occ_ms, _ = timed(occ_fn)

    # --- survivor counts (the real DMA/test volume) --------------------
    planes = tile_planes_planar(d3, tp)
    survive_t = _cull_frustum(planes, eye, cs.cmin, cs.cmax)
    _, counts_t = _tile_lists(survive_t, cs.num_clusters, tc.sweep_list_width)
    n_t = int(jnp.sum(counts_t))
    beam = swept_tile_beams_planar(o3, sa, light)
    survive_o = beam_survive_matrix(beam, cs.cmin, cs.cmax)
    _, counts_o = _tile_lists(survive_o, cs.num_clusters, tc.sweep_list_width)
    n_o = int(jnp.sum(counts_o))

    recs = []
    for name, n_sur, ms, epi, n_out in (
            ("trace+shade", n_t, trace_ms, FLOP_TRACE_EPI, 10),
            ("shadow any-hit", n_o, occ_ms, FLOP_OCC_EPI, 1)):
        dma_b = n_sur * G * 128 * 4                # triangle blocks
        io_b = T * 3 * R * 4 + T * R * n_out * 4   # dirs/origins + outputs
        bytes_total = dma_b + io_b
        tests = n_sur * G * R
        flops = tests * (FLOP_MT + epi)
        t_bytes = bytes_total / (HBM_GBS * 1e9) * 1e3
        t_vpu = flops / (VPU_TFLOPS * 1e12) * 1e3
        t_meas_ceil = tests / MEASURED_TEST_CEIL * 1e3
        bound = max(t_bytes, t_vpu)
        rec = {
            "kernel": name,
            "survivor_blocks": n_sur,
            "mt_tests_G": round(tests / 1e9, 3),
            "dma_GB": round(dma_b / 1e9, 4),
            "bytes_GB": round(bytes_total / 1e9, 4),
            "measured_ms": round(ms, 3),
            "bound_bytes_ms": round(t_bytes, 3),
            "bound_vpu_ms": round(t_vpu, 3),
            "bound_measured_ceiling_ms": round(t_meas_ceil, 3),
            "roofline_pct_theoretical": round(100 * bound / ms, 1),
            "roofline_pct_vs_measured_ceiling": round(
                100 * max(t_bytes, t_meas_ceil) / ms, 1),
        }
        recs.append(rec)
        print(json.dumps(rec), flush=True)

    out = {
        "frame": f"bunny {W}x{H} primary+shadow, fused Pallas kernels, "
                 f"tile_px={tp}, G={G}",
        "peaks": {"hbm_GBs": HBM_GBS, "vpu_tflops_f32": VPU_TFLOPS,
                  "measured_test_ceiling_Gtests": MEASURED_TEST_CEIL / 1e9},
        "flop_model": {"mt": FLOP_MT, "trace_epilogue": FLOP_TRACE_EPI,
                       "occlusion_epilogue": FLOP_OCC_EPI},
        "kernels": recs,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "ROOFLINE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote ROOFLINE.json")


if __name__ == "__main__":
    main()
