"""Unit tests for the vectorized device-math layer against independent
scalar references, including the reference app's box/ray micro-tests
(`TestProgram/Program.cpp:81-92`)."""

import numpy as np
import jax.numpy as jnp

from raytracercuda_tpu.ops import math as m
from raytracercuda_tpu.types import FLT_MAX

FLT_MAX_NP = np.float32(3.4028235e38)


# --- independent scalar references (numpy, written from the algorithms) ---

def ref_tri_intersect(orig, d, v0, v1, v2):
    v0v1, v0v2 = v1 - v0, v2 - v0
    pvec = np.cross(d, v0v2)
    det = np.dot(v0v1, pvec)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        tvec = orig - v0
        u = np.dot(tvec, pvec) * inv
        qvec = np.cross(tvec, v0v1)
        v = np.dot(d, qvec) * inv
        t = np.dot(v0v2, qvec) * inv
    if not (0 <= u <= 1) or v < 0 or u + v > 1 or np.isnan(u) or np.isnan(v):
        return FLT_MAX_NP, u, v
    return t, u, v


def ref_box_intersect(bmin, bmax, orig, inv_dir):
    tmin = (bmin - orig) * inv_dir
    tmax = (bmax - orig) * inv_dir
    tfar = np.min(np.maximum(tmin, tmax))
    if tfar < 0:
        return FLT_MAX_NP
    tnear = np.max(np.minimum(tmin, tmax))
    if tfar < tnear:
        return FLT_MAX_NP
    return max(0.0, tnear)


def test_tri_intersect_head_on():
    v0, v1, v2 = (np.array(v, np.float32) for v in
                  ([-1, -1, 5], [1, -1, 5], [0, 1, 5]))
    t, u, v = m.tri_intersect(
        jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]), v0, v1, v2
    )
    assert np.isclose(float(t), 5.0)
    # Barycentric point recovery: hit point = (1-u-v)*v0 + u*v1 + v*v2.
    p = (1 - u - v) * v0 + u * v1 + v * v2
    assert np.allclose(np.asarray(p), [0, 0, 5], atol=1e-5)


def test_tri_intersect_miss_and_parallel():
    v0, v1, v2 = (jnp.array(v, jnp.float32) for v in
                  ([-1, -1, 5], [1, -1, 5], [0, 1, 5]))
    t, _, _ = m.tri_intersect(
        jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]), v0, v1, v2
    )  # parallel to the triangle plane
    assert float(t) == float(FLT_MAX)
    t, _, _ = m.tri_intersect(
        jnp.array([10.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]), v0, v1, v2
    )  # offset to the side
    assert float(t) == float(FLT_MAX)


def test_tri_intersect_random_vs_scalar():
    rng = np.random.default_rng(0)
    n = 200
    tri = rng.normal(size=(n, 3, 3)).astype(np.float32)
    orig = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    t, u, v = m.tri_intersect(jnp.array(orig), jnp.array(d),
                              jnp.array(tri[:, 0]), jnp.array(tri[:, 1]),
                              jnp.array(tri[:, 2]))
    t, u, v = np.asarray(t), np.asarray(u), np.asarray(v)
    for i in range(n):
        rt, ru, rv = ref_tri_intersect(orig[i], d[i], *tri[i])
        if rt == FLT_MAX_NP:
            assert t[i] == FLT_MAX_NP
        else:
            assert np.isclose(t[i], rt, rtol=1e-4, atol=1e-5)
            assert np.isclose(u[i], ru, rtol=1e-4, atol=1e-5)
            assert np.isclose(v[i], rv, rtol=1e-4, atol=1e-5)


def test_box_ray_program_cpp_micro():
    # The reference's constructor micro-test (`Program.cpp:81-92`):
    # eye (0,0,-2.3), dir normalize(-1,-1,-1), box (0,0,-3)..(1,1,-2).
    eye = np.array([0, 0, -2.3], np.float32)
    d = np.array([-1, -1, -1], np.float32)
    d = d / np.linalg.norm(d)
    inv = 1.0 / d
    bmin = np.array([0, 0, -3], np.float32)
    bmax = np.array([1, 1, -2], np.float32)
    got = float(m.box_ray_intersect(jnp.array(bmin), jnp.array(bmax),
                                    jnp.array(eye), jnp.array(inv)))
    assert got == ref_box_intersect(bmin, bmax, eye, inv)
    # NoZero variant must return a finite distance (exit) for this setup.
    got_nz = float(m.box_ray_intersect_no_zero(
        jnp.array(bmin), jnp.array(bmax), jnp.array(eye), jnp.array(inv)))
    assert np.isfinite(got_nz)


def test_box_ray_inside_origin_clamps_to_zero():
    bmin = jnp.array([-1.0, -1.0, -1.0])
    bmax = jnp.array([1.0, 1.0, 1.0])
    inv = 1.0 / jnp.array([1.0, 1e-9, 1e-9])
    assert float(m.box_ray_intersect(bmin, bmax, jnp.zeros(3), inv)) == 0.0
    # NoZero returns the exit distance instead (used to step through cells).
    nz = float(m.box_ray_intersect_no_zero(bmin, bmax, jnp.zeros(3), inv))
    assert np.isclose(nz, 1.0)


def test_box_ray_random_vs_scalar():
    rng = np.random.default_rng(1)
    n = 200
    a = rng.normal(size=(n, 3)).astype(np.float32)
    b = rng.normal(size=(n, 3)).astype(np.float32)
    bmin, bmax = np.minimum(a, b), np.maximum(a, b)
    orig = (rng.normal(size=(n, 3)) * 2).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    inv = np.float32(1.0) / d
    got = np.asarray(m.box_ray_intersect(jnp.array(bmin), jnp.array(bmax),
                                         jnp.array(orig), jnp.array(inv)))
    for i in range(n):
        want = ref_box_intersect(bmin[i], bmax[i], orig[i], inv[i])
        assert np.isclose(got[i], want, rtol=1e-5) or (got[i] == want)


def test_pack_rgb_matches_cuda_truncation():
    # CUDA path truncates (u32 cast), `CudaComon.cuh:92-96`.
    assert int(m.pack_rgb(1.0, 0.0, 0.0)) == 255 << 16
    assert int(m.pack_rgb(0.5, 0.25, 1.0)) == (127 << 16) | (63 << 8) | 255
    assert int(m.pack_rgb(-1.0, 2.0, 0.0)) == 255 << 8  # clamped
    assert int(m.pack_gray(0.5)) == (127 << 16) | (127 << 8) | 127


def test_unpack_roundtrip():
    vals = jnp.array([0x00FF8040, 0x00000000, 0x00FFFFFF], jnp.uint32)
    rgb = m.unpack_rgb(vals)
    repacked = m.pack_rgb_vec(rgb)
    assert np.array_equal(np.asarray(repacked), np.asarray(vals))


def test_aabb_overlap():
    amin, amax = jnp.array([0.0, 0, 0]), jnp.array([1.0, 1, 1])
    assert bool(m.aabb_overlap(amin, amax, jnp.array([0.5, 0.5, 0.5]),
                               jnp.array([2.0, 2, 2])))
    assert not bool(m.aabb_overlap(amin, amax, jnp.array([1.5, 0.0, 0.0]),
                                   jnp.array([2.0, 1, 1])))
    # Touching boundaries count as overlap (reference uses strict >/<).
    assert bool(m.aabb_overlap(amin, amax, jnp.array([1.0, 0.0, 0.0]),
                               jnp.array([2.0, 1, 1])))
