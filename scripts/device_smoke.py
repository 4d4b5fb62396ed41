#!/usr/bin/env python
"""Standalone device smoke test — the `TestProgram/main2.cpp` analog.

The reference's sanity binary prints CUDA device properties, runs a trivial
kernel, and verifies an H2D/D2H round trip (`main2.cpp:30-82`).  Same
three probes, TPU-native: device table, a Pallas full-frame kernel, and a
host->device->host copy compare.

Exits 0 on success, 1 with a message on failure.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    # 1. Device properties (cudaGetDeviceProperties analog).
    devs = jax.devices()
    print(f"backend={jax.default_backend()} devices={len(devs)}")
    for d in devs:
        kind = getattr(d, "device_kind", "?")
        print(f"  [{d.id}] {d.platform}:{kind} process={d.process_index}")

    # 2. H2D/D2H round trip (the memcpy check, `main2.cpp:52-61`).
    rng = np.random.default_rng(0)
    host = rng.standard_normal((256, 128)).astype(np.float32)
    dev = jnp.asarray(host)
    back = np.asarray(dev)
    if not np.array_equal(host, back):
        print("FAIL: H2D/D2H round trip mismatch")
        return 1
    print("roundtrip: OK (256x128 f32 bit-exact)")

    # 3. Trivial kernel (the `start_kernel` array-add analog) — use the
    #    framework's Pallas clear kernel plus an arithmetic check.
    from raytracercuda_tpu.ops.clear import clear_buffer

    buf = clear_buffer(64 * 64, value=0x00123456)
    got = np.asarray(buf)
    if not (got == 0x00123456).all():
        print("FAIL: clear kernel wrote wrong value")
        return 1
    a = jnp.arange(1024, dtype=jnp.float32)
    s = float(jnp.sum(a * 2.0))
    if s != 2.0 * 1023 * 1024 / 2:
        print(f"FAIL: kernel arithmetic {s}")
        return 1
    print("kernel: OK (Pallas clear + VPU arithmetic)")
    print("device smoke: ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
