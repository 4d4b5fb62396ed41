#!/usr/bin/env python
"""One truth for the headline number (r3 verdict Weak #1).

Asserts that every document quoting the bunny-512² headline agrees with
`BENCH_LATEST.json` (written by bench.py on every run) within tolerance:

  * README.md's "Benchmarks" section quotes "X M rays/s" — must match.
  * CONFIGS.json config 3 (the same frame via bench_configs) — must match
    within noise (re-measured, so a wider band).
  * MEASUREMENTS.md's headline line — must match.

Exit 0 when consistent; prints every mismatch and exits 1 otherwise.
Run after regenerating benches, and in CI-ish checks before shipping.
"""
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fail(msgs):
    for m in msgs:
        print("MISMATCH:", m)
    sys.exit(1)


def main():
    with open(os.path.join(ROOT, "BENCH_LATEST.json")) as f:
        truth = json.load(f)
    v = truth["value"]
    v_m = v / 1e6
    msgs = []

    readme = open(os.path.join(ROOT, "README.md")).read()
    m = re.search(r"\*\*([\d.]+)\s*M rays/s", readme)
    if not m:
        msgs.append("README.md: no '**X M rays/s' headline found")
    elif abs(float(m.group(1)) - v_m) / v_m > 0.05:
        msgs.append(f"README.md says {m.group(1)} M, bench says {v_m:.1f} M")

    try:
        with open(os.path.join(ROOT, "CONFIGS.json")) as f:
            configs = json.load(f)
        c3 = next(c for c in configs if c["config"].startswith("3 "))
        if abs(c3["value"] - v) / v > 0.15:  # re-measured: wider noise band
            msgs.append(f"CONFIGS.json config 3 = {c3['value']:.3g}, "
                        f"bench = {v:.3g}")
    except (FileNotFoundError, StopIteration, KeyError) as e:
        msgs.append(f"CONFIGS.json: {e!r}")

    meas = open(os.path.join(ROOT, "MEASUREMENTS.md")).read()
    m = re.search(r"headline[^\n]*?([\d.]+)\s*M rays/s", meas, re.I)
    if m and abs(float(m.group(1)) - v_m) / v_m > 0.05:
        msgs.append(f"MEASUREMENTS.md headline {m.group(1)} M, "
                    f"bench {v_m:.1f} M")

    if msgs:
        fail(msgs)
    print(f"numbers consistent: {v_m:.2f} M rays/s "
          f"({truth['vs_baseline']:.2f}x baseline)")


if __name__ == "__main__":
    main()
