"""Kernel perf A/B matrix over the optimization knobs, on the REAL bench
workload (bench.build_workload: sampled strings with realistic pluck ICs —
a synthetic-IC probe over-excites high-alpha draws into NaN early-exits and
makes grouping comparisons meaningless).

Prints one JSON line per point.  Run on an uncontended chip.

Usage: python tools/perf_probe.py [--reps 3] [--budget 420]
"""

import argparse

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--budget", type=float, default=420.0,
                    help="deadline per point, seconds")
    ap.add_argument("--points", default=None,
                    help="comma list i of POINTS to run, e.g. 0,2")
    a = ap.parse_args()

    POINTS = [
        # (label, B, env)
        ("plain_b256", 256, {"FDTD_NO_BUCKET": "1"}),
        ("bucket_b256", 256, {"FDTD_NO_BUCKET": "0", "FDTD_BB_SCALE": "0"}),
        ("bucket_bbscale_b256", 256,
         {"FDTD_NO_BUCKET": "0", "FDTD_BB_SCALE": "1"}),
        ("plain_b16", 16, {"FDTD_NO_BUCKET": "1"}),
        ("bucket_b64", 64, {"FDTD_NO_BUCKET": "0", "FDTD_BB_SCALE": "1"}),
    ]
    sel = (
        [POINTS[int(i)] for i in a.points.split(",")]
        if a.points else POINTS
    )
    import bench

    for label, B, env in sel:
        for k2, v2 in env.items():
            os.environ[k2] = v2
        # bench_sim caches nothing across calls except jax executables,
        # which is exactly what we want warm
        try:
            r = bench.bench_sim(B, 1.0, False, time.time() + a.budget,
                                reps=a.reps)
            r["label"] = label
            r.update(env)
        except Exception as err:
            r = {"label": label, "error": str(err)[:200]}
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
