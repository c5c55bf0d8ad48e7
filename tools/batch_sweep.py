"""Batch-size monotonicity sweep on the production dispatcher.

VERDICT r3 weak #3: round 3's B=64 bucketed ran 3+ sequential BB=16
blocks and landed SLOWER than B=16 (11.8 vs 41 audio-s/s).  The fix
(ops/pallas_step.py::string_chunked_bucketed group-block sizing) picks
the ladder quantum that minimizes the BLOCK COUNT rather than the clone
padding.  This sweep is the acceptance evidence: throughput must be
monotone (non-decreasing within noise) over B in {16, 32, 64, 128, 256}
on the default randomized-pluck workload (bench.build_workload draws —
the same ones bench.py measures).

Prints one JSON line per point.  Run on an uncontended chip:

    python tools/batch_sweep.py [--reps 3] [--budget 240]
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
    ap.add_argument("--budget", type=float, default=240.0,
                    help="deadline per point, seconds")
    ap.add_argument("--batches", default="16,32,64,128,256")
    a = ap.parse_args()

    import bench

    rows = []
    for B in [int(b) for b in a.batches.split(",")]:
        try:
            r = bench.bench_sim(B, 1.0, False, time.time() + a.budget,
                                reps=a.reps)
            r["B"] = B
        except Exception as err:
            r = {"B": B, "error": str(err)[:200]}
        rows.append(r)
        print(json.dumps(r), flush=True)

    ok = all("error" not in r for r in rows)
    if ok:
        rates = [r["audio_s_per_s"] for r in rows]
        # non-decreasing within 10% noise between adjacent points
        mono = all(b >= 0.9 * a2 for a2, b in zip(rates, rates[1:]))
        print(json.dumps({"monotone_within_10pct": mono, "rates": rates}),
              flush=True)


if __name__ == "__main__":
    main()
