"""Simulation-length scaling sweep (reference sweep axis #2).

The reference's scaling figure sweeps batch AND simulation length
Nt ∈ {0.25, 0.5, 1, 2, 4} s @ 48 kHz (reference plot.py:828,860-861).
tools/batch_sweep.py covers the batch axis; this covers the length axis
at a fixed batch.  Throughput should be ~flat in length (per-step cost is
length-invariant; longer runs amortize dispatch), with B=16-class rates.

Usage: python tools/length_sweep.py [--B 64] [--lengths 0.25,0.5,1,2,4]
Writes one JSON line per point (same schema as batch_sweep).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--budget", type=float, default=420.0,
                    help="deadline per point, seconds")
    ap.add_argument("--lengths", default="0.25,0.5,1,2,4")
    a = ap.parse_args()

    import bench

    rows = []
    for L in [float(x) for x in a.lengths.split(",")]:
        try:
            r = bench.bench_sim(a.B, L, False, time.time() + a.budget,
                                reps=a.reps)
            r["B"] = a.B
            r["length_s"] = L
        except Exception as err:
            r = {"B": a.B, "length_s": L, "error": str(err)[:200]}
        rows.append(r)
        print(json.dumps(r), flush=True)

    ok = [r for r in rows if "error" not in r]
    if len(ok) >= 2:
        rates = [r["audio_s_per_s"] for r in ok]
        print(json.dumps({
            "throughput_spread": round(max(rates) / max(min(rates), 1e-9), 3),
            "rates": rates,
        }), flush=True)


if __name__ == "__main__":
    main()
