"""Scaling benchmark sweep (reference ``plot.time_experiment`` machinery,
plot.py:821-923): relative wall time vs batch size, simulation length, and
spatial grid size, measured on the current backend.

Usage:
    python -m torch_fdtd_string_tpu.tasks.time_experiment [out_dir]

Writes ``time_experiment.json`` and ``time_experiment.pdf`` with curves for
the fused Pallas kernel and the XLA engine.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _workload(B, length, f0_min, seed=7):
    import bench

    return bench.build_workload(B=B, length=length, seed=seed)


def _time_engine(args_tuple, reps=2):
    import jax

    from ..core.engine import simulate_chunk

    carry, steps, sp, bp, hp, bm, hm, consts = args_tuple
    jax.block_until_ready(
        simulate_chunk(carry, steps, sp, bp, hp, bm, hm, consts)
    )
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(
            simulate_chunk(carry, steps, sp, bp, hp, bm, hm, consts)
        )
        best = min(best, time.perf_counter() - t0)
    return best


def _time_pallas(args_tuple, reps=2):
    import jax

    from ..ops.pallas_step import pluck_chunked

    carry, steps, sp, bp, hp, bm, hm, consts = args_tuple
    T = (sp.f0.shape[1] - 2) // 512 * 512

    def run():
        return pluck_chunked(
            sp.f0[:, 2 : 2 + T], sp.kappa, sp.alpha, sp.pos, sp.T60,
            carry.u1, carry.u2, carry.z1, carry.z2,
            k=consts.k, theta_t=consts.theta_t, lambda_c=consts.lambda_c,
            M_t=consts.M_t, M_l=consts.M_l, chunk=512,
            surface_integral=consts.surface_integral,
        )

    jax.block_until_ready(run())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    return best


def run_sweep(out_dir=".", batches=(4, 16, 64, 256), lengths=(0.25, 0.5, 1.0),
              with_engine=True):
    """Sweep axes follow the reference figure (plot.py:826-838)."""
    import jax

    on_accel = any(d.platform != "cpu" for d in jax.devices())
    results = {"backend": jax.devices()[0].platform, "batch": {}, "length": {}}

    def _try(fn, wl, label):
        try:
            return fn(wl)
        except Exception as err:
            print(f"[time_experiment] {label} failed: {str(err)[:120]}", flush=True)
            return None

    curves_b = {"pallas": [], "engine": []}
    for B in batches:
        wl = _workload(B, 1.0, 98.0)[0]
        if on_accel:
            t = _try(_time_pallas, wl, f"pallas b{B}")
            if t:
                curves_b["pallas"].append((B, t))
        if with_engine and B <= 16:
            wl_s = _workload(B, 0.25, 98.0)[0]
            t = _try(_time_engine, wl_s, f"engine b{B}")
            if t:
                curves_b["engine"].append((B, 4 * t))  # scaled to 1 s
        print(f"[time_experiment] batch={B} done", flush=True)
    results["batch"] = curves_b

    curves_l = {"pallas": [], "engine": []}
    for L in lengths:
        wl = _workload(16, L, 98.0)[0]
        if on_accel:
            t = _try(_time_pallas, wl, f"pallas l{L}")
            if t:
                curves_l["pallas"].append((L, t))
        if with_engine and L <= 0.25:
            t = _try(_time_engine, wl, f"engine l{L}")
            if t:
                curves_l["engine"].append((L, t))
        print(f"[time_experiment] length={L} done", flush=True)
    results["length"] = curves_l

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "time_experiment.json"), "w") as f:
        json.dump(results, f, indent=1)

    from ..utils.plot import time_scaling_figure

    fig_data = {
        "batch size": {k: v for k, v in curves_b.items() if v},
        "length (s)": {k: v for k, v in curves_l.items() if v},
    }
    time_scaling_figure(os.path.join(out_dir, "time_experiment.pdf"), fig_data)
    return results


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "results/time_experiment"
    run_sweep(out)
