"""Scripted kernel perf matrix for the post-training chip window.

Measures the fused-kernel pluck throughput across the optimization knobs
(grid-size bucketing, per-bucket batch-block scaling, chunk length) at the
two headline batch sizes, with the same patient min-of-reps methodology as
bench.py.  Prints one JSON line per point.

Usage: python tools/perf_probe.py [--reps 3] [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup_cache():
    import jax

    cache_dir = os.environ.get(
        "JAX_CACHE_DIR", os.path.expanduser("~/.jax_fdtd_cache")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def probe(B, chunk, bucket, bb_scale, reps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torch_fdtd_string_tpu.ops import fdm
    from torch_fdtd_string_tpu.ops.pallas_step import (
        string_chunked,
        string_chunked_bucketed,
    )

    os.environ["FDTD_NO_BUCKET"] = "0" if bucket else "1"
    os.environ["FDTD_BB_SCALE"] = "1" if bb_scale else "0"

    rng = np.random.default_rng(0)
    sr = 48000
    k = 1.0 / sr
    length = 1.0
    f0_min, f0_max = 98.0, 440.0
    kappa_max = 0.03
    theta = fdm.get_theta(kappa_max, f0_min, sr)
    T = (int(sr * length) - 2) // chunk * chunk
    f0c = rng.uniform(f0_min, f0_max, B).astype(np.float32)
    f0 = np.repeat(f0c[:, None], T, axis=1)
    kappa = rng.uniform(0.01, kappa_max, B).astype(np.float32)
    alpha = rng.uniform(1.0, 25.0, B).astype(np.float32)
    pos = rng.uniform(0.2, 0.8, B).astype(np.float32)
    t60 = np.stack(
        [np.stack([np.full(B, 100.0), rng.uniform(10, 25, B)], 1),
         np.stack([np.full(B, 2000.0), rng.uniform(10, 30, B)], 1)], 1
    ).astype(np.float32)
    var = fdm.get_derived_vars_np(f0_min, 0.0, k, theta, 1.0, 1.0)
    M_t, M_l = var[2] + 1, var[4] + 1
    x = np.linspace(0, 1, M_t, dtype=np.float32)
    u1 = np.empty((B, M_t), np.float32)
    for b in range(B):  # simple pluck-ish IC; converged-sweep realistic
        p_x = rng.uniform(0.2, 0.5)
        p_a = rng.uniform(0.001, 0.02)
        u1[b] = p_a * np.where(x < p_x, x / p_x, (1 - x) / (1 - p_x))
    z1 = np.zeros((B, M_l), np.float32)
    fn = string_chunked_bucketed if bucket else string_chunked
    args = [jnp.asarray(v) for v in (f0, kappa, alpha, pos, t60, u1, u1, z1, z1)]
    kw = dict(k=k, theta_t=float(theta), lambda_c=1.0, M_t=M_t, M_l=M_l,
              chunk=chunk, batch_block=64, surface_integral=True,
              gmres_rescue=False)

    def run():
        out = fn(*args, **kw)
        jax.block_until_ready((out[0], out[1]))
        return out

    t0 = time.perf_counter()
    run()
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    rate = B * T / sr / best
    return {
        "B": B, "chunk": chunk, "bucket": bucket, "bb_scale": bb_scale,
        "M": f"{M_t}/{M_l}", "wall_s": round(best, 3),
        "audio_s_per_s": round(rate, 2), "compile_s": round(compile_s, 1),
    }


def main():
    _setup_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    a = ap.parse_args()
    points = [
        # (B, chunk, bucket, bb_scale)
        (256, 512, False, False),   # round-2 configuration (control)
        (256, 512, True, False),
        (256, 512, True, True),
        (256, 1024, True, True),
        (16, 512, False, False),
        (64, 512, True, True),
    ]
    if a.quick:
        points = points[:3]
    for p in points:
        try:
            r = probe(*p, a.reps)
        except Exception as err:
            r = {"point": p, "error": str(err)[:200]}
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
