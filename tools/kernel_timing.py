"""A/B timing + equivalence probe for fused-kernel scheduling variants.

Times the production workload (bench.build_workload) under the adaptive
Gauss-Seidel exit vs static unrolled sweeps (``coupling_fixed``), at small
and large batch, and reports the max deviation of the audio readout between
variants so a faster schedule can be promoted to the simulate task only
with evidence.

Usage: python tools/kernel_timing.py [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(os.environ.get("JAX_CACHE_DIR", "~/.jax_fdtd_cache")),
    )
    import bench
    from torch_fdtd_string_tpu.ops.pallas_step import string_chunked

    results = {}
    for B, length in ((16, 1.0), (256, 1.0)):
        args, B_, length_, _ = bench.build_workload(B=B, length=length)
        carry, steps, sp, bp, hp, bm, hm, consts = args

        def run(chunk=512, **kw):
            T = (sp.f0.shape[1] - 2) // chunk * chunk
            return T, string_chunked(
                sp.f0[:, 2 : 2 + T], sp.kappa, sp.alpha, sp.pos, sp.T60,
                carry.u1, carry.u2, carry.z1, carry.z2,
                k=consts.k, theta_t=consts.theta_t, lambda_c=consts.lambda_c,
                M_t=consts.M_t, M_l=consts.M_l, chunk=chunk,
                coupling_iters=24,
                surface_integral=consts.surface_integral, **kw,
            )

        variants = {
            "adaptive": {},
            "fixed1": {"coupling_fixed": 1},
            "fixed2": {"coupling_fixed": 2},
            "fixed2_c2048": {"coupling_fixed": 2, "chunk": 2048},
        }
        outs = {}
        for name, kw in variants.items():
            walls = []
            T, out = run(**kw)
            jax.block_until_ready(out)  # compile
            outs[name] = np.asarray(out[0])
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(run(**kw)[1])
                walls.append(time.perf_counter() - t0)
            wall = float(np.median(walls))
            results[f"b{B}_{name}"] = {
                "wall_s": round(wall, 4),
                "audio_s_per_s": round(B * T / 48000.0 / wall, 2),
            }
            print(f"B={B} {name}: {results[f'b{B}_{name}']}", flush=True)
        fin = np.isfinite(outs["adaptive"]).all(axis=1)
        scale = np.abs(outs["adaptive"][fin]).max() + 1e-12
        for name in ("fixed1", "fixed2"):
            n = min(outs[name].shape[-1], outs["adaptive"].shape[-1])
            dev = np.abs(
                outs[name][fin][..., :n] - outs["adaptive"][fin][..., :n]
            ).max() / scale
            results[f"b{B}_{name}"]["max_rel_dev_vs_adaptive"] = float(dev)
            print(f"B={B} {name} max rel dev vs adaptive: {dev:.3e}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
