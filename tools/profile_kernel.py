"""Capture a hardware xprof trace of the production fused kernel.

Runs the bench B=256 pluck workload (bucketed executor, first-pass
configuration) under ``jax.profiler`` and converts the xplane with the
xprof/tensorboard-plugin-profile tooling to an op-level self-time table —
the measured counterpart of the analytic op model in ``tools/roofline.py``
(README "Roofline" section).

Usage: python tools/profile_kernel.py [B] [outdir]
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xprof_r3"
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(os.environ.get("JAX_CACHE_DIR", "~/.jax_fdtd_cache")),
    )
    import bench
    from torch_fdtd_string_tpu.ops.pallas_step import string_chunked_bucketed

    args, _, _, _ = bench.build_workload(B=B, length=1.0)
    carry, steps, sp, bp, hp, bm, hm, consts = args
    T = (sp.f0.shape[1] - 2) // 512 * 512

    def run():
        return string_chunked_bucketed(
            sp.f0[:, 2 : 2 + T], sp.kappa, sp.alpha, sp.pos, sp.T60,
            carry.u1, carry.u2, carry.z1, carry.z2,
            k=consts.k, theta_t=consts.theta_t, lambda_c=consts.lambda_c,
            M_t=consts.M_t, M_l=consts.M_l, chunk=512, coupling_iters=24,
            surface_integral=consts.surface_integral, gmres_rescue=False,
        )

    jax.block_until_ready(run())  # compile outside the trace
    jax.profiler.start_trace(outdir)
    for _ in range(3):
        jax.block_until_ready(run())
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True))
    print("xplane:", paths)
    if not paths:
        return
    from xprof.convert import raw_to_tool_data as rtd

    names = rtd.xspace_to_tool_names(paths)
    print("tools:", names)
    for tool in ("framework_op_stats", "op_profile", "overview_page"):
        cand = [t for t in names if t.rstrip("^@") == tool]
        if not cand:
            continue
        try:
            data, _ = rtd.xspace_to_tool_data(paths, cand[0], {})
        except Exception as err:
            print(f"[{tool}] failed: {err}")
            continue
        if isinstance(data, bytes):
            data = data.decode("utf-8", "replace")
        dst = os.path.join(outdir, f"{tool}.out")
        with open(dst, "w") as f:
            f.write(data if isinstance(data, str) else json.dumps(data))
        print(f"[{tool}] -> {dst} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
