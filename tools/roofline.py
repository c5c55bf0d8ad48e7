"""Analytic VPU roofline for the fused string kernel + measured utilization.

The kernel is VPU-bound (no matmuls: lane-rolls, elementwise arithmetic and
masked reductions on (B, MP) f32 vregs), so the bound that matters is VPU
ops/s, not MXU FLOPs or HBM bandwidth (state lives in VMEM scratch across
the whole chunk; HBM traffic per step is ~0).

Op model per time step (ops in units of one (B, MP)-wide vector op):

  fixed        ~70   derived vars, T60->sigma, LHS tridiag coefficients,
                     RHS assembly (B1u1/C1u2/V_u2, dxx/dxxxx, theta_op)
  pcr          13*ceil(log2(MP)) per tridiagonal solve (6 lane-rolls +
                     7 arith after unit-diagonal normalization)
  interp       ~8*ceil(MP/128)^2 per cross-grid gather pass (vreg-block
                     decomposed dynamic gather)
  sweep        2*pcr + 2*interp + ~12 (residual/exit bookkeeping)
  readout      ~10

v5e VPU peak is taken as 8x128 lanes x 4 ALUs x 0.94 GHz ~ 3.8e12 f32
ops/s per chip (override with VPU_OPS_PER_S); treat the resulting
utilization as an order-of-magnitude statement, not a precise MFU.

Usage:
  python tools/roofline.py                  # model + (if TPU reachable) measure
  python tools/roofline.py --model-only B MP sweeps steps_per_s
"""

import math
import os
import sys


def ops_per_step(MP, sweeps=1.5):
    lev = max(1, math.ceil(math.log2(MP)))
    pcr = 13 * lev
    interp = 8 * (MP // 128) ** 2
    sweep = 2 * pcr + 2 * interp + 12
    return 70 + 10 + sweeps * sweep + interp  # +1 interp in the RHS pass


def report(B, MP, sweeps, steps_per_s, vpu=None):
    vpu = vpu or float(os.environ.get("VPU_OPS_PER_S", 3.8e12))
    ops = ops_per_step(MP, sweeps)
    vec_ops_per_s = steps_per_s * ops * B * MP
    util = vec_ops_per_s / vpu
    print(f"B={B} MP={MP} sweeps~{sweeps}: {ops:.0f} vector-ops/step "
          f"x {B}x{MP} lanes")
    print(f"measured {steps_per_s:,.0f} steps/s -> "
          f"{vec_ops_per_s/1e12:.2f} T f32 ops/s "
          f"= {100*util:.1f}% of VPU peak ({vpu/1e12:.1f}T)")
    ideal = vpu / (ops * B * MP)
    print(f"VPU-roofline ideal: {ideal:,.0f} steps/s "
          f"({ideal/steps_per_s:.1f}x headroom)")
    return util


def measure(B=256, length=0.25):
    import time

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from torch_fdtd_string_tpu.ops.pallas_step import string_chunked

    args, _, _, _ = bench.build_workload(B=B, length=length, seed=7)
    carry, steps, sp, bp, hp, bm, hm, consts = args
    T = ((len(np.asarray(steps)) // 512) * 512) or 512
    MP = ((max(consts.M_t, consts.M_l) + 127) // 128) * 128
    kw = dict(k=consts.k, theta_t=consts.theta_t, lambda_c=consts.lambda_c,
              M_t=consts.M_t, M_l=consts.M_l, chunk=512,
              surface_integral=True, collect_state=False, batch_block=64,
              gmres_rescue=False)  # production first-pass configuration

    def run():
        u, z, _ = string_chunked(
            sp.f0[:, 2:2 + T], sp.kappa, sp.alpha, sp.pos, sp.T60,
            carry.u1, carry.u2, carry.z1, carry.z2, **kw)
        u.block_until_ready()

    run()  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    steps_per_s = T / best
    print(f"measured: {T} steps x B={B} in {best:.3f}s")
    report(B, MP, 1.5, steps_per_s)
    print(f"element-steps/s: {steps_per_s*B/1e6:.2f} M; "
          f"audio_s/s: {steps_per_s*B/48000:.1f}")


if __name__ == "__main__":
    if "--model-only" in sys.argv:
        i = sys.argv.index("--model-only")
        B, MP, sw, sps = (float(x) for x in sys.argv[i + 1 : i + 5])
        report(int(B), int(MP), sw, sps)
    else:
        measure()
