"""Fused Pallas pluck kernel vs the XLA engine (interpreter mode).

Runs the kernel in Pallas interpret mode on CPU and checks that the string
state evolves identically (to f32 rounding) to ``core/engine.py``'s
specialized pluck path with the same fixed coupling sweeps.
"""

import numpy as np
import jax.numpy as jnp
import pytest


def test_pallas_pluck_matches_engine():
    import bench
    from torch_fdtd_string_tpu.core.engine import simulate_chunk
    from torch_fdtd_string_tpu.ops.pallas_step import pluck_chunked

    args, B, _ = bench.build_workload(B=4, length=0.02, seed=7)
    carry, steps, sp, bp, hp, bm, hm, consts = args
    # both sides iterate their coupling loops to machine-precision
    # convergence, so they reach the same fixed point
    cadapt = consts._replace(collect_state=True)
    T = 256
    _, o = simulate_chunk(carry, steps[:T], sp, bp, hp, bm, hm, cadapt)
    u_eng = np.asarray(o["u"])  # (T, B, M_t)

    uout, zout, fin = pluck_chunked(
        sp.f0[:, 2 : 2 + T],
        sp.kappa,
        sp.alpha,
        sp.pos,
        sp.T60,
        carry.u1,
        carry.u2,
        carry.z1,
        carry.z2,
        k=consts.k,
        theta_t=consts.theta_t,
        lambda_c=consts.lambda_c,
        M_t=consts.M_t,
        M_l=consts.M_l,
        chunk=T // 2,  # exercise the cross-chunk scratch carry
        coupling_iters=24,
        surface_integral=True,
        interpret=True,
    )
    u1f = np.asarray(fin[0])
    scale = np.abs(u_eng[-1]).max()
    assert np.isfinite(np.asarray(uout)).all()
    # f32 rounding noise compounds over 256 steps (measured ~7e-7 abs)
    np.testing.assert_allclose(u1f, u_eng[-1], atol=3e-6)
    assert np.abs(u1f - u_eng[-1]).max() < 3e-4 * scale
    # readout matches within f32 summation noise amplified by the 1/k gain
    u_out_eng = np.asarray(o["uout"]).T
    err = np.abs(np.asarray(uout) - u_out_eng).max() / (np.abs(u_out_eng).max() + 1e-12)
    assert err < 2e-4, err
