"""Interp-pickup readout parity at extreme pickup positions + gliding f0.

VERDICT r2 weak #6: the kernel's ``interp_idx``/readout semantics were only
validated against the engine at mid-string pickup positions with constant
grids.  Here the kernel (interpret mode) and the XLA engine read out at
positions near both Dirichlet boundaries while an upward f0 glide shrinks the
live grid mid-trajectory (reference readout contract: string.cpp:263-298 —
``u_i = 1 + floor(N_t * pos)`` with linear interpolation to ``u_i + 1``).
"""

import numpy as np
import jax.numpy as jnp


def test_edge_pickup_readout_matches_engine_under_glide():
    import bench
    from torch_fdtd_string_tpu.core.engine import simulate_chunk
    from torch_fdtd_string_tpu.ops.pallas_step import string_chunked

    args, B, _, _ = bench.build_workload(B=4, length=0.02, seed=11)
    carry, steps, sp, bp, hp, bm, hm, consts = args

    # pickups hugging both boundaries (the interpolation partner node
    # u_i + 1 sits on / beyond the moving Dirichlet edge for pos -> 1)
    pos = jnp.asarray([0.02, 0.37, 0.85, 0.98], jnp.float32)
    # linear upward glide: the live grid size N_t(t) shrinks mid-chunk, so
    # the readout gather index crosses live-region boundaries over time
    T = 192
    ramp = jnp.linspace(1.0, 1.35, sp.f0.shape[1], dtype=jnp.float32)
    f0 = sp.f0[:, :1] * ramp[None, :]
    sp = sp._replace(pos=pos, f0=f0)

    cadapt = consts._replace(surface_integral=False)
    _, o = simulate_chunk(carry, steps[:T], sp, bp, hp, bm, hm, cadapt)
    u_eng = np.asarray(o["uout"]).T  # (B, T)
    z_eng = np.asarray(o["zout"]).T

    uout, zout, _ = string_chunked(
        sp.f0[:, 2 : 2 + T], sp.kappa, sp.alpha, sp.pos, sp.T60,
        carry.u1, carry.u2, carry.z1, carry.z2,
        k=consts.k, theta_t=consts.theta_t, lambda_c=consts.lambda_c,
        M_t=consts.M_t, M_l=consts.M_l, chunk=T // 2, coupling_iters=24,
        surface_integral=False, interpret=True,
    )
    uout, zout = np.asarray(uout), np.asarray(zout)
    assert np.isfinite(uout).all() and np.isfinite(zout).all()

    # per-element relative error: boundary pickups read small displacements,
    # so normalize per element (not by the batch-global scale)
    for b in range(B):
        su = np.abs(u_eng[b]).max() + 1e-12
        err = np.abs(uout[b] - u_eng[b]).max() / su
        assert err < 5e-4, (b, float(pos[b]), err)
        sz = np.abs(z_eng[b]).max()
        if sz > 1e-12:  # z stays ~0 for alpha ~= 1 draws
            errz = np.abs(zout[b] - z_eng[b]).max() / sz
            assert errz < 5e-4, (b, float(pos[b]), errz)
