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

    args, B, _, _ = bench.build_workload(B=4, length=0.02, seed=7)
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
    # f32 rounding noise compounds over 256 steps (measured ~4.3e-6 abs with
    # the normalized-PCR rounding profile; f64 kernel-vs-engine agreement is
    # 4e-15, so any drift here is pure f32 rounding)
    np.testing.assert_allclose(u1f, u_eng[-1], atol=1.2e-5)
    assert np.abs(u1f - u_eng[-1]).max() < 6e-4 * scale
    # readout matches within f32 summation noise amplified by the 1/k gain
    u_out_eng = np.asarray(o["uout"]).T
    err = np.abs(np.asarray(uout) - u_out_eng).max() / (np.abs(u_out_eng).max() + 1e-12)
    assert err < 2e-4, err


def _exc_cfg(exc):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_golden_reference import _make_cfg

    return _make_cfg(146.8 if exc == "hammer" else 110.0, 0.02, 2.0, exc)


import os


@pytest.mark.parametrize("exc", ["hammer", "bow"])
def test_pallas_excitations_match_engine(exc):
    from torch_fdtd_string_tpu.core.engine import (
        BowParams,
        Carry,
        HammerParams,
        SimConsts,
        StringParams,
        simulate_chunk,
    )
    from torch_fdtd_string_tpu.ops.pallas_step import string_chunked

    cfg, _ = _exc_cfg(exc)
    dt = jnp.float32
    B = cfg["B"]
    sp = StringParams(
        kappa=jnp.asarray(cfg["kappa"], dt), alpha=jnp.asarray(cfg["alpha"], dt),
        p_a=jnp.asarray(cfg["p_a"], dt), f0=jnp.asarray(cfg["f0"], dt),
        pos=jnp.asarray(cfg["pos"], dt), T60=jnp.asarray(cfg["T60"], dt),
    )
    bp = BowParams(
        x_b=jnp.asarray(cfg["x_b"], dt), v_b=jnp.asarray(cfg["v_b"], dt),
        F_b=jnp.asarray(cfg["F_b"], dt), phi_0=jnp.asarray(cfg["phi_0"], dt),
        phi_1=jnp.asarray(cfg["phi_1"], dt), wid=jnp.asarray(cfg["wid"], dt),
    )
    hp = HammerParams(
        x_H=jnp.asarray(cfg["x_H"], dt), w_H=jnp.asarray(cfg["w_H"], dt),
        M_r=jnp.asarray(cfg["M_r"], dt), alpha=jnp.asarray(cfg["alpha_H"], dt),
    )
    uH1 = np.full(B, -1e-3 + cfg["k"] * cfg["v_H_amp"], np.float32)
    uH2 = np.full(B, -1e-3, np.float32)
    carry = Carry(
        u1=jnp.asarray(cfg["u1"], dt), u2=jnp.asarray(cfg["u2"], dt),
        z1=jnp.zeros((B, cfg["M_l"]), dt), z2=jnp.zeros((B, cfg["M_l"]), dt),
        uH1=jnp.asarray(uH1), uH2=jnp.asarray(uH2),
    )
    consts = SimConsts(
        k=cfg["k"], theta_t=cfg["theta_t"], lambda_c=1.0, relative_error=4.0,
        M_t=cfg["M_t"], M_l=cfg["M_l"], surface_integral=False,
        collect_state=True, has_bow=(exc == "bow"), has_hammer=(exc == "hammer"),
    )
    T = 128
    steps = jnp.arange(2, 2 + T, dtype=jnp.int32)
    _, o = simulate_chunk(
        carry, steps, sp, bp, hp,
        jnp.asarray(cfg["bow_mask"]), jnp.asarray(cfg["hammer_mask"]), consts,
    )
    u_eng = np.asarray(o["u"])

    sl = lambda key: jnp.asarray(cfg[key], dt)[:, 2 : 2 + T]
    bow = (
        dict(x_b=sl("x_b"), v_b=sl("v_b"), F_b=sl("F_b"), wid=sl("wid"),
             phi_0=jnp.asarray(cfg["phi_0"], dt), phi_1=jnp.asarray(cfg["phi_1"], dt),
             mask=jnp.asarray(cfg["bow_mask"]),
             uH1=jnp.asarray(uH1), uH2=jnp.asarray(uH2))
        if exc == "bow" else None
    )
    hammer = (
        dict(x_H=jnp.asarray(cfg["x_H"], dt), w_H=jnp.asarray(cfg["w_H"], dt),
             M_r=jnp.asarray(cfg["M_r"], dt), alpha=jnp.asarray(cfg["alpha_H"], dt),
             mask=jnp.asarray(cfg["hammer_mask"]),
             uH1=jnp.asarray(uH1), uH2=jnp.asarray(uH2))
        if exc == "hammer" else None
    )
    uout, zout, aux = string_chunked(
        jnp.asarray(cfg["f0"], dt)[:, 2 : 2 + T], sp.kappa, sp.alpha, sp.pos,
        sp.T60, carry.u1, carry.u2, carry.z1, carry.z2,
        k=cfg["k"], theta_t=cfg["theta_t"], lambda_c=1.0,
        M_t=cfg["M_t"], M_l=cfg["M_l"], chunk=T // 2, batch_block=8,
        surface_integral=False, collect_state=True, bow=bow, hammer=hammer,
        interpret=True,
    )
    su = np.asarray(aux["state_u"])
    assert np.abs(su - u_eng).max() < 1e-6, np.abs(su - u_eng).max()
    F_eng = np.asarray(o["F_H"]).T
    scale = max(np.abs(F_eng).max(), 1.0)
    assert np.abs(np.asarray(aux["F_H"]) - F_eng).max() / scale < 1e-3


def _kernel_mms(f0v, sr, T, kappa=0.03, t60=20.0, p_a=0.01, chunk=256):
    """MMS error of the fused kernel (interpret mode, f64): forcing injected
    in-kernel (vnv.cpp:11-37) and the state field compared to the closed form
    ``p_a cos^2(pi x) cos(gamma t) exp(-sig0 t)`` (analytic.py:21-27)."""
    import sys, os as _os

    sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from torch_fdtd_string_tpu.ops import stencils as st
    from torch_fdtd_string_tpu.ops.fdm import get_derived_vars_np, get_theta
    from torch_fdtd_string_tpu.ops.pallas_step import string_chunked
    from torch_fdtd_string_tpu.utils.audio import T60_to_sigma

    B = 1
    dt = jnp.float64
    k_step = 1.0 / sr
    theta = get_theta(kappa, f0v, sr)
    _, _, nx_t, _, nx_l, _ = get_derived_vars_np(f0v, 0.0, k_step, theta, 1.0, 1.0)
    M_t, M_l = nx_t + 1, nx_l + 1
    _, _, N_t, _, _, _ = get_derived_vars_np(f0v, kappa, k_step, theta, 1.0, 1.0)

    f0 = jnp.full((B, T), f0v, dt)
    T60 = jnp.tile(jnp.array([[[1000.0, t60], [100.0, t60]]], dt), (B, 1, 1))
    x_grid = st.domain_x(M_t, jnp.full((B,), float(N_t), dt))
    u0 = st.mask_live(p_a * jnp.cos(np.pi * x_grid) ** 2,
                      jnp.full((B,), N_t + 1.0, dt))
    uout, zout, aux = string_chunked(
        f0,
        jnp.full((B,), kappa, dt),
        jnp.full((B,), 1.0, dt),
        jnp.full((B,), 0.5, dt),
        T60,
        u0, u0,
        jnp.zeros((B, M_l), dt), jnp.zeros((B, M_l), dt),
        k=k_step, theta_t=float(theta), lambda_c=1.0,
        M_t=M_t, M_l=M_l, chunk=chunk, batch_block=1,
        coupling_iters=24, relative_error=8.0,
        collect_state=True, interpret=True,
        manufactured=True, mms_centered=True,
        p_a=jnp.full((B,), p_a, dt),
    )
    su = np.asarray(aux["state_u"])[:, 0, : N_t + 1]  # rows = steps 2..T+1

    gamma = 2.0 * f0v
    sig0 = float(
        T60_to_sigma(np.asarray(T60), jnp.array([gamma]),
                     jnp.array([kappa * gamma]))[0][0]
    )
    x = np.linspace(-0.5, 0.5, N_t + 1)
    t = (2.0 + np.arange(T)) * k_step
    exact = (
        p_a * np.cos(np.pi * x)[None, :] ** 2
        * np.cos(gamma * t)[:, None] * np.exp(-sig0 * t)[:, None]
    )
    return np.abs(su - exact).max() / p_a


def test_pallas_mms_tracks_closed_form_and_converges():
    """Same convergence contract as tests/test_engine.py::_run_mms, but the
    forcing runs INSIDE the fused kernel — validating the kernel against the
    closed form, not just against the engine."""
    # identical physical horizon: T doubles with sr
    err_coarse = _kernel_mms(220.0, sr=48000, T=1024)
    err_fine = _kernel_mms(220.0, sr=96000, T=2048)
    assert err_coarse < 0.02, err_coarse
    assert err_fine < err_coarse / 1.7, (err_fine, err_coarse)


def test_pallas_fixed_sweeps_match_adaptive():
    """Static unrolled Gauss-Seidel (coupling_fixed) reaches the same fixed
    point as the adaptive exit on a production-like pluck workload."""
    import bench
    from torch_fdtd_string_tpu.ops.pallas_step import string_chunked

    args, B, _, _ = bench.build_workload(B=4, length=0.02, seed=11)
    carry, steps, sp, bp, hp, bm, hm, consts = args
    T = 256

    def run(**kw):
        return string_chunked(
            sp.f0[:, 2 : 2 + T], sp.kappa, sp.alpha, sp.pos, sp.T60,
            carry.u1, carry.u2, carry.z1, carry.z2,
            k=consts.k, theta_t=consts.theta_t, lambda_c=consts.lambda_c,
            M_t=consts.M_t, M_l=consts.M_l, chunk=T // 2,
            coupling_iters=24, surface_integral=True, interpret=True, **kw,
        )

    u_ad, _, aux_ad = run()
    u_fx, _, aux_fx = run(coupling_fixed=2)
    fin_ad, fin_fx = aux_ad["carry"][0], aux_fx["carry"][0]
    scale = np.abs(np.asarray(fin_ad)).max() + 1e-12
    dev_state = np.abs(np.asarray(fin_fx) - np.asarray(fin_ad)).max() / scale
    # 2 unrolled sweeps vs machine-precision adaptive: the workload's
    # coupling is weak enough that the iterates agree to f32 noise
    assert dev_state < 2e-4, dev_state
    out_scale = np.abs(np.asarray(u_ad)).max() + 1e-12
    dev_out = np.abs(np.asarray(u_fx) - np.asarray(u_ad)).max() / out_scale
    assert dev_out < 2e-3, dev_out


def test_diverged_element_does_not_poison_batch():
    """A batch element that blows up to NaN (unstable random param draw;
    the product NaN-skips it) must not change healthy elements' results or
    starve them of coupling sweeps.  The round-1 kernel's batch-global
    NaN delta exited after one sweep for everyone."""
    import bench
    from torch_fdtd_string_tpu.ops.pallas_step import string_chunked

    args, B, _, _ = bench.build_workload(B=16, length=0.05, seed=7)
    carry, steps, sp, bp, hp, bm, hm, consts = args
    T = 1024
    sel = np.arange(1, 8)  # healthy subset (b=0 diverges around t~3.5k)

    def run(idx, **kw):
        return string_chunked(
            sp.f0[idx, 2 : 2 + T], sp.kappa[idx], sp.alpha[idx], sp.pos[idx],
            sp.T60[idx], carry.u1[idx], carry.u2[idx], carry.z1[idx],
            carry.z2[idx],
            k=consts.k, theta_t=consts.theta_t, lambda_c=consts.lambda_c,
            M_t=consts.M_t, M_l=consts.M_l, chunk=512, coupling_iters=24,
            surface_integral=consts.surface_integral, interpret=True,
            batch_block=16, **kw,
        )

    # (a) with a static sweep count, per-element solve isolation is exact:
    # batching with the diverged element changes nothing for the others
    u_full, _, _ = run(np.arange(16), coupling_fixed=2)
    u_sub, _, _ = run(sel, coupling_fixed=2)
    np.testing.assert_array_equal(np.asarray(u_full)[sel], np.asarray(u_sub))

    # (b) adaptive mode: healthy elements stay finite alongside the NaN
    # element (its NaN residual reads as converged, not as "never done" —
    # the round-1 global-max delta instead cut everyone to one sweep)
    u_ad, _, _ = run(np.arange(16))
    assert np.isfinite(np.asarray(u_ad)[sel]).all()


def test_pallas_trace_survives_x64_toggle():
    """The f64 rescue toggles jax_enable_x64 around its solve; a later f32
    kernel trace must still compile (leaving x64 on made Mosaic lowering
    blow the recursion limit and silently demoted the fast path)."""
    import jax

    import bench
    from torch_fdtd_string_tpu.ops.pallas_step import string_chunked

    args, B, _, _ = bench.build_workload(B=4, length=0.02, seed=5)
    carry, steps, sp, bp, hp, bm, hm, consts = args
    T = 256

    def k():
        return string_chunked(
            sp.f0[:, 2 : 2 + T], sp.kappa, sp.alpha, sp.pos, sp.T60,
            carry.u1, carry.u2, carry.z1, carry.z2,
            k=consts.k, theta_t=consts.theta_t, lambda_c=consts.lambda_c,
            M_t=consts.M_t, M_l=consts.M_l, chunk=T // 2, coupling_iters=4,
            surface_integral=True, interpret=True,
        )

    o1 = jax.block_until_ready(k())
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        jax.block_until_ready(jax.numpy.ones(3).sum())
    finally:
        jax.config.update("jax_enable_x64", prev)
    o2 = jax.block_until_ready(k())
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))


def test_kernel_gmres_rescue_exactness():
    """The in-kernel GMRES rescue solves the coupled system exactly.

    Forcing ``coupling_iters=1`` makes every step's Gauss-Seidel exit
    unconverged, so the whole trajectory flows through the rescue branch;
    it must then match the f64 engine as closely as the fully-converged
    adaptive path does, while the same cap WITHOUT the rescue drifts
    orders of magnitude further (validates both the branch trigger and the
    GMRES math; VERDICT r2 task #2)."""
    import bench
    import jax.numpy as jnp
    from torch_fdtd_string_tpu.core.engine import simulate_chunk
    from torch_fdtd_string_tpu.ops.pallas_step import string_chunked

    args, B, _, _ = bench.build_workload(B=4, length=0.02, seed=7)
    carry, steps, sp, bp, hp, bm, hm, consts = args
    T = 160
    _, o = simulate_chunk(
        carry, steps[:T], sp, bp, hp, bm, hm,
        consts._replace(collect_state=True),
    )
    u_eng = np.asarray(o["u"])
    scale = np.abs(u_eng).max()

    def run(ci, rescue):
        _, _, aux = string_chunked(
            sp.f0[:, 2 : 2 + T], sp.kappa, sp.alpha, sp.pos, sp.T60,
            carry.u1, carry.u2, carry.z1, carry.z2,
            k=consts.k, theta_t=consts.theta_t, lambda_c=consts.lambda_c,
            M_t=consts.M_t, M_l=consts.M_l, chunk=T, batch_block=8,
            surface_integral=True, collect_state=True, interpret=True,
            coupling_iters=ci, gmres_rescue=rescue,
        )
        return np.abs(np.asarray(aux["state_u"]) - u_eng).max() / scale

    err_rescued = run(1, True)
    err_capped = run(1, False)
    assert err_rescued < 5e-4, err_rescued
    # without the rescue, poison-only mode NaNs every untrustworthy
    # cap-exit (the production first pass hands those elements to the
    # GMRES re-run ladder in tasks/simulate.run)
    assert np.isnan(err_capped), err_capped


def test_kernel_f32_stable_strong_coupling():
    """alpha=23 / f0=392 (golden strong_coupling corner): the f32 kernel
    must stay finite and track the f64 engine trajectory (reference's
    exact joint solve is stable here, string.cpp:173-175; round 2's damped
    GS required a host f64 rescue)."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from test_golden_reference import _make_cfg, _run_ours
    from torch_fdtd_string_tpu.ops.pallas_step import string_chunked
    import jax.numpy as jnp

    cfg, _ = _make_cfg(392.0, 0.03, 23.0, "pluck", p_a=0.01, p_x=0.4)
    T = 384
    ours = _run_ours(cfg, T + 2)  # f64 engine truth
    u_eng = ours["state_u"][:, 2:, :]  # (B, T, M_t)

    dt = jnp.float32
    _, _, aux = string_chunked(
        jnp.asarray(cfg["f0"], dt)[:, 2 : 2 + T],
        jnp.asarray(cfg["kappa"], dt), jnp.asarray(cfg["alpha"], dt),
        jnp.asarray(cfg["pos"], dt), jnp.asarray(cfg["T60"], dt),
        jnp.asarray(cfg["u1"], dt), jnp.asarray(cfg["u2"], dt),
        jnp.zeros((cfg["B"], cfg["M_l"]), dt),
        jnp.zeros((cfg["B"], cfg["M_l"]), dt),
        k=cfg["k"], theta_t=cfg["theta_t"], lambda_c=1.0,
        M_t=cfg["M_t"], M_l=cfg["M_l"], chunk=T, batch_block=8,
        surface_integral=False, collect_state=True, interpret=True,
    )
    su = np.asarray(aux["state_u"]).transpose(1, 0, 2)  # (B, T, M_t)
    assert np.isfinite(su).all()
    scale = np.abs(u_eng).max()
    relerr = np.abs(su - u_eng).max() / scale
    # f32 vs f64 in the chaotic strong-coupling regime: Lyapunov-amplified
    # rounding, bounded well below O(1) trajectory divergence
    assert relerr < 5e-2, relerr


def test_bucketed_kernel_matches_plain():
    """Grid-size bucketing (string_chunked_bucketed) is a pure scheduling
    optimization: outputs, aux traces and the final carry must match the
    single-call kernel, including the reference's allocation-coupled
    z live-row semantics (M_t_sem).  Groups that run at a narrower padded
    width than the allocation (M_t_g < M_t) reorder f32 lane reductions,
    so equality is asserted to 1e-8 absolute (~1 ULP of the 1e-4-scale
    state; a wrong-element bug would show at 1e-4)."""
    import jax.numpy as jnp
    from torch_fdtd_string_tpu.ops import fdm
    from torch_fdtd_string_tpu.ops.pallas_step import (
        string_chunked,
        string_chunked_bucketed,
    )

    rng = np.random.default_rng(7)
    B, T = 32, 64
    sr = 48000
    k = 1.0 / sr
    theta = 0.575
    f0c = rng.uniform(90, 700, B).astype(np.float32)
    f0 = np.repeat(f0c[:, None], T, axis=1)
    kappa = rng.uniform(0.01, 0.06, B).astype(np.float32)
    alpha = rng.uniform(1.0, 8.0, B).astype(np.float32)
    pos = rng.uniform(0.2, 0.8, B).astype(np.float32)
    t60 = np.stack(
        [np.stack([np.full(B, 100.0), rng.uniform(10, 25, B)], 1),
         np.stack([np.full(B, 2000.0), rng.uniform(8, 20, B)], 1)], 1
    ).astype(np.float32)
    var = fdm.get_derived_vars_np(85.0, 0.0, k, theta, 1.0, 1.0)
    M_t, M_l = var[2] + 1, var[4] + 1
    x = np.linspace(0, 1, M_t, dtype=np.float32)
    u1 = np.broadcast_to(1e-3 * np.sin(np.pi * x), (B, M_t)).copy()
    z1 = np.zeros((B, M_l), np.float32)
    common = dict(
        k=k, theta_t=theta, lambda_c=1.0, M_t=M_t, M_l=M_l, chunk=T,
        batch_block=8, surface_integral=False, interpret=True,
        gmres_rescue=False,
    )
    ref = string_chunked(
        f0, kappa, alpha, pos, t60, u1, u1, z1, z1, **common)
    got = string_chunked_bucketed(
        f0, kappa, alpha, pos, t60, u1, u1, z1, z1, **common)
    tol = dict(rtol=0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]), **tol)
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]), **tol)
    for c_ref, c_got in zip(ref[2]["carry"], got[2]["carry"]):
        # both paths return (B, M_t); the slice is defensive only
        c_got = np.asarray(c_got)[:, : c_ref.shape[1]]
        np.testing.assert_allclose(np.asarray(c_ref), c_got, **tol)


def test_bucketed_kernel_width_clamp_narrow_batch():
    """B < 2*g_min takes the single-clamped-group branch (the round-3 B=16
    headline path): all-high-f0 draws whose live-width bound sits below the
    allocation width must run at the clamped width and still match the
    plain kernel to the bucketing tolerance (ADVICE r3: this branch shipped
    without regression coverage — test_bucketed_kernel_matches_plain's B=32
    takes the multi-bucket path instead)."""
    import jax.numpy as jnp
    from torch_fdtd_string_tpu.ops import fdm
    from torch_fdtd_string_tpu.ops.pallas_step import (
        string_chunked,
        string_chunked_bucketed,
    )

    rng = np.random.default_rng(11)
    B, T = 8, 64
    sr = 48000
    k = 1.0 / sr
    theta = 0.575
    # high-f0 draws => small live grids => need.max() < MP_glob (the
    # allocation is sized for 85 Hz; 500+ Hz strings live in ~128 lanes)
    f0c = rng.uniform(500, 700, B).astype(np.float32)
    f0 = np.repeat(f0c[:, None], T, axis=1)
    kappa = rng.uniform(0.01, 0.06, B).astype(np.float32)
    alpha = rng.uniform(1.0, 8.0, B).astype(np.float32)
    pos = rng.uniform(0.2, 0.8, B).astype(np.float32)
    t60 = np.stack(
        [np.stack([np.full(B, 100.0), rng.uniform(10, 25, B)], 1),
         np.stack([np.full(B, 2000.0), rng.uniform(8, 20, B)], 1)], 1
    ).astype(np.float32)
    var = fdm.get_derived_vars_np(85.0, 0.0, k, theta, 1.0, 1.0)
    M_t, M_l = var[2] + 1, var[4] + 1
    x = np.linspace(0, 1, M_t, dtype=np.float32)
    u1 = np.broadcast_to(1e-3 * np.sin(np.pi * x), (B, M_t)).copy()
    z1 = np.zeros((B, M_l), np.float32)
    common = dict(
        k=k, theta_t=theta, lambda_c=1.0, M_t=M_t, M_l=M_l, chunk=T,
        batch_block=8, surface_integral=False, interpret=True,
        gmres_rescue=False,
    )
    # precondition: the clamp branch is actually taken (B < 2*g_min) and
    # actually clamps (bound below allocation width)
    bt, bl = __import__(
        "torch_fdtd_string_tpu.ops.pallas_step", fromlist=["_grid_bounds"]
    )._grid_bounds(f0c, kappa, alpha, k, theta, 1.0)
    MP_glob = ((max(M_t, M_l) + 127) // 128) * 128
    need_max = 128 * ((np.maximum(bt, bl).max() + 127) // 128)
    assert B < 2 * max(16, 8 // 4) and need_max < MP_glob, (need_max, MP_glob)
    ref = string_chunked(
        f0, kappa, alpha, pos, t60, u1, u1, z1, z1, **common)
    got = string_chunked_bucketed(
        f0, kappa, alpha, pos, t60, u1, u1, z1, z1, **common)
    tol = dict(rtol=0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]), **tol)
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]), **tol)
    for c_ref, c_got in zip(ref[2]["carry"], got[2]["carry"]):
        np.testing.assert_allclose(
            np.asarray(c_ref), np.asarray(c_got)[:, : c_ref.shape[1]], **tol)
