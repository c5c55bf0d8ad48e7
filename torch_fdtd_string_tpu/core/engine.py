"""TPU-native FDTD engine for the coupled transverse/longitudinal stiff string.

Re-derivation of the reference hot loop (``src/model/cpp/string.cpp``,
``bow.cpp``, ``hammer.cpp``, ``simulator.cpp``) as a pure-functional JAX
program:

  * the implicit theta-scheme step ``A w^{n+1} = -(B w^n + C w^{n-1} + G)``
    is solved with *matrix-free* masked tridiagonal solves (PCR, see
    ``ops/tridiag.py``) instead of a dense batched ``inv(A)`` per step
    (string.cpp:173-175) — the LHS blocks are tridiagonal and the thin
    cross-grid couplings ``K_tl``/``K_lt`` are folded into the existing
    Picard fixed point;
  * the data-dependent Picard loop (string.cpp:200-258) and the hammer
    fixed point (hammer.cpp:33-52) become bounded ``lax.while_loop``s with
    on-device convergence flags — no host syncs;
  * time stepping is a single ``lax.scan`` over the audio-rate step
    (simulator.cpp:40-56), jitted once per (batch, grid, chunk) shape.

Physics semantics follow the reference:
  * per-step derived grid sizes from the (possibly time-varying) f0 control
    signal, padded to static maxima with live-region masks
    (string.cpp:83-90, 123-132);
  * two-point T60 damping -> (sigma0, sigma1) (string.cpp:96-120);
  * bow friction ``sign(v)(eps + (1-eps) e^{-a|v|})`` spread over a raised
    cosine (bow.cpp:10-41);
  * nonlinear power-law hammer with displacement clamp (hammer.cpp:11-54);
  * Dirichlet boundary masking and interpolated-pickup or surface-integral
    readout (string.cpp:245-246, 263-298);
  * Method-of-Manufactured-Solutions forcing hook (vnv.cpp:11-37).

Each element's linear system is truncated at its own live size (identity
padding).  The reference instead solves at the *batch-max* size and applies a
concatenated-layout RHS mask (string.cpp:233); for uniform batches (all
verification configs) the two coincide exactly, and we replicate the
reference's concatenated RHS mask semantics for bit-faithfulness there.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stencils as st
from ..ops.fdm import get_derived_vars, t60_to_sigma
from ..ops.tridiag import tridiag_solve

# Maximum hammer displacement used by the *clamp* in the hammer loop
# (hammer.cpp:3). NOTE: the reference initialises the hammer displacement
# buffer with a different constant (-1e-3, simulator.py:507); we replicate
# both values faithfully.
M_HD_CLAMP = -0.01


class SimConsts(NamedTuple):
    """Static (trace-time) simulation constants."""

    k: float
    theta_t: float
    lambda_c: float
    relative_error: float
    M_t: int  # static padded transverse width (Nx_t + 1)
    M_l: int  # static padded longitudinal width (Nx_l + 1)
    surface_integral: bool = False
    manufactured: bool = False
    picard_max_iter: int = 40
    hammer_max_iter: int = 40
    # inner u<->z coupling sweeps per Picard iteration: the reference's dense
    # joint inverse solves the cross-coupled block system exactly
    # (string.cpp:173-175, 238); the Gauss-Seidel splitting here converges at
    # rate ~||T^-1 K||^2 (tiny), so a few sweeps reach machine precision.
    coupling_max_iter: int = 8
    # convergence floor as a multiple of machine eps; tighter floors buy
    # f32 stability margin for strongly-coupled (high-alpha) strings at the
    # cost of extra sweeps (the reference's exact solve has ~1 eps error)
    coupling_eps_factor: float = 100.0
    # "gs": damped Gauss-Seidel sweeps (fast; converges for moderate
    # coupling).  "gmres": block-GS-preconditioned GMRES on the joint
    # system — robust for strongly-coupled draws whose GS spectrum mixes
    # large-negative and near-one eigenvalues (no scalar damping factor
    # converges there); used by the f64 NaN-rescue path.
    coupling_solver: str = "gs"
    # Trace-time specialization: when a run has no bowed/hammered batch
    # elements the corresponding excitation code is eliminated entirely, and
    # with no excitation at all the outer Picard loop is skipped (its RHS
    # cannot change between iterations, so the reference's loop provably
    # terminates after confirming the first iterate).  Artifact note: the
    # fast path emits v_r_out/F_H_out = 0 where the reference would record
    # the (masked-out, physically meaningless) bow/hammer probe values.
    has_bow: bool = True
    has_hammer: bool = True
    # > 0: replace the adaptive inner coupling while_loop with a static
    # number of unrolled Gauss-Seidel sweeps (no residual reductions, fully
    # static schedule — faster on TPU). The splitting contracts at
    # ~||T^-1 K_tl|| * ||T^-1 K_lt|| per sweep (orders of magnitude below 1
    # for physical parameters), so 3 sweeps reach f32 machine precision.
    coupling_fixed_iters: int = 0
    collect_state: bool = True
    # The reference evaluates the MMS forcing at the *new* time level
    # ``n * k`` (string.cpp:229 with global_step = n), one step ahead of the
    # centered scheme's middle level ``(n-1) * k`` — an O(k) consistency bias.
    # ``mms_centered=True`` uses the consistent level (restores 2nd-order
    # convergence); False replicates the reference bit-for-bit.
    mms_centered: bool = False


class StringParams(NamedTuple):
    """Per-batch string parameters (cf. string.cpp:67-69)."""

    kappa: jnp.ndarray  # (B,) relative stiffness
    alpha: jnp.ndarray  # (B,) stiffness vs tension
    p_a: jnp.ndarray  # (B,) max pluck amplitude (MMS forcing amplitude)
    f0: jnp.ndarray  # (B, Nt) fundamental frequency control
    pos: jnp.ndarray  # (B,) readout position
    T60: jnp.ndarray  # (B, 2, 2) damping spec


class BowParams(NamedTuple):
    x_b: jnp.ndarray  # (B, Nt)
    v_b: jnp.ndarray  # (B, Nt)
    F_b: jnp.ndarray  # (B, Nt)
    phi_0: jnp.ndarray  # (B,)
    phi_1: jnp.ndarray  # (B,)
    wid: jnp.ndarray  # (B, Nt)


class HammerParams(NamedTuple):
    x_H: jnp.ndarray  # (B,)
    w_H: jnp.ndarray  # (B,)  (raw; divided by lambda_c in-step)
    M_r: jnp.ndarray  # (B,)  (raw; divided by lambda_c in-step)
    alpha: jnp.ndarray  # (B,)


class Carry(NamedTuple):
    u1: jnp.ndarray  # (B, M_t) row n-1
    u2: jnp.ndarray  # (B, M_t) row n-2
    z1: jnp.ndarray  # (B, M_l)
    z2: jnp.ndarray  # (B, M_l)
    uH1: jnp.ndarray  # (B,)
    uH2: jnp.ndarray  # (B,)


def hard_bow(v_rel, a, eps):
    """Friction curve (bow.cpp:10-12)."""
    return jnp.sign(v_rel) * (eps + (1.0 - eps) * jnp.exp(-a * jnp.abs(v_rel)))


def soft_bow(v_rel, a, eps=None):
    """Smooth friction curve (bow.cpp:13-15)."""
    return jnp.sqrt(2.0 * a) * v_rel * jnp.exp(-a * v_rel**2 + 0.5)


def mms_forcing(gamma, sig0, K, p_a, x, t):
    """Manufactured-solution forcing term (vnv.cpp:11-37).

    ``sigma == sig0``, ``omega == gamma``, ``mu == pi``; the ``sin`` branch
    vanishes identically since sigma - sig0 == 0.
    """
    mu = np.pi
    g = gamma[:, None]
    s = sig0[:, None]
    coeff_1 = (s**2 - g**2 - 2.0 * s * s) * jnp.cos(mu * x) ** 2
    coeff_2 = (2.0 * mu**2 * (4.0 * K[:, None] ** 2 * mu**2 + g**2)) * jnp.cos(
        2.0 * mu * x
    )
    return p_a[:, None] * (coeff_1 + coeff_2) * jnp.cos(g * t) * jnp.exp(-s * t)


def _hammer_loop(uH1, uH2, eta_1, eta_2, alpha_H, w_H, eps_u, k, tol, mask, max_iter):
    """Inner nonlinear hammer fixed point (hammer.cpp:11-54).

    All quantities are (B,).  Returns (F_H, u_H).
    """
    eta0 = eta_1 * mask

    def body(state):
        F_H, u_H, eta_est, res, it = state
        eta = eta_est
        f_H = (
            jnp.power(w_H, 1.0 + alpha_H)
            * jnp.power(jnp.maximum(eta_1, 0.0), alpha_H - 1.0)
            * (eta + eta_2)
            / 2.0
        )
        F_H = jnp.where(eta_1 > 0, f_H, 0.0)
        u_H = 2.0 * uH1 - uH2 - k**2 * F_H
        u_H = jnp.maximum(u_H - M_HD_CLAMP, 0.0) + M_HD_CLAMP
        eta_new = (u_H - eps_u) * mask
        res = jnp.abs(eta - eta_new)
        return F_H, u_H, eta_new, res, it + 1

    def cond_fn(state):
        _, _, _, res, it = state
        first = it == 0
        return jnp.logical_or(first, jnp.logical_and(it < max_iter, jnp.any(res > tol)))

    z = jnp.zeros_like(eta0)
    F_H, u_H, _, _, _ = jax.lax.while_loop(
        cond_fn, body, (z, z, eta0, z, jnp.array(0, jnp.int32))
    )
    return F_H, u_H


def string_step(carry: Carry, xs, sp: StringParams, bp: BowParams, hp: HammerParams,
                bow_mask, hammer_mask, consts: SimConsts):
    """One theta-scheme time step (string.cpp:43-306).

    ``xs`` = (f0_n, x_b_n, v_b_n, F_b_n, wid_n, n_global) — the per-step
    slices of the control signals plus the global step index.
    """
    f0_n, x_b_n, v_b_n, F_b_n, wid_n, n_global = xs
    k, theta_t, lambda_c = consts.k, consts.theta_t, consts.lambda_c
    M_t, M_l = consts.M_t, consts.M_l
    dtype = carry.u1.dtype

    gamma, K, N_t, h_t, N_l, h_l = get_derived_vars(
        f0_n, sp.kappa, k, theta_t, lambda_c, sp.alpha
    )
    sig0, sig1 = t60_to_sigma(sp.T60, gamma, K)
    tol_t = h_t**consts.relative_error
    tol_l = h_l**consts.relative_error
    n_t = N_t + 1.0  # live transverse points
    n_l = N_l + 1.0

    u1 = st.mask_live(carry.u1, n_t)
    u2 = st.mask_live(carry.u2, n_t)
    z1 = st.mask_live(carry.z1, n_l)
    z2 = st.mask_live(carry.z2, n_l)

    ht = h_t[:, None]
    hl = h_l[:, None]
    s0 = sig0[:, None]
    s1 = sig1[:, None]
    gamma_k = (gamma**2)[:, None] * k**2
    phi_pow = gamma_k * (sp.alpha**2 - 1.0)[:, None] / 4.0
    lam = st.dxb(u1, ht)  # Lambda = Dxb u1 (string.cpp:153)
    lam2 = lam * lam

    # ---- LHS tridiagonal coefficients -------------------------------------
    a_t = (1.0 - theta_t) / 2.0 - 2.0 * s1 * k / (ht * ht)
    b_t = theta_t + 2.0 * s0 * k + 4.0 * s1 * k / (ht * ht)
    d_next = st.shift(lam2, -1)
    idx_t = jnp.arange(M_t, dtype=dtype)[None, :]
    live_t = idx_t < n_t[:, None]
    sub_t = jnp.where((idx_t >= 1) & live_t, a_t - phi_pow * lam2 / (ht * ht), 0.0)
    diag_t = jnp.where(live_t, b_t + phi_pow * (lam2 + d_next) / (ht * ht), 1.0)
    sup_t = jnp.where(idx_t < (n_t[:, None] - 1.0), a_t - phi_pow * d_next / (ht * ht), 0.0)

    a_l = -2.0 * s1 * k / (hl * hl)
    b_l = 1.0 + 2.0 * s0 * k + 4.0 * s1 * k / (hl * hl)
    idx_l = jnp.arange(M_l, dtype=dtype)[None, :]
    live_l = idx_l < n_l[:, None]
    sub_l = jnp.where((idx_l >= 1) & live_l, a_l, 0.0)
    diag_l = jnp.where(live_l, b_l, 1.0)
    sup_l = jnp.where(idx_l < (n_l[:, None] - 1.0), a_l, 0.0)

    # ---- cross-grid couplings as operators --------------------------------
    def K_tl(zv):
        """A_2 = -phi_pow * Dxf_tt Lam Dxb_tt Int_tl (string.cpp:158)."""
        w = st.interp_linear(zv, n_l, n_t, M_t)
        return -phi_pow * st.dxf(lam * st.dxb(w, ht), ht)

    def K_lt(uv):
        """A_3 = -phi_pow * Dxf_ll Int_lt Lam Dxb_tt (string.cpp:159)."""
        w = st.interp_linear(lam * st.dxb(uv, ht), n_t, n_l, M_l)
        return -phi_pow * st.dxf(w, hl)

    def V_tt(uv):
        """-phi_pow * Dxf Lam^2 Dxb (string.cpp:160)."""
        return -phi_pow * st.dxf_diag_dxb(uv, lam2, ht)

    # ---- constant part of the RHS (B w1 + C w2, string.cpp:162-170) -------
    K2k2 = (K**2)[:, None] * k**2
    B1u1 = (
        -2.0 * st.theta_op(u1, theta_t)
        - gamma_k * st.dxx(u1, ht)
        + K2k2 * st.dxxxx_clamped(u1, ht, n_t)
    )
    C1u2 = (
        st.theta_op(u2, theta_t)
        - 2.0 * s0 * k * u2
        + 2.0 * s1 * k * st.dxx(u2, ht)
        + V_tt(u2)
    )
    rhs_u_const = B1u1 + 2.0 * K_tl(z1) + C1u2 + K_tl(z2)

    alpha2 = (sp.alpha**2)[:, None]
    B4z1 = -2.0 * z1 - gamma_k * alpha2 * st.dxx(z1, hl)
    C4z2 = (1.0 - 2.0 * s0 * k) * z2 + 2.0 * s1 * k * st.dxx(z2, hl)
    rhs_z_const = B4z1 + K_lt(u2) + C4z2

    if consts.manufactured:
        t_now = (n_global.astype(dtype) - (1.0 if consts.mms_centered else 0.0)) * k
        x_u = st.domain_x(M_t, N_t)
        f_u = mms_forcing(gamma, sig0, K, sp.p_a, x_u, t_now)
        x_z = jnp.full((1, M_l), 0.5, dtype)  # concat rows saturate at +1/2
        f_z = mms_forcing(gamma, sig0, K, sp.p_a, x_z, t_now)
        rhs_u_const = rhs_u_const - f_u * k**2
        rhs_z_const = rhs_z_const - f_z * k**2

    # Faithful RHS masks: u rows live to N_t (solve-block truncation), z rows
    # replicate the reference's concatenated-layout mask (string.cpp:233),
    # which keeps z rows j with M_t + j + 1 <= N_t + N_l + 2.
    z_keep = jnp.clip(N_t + N_l + 2.0 - M_t, 0.0, n_l)

    # ---- excitation profiles ----------------------------------------------
    h_mask = hammer_mask.astype(dtype)
    b_mask = bow_mask.astype(dtype)
    has_exc = consts.has_bow or consts.has_hammer
    if consts.has_bow:
        rc = st.raised_cosine(N_t - 1.0, x_b_n, wid_n * h_t, M_t)  # bow.cpp:32
    if consts.has_hammer:
        eps_prof = st.floor_dirac_delta(N_t - 1.0, hp.x_H, M_t)  # hammer.cpp:71
        M_r = hp.M_r / lambda_c
        w_H = hp.w_H / lambda_c
        eta_1 = carry.uH1 - jnp.sum(eps_prof * u1, axis=-1)
        eta_2 = carry.uH2 - jnp.sum(eps_prof * u2, axis=-1)

    rhs_z = st.mask_live(rhs_z_const, z_keep)
    inner_eps = consts.coupling_eps_factor * jnp.finfo(dtype).eps

    def coupled_solve(rhs_u, u0_i, z0_i):
        """Solve the cross-coupled block system to machine precision
        (equivalent to the reference's joint dense inverse,
        string.cpp:173-175, 238) — damped Gauss-Seidel sweeps by default,
        or preconditioned GMRES for strongly-coupled rescue runs."""
        if consts.coupling_solver == "gmres":
            from jax.scipy.sparse.linalg import gmres

            from ..ops.tridiag import tridiag_matvec

            def _solve_one(rhs_u1, rhs_z1, u01, z01, subt1, diagt1, supt1,
                           subl1, diagl1, supl1, lam1, phi1, n_t1, n_l1,
                           ht1, hl1):
                """Per-element GMRES: each batch element gets its OWN
                Krylov space (inner products do not span the batch), so a
                hopeless NaN element cannot poison its neighbours and quiet
                elements are not under-solved against a loud joint ||b||.
                This is what lets the f64 rescue run all diverged elements
                in one vmapped call instead of a Python loop (wall time
                sublinear in the rescue count)."""
                E = lambda v: v[None]
                ht_e, hl_e = E(ht1), E(hl1)

                def ktl1(zv):
                    w = st.interp_linear(E(zv), E(n_l1), E(n_t1), M_t)
                    return (-phi1 * st.dxf(E(lam1) * st.dxb(w, ht_e), ht_e))[0]

                def klt1(uv):
                    w = st.interp_linear(
                        E(lam1) * st.dxb(E(uv), ht_e), E(n_t1), E(n_l1), M_l
                    )
                    return (-phi1 * st.dxf(w, hl_e))[0]

                t_solve = lambda a, b, c, x: tridiag_solve(
                    E(a), E(b), E(c), E(x)
                )[0]
                t_mv = lambda a, b, c, x: tridiag_matvec(
                    E(a), E(b), E(c), E(x)
                )[0]

                def mv(x):
                    u_x, z_x = x
                    return (
                        t_mv(subt1, diagt1, supt1, u_x) + ktl1(z_x),
                        t_mv(subl1, diagl1, supl1, z_x) + klt1(u_x),
                    )

                def prec(r):
                    r_u, r_z = r
                    u_p = t_solve(subt1, diagt1, supt1, r_u)
                    z_p = t_solve(subl1, diagl1, supl1, r_z - klt1(u_p))
                    return u_p, z_p

                x, _ = gmres(
                    mv, (rhs_u1, rhs_z1), x0=(u01, z01), M=prec,
                    tol=float(consts.coupling_eps_factor)
                    * float(jnp.finfo(dtype).eps),
                    atol=0.0, restart=16,
                    maxiter=max(consts.coupling_max_iter // 16, 2),
                    solve_method="batched",
                )
                return x

            Bv = lam.shape[0]
            bc = lambda v, shp: jnp.broadcast_to(v, shp)
            u_n, z_n = jax.vmap(_solve_one)(
                -rhs_u, -rhs_z, u0_i, z0_i, sub_t, diag_t, sup_t,
                sub_l, diag_l, sup_l, lam, bc(phi_pow, (Bv, 1)),
                bc(n_t, (Bv,)), bc(n_l, (Bv,)),
                bc(ht, (Bv, 1)), bc(hl, (Bv, 1)),
            )
            u_n = st.dirichlet(st.mask_live(u_n, n_t), N_t)
            z_n = st.dirichlet(st.mask_live(z_n, n_l), N_l)
            return u_n, z_n
        if consts.coupling_fixed_iters > 0:
            u_n, z_n = u0_i, z0_i
            for _ in range(consts.coupling_fixed_iters):
                u_n = tridiag_solve(sub_t, diag_t, sup_t, -rhs_u - K_tl(z_n))
                z_n = tridiag_solve(sub_l, diag_l, sup_l, -rhs_z - K_lt(u_n))
            u_n = st.dirichlet(st.mask_live(u_n, n_t), N_t)
            z_n = st.dirichlet(st.mask_live(z_n, n_l), N_l)
            return u_n, z_n

        def inner_body(istate):
            u_i, z_i, _, omega, prev_delta, _, it_i = istate
            u_g = tridiag_solve(sub_t, diag_t, sup_t, -rhs_u - K_tl(z_i))
            z_g = tridiag_solve(sub_l, diag_l, sup_l, -rhs_z - K_lt(u_g))
            # Adaptive under-relaxation: the block Gauss-Seidel map diverges
            # when the phi_pow ~ alpha^2 coupling pushes its spectral radius
            # past 1 (the reference's joint dense inverse has no such limit,
            # string.cpp:173-175; verified stable at alpha=23 where plain GS
            # blows up).  Damping u' = u + w(GS(u) - u) has the same fixed
            # point and converges for w < 2/(1 - lambda_min); w backs off
            # per element whenever its residual grows.
            u_n = u_i + omega[:, None] * (u_g - u_i)
            z_n = z_i + omega[:, None] * (z_g - z_i)
            # the UNdamped GS displacement measures distance to the fixed
            # point regardless of omega (the omega-scaled step would read
            # as converged when omega is merely small)
            delta_b = (
                jnp.max(jnp.abs(u_g - u_i), axis=-1)
                + jnp.max(jnp.abs(z_g - z_i), axis=-1)
            )
            grew = delta_b > prev_delta
            hopeless = jnp.logical_and(grew, omega <= 0.0625)
            omega = jnp.where(grew, jnp.maximum(omega * 0.5, 0.0625), omega)
            # per-element, NaN-robust: a diverged element reads as done so
            # it neither starves healthy elements of sweeps nor drags them
            # to the iteration cap; likewise an element at the relaxation
            # floor with a still-growing residual cannot converge (it will
            # NaN and be rescued) and is excluded from the exit test
            scale_b = jnp.max(jnp.abs(u_n), axis=-1) + inner_eps
            live_err = jnp.logical_and(
                delta_b > inner_eps * scale_b, jnp.logical_not(hopeless)
            )
            done = jnp.logical_not(jnp.any(live_err))
            return u_n, z_n, done, omega, delta_b, hopeless, it_i + 1

        def inner_cond(istate):
            done, it_i = istate[2], istate[6]
            return jnp.logical_or(
                it_i == 0,
                jnp.logical_and(
                    jnp.logical_not(done), it_i < consts.coupling_max_iter
                ),
            )

        Bsz = u0_i.shape[0]
        u_n, z_n, _, _, _, hopeless_f, _ = jax.lax.while_loop(
            inner_cond, inner_body,
            (u0_i, z0_i, jnp.array(False), jnp.ones(Bsz, dtype),
             jnp.full(Bsz, jnp.inf, dtype), jnp.zeros(Bsz, bool),
             jnp.array(0, jnp.int32)),
        )
        # An element still at the relaxation floor with a growing residual
        # on the final sweep is under-converged; it usually diverges to NaN
        # within a few steps, but if it stays finite its wrong state would be
        # written silently.  Poison it explicitly so the NaN skip/rescue
        # machinery (tasks/simulate.py) treats it like any diverged element.
        u_n = jnp.where(hopeless_f[:, None], jnp.nan, u_n)
        u_n = st.dirichlet(st.mask_live(u_n, n_t), N_t)
        z_n = st.dirichlet(st.mask_live(z_n, n_l), N_l)
        return u_n, z_n

    def free_hammer_state():
        """Hammer displacement advance with zero force (hammer.cpp:43-45)."""
        u_H = 2.0 * carry.uH1 - carry.uH2
        return jnp.maximum(u_H - M_HD_CLAMP, 0.0) + M_HD_CLAMP

    zeros_b = jnp.zeros_like(carry.uH1)
    if not has_exc:
        # No excitation: the RHS is iteration-independent, so the reference's
        # Picard loop provably returns the first (exact) iterate. Solve once.
        rhs_u = st.mask_live(rhs_u_const, n_t)
        u, z = coupled_solve(rhs_u, carry.u1, carry.z1)
        v_rel = zeros_b
        F_H = zeros_b
        u_H = free_hammer_state()
        n_iter = jnp.array(1, jnp.int32)
    else:

        def picard_body(state):
            u, z, v_rel, F_H, u_H, it, conv = state
            rhs_u = rhs_u_const
            if consts.has_bow:
                # Bow (bow.cpp:17-41)
                du = jnp.where(it == 0, u1 - u2, u - u1)
                v_rel = jnp.sum(rc * (du / k - v_b_n[:, None]), axis=-1)
                phi = hard_bow(v_rel, bp.phi_0, bp.phi_1)
                G_B = -(k**2) * (rc / ht) * (F_b_n * phi)[:, None]
                rhs_u = rhs_u + b_mask[:, None] * jnp.nan_to_num(G_B)
            if consts.has_hammer:
                # Hammer (hammer.cpp:56-85)
                eps_u = jnp.sum(eps_prof * u, axis=-1)
                F_H, u_H = _hammer_loop(
                    carry.uH1, carry.uH2, eta_1, eta_2, hp.alpha, w_H, eps_u,
                    k, tol_t, h_mask, consts.hammer_max_iter,
                )
                G_H = -(k**2) * eps_prof * (M_r * F_H)[:, None]
                rhs_u = rhs_u + h_mask[:, None] * jnp.nan_to_num(G_H)
            else:
                u_H = free_hammer_state()
            rhs_u = st.mask_live(rhs_u, n_t)

            u_new, z_new = coupled_solve(rhs_u, u, z)
            # Per-element convergence (SURVEY §7): once a batch element's
            # residual drops under its tolerance, freeze its state and probe
            # values so further sweeps (driven by slower elements) cannot
            # perturb it.  The reference iterates the whole batch on a global
            # ``.any()`` (string.cpp:238-246); the fixed point is the same.
            frozen = conv  # (B,) converged before this sweep
            u_new = jnp.where(frozen[:, None], u, u_new)
            z_new = jnp.where(frozen[:, None], z, z_new)
            if consts.has_bow or consts.has_hammer:
                v_rel = jnp.where(frozen, state[2], v_rel)
                F_H = jnp.where(frozen, state[3], F_H)
                u_H = jnp.where(frozen, state[4], u_H)
            res_u = jnp.max(jnp.abs(u - u_new), axis=-1)
            res_z = jnp.max(jnp.abs(z - z_new), axis=-1)
            # NaN-robust polarity: a diverged element (NaN residual) counts
            # as converged-and-frozen so it cannot drive the whole batch to
            # the iteration cap (the product path NaN-skips such samples).
            conv = jnp.logical_or(
                frozen,
                jnp.logical_not(
                    jnp.logical_or(res_u > tol_t, res_z > tol_l)
                ),
            )
            return u_new, z_new, v_rel, F_H, u_H, it + 1, conv

        def picard_cond(state):
            *_, it, conv = state
            return jnp.logical_or(
                it == 0,
                jnp.logical_and(
                    jnp.logical_not(jnp.all(conv)), it < consts.picard_max_iter
                ),
            )

        init = (
            carry.u1,
            carry.z1,
            zeros_b,
            zeros_b,
            zeros_b,
            jnp.array(0, jnp.int32),
            jnp.zeros(u1.shape[0], bool),
        )
        u, z, v_rel, F_H, u_H, n_iter, _ = jax.lax.while_loop(
            picard_cond, picard_body, init
        )

    # ---- readout (string.cpp:263-298) --------------------------------------
    rp = sp.pos
    if consts.surface_integral:
        w_out = 0.5 * h_t * (1.0 + h_mask + b_mask)
        u_out = jnp.sum(u - carry.u1, axis=-1) * w_out / k
        z_out = jnp.sum(z - carry.z1, axis=-1) * w_out / k
    else:
        u_i = (1.0 + jnp.floor(N_t * rp)).astype(jnp.int32)
        u_f = 1.0 + rp / h_t - (1.0 + jnp.floor(N_t * rp))
        z_i = (1.0 + jnp.floor(N_l * rp)).astype(jnp.int32)
        z_f = 1.0 + rp / h_l - (1.0 + jnp.floor(N_l * rp))
        take = lambda arr, i: jnp.take_along_axis(arr, i[:, None], axis=-1)[:, 0]
        u_out = (1.0 - u_f) * take(u, u_i) + u_f * take(u, jnp.clip(u_i + 1, 0, M_t - 1))
        z_out = (1.0 - z_f) * take(z, z_i) + z_f * take(z, jnp.clip(z_i + 1, 0, M_l - 1))

    new_carry = Carry(u1=u, u2=carry.u1, z1=z, z2=carry.z1, uH1=u_H, uH2=carry.uH1)
    out = {
        "uout": u_out,
        "zout": z_out,
        "v_r": v_rel,
        "F_H": F_H,
        "u_H": u_H,
        "sig0": sig0,
        "sig1": sig1,
        "n_iter": n_iter,
    }
    if consts.collect_state:
        out["u"] = u
        out["z"] = z
    return new_carry, out


@partial(jax.jit, static_argnames=("consts",))
def simulate_chunk(carry: Carry, steps, sp: StringParams, bp: BowParams,
                   hp: HammerParams, bow_mask, hammer_mask, consts: SimConsts):
    """Scan ``string_step`` over a chunk of global step indices.

    ``steps``: (T,) int32 global step indices (the reference iterates
    n = 2..Nt per chunk with global index n + n_0, simulator.cpp:40-45).
    Control signals are gathered per step from the full (B, Nt) arrays.
    """

    def body(c, n):
        xs = (
            sp.f0[:, n],
            bp.x_b[:, n],
            bp.v_b[:, n],
            bp.F_b[:, n],
            bp.wid[:, n],
            n,
        )
        return string_step(c, xs, sp, bp, hp, bow_mask, hammer_mask, consts)

    return jax.lax.scan(body, carry, steps)
