"""Fused Pallas TPU kernel for the string-FDTD time loop.

One ``pallas_call`` runs an entire chunk of audio-rate time steps with the
string state resident in VMEM scratch (persisting across the sequential TPU
grid), eliminating per-step kernel dispatch and HBM state traffic entirely —
the design target of BASELINE.json's north star.

Covers the full excitation set with trace-time gating (pluck runs pay
nothing for bow/hammer code): nonlinear u<->z coupling, hard-bow friction
(bow.cpp:10-41) and the nonlinear power-law hammer fixed point
(hammer.cpp:11-85) re-derived on the lane-vectorised layout.

Performance structure (v5e-tuned):
  * uniform 128-aligned lane width ``MP`` for both grids; all spatial
    operators are lane-rolls + masks;
  * the implicit solves are masked parallel cyclic reductions with per-level
    fill masks hoisted out of the time loop;
  * the excitation+coupling fixed point is ONE adaptive Gauss-Seidel loop
    (the engine's Picard + inner coupling sweeps merged; same fixed point,
    iterated to f32 machine precision) — Jacobi ordering diverges when the
    state slope makes the coupling strong;
  * cross-grid interpolation gathers decompose into single-vreg blocks
    (Mosaic dynamic_gather limit) with lo/hi stacked into one pass;
  * per-step scalar reads/writes use masked reduce/select (Mosaic forbids
    dynamic single-lane indexing); the space-time state is optionally
    streamed out via dynamic-major-index stores.

Validated in interpreter mode and on hardware against the XLA engine
(rounding-level agreement at early steps; later trajectory spread in the
high-alpha chaotic regime is Lyapunov amplification of f32 rounding).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN10_6 = float(6.0 * np.log(10.0))
M_HD_CLAMP = -0.01  # hammer displacement clamp (hammer.cpp:3)


def _shift(x, s):
    """Zero-fill shift along lanes; s > 0 moves values to higher indices."""
    if s == 0:
        return x
    M = x.shape[-1]
    rolled = pltpu.roll(x, s % M, axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    keep = idx >= s if s > 0 else idx < M + s
    return jnp.where(keep, rolled, 0.0)


def _blockgather(z, idx, MP):
    """out[b, i] = z[b, idx[b, i]] decomposed into 128-lane vreg blocks."""
    B = z.shape[0]
    nblk = MP // 128
    if nblk <= 1:
        return jnp.take_along_axis(z, idx, axis=1)
    out_blocks = []
    for ob in range(nblk):
        idx_b = idx[:, ob * 128 : (ob + 1) * 128]
        acc = jnp.zeros((B, 128), z.dtype)
        for sb in range(nblk):
            src = z[:, sb * 128 : (sb + 1) * 128]
            sel = (idx_b // 128) == sb
            g = jnp.take_along_axis(src, jnp.where(sel, idx_b - sb * 128, 0), axis=1)
            acc = acc + jnp.where(sel, g, 0.0)
        out_blocks.append(acc)
    return jnp.concatenate(out_blocks, axis=1)


class KernelConsts(NamedTuple):
    k: float
    theta_t: float
    lambda_c: float
    M_t: int
    M_l: int
    chunk: int
    coupling_iters: int
    surface_integral: bool
    collect_state: bool = False
    has_bow: bool = False
    has_hammer: bool = False
    relative_error: float = 4.0
    hammer_max_iter: int = 40
    manufactured: bool = False  # MMS forcing (vnv.cpp:11-37)
    mms_centered: bool = False  # aligned with core.engine.SimConsts default
    coupling_fixed: int = 0  # > 0: static unrolled sweeps, no adaptive exit
    # In-kernel GMRES(m) exact-coupling rescue for elements whose damped
    # Gauss-Seidel sweeps diverge (strong alpha^2 coupling).  False restores
    # the poison-only behavior (NaN -> host f64 rescue).
    gmres_rescue: bool = True
    gmres_m: int = 16  # Krylov restart size (basis lives in VMEM scratch)
    # Semantic transverse allocation size for the z live-row count: the
    # reference couples the longitudinal update-row count to the BATCH
    # allocation (z rows = N_t + N_l + 2 - M_t_alloc, string.cpp), so a
    # bucketed sub-batch running on a smaller padded width must still use
    # the ORIGINAL caller's M_t here to stay bit-compatible.  None -> M_t.
    M_t_sem: int | None = None


# backwards-compatible alias
PluckKernelConsts = KernelConsts


def _kernel(consts: KernelConsts, *refs):
    i = 0

    def nxt():
        nonlocal i
        r = refs[i]
        i += 1
        return r

    f0_ref = nxt()
    kappa_ref = nxt()
    alpha_ref = nxt()
    pos_ref = nxt()
    t60_ref = nxt()
    if consts.manufactured:
        pa_ref = nxt()
    u1_in = nxt()
    u2_in = nxt()
    z1_in = nxt()
    z2_in = nxt()
    if consts.has_bow:
        xb_ref = nxt()
        vb_ref = nxt()
        Fb_ref = nxt()
        wid_ref = nxt()
        phi0_ref = nxt()
        phi1_ref = nxt()
        bmask_ref = nxt()
    if consts.has_hammer:
        xH_ref = nxt()
        wH_ref = nxt()
        Mr_ref = nxt()
        aH_ref = nxt()
        hmask_ref = nxt()
    if consts.has_bow or consts.has_hammer:
        uH1_in = nxt()
        uH2_in = nxt()

    uout_ref = nxt()
    zout_ref = nxt()
    u1_out = nxt()
    u2_out = nxt()
    z1_out = nxt()
    z2_out = nxt()
    has_exc = consts.has_bow or consts.has_hammer
    if has_exc:
        vr_ref = nxt()
        FH_ref = nxt()
        uH_ref = nxt()
    if consts.collect_state:
        su_ref = nxt()
        sz_ref = nxt()

    u1s = nxt()
    u2s = nxt()
    z1s = nxt()
    z2s = nxt()
    uacc = nxt()
    zacc = nxt()
    if has_exc:
        vracc = nxt()
        FHacc = nxt()
        uHacc = nxt()
        uHs = nxt()  # (B, 128): cols 0/1 hold uH1/uH2
    if consts.gmres_rescue and consts.coupling_fixed == 0:
        V_ref = nxt()  # (m+1, B, MP) Krylov basis for the coupling rescue

    k = consts.k
    theta = consts.theta_t
    M_t, M_l = consts.M_t, consts.M_l
    MP = ((max(M_t, M_l) + 127) // 128) * 128
    levels = max(1, math.ceil(math.log2(MP)))
    ci = pl.program_id(1)  # time-chunk index (minor grid axis)
    B = u1_in.shape[0]
    dt = u1_in.dtype

    def _pad(x, M_live):
        if M_live == MP:
            return x
        return jnp.concatenate([x, jnp.zeros((B, MP - M_live), dt)], axis=1)

    @pl.when(ci == 0)
    def _():
        u1s[:] = _pad(u1_in[:], M_t)
        u2s[:] = _pad(u2_in[:], M_t)
        z1s[:] = _pad(z1_in[:], M_l)
        z2s[:] = _pad(z2_in[:], M_l)

    if has_exc:

        @pl.when(ci == 0)
        def _():
            cols = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
            uHs[:] = jnp.where(
                cols == 0, uH1_in[:], jnp.where(cols == 1, uH2_in[:], 0.0)
            )

    kappa = kappa_ref[:]  # (B, 1)
    alpha = alpha_ref[:]
    pos = pos_ref[:]
    t60 = t60_ref[:]  # (B, 4)
    it = jax.lax.broadcasted_iota(jnp.int32, (B, MP), 1)
    itf = it.astype(dt)
    it_T = jax.lax.broadcasted_iota(jnp.int32, (B, consts.chunk), 1)
    it_S = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)

    def pcr(sub, diag, sup, rhs):
        """Masked parallel cyclic reduction, normalized form.

        Rows are pre-normalized to unit diagonal; each level then needs only
        6 lane-rolls and one reciprocal (vs 8 rolls + 2 divides for the
        textbook form).  Padded rows are identity (a=c=0, d=0), so
        zero-filled shifts model out-of-range neighbours exactly.
        """
        rb = 1.0 / diag
        a, c, d = sub * rb, sup * rb, rhs * rb
        s = 1
        for _ in range(levels):
            a_m, a_p = _shift(a, s), _shift(a, -s)
            c_m, c_p = _shift(c, s), _shift(c, -s)
            d_m, d_p = _shift(d, s), _shift(d, -s)
            rD = 1.0 / (1.0 - a * c_m - c * a_p)
            a, c, d = (
                -(a * a_m) * rD,
                -(c * c_p) * rD,
                (d - a * d_m - c * d_p) * rD,
            )
            s *= 2
        return d

    def _col(ref, t):
        """Masked read of time column t from a (B, chunk) VMEM block."""
        return jnp.sum(jnp.where(it_T == t, ref[:], 0.0), axis=1, keepdims=True)

    def step(t, _):
        sel_T = it_T == t
        f0 = _col(f0_ref, t)
        gamma = 2.0 * f0
        K = kappa * gamma
        two_t = 2.0 * theta - 1.0
        h_1 = consts.lambda_c * jnp.sqrt(
            (gamma**2 * k**2
             + jnp.sqrt(gamma**4 * k**4 + 16.0 * K**2 * k**2 * two_t))
            / (2.0 * two_t)
        )
        N_t = jnp.floor(1.0 / h_1)
        h_t = 1.0 / N_t
        h_2 = consts.lambda_c * gamma * alpha * k
        N_l = jnp.floor(1.0 / h_2)
        h_l = 1.0 / N_l
        n_t = N_t + 1.0
        n_l = N_l + 1.0

        # T60 -> sigma (string.cpp:96-120)
        freq1, time1, freq2, time2 = (
            t60[:, 0][:, None], t60[:, 1][:, None],
            t60[:, 2][:, None], t60[:, 3][:, None],
        )
        stiff = K > 0
        g2 = jnp.where(gamma != 0.0, gamma, 1.0) ** 2
        zeta1 = jnp.where(
            stiff,
            -(gamma**2) + jnp.sqrt(gamma**4 + 4 * K**2 * (2 * np.pi * freq1) ** 2),
            freq1**2 / g2,
        )
        zeta2 = jnp.where(
            stiff,
            -(gamma**2) + jnp.sqrt(gamma**4 + 4 * K**2 * (2 * np.pi * freq2) ** 2),
            freq2**2 / g2,
        )
        lossy = (freq1 * time1 * freq2 * time2) != 0.0
        st1 = jnp.where(time1 != 0.0, time1, 1.0)
        st2 = jnp.where(time2 != 0.0, time2, 1.0)
        sig0 = jnp.where(lossy, -zeta2 / st1 + zeta1 / st2, lossy.astype(dt))
        sig1 = jnp.where(lossy, 1.0 / st1 - 1.0 / st2, lossy.astype(dt))
        scale = LN10_6 / (zeta1 - zeta2)
        sig0 = scale * sig0
        sig1 = scale * sig1
        tol_t = h_t**consts.relative_error

        live_t = (itf < n_t).astype(dt)
        live_l = (itf < n_l).astype(dt)
        u1 = u1s[:] * live_t
        u2 = u2s[:] * live_t
        z1 = z1s[:] * live_l
        z2 = z2s[:] * live_l

        gamma_k = gamma**2 * k**2
        phi_pow = gamma_k * (alpha**2 - 1.0) / 4.0
        lam = (u1 - _shift(u1, 1)) / h_t
        lam2 = lam * lam

        # interp index sets for both directions (shared by all gathers)
        def interp_idx(n_in, n_out):
            denom = jnp.maximum(n_out - 1.0, 1.0)
            posn = jnp.clip(itf * (n_in - 1.0) / denom, 0.0, n_in - 1.0)
            lo = jnp.floor(posn)
            frac = posn - lo
            lo_i = jnp.clip(lo.astype(jnp.int32), 0, MP - 1)
            hi_i = jnp.minimum(lo_i + 1, jnp.maximum(n_in.astype(jnp.int32) - 1, 0))
            return lo_i, hi_i, frac, (itf < n_out).astype(dt)

        lt = interp_idx(n_l, n_t)  # z (l-grid) -> t-grid
        tl = interp_idx(n_t, n_l)  # u-derived (t-grid) -> l-grid

        def interp_pair(srcs_lt, srcs_tl):
            srcs = srcs_lt + srcs_tl
            n = len(srcs)
            Z = jnp.concatenate(srcs + srcs, axis=0)
            I = jnp.concatenate(
                [lt[0]] * len(srcs_lt) + [tl[0]] * len(srcs_tl)
                + [lt[1]] * len(srcs_lt) + [tl[1]] * len(srcs_tl),
                axis=0,
            )
            G = _blockgather(Z, I, MP)
            outs = []
            for j in range(n):
                lo_g = G[j * B : (j + 1) * B]
                hi_g = G[(n + j) * B : (n + j + 1) * B]
                d = lt if j < len(srcs_lt) else tl
                outs.append((lo_g * (1.0 - d[2]) + hi_g * d[2]) * d[3])
            return outs

        def dxx(x, h):
            return (_shift(x, -1) - 2.0 * x + _shift(x, 1)) / (h * h)

        def dxf(x, h):
            return (_shift(x, -1) - x) / h

        def dxb(x, h):
            return (x - _shift(x, 1)) / h

        def theta_op(x):
            return theta * x + (1.0 - theta) * 0.5 * (_shift(x, -1) + _shift(x, 1))

        def dxxxx_cl(x, h):
            pent = (_shift(x, -2) - 4.0 * _shift(x, -1) + 6.0 * x
                    - 4.0 * _shift(x, 1) + _shift(x, 2))
            corr = jnp.where((it == 1) | (itf == (n_t - 2.0)), x, 0.0)
            return (pent + corr) / (h**4)

        def K_tl_from(w):
            return -phi_pow * dxf(lam * dxb(w, h_t), h_t)

        def K_lt_from(w):
            return -phi_pow * dxf(w, h_l)

        # ---- LHS tridiagonals ---------------------------------------------
        a_t = (1.0 - theta) / 2.0 - 2.0 * sig1 * k / (h_t * h_t)
        b_t = theta + 2.0 * sig0 * k + 4.0 * sig1 * k / (h_t * h_t)
        d_next = _shift(lam2, -1)
        sub_t = jnp.where((it >= 1) & (itf < n_t),
                          a_t - phi_pow * lam2 / (h_t * h_t), 0.0)
        diag_t = jnp.where(itf < n_t,
                           b_t + phi_pow * (lam2 + d_next) / (h_t * h_t), 1.0)
        sup_t = jnp.where(itf < (n_t - 1.0),
                          a_t - phi_pow * d_next / (h_t * h_t), 0.0)
        a_l = -2.0 * sig1 * k / (h_l * h_l)
        b_l = 1.0 + 2.0 * sig0 * k + 4.0 * sig1 * k / (h_l * h_l)
        sub_l = jnp.where((it >= 1) & (itf < n_l), a_l, 0.0)
        diag_l = jnp.where(itf < n_l, b_l, 1.0)
        sup_l = jnp.where(itf < (n_l - 1.0), a_l, 0.0)

        # ---- RHS (B w1 + C w2), one stacked gather pass --------------------
        lamdxb_u2 = lam * dxb(u2, h_t)
        iz1, iz2, iu2 = interp_pair([z1, z2], [lamdxb_u2])

        K2k2 = K**2 * k**2
        V_u2 = -phi_pow * (
            lam2 * _shift(u2, 1) - (lam2 + d_next) * u2 + d_next * _shift(u2, -1)
        ) / (h_t * h_t)
        B1u1 = (-2.0 * theta_op(u1) - gamma_k * dxx(u1, h_t)
                + K2k2 * dxxxx_cl(u1, h_t))
        C1u2 = (theta_op(u2) - 2.0 * sig0 * k * u2
                + 2.0 * sig1 * k * dxx(u2, h_t) + V_u2)
        rhs_u0 = B1u1 + C1u2 + 2.0 * K_tl_from(iz1) + K_tl_from(iz2)
        B4z1 = -2.0 * z1 - gamma_k * alpha**2 * dxx(z1, h_l)
        C4z2 = (1.0 - 2.0 * sig0 * k) * z2 + 2.0 * sig1 * k * dxx(z2, h_l)
        rhs_z = B4z1 + C4z2 + K_lt_from(iu2)
        if consts.manufactured:
            # manufactured-solution forcing (vnv.cpp:11-37; engine
            # ``mms_forcing``): sigma==sig0, omega==gamma, mu==pi
            p_a_m = pa_ref[:]
            mu = np.pi
            n_glob = (ci * consts.chunk + t + 2).astype(dt)
            t_now = (n_glob - (1.0 if consts.mms_centered else 0.0)) * k

            def _mms(x):
                c1 = (sig0**2 - gamma**2 - 2.0 * sig0 * sig0) * jnp.cos(mu * x) ** 2
                c2 = (2.0 * mu**2 * (4.0 * K**2 * mu**2 + gamma**2)) * jnp.cos(
                    2.0 * mu * x
                )
                return (
                    p_a_m * (c1 + c2) * jnp.cos(gamma * t_now)
                    * jnp.exp(-sig0 * t_now)
                )

            x_u = (jnp.clip(2.0 * itf / N_t, 0.0, 2.0) - 1.0) / 2.0
            rhs_u0 = rhs_u0 - _mms(x_u) * k**2
            rhs_z = rhs_z - _mms(jnp.full((B, MP), 0.5, dt)) * k**2
        M_t_sem = M_t if consts.M_t_sem is None else consts.M_t_sem
        z_keep = jnp.clip(N_t + N_l + 2.0 - M_t_sem, 0.0, n_l)
        rhs_z = rhs_z * (itf < z_keep).astype(dt)

        # ---- excitation profiles (iterate-independent parts) ---------------
        if consts.has_bow:
            x_b = _col(xb_ref, t)
            v_b = _col(vb_ref, t)
            F_b = _col(Fb_ref, t)
            wid_b = _col(wid_ref, t) * h_t
            # raised cosine over the first M_t lanes (bow.cpp:32, misc.cpp:20)
            xax = (itf + 1.0) / M_t
            nmin1 = N_t - 1.0
            ctr = x_b * nmin1 / M_t
            wd = wid_b * nmin1 / M_t
            ind = jnp.sign(
                jnp.maximum(-(xax - ctr - wd / 2.0) * (xax - ctr + wd / 2.0), 0.0)
            )
            rc = 0.5 * ind * (1.0 + jnp.cos(2.0 * np.pi * (xax - ctr) / wd))
            rc = rc * (it < M_t)
            rc = rc / jnp.sum(jnp.abs(rc), axis=1, keepdims=True)
            phi0 = phi0_ref[:]
            phi1 = phi1_ref[:]
            bmask = bmask_ref[:]
        if consts.has_hammer:
            x_H = xH_ref[:]
            w_H = wH_ref[:] / consts.lambda_c
            M_r = Mr_ref[:] / consts.lambda_c
            a_H = aH_ref[:]
            hmask = hmask_ref[:]
            eps_prof = (itf == jnp.floor(x_H * (N_t - 1.0))).astype(dt)
            uH1 = jnp.sum(jnp.where(it_S == 0, uHs[:], 0.0), axis=1, keepdims=True)
            uH2 = jnp.sum(jnp.where(it_S == 1, uHs[:], 0.0), axis=1, keepdims=True)
            eta_1 = uH1 - jnp.sum(eps_prof * u1, axis=1, keepdims=True)
            eta_2 = uH2 - jnp.sum(eps_prof * u2, axis=1, keepdims=True)

        inner_eps = 100.0 * float(jnp.finfo(dt).eps)
        zcol = jnp.zeros((B, 1), dt)

        def exc_rhs(u_c, first, F_H, u_H, v_rel):
            """Excitation RHS terms linearized at iterate ``u_c``.

            ``first`` selects the first-Picard-iterate bow probe
            (u1-u2)/k (bow.cpp:36-38).  Shared by the Gauss-Seidel sweep
            loop and the in-kernel GMRES rescue branch.
            """
            rhs_u = rhs_u0
            if consts.has_bow:
                # bow.cpp:17-41
                du = jnp.where(first, u1 - u2, u_c - u1)
                v_rel = jnp.sum(rc * (du / k - v_b), axis=1, keepdims=True)
                phi = jnp.sign(v_rel) * (
                    phi1 + (1.0 - phi1) * jnp.exp(-phi0 * jnp.abs(v_rel))
                )
                G_B = -(k**2) * (rc / h_t) * (F_b * phi)
                rhs_u = rhs_u + bmask * jnp.nan_to_num(G_B)
            if consts.has_hammer:
                # hammer.cpp:11-85 inner fixed point on (B, 1) scalars
                eps_u = jnp.sum(eps_prof * u_c, axis=1, keepdims=True)

                def h_body(hs):
                    _, _, eta_est, res, it_h = hs
                    eta = eta_est
                    f_H = (
                        jnp.power(w_H, 1.0 + a_H)
                        * jnp.power(jnp.maximum(eta_1, 0.0), a_H - 1.0)
                        * (eta + eta_2) / 2.0
                    )
                    F_Hn = jnp.where(eta_1 > 0, f_H, 0.0)
                    u_Hn = 2.0 * uH1 - uH2 - k**2 * F_Hn
                    u_Hn = jnp.maximum(u_Hn - M_HD_CLAMP, 0.0) + M_HD_CLAMP
                    eta_new = (u_Hn - eps_u) * hmask
                    return F_Hn, u_Hn, eta_new, jnp.abs(eta - eta_new), it_h + 1

                def h_cond(hs):
                    *_, res, it_h = hs
                    return jnp.logical_or(
                        it_h == 0,
                        jnp.logical_and(
                            jnp.any(res > tol_t),
                            it_h < consts.hammer_max_iter,
                        ),
                    )

                F_H, u_H, _, _, _ = jax.lax.while_loop(
                    h_cond, h_body,
                    (zcol, zcol, eta_1 * hmask, zcol, jnp.array(0, jnp.int32)),
                )
                G_H = -(k**2) * eps_prof * (M_r * F_H)
                rhs_u = rhs_u + hmask * jnp.nan_to_num(G_H)
            return rhs_u * live_t, F_H, u_H, v_rel

        def sweep_body(carry_s, iz_pre=None):
            (u_c, z_c, _, F_H, u_H, v_rel, it_c, omega, prev_delta,
             hopeless_c) = carry_s
            rhs_u, F_H, u_H, v_rel = exc_rhs(u_c, it_c == 0, F_H, u_H, v_rel)

            if iz_pre is None:
                (iz,) = interp_pair([z_c], [])
            else:  # first unrolled sweep: z_c == z1, already gathered
                iz = iz_pre
            u_g = pcr(sub_t, diag_t, sup_t, -rhs_u - K_tl_from(iz))
            (iu,) = interp_pair([], [lam * dxb(u_g, h_t)])
            z_g = pcr(sub_l, diag_l, sup_l, -rhs_z - K_lt_from(iu))
            if consts.coupling_fixed > 0:
                return (u_g, z_g, jnp.array(False), F_H, u_H, v_rel,
                        it_c + 1, omega, prev_delta, hopeless_c)
            # Adaptive under-relaxation (engine coupled_solve twin): plain
            # block Gauss-Seidel diverges when the phi_pow ~ alpha^2
            # coupling pushes its spectral radius past 1 — the reference's
            # joint dense inverse (string.cpp:173-175) has no such limit.
            # Damping u' = u + w(GS(u) - u) keeps the same fixed point and
            # converges for w < 2/(1 - lambda_min); w backs off per element
            # whenever its (undamped) GS displacement grows.
            u_c2 = u_c + omega * (u_g - u_c)
            z_c2 = z_c + omega * (z_g - z_c)
            delta_b = (
                jnp.max(jnp.abs(u_g - u_c), axis=1, keepdims=True)
                + jnp.max(jnp.abs(z_g - z_c), axis=1, keepdims=True)
            )
            grew = delta_b > prev_delta
            hopeless = jnp.logical_and(grew, omega <= 0.0625)
            omega = jnp.where(grew, jnp.maximum(omega * 0.5, 0.0625), omega)
            # Per-element convergence, decided in the body so the while cond
            # is scalar-only.  NaN-robust by construction: a diverged batch
            # element compares False in ``delta > tol`` and reads as done —
            # it must neither starve healthy elements of sweeps nor drive
            # the whole batch to the iteration cap.  An element whose
            # relaxation factor sits at the floor with a still-growing
            # residual cannot converge (it will go NaN and be f64-rescued);
            # exclude it too instead of burning the sweep cap every step.
            scale_b = jnp.max(jnp.abs(u_c2), axis=1, keepdims=True) + inner_eps
            live_err = jnp.logical_and(
                delta_b > inner_eps * scale_b, jnp.logical_not(hopeless)
            )
            done = jnp.logical_not(jnp.any(live_err))
            return (u_c2, z_c2, done, F_H, u_H, v_rel, it_c + 1, omega,
                    delta_b, jnp.where(hopeless, 1.0, 0.0).astype(dt))

        def sweep_cond(carry_s):
            done, it_c = carry_s[2], carry_s[6]
            return jnp.logical_and(
                jnp.logical_not(done),
                it_c < consts.coupling_iters,
            )

        init_s = (u1, z1, jnp.array(False), zcol, zcol, zcol,
                  jnp.array(0, jnp.int32), jnp.ones((B, 1), dt),
                  jnp.full((B, 1), jnp.inf, dt), jnp.zeros((B, 1), dt))
        if consts.coupling_fixed > 0:
            # Static unrolled Gauss-Seidel (engine ``coupling_fixed_iters``
            # twin, engine.py:320-327): no per-sweep reductions or scalar
            # round-trips — the fastest schedule when the sweep count is
            # known for the workload's coupling strength.
            carry_s = init_s
            for j in range(consts.coupling_fixed):
                carry_s = sweep_body(carry_s, iz_pre=iz1 if j == 0 else None)
            u_n, z_n, _, F_H, u_H, v_rel = carry_s[:6]
        else:
            # sweep 1 hoisted out of the loop: it reuses the RHS pass's z
            # interpolation (one fewer blockgather per step) and the loop
            # then runs only if that sweep did not already converge — the
            # common pluck case
            first_s = sweep_body(init_s, iz_pre=iz1)
            fin_s = jax.lax.while_loop(sweep_cond, sweep_body, first_s)
            u_n, z_n, _, F_H, u_H, v_rel = fin_s[:6]
            # ---- in-kernel GMRES rescue (f32 stability at strong coupling)
            # Elements whose damped Gauss-Seidel exit is untrustworthy:
            #   * hopeless: residual growing at the relaxation floor,
            #   * non-finite: diverged to NaN/inf inside the sweep loop,
            #   * unconverged: exited at the sweep cap above tolerance.
            # For those, solve the coupled system exactly with GMRES(m) on
            # the z-space fixed point (I - G) z = c, where G z is one
            # rhs-free GS sweep (so the matvec reuses the tridiagonal PCR
            # solves + cross-grid interpolation).  This matches the
            # reference's exact joint dense solve (string.cpp:173-175),
            # which has no coupling-strength limit, without paying dense
            # algebra: GMRES is a polynomial in G and converges even when
            # the GS spectral radius exceeds 1.  The branch is guarded by a
            # scalar any() so clean batches pay one reduction only.
            delta_f, hope_f = fin_s[8], fin_s[9]
            scale_f = jnp.max(jnp.abs(u_n), axis=1, keepdims=True) + inner_eps
            finite_f = delta_f < jnp.inf
            bad = jnp.logical_or(
                jnp.logical_or(hope_f > 0.0, jnp.logical_not(finite_f)),
                delta_f > inner_eps * scale_f,
            )
            if not consts.gmres_rescue:
                # poison-only mode (the production first pass): EVERY
                # untrustworthy exit goes NaN — hopeless, non-finite, or
                # above tolerance at the sweep cap — so the host
                # orchestration re-runs the batch through the GMRES-enabled
                # kernel variant (tasks/simulate.run rescue ladder).
                # Compiling the GMRES branch out of the common path restores
                # ~2x step throughput (the lax.cond body costs even when
                # never taken).
                u_n = jnp.where(bad, jnp.nan, u_n)
            zmat = jnp.zeros((B, MP), dt)
            tiny = float(np.finfo(np.float32).tiny) ** 0.5  # ~1e-19

            def _sdiv(a, b):
                """a / b with ~0 denominators mapped to 0 (happy breakdown)."""
                return jnp.where(jnp.abs(b) > tiny, a / jnp.where(b == 0.0, 1.0, b), 0.0)

            def lin_sweep_z(z_c, rhs_u_s, rhs_z_s):
                (iz,) = interp_pair([z_c], [])
                u_g = pcr(sub_t, diag_t, sup_t, -rhs_u_s - K_tl_from(iz))
                (iu,) = interp_pair([], [lam * dxb(u_g, h_t)])
                z_g = pcr(sub_l, diag_l, sup_l, -rhs_z_s - K_lt_from(iu))
                return u_g, z_g

            def gmres_fp(cvec, m):
                """Loop-based batched GMRES(m) for (I - G) z = c, x0 = 0.

                One matvec per while-iteration with the Krylov basis in
                VMEM scratch (dynamic-major ``pl.ds`` indexing) and the
                Arnoldi/Givens recurrences as masked lane updates on
                (B, 128)/(B, 256) vregs — Mosaic code size is independent
                of ``m`` (the earlier fully-unrolled form made hardware
                compiles take tens of minutes at production shapes) and
                converged elements exit on the running residual.
                Returns (z, relative_residual).
                """
                assert m * m <= 256 and m + 1 <= 128
                mm = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
                rr = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)
                z128 = jnp.zeros((B, 128), dt)

                def sel(a, idx):
                    return jnp.sum(jnp.where(mm == idx, a, 0.0), axis=1,
                                   keepdims=True)

                def put(a, idx, val):
                    return jnp.where(mm == idx, val, a)

                beta = jnp.sqrt(jnp.sum(cvec * cvec, axis=1, keepdims=True))
                V_ref[pl.ds(0, 1)] = (
                    cvec * _sdiv(jnp.ones_like(beta), beta)
                )[None]
                g0 = put(z128, 0, beta)

                def body(carry):
                    i, g, cs, sn, R, _ = carry
                    vi = V_ref[pl.ds(i, 1)][0]
                    _, gz = lin_sweep_z(vi, zmat, zmat)

                    def mgs(j, wh):
                        w, hcol = wh
                        vj = V_ref[pl.ds(j, 1)][0]
                        hij = jnp.sum(w * vj, axis=1, keepdims=True)
                        return (w - hij * vj, put(hcol, j, hij))

                    w, hcol = jax.lax.fori_loop(
                        0, i + 1, mgs, (vi - gz, z128))
                    hlast = jnp.sqrt(jnp.sum(w * w, axis=1, keepdims=True))
                    V_ref[pl.ds(i + 1, 1)] = (
                        w * _sdiv(jnp.ones_like(hlast), hlast)
                    )[None]

                    def rot(j, hc):
                        hj, hj1 = sel(hc, j), sel(hc, j + 1)
                        cj, sj = sel(cs, j), sel(sn, j)
                        hc = put(hc, j, cj * hj + sj * hj1)
                        return put(hc, j + 1, -sj * hj + cj * hj1)

                    hcol = jax.lax.fori_loop(0, i, rot, hcol)
                    hi = sel(hcol, i)
                    den = jnp.sqrt(hi * hi + hlast * hlast)
                    ci_, si_ = _sdiv(hi, den), _sdiv(hlast, den)
                    cs = put(cs, i, ci_)
                    sn = put(sn, i, si_)
                    hcol = put(hcol, i, den)

                    def stor(j, Rc):
                        return jnp.where(rr == i * m + j, sel(hcol, j), Rc)

                    R = jax.lax.fori_loop(0, i + 1, stor, R)
                    gi = sel(g, i)
                    g = put(g, i, ci_ * gi)
                    g = put(g, i + 1, -si_ * gi)
                    return (i + 1, g, cs, sn, R,
                            jnp.abs(sel(g, i + 1)))

                def cond(carry):
                    i = carry[0]
                    res = carry[5]
                    return jnp.logical_and(
                        i < m, jnp.any(res > 1e-6 * beta))

                it_n, g, cs, sn, R, res = jax.lax.while_loop(
                    cond, body,
                    (jnp.array(0, jnp.int32), g0, z128, z128,
                     jnp.zeros((B, 256), dt), beta),
                )

                def selR(idx):
                    return jnp.sum(jnp.where(rr == idx, R, 0.0), axis=1,
                                   keepdims=True)

                # back substitution on the rotated system R y = g
                def bs(tt, y):
                    i2 = it_n - 1 - tt

                    def acc(j, s):
                        valid = jnp.logical_and(j > i2, j < it_n)
                        return s - jnp.where(
                            valid, selR(j * m + i2) * sel(y, j), 0.0)

                    s = jax.lax.fori_loop(0, m, acc, sel(g, i2))
                    return put(y, i2, _sdiv(s, selR(i2 * m + i2)))

                y = jax.lax.fori_loop(0, it_n, bs, z128)

                def zc(i2, z):
                    return z + sel(y, i2) * V_ref[pl.ds(i2, 1)][0]

                z = jax.lax.fori_loop(0, it_n, zc, zmat)
                return z, _sdiv(res, beta)

            def _rescue(args):
                u_gs, z_gs, F_gs, uH_gs, vr_gs = args
                npass = 2 if (consts.has_bow or consts.has_hammer) else 1
                u_lin = u1
                F_r, uH_r, vr_r = zcol, zcol, zcol
                for p in range(npass):
                    rhs_u_p, F_r, uH_r, vr_r = exc_rhs(
                        u_lin, jnp.asarray(p == 0), F_r, uH_r, vr_r
                    )
                    _, cvec = lin_sweep_z(zmat, rhs_u_p, rhs_z)
                    z_sol, relres = gmres_fp(cvec, consts.gmres_m)
                    (izs,) = interp_pair([z_sol], [])
                    u_sol = pcr(sub_t, diag_t, sup_t,
                                -rhs_u_p - K_tl_from(izs))
                    u_lin = u_sol
                # Accept the exact solve if its Krylov residual is small;
                # otherwise poison with NaN so the host-side f64 rescue /
                # skip machinery (tasks/simulate.py) keeps its contract.
                ok = relres <= 1e-3
                u_fix = jnp.where(ok, u_sol, jnp.nan)
                return (
                    jnp.where(bad, u_fix, u_gs),
                    jnp.where(bad, z_sol, z_gs),
                    jnp.where(bad, F_r, F_gs),
                    jnp.where(bad, uH_r, uH_gs),
                    jnp.where(bad, vr_r, vr_gs),
                )

            if consts.gmres_rescue:
                u_n, z_n, F_H, u_H, v_rel = jax.lax.cond(
                    jnp.any(bad), _rescue, lambda args: args,
                    (u_n, z_n, F_H, u_H, v_rel),
                )
        u_n = u_n * live_t * (it != 0) * (itf != N_t)
        z_n = z_n * live_l * (it != 0) * (itf != N_l)

        # ---- readout (string.cpp:263-298) ----------------------------------
        h_w = hmask if consts.has_hammer else 0.0
        b_w = bmask if consts.has_bow else 0.0
        if consts.surface_integral:
            w_out = 0.5 * h_t * (1.0 + h_w + b_w)
            u_out = jnp.sum(u_n - u1s[:], axis=-1, keepdims=True) * w_out / k
            z_out = jnp.sum(z_n - z1s[:], axis=-1, keepdims=True) * w_out / k
        else:
            u_ri = 1.0 + jnp.floor(N_t * pos)
            u_rf = 1.0 + pos / h_t - u_ri
            z_ri = 1.0 + jnp.floor(N_l * pos)
            z_rf = 1.0 + pos / h_l - z_ri
            su = (itf == u_ri).astype(dt)
            su1 = (itf == u_ri + 1.0).astype(dt)
            sz = (itf == z_ri).astype(dt)
            sz1 = (itf == z_ri + 1.0).astype(dt)
            u_out = ((1.0 - u_rf) * jnp.sum(su * u_n, -1, keepdims=True)
                     + u_rf * jnp.sum(su1 * u_n, -1, keepdims=True))
            z_out = ((1.0 - z_rf) * jnp.sum(sz * z_n, -1, keepdims=True)
                     + z_rf * jnp.sum(sz1 * z_n, -1, keepdims=True))

        uacc[:] = jnp.where(sel_T, u_out, uacc[:])
        zacc[:] = jnp.where(sel_T, z_out, zacc[:])
        if has_exc:
            if not consts.has_hammer:
                # free ballistic hammer displacement (engine fast path)
                uH1 = jnp.sum(jnp.where(it_S == 0, uHs[:], 0.0), axis=1, keepdims=True)
                uH2 = jnp.sum(jnp.where(it_S == 1, uHs[:], 0.0), axis=1, keepdims=True)
                u_H = jnp.maximum(2.0 * uH1 - uH2 - M_HD_CLAMP, 0.0) + M_HD_CLAMP
            vracc[:] = jnp.where(sel_T, v_rel, vracc[:])
            FHacc[:] = jnp.where(sel_T, F_H, FHacc[:])
            uHacc[:] = jnp.where(sel_T, u_H, uHacc[:])
            uHs[:] = jnp.where(
                it_S == 0, u_H, jnp.where(it_S == 1, uH1, uHs[:])
            )
        if consts.collect_state:
            su_ref[pl.ds(t, 1)] = u_n[None]
            sz_ref[pl.ds(t, 1)] = z_n[None]
        u2s[:] = u1s[:]
        u1s[:] = u_n
        z2s[:] = z1s[:]
        z1s[:] = z_n
        return 0

    jax.lax.fori_loop(0, consts.chunk, step, 0)

    uout_ref[:] = uacc[:]
    zout_ref[:] = zacc[:]
    if has_exc:
        vr_ref[:] = vracc[:]
        FH_ref[:] = FHacc[:]
        uH_ref[:] = uHacc[:]
    u1_out[:] = u1s[:, :M_t]
    u2_out[:] = u2s[:, :M_t]
    z1_out[:] = z1s[:, :M_l]
    z2_out[:] = z2s[:, :M_l]


def string_chunked(f0, kappa, alpha, pos, t60, u1, u2, z1, z2, *,
                   k, theta_t, lambda_c, M_t, M_l, chunk=512,
                   coupling_iters=24, surface_integral=False, interpret=False,
                   batch_block=64, collect_state=False,
                   bow=None, hammer=None, relative_error=4.0,
                   manufactured=False, mms_centered=False, p_a=None,
                   coupling_fixed=0, gmres_rescue=True, gmres_m=16,
                   M_t_sem=None):
    """Run the fused string kernel over a full (B, T) control signal.

    ``bow`` (optional): dict with x_b/v_b/F_b/wid (B, T) and phi_0/phi_1/
    mask (B,).  ``hammer`` (optional): dict with x_H/w_H/M_r/alpha/mask (B,)
    and uH1/uH2 (B,) initial displacements.

    Returns ``(uout (B, T), zout (B, T), aux)`` where ``aux`` is a dict with
    the final carry, optional v_r/F_H/u_H (B, T) traces and optional
    state_u/state_z (T, B, M) fields.  ``T`` must be a multiple of ``chunk``.
    """
    B, T = f0.shape
    assert T % chunk == 0, (T, chunk)
    n_chunks = T // chunk
    BB = min(batch_block, B)
    while B % BB:
        BB -= 1
    n_bb = B // BB
    MP = ((max(M_t, M_l) + 127) // 128) * 128
    has_bow = bow is not None
    has_hammer = hammer is not None
    has_exc = has_bow or has_hammer
    consts = KernelConsts(
        k=float(k), theta_t=float(theta_t), lambda_c=float(lambda_c),
        M_t=M_t, M_l=M_l, chunk=chunk, coupling_iters=coupling_iters,
        surface_integral=surface_integral, collect_state=collect_state,
        has_bow=has_bow, has_hammer=has_hammer,
        relative_error=float(relative_error),
        manufactured=bool(manufactured), mms_centered=bool(mms_centered),
        coupling_fixed=int(coupling_fixed), gmres_rescue=bool(gmres_rescue),
        gmres_m=int(gmres_m),
        M_t_sem=None if M_t_sem is None else int(M_t_sem),
    )
    t60_flat = jnp.stack(
        [t60[:, 0, 0], t60[:, 0, 1], t60[:, 1, 0], t60[:, 1, 1]], axis=1
    )
    dtype = f0.dtype
    kernel = functools.partial(_kernel, consts)

    bbspec = lambda w: pl.BlockSpec((BB, w), lambda b, i: (b, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((BB, chunk), lambda b, i: (b, i), memory_space=pltpu.VMEM)

    inputs = [
        f0, kappa[:, None], alpha[:, None], pos[:, None], t60_flat,
    ]
    in_specs = [tspec, bbspec(1), bbspec(1), bbspec(1), bbspec(4)]
    if manufactured:
        assert p_a is not None, "MMS forcing needs the p_a amplitude"
        inputs += [p_a[:, None]]
        in_specs += [bbspec(1)]
    inputs += [u1, u2, z1, z2]
    in_specs += [bbspec(M_t), bbspec(M_t), bbspec(M_l), bbspec(M_l)]
    if has_bow:
        inputs += [
            bow["x_b"], bow["v_b"], bow["F_b"], bow["wid"],
            bow["phi_0"][:, None], bow["phi_1"][:, None],
            bow["mask"].astype(dtype)[:, None],
        ]
        in_specs += [tspec, tspec, tspec, tspec, bbspec(1), bbspec(1), bbspec(1)]
    if has_hammer:
        inputs += [
            hammer["x_H"][:, None], hammer["w_H"][:, None],
            hammer["M_r"][:, None], hammer["alpha"][:, None],
            hammer["mask"].astype(dtype)[:, None],
        ]
        in_specs += [bbspec(1)] * 5
    if has_exc:
        src = hammer if has_hammer else (bow or {})
        uH1_init = src.get("uH1", jnp.full((B,), -1e-3, dtype))
        uH2_init = src.get("uH2", jnp.full((B,), -1e-3, dtype))
        inputs += [uH1_init[:, None], uH2_init[:, None]]
        in_specs += [bbspec(1)] * 2

    out_shape = [
        jax.ShapeDtypeStruct((B, T), dtype),
        jax.ShapeDtypeStruct((B, T), dtype),
        jax.ShapeDtypeStruct((B, M_t), dtype),
        jax.ShapeDtypeStruct((B, M_t), dtype),
        jax.ShapeDtypeStruct((B, M_l), dtype),
        jax.ShapeDtypeStruct((B, M_l), dtype),
    ]
    out_specs = [tspec, tspec, bbspec(M_t), bbspec(M_t), bbspec(M_l), bbspec(M_l)]
    if has_exc:
        out_shape += [jax.ShapeDtypeStruct((B, T), dtype)] * 3
        out_specs += [tspec, tspec, tspec]
    if collect_state:
        out_shape += [
            jax.ShapeDtypeStruct((T, B, MP), dtype),
            jax.ShapeDtypeStruct((T, B, MP), dtype),
        ]
        sspec = pl.BlockSpec(
            (chunk, BB, MP), lambda b, i: (i, b, 0), memory_space=pltpu.VMEM
        )
        out_specs += [sspec, sspec]

    scratch = [
        pltpu.VMEM((BB, MP), dtype),
        pltpu.VMEM((BB, MP), dtype),
        pltpu.VMEM((BB, MP), dtype),
        pltpu.VMEM((BB, MP), dtype),
        pltpu.VMEM((BB, chunk), dtype),
        pltpu.VMEM((BB, chunk), dtype),
    ]
    if has_exc:
        scratch += [
            pltpu.VMEM((BB, chunk), dtype),
            pltpu.VMEM((BB, chunk), dtype),
            pltpu.VMEM((BB, chunk), dtype),
            pltpu.VMEM((BB, 128), dtype),
        ]
    if consts.gmres_rescue and consts.coupling_fixed == 0:
        scratch += [pltpu.VMEM((consts.gmres_m + 1, BB, MP), dtype)]

    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(n_bb, n_chunks),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
        # state collection double-buffers two (chunk, BB, MP) out blocks and
        # the coupling rescue keeps an (m+1, BB, MP) Krylov basis resident;
        # together they exceed the default 16 MB scoped-VMEM budget at
        # production shapes (v5e has 128 MB) — raise the cap explicitly
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(*inputs)

    uout, zout = outs[0], outs[1]
    aux = {"carry": tuple(outs[2:6])}
    j = 6
    if has_exc:
        aux["v_r"] = outs[j]
        aux["F_H"] = outs[j + 1]
        aux["u_H"] = outs[j + 2]
        j += 3
    if collect_state:
        aux["state_u"] = outs[j][:, :, :M_t]
        aux["state_z"] = outs[j + 1][:, :, :M_l]
    return uout, zout, aux


def _grid_bounds(f0_min, kappa, alpha, k, theta_t, lambda_c):
    """Per-element upper bounds on the kernel's live grid sizes (N+1).

    f64 with a 1e-6 inflation before floor() so the bound dominates the
    kernel's in-step f32 arithmetic (a few-ULP sqrt skew) for every time
    step; grids grow as f0 falls, so the per-element f0 minimum over the
    whole control signal bounds the whole trajectory.
    """
    f0 = np.asarray(f0_min, np.float64)
    kap = np.asarray(kappa, np.float64)
    alp = np.asarray(alpha, np.float64)
    gamma = 2.0 * f0
    K = kap * gamma
    two_t = 2.0 * theta_t - 1.0
    h_1 = lambda_c * np.sqrt(
        (gamma**2 * k**2 + np.sqrt(gamma**4 * k**4 + 16.0 * K**2 * k**2 * two_t))
        / (2.0 * two_t)
    )
    n_t = np.floor((1.0 / h_1) * (1.0 + 1e-6))
    h_2 = lambda_c * gamma * alp * k
    n_l = np.floor((1.0 / h_2) * (1.0 + 1e-6))
    return (n_t + 2.0).astype(np.int64), (n_l + 2.0).astype(np.int64)


def string_chunked_bucketed(f0, kappa, alpha, pos, t60, u1, u2, z1, z2, *,
                            M_t, M_l, batch_block=64, host_bounds=None,
                            **kw):
    """Grid-size-bucketed :func:`string_chunked` (same signature/results).

    In a random batch the live grids scale as ~1/f0, so most elements waste
    lanes at the batch-max padded width ``MP`` (every VPU op, PCR level and
    gather block costs O(MP)).  This wrapper sorts elements by their
    conservative grid bound, groups them into 128-lane width buckets, runs
    one ``string_chunked`` per bucket at the bucket's (smaller) padded
    width, and scatters outputs back to the original order.  Results are
    numerically equivalent: per-element live masks already handle
    heterogeneity inside the kernel, and the reference's
    allocation-coupled z live-row count is preserved by passing the
    caller's ``M_t`` as ``M_t_sem``; running at a narrower padded width
    reorders f32 lane reductions at the ~1-ULP level
    (tests/test_pallas_kernel.py::test_bucketed_kernel_matches_plain
    bounds it at 1e-8 absolute on 1e-4-scale state).

    Groups are padded up to a multiple of ``batch_block`` with clones of
    their first element (dropped on reassembly) so every pallas_call hits a
    stable compiled shape.  Falls back to a single unbucketed call when the
    batch is small, a bucket structure wouldn't save work, or
    ``FDTD_NO_BUCKET=1``.
    """
    import os as _os

    B = f0.shape[0]
    MP_glob = ((max(M_t, M_l) + 127) // 128) * 128
    BB = min(batch_block, B)
    # minimum useful group size: below ~16 elements a group's (BB_g, MP)
    # blocks are instruction-overhead-bound and the extra dispatch +
    # compile outweigh the width saving
    g_min = max(16, BB // 4)
    if _os.environ.get("FDTD_NO_BUCKET") == "1" or MP_glob <= 128:
        return string_chunked(
            f0, kappa, alpha, pos, t60, u1, u2, z1, z2,
            M_t=M_t, M_l=M_l, batch_block=batch_block, **kw)

    if host_bounds is not None:
        # caller-supplied host copies (the production path samples params on
        # the host anyway): skips a device round-trip that both adds relay
        # latency and is this environment's most wedge-prone operation
        # (a tiny d2h sync right after process start)
        f0_min, kap_h, alp_h = (
            np.asarray(a, np.float32).reshape(len(a), -1).min(axis=1)
            for a in host_bounds
        )
    else:
        f0_min = np.asarray(jax.device_get(jnp.min(f0, axis=1)))
        kap_h = np.asarray(jax.device_get(kappa)).reshape(-1)
        alp_h = np.asarray(jax.device_get(alpha)).reshape(-1)
    bt, bl = _grid_bounds(f0_min, kap_h, alp_h,
                          kw["k"], kw["theta_t"], kw["lambda_c"])
    need = np.minimum(
        128 * ((np.maximum(bt, bl) + 127) // 128), MP_glob
    ).astype(np.int64)

    if B < 2 * g_min:
        # too narrow to split, but the batch-max live width can still be
        # far below the allocation width (M_t/M_l are sampler-range upper
        # bounds): run ONE clamped group.  e.g. the reference-default B=16
        # pluck workload fits 128 lanes while MP_glob is 384 — every VPU
        # op, PCR level and O(ceil(MP/128)^2) gather block shrinks with it.
        groups = [(int(need.max()), np.arange(B))]
    else:
        order = np.argsort(need, kind="stable")
        need_s = need[order]
        # contiguous groups over the sorted order; a group smaller than
        # g_min merges upward into the next (wider) bucket
        groups = []  # (mp, index array)
        start = 0
        for mp in sorted(set(need_s.tolist())):
            end = int(np.searchsorted(need_s, mp, side="right"))
            if end - start == 0:
                continue
            if end - start < g_min and end < B:
                continue  # merge into the next bucket (start stays)
            groups.append((int(mp), order[start:end]))
            start = end
    if len(groups) == 1 and groups[0][0] >= MP_glob:
        return string_chunked(
            f0, kappa, alpha, pos, t60, u1, u2, z1, z2,
            M_t=M_t, M_l=M_l, batch_block=batch_block, **kw)

    # quantize each group's batch block: narrow buckets afford wider blocks
    # in the same VMEM budget (scratch ~ BB x MP), and snapping BB_g /
    # n_pad to a {16,32,64,128} ladder bounds the executable set when group
    # sizes vary across dataset-generation batches.
    bb_scale = _os.environ.get("FDTD_BB_SCALE", "1") == "1"
    groups_spec = []
    idx_args = []
    for mp, idx in groups:
        n_g = len(idx)
        cap = min(BB * (MP_glob // mp), 128) if bb_scale else BB
        # Minimize the BLOCK COUNT, not the clone padding: measured per-step
        # kernel cost is ~flat in BB over [16, 64] at fixed width (the step
        # is sweep-bookkeeping/latency-bound, not batch-VPU-bound), so a
        # group split into several narrow blocks pays the whole step wall
        # per block — round 3's B=64 ran 3+ sequential BB=16 blocks and
        # landed SLOWER than B=16 (11.8 vs 41 audio-s/s).  Among ladder
        # quanta achieving the minimal ceil(n_g / q) block count, take the
        # smallest (least clone padding); the {16,32,64,128} ladder still
        # bounds the executable set across dataset-generation batches.
        ladder = [q for q in (16, 32, 64, 128) if q <= cap] or [cap]
        n_blocks_min = -(-n_g // ladder[-1])
        BB_g = next(q for q in ladder if -(-n_g // q) == n_blocks_min)
        n_pad = ((n_g + BB_g - 1) // BB_g) * BB_g
        idx_p = np.concatenate([idx, np.repeat(idx[:1], n_pad - n_g)])
        groups_spec.append((int(mp), int(n_pad), int(BB_g), int(n_g)))
        idx_args.append((jnp.asarray(idx_p), jnp.asarray(idx)))

    # ONE device dispatch for the whole gather -> per-bucket kernels ->
    # scatter pipeline: an eager per-group loop costs ~25 relay round-trips
    # per group (slices, pallas call, .at[].set updates), which through
    # this environment's RPC-latency relay eats the entire width saving.
    # The jitted executable is cached per (group structure, widths, consts).
    arr_kw = {name: kw.pop(name, None) for name in ("bow", "hammer", "p_a")}
    interpret = bool(kw.get("interpret", False))
    scalar_kw = dict(kw)
    scalar_kw.pop("batch_block", None)
    spec = (
        B, f0.shape[1], M_t, M_l, tuple(groups_spec),
        tuple(sorted((k2, v2) for k2, v2 in scalar_kw.items())),
    )
    fn = _build_bucketed_fn(spec, interpret)
    return fn(
        (f0, kappa, alpha, pos, t60, u1, u2, z1, z2),
        arr_kw, tuple(idx_args),
    )


@functools.lru_cache(maxsize=64)
def _build_bucketed_fn(spec, interpret):
    """Build (and jit) the fused multi-bucket executor for one static
    group structure.  See :func:`string_chunked_bucketed`."""
    B, T, M_t, M_l, groups_spec, scalar_items = spec
    scalar_kw = dict(scalar_items)
    collect_state = scalar_kw.get("collect_state", False)

    def fn(pos_args, arr_kw, idx_args):
        f0, kappa, alpha, pos, t60, u1, u2, z1, z2 = (
            jnp.asarray(a) for a in pos_args
        )
        dtype = f0.dtype
        has_exc = (arr_kw.get("bow") is not None
                   or arr_kw.get("hammer") is not None)

        def _take(x, idx):
            if x is None or not hasattr(x, "ndim") or x.ndim == 0:
                return x
            return jnp.take(jnp.asarray(x), idx, axis=0)

        uout = jnp.zeros((B, T), dtype)
        zout = jnp.zeros((B, T), dtype)
        carry = [jnp.zeros((B, M_t), dtype), jnp.zeros((B, M_t), dtype),
                 jnp.zeros((B, M_l), dtype), jnp.zeros((B, M_l), dtype)]
        aux_all = {}
        if has_exc:
            for key in ("v_r", "F_H", "u_H"):
                aux_all[key] = jnp.zeros((B, T), dtype)
        if collect_state:
            aux_all["state_u"] = jnp.zeros((T, B, M_t), dtype)
            aux_all["state_z"] = jnp.zeros((T, B, M_l), dtype)

        for (mp, n_pad, BB_g, n_g), (idx_d, idx_o) in zip(
                groups_spec, idx_args):
            M_t_g = min(M_t, mp)
            M_l_g = min(M_l, mp)
            kw_g = dict(scalar_kw)
            kw_g["batch_block"] = BB_g
            for name in ("bow", "hammer"):
                d = arr_kw.get(name)
                if d is not None:
                    kw_g[name] = {
                        kk: _take(vv, idx_d) for kk, vv in d.items()
                    }
                else:
                    kw_g[name] = None
            kw_g["p_a"] = _take(arr_kw.get("p_a"), idx_d)
            uo, zo, aux = string_chunked(
                _take(f0, idx_d), _take(kappa, idx_d), _take(alpha, idx_d),
                _take(pos, idx_d), _take(t60, idx_d),
                _take(u1, idx_d)[:, :M_t_g], _take(u2, idx_d)[:, :M_t_g],
                _take(z1, idx_d)[:, :M_l_g], _take(z2, idx_d)[:, :M_l_g],
                M_t=M_t_g, M_l=M_l_g, M_t_sem=M_t, **kw_g)
            uout = uout.at[idx_o].set(uo[:n_g])
            zout = zout.at[idx_o].set(zo[:n_g])
            for j, c in enumerate(aux["carry"]):
                carry[j] = carry[j].at[idx_o, : c.shape[1]].set(c[:n_g])
            for key in ("v_r", "F_H", "u_H"):
                if key in aux_all:
                    aux_all[key] = aux_all[key].at[idx_o].set(
                        aux[key][:n_g])
            if collect_state:
                aux_all["state_u"] = (
                    aux_all["state_u"].at[:, idx_o, :M_t_g]
                    .set(aux["state_u"][:, :n_g]))
                aux_all["state_z"] = (
                    aux_all["state_z"].at[:, idx_o, :M_l_g]
                    .set(aux["state_z"][:, :n_g]))
        aux_all["carry"] = tuple(carry)
        return uout, zout, aux_all

    # interpret mode (CPU tests) runs eagerly: the pallas interpreter's
    # callbacks do not need — and are slower under — an outer jit
    return fn if interpret else jax.jit(fn)


def pluck_chunked(f0, kappa, alpha, pos, t60, u1, u2, z1, z2, **kw):
    """Back-compat wrapper returning the original pluck-path signature."""
    collect_state = kw.get("collect_state", False)
    uout, zout, aux = string_chunked(
        f0, kappa, alpha, pos, t60, u1, u2, z1, z2, **kw
    )
    fin = aux["carry"]
    if collect_state:
        fin = fin + (aux["state_u"], aux["state_z"])
    return uout, zout, fin
