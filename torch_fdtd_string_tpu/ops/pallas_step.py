"""Fused Pallas TPU kernel for the pluck-path FDTD time loop.

One ``pallas_call`` runs an entire chunk of audio-rate time steps with the
string state resident in VMEM scratch (persisting across the sequential TPU
grid), eliminating per-step kernel dispatch and HBM state traffic entirely —
the design target of BASELINE.json's north star.

Performance structure (v5e-tuned):
  * uniform 128-aligned lane width ``MP`` for both the transverse and
    longitudinal grids, so every vector op has one shape and the two
    tridiagonal systems solve as ONE stacked ``(2B, MP)`` parallel cyclic
    reduction (halving serial solve depth);
  * the u<->z coupling iterates as Jacobi sweeps on the stacked system
    (the Gauss-Seidel order of the XLA engine has no batched equivalent);
    contraction per sweep is ~||T^-1 K|| which is orders below 1, so the
    configured sweeps reach f32 machine precision;
  * cross-grid linear interpolation needs lane gathers; Mosaic's
    dynamic_gather spans a single 128-lane vreg, so gathers decompose into
    vreg blocks and all gathers of a step phase are STACKED along sublanes
    into one block-gather pass;
  * per-step scalar reads/writes use masked reduce/select (Mosaic forbids
    dynamic single-lane indexing);
  * PCR out-of-range fills are precomputed per level outside the time loop.

Scope: the no-excitation (pluck) path with full nonlinear coupling — the
dataset-generation workhorse (bow/hammer run on the XLA engine).  Semantics
match ``core/engine.py``'s specialized pluck path with fixed coupling
sweeps; validated in interpreter mode and on hardware against the engine.
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


class PluckKernelConsts(NamedTuple):
    k: float
    theta_t: float
    lambda_c: float
    M_t: int
    M_l: int
    chunk: int
    coupling_iters: int
    surface_integral: bool
    collect_state: bool = False


def _kernel(consts: PluckKernelConsts, *refs):
    (f0_ref, kappa_ref, alpha_ref, pos_ref, t60_ref,
     u1_in, u2_in, z1_in, z2_in) = refs[:9]
    n_out = 8 if consts.collect_state else 6
    outs = refs[9 : 9 + n_out]
    uout_ref, zout_ref, u1_out, u2_out, z1_out, z2_out = outs[:6]
    su_ref, sz_ref = (outs[6], outs[7]) if consts.collect_state else (None, None)
    u1s, u2s, z1s, z2s, uacc, zacc = refs[9 + n_out :]
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

    kappa = kappa_ref[:]  # (B, 1)
    alpha = alpha_ref[:]
    pos = pos_ref[:]
    t60 = t60_ref[:]  # (B, 4)
    it = jax.lax.broadcasted_iota(jnp.int32, (B, MP), 1)
    itf = it.astype(dt)
    it_T = jax.lax.broadcasted_iota(jnp.int32, (B, consts.chunk), 1)

    # PCR out-of-range fill masks per level
    fills = []
    for lv in range(levels):
        s = 1 << lv
        fills.append((
            (it < s).astype(dt),        # rows whose -s neighbour is absent
            (it >= MP - s).astype(dt),  # rows whose +s neighbour is absent
        ))

    def pcr(sub, diag, sup, rhs):
        a, b, c, d = sub, diag, sup, rhs
        s = 1
        for lv in range(levels):
            lo_f, hi_f = fills[lv]
            b_m = _shift(b, s) + lo_f
            b_p = _shift(b, -s) + hi_f
            alpha_ = -a / b_m
            beta = -c / b_p
            a2 = alpha_ * _shift(a, s)
            c2 = beta * _shift(c, -s)
            b2 = b + alpha_ * _shift(c, s) + beta * _shift(a, -s)
            d2 = d + alpha_ * _shift(d, s) + beta * _shift(d, -s)
            a, b, c, d = a2, b2, c2, d2
            s *= 2
        return d / b

    def step(t, _):
        sel_T = it_T == t
        f0 = jnp.sum(jnp.where(sel_T, f0_ref[:], 0.0), axis=1, keepdims=True)
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
            """Stacked gather: list of l->t sources + list of t->l sources."""
            srcs = srcs_lt + srcs_tl
            n = len(srcs)
            Z = jnp.concatenate(srcs + srcs, axis=0)  # lo copies + hi copies
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
            """-phi_pow Dxf (lam * Dxb w) with w already on the t-grid."""
            return -phi_pow * dxf(lam * dxb(w, h_t), h_t)

        def K_lt_from(w):
            """-phi_pow Dxf_l w with w already on the l-grid."""
            return -phi_pow * dxf(w, h_l)

        # ---- LHS tridiagonals, stacked (2B, MP) --------------------------
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

        # ---- RHS (B w1 + C w2), one stacked gather pass ------------------
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
        rhs_u = B1u1 + C1u2 + 2.0 * K_tl_from(iz1) + K_tl_from(iz2)
        B4z1 = -2.0 * z1 - gamma_k * alpha**2 * dxx(z1, h_l)
        C4z2 = (1.0 - 2.0 * sig0 * k) * z2 + 2.0 * sig1 * k * dxx(z2, h_l)
        rhs_z = B4z1 + C4z2 + K_lt_from(iu2)

        rhs_u = rhs_u * live_t
        z_keep = jnp.clip(N_t + N_l + 2.0 - M_t, 0.0, n_l)
        rhs_z = rhs_z * (itf < z_keep).astype(dt)

        # ---- adaptive Gauss-Seidel coupling sweeps ------------------------
        # GS ordering (u uses the latest z; z uses the NEW u) matches the
        # XLA engine's parity-proven inner loop; its iteration radius is the
        # square of Jacobi's, which matters when the state slope Lambda makes
        # the coupling strong.  Iterate to f32 machine precision.
        inner_eps = 100.0 * float(jnp.finfo(dt).eps)

        def sweep_body(carry_s):
            u_c, z_c, _, it_c = carry_s
            (iz,) = interp_pair([z_c], [])
            u_c2 = pcr(sub_t, diag_t, sup_t, -rhs_u - K_tl_from(iz))
            (iu,) = interp_pair([], [lam * dxb(u_c2, h_t)])
            z_c2 = pcr(sub_l, diag_l, sup_l, -rhs_z - K_lt_from(iu))
            delta = jnp.max(jnp.abs(u_c2 - u_c)) + jnp.max(jnp.abs(z_c2 - z_c))
            return u_c2, z_c2, delta, it_c + 1

        def sweep_cond(carry_s):
            u_c, _, delta, it_c = carry_s
            scale_c = jnp.max(jnp.abs(u_c)) + inner_eps
            return jnp.logical_or(
                it_c == 0,
                jnp.logical_and(
                    delta > inner_eps * scale_c,
                    it_c < consts.coupling_iters,
                ),
            )

        u_n, z_n, _, _ = jax.lax.while_loop(
            sweep_cond,
            sweep_body,
            (u1, z1, jnp.array(jnp.inf, dt), jnp.array(0, jnp.int32)),
        )
        u_n = u_n * live_t * (it != 0) * (itf != N_t)
        z_n = z_n * live_l * (it != 0) * (itf != N_l)

        # ---- readout (string.cpp:263-298) --------------------------------
        if consts.surface_integral:
            w_out = 0.5 * h_t
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
        if consts.collect_state:
            # full padded width: unaligned lane slices inside dynamic-index
            # stores upset Mosaic; the host slices to M_t/M_l afterwards
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
    u1_out[:] = u1s[:, :M_t]
    u2_out[:] = u2s[:, :M_t]
    z1_out[:] = z1s[:, :M_l]
    z2_out[:] = z2s[:, :M_l]


def pluck_chunked(f0, kappa, alpha, pos, t60, u1, u2, z1, z2, *,
                  k, theta_t, lambda_c, M_t, M_l, chunk=512,
                  coupling_iters=24, surface_integral=False, interpret=False,
                  batch_block=32, collect_state=False):
    """Run the fused pluck kernel over a full (B, T) control signal.

    Returns ``(uout (B, T), zout (B, T), final carry (u1, u2, z1, z2))``,
    plus ``(state_u (T, B, M_t), state_z (T, B, M_l))`` appended to the
    carry tuple when ``collect_state`` is set.  ``T`` must be a multiple of
    ``chunk``.  Large batches are processed in ``batch_block``-row groups
    via an outer grid dimension so the gather/PCR temporaries stay under the
    scoped-VMEM limit; the time dimension is the minor grid axis, so state
    scratch re-initialises at chunk 0 of each batch block.
    """
    B, T = f0.shape
    assert T % chunk == 0, (T, chunk)
    n_chunks = T // chunk
    BB = min(batch_block, B)
    assert B % BB == 0, (B, BB)
    n_bb = B // BB
    MP = ((max(M_t, M_l) + 127) // 128) * 128
    consts = PluckKernelConsts(
        k=float(k), theta_t=float(theta_t), lambda_c=float(lambda_c),
        M_t=M_t, M_l=M_l, chunk=chunk, coupling_iters=coupling_iters,
        surface_integral=surface_integral, collect_state=collect_state,
    )
    t60_flat = jnp.stack(
        [t60[:, 0, 0], t60[:, 0, 1], t60[:, 1, 0], t60[:, 1, 1]], axis=1
    )
    dtype = f0.dtype
    kernel = functools.partial(_kernel, consts)
    out_shape = [
        jax.ShapeDtypeStruct((B, T), dtype),  # uout
        jax.ShapeDtypeStruct((B, T), dtype),  # zout
        jax.ShapeDtypeStruct((B, M_t), dtype),
        jax.ShapeDtypeStruct((B, M_t), dtype),
        jax.ShapeDtypeStruct((B, M_l), dtype),
        jax.ShapeDtypeStruct((B, M_l), dtype),
    ]
    bbspec = lambda w: pl.BlockSpec((BB, w), lambda b, i: (b, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((BB, chunk), lambda b, i: (b, i), memory_space=pltpu.VMEM)
    out_specs = [
        tspec,
        tspec,
        bbspec(M_t),
        bbspec(M_t),
        bbspec(M_l),
        bbspec(M_l),
    ]
    if collect_state:
        out_shape += [
            jax.ShapeDtypeStruct((T, B, MP), dtype),
            jax.ShapeDtypeStruct((T, B, MP), dtype),
        ]
        sspec = pl.BlockSpec(
            (chunk, BB, MP), lambda b, i: (i, b, 0), memory_space=pltpu.VMEM
        )
        out_specs += [sspec, sspec]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(n_bb, n_chunks),
        in_specs=[
            tspec,
            bbspec(1),
            bbspec(1),
            bbspec(1),
            bbspec(4),
            bbspec(M_t),
            bbspec(M_t),
            bbspec(M_l),
            bbspec(M_l),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((BB, MP), dtype),
            pltpu.VMEM((BB, MP), dtype),
            pltpu.VMEM((BB, MP), dtype),
            pltpu.VMEM((BB, MP), dtype),
            pltpu.VMEM((BB, chunk), dtype),
            pltpu.VMEM((BB, chunk), dtype),
        ],
        interpret=interpret,
    )(
        f0,
        kappa[:, None],
        alpha[:, None],
        pos[:, None],
        t60_flat,
        u1,
        u2,
        z1,
        z2,
    )
    uout, zout = outs[0], outs[1]
    carry_out = tuple(outs[2:6])
    if collect_state:
        carry_out = carry_out + (outs[6][:, :, :M_t], outs[7][:, :, :M_l])
    return uout, zout, carry_out
