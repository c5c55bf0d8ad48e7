"""Fused Pallas TPU kernel for the pluck-path FDTD time loop.

One ``pallas_call`` runs an entire chunk of audio-rate time steps with the
string state resident in VMEM scratch (persisting across the sequential TPU
grid), eliminating per-step kernel dispatch and HBM state traffic entirely —
the design target of BASELINE.json's north star.  Layout: ``(B, M)`` with
batch on sublanes and the spatial grid on lanes; all spatial operators are
lane-rolls + masks; the implicit solve is the same masked parallel cyclic
reduction as ``ops/tridiag.py`` with statically unrolled levels.

Scope: the no-excitation (pluck) path with full nonlinear u<->z coupling —
the dataset-generation workhorse (bow/hammer stay on the XLA engine for
now).  Semantics match ``core/engine.py``'s specialized pluck path with
``coupling_fixed_iters`` sweeps.

Control-signal streaming: f0 arrives as ``(B, T)`` in HBM and is blocked
into ``(B, Tc)`` VMEM tiles by the grid; outputs are written back the same
way.  Validated in interpreter mode against the XLA engine; gated behind
config until profiled on real hardware.
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


def _pcr(sub, diag, sup, rhs, levels):
    """Parallel cyclic reduction with statically unrolled levels."""
    a, b, c, d = sub, diag, sup, rhs
    s = 1
    for _ in range(levels):
        b_m = _shift(b, s) + (1.0 - _shift(jnp.ones_like(b), s))  # fill 1.0
        b_p = _shift(b, -s) + (1.0 - _shift(jnp.ones_like(b), -s))
        alpha = -a / b_m
        beta = -c / b_p
        a2 = alpha * _shift(a, s)
        c2 = beta * _shift(c, -s)
        b2 = b + alpha * _shift(c, s) + beta * _shift(a, -s)
        d2 = d + alpha * _shift(d, s) + beta * _shift(d, -s)
        a, b, c, d = a2, b2, c2, d2
        s *= 2
    return d / b


def _gather_lanes(z, idx, M_pad):
    """out[b, i] = z[b, idx[b, i]] for lane widths beyond one vreg.

    Mosaic's dynamic lane gather handles a single 128-lane vreg only
    ("Multiple source vregs along gather dimension" otherwise), so the
    gather is decomposed into 128-lane source/output blocks combined with
    block-membership masks.
    """
    B = z.shape[0]
    nblk = M_pad // 128
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


def _interp(z, n_in, n_out, M_out, M_in):
    """align_corners linear resample of the first n_in lanes onto n_out
    lanes (per-sublane counts)."""
    B = z.shape[0]
    M_big = max(M_in, M_out)
    M_pad = ((M_big + 127) // 128) * 128
    if M_in < M_pad:
        z = jnp.concatenate(
            [z, jnp.zeros((B, M_pad - M_in), z.dtype)], axis=1
        )
    i = jax.lax.broadcasted_iota(jnp.int32, (B, M_pad), 1).astype(z.dtype)
    denom = jnp.maximum(n_out - 1.0, 1.0)
    pos = jnp.clip(i * (n_in - 1.0) / denom, 0.0, n_in - 1.0)
    lo = jnp.floor(pos)
    frac = pos - lo
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, M_in - 1)
    hi_i = jnp.clip(lo_i + 1, 0, M_in - 1)
    z_lo = _gather_lanes(z, lo_i, M_pad)
    z_hi = _gather_lanes(z, hi_i, M_pad)
    out = z_lo * (1.0 - frac) + z_hi * frac
    out = out * (i < n_out)
    return out[:, :M_out]


class PluckKernelConsts(NamedTuple):
    k: float
    theta_t: float
    lambda_c: float
    M_t: int
    M_l: int
    chunk: int
    coupling_iters: int
    surface_integral: bool


def _kernel(consts: PluckKernelConsts,
            # inputs (VMEM blocks)
            f0_ref, kappa_ref, alpha_ref, pos_ref, t60_ref,
            u1_in, u2_in, z1_in, z2_in,
            # outputs
            uout_ref, zout_ref, u1_out, u2_out, z1_out, z2_out,
            # scratch
            u1s, u2s, z1s, z2s, uacc, zacc):
    k = consts.k
    theta = consts.theta_t
    M_t, M_l = consts.M_t, consts.M_l
    lev_t = max(1, math.ceil(math.log2(M_t)))
    lev_l = max(1, math.ceil(math.log2(M_l)))
    ci = pl.program_id(0)

    @pl.when(ci == 0)
    def _():
        u1s[:] = u1_in[:]
        u2s[:] = u2_in[:]
        z1s[:] = z1_in[:]
        z2s[:] = z2_in[:]

    kappa = kappa_ref[:]  # (B, 1)
    alpha = alpha_ref[:]
    pos = pos_ref[:]
    t60 = t60_ref[:]  # (B, 4): freq1, time1, freq2, time2
    B = u1_in.shape[0]
    it_t = jax.lax.broadcasted_iota(jnp.int32, (B, M_t), 1)
    it_l = jax.lax.broadcasted_iota(jnp.int32, (B, M_l), 1)
    # Mosaic forbids dynamic single-lane loads/stores; per-step scalar
    # reads/writes go through full-width masked reduce/select instead.
    it_T = jax.lax.broadcasted_iota(jnp.int32, (B, consts.chunk), 1)

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
        sig0 = jnp.where(lossy, -zeta2 / st1 + zeta1 / st2, lossy.astype(f0.dtype))
        sig1 = jnp.where(lossy, 1.0 / st1 - 1.0 / st2, lossy.astype(f0.dtype))
        scale = LN10_6 / (zeta1 - zeta2)
        sig0 = scale * sig0
        sig1 = scale * sig1

        live_t = (it_t < n_t).astype(f0.dtype)
        live_l = (it_l < n_l).astype(f0.dtype)
        u1 = u1s[:] * live_t
        u2 = u2s[:] * live_t
        z1 = z1s[:] * live_l
        z2 = z2s[:] * live_l

        gamma_k = gamma**2 * k**2
        phi_pow = gamma_k * (alpha**2 - 1.0) / 4.0
        lam = (u1 - _shift(u1, 1)) / h_t
        lam2 = lam * lam

        # LHS tridiagonals
        a_t = (1.0 - theta) / 2.0 - 2.0 * sig1 * k / (h_t * h_t)
        b_t = theta + 2.0 * sig0 * k + 4.0 * sig1 * k / (h_t * h_t)
        d_next = _shift(lam2, -1)
        sub_t = jnp.where((it_t >= 1) & (it_t < n_t),
                          a_t - phi_pow * lam2 / (h_t * h_t), 0.0)
        diag_t = jnp.where(it_t < n_t,
                           b_t + phi_pow * (lam2 + d_next) / (h_t * h_t), 1.0)
        sup_t = jnp.where(it_t < (n_t - 1.0),
                          a_t - phi_pow * d_next / (h_t * h_t), 0.0)
        a_l = -2.0 * sig1 * k / (h_l * h_l)
        b_l = 1.0 + 2.0 * sig0 * k + 4.0 * sig1 * k / (h_l * h_l)
        sub_l = jnp.where((it_l >= 1) & (it_l < n_l), a_l, 0.0)
        diag_l = jnp.where(it_l < n_l, b_l, 1.0)
        sup_l = jnp.where(it_l < (n_l - 1.0), a_l, 0.0)

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
            corr = jnp.where(
                (it_t == 1) | (it_t.astype(f0.dtype) == (n_t - 2.0)), x, 0.0
            )
            return (pent + corr) / (h**4)

        def K_tl(zv):
            w = _interp(zv, n_l, n_t, M_t, M_l)
            return -phi_pow * dxf(lam * dxb(w, h_t), h_t)

        def K_lt(uv):
            w = _interp(lam * dxb(uv, h_t), n_t, n_l, M_l, M_t)
            return -phi_pow * dxf(w, h_l)

        def V_tt(uv):
            dn = _shift(lam2, -1)
            return -phi_pow * (
                lam2 * _shift(uv, 1) - (lam2 + dn) * uv + dn * _shift(uv, -1)
            ) / (h_t * h_t)

        K2k2 = K**2 * k**2
        B1u1 = (-2.0 * theta_op(u1) - gamma_k * dxx(u1, h_t)
                + K2k2 * dxxxx_cl(u1, h_t))
        C1u2 = (theta_op(u2) - 2.0 * sig0 * k * u2
                + 2.0 * sig1 * k * dxx(u2, h_t) + V_tt(u2))
        rhs_u = B1u1 + 2.0 * K_tl(z1) + C1u2 + K_tl(z2)
        B4z1 = -2.0 * z1 - gamma_k * alpha**2 * dxx(z1, h_l)
        C4z2 = (1.0 - 2.0 * sig0 * k) * z2 + 2.0 * sig1 * k * dxx(z2, h_l)
        rhs_z = B4z1 + K_lt(u2) + C4z2

        rhs_u = rhs_u * live_t
        z_keep = jnp.clip(N_t + N_l + 2.0 - M_t, 0.0, n_l)
        rhs_z = rhs_z * (it_l < z_keep).astype(f0.dtype)

        u_n, z_n = u1, z1
        for _ in range(consts.coupling_iters):
            u_n = _pcr(sub_t, diag_t, sup_t, -rhs_u - K_tl(z_n), lev_t)
            z_n = _pcr(sub_l, diag_l, sup_l, -rhs_z - K_lt(u_n), lev_l)
        u_n = u_n * live_t * (it_t != 0) * (it_t.astype(f0.dtype) != N_t)
        z_n = z_n * live_l * (it_l != 0) * (it_l.astype(f0.dtype) != N_l)

        # readout (string.cpp:263-298)
        if consts.surface_integral:
            w_out = 0.5 * h_t
            u_out = jnp.sum(u_n - u1s[:], axis=-1, keepdims=True) * w_out / k
            z_out = jnp.sum(z_n - z1s[:], axis=-1, keepdims=True) * w_out / k
        else:
            u_ri = 1.0 + jnp.floor(N_t * pos)
            u_rf = 1.0 + pos / h_t - u_ri
            z_ri = 1.0 + jnp.floor(N_l * pos)
            z_rf = 1.0 + pos / h_l - z_ri
            sel_u = (it_t.astype(f0.dtype) == u_ri).astype(f0.dtype)
            sel_u1 = (it_t.astype(f0.dtype) == u_ri + 1.0).astype(f0.dtype)
            sel_z = (it_l.astype(f0.dtype) == z_ri).astype(f0.dtype)
            sel_z1 = (it_l.astype(f0.dtype) == z_ri + 1.0).astype(f0.dtype)
            u_out = ((1.0 - u_rf) * jnp.sum(sel_u * u_n, -1, keepdims=True)
                     + u_rf * jnp.sum(sel_u1 * u_n, -1, keepdims=True))
            z_out = ((1.0 - z_rf) * jnp.sum(sel_z * z_n, -1, keepdims=True)
                     + z_rf * jnp.sum(sel_z1 * z_n, -1, keepdims=True))

        uacc[:] = jnp.where(sel_T, u_out, uacc[:])
        zacc[:] = jnp.where(sel_T, z_out, zacc[:])
        u2s[:] = u1s[:]
        u1s[:] = u_n
        z2s[:] = z1s[:]
        z1s[:] = z_n
        return 0

    jax.lax.fori_loop(0, consts.chunk, step, 0)

    uout_ref[:] = uacc[:]
    zout_ref[:] = zacc[:]
    u1_out[:] = u1s[:]
    u2_out[:] = u2s[:]
    z1_out[:] = z1s[:]
    z2_out[:] = z2s[:]


def pluck_chunked(f0, kappa, alpha, pos, t60, u1, u2, z1, z2, *,
                  k, theta_t, lambda_c, M_t, M_l, chunk=512,
                  coupling_iters=3, surface_integral=False, interpret=False):
    """Run the fused pluck kernel over a full (B, T) control signal.

    Returns (uout (B, T), zout (B, T), final carry (u1, u2, z1, z2)).
    ``T`` must be a multiple of ``chunk``.
    """
    B, T = f0.shape
    assert T % chunk == 0, (T, chunk)
    n_chunks = T // chunk
    consts = PluckKernelConsts(
        k=float(k), theta_t=float(theta_t), lambda_c=float(lambda_c),
        M_t=M_t, M_l=M_l, chunk=chunk, coupling_iters=coupling_iters,
        surface_integral=surface_integral,
    )
    t60_flat = jnp.stack(
        [t60[:, 0, 0], t60[:, 0, 1], t60[:, 1, 0], t60[:, 1, 1]], axis=1
    )
    dtype = f0.dtype
    kernel = functools.partial(_kernel, consts)
    out_shape = (
        jax.ShapeDtypeStruct((B, T), dtype),  # uout
        jax.ShapeDtypeStruct((B, T), dtype),  # zout
        jax.ShapeDtypeStruct((B, M_t), dtype),
        jax.ShapeDtypeStruct((B, M_t), dtype),
        jax.ShapeDtypeStruct((B, M_l), dtype),
        jax.ShapeDtypeStruct((B, M_l), dtype),
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            full((B, 1)),
            full((B, 1)),
            full((B, 1)),
            full((B, 4)),
            full((B, M_t)),
            full((B, M_t)),
            full((B, M_l)),
            full((B, M_l)),
        ],
        out_specs=(
            pl.BlockSpec((B, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            full((B, M_t)),
            full((B, M_t)),
            full((B, M_l)),
            full((B, M_l)),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, M_t), dtype),
            pltpu.VMEM((B, M_t), dtype),
            pltpu.VMEM((B, M_l), dtype),
            pltpu.VMEM((B, M_l), dtype),
            pltpu.VMEM((B, chunk), dtype),
            pltpu.VMEM((B, chunk), dtype),
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
    uout, zout, u1f, u2f, z1f, z2f = outs
    return uout, zout, (u1f, u2f, z1f, z2f)
