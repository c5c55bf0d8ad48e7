"""Finite-difference-scheme derived quantities for the planar stiff string.

Pure-jnp re-derivation of the reference FDM math (see the upstream repo's
``src/utils/fdm.py:101-158`` and ``src/model/cpp/string.cpp:16-41``), written
for XLA: everything is branch-free, shape-static and batched.

Notation (Bilbao, *Numerical Sound Synthesis*, ch. 7):
  * ``gamma``   -- scaled wave speed, ``2 * f0`` (non-dimensional domain).
  * ``K``       -- stiffness constant, ``kappa_rel * gamma``.
  * ``theta_t`` -- free parameter of the implicit theta scheme (in (1/2, 1)).
  * ``N_t``     -- number of transverse grid intervals, ``h_t = 1 / N_t``.
  * ``N_l``     -- number of longitudinal grid intervals, ``h_l = 1 / N_l``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DerivedVars(NamedTuple):
    gamma: jnp.ndarray
    K: jnp.ndarray
    N_t: jnp.ndarray
    h_t: jnp.ndarray
    N_l: jnp.ndarray
    h_l: jnp.ndarray


def get_derived_vars(f0, kappa_rel, k, theta_t, lambda_c, alpha) -> DerivedVars:
    """Map (f0, kappa_rel, k, theta, lambda_c, alpha) -> grid geometry.

    Matches reference ``string.cpp:16-41`` / ``fdm.py:101-123``.  All inputs
    broadcast; typically ``f0`` is ``(B,)`` per-step and the rest ``(B,)``.
    """
    f0 = jnp.asarray(f0)
    kappa_rel = jnp.asarray(kappa_rel)
    gamma = 2.0 * f0
    K = kappa_rel * gamma  # == sqrt((pi*kappa/gamma)^2) * gamma/pi

    two_t = 2.0 * theta_t - 1.0
    h_1 = lambda_c * jnp.sqrt(
        (gamma**2 * k**2 + jnp.sqrt(gamma**4 * k**4 + 16.0 * K**2 * k**2 * two_t))
        / (2.0 * two_t)
    )
    # floor() guarded by a few ULPs so host-numpy twins (grid_widths_np) and
    # this XLA path agree at integer boundaries despite 1-ULP sqrt skew
    eps4 = 4.0 * jnp.finfo(jnp.result_type(h_1)).eps
    N_t = jnp.floor((1.0 / h_1) * (1.0 + eps4))
    h_t = 1.0 / N_t

    h_2 = lambda_c * gamma * alpha * k
    N_l = jnp.floor((1.0 / h_2) * (1.0 + eps4))
    h_l = 1.0 / N_l
    return DerivedVars(gamma, K, N_t, h_t, N_l, h_l)


def get_derived_vars_np(f0, kappa_rel, k, theta_t, lambda_c, alpha):
    """Host-side (numpy/scalar) twin of :func:`get_derived_vars`.

    Used at trace time to size the static padded grids (cf. reference
    ``simulator.py:31-38``).
    """
    gamma = 2.0 * f0
    K = kappa_rel * gamma
    two_t = 2.0 * theta_t - 1.0
    h_1 = lambda_c * math.sqrt(
        (gamma**2 * k**2 + math.sqrt(gamma**4 * k**4 + 16.0 * K**2 * k**2 * two_t))
        / (2.0 * two_t)
    )
    N_t = int(1.0 / h_1)
    h_2 = lambda_c * gamma * alpha * k
    N_l = int(1.0 / h_2)
    return gamma, K, N_t, 1.0 / max(N_t, 1), N_l, 1.0 / max(N_l, 1)


def get_derived_vars_host(f0, kappa_rel, k, theta_t, lambda_c, alpha,
                          dtype=np.float32):
    """Vectorized numpy twin of :func:`get_derived_vars` (same 6-tuple,
    same epsilon-guarded floor, computed in the simulation dtype).

    Host-side batch consumers (the parameter sampler, the run loop's
    per-item grid sizing) must NOT call the jnp variant: outside jit each
    of its ~10 ops dispatches eagerly to the accelerator, and through this
    environment's relay the first-call per-op compiles cost minutes per
    process (measured 196 s cold at B=24) for what is microseconds of
    numpy.
    """
    dt = np.dtype(dtype).type
    f0 = np.asarray(f0, dt)
    kappa_rel = np.asarray(kappa_rel, dt)
    alpha = np.asarray(alpha, dt)
    gamma = dt(2.0) * f0
    K = kappa_rel * gamma
    two_t = dt(2.0 * theta_t - 1.0)
    h_1 = dt(lambda_c) * np.sqrt(
        (gamma**2 * dt(k) ** 2
         + np.sqrt(gamma**4 * dt(k) ** 4
                   + dt(16.0) * K**2 * dt(k) ** 2 * two_t))
        / (dt(2.0) * two_t)
    )
    eps4 = dt(4.0) * np.finfo(dt).eps
    N_t = np.floor((dt(1.0) / h_1) * (dt(1.0) + eps4))
    h_t = dt(1.0) / N_t
    h_2 = dt(lambda_c) * gamma * alpha * dt(k)
    N_l = np.floor((dt(1.0) / h_2) * (dt(1.0) + eps4))
    h_l = dt(1.0) / N_l
    return DerivedVars(gamma, K, N_t, h_t, N_l, h_l)


def grid_widths_np(f0, kappa_rel, k, theta_t, lambda_c, dtype=np.float32):
    """Vectorized numpy twin of :func:`get_derived_vars`'s transverse grid
    count ``N_t`` for host-side consumers (preprocessing upsampling).

    Computed in the simulation's ``dtype`` with the same epsilon-guarded
    floor as the XLA path so both land on the same integer at floor()
    boundaries (a 1-ULP numpy-vs-XLA sqrt skew would otherwise off-by-one
    the live slice; reference recomputes this per step,
    process_training_data.py:125-128).
    """
    dt = np.dtype(dtype).type
    f0 = np.asarray(f0, dt)
    gamma = dt(2.0) * f0
    K = dt(kappa_rel) * gamma
    two_t = dt(2.0 * theta_t - 1.0)
    h_1 = dt(lambda_c) * np.sqrt(
        (gamma**2 * dt(k) ** 2
         + np.sqrt(gamma**4 * dt(k) ** 4
                   + dt(16.0) * K**2 * dt(k) ** 2 * two_t))
        / (dt(2.0) * two_t)
    )
    eps4 = dt(4.0) * np.finfo(dt).eps
    return np.floor((dt(1.0) / h_1) * (dt(1.0) + eps4))


def get_theta(kappa_max, f0_inf, sr, lambda_c=1):
    """Auto-derive the theta-scheme free parameter (reference ``fdm.py:125-141``)."""
    gamma = 2.0 * f0_inf
    kappa = gamma * kappa_max
    k = 1.0 / sr
    if kappa == 0:
        return 0.5 + 2.0 / (math.pi**2)
    R = ((gamma**4 * k**2 + 4.0 * kappa**2 * math.pi**2) / (gamma**4 * k**2)) ** 0.5
    S = gamma**4 * k**2 * lambda_c**2 / (4.0 * kappa**2 * math.pi**4)
    theta = 0.5 + 2.0 * S * lambda_c**2 * (R - 1.0) ** 2 + math.pi**2 * S * (R - 1.0)
    assert theta < 1, theta
    return theta


def stiff_string_modes(f0, kappa_rel, p_max=1):
    """Fletcher inharmonic mode frequencies of a lossless stiff string.

    Returns ``(modes, factors)`` like reference ``fdm.py:143-158``:
    ``w_p = p (1 + (2/pi) sqrt(B) + (4/pi^2) B) sqrt(1 + B p^2)`` with
    ``B = (pi kappa_rel)^2``; ``modes[p] = f0 * w_p``.

    Works for numpy arrays / jnp arrays / scalars.
    """
    xp = jnp if isinstance(kappa_rel, jnp.ndarray) else np
    B = (np.pi * kappa_rel) ** 2
    modes, factor = [], []
    for p in range(1, p_max + 1):
        w_p = (
            p
            * (1.0 + (2.0 / np.pi) * xp.sqrt(B) + (4.0 / np.pi**2) * B)
            * xp.sqrt(1.0 + B * p**2)
        )
        factor.append(w_p)
        modes.append(f0 * w_p)
    return modes, factor


def t60_to_sigma(T60, gamma, K):
    """Two-point T60 spec -> (sigma0, sigma1) loss terms.

    Re-derivation of reference ``string.cpp:96-120`` (identical math also in
    ``audio.py:198-217``).  ``T60`` is ``(B, 2, 2)``: ``T60[:, i] = (freq_i,
    time_i)``; ``gamma``/``K`` are ``(B,)``.

    Returns ``sig0, sig1`` of shape ``(B,)`` — freq-independent and
    freq-dependent loss coefficients.  A zero anywhere in T60 selects the
    lossless branch (sig0 = sig1 = 1 * mask semantics of the reference, i.e.
    booleans cast to float: sig becomes 0 for lossless strings... note the
    reference sets ``sig0 = T60_mask`` (False -> 0) then scales it).
    """
    freq1 = T60[:, 0, 0]
    freq2 = T60[:, 1, 0]
    time1 = T60[:, 0, 1]
    time2 = T60[:, 1, 1]

    stiff = K > 0
    zeta1 = jnp.where(
        stiff,
        -(gamma**2) + jnp.sqrt(gamma**4 + 4.0 * K**2 * (2.0 * np.pi * freq1) ** 2),
        freq1**2 / jnp.where(gamma != 0, gamma, 1.0) ** 2,
    )
    zeta2 = jnp.where(
        stiff,
        -(gamma**2) + jnp.sqrt(gamma**4 + 4.0 * K**2 * (2.0 * np.pi * freq2) ** 2),
        freq2**2 / jnp.where(gamma != 0, gamma, 1.0) ** 2,
    )

    lossy = (T60.prod(axis=2).prod(axis=1)) != 0
    safe_t1 = jnp.where(time1 != 0, time1, 1.0)
    safe_t2 = jnp.where(time2 != 0, time2, 1.0)
    sig0 = jnp.where(lossy, -zeta2 / safe_t1 + zeta1 / safe_t2, lossy.astype(zeta1.dtype))
    sig1 = jnp.where(lossy, 1.0 / safe_t1 - 1.0 / safe_t2, lossy.astype(zeta1.dtype))
    # float() keeps the constant weakly typed (no f32 -> f64 promotion in
    # x64 mode)
    scale = float(6.0 * np.log(10.0)) / (zeta1 - zeta2)
    return scale * sig0, scale * sig1


def initialize_state_rows(u0, v0, k):
    """First two time rows of the displacement field.

    Mirrors reference ``fdm.py:77-99``: ``u2 = u0`` (row n-2) and
    ``u1 = u0 + k v0`` (row n-1).  ``u0``/``v0``: ``(B, M)``.
    """
    return u0 + k * v0, u0
