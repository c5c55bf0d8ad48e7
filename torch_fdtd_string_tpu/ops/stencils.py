"""Matrix-free spatial operators for the string FDTD scheme.

The reference materialises every difference operator as a dense batched
matrix each step (``misc.cpp:119-166``) and multiplies/inverts them.  Here
each operator is applied as a shifted-add *stencil* on ``(B, M)`` state
vectors — pure VPU work that XLA fuses into the surrounding step.  Zero-fill
shifts reproduce the finite-matrix truncation of the reference operators
exactly (a matrix of width M simply has no columns outside 0..M-1).

Grid conventions (cf. ``string.cpp:137-148``):
  * state vectors have static padded width ``M`` = max grid points;
  * per batch element, points ``0..n`` are live (``n+1`` points, where ``n``
    is the per-step interval count ``N_t`` or ``N_l``);
  * masks implement the per-element live region.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def shift(x, s, fill=0.0):
    """Shift along the last axis; ``s > 0`` moves values to higher indices."""
    if s == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (abs(s),), fill, dtype=x.dtype)
    if s > 0:
        return jnp.concatenate([pad, x[..., :-s]], axis=-1)
    return jnp.concatenate([x[..., -s:], pad], axis=-1)


# -----------------------------------------------------------------------------
# Difference operators (h is (B, 1) or scalar; x is (B, M))
# -----------------------------------------------------------------------------

def dxx(x, h):
    """Second difference: ``(x[i+1] - 2 x[i] + x[i-1]) / h^2``."""
    return (shift(x, -1) - 2.0 * x + shift(x, 1)) / (h * h)


def dxf(x, h):
    """Forward difference: ``(x[i+1] - x[i]) / h``."""
    return (shift(x, -1) - x) / h


def dxb(x, h):
    """Backward difference: ``(x[i] - x[i-1]) / h``."""
    return (x - shift(x, 1)) / h


def dxxxx(x, h):
    """Fourth difference (simply-supported penta stencil)."""
    return (
        shift(x, -2) - 4.0 * shift(x, -1) + 6.0 * x - 4.0 * shift(x, 1) + shift(x, 2)
    ) / (h**4)


def dxxxx_clamped(x, h, n):
    """Fourth difference with the ``u_{-1} == u_1`` boundary correction.

    Reference ``misc.cpp:146-163``: the penta stencil plus ``+1`` on the
    diagonal at rows ``1`` and ``n-2`` (per batch element ``n`` = live point
    count, i.e. ``N+1``).
    """
    M = x.shape[-1]
    idx = jnp.arange(M)
    corr = (idx[None, :] == 1) | (idx[None, :] == (n[:, None] - 2))
    return dxxxx(x, h) + jnp.where(corr, x, 0.0) / (h**4)


def mxc(x):
    """Averaging operator ``(x[i+1] + x[i-1]) / 2`` (``misc.cpp:164-166``)."""
    return 0.5 * (shift(x, -1) + shift(x, 1))


def theta_op(x, theta):
    """Theta-weighted mass operator ``theta I + (1-theta) Mxc``."""
    return theta * x + (1.0 - theta) * mxc(x)


def dxf_diag_dxb(x, d, h):
    """Apply ``Dxf @ diag(d) @ Dxb`` as a stencil.

    Row ``i`` of the matrix is ``[d_i, -(d_i + d_{i+1}), d_{i+1}] / h^2``
    acting on ``(x[i-1], x[i], x[i+1])``; ``d`` has the same padded width as
    ``x`` and ``d_{M}`` (out of range) is treated as zero.
    """
    d_next = shift(d, -1)
    return (d * shift(x, 1) - (d + d_next) * x + d_next * shift(x, -1)) / (h * h)


# -----------------------------------------------------------------------------
# Masks (cf. misc.cpp:182-207)
# -----------------------------------------------------------------------------

def mask_live(x, count, M=None):
    """Zero entries with index >= count.  ``count`` is (B,); keeps 0..count-1.

    Mirrors reference ``mask_1d(u, N, N_max)`` which keeps the first ``N``
    entries.
    """
    M = M or x.shape[-1]
    idx = jnp.arange(M)
    return x * (idx[None, :] < count[:, None]).astype(x.dtype)


def dirichlet(x, n):
    """Zero entries at index 0 and index ``n`` per batch element."""
    idx = jnp.arange(x.shape[-1])
    keep = (idx[None, :] != 0) & (idx[None, :] != n[:, None])
    return x * keep.astype(x.dtype)


# -----------------------------------------------------------------------------
# Excitation spreaders (cf. misc.cpp:20-69)
# -----------------------------------------------------------------------------

def raised_cosine(n, ctr, wid, M):
    """Normalised raised-cosine spreading profile (``misc.cpp:20-34``).

    Args:
      n:   (B,) active sample count in space (the reference passes ``N - 1``).
      ctr: (B,) centre in (0, 1].
      wid: (B,) width in (0, 1].
      M:   static padded width (the reference's ``N``).

    Returns (B, M).  Where the window captures no grid point the profile is
    all-zero and the normalisation divides by zero — the caller is expected
    to ``nan_to_num`` exactly like the reference (``string.cpp:225``).
    """
    h = 1.0 / M
    xax = jnp.linspace(h, 1.0, M, dtype=ctr.dtype)[None, :]
    c = (ctr * n / M)[:, None]
    w = (wid * n / M)[:, None]
    ind = jnp.sign(jnp.maximum(-(xax - c - w / 2.0) * (xax - c + w / 2.0), 0.0))
    out = 0.5 * ind * (1.0 + jnp.cos(2.0 * np.pi * (xax - c) / w))
    return out / jnp.sum(jnp.abs(out), axis=-1, keepdims=True)


def floor_dirac_delta(n, ctr, M):
    """One-hot at ``floor(ctr * n)`` (``misc.cpp:36-43``). Returns (B, M)."""
    idx = jnp.arange(M, dtype=ctr.dtype)
    tgt = jnp.floor(ctr * n)[:, None]
    return (idx[None, :] == tgt).astype(ctr.dtype)


def triangular(M, n, p_x, p_a):
    """Batched triangular pluck profile (``misc.cpp:54-69`` / ``misc.py:60-72``).

    Args:
      M:   static padded point count (reference's ``N``).
      n:   (B,) live point count.
      p_x: (B,) peak position in (0, 1).
      p_a: (B,) peak amplitude.
    Returns (B, M).
    """
    i = jnp.arange(M, dtype=p_x.dtype)[None, :]
    zero = p_x <= 0
    vel_l = jnp.where(zero, 0.0, p_a / jnp.where(zero, 1.0, p_x) / n)[:, None]
    vel_r = jnp.where(zero, 0.0, p_a / jnp.where(zero, 1.0, (1.0 - p_x)) / n)[:, None]
    left = jnp.maximum(vel_l * i, 0.0)
    # reference: cumsum then flip => right ramp grows from the right end of
    # the *live* region: value at index j is vel_r * (n - 1 - j) clamped at 0.
    right = jnp.maximum(vel_r * (n[:, None] - 1.0 - i), 0.0)
    return jnp.minimum(left, right)


def domain_x(M, n):
    """Non-dimensional x coordinate in [-1/2, 1/2] (``misc.cpp:45-52``).

    ``x_i = (clip(2 i / n, 0, 2) - 1) / 2`` for ``i`` in 0..M-1; saturates at
    +1/2 beyond the live region.
    """
    i = jnp.arange(M, dtype=n.dtype)[None, :]
    v = jnp.clip(2.0 * i / n[:, None], 0.0, 2.0)
    return (v - 1.0) / 2.0


# -----------------------------------------------------------------------------
# Cross-grid linear interpolation (replaces misc.cpp:78-105's per-batch
# materialised interpolation matrices with direct batched gathers).
# -----------------------------------------------------------------------------

def interp_linear(x, n_in, n_out, M_out):
    """Per-element linear resample from ``n_in`` to ``n_out`` points.

    Equivalent to applying the reference's ``batched_interpolator(N_i, N_o)``
    matrix (align_corners=True linear interpolation of the first ``n_in``
    entries of ``x`` onto ``n_out`` points), zero beyond ``n_out``.

    Args:
      x:     (B, M_in) input vectors (live region: first ``n_in`` entries).
      n_in:  (B,) input point counts.
      n_out: (B,) output point counts.
      M_out: static output width.
    Returns (B, M_out).
    """
    B, M_in = x.shape
    i = jnp.arange(M_out, dtype=x.dtype)[None, :]
    denom = jnp.maximum(n_out[:, None] - 1.0, 1.0)
    pos = i * (n_in[:, None] - 1.0) / denom
    pos = jnp.clip(pos, 0.0, n_in[:, None] - 1.0)
    lo = jnp.floor(pos)
    frac = pos - lo
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, M_in - 1)
    hi_i = jnp.clip(lo_i + 1, 0, M_in - 1)
    x_lo = jnp.take_along_axis(x, lo_i, axis=-1)
    x_hi = jnp.take_along_axis(x, hi_i, axis=-1)
    out = x_lo * (1.0 - frac) + x_hi * frac
    return out * (i < n_out[:, None]).astype(x.dtype)
