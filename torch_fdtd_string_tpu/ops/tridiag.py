"""Batched tridiagonal solves for TPU: parallel cyclic reduction (PCR).

The reference engine assembles the implicit-scheme system as dense matrices
and inverts them once per audio-rate time step (``string.cpp:173-175``).  On
TPU that is the wrong shape: the LHS blocks are *tridiagonal* (theta-mass +
Dxx + Dxf diag Dxb are all bandwidth-1), so we never materialise a matrix.
PCR solves all batch elements' systems in ``ceil(log2(M))`` data-parallel
sweeps of shift + multiply ops on the VPU — O(B*M*logM) work, no MXU, no
host syncs, fully ``lax.scan``/``jit`` compatible.

Variable per-element system sizes (the reference's per-step, per-batch grid
sizes) are handled by *identity padding*: rows beyond each element's active
size are (0, 1, 0 | rhs=0), which embeds the exact n-sized solve in a static
M-sized array.

Systems here are strictly diagonally dominant (see ops/stencils.py), for
which PCR is unconditionally stable.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _shift(x, s, fill=0.0):
    """Shift last axis by ``s`` (s>0: toward higher indices), zero/const fill."""
    if s == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (abs(s),), fill, dtype=x.dtype)
    if s > 0:
        return jnp.concatenate([pad, x[..., :-s]], axis=-1)
    return jnp.concatenate([x[..., -s:], pad], axis=-1)


def tridiag_solve(sub, diag, sup, rhs):
    """Solve ``T x = rhs`` for batched tridiagonal ``T``.

    Args:
      sub:  (..., M) subdiagonal entries; ``sub[i]`` couples row i to i-1
            (``sub[0]`` ignored / must be 0).
      diag: (..., M) diagonal entries (nonzero; use 1.0 for padded rows).
      sup:  (..., M) superdiagonal entries; ``sup[i]`` couples row i to i+1
            (``sup[M-1]`` ignored / must be 0).
      rhs:  (..., M) right-hand side.

    Returns (..., M) solution.
    """
    M = rhs.shape[-1]
    n_steps = max(1, math.ceil(math.log2(max(M, 2))))

    a, b, c, d = sub, diag, sup, rhs
    s = 1
    for _ in range(n_steps):
        # Neighbour rows at distance s; out-of-range neighbours behave as
        # identity rows (b=1, a=c=d=0) so the update is a no-op there.
        b_m = _shift(b, s, fill=1.0)
        b_p = _shift(b, -s, fill=1.0)
        alpha = -a / b_m
        beta = -c / b_p
        a2 = alpha * _shift(a, s)
        c2 = beta * _shift(c, -s)
        b2 = b + alpha * _shift(c, s) + beta * _shift(a, -s)
        d2 = d + alpha * _shift(d, s) + beta * _shift(d, -s)
        a, b, c, d = a2, b2, c2, d2
        s *= 2
    return d / b


def dst_toeplitz_solve(a, b, c, n, rhs):
    """Closed-form Toeplitz-tridiagonal solve via the sine eigenbasis.

    The reference ships this as ``tridiagonal_inverse`` (misc.cpp:228-252 /
    fdm.py:9-21) but leaves it out of the hot path; it is exact for a
    Toeplitz tridiag(a, b, c) of size n (eigenvalues
    ``b + (a+c) cos(k pi / (n+1))``, eigenvectors ``sin(jk pi/(n+1))``)
    and MXU-friendly (two batched matmuls).  PCR is cheaper per step for
    the engine, but this form is useful for spectral analysis and tests.

    a, b, c: (B,) constant diagonals; n: (B,) live sizes; rhs: (B, M).
    """
    B, M = rhs.shape
    dtype = rhs.dtype
    j = jnp.arange(1, M + 1, dtype=dtype)
    nb = n[:, None]
    k = j[None, :]
    lam = b[:, None] + (a + c)[:, None] * jnp.cos(k * jnp.pi / (nb + 1.0))
    live = k <= nb
    lam = jnp.where(live, lam, 1.0)
    V = jnp.sqrt(2.0 / (nb + 1.0))[..., None] * jnp.sin(
        j[None, :, None] * j[None, None, :] * jnp.pi / (nb + 1.0)[..., None]
    )
    V = V * live[:, :, None] * live[:, None, :]
    y = jnp.einsum("bij,bj->bi", V, rhs * live)
    y = y / lam
    x = jnp.einsum("bij,bj->bi", V, y)
    return x * live


def toeplitz_tridiag_coeffs(a, b, n, M, dtype=None):
    """Masked Toeplitz-tridiagonal coefficient arrays for per-element size n.

    Builds (sub, diag, sup) of static width ``M`` representing, for each batch
    element, the ``n x n`` symmetric Toeplitz tridiagonal matrix
    ``tridiag(a, b, a)`` embedded with identity padding.

    Args:
      a: (B,) off-diagonal value per element.
      b: (B,) diagonal value per element.
      n: (B,) active system size (rows 0..n-1 are live).
      M: static padded width.
    """
    dtype = dtype or jnp.result_type(a, b)
    idx = jnp.arange(M, dtype=dtype)
    live = idx[None, :] < n[:, None]
    sub = jnp.where((idx[None, :] >= 1) & live, a[:, None], 0.0)
    diag = jnp.where(live, b[:, None], 1.0)
    sup = jnp.where(idx[None, :] < (n[:, None] - 1), a[:, None], 0.0)
    return sub.astype(dtype), diag.astype(dtype), sup.astype(dtype)


def tridiag_matvec(sub, diag, sup, x):
    """A @ x for the masked tridiagonal layout used by :func:`tridiag_solve`:
    ``(Ax)_i = sub_i x_{i-1} + diag_i x_i + sup_i x_{i+1}`` with zero-filled
    out-of-range neighbours (padded rows are identity)."""
    return sub * _shift(x, 1) + diag * x + sup * _shift(x, -1)
