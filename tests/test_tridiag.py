import jax.numpy as jnp
import numpy as np

from torch_fdtd_string_tpu.ops.tridiag import tridiag_solve, toeplitz_tridiag_coeffs


def _dense(sub, diag, sup, m):
    return (
        np.diag(diag[:m])
        + np.diag(sub[1:m], -1)
        + np.diag(sup[: m - 1], 1)
    )


def test_pcr_matches_dense_solve_variable_sizes():
    rng = np.random.default_rng(0)
    B, M = 5, 200
    n = np.array([200, 128, 77, 13, 2])
    idx = np.arange(M)
    sub = rng.normal(size=(B, M))
    sup = rng.normal(size=(B, M))
    diag = 4.0 + np.abs(sub) + np.abs(sup) + rng.random((B, M))
    sub = np.where((idx[None] >= 1) & (idx[None] < n[:, None]), sub, 0.0)
    sup = np.where(idx[None] < n[:, None] - 1, sup, 0.0)
    diag = np.where(idx[None] < n[:, None], diag, 1.0)
    rhs = rng.normal(size=(B, M)) * (idx[None] < n[:, None])

    x = np.asarray(
        tridiag_solve(jnp.array(sub), jnp.array(diag), jnp.array(sup), jnp.array(rhs))
    )
    for b in range(B):
        m = n[b]
        ref = np.linalg.solve(_dense(sub[b], diag[b], sup[b], m), rhs[b][:m])
        np.testing.assert_allclose(x[b][:m], ref, atol=1e-10)
        if m < M:
            assert np.abs(x[b][m:]).max() < 1e-12


def test_toeplitz_coeffs_and_solve():
    B, M = 3, 64
    a = jnp.array([0.2, -0.1, 0.05])
    b = jnp.array([1.5, 2.0, 1.1])
    n = jnp.array([64.0, 40.0, 5.0])
    sub, diag, sup = toeplitz_tridiag_coeffs(a, b, n, M)
    rng = np.random.default_rng(1)
    rhs = rng.normal(size=(B, M)) * (np.arange(M)[None] < np.asarray(n)[:, None])
    x = np.asarray(tridiag_solve(sub, diag, sup, jnp.array(rhs)))
    for i in range(B):
        m = int(n[i])
        T = np.diag(np.full(m, float(b[i]))) + np.diag(
            np.full(m - 1, float(a[i])), 1
        ) + np.diag(np.full(m - 1, float(a[i])), -1)
        ref = np.linalg.solve(T, rhs[i][:m])
        np.testing.assert_allclose(x[i][:m], ref, atol=1e-10)


def test_dst_toeplitz_solve_matches_dense():
    from torch_fdtd_string_tpu.ops.tridiag import dst_toeplitz_solve

    rng = np.random.default_rng(3)
    B, M = 3, 48
    a = jnp.array([0.2, -0.15, 0.0])
    c = jnp.array([0.2, -0.15, 0.0])  # symmetric Toeplitz
    b = jnp.array([1.4, 1.1, 2.0])
    n = jnp.array([48.0, 31.0, 7.0])
    rhs = rng.normal(size=(B, M)) * (np.arange(M)[None] < np.asarray(n)[:, None])
    x = np.asarray(dst_toeplitz_solve(a, b, c, n, jnp.array(rhs)))
    for i in range(B):
        m = int(n[i])
        T = (
            np.diag(np.full(m, float(b[i])))
            + np.diag(np.full(m - 1, float(a[i])), -1)
            + np.diag(np.full(m - 1, float(c[i])), 1)
        )
        ref = np.linalg.solve(T, rhs[i][:m])
        np.testing.assert_allclose(x[i][:m], ref, atol=1e-8)
        if m < M:
            assert np.abs(x[i][m:]).max() < 1e-10
