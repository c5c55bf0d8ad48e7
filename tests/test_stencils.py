"""Operator stencils vs dense matrix definitions (built independently here
from the mathematical definitions in Bilbao ch.5/7; cf. reference
misc.cpp:119-166)."""

import jax.numpy as jnp
import numpy as np

from torch_fdtd_string_tpu.ops import stencils as st


def _eye_off(m, d):
    return np.eye(m, k=d)


def _dxx(m, h):
    return (_eye_off(m, 1) - 2 * np.eye(m) + _eye_off(m, -1)) / h**2


def _dxf(m, h):
    return (_eye_off(m, 1) - np.eye(m)) / h


def _dxb(m, h):
    return (np.eye(m) - _eye_off(m, -1)) / h


def _dxxxx(m, h):
    return (
        _eye_off(m, 2)
        - 4 * _eye_off(m, 1)
        + 6 * np.eye(m)
        - 4 * _eye_off(m, -1)
        + _eye_off(m, -2)
    ) / h**4


rng = np.random.default_rng(0)
M = 32
x = rng.normal(size=(2, M))
h = np.array([[0.1], [0.05]])


def _check(op_fn, mat_fn):
    out = np.asarray(op_fn(jnp.array(x), jnp.array(h)))
    for b in range(2):
        ref = mat_fn(M, h[b, 0]) @ x[b]
        np.testing.assert_allclose(out[b], ref, atol=1e-9)


def test_dxx():
    _check(st.dxx, _dxx)


def test_dxf():
    _check(st.dxf, _dxf)


def test_dxb():
    _check(st.dxb, _dxb)


def test_dxxxx():
    _check(st.dxxxx, _dxxxx)


def test_dxxxx_clamped():
    n = np.array([32.0, 20.0])  # live point counts
    out = np.asarray(st.dxxxx_clamped(jnp.array(x), jnp.array(h), jnp.array(n)))
    for b in range(2):
        D = _dxxxx(M, h[b, 0])
        corr = np.zeros((M, M))
        corr[1, 1] = 1.0 / h[b, 0] ** 4
        i = int(n[b]) - 2
        corr[i, i] = 1.0 / h[b, 0] ** 4
        np.testing.assert_allclose(out[b], (D + corr) @ x[b], atol=1e-9)


def test_dxf_diag_dxb():
    d = rng.normal(size=(2, M))
    out = np.asarray(
        st.dxf_diag_dxb(jnp.array(x), jnp.array(d), jnp.array(h))
    )
    for b in range(2):
        mat = _dxf(M, h[b, 0]) @ np.diag(d[b]) @ _dxb(M, h[b, 0])
        np.testing.assert_allclose(out[b], mat @ x[b], atol=1e-9)


def test_theta_mxc():
    theta = 0.71
    out = np.asarray(st.theta_op(jnp.array(x), theta))
    Mxc = (_eye_off(M, 1) + _eye_off(M, -1)) / 2
    for b in range(2):
        ref = (theta * np.eye(M) + (1 - theta) * Mxc) @ x[b]
        np.testing.assert_allclose(out[b], ref, atol=1e-12)


def test_mask_and_dirichlet():
    n = jnp.array([5.0, 30.0])
    out = np.asarray(st.mask_live(jnp.array(x), n))
    assert np.all(out[0, 5:] == 0) and np.all(out[0, :5] == x[0, :5])
    d = np.asarray(st.dirichlet(jnp.array(x), jnp.array([4.0, 31.0])))
    assert d[0, 0] == 0 and d[0, 4] == 0 and d[0, 3] == x[0, 3]
    assert d[1, 0] == 0 and d[1, 31] == 0


def test_interp_linear_matches_numpy():
    B, M_in, M_out = 2, 40, 64
    v = rng.normal(size=(B, M_in))
    n_in = np.array([40.0, 17.0])
    n_out = np.array([64.0, 33.0])
    out = np.asarray(
        st.interp_linear(jnp.array(v), jnp.array(n_in), jnp.array(n_out), M_out)
    )
    for b in range(B):
        ni, no = int(n_in[b]), int(n_out[b])
        src = np.arange(no) * (ni - 1) / (no - 1)
        ref = np.interp(src, np.arange(ni), v[b, :ni])
        np.testing.assert_allclose(out[b, :no], ref, atol=1e-9)
        assert np.all(out[b, no:] == 0)


def test_triangular_profile():
    n = jnp.array([21.0])
    p_x = jnp.array([0.5])
    p_a = jnp.array([1.0])
    out = np.asarray(st.triangular(32, n, p_x, p_a))[0]
    assert out[0] == 0 and abs(out[20]) < 1e-12  # ends at zero over live region
    assert out.max() > 0.9  # peak near p_a
    assert np.all(out[21:] == 0)


def test_raised_cosine_normalised():
    n = jnp.array([63.0])
    out = np.asarray(st.raised_cosine(n, jnp.array([0.5]), jnp.array([0.2]), 64))
    np.testing.assert_allclose(np.abs(out).sum(), 1.0, atol=1e-9)


def test_floor_dirac_delta():
    out = np.asarray(st.floor_dirac_delta(jnp.array([63.0]), jnp.array([0.5]), 64))
    assert out[0].sum() == 1.0 and out[0, 31] == 1.0


def test_domain_x():
    out = np.asarray(st.domain_x(10, jnp.array([8.0])))[0]
    np.testing.assert_allclose(out[0], -0.5)
    np.testing.assert_allclose(out[4], 0.0, atol=1e-12)
    np.testing.assert_allclose(out[8], 0.5)
    np.testing.assert_allclose(out[9], 0.5)  # saturates past live region
