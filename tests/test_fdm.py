import math

import jax.numpy as jnp
import numpy as np

from torch_fdtd_string_tpu.ops import fdm


def test_derived_vars_hand_values():
    # kappa_rel = 0: h_1 = gamma * k / sqrt(2 theta - 1); h_2 = gamma*alpha*k
    sr = 48000
    k = 1 / sr
    theta = 0.5 + 2 / math.pi**2  # => sqrt(2 theta - 1) = 2 / pi
    out = fdm.get_derived_vars(jnp.array([60.0]), jnp.array([0.0]), k, theta, 1.0, jnp.array([1.0]))
    gamma, K, N_t, h_t, N_l, h_l = [np.asarray(v) for v in out]
    assert gamma[0] == 120.0 and K[0] == 0.0
    assert N_l[0] == int(sr / 120.0)
    assert N_t[0] == int(2 * sr / (120.0 * math.pi))
    np.testing.assert_allclose(h_t[0], 1 / N_t[0])


def test_derived_vars_np_matches_jnp():
    sr, k = 48000, 1 / 48000
    theta = fdm.get_theta(0.03, 55.0, sr)
    a = fdm.get_derived_vars(jnp.array([55.0]), jnp.array([0.03]), k, theta, 1.0, jnp.array([3.0]))
    b = fdm.get_derived_vars_np(55.0, 0.03, k, theta, 1.0, 3.0)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x)[0], y, rtol=1e-12)


def test_get_theta_stability_bound():
    theta = fdm.get_theta(0.03, 55.0, 48000)
    assert 0.5 < theta < 1.0


def test_stiff_string_modes_fletcher():
    modes, factor = fdm.stiff_string_modes(100.0, np.array(0.02), p_max=3)
    B = (np.pi * 0.02) ** 2
    w1 = (1 + (2 / np.pi) * np.sqrt(B) + 4 / np.pi**2 * B) * np.sqrt(1 + B)
    np.testing.assert_allclose(factor[0], w1)
    assert modes[2] > 3 * modes[0]  # inharmonic stretching


def test_t60_to_sigma_lossless_and_lossy():
    T60 = jnp.array(
        [
            [[1000.0, 20.0], [100.0, 20.0]],
            [[1000.0, 0.0], [100.0, 0.0]],  # lossless
        ]
    )
    gamma = jnp.array([110.0, 110.0])
    K = jnp.array([3.3, 3.3])
    sig0, sig1 = fdm.t60_to_sigma(T60, gamma, K)
    sig0, sig1 = np.asarray(sig0), np.asarray(sig1)
    # equal T60 at both points => freq-independent loss: sig0 = 6ln10/T60
    np.testing.assert_allclose(sig0[0], 6 * np.log(10) / 20.0, rtol=1e-9)
    np.testing.assert_allclose(sig1[0], 0.0, atol=1e-12)
    assert sig0[1] == 0.0 and sig1[1] == 0.0


def test_vibrato_respects_f0_inf():
    """Vibrato troughs on the lowest strings are clamped at f0_inf so the
    static grid bound always holds (the reference crashes here,
    simulator.py:230-235 vs :277)."""
    import numpy as np

    from torch_fdtd_string_tpu.core import params as prm

    from torch_fdtd_string_tpu.ops import fdm

    theta = fdm.get_theta(0.03, 98.0, 48000)
    rng = np.random.default_rng(1234)
    for _ in range(8):
        st = prm.sample_string(
            rng, k=1.0 / 48000, theta_t=theta, lambda_c=1.0, sr=48000,
            length=0.05, f0_inf=98.0, alpha_inf=1.0, batch_size=16,
            f0_min=98.0, f0_max=110.0, f0_mod_max=0.08, f0_diff_max=30.0,
            sampling_f0="random",
        )
        assert np.isfinite(st.f0).all()
