"""Device-postprocessing parity: vectorised YIN twins and the on-device
fused upsample against the host reference path (``build_processed``)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from torch_fdtd_string_tpu.ops import fdm, postproc  # noqa: E402
from torch_fdtd_string_tpu.utils import data as udata  # noqa: E402
from torch_fdtd_string_tpu.utils import frequency as ufreq  # noqa: E402

SR = 48000


def _tone(f0=220.0, Nt=24000, decay=3.0, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(Nt) / SR
    w = np.sin(2 * np.pi * f0 * t) * np.exp(-decay * t)
    w += 0.3 * np.sin(2 * np.pi * 2.01 * f0 * t) * np.exp(-decay * 1.5 * t)
    if noise:
        w += noise * rng.standard_normal(Nt)
    return w


class TestVectorYin:
    def test_matches_loop_clean(self):
        w = _tone(220.0)
        f_vec, t_vec = ufreq.track_f0(w, SR)
        f_loop, t_loop = ufreq.track_f0_loop(w, SR)
        np.testing.assert_allclose(t_vec, t_loop)
        np.testing.assert_allclose(f_vec, f_loop, rtol=1e-9, atol=1e-9)

    def test_matches_loop_noisy(self):
        w = _tone(130.8, noise=0.03, seed=3)
        f_vec, _ = ufreq.track_f0(w, SR)
        f_loop, _ = ufreq.track_f0_loop(w, SR)
        np.testing.assert_allclose(f_vec, f_loop, rtol=1e-9, atol=1e-9)

    def test_silent_and_edges(self):
        w = np.zeros(SR // 2)
        f_vec, _ = ufreq.track_f0(w, SR)
        assert np.all(f_vec == 0.0)

    def test_jnp_twin(self):
        wavs = np.stack([_tone(220.0), _tone(392.0, seed=1)])
        f_dev = np.asarray(postproc.yin_track(jnp.asarray(wavs, jnp.float32), SR))
        for b, w in enumerate(wavs):
            f_host, _ = ufreq.track_f0(w, SR)
            voiced = f_host > 0
            # f32 device vs f64 host: accept sub-cent deviation on voiced
            # frames and identical voicing decisions on >95% of frames
            agree = np.isclose(f_dev[b], f_host, rtol=2e-3, atol=1e-2)
            assert agree[voiced].mean() > 0.95, (b, f_dev[b][~agree], f_host[~agree])


def _sim_like_state(B=3, Nt=1200, M=48, seed=0):
    """A smooth synthetic 'state field' with engine-consistent widths."""
    rng = np.random.default_rng(seed)
    k = 1.0 / SR
    theta_t = 0.581
    lambda_c = 1.0
    f0 = np.stack([
        220.0 * (1.0 + 0.04 * np.sin(np.linspace(0, 3.0, Nt) + rng.uniform(0, 6)))
        * (1.0 + 0.3 * rng.uniform(-1, 1))
        for _ in range(B)
    ]).astype(np.float32) * 4.0  # scale f0 up so widths fit inside small M
    kappa = rng.uniform(0.01, 0.03, B).astype(np.float32)
    nx = np.stack([
        fdm.grid_widths_np(f0[b], float(kappa[b]), k, theta_t, lambda_c)
        for b in range(B)
    ])
    widths = np.minimum(nx.astype(np.int64) + 1, M)
    assert widths.max() < M, "test setup: widths must fit in M"
    su = np.zeros((B, Nt, M), np.float32)
    for b in range(B):
        for t in range(Nt):
            w = widths[b, t]
            xs = np.linspace(0, 1, w)
            su[b, t, :w] = np.sin(np.pi * xs) * np.cos(0.01 * t) + \
                0.2 * np.sin(2 * np.pi * xs) * np.sin(0.013 * t)
    return su, f0, kappa, widths, k, theta_t, lambda_c


class TestDevicePostproc:
    def test_matches_host_upsample(self):
        su, f0, kappa, widths, k, theta_t, lambda_c = _sim_like_state()
        B, Nt, M = su.shape
        x_keep = np.arange(0, 256, 16)
        K = len(x_keep)
        O = postproc.spline_operator_stack(M, x_keep)

        out = jax.device_get(postproc.postprocess_batch(
            jnp.asarray(su[:, 2:].transpose(1, 0, 2)),
            jnp.asarray(su[:, 1]), jnp.asarray(su[:, 0]),
            jnp.asarray(f0[:, :2]), jnp.asarray(f0[:, 2:]),
            jnp.asarray(kappa), jnp.asarray(O),
            k=k, theta_t=theta_t, lambda_c=lambda_c, sr=SR, G=32,
        ))
        assert out["ut_keep"].shape == (B, Nt, K)

        for b in range(B):
            ut_ref = udata.upsample_columns(su[b], widths[b], 256)
            np.testing.assert_allclose(
                out["ut_keep"][b].astype(np.float32),
                ut_ref[:, x_keep],
                atol=3e-3,  # f16 output quantisation
            )
            uts_ref = ut_ref.sum(axis=1)
            vt_ref = uts_ref[1:] - uts_ref[:-1]
            # device diff is f32 (host-twin math); f16 only rounds the
            # shipped result
            np.testing.assert_allclose(
                out["vt"][b].astype(np.float32), vt_ref,
                rtol=2e-3, atol=2e-3 * max(np.abs(vt_ref).max(), 1e-6),
            )
            live_max = max(
                np.abs(su[b, t, : widths[b, t]]).max() for t in range(Nt)
            )
            np.testing.assert_allclose(out["umax"][b], live_max, rtol=1e-6)

    def test_host_spread_guard(self):
        _, f0, kappa, widths, k, theta_t, lambda_c = _sim_like_state()
        spread = postproc.host_widths_spread(f0, kappa, k, theta_t, lambda_c)
        assert spread == int((widths.max(1) - widths.min(1)).max())
        assert spread < 32


class TestModalTargetHost:
    def test_against_build_processed_pieces(self):
        """ua/mode data from modal_target_host match the build_processed
        formulas (same spline chain, f64 phases)."""
        rng = np.random.default_rng(5)
        Nt = 6000
        f0 = 220.0 * (1 + 0.01 * np.sin(np.linspace(0, 2, Nt)))
        T60 = np.array([[100.0, 12.0], [2000.0, 9.0]])
        x_keep = np.arange(0, 256, 16)
        u0 = np.sin(np.pi * np.linspace(0, 1, 256)) * 0.01
        ua_keep, uas, mf, ma, ua_f0 = postproc.modal_target_host(
            u0, f0, 0.02, T60, Nt, SR, x_keep
        )
        assert ua_keep.shape == (Nt, len(x_keep))
        assert ma.shape == (len(mf), len(x_keep))
        assert np.isfinite(ua_keep).all() and np.isfinite(ua_f0).all()
        # the full-grid sum column must equal the sum of a dense resynthesis
        Na = 1024
        u0_a = u0 @ udata.spline_matrix(256, Na, k=5).T
        from torch_fdtd_string_tpu.core import analytic
        _, mf2, ma2 = analytic.lossy_stiff_string(
            u0_a, f0, 0.02, T60, Nt, Na, SR, strict=False, return_field=False
        )
        np.testing.assert_allclose(mf, mf2)
        # mode amplitudes on kept columns equal dense-grid slice
        ma_dense = ma2 @ udata.spline_matrix(Na, 256, k=5).T
        np.testing.assert_allclose(ma, ma_dense[:, x_keep], rtol=1e-5, atol=1e-7)
