"""Unit tests: config composer, WAV I/O, audio utils, DDSP ops, losses, f0."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "torch_fdtd_string_tpu",
    "configs",
)


def test_config_composer_precedence():
    from torch_fdtd_string_tpu.utils.config import compose

    cfg = compose(CONFIG_DIR, ["experiment=nsynth-like", "task.num_samples=3"])
    assert cfg.task._name_ == "simulate"
    assert cfg.task.num_samples == 3  # CLI beats experiment beats task default
    assert cfg.task.batch_size == 24  # experiment beats task default
    assert cfg.model.excitation == "pluck"
    assert cfg.proc.simulate is True

    cfg2 = compose(CONFIG_DIR, ["experiment=synth-dmsp", "optimizer=adamw"])
    assert cfg2.optimizer._name_ == "adamw"
    assert cfg2.optimizer.lr == 0.001  # experiment body overrides group default
    assert cfg2.scheduler._name_ == "noam"
    assert cfg2.model.n_modes == 40


def test_config_interpolation_and_missing():
    from torch_fdtd_string_tpu.utils.config import compose

    cfg = compose(CONFIG_DIR, [])
    assert cfg.task.result_dir.startswith("na-")  # unresolvable refs -> "na"
    cfg2 = compose(CONFIG_DIR, ["experiment=nsynth-like"])
    assert cfg2.task.load_config is None  # experiment overrides ??? with null


@pytest.mark.parametrize("subtype", ["PCM_16", "PCM_24", "PCM_32", "FLOAT"])
def test_wav_roundtrip(tmp_path, subtype):
    from torch_fdtd_string_tpu.utils import wav as wavio

    rng = np.random.default_rng(0)
    x = np.clip(rng.normal(0, 0.3, 4801), -1, 1)
    p = tmp_path / f"{subtype}.wav"
    wavio.write(str(p), x, 48000, subtype)
    y, sr = wavio.read(str(p))
    assert sr == 48000 and y.shape == x.shape
    tol = {"PCM_16": 1e-4, "PCM_24": 1e-6, "PCM_32": 1e-8, "FLOAT": 1e-7}[subtype]
    np.testing.assert_allclose(y, x, atol=tol)


def test_audio_utils():
    from torch_fdtd_string_tpu.utils import audio

    x = np.sin(np.linspace(0, 100, 48000)) * 0.25
    xn, gain = audio.ell_infty_normalize(x)
    assert abs(np.abs(xn).max() - 1.0) < 1e-6
    assert audio.dB_RMS(np.zeros(100)) < -200
    # T60_to_sigma numpy twin matches the jnp version
    from torch_fdtd_string_tpu.ops.fdm import t60_to_sigma

    T60 = np.array([[[1000.0, 20.0], [100.0, 25.0]]])
    g = np.array([220.0])
    K = np.array([4.4])
    s0_np, s1_np = audio.T60_to_sigma(T60, g, K)
    s0_j, s1_j = t60_to_sigma(jnp.asarray(T60), jnp.asarray(g), jnp.asarray(K))
    np.testing.assert_allclose(s0_np, np.asarray(s0_j), rtol=1e-6)
    np.testing.assert_allclose(s1_np, np.asarray(s1_j), rtol=1e-6)


def test_ddsp_ops():
    from torch_fdtd_string_tpu.ops import ddsp

    # upsample: constant stays constant; length multiplies
    x = jnp.ones((2, 10, 3)) * 5.0
    y = ddsp.upsample(x, 4)
    assert y.shape == (2, 40, 3)
    np.testing.assert_allclose(np.asarray(y), 5.0, atol=1e-6)

    # fft_convolve identity: in the reference's padding convention
    # (signal right-padded, kernel left-padded, keep the second half) a
    # delta at kernel index 0 reproduces the input
    n = 64
    sig = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, n)))
    delta = jnp.zeros((1, 2, n)).at[..., 0].set(1.0)
    out = ddsp.fft_convolve(sig, delta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sig), atol=1e-5)

    # amp_to_impulse_response returns a real FIR of the target size
    amp = jnp.ones((1, 2, 9))
    ir = ddsp.amp_to_impulse_response(amp, 32)
    assert ir.shape == (1, 2, 32)
    assert np.isrealobj(np.asarray(ir))

    # nyquist mask
    amps = jnp.ones((1, 1, 4))
    freqs = jnp.asarray([[[100.0, 1000.0, 30000.0, 100.0]]])
    m = ddsp.remove_above_nyquist_mode(amps, freqs, 48000)
    assert np.asarray(m)[0, 0, 2] < 1e-3 and np.asarray(m)[0, 0, 0] > 0.99

    s = ddsp.scale_function(jnp.asarray([-100.0, 0.0, 100.0]))
    s = np.asarray(s)
    assert s[0] < 1e-5 and abs(s[1] - 2 * 0.5 ** np.log(10)) < 1e-4 and s[2] <= 2.001


def test_modal_synth_pure_tone():
    from torch_fdtd_string_tpu.ops.modal import modal_synth

    sr, f = 48000, 440.0
    Nt = 4800
    w = 2 * np.pi * f / sr
    freqs = jnp.full((1, Nt, 1), w)
    coefs = jnp.ones((1, 1, 1))
    damps = jnp.ones((1, Nt, 1))
    y = np.asarray(modal_synth(freqs, coefs, damps))[0, :, 0]
    spec = np.abs(np.fft.rfft(y * np.hanning(Nt)))
    peak = np.fft.rfftfreq(Nt, 1 / sr)[spec.argmax()]
    assert abs(peak - f) < 15


def test_losses_sanity():
    from torch_fdtd_string_tpu.models.losses import build_loss_registry, si_sdr

    reg = build_loss_registry(48000, 4800)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4800)) * 0.1)
    y = x + 0.01 * jnp.asarray(rng.normal(size=(2, 4800)))

    for name in ["l1", "sisdr", "fft", "magspec", "melspec"]:
        fn, _ = reg[name]
        same = float(np.asarray(fn(x, x)))
        diff = float(np.asarray(fn(x, y)))
        assert diff > same - 1e-6, name
    assert float(np.asarray(si_sdr(x, x)).mean()) > 60


def test_f0_tracker_sweep():
    from torch_fdtd_string_tpu.utils.frequency import compute_harmonic_parameters

    sr = 48000
    t = np.arange(sr) / sr
    f_true = 196.0
    x = np.sin(2 * np.pi * f_true * t) * np.exp(-2 * t)
    out = compute_harmonic_parameters(x, sr)
    f0 = out["f0"]
    voiced = f0 > 0
    assert abs(np.median(f0[voiced]) - f_true) < 2.0


def test_stack_batch_and_set_length():
    from torch_fdtd_string_tpu.utils.data import set_length, stack_batch

    x = np.arange(10.0)
    assert set_length(x, 16, "pad").shape == (16,)
    assert set_length(x, 5, "interpolate").shape == (5,)
    batch = [
        {"u_in": np.random.rand(100, 8), "f0": np.random.rand(100), "kappa": np.array(0.01)}
        for _ in range(3)
    ]
    out = stack_batch(batch, Nx=16, Nt=50, x_method="pad", t_method="sequential")
    assert out["u_in"].shape == (3, 50, 16)
    assert out["f0"].shape == (3, 50)
    assert out["kappa"].shape == (3,)


def test_yin_robustness_hard_cases():
    """VERDICT round-1 item 9: octave-safe f0 tracking on a bowed sim, a
    strongly inharmonic (kappa=0.08) pluck, and a 0 dB-SNR noisy tone.
    (The reference uses CREPE-viterbi, frequency.py:4-9; YIN replaces it.)"""
    import numpy as np

    from torch_fdtd_string_tpu.ops import fdm
    from torch_fdtd_string_tpu.tasks import simulate as sim_task
    from torch_fdtd_string_tpu.utils.frequency import track_f0

    sr = 48000
    rng = np.random.default_rng(0)

    def tracked(wav):
        f0, _ = track_f0(wav / (np.abs(wav).max() + 1e-12), sr)
        v = f0[f0 > 0]
        assert len(v) > 5
        return np.median(v), v

    def octave_frac(v, truth):
        r = v / truth
        return np.mean((np.abs(r - 2.0) < 0.2) | (np.abs(r - 0.5) < 0.1))

    # --- noisy inharmonic tone at 0 dB SNR: estimate must not shift/jump
    f0v, B = 196.0, 0.002
    t = np.arange(sr) / sr
    clean = sum(
        (0.5 / k) * np.sin(2 * np.pi * k * f0v * np.sqrt(1 + B * k**2) * t)
        for k in range(1, 13)
    )
    med_clean, _ = tracked(clean)
    noisy = clean + rng.normal(0, clean.std(), len(clean))
    med_noisy, v_noisy = tracked(noisy)
    assert octave_frac(v_noisy, med_clean) < 0.01
    assert abs(med_noisy - med_clean) / med_clean < 0.01

    # --- strongly inharmonic pluck: YIN lands on the Fletcher mode-1
    theta = fdm.get_theta(0.08, 110.0, sr)
    res, _, _ = sim_task.simulate(
        "pluck", sr, theta, 0.5, 1, 110.0, 1.0, 1.0, cpu=True,
        string_kwargs=dict(
            f0_min=110.0, f0_max=110.0, f0_mod_max=0.0, f0_diff_max=0.0,
            kappa_min=0.08, kappa_max=0.08, alpha_min=1.0, alpha_max=1.0,
            p_a_min=0.01, p_a_max=0.01, p_x_min=0.3, p_x_max=0.3,
            precorrect=False,
        ),
        rng=np.random.default_rng(1), precision="single", collect_state=False,
    )
    mode1 = float(np.asarray(fdm.stiff_string_modes(110.0, 0.08, 1)[0][0]))
    med, v = tracked(res[0][0])
    assert abs(med - mode1) / mode1 < 0.01, (med, mode1)
    assert octave_frac(v, mode1) < 0.01

    # --- bowed string: mode-locks to (near) the input fundamental; the
    # track must sit within 1.5% of it with zero octave jumps
    res, _, _ = sim_task.simulate(
        "bow", sr, theta, 0.5, 1, 110.0, 1.0, 1.0, cpu=True,
        string_kwargs=dict(
            f0_min=196.0, f0_max=196.0, f0_mod_max=0.0, f0_diff_max=0.0,
            kappa_min=0.02, kappa_max=0.02, alpha_min=1.0, alpha_max=1.0,
            p_a_min=0.0, p_a_max=0.0, p_x_min=0.3, p_x_max=0.3,
        ),
        rng=np.random.default_rng(2), precision="single", collect_state=False,
    )
    uout = res[0][0]
    assert np.abs(uout).max() > 1e-9  # the bow actually excited the string
    med, v = tracked(uout)
    assert abs(med - 196.0) / 196.0 < 0.015, med
    assert octave_frac(v, 196.0) < 0.01


def test_spline_matrix_matches_scipy_bivariate():
    """GEMM spline operator vs the classic RectBivariateSpline path on a
    smooth string-like field (same data, same quintic order)."""
    from torch_fdtd_string_tpu.utils import data

    rng = np.random.default_rng(0)
    Nt, Nu, Nx = 400, 120, 256
    x = np.linspace(0, 1, Nu)
    t = np.arange(Nt, dtype=np.float64)[:, None] / 48000.0
    modes = np.sin(np.pi * np.arange(1, 9)[:, None] * x[None, :])  # (8, Nu)
    coef = rng.standard_normal((Nt, 8)) * (1.0 / np.arange(1, 9) ** 2)
    ut = coef @ modes  # smooth in x

    ref = data.interpolate(ut, t, x, np.linspace(0, 1, Nx), kx=5, ky=5)
    gem = ut.astype(np.float32) @ data.spline_matrix(Nu, Nx, k=5).T
    scale = np.abs(ref).max()
    assert np.abs(gem - ref).max() < 2e-5 * scale, np.abs(gem - ref).max() / scale

    # width-grouped helper: uniform widths reduce to the single GEMM
    up = data.upsample_columns(ut, np.full(Nt, Nu), Nx, k=5)
    np.testing.assert_allclose(up, gem, rtol=0, atol=1e-6 * scale)


def test_modal_synth_np_matches_device():
    from torch_fdtd_string_tpu.ops.modal import (
        modal_synth_nyquist,
        modal_synth_nyquist_np,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    Nt, n, Nx = 2000, 24, 16
    sr = 48000.0
    freq_tv = (0.005 + 0.12 * rng.random(n))[None, :] * np.ones((Nt, 1))
    amps = rng.standard_normal((Nx, n)).astype(np.float32) * 0.01
    damp = np.exp(-np.arange(Nt) / sr * 3.0)

    dev = np.asarray(
        modal_synth_nyquist(
            jnp.asarray(freq_tv[None], jnp.float32),
            jnp.asarray(amps[:, None, :]),
            jnp.asarray(damp[None, :, None], jnp.float32),
            sr,
        )
    )[:, :, 0].T
    host = modal_synth_nyquist_np(freq_tv, amps, damp, sr)
    scale = np.abs(dev).max()
    # device accumulates phase in f32; host in f64 — bounded drift only
    assert np.abs(host - dev).max() < 2e-3 * scale


def test_pde_bc_ic_losses():
    """PDE scaffolding losses (reference loss.py:219-266 twins): the exact
    analytic MMS field should have a (near-)zero interior residual for its
    own PDE while a corrupted field scores higher; BC/IC behave as L1s."""
    import jax.numpy as jnp

    from torch_fdtd_string_tpu.models.losses import (
        bc_loss, ic_loss, pde_loss, fdtd_residual,
    )
    from torch_fdtd_string_tpu.models.objective import build_metric_registry

    B, Nt, Nx = 2, 64, 33
    sr = 48000.0
    f0 = np.full(B, 110.0)
    kappa = np.zeros(B)  # non-stiff -> plain wave equation
    sig0 = np.zeros(B)
    sig1 = np.zeros(B)
    x = np.linspace(0, 1, Nx)
    t = np.arange(Nt) / sr
    gamma = 2 * f0[0]
    # exact d'Alembert mode: sin(pi x) cos(gamma pi t) solves
    # u_tt = gamma^2 u_xx with c = gamma
    u = (np.sin(np.pi * x)[None, None, :]
         * np.cos(np.pi * gamma * t)[None, :, None])
    u = np.tile(u, (B, 1, 1))

    r_exact = float(fdtd_residual(jnp.asarray(u), x, t, f0, kappa, sig0, sig1))
    rng = np.random.default_rng(0)
    u_bad = u + 0.1 * rng.standard_normal(u.shape)
    r_bad = float(fdtd_residual(jnp.asarray(u_bad), x, t, f0, kappa, sig0, sig1))
    # exact solution: residual is pure discretization error, orders below
    # the corrupted field's
    assert r_bad > 100 * r_exact, (r_exact, r_bad)

    assert float(bc_loss(jnp.zeros((B, 4)))) == 0.0
    assert abs(float(ic_loss(jnp.ones((B, 5)), jnp.zeros((B, 5)))) - 1.0) < 1e-7

    total = float(pde_loss(
        jnp.asarray(u), u[:, 0, :], x, t, f0, kappa, sig0, sig1,
    ))
    assert np.isfinite(total)

    reg = build_metric_registry()
    metric, keys = reg["pde"]
    assert keys[0] == "pde_preds"
    metric.update(jnp.asarray(u), u[:, 0, :], x, t, f0, kappa, sig0, sig1)
    assert np.isfinite(metric.compute())


def test_rde_specs_artifacts(tmp_path):
    """rde_specs writes the reference's full RDE artifact set
    (plot.py:1005-1135 + PlotRDE): spec tables, state panels, per-factor
    wavs and the rde.txt table."""
    from torch_fdtd_string_tpu.utils import plot as uplot

    sr = 16000
    t = np.arange(sr // 4) / sr
    factors = [0.9, 1.0]
    mk = lambda f: {
        "wav": [np.sin(2 * np.pi * 220 * fc * f * t) for fc in factors],
        "state": [
            np.random.default_rng(0).standard_normal((sr // 8, 16, 2)) * 1e-3
            for _ in factors
        ],
    }
    paths = uplot.rde_specs(str(tmp_path), factors, mk(1.0), mk(1.001), sr)
    import os as _os

    for p in paths:
        assert _os.path.exists(p), p
    names = {_os.path.basename(p) for p in paths}
    assert {"rde-mag.png", "rde-mel.png", "rde-state-pinn-u.png",
            "rde-state-fdtd-z.png", "rde.txt"} <= names
    lines = open(str(tmp_path) + "/rde.txt").read().strip().splitlines()
    assert lines[0] == "factor\trde_percent" and len(lines) == 3


def test_summarize_mixed_headers(tmp_path, capsys):
    """A results dir mixing two per-item string_params.txt formats (same
    width, renamed column) must keep ONE header's rows and report the drop,
    never merge positionally (ADVICE r2: header-tuple keying)."""
    from torch_fdtd_string_tpu.tasks.summarize import summarize

    old = ["id", "kappa", "alpha"]
    new = ["id", "kappa", "p_x"]  # same width, different meaning
    for i, keys in enumerate([new, new, old]):
        d = tmp_path / f"item{i}"
        d.mkdir()
        with open(d / "string_params.txt", "w") as f:
            for j, k in enumerate(keys):
                f.write(f"{k}\t{float(i + j):.4f}\n")

    stats = summarize(str(tmp_path))
    assert stats is not None
    out = capsys.readouterr().out
    assert "mixed column formats" in out and "dropping 1" in out
    # summary carries the kept (most common) header, not the dropped one
    header = open(tmp_path / "summary.txt").readline().strip().split("\t")
    assert header == ["stat"] + new
    # two rows aggregated: mean of ids 0,1 = 0.5
    mean_line = [l for l in open(tmp_path / "summary.txt")
                 if l.startswith("mean")][0].split("\t")
    assert abs(float(mean_line[1]) - 0.5) < 1e-6


def test_rainbowgram_hsv_smoke(tmp_path):
    """Reference-style hsv/log-axis rainbowgram with overlays renders
    (reference plot.py:325-394 twin)."""
    import numpy as np

    from torch_fdtd_string_tpu.utils.plot import rainbowgram_hsv

    sr = 48000
    t = np.arange(sr // 2) / sr
    wav = sum(
        (0.5 / k) * np.sin(2 * np.pi * k * 220.0 * t) * np.exp(-3 * t)
        for k in range(1, 8)
    )
    out = tmp_path / "rb.png"
    rainbowgram_hsv(
        str(out), wav, sr,
        f0_input=220.0 * np.ones(20),
        f0_estimate=221.0 * np.ones(20),
        modes=[220.0 * k * np.ones(20) for k in (1, 2)],
    )
    assert out.exists() and out.stat().st_size > 10_000
