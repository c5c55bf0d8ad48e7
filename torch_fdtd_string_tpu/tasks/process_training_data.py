"""Preprocess simulation results into DMSP training data.

Counterpart of reference ``src/task/process_training_data.py``: per
simulation directory, spatially upsample the FDTD field to a fixed grid,
compute the analytic modal solution (mode freqs/shapes), synthesise the
modal target waveform, track f0 of both, and write the per-x wav layout +
``parameters.npz`` the datasets consume.

Host/accelerator split: spline upsampling + transcendental root finding
stay on the host (scipy); the modal oscillator bank runs as a jitted jnp
cosine bank (``ops/modal.py``) instead of the reference's chunked CUDA loop.
"""

from __future__ import annotations

import math
import os
from glob import glob

import numpy as np
import yaml

try:
    import tqdm as _tqdm
except ImportError:  # pragma: no cover
    _tqdm = None

from ..core import analytic
from ..ops import fdm
from ..utils import audio, data
from ..utils.frequency import compute_harmonic_parameters


def is_processed(directory, N):
    """Idempotent-restart check (reference process_training_data.py:17-27)."""
    if not os.path.exists(directory):
        return False
    if len(glob(f"{directory}/ut-*.wav")) != N:
        return False
    if len(glob(f"{directory}/ua-*.wav")) != N:
        return False
    if len(glob(f"{directory}/vt.wav")) != 1:
        return False
    return os.path.exists(f"{directory}/parameters.npz")


def _rms(x, eps=1e-18):
    m = np.mean(x**2)
    return 1.0 if m < eps else np.sqrt(m)


def load_data(dirs):
    out = []
    for name in ("simulation", "string_params", "bow_params", "hammer_params"):
        npz = np.load(f"{dirs}/{name}.npz")
        out.append({k: npz[k] for k in npz.keys()})
    return out


def t60_to_sigma_tv(T60, f0, K):
    """Time-varying (sig0, sig1) from per-sample f0 (reference
    process_training_data.py:65-84).  f0, K: (Nt,); T60: (2,2)."""
    gamma = 2.0 * f0
    zeta1 = -(gamma**2) + np.sqrt(
        gamma**4 + 4 * K**2 * (2 * math.pi * T60[0, 0]) ** 2
    )
    zeta2 = -(gamma**2) + np.sqrt(
        gamma**4 + 4 * K**2 * (2 * math.pi * T60[1, 0]) ** 2
    )
    sig0 = 6 * math.log(10) * (-zeta2 / T60[0, 1] + zeta1 / T60[1, 1]) / (zeta1 - zeta2)
    sig1 = 6 * math.log(10) * (1 / T60[0, 1] - 1 / T60[1, 1]) / (zeta1 - zeta2)
    return sig0, sig1


def build_processed(_sim, _str, _bow, _ham, theta_t, lambda_c, sr, Nx,
                    strict=True, device_synth=True, x_keep=None):
    """Shared in-memory preprocessing core.

    Consumes the four artifact dicts (same schema as the npz bundles,
    reference misc.py:235-299) and returns the ``overall`` dict for
    :func:`..utils.data.save`.  Used by both the classic disk path
    (:func:`save_upsampled_data`) and the fused simulate->dataset path
    (``tasks/simulate.run`` with ``task.fuse_preprocess``), which skips the
    full-state ``simulation.npz`` round-trip entirely.

    ``device_synth`` picks the jitted cosine bank (big-GEMM friendly) vs the
    host numpy twin (used inside simulate's writer threads so the modal
    field never crosses the device->host link).  ``x_keep`` optionally
    restricts the saved spatial columns (``task.save_x_stride``); the f0
    tracks / gain / vt stay full-grid.
    """
    ut = _sim["state_u"]  # (Nt, Nu)
    f0 = _str["f0"]  # (Nt,)
    kr = float(_str["kappa"])
    ts = _str["T60"]  # (2, 2)
    k = 1.0 / sr
    # Shared host-side grid-width helper (ops/fdm.grid_widths_np): runs in
    # plain numpy on the 1-core host (jnp dispatch costs seconds here) with
    # the simulator's dtype + the same epsilon-guarded floor as the engine,
    # so the live slice can't off-by-one at floor() boundaries.
    wdt = np.float64 if ut.dtype == np.float64 else np.float32
    nx_t = fdm.grid_widths_np(f0, kr, k, theta_t, lambda_c, dtype=wdt)

    Nt, Nu = ut.shape
    ki = max(min(5, int(nx_t.min()) - 1), 1)
    xi = np.linspace(0, 1, Nx)
    ti = np.arange(Nt, dtype=np.float64)[:, None] / sr

    # --- upsample the FDTD field to the fixed Nx grid --------------------
    # width-grouped GEMMs against cached spline operators (the reference
    # loops scipy splines over all 48k steps, process_training_data.py:141-148;
    # evaluating the tensor spline at its own time knots makes the time axis
    # exact, so only the spatial spline matters)
    widths = np.minimum(nx_t.astype(np.int64) + 1, Nu)[:Nt]
    ut = data.upsample_columns(ut, widths, Nx, k=ki)

    # --- analytic modal solution at Na, downsampled to Nx ----------------
    Na = 1024
    u0_a = ut[0] @ data.spline_matrix(Nx, Na, k=ki).T
    _, mode_freq, mode_amps = analytic.lossy_stiff_string(
        u0_a, f0, kr, ts, Nt, Na, sr, strict=strict, return_field=False
    )
    mode_amps = mode_amps @ data.spline_matrix(Na, Nx, k=5).T  # (n_modes, Nx)

    # --- time-varying modal frequencies (linear FM by f0 drift) ----------
    omega = f0 / sr * (2 * math.pi)  # rad/sample
    romg = omega - omega[0]  # (Nt,)
    mode_freq_tv = mode_freq[None, :] + romg[:, None]  # (Nt, n_modes)

    sig0_tv, _ = t60_to_sigma_tv(ts, f0, 2 * f0 * kr)
    damping = np.exp(-ti[:, 0] * sig0_tv)  # (Nt,)

    # --- modal synthesis (GEMM-contracted nyquist-masked cosine bank) ----
    if device_synth:
        import jax.numpy as jnp

        from ..ops.modal import modal_synth_nyquist

        ua = np.asarray(
            modal_synth_nyquist(
                jnp.asarray(mode_freq_tv[None, :, :]),  # (1, Nt, n)
                jnp.asarray(mode_amps.T[:, None, :]),  # (Nx, 1, n)
                jnp.asarray(damping[None, :, None]),  # (1, Nt, 1)
                float(sr),
            )
        )[:, :, 0].T  # (Nt, Nx)
    else:
        from ..ops.modal import modal_synth_nyquist_np

        ua = modal_synth_nyquist_np(mode_freq_tv, mode_amps.T, damping, sr)

    # --- f0 tracks of summed fields --------------------------------------
    uas = ua.sum(axis=1)
    uts = ut.sum(axis=1)
    ua_f0 = compute_harmonic_parameters(uas / _rms(uas), sr)["f0"]
    ut_f0 = compute_harmonic_parameters(uts / _rms(uts), sr)["f0"]

    gain = audio.ell_infty_normalize(ut.flatten())[1]
    vt = audio.state_to_wav(ut[None])[0]

    # u0 must stay on the FULL training grid (the IC input whose argmax
    # recovers p_x); capture it before any pickup-subset slicing
    u0_full = ut[0][None, :].copy()

    if x_keep is not None:
        x_keep = np.asarray(x_keep, np.int64)
        ut = ut[:, x_keep]
        ua = ua[:, x_keep]
        mode_amps = mode_amps[:, x_keep]
        xi = xi[x_keep]

    _str.pop("v0", None)
    _sim.pop("state_u", None)
    _sim.pop("state_z", None)
    _sim.update(
        ua_f0=ua_f0,
        ut_f0=ut_f0,
        mode_freq=mode_freq,
        mode_amps=mode_amps,
        x=xi[None, :],
        t=ti,
        ut=ut,
        ua=ua,
        vt=vt,
        gain=float(np.asarray(gain).squeeze()),
    )
    _str.update(u0=u0_full)
    _bow["ph0_B"] = _bow.pop("phi_0")
    _bow["ph1_B"] = _bow.pop("phi_1")
    _bow["wid_B"] = _bow.pop("wid_B")
    _ham["M_H"] = _ham.pop("M_r")
    _ham["a_H"] = _ham.pop("alpha")

    overall = {}
    overall.update(_sim)
    overall.update(_str)
    overall.update(_bow)
    overall.update(_ham)
    return overall


def save_upsampled_data(load_dir, save_dir, sr, Nx, strict=True):
    """Process one simulation directory (reference
    process_training_data.py:30-223)."""
    try:
        _sim, _str, _bow, _ham = load_data(load_dir)
    except FileNotFoundError:
        print(f"[preprocess] missing npz bundles in {load_dir}; skipping")
        return 0

    with open(f"{load_dir}/simulation_config.yaml") as f:
        constants = yaml.safe_load(f)
    overall = build_processed(
        _sim, _str, _bow, _ham, constants["theta_t"], constants["lambda_c"],
        sr, Nx, strict=strict,
    )
    data.save(save_dir, overall, sr=sr)
    return 1


def process(args):
    """Iterate sim dirs with process-level sharding (reference
    process_training_data.py:225-242)."""
    path_to_dir = os.path.join(args.task.root_dir, args.task.result_dir)
    subdirs = sorted(
        d
        for d in glob(f"{path_to_dir}/*")
        if os.path.isdir(d) and "codes" not in d and "_frames" not in d
    )
    if args.task.data_split > 1:
        subdirs = subdirs[args.task.split_n :: args.task.data_split]

    it = _tqdm.tqdm(subdirs) if _tqdm else subdirs
    for subdir in it:
        save_dir = subdir.replace(args.task.result_dir, args.task.save_dir)
        os.makedirs(save_dir, exist_ok=True)
        if is_processed(save_dir, args.task.Nx):
            continue
        save_upsampled_data(
            subdir, save_dir, args.task.sr, args.task.Nx, args.task.strict
        )
