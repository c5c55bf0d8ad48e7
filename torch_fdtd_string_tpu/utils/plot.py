"""Plotting / visualisation artifacts (matplotlib; librosa/ffmpeg-free).

Covers the artifact set of reference ``src/utils/plot.py`` that the tasks
emit: spectrogram "rainbowgram" panels, f0 overlays, phase diagrams,
simulation parameter panels, and the string-motion video (mp4 via ffmpeg if
present, else an .npz + preview frames).
"""

from __future__ import annotations

import os
import shutil
import subprocess

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from .audio import stft_mag


def rainbowgram(path, wav, sr, f0_input=None, n_fft=1024, hop=256, colorbar=False):
    """Log-magnitude spectrogram with phase-derivative coloring
    (reference plot.py:325-394's role)."""
    wav = np.asarray(wav, np.float64)
    window = np.hanning(n_fft)
    pad = n_fft // 2
    xp = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(xp) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    spec = np.fft.rfft(xp[idx] * window, axis=-1)
    mag = np.abs(spec).T
    phase = np.unwrap(np.angle(spec), axis=0).T
    dphase = np.diff(phase, axis=1, prepend=phase[:, :1])

    fig, ax = plt.subplots(figsize=(6, 4))
    logmag = 20 * np.log10(mag + 1e-8)
    extent = [0, len(wav) / sr, 0, sr / 2]
    im = ax.imshow(
        logmag,
        origin="lower",
        aspect="auto",
        extent=extent,
        cmap="magma",
        vmin=logmag.max() - 100,
        vmax=logmag.max(),
    )
    ax.imshow(
        dphase,
        origin="lower",
        aspect="auto",
        extent=extent,
        cmap="rainbow",
        alpha=0.25,
    )
    if f0_input is not None:
        t = np.linspace(0, len(wav) / sr, len(np.atleast_1d(f0_input)))
        ax.plot(t, np.atleast_1d(f0_input), "w--", lw=0.8, label="input f0")
        ax.legend(loc="upper right", fontsize=7)
        ax.set_ylim(0, min(4 * float(np.max(f0_input)) + 200, sr / 2))
    if colorbar:
        fig.colorbar(im, ax=ax)
    ax.set_xlabel("time (s)")
    ax.set_ylabel("freq (Hz)")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def phase_diagram(path, wav, sr, tau=1, label=r"$u$"):
    """(u, du/dt) phase portrait (reference plot.py:396+)."""
    wav = np.asarray(wav, np.float64)
    d = (wav[tau:] - wav[:-tau]) / (tau / sr)
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.plot(wav[:-tau], d, lw=0.2)
    ax.set_xlabel(label)
    ax.set_ylabel(f"d{label}/dt")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def simulation_plots(directory, uout, zout, target_f0, sr):
    """Spec + f0 + phase panels for one simulated item (simulate.py:440-447)."""
    os.makedirs(directory, exist_ok=True)
    rainbowgram(f"{directory}/spec.pdf", uout, sr)
    rainbowgram(f"{directory}/f0.pdf", uout, sr, f0_input=target_f0)
    wout = uout + zout
    phase_diagram(f"{directory}/phs.pdf", wout, sr, label=r"$\xi$")
    phase_diagram(f"{directory}/phs-u.pdf", uout, sr, label="$u$")
    phase_diagram(f"{directory}/phs-z.pdf", zout, sr, label=r"$\zeta$")


def simulation_data(directory, uout, zout, state_u, f0, sr, **extra):
    """Parameter/diagnostic panel (reference plot.py:84-217's role)."""
    os.makedirs(directory, exist_ok=True)
    fig, axes = plt.subplots(2, 2, figsize=(10, 6))
    t = np.arange(len(uout)) / sr
    axes[0, 0].plot(t, uout, lw=0.3)
    axes[0, 0].set_title("pickup u")
    axes[0, 1].plot(t, zout, lw=0.3)
    axes[0, 1].set_title("pickup z")
    if state_u is not None:
        axes[1, 0].imshow(
            state_u[:: max(1, len(state_u) // 500)].T,
            aspect="auto",
            origin="lower",
            cmap="RdBu",
        )
        axes[1, 0].set_title("state u(x, t)")
    f0 = np.atleast_1d(f0)
    axes[1, 1].plot(np.linspace(0, t[-1] if len(t) else 1, len(f0)), f0)
    axes[1, 1].set_title("f0 (Hz)")
    fig.tight_layout()
    fig.savefig(f"{directory}/simulation_data.pdf", dpi=120)
    plt.close(fig)


def state_video(directory, state_u, sr, fps=30, trim_front=False, max_frames=240):
    """String-motion animation (reference plot.py:270-323).

    Renders frames with matplotlib and assembles an mp4 via ffmpeg when
    available; always saves ``string_state.npz`` for offline inspection.
    """
    os.makedirs(directory, exist_ok=True)
    state_u = np.asarray(state_u)
    np.savez_compressed(f"{directory}/string_state.npz", state_u=state_u)

    if trim_front:
        state_u = state_u[2:]
    stride = max(1, len(state_u) // max_frames)
    frames = state_u[::stride]
    vmax = np.abs(state_u).max() + 1e-12

    tmp = f"{directory}/_frames"
    os.makedirs(tmp, exist_ok=True)
    for i, row in enumerate(frames):
        fig, ax = plt.subplots(figsize=(5, 2.2))
        ax.plot(row)
        ax.set_ylim(-vmax, vmax)
        ax.set_title(f"t = {i * stride / sr:.3f}s")
        fig.tight_layout()
        fig.savefig(f"{tmp}/{i:05d}.png", dpi=80)
        plt.close(fig)
    if shutil.which("ffmpeg"):
        subprocess.run(
            [
                "ffmpeg",
                "-y",
                "-loglevel",
                "quiet",
                "-framerate",
                str(fps),
                "-i",
                f"{tmp}/%05d.png",
                "-pix_fmt",
                "yuv420p",
                f"{directory}/string_state.mp4",
            ],
            check=False,
        )
        shutil.rmtree(tmp, ignore_errors=True)


def time_scaling_figure(path, results):
    """CPU/TPU scaling curves (reference plot.py:821-923's role).

    ``results``: dict axis_name -> list of (x, seconds) tuples per device.
    """
    fig, axes = plt.subplots(1, len(results), figsize=(4 * len(results), 3))
    if len(results) == 1:
        axes = [axes]
    for ax, (name, curves) in zip(axes, results.items()):
        for label, pts in curves.items():
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            ys = [y / ys[0] for y in ys]
            ax.plot(xs, ys, marker="o", label=label)
        ax.set_xlabel(name)
        ax.set_ylabel("relative time")
        ax.set_xscale("log")
        ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
