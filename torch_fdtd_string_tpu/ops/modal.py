"""Modal additive synthesis (jnp, accelerator-friendly).

Counterparts of the reference's modal oscillator banks
(``process_training_data.py:52-63`` and ``src/utils/ddsp.py:132-149``):
phase-accumulating cosine banks evaluated as one fused cumsum + reduction —
no python-level chunk loop is needed under XLA (the reference chunks only to
bound torch's temporary memory).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def modal_synth(freqs, coefs, damps):
    """Damped cosine bank.

    Args (broadcastable):
      freqs: (..., Nt, n_modes) per-sample angular increments [rad/sample].
      coefs: (..., Nt|1, n_modes) mode amplitudes.
      damps: (..., Nt, 1) damping envelope.
    Returns (..., Nt, 1): sum_n cos(cumsum_t freqs) * coefs * damps.
    """
    phase = jnp.cumsum(freqs, axis=-2)
    return (jnp.cos(phase) * coefs * damps).sum(-1, keepdims=True)


@jax.jit
def harmonic_synth(f0, amplitudes, sr):
    """Sine bank at integer multiples of f0 (reference ddsp.py:132-137).

    f0: (..., Nt, 1) in Hz; amplitudes: (..., Nt, n_harm).
    """
    n_harm = amplitudes.shape[-1]
    omega = jnp.cumsum(2 * jnp.pi * f0 / sr, axis=-2)
    omegas = omega * jnp.arange(1, n_harm + 1)
    return (jnp.sin(omegas) * amplitudes).sum(-1, keepdims=True)


def remove_above_nyquist_mode(amplitudes, frequencies_hz, sr):
    """Suppress modes above Nyquist (reference process_training_data.py:45-50)."""
    aa = (frequencies_hz < sr / 2).astype(amplitudes.dtype) + 1e-4
    return amplitudes * aa


def modal_synth_nyquist_np(freq_tv, amps, damp, sr):
    """Host numpy twin of :func:`modal_synth_nyquist` for the fused
    simulate->dataset path, where the mode data is tiny and synthesising on
    the host avoids pulling the (Nt, Nx) modal field through the
    device->host link.

    freq_tv: (Nt, n) rad/sample; amps: (Nx, n); damp: (Nt,).
    Returns (Nt, Nx) float32.  Phase accumulates in f64 (free on the host;
    the f32 device cumsum drifts ~5e-3 rad over 1 s).
    """
    import numpy as np

    freq_tv = np.asarray(freq_tv, np.float64)
    hz = freq_tv / (2 * np.pi) * sr
    aa = (hz < sr / 2).astype(np.float32) + 1e-4
    phase = np.add.accumulate(freq_tv, axis=0)
    tbank = np.cos(phase).astype(np.float32) * aa
    tbank *= np.asarray(damp, np.float32)[:, None]
    return tbank @ np.ascontiguousarray(np.asarray(amps, np.float32).T)


@jax.jit
def modal_synth_nyquist(freq_tv, amps, damp, sr):
    """Fused nyquist-masked cosine bank.

    The reference materialises time-varying masked amplitudes of shape
    (Nx, Nt, n_modes) and synthesises in chunks to bound memory
    (process_training_data.py:52-63,177-181); under XLA the mask, product
    and mode reduction fuse into one loop, so nothing of that shape ever
    materialises.

    freq_tv: (1, Nt, n) rad/sample; amps: (Nx, 1, n); damp: (1, Nt, 1).
    Returns (Nx, Nt, 1).
    """
    hz = freq_tv / (2 * jnp.pi) * sr
    aa = (hz < sr / 2).astype(amps.dtype) + 1e-4
    phase = jnp.cumsum(freq_tv, axis=-2)
    # Mode reduction as a GEMM: the naive broadcast-multiply-reduce
    # materialises an (Nx, Nt, n) intermediate (tens of GFLOP of memory
    # traffic, ~5 GB at production shapes); contracting over modes with a
    # matmul keeps it at Nt*n temporaries and runs on the MXU / BLAS.
    tbank = jnp.cos(phase[0]) * aa[0] * damp[0]  # (Nt, n)
    out = tbank @ amps[:, 0, :].T  # (Nt, Nx)
    return out.T[:, :, None]  # (Nx, Nt, 1)
