"""DDSP signal ops in jnp (counterpart of reference ``src/utils/ddsp.py``).

All ops are shape-static and fuse under jit: block-rate -> sample-rate
upsampling, sigmoid amplitude scaling, windowed-FIR noise shaping via FFT
convolution, and nyquist masking.  The oscillator banks live in
``ops/modal.py``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def safe_log(x):
    return jnp.log(x + 1e-7)


def upsample(signal, factor):
    """Linear interpolation along axis 1 by an integer factor
    (reference ddsp.py:62-66 — torch F.interpolate(mode='linear')).

    signal: (B, T, C) -> (B, T*factor, C).
    """
    B, T, C = signal.shape
    n = T * factor
    # torch's non-aligned linear interpolation: sample positions map to
    # src = (i + 0.5) / factor - 0.5, clamped
    i = jnp.arange(n)
    src = jnp.clip((i + 0.5) / factor - 0.5, 0.0, T - 1.0)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    frac = (src - lo)[None, :, None].astype(signal.dtype)
    return signal[:, lo, :] * (1 - frac) + signal[:, hi, :] * frac


def remove_above_nyquist(amplitudes, pitch, sampling_rate):
    """Mask harmonics above Nyquist (ddsp.py:70-77)."""
    n_harm = amplitudes.shape[-1]
    pitches = pitch * jnp.arange(1, n_harm + 1, dtype=pitch.dtype)
    aa = (pitches < sampling_rate / 2).astype(amplitudes.dtype) + 1e-4
    return amplitudes * aa


def remove_above_nyquist_mode(amplitudes, frequencies, sampling_rate):
    """Mask modes above Nyquist (ddsp.py:80-85)."""
    aa = (frequencies < sampling_rate / 2).astype(amplitudes.dtype) + 1e-4
    return amplitudes * aa


def scale_function(x):
    """Sigmoid amplitude scaling to (0, 2) (ddsp.py:87-89)."""
    return 2 * jnp.power(jnp.clip(1 / (1 + jnp.exp(-x)), 1e-7, 1.0), math.log(10)) + 1e-7


def amp_to_impulse_response(amp, target_size):
    """Zero-phase band amplitudes -> windowed FIR (ddsp.py:152-170)."""
    amp = amp.astype(jnp.complex64) if amp.dtype != jnp.complex64 else amp
    ir = jnp.fft.irfft(amp, axis=-1)
    filter_size = ir.shape[-1]
    ir = jnp.roll(ir, filter_size // 2, axis=-1)
    # torch.hann_window(N) is periodic: 0.5*(1-cos(2 pi n / N))
    n = jnp.arange(filter_size)
    win = 0.5 * (1 - jnp.cos(2 * jnp.pi * n / filter_size))
    ir = ir * win
    pad = int(target_size) - filter_size
    ir = jnp.pad(ir, [(0, 0)] * (ir.ndim - 1) + [(0, pad)])
    return jnp.roll(ir, -filter_size // 2, axis=-1)


def fft_convolve(signal, kernel):
    """Linear convolution by FFT with centre trim (ddsp.py:173-177)."""
    n = signal.shape[-1]
    signal = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(0, n)])
    kernel = jnp.pad(kernel, [(0, 0)] * (kernel.ndim - 1) + [(kernel.shape[-1], 0)])
    out = jnp.fft.irfft(jnp.fft.rfft(signal) * jnp.fft.rfft(kernel))
    return out[..., out.shape[-1] // 2 :]
