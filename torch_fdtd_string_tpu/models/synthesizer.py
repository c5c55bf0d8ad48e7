"""DMSP/DDSP synthesizer (flax.linen).

Counterpart of reference ``src/model/nn/{synthesizer,dmsp,ddsp}.py``:
*Differentiable Modal Synthesis for Physical modeling* — physical string
parameters condition FM/AM modulation of an (in)harmonic oscillator bank
plus a filtered-noise branch; trained to approximate the FDTD engine.

Everything is shape-static and jit/pjit friendly; noise uses flax's
``'noise'`` RNG collection.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.ddsp import (
    amp_to_impulse_response,
    fft_convolve,
    remove_above_nyquist_mode,
    scale_function,
    upsample,
)
from ..ops.modal import modal_synth
from .blocks import AMBlock, FMBlock, ModeEstimator, RFF


def t60_to_sigma_frames(T60, f_0, K):
    """(b, frames, 2) sigma from per-frame f0 (reference audio.py:198-217).

    T60: (b, 2, 2); f_0: (b, frames, 1); K: (b, frames, 1).
    """
    gamma = 2.0 * f_0
    freq1 = T60[:, None, 0, 0, None]
    time1 = T60[:, None, 0, 1, None]
    freq2 = T60[:, None, 1, 0, None]
    time2 = T60[:, None, 1, 1, None]
    zeta1 = -(gamma**2) + jnp.sqrt(gamma**4 + 4 * K**2 * (2 * math.pi * freq1) ** 2)
    zeta2 = -(gamma**2) + jnp.sqrt(gamma**4 + 4 * K**2 * (2 * math.pi * freq2) ** 2)
    scale = 6 * math.log(10.0) / (zeta1 - zeta2)
    sig0 = scale * (-zeta2 / time1 + zeta1 / time2)
    sig1 = scale * (1.0 / time1 - 1.0 / time2)
    return jnp.concatenate([sig0, sig1], axis=-1)


class DMSPCore(nn.Module):
    """Inharmonic modal core (reference dmsp.py)."""

    embed_dim: int
    hidden_size: int
    n_features: int
    n_modes: int
    n_bands: int
    block_size: int
    sr: int
    # reference parity: the filtered-noise level is a function of the
    # conditioning features only — it carries NO amplitude information
    # (p_a enters the model solely through mode_coef), so the corpus
    # trains one average noise floor that drowns quiet (small-p_a)
    # strings (round-4 scores: p_a first-quartile items lose ~12 dB
    # si-sdr).  amp_adaptive_noise=True scales the noise filter by the
    # per-frame modal amplitude envelope instead — physically, excitation
    # noise rides the excitation amplitude and decays with the string.
    amp_adaptive_noise: bool = False
    # blend floor for the adaptive branch: noise level is
    # (noise_floor + 50*s*env) x the parity level.  The round-5 pure
    # adaptive run (floor 0) won sdr/logmag/f0 but lost si-sdr — all of
    # the loss in the quietest p_a quartile, where removing the noise
    # floor entirely backfired; a fixed floor keeps those items at a
    # fraction of the parity noise while the louder quartiles keep the
    # adaptive gains.
    noise_floor: float = 0.0

    @nn.compact
    def __call__(self, hidden, mode_freq, mode_coef, times, alpha, omega, lengths):
        freq_m = FMBlock(self.n_modes, self.embed_dim, self.n_features)(
            mode_freq, hidden, alpha, omega
        )
        coef_m = AMBlock(self.n_modes, self.embed_dim, self.n_features)(
            mode_coef, hidden, times
        )

        freqs_hz = freq_m / (2 * math.pi) * self.sr
        coef_m = remove_above_nyquist_mode(coef_m, freqs_hz, self.sr)
        freq_s = upsample(freq_m, self.block_size)[:, :lengths]
        coef_s = upsample(coef_m, self.block_size)[:, :lengths]
        harmonic = modal_synth(freq_s, coef_s, jnp.ones_like(freq_s[..., :1]))

        param = scale_function(nn.Dense(self.n_bands)(hidden) - 5.0)
        if self.amp_adaptive_noise:
            # eps under the sqrt: d/dx sqrt(x) is unbounded at 0 and
            # nyquist-masked frames can zero the mean exactly — the round-5
            # first launch NaN'd inside 50 steps without it.  stop_gradient
            # makes the envelope pure conditioning: the noise loss must not
            # reshape the modal branch through its own gain signal.
            env = jax.lax.stop_gradient(
                jnp.sqrt(jnp.mean(coef_m**2, axis=-1, keepdims=True) + 1e-12)
            )
            s = self.param("noise_env_gain",
                           lambda *_: jnp.array(1.0, jnp.float32), ())
            # reference-scale continuity: the average envelope over the
            # nsynth corpus is O(1e-3), so seed the per-envelope gain high
            # enough that the branch starts near the parity noise level
            param = param * (self.noise_floor + 50.0 * s * env)
        impulse = amp_to_impulse_response(param, self.block_size)
        key = self.make_rng("noise")
        noise = (
            jax.random.uniform(key, impulse.shape[:2] + (self.block_size,),
                               dtype=harmonic.dtype) * 2.0 - 1.0
        )
        noise = fft_convolve(noise, impulse)
        noise = noise.reshape(noise.shape[0], -1, 1)[:, :lengths]

        return (harmonic + noise)[..., 0], freq_m, coef_m


class DDSPCore(nn.Module):
    """Harmonic (integer-multiple) core with alpha-gated noise (reference
    ddsp.py)."""

    feature_size: int
    hidden_size: int
    n_modes: int
    n_bands: int
    block_size: int
    sr: int
    fm: bool = False
    embed_dim: int = 64
    n_features: int = 7

    @nn.compact
    def __call__(self, hidden, mode_freq, mode_coef, times, alpha, omega, lengths):
        if self.fm:
            freq_m = FMBlock(self.n_modes, self.embed_dim, self.n_features)(
                mode_freq, hidden, alpha, omega
            )
        else:
            freq_m = mode_freq
        coef_m = AMBlock(self.n_modes, self.embed_dim, self.n_features)(
            mode_coef, hidden, times
        )

        freqs_hz = freq_m / (2 * math.pi) * self.sr
        coef_m = remove_above_nyquist_mode(coef_m, freqs_hz, self.sr)
        freq_s = upsample(freq_m, self.block_size)[:, :lengths]
        coef_s = upsample(coef_m, self.block_size)[:, :lengths]
        harmonic = modal_synth(freq_s, coef_s, jnp.ones_like(freq_s[..., :1]))

        noise_gate = self.param("noise_gate", lambda *_: jnp.array([1e-2]), ())
        ngate = jnp.tanh((alpha - 1.0) * noise_gate)
        param = ngate * nn.sigmoid(nn.Dense(self.n_bands)(hidden) - 5.0)
        impulse = amp_to_impulse_response(param, self.block_size)
        key = self.make_rng("noise")
        noise = (
            jax.random.uniform(key, impulse.shape[:2] + (self.block_size,),
                               dtype=harmonic.dtype) * 2.0 - 1.0
        )
        noise = fft_convolve(noise, impulse)
        noise = noise.reshape(noise.shape[0], -1, 1)[:, :lengths]
        return (harmonic + noise)[..., 0], freq_m, coef_m


class Synthesizer(nn.Module):
    """Top-level parameter -> waveform synthesizer (reference
    synthesizer.py:9-125)."""

    sr: int = 48000
    embed_dim: int = 128
    hidden_dim: int = 512
    n_modes: int = 40
    n_bands: int = 65
    block_size: int = 256
    harmonic: str = "inharmonic"
    ddsp_fm: bool = False
    # "mlp": the reference's learned estimator (blocks.ModeEstimator).
    # "physics": embedded dispersion tables + in-jit amp fit
    # (models/physmodes.py) — exact to ~2e-5, no learned parameters
    mode_estimator: str = "mlp"
    amp_adaptive_noise: bool = False
    noise_floor: float = 0.0
    x_scale: Sequence[float] = (0.0, 1.0)
    t_scale: Sequence[float] = (0.0, 0.3)
    gamma_scale: Sequence[float] = (196.0, 880.0)
    kappa_scale: Sequence[float] = (0.01, 0.03)
    alpha_scale: Sequence[float] = (1.0, 30.0)
    sig_0_scale: Sequence[float] = (0.0, 0.7)
    sig_1_scale: Sequence[float] = (0.0, 1e-5)

    @property
    def inharmonic(self):
        return self.harmonic.lower() == "inharmonic"

    def _rescale(self, var, scale):
        lo = min(scale)
        return (var - lo) / (max(scale) - lo)

    @nn.compact
    def __call__(self, params, pitch, initial):
        """params = [space, times, kappa, alpha, t60, mode_freq, mode_coef]
        (mode_freq/coef may be None -> use the mode estimator);
        pitch: (b, frames); initial: (b, 1, Nx)."""
        space, times, kappa, alpha, t60, mode_freq, mode_coef = params
        n_feats = 7

        f_0 = pitch[..., None]  # (b, frames, 1)
        times = times[..., None]  # (b, Nt, 1)
        kappa = kappa[..., None]  # (b, 1, 1)
        alpha = alpha[..., None]
        space = space[..., None]
        gamma = 2.0 * f_0
        omega = f_0 / self.sr * (2 * math.pi)
        relf0 = omega - omega[:, :1]

        # reference conditions on the 10th f0 frame (synthesizer.py:77);
        # clamp for short clips
        gi = min(9, gamma.shape[1] - 1)
        if self.mode_estimator == "physics":
            from .physmodes import PhysicsModeEstimator

            # the physics path must condition on frame 0, not the
            # reference's frame 9: the dataset mode tables are built at
            # onset omega_0 and the linear-FM term below is relative to
            # frame 0 (``relf0 = omega - omega[:, :1]``), so the base
            # computation belongs at frame 0 too.  Frame 9 is fine as an
            # arbitrary conditioning feature for the LEARNED estimator,
            # but for the exact computation it detunes every mode by
            # omega_9 - omega_0 for the whole clip on glide/vibrato
            # strings (measured: the entire 2e-3 valid/modefreq floor of
            # the round-4 run; frame 0 matches the tables to 0.0)
            in_coef, in_freq = PhysicsModeEstimator(
                self.n_modes,
                tuple(self.kappa_scale),
                sr=self.sr,
            )(initial, space, kappa, gamma[:, :1], t60)
        else:
            in_coef, in_freq = ModeEstimator(
                self.n_modes,
                self.embed_dim,
                self.kappa_scale,
                self.gamma_scale,
                inharmonic=self.inharmonic,
                sr=self.sr,
            )(initial, space, kappa, gamma[:, gi : gi + 1])
        mode_coef = in_coef if mode_coef is None else mode_coef
        mode_freq = in_freq if mode_freq is None else mode_freq
        mode_freq = mode_freq + relf0  # linear FM

        Nt = times.shape[1]
        Nf = mode_freq.shape[1]
        t_0 = times[:, :1]
        frames = jnp.cumsum(jnp.ones((1, Nf, 1), times.dtype), axis=1) / self.sr + t_0

        n_frames = f_0.shape[1]
        space_f = jnp.broadcast_to(space, (space.shape[0], n_frames, 1))
        alpha_f = jnp.broadcast_to(alpha, (alpha.shape[0], n_frames, 1))
        kappa_f = jnp.broadcast_to(kappa, (kappa.shape[0], n_frames, 1))
        sigma = t60_to_sigma_frames(t60, f_0, 2 * f_0 * kappa_f)

        sig_0, sig_1 = jnp.split(sigma, 2, axis=-1)
        feat = jnp.concatenate(
            [
                self._rescale(space_f, self.x_scale),
                self._rescale(frames - max(self.t_scale), self.t_scale),
                self._rescale(kappa_f, self.kappa_scale),
                self._rescale(alpha_f, self.alpha_scale),
                self._rescale(sig_0, self.sig_0_scale),
                self._rescale(sig_1, self.sig_1_scale),
                self._rescale(gamma, self.gamma_scale),
            ],
            axis=-1,
        )
        feat = RFF([1.0] * n_feats, self.embed_dim // 2)(feat)

        damping = jnp.exp(-frames * sig_0)
        mode_coef = mode_coef * damping

        if self.inharmonic:
            core = DMSPCore(
                embed_dim=self.embed_dim,
                hidden_size=self.hidden_dim,
                n_features=n_feats,
                n_modes=self.n_modes,
                n_bands=self.n_bands,
                block_size=self.block_size,
                sr=self.sr,
                amp_adaptive_noise=self.amp_adaptive_noise,
                noise_floor=self.noise_floor,
            )
        else:
            core = DDSPCore(
                feature_size=self.embed_dim * n_feats,
                hidden_size=self.hidden_dim,
                n_modes=self.n_modes,
                n_bands=self.n_bands,
                block_size=self.block_size,
                sr=self.sr,
                fm=self.ddsp_fm,
                embed_dim=self.embed_dim,
                n_features=n_feats,
            )
        ut, ut_freq, ut_coef = core(
            feat, mode_freq, mode_coef, frames, alpha_f, omega, Nt
        )
        return ut, (in_freq, in_coef), (ut_freq, ut_coef)
