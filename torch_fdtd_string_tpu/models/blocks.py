"""Neural building blocks (flax.linen).

Counterparts of reference ``src/model/nn/blocks.py``: random-Fourier-feature
embeddings with learnable log-scales, GLU-gated modulation MLPs for mode
frequencies/amplitudes, and the mode estimator that maps physical string
parameters to (amplitudes, monotone frequencies).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def fourier_feature(x, B):
    """sin/cos projection features (reference misc.py:225-233)."""
    if B is None:
        return x
    proj = (2.0 * np.pi * x) @ B
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class MLP(nn.Module):
    """n_layers x [Dense -> PReLU] (reference blocks.py:121-128)."""

    hidden: int
    n_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers):
            x = nn.Dense(self.hidden)(x)
            a = self.param(f"prelu_a_{i}", lambda *_: jnp.array(0.25, x.dtype), ())
            x = jnp.maximum(x, 0) + a * jnp.minimum(x, 0)
        return x


class RFF(nn.Module):
    """Per-feature RFF with learnable log10 scales (blocks.py:148-169).

    Input (..., n_feats) -> (..., n_feats * 2*embed_half).
    """

    scales: Sequence[float]
    embed_half: int

    @nn.compact
    def __call__(self, x):
        n_feats = len(self.scales)
        N = self.variable(
            "constants",
            "N",
            lambda: jnp.asarray(
                np.random.default_rng(0).standard_normal((n_feats, self.embed_half)),
                jnp.float32,
            ),
        ).value
        e = self.param(
            "e", lambda *_: jnp.asarray(self.scales, jnp.float32).reshape(-1, 1), ()
        )
        outs = []
        for i in range(n_feats):
            B = jnp.power(10.0, e[i]) * N[i : i + 1]
            outs.append(fourier_feature(x[..., i : i + 1], B))
        return jnp.concatenate(outs, axis=-1)


class RFF2(nn.Module):
    """Dense RFF with a single learnable scale (blocks.py:130-146).

    Input (..., input_dim) -> (..., 2*embed_half).
    """

    input_dim: int
    embed_half: int

    @nn.compact
    def __call__(self, x):
        N = jnp.ones((self.input_dim, self.embed_half), x.dtype) / (
            self.input_dim * self.embed_half
        )
        e = self.param("e", lambda *_: jnp.array(1.0, jnp.float32), ())
        return fourier_feature(x, e * N)


def apply_gain(x, gain, n_chunks):
    """Per-chunk feature gain (blocks.py:36-40) with tanh squashing."""
    g = jnp.tanh(gain)
    chunks = jnp.split(x, n_chunks, axis=-1)
    return jnp.concatenate([g[i] * c for i, c in enumerate(chunks)], axis=-1)


class FMBlock(nn.Module):
    """Frequency modulation block (blocks.py:42-71)."""

    input_dim: int  # n_modes
    embed_dim: int
    num_features: int

    @nn.compact
    def __call__(self, inputs, feature, slider, omega):
        _input = inputs / (1.3 * math.pi) - 1.0
        _input = RFF2(self.input_dim, self.embed_dim // 2)(_input)
        gain_in = self.param(
            "gain_in",
            lambda key, shape: 0.5 * jnp.asarray(
                np.random.default_rng(1).standard_normal(shape), jnp.float32
            ),
            (self.num_features,),
        )
        gain_out = self.param("gain_out", lambda *_: jnp.array([0.1], jnp.float32), ())
        feature = apply_gain(feature, gain_in, self.num_features)
        x = jnp.concatenate([_input, feature], axis=-1)
        h = MLP(self.embed_dim * self.num_features, 5)(x)
        x = jnp.concatenate([h, _input], axis=-1)
        x = nn.Dense(2 * self.input_dim)(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)  # GLU
        gate = jnp.tanh((slider - 1.0) * gain_out)
        return inputs + omega * x * gate


class AMBlock(nn.Module):
    """Amplitude modulation block (blocks.py:73-99)."""

    input_dim: int
    embed_dim: int
    num_features: int

    @nn.compact
    def __call__(self, inputs, feature, slider):
        _input = inputs * 110.0 - 0.55
        _input = RFF2(self.input_dim, self.embed_dim // 2)(_input)
        gain_in = self.param(
            "gain_in",
            lambda key, shape: 0.5 * jnp.asarray(
                np.random.default_rng(2).standard_normal(shape), jnp.float32
            ),
            (self.num_features,),
        )
        feature = apply_gain(feature, gain_in, self.num_features)
        x = jnp.concatenate([_input, feature], axis=-1)
        h = MLP(self.embed_dim * self.num_features, 5)(x)
        x = jnp.concatenate([h, _input], axis=-1)
        x = nn.Dense(2 * self.input_dim)(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)
        return inputs * (1.0 + x)


class ModeEstimator(nn.Module):
    """Physical params -> (mode amps, monotone mode freqs) (blocks.py:171-229)."""

    n_modes: int
    hidden_dim: int
    kappa_scale: Sequence[float] | None = None
    gamma_scale: Sequence[float] | None = None
    inharmonic: bool = True
    sr: int = 48000

    def _norm(self, x, scale):
        if scale is None:
            return x
        lo = min(scale)
        return (x - lo) / (max(scale) - lo)

    @nn.compact
    def __call__(self, u_0, x_p, kappa, gamma):
        """u_0: (b, 1, Nx); x_p/kappa/gamma: (b, 1, 1)."""
        p_x = jnp.argmax(u_0, axis=-1, keepdims=True) / 255.0
        p_a = jnp.max(u_0, axis=-1, keepdims=True) / 0.02
        k_n = self._norm(kappa, self.kappa_scale)
        g_n = self._norm(gamma, self.gamma_scale)
        con = jnp.concatenate(
            [p_x.astype(u_0.dtype), p_a, x_p, k_n, g_n], axis=-1
        )  # (b, 1, 5)
        con = RFF([1.0] * 5, self.hidden_dim // 2)(con)

        a = MLP(self.hidden_dim, 2)(con)
        mode_amps = jnp.tanh(1e-3 * nn.Dense(self.n_modes)(a))

        if self.inharmonic:
            f = MLP(self.hidden_dim, 2)(con)
            mode_freq = 0.3 * nn.sigmoid(nn.Dense(self.n_modes)(f))
            mode_freq = jnp.cumsum(mode_freq, axis=-1)
        else:
            ints = jnp.arange(1, self.n_modes + 1, dtype=u_0.dtype)
            omega = gamma / self.sr * (2 * math.pi)
            mode_freq = omega * ints
        return mode_amps, mode_freq
