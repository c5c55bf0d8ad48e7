"""Evaluation metric accumulators.

Counterpart of reference ``src/utils/objective.py`` (torchmetrics): each
metric keeps running (sum, count) state with ``update``/``compute``/
``reset`` semantics.  Cross-device reduction: the eval loop is host-driven,
so accumulation happens on host scalars; under a multi-host mesh the sums
can be combined with ``jax.lax.psum`` inside a pmapped eval step or by
summing per-host results (same ``dist_reduce_fx="sum"`` semantics the
reference relies on, objective.py:273-274).

The speech-domain leftovers of the reference (PESQ/DNSMOS/AECMOS,
objective.py:30-267) are unused by any string task and intentionally not
reproduced.
"""

from __future__ import annotations

import numpy as np

from .losses import MRSTFT, si_sdr


class Metric:
    """Running-mean metric: accumulate value sums and counts."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total = 0.0
        self.count = 0

    def update(self, *args, **kwargs):
        val, n = self._value(*args, **kwargs)
        self.total += float(val)
        self.count += int(n)

    def compute(self):
        return self.total / max(self.count, 1)

    def merge(self, other):
        """Combine accumulator state (the distributed sum reduction)."""
        self.total += other.total
        self.count += other.count
        return self


class MultiSpec(Metric):
    """Multi-resolution STFT distance (reference objective.py:269-286)."""

    def __init__(self, sr=48000, fft_sizes=(1024, 512, 256)):
        super().__init__()
        self.loss = MRSTFT(
            list(fft_sizes),
            [s // 4 for s in fft_sizes],
            list(fft_sizes),
            w_log_mag=0.5,
            w_lin_mag=2.0,
            input_scale=1.0,
        )

    def _value(self, preds, target):
        return float(np.asarray(self.loss(preds, target))) * len(preds), len(preds)


class SISDR(Metric):
    """(reference objective.py:289-303)."""

    def _value(self, preds, target):
        vals = np.asarray(si_sdr(np.asarray(target), np.asarray(preds)))
        return vals.sum(), vals.size


class ModeFreq(Metric):
    """L1 of predicted vs target mode frequencies (objective.py:307-320)."""

    def _value(self, preds_freq, target_fk):
        d = np.abs(np.asarray(preds_freq) - np.asarray(target_fk))
        return d.mean() * d.shape[0], d.shape[0]


class ModeAmps(Metric):
    """L1 of predicted vs target mode amplitudes (objective.py:322-335)."""

    def _value(self, preds_coef, target_ck):
        d = np.abs(np.asarray(preds_coef) - np.asarray(target_ck))
        return d.mean() * d.shape[0], d.shape[0]


class MSE(Metric):
    def _value(self, preds, target):
        d = (np.asarray(preds) - np.asarray(target)) ** 2
        return d.mean() * d.shape[0], d.shape[0]


class L1(Metric):
    def _value(self, preds, target):
        d = np.abs(np.asarray(preds) - np.asarray(target))
        return d.mean() * d.shape[0], d.shape[0]


class PDELoss(Metric):
    """PDE-residual metric (reference objective.py:398-441): running mean of
    the IC/BC/interior-residual composite over predicted space-time fields.
    Scaffolding parity — the reference never places it in default criteria."""

    def __init__(self, w_ic=1.0, w_bc=1.0, w_r=1.0):
        super().__init__()
        self.w = (w_ic, w_bc, w_r)

    def _value(self, pde_preds, u0, x, t, f0, kappa, sig0, sig1):
        from .losses import pde_loss

        ut = pde_preds[..., 0] if pde_preds.ndim == 4 else pde_preds
        val = pde_loss(
            ut, u0, x, t, f0, kappa, sig0, sig1,
            w_ic=self.w[0], w_bc=self.w[1], w_r=self.w[2],
        )
        return float(val) * ut.shape[0], ut.shape[0]


def build_metric_registry(sr=48000):
    """Metric registry keyed like reference synthesize.py:243-259."""
    return {
        "mrstft": (MultiSpec(sr), ("preds", "target")),
        "sisdr": (SISDR(), ("preds", "target")),
        "modefreq": (ModeFreq(), ("preds_freq", "target_fk")),
        "modeamps": (ModeAmps(), ("preds_coef", "target_ck")),
        "mse": (MSE(), ("preds", "target")),
        "l1": (L1(), ("preds", "target")),
        "pde": (PDELoss(), ("pde_preds", "u_0", "xg", "tg", "f_0",
                            "ka", "sig0", "sig1")),
    }
