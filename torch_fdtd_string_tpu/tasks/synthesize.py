"""DMSP training task: batch preparation, loss/metric computation, steps.

Counterpart of reference ``src/task/synthesize.py`` (the LightningModule):
builds the flax ``Synthesizer``, prepares batches (f0 frame downsampling,
mode-target trimming), computes the configured multi-loss, and evaluates
both the model and the analytic-modal baseline at test time.

Parallelism: the train step is jitted with the batch sharded over the
``data`` mesh axis and parameters replicated — XLA inserts the gradient
all-reduce (the reference relies on Lightning DDP/NCCL, trainer.py:62-78).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import numpy as np

from ..models.losses import si_sdr, stft_mag
from ..utils import misc as ms


class TrainState(NamedTuple):
    params: Any
    constants: Any
    opt_state: Any
    step: Any
    rng: Any


def build_model(args):
    from ..models.synthesizer import Synthesizer

    m = args.model
    return Synthesizer(
        sr=args.task.sr,
        embed_dim=m.embed_dim,
        hidden_dim=m.hidden_dim,
        n_modes=m.n_modes,
        n_bands=m.n_bands,
        block_size=m.block_size,
        harmonic=m.harmonic,
        ddsp_fm=bool(m.get("ddsp_frequency_modulation") or False),
        mode_estimator=str(m.get("mode_estimator") or "mlp"),
        amp_adaptive_noise=bool(m.get("amp_adaptive_noise") or False),
        noise_floor=float(m.get("noise_floor") or 0.0),
        x_scale=tuple(m.x_scale),
        t_scale=tuple(m.t_scale),
        gamma_scale=tuple(m.gamma_scale),
        kappa_scale=tuple(m.kappa_scale),
        alpha_scale=tuple(m.alpha_scale),
        sig_0_scale=tuple(m.sig_0_scale),
        sig_1_scale=tuple(m.sig_1_scale),
    )


def prepare_batch(batch, n_modes, block_size, sr):
    """Numpy batch -> model inputs + loss targets (reference
    synthesize.py:288-320)."""
    gt = batch["target"].astype(np.float32)  # (B, Nt)
    xg = batch["x"].astype(np.float32).reshape(-1, 1)
    tg = np.squeeze(batch["t"].astype(np.float32), -1)  # (B, Nt)
    ka = batch["kappa"].astype(np.float32).reshape(-1, 1)
    al = batch["alpha"].astype(np.float32).reshape(-1, 1)
    f_k = batch["mode_freq"].astype(np.float32)[:, :n_modes][:, None, :]
    c_k = batch["mode_coef"].astype(np.float32)[..., :n_modes].squeeze(1)
    f_0 = batch["f0"].astype(np.float32)
    u_0 = batch["u0"].astype(np.float32)
    t60 = batch["T60"].astype(np.float32)
    gt_f0 = batch["ut_f0"].astype(np.float32)

    f_0 = ms.downsample(f_0, factor=block_size).astype(np.float32)
    gt_f0 = (ms.downsample(gt_f0, size=f_0.shape[1]) / sr * (2 * math.pi)).astype(
        np.float32
    )
    extra = {}
    if "ua_f0" in batch:  # modal-baseline pitch track (reference synthesize.py:407)
        an_f0 = batch["ua_f0"].astype(np.float32)
        extra["an_f0"] = (
            ms.downsample(an_f0, size=f_0.shape[1]) / sr * (2 * math.pi)
        ).astype(np.float32)
    if "gain" in batch:
        extra["gain"] = batch["gain"].astype(np.float32).reshape(-1, 1)
    return {
        **extra,
        "gt": gt,
        "xg": xg,
        "tg": tg,
        "ka": ka,
        "al": al,
        "t60": t60,
        "f_k": f_k,
        "c_k": c_k,
        "f_0": f_0,
        "u_0": u_0,
        "gt_f0": gt_f0,
        "analytic": batch.get("analytic", np.zeros_like(gt)).astype(np.float32),
    }


def forward_outputs(model, variables, prep, rng, inharmonic=True,
                    use_gt_modes=True):
    """Model forward -> prediction dict for the loss registry.

    ``use_gt_modes`` mirrors the reference's mode-input protocol: training
    and the valid-split evaluation feed the dataset's analytic mode tables
    (synthesize.py:306-307, 355-356); the test split synthesizes from the
    ModeEstimator's own modes unless ``model.use_precomputed_mode``
    (synthesize.py:409-410, validation_step dataloader_idx!=0 branch)."""
    params_in = [
        prep["xg"],
        prep["tg"],
        prep["ka"],
        prep["al"],
        prep["t60"],
        prep["f_k"] if (inharmonic and use_gt_modes) else None,
        prep["c_k"] if (inharmonic and use_gt_modes) else None,
    ]
    ut, (in_freq, in_coef), (ut_freq, ut_coef) = model.apply(
        variables, params_in, prep["f_0"], prep["u_0"], rngs={"noise": rng}
    )
    n = min(ut.shape[-1], prep["gt"].shape[-1])
    return {
        "preds": ut[..., :n],
        "target": prep["gt"][..., :n],
        "preds_f0": ut_freq[..., 0],
        "target_f0": prep["gt_f0"],
        "preds_fk": ut_freq[:, -1:, :],
        "target_fk": prep["f_k"],
        "preds_freq": in_freq,
        "preds_coef": in_coef,
        "target_ck": prep["c_k"],
    }


def compute_losses(outputs, registry, criteria):
    """Sum configured losses (reference synthesize.py:261-286)."""
    import jax.numpy as jnp

    loss_dict = {}
    total = 0.0
    for name in criteria:
        fn, keys = registry[name]
        val = fn(*[outputs[k] for k in keys])
        loss_dict[name] = val
        total = total + val
    loss_dict["loss"] = total
    return total, loss_dict


def make_train_step(model, tx, registry, criteria, inharmonic=True,
                    needs_value=False):
    import jax

    def loss_fn(params, constants, prep, rng):
        variables = {"params": params, **constants}
        outputs = forward_outputs(model, variables, prep, rng, inharmonic)
        total, loss_dict = compute_losses(outputs, registry, criteria)
        return total, loss_dict

    @jax.jit
    def train_step(state: TrainState, prep):
        rng, new_rng = jax.random.split(state.rng)
        (_, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.constants, prep, rng
        )
        kw = {"value": loss_dict["loss"]} if needs_value else {}
        updates, new_opt = tx.update(grads, state.opt_state, state.params, **kw)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, state.constants, new_opt, state.step + 1, new_rng),
            loss_dict,
        )

    return train_step


def make_eval_step(model, registry, criteria, inharmonic=True,
                   use_gt_modes=True):
    import jax

    @jax.jit
    def eval_step(state: TrainState, prep, rng):
        variables = {"params": state.params, **state.constants}
        outputs = forward_outputs(model, variables, prep, rng, inharmonic,
                                  use_gt_modes)
        _, loss_dict = compute_losses(outputs, registry, criteria)
        return outputs, loss_dict

    return eval_step


def item_scores(preds, target, sr, target_f0_hz=None, preds_f0_rad=None):
    """Per-item test scores (reference synthesize.py:445-476): si-sdr, sdr,
    log-mag L1, f0 detune in Hz."""
    preds = np.asarray(preds, np.float64)
    target = np.asarray(target, np.float64)
    sisdr = np.asarray(si_sdr(target, preds))
    sdr = np.asarray(si_sdr(target, preds, scaling=False))
    X = np.asarray(stft_mag(preds, 1024, 256))
    Y = np.asarray(stft_mag(target, 1024, 256))
    logmag = np.abs(
        20 * np.log10(X + 1e-5) - 20 * np.log10(Y + 1e-5)
    ).reshape(X.shape[0], -1).mean(-1)
    out = {"si_sdr": sisdr, "sdr": sdr, "logmag": logmag}
    if target_f0_hz is not None and preds_f0_rad is not None:
        est_hz = np.asarray(preds_f0_rad) / (2 * np.pi) * sr
        n = min(est_hz.shape[-1], target_f0_hz.shape[-1])
        out["f0_hz"] = np.abs(est_hz[..., :n] - target_f0_hz[..., :n]).mean(-1)
    return out


def summarize_eval_scores(prep, preds, target, preds_f0_rad, target_f0_rad, sr):
    """Per-item test score row with the reference's full column set
    (synthesize.py:445-476 ``summarize_eval_scores``): string parameters
    (x_grid, kappa, alpha), pluck readouts (p_a, p_x), waveform scores
    (si_sdr, sdr, logmag) and the f0 detune in Hz."""
    preds = np.asarray(preds, np.float64)
    target = np.asarray(target, np.float64)
    u0 = np.asarray(prep["u_0"])[:, 0]  # (B, Nx)
    p_a = u0.max(-1)
    p_x = np.argmax(u0, axis=-1) / max(u0.shape[-1] - 1, 1)

    sisdr = np.asarray(si_sdr(target, preds))
    sdr = np.asarray(si_sdr(target, preds, scaling=False))
    X = np.asarray(stft_mag(preds, 1024, 256))
    Y = np.asarray(stft_mag(target, 1024, 256))
    logmag = np.abs(
        20 * np.log10(X + 1e-5) - 20 * np.log10(Y + 1e-5)
    ).reshape(X.shape[0], -1).mean(-1)

    est = np.asarray(preds_f0_rad)
    tgt = np.asarray(target_f0_rad)
    n = min(est.shape[-1], tgt.shape[-1])
    detune = (
        np.abs(est[..., :n] - tgt[..., :n]).mean(-1) / (2 * math.pi) * sr
    )
    return {
        "x_grid": np.asarray(prep["xg"])[:, 0],
        "kappa": np.asarray(prep["ka"])[:, 0],
        "alpha": np.asarray(prep["al"])[:, 0],
        "p_a": p_a,
        "p_x": p_x,
        "si_sdr": sisdr,
        "sdr": sdr,
        "logmag": logmag,
        "f0_error": detune,
    }
