"""Evaluate simulated outputs: f0/detune validation.

Counterpart of reference ``src/task/evaluate.py``: per simulation directory,
estimate the output f0 (YIN tracker instead of CREPE), compare against the
input f0, the precorrected target f0 and Fletcher-theory mode predictions,
and write ``string_params.txt`` plus rainbowgram plots.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..ops import fdm
from ..utils import wav as wavio
from ..utils.frequency import compute_harmonic_parameters
from ..utils.vnv import relative_detune_error


def evaluate_dir(sim_dir, sr=48000, plot=True):
    """Returns the per-item score dict (or None if not a sim dir)."""
    wav_path = os.path.join(sim_dir, "output-u.wav")
    str_path = os.path.join(sim_dir, "string_params.npz")
    if not (os.path.exists(wav_path) and os.path.exists(str_path)):
        return None
    wav, wsr = wavio.read(wav_path)
    params = np.load(str_path)
    f0_in = np.atleast_1d(params["f0"])
    f0_tgt = np.atleast_1d(params["target_f0"])
    kappa = float(np.atleast_1d(params["kappa"])[0])

    # Fletcher-theory predicted sounding frequency of the simulation input
    mode1 = fdm.stiff_string_modes(f0_in.mean(), kappa, 1)[0][0]

    track = compute_harmonic_parameters(wav, wsr)
    f0_est = track["f0"]
    voiced = f0_est > 0
    est = float(np.median(f0_est[voiced])) if voiced.any() else 0.0

    u0 = np.atleast_2d(params["u0"])[0]
    scores = {
        "f0_estimate": est,
        "f0_input_mean": float(f0_in.mean()),
        "f0_target_mean": float(f0_tgt.mean()),
        "f0_mode_pred": float(np.asarray(mode1).mean()),
        "abs_diff_input": abs(est - float(f0_in.mean())),
        "abs_diff_target": abs(est - float(f0_tgt.mean())),
        "abs_diff_modes": abs(est - float(np.asarray(mode1).mean())),
        "rde_target_pct": float(
            relative_detune_error(est, float(f0_tgt.mean()))
        ),
        # sampled-parameter columns for the summary scatter panels
        # (reference plot.py:682-820 scatter summaries)
        "kappa": kappa,
        "alpha": float(np.atleast_1d(params["alpha"])[0]),
        "p_a": float(np.atleast_1d(params["p_a"])[0]),
        "p_x": float(np.argmax(u0) / max(len(u0) - 1, 1)),
    }
    with open(os.path.join(sim_dir, "string_params.txt"), "w") as f:
        for k, v in scores.items():
            f.write(f"{k}\t{v:.4f}\n")

    if plot:
        from ..utils import plot as uplot

        uplot.rainbowgram(
            os.path.join(sim_dir, "eval_f0.pdf"),
            wav,
            wsr,
            f0_input=f0_tgt if f0_tgt.ndim else None,
        )
        # reference-style hsv/log-axis variant with the tracked-f0 overlay
        # (reference plot.py:325-394; evaluate.py:62-63)
        uplot.rainbowgram_hsv(
            os.path.join(sim_dir, "eval_f0_hsv.png"),
            wav,
            wsr,
            f0_input=f0_tgt if f0_tgt.ndim else None,
            f0_estimate=f0_est,
        )
    return scores


def evaluate(load_dir, sr=48000, plot=True):
    dirs = sorted(
        d for d in glob.glob(f"{load_dir}/*") if os.path.isdir(d) and "codes" not in d
    )
    all_scores = []
    for d in dirs:
        s = evaluate_dir(d, sr, plot)
        if s is not None:
            all_scores.append((os.path.basename(d), s))
    if all_scores:
        keys = list(all_scores[0][1].keys())
        with open(os.path.join(load_dir, "evaluation.txt"), "w") as f:
            f.write("item\t" + "\t".join(keys) + "\n")
            for name, s in all_scores:
                f.write(name + "\t" + "\t".join(f"{s[k]:.4f}" for k in keys) + "\n")
        print(f"[evaluate] {len(all_scores)} items -> {load_dir}/evaluation.txt")
        if plot and len(all_scores) > 1:
            # multi-panel scatter summaries over the sampled parameter space
            # (reference plot.py:682-820 scatter_pluck / scatter_kappa)
            from ..utils import plot as uplot

            g = lambda k: np.array([s[k] for _, s in all_scores])
            detunes = {
                r"$|f_0^{(\tt est)} - f_0|$": g("abs_diff_input"),
                r"$|f_0^{(\tt est)} - \hat{f_0}|$": g("abs_diff_target"),
            }
            uplot.detune_scatter(
                os.path.join(load_dir, "detune_scatter.pdf"), detunes,
                g("kappa"), alpha=g("alpha"), p_x=g("p_x"), p_a=g("p_a"),
            )
            uplot.scatter_kappa(
                os.path.join(load_dir, "detune_kappa.pdf"),
                g("abs_diff_input"),
                np.abs(g("f0_mode_pred") - g("f0_input_mean")),
                g("kappa"), alpha=g("alpha"),
            )
    return all_scores
