"""Summarize evaluation results across a results directory.

The reference dispatches ``proc.summarize`` to ``src.task.summarize`` which
does not exist in its repo (reference run.py:120-124 — dead import).  This
implements the intended behaviour cleanly: aggregate the per-item
``string_params.txt`` / ``evaluation.txt`` scores into mean/median/std
tables and a scatter figure.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def summarize(load_dir):
    path = os.path.join(load_dir, "evaluation.txt")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            header = f.readline().strip().split("\t")[1:]
            for line in f:
                parts = line.strip().split("\t")
                rows.append([float(v) for v in parts[1:]])
    else:
        # aggregate from per-item files; rows are keyed by their FULL header
        # tuple (not just column count) so two formats that happen to share a
        # width but rename/reorder columns can never be merged positionally
        header = None
        by_header = {}
        for p in sorted(glob.glob(f"{load_dir}/*/string_params.txt")):
            keys, vals = [], []
            with open(p) as f:
                for line in f:
                    k, v = line.strip().split("\t")
                    keys.append(k)
                    vals.append(float(v))
            by_header.setdefault(tuple(keys), []).append(vals)
        if by_header:
            # a results dir can mix per-item files written before/after a
            # column-set change (e.g. an interrupted eval sweep re-run with
            # more keys); keep the richest (widest, then most common) format
            best = max(by_header, key=lambda h: (len(h), len(by_header[h])))
            dropped = sum(
                len(v) for h, v in by_header.items() if h != best
            )
            if dropped:
                print(f"[summarize] mixed column formats; dropping {dropped} "
                      f"item(s) whose header differs from {list(best)[:4]}...")
            header = list(best)
            rows = by_header[best]
    if not rows:
        print(f"[summarize] nothing to summarize in {load_dir}")
        return None

    arr = np.asarray(rows)
    stats = {
        "mean": arr.mean(axis=0),
        "median": np.median(arr, axis=0),
        "std": arr.std(axis=0),
    }
    out = os.path.join(load_dir, "summary.txt")
    with open(out, "w") as f:
        f.write("stat\t" + "\t".join(header) + "\n")
        for name, vals in stats.items():
            f.write(name + "\t" + "\t".join(f"{v:.4f}" for v in vals) + "\n")
    print(f"[summarize] {len(rows)} items -> {out}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if "f0_target_mean" in header and "f0_estimate" in header:
            ti = header.index("f0_target_mean")
            ei = header.index("f0_estimate")
            fig, ax = plt.subplots(figsize=(4, 4))
            ax.scatter(arr[:, ti], arr[:, ei], s=8)
            lim = [arr[:, ti].min() * 0.9, arr[:, ti].max() * 1.1]
            ax.plot(lim, lim, "k--", lw=0.5)
            ax.set_xlabel("target f0 (Hz)")
            ax.set_ylabel("estimated f0 (Hz)")
            fig.tight_layout()
            fig.savefig(os.path.join(load_dir, "summary_f0.pdf"), dpi=120)
            plt.close(fig)
        if "kappa" in header:
            # detune-vs-parameter scatter summaries (reference
            # plot.py:682-820 scatter_kappa/scatter_pluck role)
            from ..utils.plot import detune_scatter

            col = lambda k: arr[:, header.index(k)] if k in header else None
            detunes = {
                r"$|f_0^{\tt est} - f_0|$": col("abs_diff_input"),
                r"$|f_0^{\tt est} - \hat{f_0}|$": col("abs_diff_target"),
            }
            detunes = {k: v for k, v in detunes.items() if v is not None}
            detune_scatter(
                os.path.join(load_dir, "summary_detune.pdf"),
                detunes, col("kappa"), col("alpha"), col("p_x"), col("p_a"),
            )
    except Exception as err:  # plotting is best-effort
        print(f"[summarize] plot skipped: {err}")
    return stats
