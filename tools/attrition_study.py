"""Corpus-attrition bias study (VERDICT r4 weak #3 / next #6).

Question: when the production NaN-skip recipe drops a draw, would the
REFERENCE have dropped it too?  The reference skips NaN batches with the
same semantics (ref simulate.py:91-93, 386-392) but solves the coupled
system with an exact dense f64-capable inverse (string.cpp:173-175), so a
draw our f32 fused kernel diverges on might be stable there — in which
case the corpus systematically under-samples high-alpha strings relative
to a reference-generated corpus.

Protocol:
  1. [TPU] generate the production recipe with full draw dumps:
       python run.py experiment=nsynth-like task.num_samples=96 \\
         task.batch_size=24 task.save=false task.dump_draws=true \\
         task.save_name=attrition-r5
     (NaN-skip semantics: nsynth-like sets rescue_nan=false; every draw's
     full parameter bundle lands in draw-<it>-<b>.npz with why=nan|kept.)
  2. [CPU, this script] re-run every NaN-skipped draw PLUS a random
     control subset of kept draws through the compiled reference engine
     at f64 (the golden-parity harness build), and report per-draw NaN
     verdicts and the alpha distribution of the drops.

Usage:
  PYTHONPATH= JAX_PLATFORMS=cpu python tools/attrition_study.py \\
      --run results/attrition-r5 [--controls 10] [--length 1.0]

Writes results/attrition_study_r5.json and prints a summary table.
"""

import argparse
import glob
import importlib.util
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _golden():
    """Import the golden-parity harness module (holds the reference
    build/invoke logic; never copied from /root/reference)."""
    spec = importlib.util.spec_from_file_location(
        "golden_ref", os.path.join(REPO, "tests", "test_golden_reference.py")
    )
    mod = importlib.util.module_from_spec(spec)
    os.environ.setdefault("FDTD_GOLDEN", "1")  # allow the compile
    spec.loader.exec_module(mod)
    return mod


def _batched_cfg(draws, Nt):
    """Stack per-draw npz bundles into one golden-harness cfg dict."""
    from torch_fdtd_string_tpu.ops.fdm import initialize_state_rows

    B = len(draws)
    M_t = int(max(int(d["M_t"]) for d in draws))
    M_l = int(max(int(d["M_l"]) for d in draws))
    k = float(draws[0]["k"])

    def pad(key, width):
        out = np.zeros((B, width))
        for i, d in enumerate(draws):
            v = np.asarray(d[key], np.float64)
            out[i, : v.shape[-1]] = v
        return out

    def stack(key):
        return np.stack([np.asarray(d[key], np.float64) for d in draws])

    def stack_t(key):
        # (Nt,) control signals may be stored at the run's Nt; trim/pad
        out = np.zeros((B, Nt))
        for i, d in enumerate(draws):
            v = np.asarray(d[key], np.float64).reshape(-1)
            n = min(Nt, v.shape[0])
            out[i, :n] = v[:n]
            if n < Nt:
                out[i, n:] = v[-1]
        return out

    u0 = pad("u0", M_t)
    v0 = pad("v0", M_t)
    u1, u2 = initialize_state_rows(u0, v0, k)
    cfg = dict(
        B=B,
        k=k,
        theta_t=float(draws[0]["theta_t"]),
        lambda_c=float(draws[0]["lambda_c"]),
        relative_error=float(draws[0]["relative_error"]),
        M_t=M_t,
        M_l=M_l,
        surface_integral=bool(draws[0]["surface_integral"]),
        kappa=stack("kappa"),
        alpha=stack("alpha"),
        p_a=stack("p_a"),
        f0=stack_t("f0"),
        pos=stack("pos"),
        T60=stack("T60"),
        u1=np.asarray(u1),
        u2=np.asarray(u2),
        x_b=stack_t("x_b"),
        v_b=stack_t("v_b"),
        F_b=stack_t("F_b"),
        phi_0=stack("phi_0"),
        phi_1=stack("phi_1"),
        wid=stack_t("wid"),
        x_H=stack("x_H"),
        v_H_amp=0.0,  # u_H rows are set explicitly below
        w_H=stack("w_H"),
        M_r=stack("M_r"),
        alpha_H=stack("alpha_H"),
        bow_mask=stack("bow_mask").reshape(B),
        hammer_mask=stack("hammer_mask").reshape(B),
    )
    cfg["u_H_rows"] = stack_t("u_H")[:, :2]
    return cfg


def _run_reference_exact(golden, cfg, Nt):
    """Golden-harness reference call with explicit hammer state rows
    (``_run_reference`` seeds u_H from a scalar v_H_amp; the dumped draws
    carry the exact first two u_H rows instead)."""
    import torch

    mod = golden._load_reference()
    B, M_t, M_l = cfg["B"], cfg["M_t"], cfg["M_l"]
    dt = torch.float64
    state_u = torch.zeros((B, Nt, M_t), dtype=dt)
    state_u[:, 0] = torch.from_numpy(cfg["u2"])
    state_u[:, 1] = torch.from_numpy(cfg["u1"])
    state_z = torch.zeros((B, Nt, M_l), dtype=dt)
    t = lambda x: torch.as_tensor(np.asarray(x), dtype=dt)
    string_params = [
        t(cfg["kappa"]), t(cfg["alpha"]), t(cfg["u2"])[:, None, :],
        torch.zeros((B, 1, M_t), dtype=dt), t(cfg["p_a"]).view(-1, 1, 1),
        t(cfg["f0"]), t(cfg["pos"]), t(cfg["T60"]),
    ]
    bow_params = [t(cfg["x_b"]), t(cfg["v_b"]), t(cfg["F_b"]),
                  t(cfg["phi_0"]), t(cfg["phi_1"]), t(cfg["wid"])]
    u_H = torch.zeros((B, Nt), dtype=dt)
    u_H[:, :2] = torch.from_numpy(np.asarray(cfg["u_H_rows"], np.float64))
    hammer_params = [t(cfg["x_H"]), torch.zeros((B, Nt), dtype=dt), u_H,
                     t(cfg["w_H"]), t(cfg["M_r"]), t(cfg["alpha_H"])]
    out = mod.forward_fn(
        state_u, state_z, string_params, bow_params, hammer_params,
        t(cfg["bow_mask"]).view(-1, 1, 1),
        t(cfg["hammer_mask"]).view(-1, 1, 1),
        [cfg["k"], cfg["theta_t"], cfg["lambda_c"]],
        float(cfg["relative_error"]), bool(cfg["surface_integral"]),
        False, 0, Nt,
    )
    uout = out[0].numpy()
    return uout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True,
                    help="simulate run dir containing draw-*.npz dumps")
    ap.add_argument("--controls", type=int, default=10)
    ap.add_argument("--length", type=float, default=1.0,
                    help="seconds of reference simulation per draw")
    ap.add_argument("--out", default="results/attrition_study_r5.json")
    ap.add_argument("--chunk", type=int, default=4,
                    help="reference batch size per call (memory bound)")
    a = ap.parse_args()

    files = sorted(glob.glob(os.path.join(a.run, "draw-*.npz")))
    if not files:
        sys.exit(f"no draw-*.npz under {a.run}; run simulate with "
                 "task.dump_draws=true first")
    draws = []
    for f in files:
        z = np.load(f, allow_pickle=True)
        d = {k: z[k] for k in z.files}
        d["_file"] = os.path.basename(f)
        draws.append(d)
    skipped = [d for d in draws if str(d["why"]) == "nan"]
    kept = [d for d in draws if str(d["why"]) == "kept"]
    rng = np.random.default_rng(0)
    controls = [kept[i] for i in
                rng.choice(len(kept), size=min(a.controls, len(kept)),
                           replace=False)] if kept else []
    print(f"[attrition] {len(draws)} dumped draws: {len(skipped)} skipped, "
          f"{len(kept)} kept; running reference f64 on "
          f"{len(skipped)} skips + {len(controls)} controls")

    golden = _golden()
    Nt = int(48000 * a.length)
    rows = []
    todo = [("skip", d) for d in skipped] + [("control", d) for d in controls]
    for i in range(0, len(todo), a.chunk):
        batch = todo[i : i + a.chunk]
        cfg = _batched_cfg([d for _, d in batch], Nt)
        uout = _run_reference_exact(golden, cfg, Nt)
        nan = np.isnan(uout).any(axis=-1)
        for (group, d), isnan in zip(batch, nan):
            rows.append({
                "file": d["_file"], "group": group,
                "alpha": round(float(d["alpha"]), 3),
                "f0": round(float(np.asarray(d["f0"]).reshape(-1)[2]), 2),
                "p_a": round(float(d["p_a"]), 4),
                "reference_nan": bool(isnan),
            })
            print(f"[attrition] {d['_file']} ({group}): alpha="
                  f"{rows[-1]['alpha']} -> reference_nan={bool(isnan)}",
                  flush=True)
        with open(a.out, "w") as f:
            json.dump({"rows": rows, "length_s": a.length,
                       "n_draws_total": len(draws),
                       "n_skipped": len(skipped)}, f, indent=1)

    n_skip_nan = sum(r["reference_nan"] for r in rows if r["group"] == "skip")
    n_ctl_nan = sum(r["reference_nan"] for r in rows
                    if r["group"] == "control")
    alphas = sorted(r["alpha"] for r in rows if r["group"] == "skip")
    print(f"\n[attrition] reference NaN on {n_skip_nan}/{len(skipped)} of "
          f"our skips; {n_ctl_nan}/{len(controls)} of kept controls")
    print(f"[attrition] skipped-draw alpha range: {alphas}")


if __name__ == "__main__":
    main()
