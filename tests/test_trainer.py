"""Trainer harness integration: full train->evaluate->resume cycle through
the config system, score TSV parity, metric accumulators, LR schedules.

Reuses the simulated+preprocessed dataset from test_pipeline's fixture
(regenerated here module-locally to stay independent)."""

import json
import os

import numpy as np
import pytest

CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "torch_fdtd_string_tpu", "configs",
)


@pytest.fixture(scope="module")
def dmsp_data(tmp_path_factory):
    """Tiny simulate->preprocess dataset (train/valid/test splits)."""
    import jax.numpy as jnp

    from torch_fdtd_string_tpu.ops import fdm
    from torch_fdtd_string_tpu.tasks import simulate as sim_task
    from torch_fdtd_string_tpu.tasks.process_training_data import (
        save_upsampled_data,
    )
    from torch_fdtd_string_tpu.utils import misc as ms
    from torch_fdtd_string_tpu.utils import wav as wavio

    root = tmp_path_factory.mktemp("trainer_data")
    sim_dir = root / "sims"
    os.makedirs(sim_dir, exist_ok=True)
    sr, length, B = 48000, 0.15, 2
    k = 1.0 / sr
    rng = np.random.default_rng(7)
    theta = fdm.get_theta(0.03, 150.0, sr)
    for it in range(3):
        results, params_out, masks = sim_task.simulate(
            "pluck", sr, theta, length, B, 150.0, 1.0, 1.0, cpu=True,
            string_kwargs=dict(
                f0_min=150.0, f0_max=200.0, f0_mod_max=0.0, f0_diff_max=0.0,
                kappa_min=0.01, kappa_max=0.03, alpha_min=1.0, alpha_max=3.0,
                p_a_min=0.005, p_a_max=0.02, p_x_min=0.2, p_x_max=0.5,
            ),
            rng=rng, precision="single", collect_state=True,
        )
        uout, zout, state_u, state_z, v_r, F_H, u_H, sig0, sig1 = results
        string, bow, hammer, consts_list = params_out[:4]
        bow_mask, hammer_mask, pluck_mask = masks
        Nx_t = np.asarray(
            fdm.get_derived_vars(
                jnp.asarray(string.f0), jnp.asarray(string.kappa[:, None]),
                k, theta, 1.0, jnp.asarray(string.alpha[:, None]),
            )[2]
        )
        for b in range(B):
            d = sim_dir / f"{it}-{b}"
            os.makedirs(d, exist_ok=True)
            wavio.write(str(d / "output-u.wav"), uout[b], sr)
            overall = dict(
                uout=uout[b], zout=zout[b],
                state_u=state_u[b, :, : int(Nx_t[b].max()) + 1],
                state_z=state_z[b, :, :8],
                v_r_out=v_r[b], F_H_out=F_H[b], u_H_out=u_H[b],
                bow_mask=bow_mask[b], hammer_mask=hammer_mask[b],
                pluck_mask=pluck_mask[b],
                Nx_t=Nx_t[b], Nx_l=np.zeros_like(Nx_t[b]),
                sig0=sig0[b], sig1=sig1[b],
                string_params=[
                    string.kappa[b], string.alpha[b], string.u0[b][None, :],
                    string.v0[b][None, :], string.p_a[b], string.f0[b],
                    string.pos[b], string.T60[b], string.target_f0[b],
                ],
                hammer_params=[
                    hammer.x_H[b], hammer.v_H[b], hammer.u_H[b],
                    hammer.w_H[b], hammer.M_r[b], hammer.alpha[b],
                ],
                bow_params=[
                    bow.x_b[b], bow.v_b[b], bow.F_b[b],
                    bow.phi_0[b], bow.phi_1[b], bow.wid[b],
                ],
            )
            ms.save_simulation_data(str(d), "pluck", overall, consts_list)

    Nx = 8
    data_root = root / "dmsp" / "string"
    for split, items in (
        ("train", ["0-0", "0-1", "1-0", "1-1"]),
        ("valid", ["2-0"]),
        ("test", ["2-1"]),
    ):
        for item in items:
            save_upsampled_data(
                str(sim_dir / item), str(data_root / split / item), sr, Nx,
                strict=False,
            )
    return root


def _args(root, save_dir, extra=()):
    from torch_fdtd_string_tpu.utils.config import compose

    overrides = [
        "experiment=synth-dmsp",
        f"task.load_dir={root / 'dmsp'}",
        "task.load_name=string",
        "task.total_epoch=1",
        "task.batch_size=8",
        "task.valid_batch_size=8",
        "task.test_batch_size=8",
        "model.n_modes=8",
        "model.n_bands=9",
        "model.hidden_dim=16",
        "model.embed_dim=8",
        "task.plot=false",
        "proc.num_workers=1",
    ] + list(extra)
    return compose(CONFIG_DIR, overrides)


def test_train_evaluate_resume(dmsp_data, tmp_path):
    from torch_fdtd_string_tpu.tasks import trainer

    root = dmsp_data
    save_dir = str(tmp_path / "run")
    os.makedirs(save_dir, exist_ok=True)

    args = _args(root, save_dir)
    state = trainer.train(args, save_dir)
    n_train = 4 * 8  # 4 strings x Nx=8
    spe = n_train // args.task.batch_size
    assert int(state.step) == spe

    # metrics.jsonl carries lr (LearningRateMonitor parity) and train losses
    recs = [json.loads(l) for l in open(os.path.join(save_dir, "metrics.jsonl"))]
    assert any("lr" in r for r in recs)
    # profiler summary written (Lightning profiler="simple" parity)
    prof = json.load(open(os.path.join(save_dir, "profile.json")))
    assert prof["train_step"]["count"] == spe

    # --- evaluate: full reference score column set for model AND baseline
    out_rows, mod_rows = trainer.evaluate(args, save_dir)
    for name in ("output", "modals"):
        path = os.path.join(save_dir, "score", f"{name}.txt")
        lines = open(path).read().strip().split("\n")
        header = lines[0].split("\t")
        assert header == ["id", "x_grid", "kappa", "alpha", "p_a", "p_x",
                          "si_sdr", "sdr", "logmag", "f0_error"]
        assert lines[-1].startswith("# mean")
        assert len(lines) == 2 + 8  # header + 8 test items + mean
    assert np.isfinite(np.asarray(out_rows)).all()
    assert np.isfinite(np.asarray(mod_rows)).all()
    # aggregate accumulator metrics logged
    recs = [json.loads(l) for l in open(os.path.join(save_dir, "metrics.jsonl"))]
    test_recs = [r for r in recs if r.get("split") == "test"]
    assert test_recs and "test/sisdr" in test_recs[-1]

    # --- resume: one more epoch continues the step counter from the ckpt
    args2 = _args(root, save_dir, extra=["task.total_epoch=2", "task.resume=true"])
    state2 = trainer.train(args2, save_dir)
    assert int(state2.step) == 2 * spe


def test_train_evaluate_physics_estimator(dmsp_data, tmp_path):
    """model.mode_estimator=physics trains and scores end-to-end under the
    honest inference protocol (use_precomputed_mode=false: the test split
    synthesizes from the model's OWN mode computation, reference
    synthesize.py:409-410)."""
    from torch_fdtd_string_tpu.tasks import trainer

    root = dmsp_data
    save_dir = str(tmp_path / "run_phys")
    os.makedirs(save_dir, exist_ok=True)

    args = _args(root, save_dir, extra=[
        "model.mode_estimator=physics",
        "model.use_precomputed_mode=false",
    ])
    state = trainer.train(args, save_dir)
    # physics path has no learned estimator params
    import jax

    flat = jax.tree_util.tree_leaves_with_path(state.params)
    assert not any("ModeEstimator" in jax.tree_util.keystr(p)
                   for p, _ in flat)

    out_rows, mod_rows = trainer.evaluate(args, save_dir)
    assert np.isfinite(np.asarray(out_rows)).all()
    assert np.isfinite(np.asarray(mod_rows)).all()
    recs = [json.loads(l) for l in open(os.path.join(save_dir, "metrics.jsonl"))]
    test_recs = [r for r in recs if r.get("split") == "test"]
    assert test_recs and "test/sisdr" in test_recs[-1]


def test_plot_state_video_artifacts(tmp_path):
    from torch_fdtd_string_tpu.tasks.callbacks import plot_state_video

    Nt, Nx = 60, 8
    t = np.linspace(0, 1, Nt)[:, None]
    x = np.sin(np.pi * np.linspace(0, 1, Nx))[None, :]
    est = np.cos(2 * np.pi * 3 * t) * x
    plot_state_video(str(tmp_path), est, est * 0.9, est * 1.1, sr=48000,
                     name="0-0")
    assert os.path.exists(tmp_path / "0-0.npz")
    with np.load(tmp_path / "0-0.npz") as z:
        assert set(z.files) == {"estimate", "analytic", "fdtd"}
        assert z["estimate"].shape == (Nt, Nx)


def test_schedule_real_horizon():
    """Cosine/warmup schedules must decay over the actual run length."""
    from torch_fdtd_string_tpu.models import optim as optlib

    total = 1234
    _, sch, _ = optlib.build("adam", {"lr": 1e-3}, "cosine", {}, None,
                             total_steps=total)
    assert float(sch(0)) == pytest.approx(1e-3)
    assert float(sch(total)) == pytest.approx(1e-6, rel=0.01)

    _, sch2, _ = optlib.build("adam", {"lr": 1e-3}, "linear_warmup",
                              {"num_warmup_steps": 100}, None,
                              total_steps=total)
    assert float(sch2(100)) == pytest.approx(1e-3)
    assert float(sch2(total)) == pytest.approx(0.0, abs=2e-5)


def test_plot_parity_artifacts(tmp_path):
    """Reference plot-panel set: simulation_data (string/bow/hammer pngs),
    state_specs, est_tar_specs, detune_scatter (plot.py:84-217, 219-268,
    926-1034, 682-820 roles)."""
    from torch_fdtd_string_tpu.utils import plot as uplot

    sr, Nt, Nx = 48000, 4096, 32
    rng = np.random.default_rng(0)
    t = np.arange(Nt) / sr
    uout = 0.01 * np.sin(2 * np.pi * 220 * t)
    zout = 0.001 * np.sin(2 * np.pi * 440 * t)
    v_r = 0.1 * np.sin(2 * np.pi * 5 * t)
    F_H = np.exp(-t * 500) * 100
    u_H = np.exp(-t * 500) * 0.01
    state_u = uout[:, None] * np.sin(np.pi * np.linspace(0, 1, Nx))[None, :]
    state_z = zout[:, None] * np.sin(np.pi * np.linspace(0, 1, 8))[None, :]
    d = str(tmp_path / "panels")
    uplot.simulation_data(
        d, uout, zout, v_r, F_H, u_H, state_u, state_z,
        string_params=[0.02, 1.0, state_u[:1], 0 * state_u[:1], 0.01,
                       np.full(Nt, 220.0), 0.3,
                       np.array([[1000.0, 20.0], [100.0, 18.0]]), 221.0],
        bow_params=[np.full(Nt, 0.25), np.full(Nt, 0.2), np.full(Nt, 50.0),
                    5.0, 0.1, np.full(Nt, 4.0)],
        hammer_params=[0.3, np.full(Nt, 1.0), np.zeros(Nt), 2000.0, 5.0, 3.0],
        sr=sr,
    )
    for f in ("string.png", "bow.png", "bow-velforce.pdf", "hammer.png"):
        assert os.path.exists(os.path.join(d, f)), f

    uplot.state_specs(str(tmp_path / "specs.pdf"),
                      state_u * 0.9, state_u * 1.1, state_u)
    assert os.path.exists(tmp_path / "specs.pdf")

    paths = uplot.est_tar_specs(str(tmp_path), uout[None] * 1.1, uout[None],
                                uout[None] * 0.9, sr)
    assert all(os.path.exists(p) for p in paths)

    uplot.detune_scatter(
        str(tmp_path / "detune.pdf"),
        {"a": rng.uniform(0, 5, 20), "b": rng.uniform(0, 3, 20)},
        rng.uniform(0.01, 0.03, 20), rng.uniform(1, 25, 20),
        rng.uniform(0, 1, 20), rng.uniform(0, 0.02, 20),
    )
    assert os.path.exists(tmp_path / "detune.pdf")


def test_device_cache_f16_gather(dmsp_data):
    """FDTD_CACHE_F16: big waveform fields stored half-precision on device,
    upcast in gather; small fields and values stay exact."""
    import numpy as np

    from torch_fdtd_string_tpu.data.dataset import Trainset
    from torch_fdtd_string_tpu.tasks import trainer

    root = dmsp_data
    ts = Trainset(str(root / "dmsp"), "string")
    g32, n = trainer._device_cache(ts, 8, 64, 48000, drop=("analytic",))
    g16, n2 = trainer._device_cache(ts, 8, 64, 48000, drop=("analytic",),
                                    f16=True)
    assert n == n2 and n >= 4
    idx = np.arange(min(4, n))
    b32 = {k: np.asarray(v) for k, v in g32(idx).items()}
    b16 = {k: np.asarray(v) for k, v in g16(idx).items()}
    assert set(b32) == set(b16)
    for k in b32:
        assert b16[k].dtype == b32[k].dtype, k  # upcast back to f32
        scale = max(1e-3, float(np.abs(b32[k]).max()))
        assert np.max(np.abs(b32[k] - b16[k])) <= 2e-3 * scale, k


def test_eval_sweep_oom_backoff():
    """_eval_sweep halves the eval batch on HBM ResourceExhausted and
    re-runs the whole sweep at the working size (trainer regression for the
    valid_batch_size=256 OOM observed with a resident 8 GB device cache)."""
    import jax

    from torch_fdtd_string_tpu.tasks.trainer import _eval_sweep

    calls = []

    def gather(idx):
        return np.asarray(idx)

    def eval_fn(state, prep, rng):
        calls.append(len(prep))
        if len(prep) > 4:
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted).")
        return {"n": len(prep)}, {"loss": float(len(prep))}

    firsts = []
    vals, bs = _eval_sweep(eval_fn, gather, n_items=10, bs=16, state=None,
                           rng=None, on_first=lambda o: firsts.append(o["n"]))
    assert bs == 4
    # 16 -> OOM, 8 -> OOM, 4 -> full sweep of ceil(10/4)=3 batches
    assert calls == [10, 8, 4, 4, 2]
    assert [v["loss"] for v in vals] == [4.0, 4.0, 2.0]
    # on_first ran once per restart but only the final sweep's values persist
    assert firsts[-1] == 4

    # a non-OOM error propagates
    def eval_bad(state, prep, rng):
        raise jax.errors.JaxRuntimeError("INTERNAL: something else")

    with pytest.raises(jax.errors.JaxRuntimeError):
        _eval_sweep(eval_bad, gather, n_items=4, bs=2, state=None, rng=None)
