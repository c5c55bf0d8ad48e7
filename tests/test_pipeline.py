"""End-to-end DMSP pipeline integration: simulate -> preprocess -> train -> score.

Mirrors the reference's full workflow (README quickstart): FDTD dataset
generation, training-data preprocessing (upsampling + analytic modal
targets + f0 tracks), a few DMSP training steps, and test scoring against
the modal baseline.  Small shapes so the whole thing runs in minutes on CPU.
"""

import json
import os
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    import jax.numpy as jnp

    from torch_fdtd_string_tpu.core import params as prm
    from torch_fdtd_string_tpu.core.engine import SimConsts
    from torch_fdtd_string_tpu.ops import fdm
    from torch_fdtd_string_tpu.tasks import simulate as sim_task
    from torch_fdtd_string_tpu.utils import misc as ms
    from torch_fdtd_string_tpu.utils import wav as wavio

    root = tmp_path_factory.mktemp("pipeline")
    sim_dir = root / "sims"
    os.makedirs(sim_dir, exist_ok=True)

    sr, length, B = 48000, 0.15, 2
    k = 1.0 / sr
    rng = np.random.default_rng(0)
    theta = fdm.get_theta(0.03, 150.0, sr)

    n_items = 0
    for it in range(3):
        results, params_out, masks = sim_task.simulate(
            "pluck",
            sr,
            theta,
            length,
            B,
            150.0,
            1.0,
            1.0,
            cpu=True,
            string_kwargs=dict(
                f0_min=150.0,
                f0_max=200.0,
                f0_mod_max=0.0,
                f0_diff_max=0.0,
                kappa_min=0.01,
                kappa_max=0.03,
                alpha_min=1.0,
                alpha_max=3.0,
                p_a_min=0.005,
                p_a_max=0.02,
                p_x_min=0.2,
                p_x_max=0.5,
            ),
            rng=rng,
            precision="single",
            collect_state=True,
        )
        uout, zout, state_u, state_z, v_r, F_H, u_H, sig0, sig1 = results
        string, bow, hammer, consts_list = params_out[:4]
        bow_mask, hammer_mask, pluck_mask = masks
        Nx_t = np.asarray(
            fdm.get_derived_vars(
                jnp.asarray(string.f0),
                jnp.asarray(string.kappa[:, None]),
                k,
                theta,
                1.0,
                jnp.asarray(string.alpha[:, None]),
            )[2]
        )
        Nx_l = np.zeros_like(Nx_t)
        for b in range(B):
            d = sim_dir / f"{it}-{b}"
            os.makedirs(d, exist_ok=True)
            wavio.write(str(d / "output-u.wav"), uout[b], sr)
            wavio.write(str(d / "output.wav"), uout[b] + zout[b], sr)
            overall = dict(
                uout=uout[b],
                zout=zout[b],
                state_u=state_u[b, :, : int(Nx_t[b].max()) + 1],
                state_z=state_z[b, :, :8],
                v_r_out=v_r[b],
                F_H_out=F_H[b],
                u_H_out=u_H[b],
                bow_mask=bow_mask[b],
                hammer_mask=hammer_mask[b],
                pluck_mask=pluck_mask[b],
                Nx_t=Nx_t[b],
                Nx_l=Nx_l[b],
                sig0=sig0[b],
                sig1=sig1[b],
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
            n_items += 1
    assert n_items == 6
    return root, sim_dir, sr


def test_preprocess_and_dataset(pipeline_dirs):
    from torch_fdtd_string_tpu.tasks.process_training_data import (
        is_processed,
        save_upsampled_data,
    )

    root, sim_dir, sr = pipeline_dirs
    Nx = 16
    data_root = root / "dmsp" / "string"
    for split, items in (
        ("train", ["0-0", "0-1", "1-0", "1-1"]),
        ("valid", ["2-0"]),
        ("test", ["2-1"]),
    ):
        for item in items:
            dst = data_root / split / item
            save_upsampled_data(str(sim_dir / item), str(dst), sr, Nx, strict=False)
            assert is_processed(str(dst), Nx), dst

    # dataset loads items with consistent shapes
    from torch_fdtd_string_tpu.data.dataset import DataLoader, Trainset

    ds = Trainset(str(root / "dmsp"), "string", trim=None)
    item = ds[3]
    assert item["target"].ndim == 1 and len(item["target"]) > 1000
    assert item["mode_freq"].shape == (100,)
    assert item["mode_coef"].shape[-1] == 100
    assert np.isfinite(item["analytic"]).all()

    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
    batch = next(iter(dl))
    assert batch["target"].shape[0] == 4
    assert batch["mode_amps"].shape == (4, 100, Nx)

    # modal target actually resembles the FDTD target spectrally
    t = batch["target"][0]
    a = batch["analytic"][0]
    T = np.abs(np.fft.rfft(t * np.hanning(len(t))))
    A = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    pk_t = T.argmax()
    pk_a = A.argmax()
    assert abs(pk_t - pk_a) <= 2, (pk_t, pk_a)


def test_train_and_score(pipeline_dirs):
    import jax

    from torch_fdtd_string_tpu.data.dataset import DataLoader, Testset, Trainset
    from torch_fdtd_string_tpu.models.losses import build_loss_registry
    from torch_fdtd_string_tpu.models.synthesizer import Synthesizer
    from torch_fdtd_string_tpu.tasks import synthesize as S

    root, _, sr = pipeline_dirs
    data_dir = str(root / "dmsp")
    block = 256
    model = Synthesizer(
        n_modes=12, n_bands=17, hidden_dim=32, embed_dim=16, block_size=block,
        sr=sr,
    )
    trainset = Trainset(data_dir, "string")
    loader = DataLoader(trainset, batch_size=4, shuffle=True, drop_last=True)

    registry = build_loss_registry(sr, 48000)
    criteria = ["l1", "magspec", "modefreq", "modeamps"]
    import optax

    tx = optax.adam(1e-3)
    first = next(iter(loader))
    prep = S.prepare_batch(first, model.n_modes, block, sr)
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    variables = model.init(
        rngs,
        [prep["xg"], prep["tg"], prep["ka"], prep["al"], prep["t60"],
         prep["f_k"], prep["c_k"]],
        prep["f_0"],
        prep["u_0"],
    )
    state = S.TrainState(
        variables["params"],
        {k: v for k, v in variables.items() if k != "params"},
        tx.init(variables["params"]),
        0,
        jax.random.key(2),
    )
    train_step = S.make_train_step(model, tx, registry, criteria, True)

    losses = []
    for epoch in range(2):
        for batch in loader:
            prep = S.prepare_batch(batch, model.n_modes, block, sr)
            state, ld = train_step(state, prep)
            losses.append(float(np.asarray(ld["loss"])))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 1.5  # moving, not exploding

    # test scoring vs modal baseline
    testset = Testset(data_dir, "string", split="test")
    tl = DataLoader(testset, batch_size=4)
    eval_step = S.make_eval_step(model, registry, criteria, True)
    batch = next(iter(tl))
    prep = S.prepare_batch(batch, model.n_modes, block, sr)
    outputs, _ = eval_step(state, prep, jax.random.key(3))
    scores = S.item_scores(outputs["preds"], outputs["target"], sr)
    assert np.isfinite(scores["si_sdr"]).all()
    analytic = prep["analytic"][..., : np.asarray(outputs["preds"]).shape[-1]]
    modal = S.item_scores(analytic, outputs["target"], sr)
    # the analytic-modal baseline should describe the FDTD wave reasonably
    assert np.isfinite(modal["si_sdr"]).all()


def test_evaluate_task(pipeline_dirs):
    root, sim_dir, sr = pipeline_dirs
    from torch_fdtd_string_tpu.tasks.evaluate import evaluate

    scores = evaluate(str(sim_dir), sr, plot=False)
    assert len(scores) == 6
    for name, s in scores:
        # YIN estimate should land near the Fletcher-predicted frequency
        assert s["abs_diff_modes"] < 0.05 * s["f0_mode_pred"], (name, s)

    from torch_fdtd_string_tpu.tasks.summarize import summarize

    stats = summarize(str(sim_dir))
    assert stats is not None


def test_fused_preprocess_matches_classic(tmp_path):
    """task.fuse_preprocess writes the SAME processed dataset (per-x wavs +
    parameters.npz) as the classic simulate->simulation.npz->
    process_training_data chain, without the full-state round-trip
    (VERDICT r2 task #1)."""
    import glob as g

    from torch_fdtd_string_tpu.tasks import process_training_data as ptd
    from torch_fdtd_string_tpu.tasks import simulate as sim_task
    from torch_fdtd_string_tpu.utils.config import compose
    from torch_fdtd_string_tpu.utils import wav as wavio

    cfg_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "torch_fdtd_string_tpu", "configs",
    )

    def run(fuse, out):
        over = [
            "experiment=nsynth-like",
            "task.num_samples=2", "task.batch_size=2", "task.length=0.1",
            "task.chunk_length=0.1", "task.randomize_name=false",
            "task.save_x_stride=4", "task.process_Nx=64", "proc.cpu=true",
            f"task.fuse_preprocess={'true' if fuse else 'false'}",
        ]
        args = compose(cfg_dir, over)
        os.makedirs(out, exist_ok=True)
        sim_task.run(args, str(out), "pluck", 1)
        return args

    fused_dir = tmp_path / "fused"
    run(True, fused_dir)
    fused_items = sorted(
        d for d in g.glob(str(fused_dir) + "-prep/*") if os.path.isdir(d)
    )
    assert len(fused_items) == 2, fused_items
    # generation metadata sidecar records the provenance batch size
    # (ADVICE r3 #4: mixed-batch-size shards must be detectable)
    meta_path = str(fused_dir) + "-prep/_gen_meta.jsonl"
    assert os.path.exists(meta_path)
    with open(meta_path) as fh:
        meta = json.loads(fh.readline())
    assert meta["batch_size"] == 2
    # state-free bundle keeps the rest of the simulation.npz contract
    z = np.load(os.path.join(str(fused_dir), "0-0", "simulation.npz"))
    assert "state_u" not in z.files and "uout" in z.files

    classic_dir = tmp_path / "classic"
    run(False, classic_dir)
    z = np.load(os.path.join(str(classic_dir), "0-0", "simulation.npz"))
    assert "state_u" in z.files
    for d in sorted(g.glob(str(classic_dir) + "/0-*")):
        out_d = str(tmp_path / "classic-prep" / os.path.basename(d))
        ptd.save_upsampled_data(d, out_d, 48000, 64, strict=False)

    for item in ("0-0", "0-1"):
        fu = sorted(g.glob(str(fused_dir) + f"-prep/{item}/ut-*.wav"))
        assert len(fu) == 16  # Nx=64 / stride 4
        fz = np.load(str(fused_dir) + f"-prep/{item}/parameters.npz")
        cz = np.load(str(tmp_path / "classic-prep" / item / "parameters.npz"))
        # fused saves the strided columns of the classic full grid
        keep = np.arange(0, 64, 4)
        np.testing.assert_allclose(
            fz["x"][0], cz["x"][0][keep], rtol=0, atol=0
        )
        np.testing.assert_allclose(
            fz["mode_freq"], cz["mode_freq"], rtol=1e-6
        )
        np.testing.assert_allclose(
            fz["mode_amps"], cz["mode_amps"][:, keep], rtol=1e-4, atol=1e-8
        )
        for xi_f, xi_c in enumerate(keep):
            wf, _ = wavio.read(str(fused_dir) + f"-prep/{item}/ut-{xi_f}.wav")
            wc, _ = wavio.read(
                str(tmp_path / "classic-prep" / item / f"ut-{xi_c}.wav")
            )
            # device postproc pulls the kept columns in float16: bound the
            # wav delta by the f16 rounding of the item's peak amplitude
            tol = 5e-4 * np.abs(wc).max() + 1e-7
            assert np.abs(wf - wc).max() < tol, (item, xi_f)


def test_x_offset_jitter_varies_kept_columns(tmp_path):
    """task.save_x_offset_jitter=true draws a fresh stride offset per batch:
    every item still stores K = Nx/stride columns, but the stored x grid
    shifts between iterations so a corpus covers all Nx columns (round-3
    mode-head x-memorization fix).  Offsets come from a dedicated generator
    seeded by proc.seed, leaving the parameter stream untouched."""
    import glob as g

    from torch_fdtd_string_tpu.tasks import simulate as sim_task
    from torch_fdtd_string_tpu.utils.config import compose

    cfg_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "torch_fdtd_string_tpu", "configs",
    )
    out = tmp_path / "jitter"
    seed = 11
    args = compose(cfg_dir, [
        "experiment=nsynth-like", f"proc.seed={seed}",
        "task.batch_size=1", "task.length=0.1",
        "task.chunk_length=0.1", "task.randomize_name=false",
        "task.save_x_stride=4", "task.process_Nx=64", "proc.cpu=true",
        "task.save=false", "task.save_modal=false",
        "task.save_output_wav=false", "task.save_x_offset_jitter=true",
    ])
    os.makedirs(out, exist_ok=True)
    sim_task.run(args, str(out), "pluck", 3)

    xg = np.linspace(0, 1, 64)
    exp_rng = np.random.default_rng([seed, 0x0FF5E7])
    offsets = []
    for it in range(3):
        # the offset is drawn once per iteration whether or not the item
        # survives (seed 11's iteration 1 draw NaNs under CPU f32 — an
        # unstable discretization, unrelated to the jitter)
        exp_off = int(exp_rng.integers(4))
        item = str(out) + f"-prep/{it}-0/parameters.npz"
        if not os.path.exists(item):
            continue
        z = np.load(item)
        x = z["x"][0]
        assert x.shape == (16,)  # K constant across offsets
        # recover the offset from the first stored x and check the whole
        # grid matches xg[off::4]
        off = int(np.argmin(np.abs(xg - x[0])))
        assert 0 <= off < 4
        np.testing.assert_allclose(x, xg[off::4], rtol=0, atol=0)
        assert off == exp_off  # seeded + reproducible
        offsets.append(off)
        # per-item wav count unchanged
        assert len(g.glob(str(out) + f"-prep/{it}-0/ut-*.wav")) == 16
    assert len(set(offsets)) > 1, offsets
    # provenance sidecar records the jitter flag
    with open(str(out) + "-prep/_gen_meta.jsonl") as fh:
        meta = json.loads(fh.readline())
    assert meta["save_x_offset_jitter"] is True


def test_corpus_mode_skips_readout_artifacts(tmp_path):
    """task.save_output_wav=false (training-corpus mode): no run-dir wav
    triplet, no readout copies in parameters.npz — but the training keys
    (ut wavs, mode data, params) are identical to the default fused run."""
    import glob as g

    from torch_fdtd_string_tpu.tasks import simulate as sim_task
    from torch_fdtd_string_tpu.utils.config import compose

    cfg_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "torch_fdtd_string_tpu", "configs",
    )
    out = tmp_path / "corpus"
    args = compose(cfg_dir, [
        "experiment=nsynth-like",
        "task.num_samples=2", "task.batch_size=2", "task.length=0.1",
        "task.chunk_length=0.1", "task.randomize_name=false",
        "task.save_x_stride=4", "task.process_Nx=64", "proc.cpu=true",
        "task.save=false", "task.save_modal=false",
        "task.save_output_wav=false",
    ])
    os.makedirs(out, exist_ok=True)
    sim_task.run(args, str(out), "pluck", 1)

    # run dir: no per-item artifact dirs at all (only the timing log)
    assert not g.glob(str(out) + "/0-*/output*.wav")
    items = sorted(
        d for d in g.glob(str(out) + "-prep/*") if os.path.isdir(d)
    )
    assert len(items) == 2, items
    z = np.load(os.path.join(items[0], "parameters.npz"))
    for key in ("uout", "zout", "v_r_out", "F_H_out", "u_H_out", "ua_f0"):
        assert key not in z.files, key
    for key in ("ut_f0", "mode_freq", "mode_amps", "x", "t", "gain",
                "kappa", "alpha", "f0", "T60", "u0"):
        assert key in z.files, key
    assert len(g.glob(items[0] + "/ut-*.wav")) == 16
    assert os.path.exists(os.path.join(items[0], "vt.wav"))


def test_dump_draws_bundles(tmp_path):
    """task.dump_draws writes one full parameter bundle per batch element
    with why in {kept, nan, silent} — the attrition-study input contract
    (tools/attrition_study.py re-runs these through the reference f64
    engine)."""
    import glob as g

    from torch_fdtd_string_tpu.tasks import simulate as sim_task
    from torch_fdtd_string_tpu.utils.config import compose

    cfg_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "torch_fdtd_string_tpu", "configs",
    )
    out = tmp_path / "draws"
    args = compose(cfg_dir, [
        "experiment=nsynth-like",
        "task.num_samples=2", "task.batch_size=2", "task.length=0.1",
        "task.chunk_length=0.1", "task.randomize_name=false",
        "task.save_x_stride=4", "task.process_Nx=64", "proc.cpu=true",
        "task.save=false", "task.save_modal=false",
        "task.dump_draws=true",
    ])
    os.makedirs(out, exist_ok=True)
    sim_task.run(args, str(out), "pluck", 1)

    dumps = sorted(g.glob(str(out) + "/draw-*.npz"))
    assert len(dumps) == 2, dumps
    z = np.load(dumps[0], allow_pickle=True)
    assert str(z["why"]) in ("kept", "nan", "silent")
    for key in ("kappa", "alpha", "u0", "v0", "p_a", "f0", "pos", "T60",
                "x_b", "v_b", "F_b", "phi_0", "phi_1", "wid",
                "x_H", "v_H", "u_H", "w_H", "M_r", "alpha_H",
                "bow_mask", "hammer_mask", "k", "theta_t", "lambda_c",
                "relative_error", "M_t", "M_l", "surface_integral"):
        assert key in z.files, key
    # the f0 control covers the full run and the state profile is live
    assert np.asarray(z["f0"]).size >= int(0.1 * 48000)
