"""Mode-input protocol parity (reference synthesize.py:306/355/409).

Training and valid-split evaluation drive the oscillator bank with the
dataset's analytic mode tables (f_k, c_k); the test split synthesizes from
the ModeEstimator's own modes unless ``model.use_precomputed_mode``.  Round 2
fed GT modes everywhere, silently inflating test scores.
"""

import numpy as np
import jax
import jax.numpy as jnp


def _tiny_setup():
    from torch_fdtd_string_tpu.models.synthesizer import Synthesizer
    from torch_fdtd_string_tpu.tasks import synthesize as S

    sr, Nt, Nx, block, n_modes = 16000, 640, 256, 64, 6
    B = 2
    n_frames = Nt // block + 1
    model = Synthesizer(
        n_modes=n_modes, n_bands=9, hidden_dim=16, embed_dim=8,
        block_size=block, sr=sr,
    )
    rng = np.random.default_rng(0)
    prep = {
        "xg": jnp.asarray(rng.uniform(0.2, 0.8, (B, 1)), jnp.float32),
        "tg": jnp.tile(jnp.arange(Nt, dtype=jnp.float32) / sr, (B, 1)),
        "ka": jnp.asarray(rng.uniform(0.01, 0.03, (B, 1)), jnp.float32),
        "al": jnp.asarray(rng.uniform(1, 10, (B, 1)), jnp.float32),
        "t60": jnp.tile(
            jnp.asarray([[[1000.0, 20.0], [100.0, 18.0]]], jnp.float32),
            (B, 1, 1),
        ),
        "f_k": jnp.asarray(
            np.cumsum(rng.uniform(0.01, 0.02, (B, 1, n_modes)), -1),
            jnp.float32,
        ),
        "c_k": jnp.asarray(rng.normal(0, 0.01, (B, 1, n_modes)), jnp.float32),
        "f_0": jnp.asarray(
            rng.uniform(100, 400, (B, 1)).repeat(n_frames, 1), jnp.float32
        ),
        "u_0": jnp.zeros((B, 1, Nx), jnp.float32).at[:, 0, 40].set(0.01),
        "gt": jnp.asarray(rng.normal(0, 0.01, (B, Nt)), jnp.float32),
        "gt_f0": jnp.asarray(
            rng.uniform(0.01, 0.05, (B, 1)).repeat(n_frames, 1), jnp.float32
        ),
    }
    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        [prep["xg"], prep["tg"], prep["ka"], prep["al"], prep["t60"],
         prep["f_k"], prep["c_k"]],
        prep["f_0"],
        prep["u_0"],
    )
    return model, variables, prep, S


def test_use_gt_modes_flag_switches_mode_source():
    model, variables, prep, S = _tiny_setup()
    rng = jax.random.key(7)
    out_gt = S.forward_outputs(model, variables, prep, rng, use_gt_modes=True)
    out_est = S.forward_outputs(model, variables, prep, rng, use_gt_modes=False)

    # estimator modes differ from the dataset tables, so the waveform must too
    assert not np.allclose(
        np.asarray(out_gt["preds"]), np.asarray(out_est["preds"])
    )
    # the estimator-protocol forward is exactly model.apply with None modes
    ut, _, _ = model.apply(
        variables,
        [prep["xg"], prep["tg"], prep["ka"], prep["al"], prep["t60"],
         None, None],
        prep["f_0"], prep["u_0"], rngs={"noise": rng},
    )
    np.testing.assert_array_equal(
        np.asarray(out_est["preds"]), np.asarray(ut)[..., : prep["gt"].shape[-1]]
    )
    # loss/metric TARGETS stay the dataset tables under both protocols
    np.testing.assert_array_equal(
        np.asarray(out_est["target_fk"]), np.asarray(prep["f_k"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_gt["target_fk"]), np.asarray(prep["f_k"])
    )


def test_eval_step_protocols_differ():
    import optax

    model, variables, prep, S = _tiny_setup()
    state = S.TrainState(
        variables["params"],
        {k: v for k, v in variables.items() if k != "params"},
        optax.adam(1e-3).init(variables["params"]), 0, jax.random.key(0),
    )
    from torch_fdtd_string_tpu.models.losses import build_loss_registry

    registry = build_loss_registry(model.sr, 48000)
    criteria = ["l1", "magspec"]
    ev_gt = S.make_eval_step(model, registry, criteria, True, use_gt_modes=True)
    ev_est = S.make_eval_step(model, registry, criteria, True, use_gt_modes=False)
    rng = jax.random.key(3)
    _, ld_gt = ev_gt(state, prep, rng)
    _, ld_est = ev_est(state, prep, rng)
    assert float(ld_gt["loss"]) != float(ld_est["loss"])
