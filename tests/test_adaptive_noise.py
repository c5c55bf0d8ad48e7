"""amp_adaptive_noise numerical safety.

The adaptive branch scales the filtered-noise level by the RMS modal
amplitude envelope.  A handful of corpus items carry ALL-ZERO mode tables
(silent/failed amplitude fits — 6 of ~19k in dmsp2k), and sqrt has an
unbounded gradient at 0: the first round-5 ablation launch NaN'd every
parameter within 50 steps.  The fix puts an eps under the sqrt and
stop_gradients the envelope (pure conditioning).  This locks both: finite
gradients through a zero-amplitude item, and noise level that scales with
the envelope.
"""

import numpy as np
import jax
import jax.numpy as jnp


def _setup(amp_adaptive_noise, zero_first_item=True):
    from torch_fdtd_string_tpu.models.synthesizer import Synthesizer
    from torch_fdtd_string_tpu.tasks import synthesize as S
    from torch_fdtd_string_tpu.models.losses import build_loss_registry

    sr, Nt, Nx, block, n_modes = 16000, 640, 256, 64, 6
    B = 3
    n_frames = Nt // block + 1
    model = Synthesizer(
        n_modes=n_modes, n_bands=9, hidden_dim=16, embed_dim=8,
        block_size=block, sr=sr, amp_adaptive_noise=amp_adaptive_noise,
    )
    rng = np.random.default_rng(0)
    c_k = rng.normal(0, 0.01, (B, 1, n_modes))
    if zero_first_item:
        c_k[0] = 0.0
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
        "c_k": jnp.asarray(c_k, jnp.float32),
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
    return model, variables, prep, S, build_loss_registry(sr, sr)


def test_zero_amplitude_item_keeps_gradients_finite():
    model, variables, prep, S, registry = _setup(True)
    params = variables["params"]
    constants = {k: v for k, v in variables.items() if k != "params"}
    criteria = ["l1", "magspec", "f0", "modeamps"]

    def loss_fn(p):
        outs = S.forward_outputs(
            model, {"params": p, **constants}, prep, jax.random.key(3),
            True, True,
        )
        return S.compute_losses(outs, registry, criteria)[0]

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert bool(jnp.isfinite(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.isfinite(leaf).all())


def test_noise_level_scales_with_mode_amplitude():
    """Quiet (zero-amp) item gets a quieter noise floor than a loud one."""
    model, variables, prep, S, _ = _setup(True)
    out = S.forward_outputs(
        model, variables, prep, jax.random.key(3), True, True
    )
    preds = np.asarray(out["preds"])
    quiet_rms = float(np.sqrt((preds[0] ** 2).mean()))
    loud_rms = float(np.sqrt((preds[1:] ** 2).mean()))
    assert quiet_rms < 0.2 * loud_rms, (quiet_rms, loud_rms)
