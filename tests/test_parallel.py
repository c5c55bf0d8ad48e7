"""Mesh/SPMD tests on the 8-device virtual CPU mesh.

Dataset generation is embarrassingly data-parallel: with the batch sharded
over the mesh the jitted engine must produce the same results as
single-device execution, with zero collectives (SURVEY §2.3).
"""

import numpy as np
import jax
import jax.numpy as jnp


def test_sharded_simulation_matches_single_device():
    import bench
    from torch_fdtd_string_tpu.core.engine import simulate_chunk
    from torch_fdtd_string_tpu.parallel.mesh import make_mesh, shard_batch

    assert len(jax.devices()) >= 8

    args, B, _ = bench.build_workload(B=8, length=0.01, seed=11)
    carry, steps, sp, bp, hp, bm, hm, consts = args
    steps = steps[:64]

    _, ref = simulate_chunk(carry, steps, sp, bp, hp, bm, hm, consts)
    ref_u = np.asarray(ref["uout"])

    mesh = make_mesh(8)
    carry_s, sp_s, bp_s, hp_s, bm_s, hm_s = shard_batch(
        (carry, sp, bp, hp, bm, hm), mesh
    )
    _, out = simulate_chunk(carry_s, steps, sp_s, bp_s, hp_s, bm_s, hm_s, consts)
    out_u = np.asarray(out["uout"])

    # sharded execution changes f32 reduction orders; agreement is at
    # rounding level relative to the output scale
    scale = np.abs(ref_u).max() + 1e-12
    assert np.abs(out_u - ref_u).max() / scale < 1e-4
    # per-shard placement: the output really is sharded over the mesh
    assert len(out["uout"].sharding.device_set) == 8


def test_dmsp_gradients_identical_under_dp():
    """Data-parallel gradients == single-device gradients (psum check)."""
    import optax

    from torch_fdtd_string_tpu.models.losses import build_loss_registry
    from torch_fdtd_string_tpu.models.synthesizer import Synthesizer
    from torch_fdtd_string_tpu.parallel.mesh import make_mesh, shard_batch
    from torch_fdtd_string_tpu.tasks import synthesize as S

    B, Nt, Nx, block = 8, 1024, 32, 256
    n_frames = Nt // block + 1
    model = Synthesizer(
        n_modes=6, n_bands=9, hidden_dim=16, embed_dim=8, block_size=block
    )
    rng = np.random.default_rng(0)
    prep = {
        "xg": jnp.asarray(rng.random((B, 1)), jnp.float32),
        "tg": jnp.tile(jnp.arange(Nt, dtype=jnp.float32) / 48000.0, (B, 1)),
        "ka": jnp.full((B, 1), 0.02),
        "al": jnp.full((B, 1), 2.0),
        "t60": jnp.tile(jnp.array([[[1000.0, 20.0], [100.0, 18.0]]]), (B, 1, 1)),
        "f_k": jnp.asarray(0.02 + 0.001 * rng.random((B, 1, 6)), jnp.float32),
        "c_k": jnp.asarray(0.01 * rng.random((B, 1, 6)), jnp.float32),
        "f_0": jnp.full((B, n_frames), 220.0),
        "u_0": jnp.asarray(0.01 * rng.random((B, 1, Nx)), jnp.float32),
        "gt": jnp.asarray(rng.normal(size=(B, Nt)) * 0.1, jnp.float32),
        "gt_f0": jnp.asarray(0.028 + 0.001 * rng.random((B, n_frames)), jnp.float32),
    }
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    variables = model.init(
        rngs,
        [prep["xg"], prep["tg"], prep["ka"], prep["al"], prep["t60"],
         prep["f_k"], prep["c_k"]],
        prep["f_0"],
        prep["u_0"],
    )
    registry = build_loss_registry(48000, Nt)
    tx = optax.sgd(1e-2)
    state = S.TrainState(
        variables["params"],
        {k: v for k, v in variables.items() if k != "params"},
        tx.init(variables["params"]),
        0,
        jax.random.key(2),
    )
    step_fn = S.make_train_step(model, tx, registry, ["l1", "modeamps"], True)

    state_ref, ld_ref = step_fn(state, prep)

    mesh = make_mesh(8)
    prep_s = shard_batch(prep, mesh)
    state_s, ld_s = step_fn(state, prep_s)

    # losses and updated params agree between single-device and dp execution
    np.testing.assert_allclose(
        float(np.asarray(ld_ref["loss"])), float(np.asarray(ld_s["loss"])), rtol=1e-5
    )
    p_ref = jax.tree.leaves(state_ref.params)
    p_s = jax.tree.leaves(state_s.params)
    for a, b in zip(p_ref, p_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
