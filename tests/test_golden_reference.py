"""Golden parity tests against the upstream reference engine.

Compiles the reference's libtorch extension from the read-only checkout at
``/root/reference`` (never copied into this repo) and compares displacement
fields step-for-step against our engine on fixed uniform-batch
configurations — the BASELINE target is agreement within 1e-5.

These tests are gated: they run when the prebuilt extension exists at
``/tmp/ref_build`` or when ``FDTD_GOLDEN=1`` forces the (~3 min) compile.
"""

import os

import numpy as np
import pytest

REF = "/root/reference/src/model/cpp"
BUILD = "/tmp/ref_build"
SHIM = "/tmp/ref_shim/torch_linalg_shim.h"

# Opt-in: these take ~20 min (the reference inverts dense matrices per
# audio step on CPU). Run with FDTD_GOLDEN=1 python -m pytest tests/test_golden_reference.py
run_golden = os.environ.get("FDTD_GOLDEN") == "1"

pytestmark = pytest.mark.skipif(
    not (run_golden and os.path.isdir(REF)),
    reason="golden parity tests are opt-in: set FDTD_GOLDEN=1",
)


def _load_reference():
    import glob

    import torch  # noqa: F401
    from torch.utils.cpp_extension import load as cpp_load

    os.makedirs(os.path.dirname(SHIM), exist_ok=True)
    if not os.path.exists(SHIM):
        with open(SHIM, "w") as f:
            f.write(
                "#pragma once\n#include <ATen/ATen.h>\n"
                "namespace torch { namespace linalg {\n"
                "inline at::Tensor inv(const at::Tensor& A)"
                "{ return at::linalg_inv(A); }\n} }\n"
            )
    os.makedirs(BUILD, exist_ok=True)
    return cpp_load(
        name="forward_fn",
        sources=sorted(glob.glob(f"{REF}/*.cpp")),
        extra_cflags=["-include", SHIM],
        verbose=False,
        build_directory=BUILD,
    )


def _run_reference(cfg, Nt):
    import torch

    # NOTE: do not call torch.set_num_threads here — restricting MKL
    # threads on this host breaks/hangs its batched LU (DLASWP errors).
    mod = _load_reference()
    B = cfg["B"]
    M_t, M_l = cfg["M_t"], cfg["M_l"]
    dt = torch.float64

    state_u = torch.zeros((B, Nt, M_t), dtype=dt)
    state_u[:, 0] = torch.from_numpy(cfg["u2"])
    state_u[:, 1] = torch.from_numpy(cfg["u1"])
    state_z = torch.zeros((B, Nt, M_l), dtype=dt)

    t = lambda x: torch.as_tensor(np.asarray(x), dtype=dt)
    string_params = [
        t(cfg["kappa"]),
        t(cfg["alpha"]),
        t(cfg["u2"])[:, None, :],
        torch.zeros((B, 1, M_t), dtype=dt),
        t(cfg["p_a"]).view(-1, 1, 1),
        t(cfg["f0"]),
        t(cfg["pos"]),
        t(cfg["T60"]),
    ]
    bow_params = [
        t(cfg["x_b"]),
        t(cfg["v_b"]),
        t(cfg["F_b"]),
        t(cfg["phi_0"]),
        t(cfg["phi_1"]),
        t(cfg["wid"]),
    ]
    u_H = torch.zeros((B, Nt), dtype=dt)
    u_H[:, :2] += -1e-3
    u_H[:, 1] += cfg["k"] * cfg["v_H_amp"]
    hammer_params = [
        t(cfg["x_H"]),
        torch.zeros((B, Nt), dtype=dt),
        u_H,
        t(cfg["w_H"]),
        t(cfg["M_r"]),
        t(cfg["alpha_H"]),
    ]
    bow_mask = t(cfg["bow_mask"]).view(-1, 1, 1)
    hammer_mask = t(cfg["hammer_mask"]).view(-1, 1, 1)
    consts = [cfg["k"], cfg["theta_t"], cfg["lambda_c"]]

    out = mod.forward_fn(
        state_u,
        state_z,
        string_params,
        bow_params,
        hammer_params,
        bow_mask,
        hammer_mask,
        consts,
        float(cfg["relative_error"]),
        bool(cfg["surface_integral"]),
        False,
        0,
        Nt,
    )
    uout, zout, state_u, state_z, v_r, F_H, u_H_out, sig0, sig1 = out
    return {
        "uout": uout.numpy(),
        "zout": zout.numpy(),
        "state_u": state_u.numpy(),
        "state_z": state_z.numpy(),
        "sig0": sig0.numpy().reshape(-1),
        "sig1": sig1.numpy().reshape(-1),
    }


def _run_ours(cfg, Nt):
    import jax.numpy as jnp

    from torch_fdtd_string_tpu.core.engine import (
        BowParams,
        Carry,
        HammerParams,
        SimConsts,
        StringParams,
        simulate_chunk,
    )

    dt = jnp.float64
    B, M_t, M_l = cfg["B"], cfg["M_t"], cfg["M_l"]
    sp = StringParams(
        kappa=jnp.asarray(cfg["kappa"], dt),
        alpha=jnp.asarray(cfg["alpha"], dt),
        p_a=jnp.asarray(cfg["p_a"], dt),
        f0=jnp.asarray(cfg["f0"], dt),
        pos=jnp.asarray(cfg["pos"], dt),
        T60=jnp.asarray(cfg["T60"], dt),
    )
    bp = BowParams(
        x_b=jnp.asarray(cfg["x_b"], dt),
        v_b=jnp.asarray(cfg["v_b"], dt),
        F_b=jnp.asarray(cfg["F_b"], dt),
        phi_0=jnp.asarray(cfg["phi_0"], dt),
        phi_1=jnp.asarray(cfg["phi_1"], dt),
        wid=jnp.asarray(cfg["wid"], dt),
    )
    hp = HammerParams(
        x_H=jnp.asarray(cfg["x_H"], dt),
        w_H=jnp.asarray(cfg["w_H"], dt),
        M_r=jnp.asarray(cfg["M_r"], dt),
        alpha=jnp.asarray(cfg["alpha_H"], dt),
    )
    carry = Carry(
        u1=jnp.asarray(cfg["u1"], dt),
        u2=jnp.asarray(cfg["u2"], dt),
        z1=jnp.zeros((B, M_l), dt),
        z2=jnp.zeros((B, M_l), dt),
        uH1=jnp.full((B,), -1e-3 + cfg["k"] * cfg["v_H_amp"], dt),
        uH2=jnp.full((B,), -1e-3, dt),
    )
    consts = SimConsts(
        k=cfg["k"],
        theta_t=cfg["theta_t"],
        lambda_c=cfg["lambda_c"],
        relative_error=float(cfg["relative_error"]),
        M_t=M_t,
        M_l=M_l,
        surface_integral=bool(cfg["surface_integral"]),
        collect_state=True,
    )
    steps = jnp.arange(2, Nt, dtype=jnp.int32)
    _, out = simulate_chunk(
        carry,
        steps,
        sp,
        bp,
        hp,
        jnp.asarray(cfg["bow_mask"]),
        jnp.asarray(cfg["hammer_mask"]),
        consts,
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    state_u = np.concatenate(
        [cfg["u2"][:, None], cfg["u1"][:, None], out["u"].transpose(1, 0, 2)], axis=1
    )
    state_z = np.concatenate(
        [np.zeros((B, 2, M_l)), out["z"].transpose(1, 0, 2)], axis=1
    )
    return {
        "uout": out["uout"].T,
        "zout": out["zout"].T,
        "state_u": state_u,
        "state_z": state_z,
        "sig0": out["sig0"][-1],
        "sig1": out["sig1"][-1],
    }


def _make_cfg(f0v, kappa, alpha, excitation, t60=20.0, p_a=0.01, p_x=0.3,
              relative_error=4.0, B=2, sr=48000, f0_glide=0.0,
              surface_integral=0.0):
    """``f0_glide`` > 0 ramps f0 linearly from f0v to f0v*(1+f0_glide) over
    the run (upward only: the live grid shrinks inside the padded shapes
    sized at f0v) — exercises the per-step derived-vars/mask path
    (reference string.cpp:83-90) that constant-f0 fixtures never hit."""
    from torch_fdtd_string_tpu.ops import fdm
    from torch_fdtd_string_tpu.core.params import triangular_np

    k = 1.0 / sr
    theta = fdm.get_theta(kappa, f0v, sr)
    _, _, nx_t, _, nx_l, _ = fdm.get_derived_vars_np(f0v, 0.0, k, theta, 1.0, 1.0)
    _, _, N_t, _, _, _ = fdm.get_derived_vars_np(f0v, kappa, k, theta, 1.0, alpha)
    M_t, M_l = nx_t + 1, nx_l + 1
    Nt = 960  # 20 ms @ 48 kHz

    plucked = excitation == "pluck"
    u0 = triangular_np(
        M_t,
        np.full(B, N_t + 1.0),
        np.full(B, p_x if plucked else 0.0),
        np.full(B, p_a if plucked else 0.0),
    )
    idx = np.arange(M_t)
    u0 = u0 * (idx[None, :] < N_t + 1)
    cfg = dict(
        B=B,
        k=k,
        theta_t=float(theta),
        lambda_c=1.0,
        relative_error=relative_error,
        M_t=M_t,
        M_l=M_l,
        surface_integral=bool(surface_integral),
        kappa=np.full(B, kappa),
        alpha=np.full(B, alpha),
        p_a=np.full(B, p_a if plucked else 0.0),
        f0=np.tile(
            f0v * (1.0 + f0_glide * np.arange(Nt) / Nt), (B, 1)
        ),
        pos=np.full(B, 0.4),
        T60=np.tile(np.array([[[1000.0, t60], [100.0, t60]]]), (B, 1, 1)),
        u1=u0.copy(),
        u2=u0.copy(),
        x_b=np.full((B, Nt), 0.25),
        v_b=np.full((B, Nt), 0.2 if excitation == "bow" else 0.0),
        F_b=np.full((B, Nt), 60.0 if excitation == "bow" else 0.0),
        phi_0=np.full(B, 5.0),
        phi_1=np.full(B, 0.1),
        wid=np.full((B, Nt), 4.0),
        x_H=np.full(B, 0.35),
        v_H_amp=2.5 if excitation == "hammer" else 0.0,
        w_H=np.full(B, 2500.0),
        M_r=np.full(B, 5.0),
        alpha_H=np.full(B, 3.0),
        bow_mask=np.full(B, excitation == "bow"),
        hammer_mask=np.full(B, excitation == "hammer"),
    )
    return cfg, Nt


def _compare(cfg, Nt, tol=1e-5):
    ref = _run_reference(cfg, Nt)
    ours = _run_ours(cfg, Nt)
    scale = max(np.abs(ref["state_u"]).max(), 1e-12)
    du = np.abs(ref["state_u"] - ours["state_u"]).max() / scale
    scale_z = max(np.abs(ref["state_z"]).max(), 1e-30)
    dz = np.abs(ref["state_z"] - ours["state_z"]).max() / max(scale_z, scale)
    duo = np.abs(ref["uout"][:, 2:] - ours["uout"][:, : Nt - 2]).max() / max(
        np.abs(ref["uout"]).max(), 1e-12
    )
    np.testing.assert_allclose(ref["sig0"], ours["sig0"], rtol=1e-9)
    np.testing.assert_allclose(ref["sig1"], ours["sig1"], rtol=1e-9, atol=1e-12)
    assert du < tol, f"state_u rel err {du}"
    assert dz < tol, f"state_z rel err {dz}"
    assert duo < tol, f"uout rel err {duo}"
    return du, dz, duo


def test_golden_linear_pluck():
    cfg, Nt = _make_cfg(110.0, 0.03, 1.0, "pluck")
    print("linear pluck:", _compare(cfg, Nt))


def test_golden_nonlinear_pluck():
    # all-fixed-like: strong nonlinearity (alpha = 20, kappa = 0.08)
    cfg, Nt = _make_cfg(55.0, 0.08, 20.0, "pluck", p_a=0.02, p_x=0.2)
    print("nonlinear pluck:", _compare(cfg, Nt))


def test_golden_hammer():
    cfg, Nt = _make_cfg(146.8, 0.02, 2.0, "hammer")
    print("hammer:", _compare(cfg, Nt))


def test_golden_bow():
    cfg, Nt = _make_cfg(110.0, 0.02, 1.5, "bow")
    print("bow:", _compare(cfg, Nt))
