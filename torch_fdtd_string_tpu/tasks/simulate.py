"""Dataset-generation task: batched string simulation + artifact writing.

TPU-native counterpart of reference ``src/task/simulate.py``: parameter
sampling on host (``core/params.py``), a jitted ``lax.scan`` chunk loop on
the accelerator (``core/engine.py``), and the reference's artifact contract
on disk (``output{,-u,-z}.wav``, ``simulation.npz``, ``string_params.npz``,
``hammer_params.npz``, ``bow_params.npz``, ``simulation_config.yaml``,
``{cpu,gpu,tpu}_time.txt``).
"""

from __future__ import annotations

import glob
import json
import os
import threading
import time

import numpy as np

try:
    import tqdm as _tqdm

    def _progress(it, desc):
        bar = _tqdm.tqdm(it)
        bar.set_description(desc)
        return bar

except ImportError:  # pragma: no cover

    def _progress(it, desc):
        return it


from ..core import params as prm
from ..core.engine import (
    BowParams,
    Carry,
    HammerParams,
    SimConsts,
    StringParams,
    simulate_chunk,
)
from ..ops import fdm
from ..utils import audio
from ..utils import misc as ms
from ..utils import wav as wavio


def _to_device(tree, device):
    import jax

    return jax.tree.map(lambda x: jax.device_put(x, device), tree)


# Device->host link accounting for the big state pulls (the end-to-end
# bottleneck through this environment's TPU tunnel); bench.py reports it so
# "e2e audio_s/s" numbers carry their transfer denominator.
_LINK_BYTES = 0


_LINK_LOCK = threading.Lock()


def link_bytes(reset=False):
    global _LINK_BYTES
    with _LINK_LOCK:
        v = _LINK_BYTES
        if reset:
            _LINK_BYTES = 0
    return v


_SAVE_T = {}


def _acc_save_t(phase, dt):
    """Writer-phase wall accumulator (VERDICT r3 #3: measure where the e2e
    wall goes before optimizing it); dumped per run into skip_stats.json."""
    with _LINK_LOCK:
        tot, n = _SAVE_T.get(phase, (0.0, 0))
        _SAVE_T[phase] = (tot + dt, n + 1)


def save_timing(reset=False):
    with _LINK_LOCK:
        v = {k: {"total_s": round(t, 3), "n": n, "ms_each": round(t / n * 1e3, 1)}
             for k, (t, n) in _SAVE_T.items()}
        if reset:
            _SAVE_T.clear()
    return v


def _count_link(arr):
    # writer-pool threads resolve deferred pulls concurrently; an unlocked
    # += loses increments and under-reports the link accounting
    global _LINK_BYTES
    with _LINK_LOCK:
        _LINK_BYTES += int(getattr(arr, "nbytes", 0))
    return arr


class _DeferredState:
    """Lazy device->host pull of the space-time state fields.

    The pull happens on first ``get()`` (once, under a lock) — artifact
    writer threads resolve it while the accelerator runs the NEXT batch's
    kernel, overlapping the slow device->host link with compute.  Batches
    whose items are all NaN/silent never pay the transfer at all.
    """

    def __init__(self, fn, elem_fn=None):
        import threading

        self._fn = fn
        self._elem_fn = elem_fn
        self._lock = threading.Lock()
        self._val = None

    def get(self):
        """Returns ``(state_u, state_z)`` numpy arrays (pulled once)."""
        with self._lock:
            if self._fn is not None:
                self._val = self._fn()
                self._fn = None
        return self._val

    def fetch_element(self, b, w):
        """Pull only element ``b``'s transverse state at its live width
        ``w`` — (Nt, w) float32.  The fused simulate->dataset path uses this
        so each sample moves ~Nt*w*2 bytes over the link instead of the
        whole padded (Nt, B, M_t) field."""
        if self._elem_fn is not None and self._val is None:
            return self._elem_fn(b, w)
        su, _ = self.get()
        return np.asarray(su[b, :, :w], np.float32)


class _DeferredPost:
    """Lazy pull of the on-device postprocessing outputs (ops/postproc.py).

    Holds the device dict from :func:`..ops.postproc.postprocess_batch`;
    the first writer thread pulls everything at once (K kept f16 columns +
    tracks — ~30-100x fewer link bytes than the native-width state pulls
    they replace), overlapping the next batch's kernel."""

    def __init__(self, dev):
        import threading

        self._dev = dev
        self._lock = threading.Lock()
        self._val = None

    def get(self):
        with self._lock:
            if self._dev is not None:
                import jax

                self._val = {
                    k: _count_link(np.asarray(v))
                    for k, v in jax.device_get(self._dev).items()
                }
                self._dev = None
        return self._val


class _LazyArray:
    """Device array with a memoized one-shot bulk pull.

    The readout waveforms (uout/zout) are only consumed by artifact writers
    (wav/bundle/plot); holding them on-device until a writer thread indexes
    them moves the pull off the simulation loop's critical path — and a
    training-corpus run (task.save_output_wav=false, task.save=false) never
    pulls them at all.  Wraps numpy transparently (rescue-spliced batches)."""

    def __init__(self, arr):
        import threading

        self._arr = arr
        self._np = arr if isinstance(arr, np.ndarray) else None
        self._lock = threading.Lock()

    @property
    def shape(self):
        return self._arr.shape if self._np is None else self._np.shape

    def np(self):
        with self._lock:
            if self._np is None:
                self._np = _count_link(np.asarray(self._arr))
                self._arr = None
            return self._np

    def __getitem__(self, i):
        return self.np()[i]

    def __array__(self, dtype=None):
        a = self.np()
        return a.astype(dtype) if dtype is not None else a


def _pallas_eligible(consts: SimConsts, device, dtype):
    """The fused TPU kernel covers all excitations incl. MMS (f32 only;
    double-precision verification runs stay on the CPU/XLA engine)."""
    import os

    if os.environ.get("FDTD_NO_PALLAS") == "1":
        return False
    if device is None or getattr(device, "platform", "cpu") == "cpu":
        return False
    import numpy as _np

    return dtype == _np.float32


def kernel_gmres_rerun_enabled(task, args):
    """Gate for rescue-ladder step 1 (the on-TPU GMRES-enabled re-run).

    rescue_nan=false selects the reference's NaN-skip semantics
    (reference simulate.py:91-93): skips are replaced by fresh draws, so
    the whole ladder is off, not just the f64 stage.  The re-run
    re-dispatches the full batch, and the round-4 corpus measurement
    (results/dmsp5k-sim-train-1000/skip_stats.json: 130 first-pass NaN,
    8 rescued over 1,200 samples) shows it recovers ~6% of diverged
    elements — ~0.7% of samples — at ~2x batch kernel cost, while a
    replacement sample costs ~2% of a batch.  Verification/archival
    configs (rescue_nan=true, the default) keep the full ladder.
    """
    import os

    return (
        not args.proc.cpu
        and task.get("precision", "single") != "double"
        and task.get("rescue_nan", True)
        and os.environ.get("FDTD_NO_KERNEL_GMRES") != "1"
        and os.environ.get("FDTD_KERNEL_GMRES_INLINE") != "1"
    )


_OSTACK_DEV = {}


def _ostack_device(M, keep, n_grid):
    """Per-process device-resident spline operator stack (uploaded once)."""
    import jax.numpy as jnp

    from ..ops import postproc as pp

    key = (int(M), tuple(int(i) for i in keep), int(n_grid))
    dev = _OSTACK_DEV.get(key)
    if dev is None:
        dev = jnp.asarray(
            pp.spline_operator_stack(M, np.asarray(keep), n_grid=n_grid)
        )
        _OSTACK_DEV[key] = dev
    return dev


def _process_pallas(state, bow, hammer, bow_mask, hammer_mask,
                    consts: SimConsts, Nt, sr, collect_state,
                    defer_state=False, mesh=None, postproc_keep=None,
                    defer_out=False, kernel_gmres=None):
    """Whole-run fused-kernel path (ops/pallas_step.py).

    Control signals are edge-padded up to a chunk multiple; the surplus
    steps are discarded (each sample is independent, so the advanced carry
    is unused).  On excitation-free runs the bow/hammer probe artifacts are
    zero and the free hammer-displacement ramp is reproduced in closed form.
    """
    import jax.numpy as jnp

    from ..ops.pallas_step import string_chunked, string_chunked_bucketed

    chunk = 128 if collect_state else 512
    # measured on v5e: batch_block=64 is ~20% faster than 32 at B=256
    # (fewer sequential grid blocks); 128 exceeds VMEM
    bblock = 8 if collect_state else 64
    B = state.u0.shape[0]
    T = Nt - 2
    T_pad = ((T + chunk - 1) // chunk) * chunk

    def tpad(x):
        x = np.asarray(x, np.float32)
        return jnp.asarray(
            np.concatenate(
                [x[:, 2:Nt], np.repeat(x[:, -1:], T_pad - T, axis=1)], axis=1
            )
        )

    f0 = tpad(state.f0)
    u1_init, u2_init = fdm.initialize_state_rows(state.u0, state.v0, consts.k)
    M_l = consts.M_l
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    uH1 = f32(hammer.u_H[:, 1])
    uH2 = f32(hammer.u_H[:, 0])
    bow_d = None
    if consts.has_bow:
        bow_d = dict(
            x_b=tpad(bow.x_b), v_b=tpad(bow.v_b), F_b=tpad(bow.F_b),
            wid=tpad(bow.wid), phi_0=f32(bow.phi_0), phi_1=f32(bow.phi_1),
            mask=jnp.asarray(bow_mask), uH1=uH1, uH2=uH2,
        )
    hammer_d = None
    if consts.has_hammer:
        hammer_d = dict(
            x_H=f32(hammer.x_H), w_H=f32(hammer.w_H), M_r=f32(hammer.M_r),
            alpha=f32(hammer.alpha), mask=jnp.asarray(hammer_mask),
            uH1=uH1, uH2=uH2,
        )

    # grid-size bucketing: a random batch's live grids scale ~1/f0, so
    # sub-batches of high-f0 strings run at a narrower padded width (every
    # VPU op / PCR level / gather block is O(width)); identical results
    # (FDTD_NO_BUCKET=1 reverts).  The shard_map path stays unbucketed —
    # group shapes would differ per device.
    call_kernel = string_chunked_bucketed
    if mesh is not None and B % mesh.devices.size == 0:
        call_kernel = string_chunked
        # multi-chip dataset generation: run the per-device kernel under
        # shard_map over the batch axis — embarrassingly parallel, zero
        # collectives; each chip executes its own pallas grid on B/n strings
        import jax
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        def _spec_of(x, B_glob):
            if hasattr(x, "ndim") and x.ndim >= 1:
                if x.shape[0] == B_glob:
                    return P(DATA_AXIS, *([None] * (x.ndim - 1)))
                if x.ndim == 3 and x.shape[1] == B_glob:
                    return P(None, DATA_AXIS, None)
            return P()

        def call_kernel(*arrs, **kw):
            # split array leaves (sharded) from static kwargs; p_a is a
            # (B,)-shaped kw array (MMS runs) and must shard with the batch
            def inner(pos_arrs, bow_kw, hammer_kw, p_a_kw):
                return string_chunked(
                    *pos_arrs,
                    bow=bow_kw,
                    hammer=hammer_kw,
                    p_a=p_a_kw,
                    **{k: v for k, v in kw.items()
                       if k not in ("bow", "hammer", "p_a")},
                )

            operands = (arrs, kw.get("bow"), kw.get("hammer"),
                        kw.get("p_a"))
            in_specs = jax.tree.map(lambda x: _spec_of(x, B), operands)
            out_shape = jax.eval_shape(inner, *operands)
            out_specs = jax.tree.map(lambda x: _spec_of(x, B), out_shape)
            return shard_map(
                inner, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_rep=False,
            )(*operands)

    kernel_extra = {}
    if call_kernel is string_chunked_bucketed:
        # host copies for the bucketing grid bounds (skips a wedge-prone
        # tiny d2h sync; the sampler produced these on the host)
        kernel_extra["host_bounds"] = (
            np.asarray(state.f0)[:, 2:Nt], np.asarray(state.kappa),
            np.asarray(state.alpha),
        )
    uout_d, zout_d, aux = call_kernel(
        f0,
        f32(state.kappa),
        f32(state.alpha),
        f32(state.pos),
        f32(state.T60),
        f32(u1_init),
        f32(u2_init),
        jnp.zeros((B, M_l), jnp.float32),
        jnp.zeros((B, M_l), jnp.float32),
        k=consts.k,
        theta_t=consts.theta_t,
        lambda_c=consts.lambda_c,
        M_t=consts.M_t,
        M_l=M_l,
        chunk=chunk,
        batch_block=bblock,
        surface_integral=consts.surface_integral,
        collect_state=collect_state,
        bow=bow_d,
        hammer=hammer_d,
        relative_error=consts.relative_error,
        manufactured=consts.manufactured,
        mms_centered=consts.mms_centered,
        p_a=f32(state.p_a) if consts.manufactured else None,
        # In-kernel GMRES exact-coupling solve (f32 stability at high
        # alpha).  Default OFF for the first pass: compiling the rescue
        # branch into the step costs ~2x even when never taken, so the
        # production path poisons untrustworthy elements to NaN and the
        # run() rescue ladder re-runs the batch through the GMRES-enabled
        # kernel variant only when that happens.
        # FDTD_KERNEL_GMRES_INLINE=1 restores the single-pass inline form;
        # FDTD_NO_KERNEL_GMRES=1 disables the kernel GMRES everywhere.
        gmres_rescue=(
            (os.environ.get("FDTD_KERNEL_GMRES_INLINE") == "1"
             if kernel_gmres is None else bool(kernel_gmres))
            and os.environ.get("FDTD_NO_KERNEL_GMRES") != "1"
        ),
        **kernel_extra,
    )
    if defer_out and not (consts.has_bow or consts.has_hammer):
        # keep the readouts on-device: writer threads pull them lazily
        # (_LazyArray), and corpus runs that skip the wav artifacts never
        # pull them at all
        uout = uout_d[:, :T]
        zout = zout_d[:, :T]
    else:
        uout = _count_link(np.asarray(uout_d))[:, :T]
        zout = _count_link(np.asarray(zout_d))[:, :T]

    B_out = int(uout.shape[0])
    if consts.has_bow or consts.has_hammer:
        v_r = np.asarray(aux["v_r"])[:, :T]
        F_H = np.asarray(aux["F_H"])[:, :T]
        u_H = np.asarray(aux["u_H"])[:, :T] / consts.k
    else:
        # closed-form free hammer ramp (engine fast-path semantics)
        uH1n = hammer.u_H[:, 1]
        vstep = hammer.u_H[:, 1] - hammer.u_H[:, 0]
        n = np.arange(1, T + 1)[None, :]
        u_H = (uH1n[:, None] + n * vstep[:, None]) / consts.k
        v_r = np.zeros((B_out, T), np.float32)
        F_H = np.zeros((B_out, T), np.float32)

    from ..utils.audio import T60_to_sigma

    gamma = 2.0 * state.f0[:, -1]
    sig0, sig1 = T60_to_sigma(state.T60, gamma, state.kappa * gamma)

    if collect_state:
        su_d, sz_d = aux["state_u"], aux["state_z"]
        if os.environ.get("FDTD_STATE_F16"):
            # round-1 spelling of the opt-in; f16 is the default now
            print("[simulate] FDTD_STATE_F16 is obsolete (f16 state pull is "
                  "the default; set FDTD_STATE_F32=1 for full precision)")
        if os.environ.get("FDTD_STATE_F32") != "1":
            # halve the device->host transfer (this environment's TPU tunnel
            # moves ~25 MB/s; real hosts do GB/s) at ~1e-3 relative precision.
            # Default ON: the tunnel is the end-to-end bottleneck (VERDICT
            # round-1 "what's weak" #1); FDTD_STATE_F32=1 opts out.
            su_d = su_d.astype(jnp.float16)
            sz_d = sz_d.astype(jnp.float16)

        def _fetch(su_d=su_d, sz_d=sz_d):
            su = _count_link(np.asarray(su_d))[:T].astype(np.float32).transpose(1, 0, 2)
            sz = _count_link(np.asarray(sz_d))[:T].astype(np.float32).transpose(1, 0, 2)
            state_u = np.concatenate(
                [u2_init[:, None].astype(np.float32),
                 u1_init[:, None].astype(np.float32), su],
                axis=1,
            )
            state_z = np.concatenate(
                [np.zeros((B, 2, M_l), np.float32), sz], axis=1
            )
            return state_u, state_z

        if defer_state:

            def _fetch_elem(b, w, su_d=su_d):
                su = _count_link(
                    np.asarray(su_d[:T, b, :w])
                ).astype(np.float32)  # (T, w)
                head = np.stack(
                    [u2_init[b, :w], u1_init[b, :w]], axis=0
                ).astype(np.float32)
                return np.concatenate([head, su], axis=0)  # (Nt, w)

            handle = _DeferredState(_fetch, elem_fn=_fetch_elem)
            handle.post = None
            if postproc_keep is not None and mesh is None:
                # device-side dataset postprocessing (ops/postproc.py):
                # upsample/track/normalise on-chip so only the kept training
                # grid crosses the link.  Guard: the group sweep covers
                # per-element width spreads < G (f0_mod <= 8% in the sampler
                # => ~20; a wider preset falls back to native-width pulls).
                from ..ops import postproc as pp

                G = 32
                spread = pp.host_widths_spread(
                    np.asarray(state.f0, np.float32),
                    np.asarray(state.kappa), consts.k, consts.theta_t,
                    consts.lambda_c,
                )
                if spread < G:
                    keep_idx, keep_grid = postproc_keep
                    out_dev = pp.postprocess_batch(
                        aux["state_u"][:T],
                        f32(u1_init), f32(u2_init),
                        f32(np.asarray(state.f0)[:, :2]), f0,
                        f32(state.kappa),
                        _ostack_device(consts.M_t, keep_idx, keep_grid),
                        k=consts.k, theta_t=consts.theta_t,
                        lambda_c=consts.lambda_c, sr=sr, G=G,
                    )
                    handle.post = _DeferredPost(out_dev)
                else:
                    print(f"[simulate] width spread {spread} >= {G}; "
                          "device postproc off for this batch")
            return uout, zout, handle, None, v_r, F_H, u_H, sig0, sig1
        state_u, state_z = _fetch()
    else:
        state_u = state_z = None
    return uout, zout, state_u, state_z, v_r, F_H, u_H, sig0, sig1


def _assemble_post_item(pz, b, _sim, _str, _bow, _ham, string, Nx_t,
                        fuse_keep, fuse_Nx, task, sr, save_modal):
    """Assemble one processed training item from the device-postprocessed
    arrays (same key schema as :func:`..tasks.process_training_data.
    build_processed`; the parity test asserts key-set equality)."""
    from ..ops import postproc as pp
    from ..utils import data as udata

    ut = np.asarray(pz["ut_keep"][b], np.float32)  # (Nt, K)
    Nt = ut.shape[0]
    # summed-velocity wav (state_to_wav, k=1), diffed on device (f16 pull)
    vt = np.asarray(pz["vt"][b], np.float32)
    # NOTE gain convention: the device postproc takes max|u| over the
    # NATIVE-width live domain; the reference (and build_processed) take it
    # over the 256-grid upsampled field, which differs by the spline
    # over/undershoot (~1%).  Materializing all 256 columns on device just
    # for the max costs a (B, Nt, 256) temp at corpus batch sizes; since
    # gain multiplies estimate and target alike per item, the scoring
    # effect is nil.  Documented divergence (ROADMAP.md).
    gain = 1.0 / (float(pz["umax"][b]) + float(np.finfo(np.float32).eps))
    ti = np.arange(Nt, dtype=np.float64)[:, None] / sr
    xi = np.linspace(0, 1, fuse_Nx)

    w0 = int(np.asarray(Nx_t[b]).reshape(-1)[0]) + 1
    u0n = np.asarray(string.u0[b][:w0], np.float32)
    u0_256 = u0n @ udata.spline_matrix(w0, fuse_Nx).T

    ua_keep, uas, mode_freq, ma_keep, ua_f0 = pp.modal_target_host(
        u0_256, string.f0[b], string.kappa[b], string.T60[b], Nt, sr,
        fuse_keep, strict=False, synth=save_modal,
    )

    _sim = dict(_sim)
    _sim.update(
        ut_f0=np.asarray(pz["ut_f0"][b], np.float64),
        mode_freq=mode_freq,
        mode_amps=ma_keep,
        x=xi[np.asarray(fuse_keep)][None, :],
        t=ti,
        ut=ut,
        vt=vt,
        gain=float(gain),
    )
    if save_modal:
        _sim.update(ua=ua_keep, ua_f0=ua_f0)
    _str = dict(_str)
    _str.pop("v0", None)
    # u0 is the model's IC-profile input on the FULL fuse_Nx(=256) training
    # grid (reference process_training_data.py:193 keeps ut[0] at new_Nx;
    # ModeEstimator derives p_x as argmax(u0)/255).  Slicing it to the
    # saved-pickup subset like x/mode_amps corrupts that input — and with
    # per-split save_x_stride recipes the grids even differ between train
    # and valid, which round 3's first dmsp5k training run showed forces
    # the mode heads to memorize (valid modefreq floor ~100x train).
    _str.update(u0=u0_256[None, :])
    _bow = dict(_bow)
    _bow["ph0_B"] = _bow.pop("phi_0")
    _bow["ph1_B"] = _bow.pop("phi_1")
    _ham = dict(_ham)
    _ham["M_H"] = _ham.pop("M_r")
    _ham["a_H"] = _ham.pop("alpha")

    overall = {}
    overall.update(_sim)
    overall.update(_str)
    overall.update(_bow)
    overall.update(_ham)
    return overall


def _slice_batch(obj, idx, B, cast_f64=False):
    """Per-element slice of a params dataclass (batch-major arrays only)."""
    import dataclasses

    kw = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == B:
            v = v[idx]
            if cast_f64 and np.issubdtype(v.dtype, np.floating):
                v = v.astype(np.float64)
        kw[f.name] = v
    return dataclasses.replace(obj, **kw)


def rescue_nan_elements(string, bow, hammer, bow_mask, hammer_mask, idx,
                        consts: SimConsts, Nt, chunk_size, sr):
    """Re-simulate diverged batch elements at f64 on the host CPU.

    The f32 fast path's iterative coupled solve can blow up for strongly
    coupled draws (alpha >~ 17 at high f0), where the reference's exact
    joint dense solve (string.cpp:173-175) stays stable.  The f64 engine is
    verified reference-parity in that regime (1.7e-5 over 4000 steps at
    alpha=23), so diverged elements are re-run at double precision and
    spliced back instead of being dropped from the dataset.
    """
    import jax

    # x64 only for the duration of the rescue: leaving it enabled makes
    # subsequent f32 Pallas kernel traces blow the recursion limit (Mosaic
    # lowering under x64), silently demoting the fast path to the engine
    x64_before = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    B = len(bow_mask)
    dump = os.environ.get("FDTD_DUMP_NAN_PARAMS")
    if dump:  # failure forensics: capture the exact diverged draws
        import dataclasses

        rec = {"idx": np.asarray(idx)}
        for tag, o in (("string", string), ("bow", bow), ("hammer", hammer)):
            for f in dataclasses.fields(o):
                v = getattr(o, f.name)
                if isinstance(v, np.ndarray):
                    rec[f"{tag}_{f.name}"] = v
        np.savez(dump, **rec)
    s2 = _slice_batch(string, idx, B, cast_f64=True)
    b2 = _slice_batch(bow, idx, B, cast_f64=True)
    h2 = _slice_batch(hammer, idx, B, cast_f64=True)
    bm2, hm2 = bow_mask[idx], hammer_mask[idx]
    consts2 = consts._replace(
        has_bow=bool(np.any(bm2)), has_hammer=bool(np.any(hm2)),
        # strongly-coupled draws mix large-negative and near-one GS
        # eigenvalues — no scalar damping converges; use the robust
        # Krylov joint solve (rare path, correctness over speed)
        coupling_solver="gmres", coupling_max_iter=64,
    )
    dev = jax.devices("cpu")[0]
    try:
        # All rescued elements run in ONE batched engine call: the engine's
        # "gmres" coupling solver is vmapped per element (engine.py
        # coupled_solve), so each element has its own Krylov space — a
        # hopeless NaN element (genuinely unstable; the reference blows up
        # identically at f64) cannot poison its neighbours, and quiet
        # elements are not under-solved against a loud joint ||b||.  Wall
        # time is therefore sublinear in the rescue count (lockstep sweeps)
        # instead of one full re-simulation per element.
        out = process(
            s2, b2, h2, bm2, hm2, consts2, Nt, chunk_size,
            device=dev, save_path=None, sr=sr, skip_nan=True,
            collect_state=consts.collect_state, defer_state=False,
        )
        return tuple(np.asarray(o) if o is not None else None for o in out)
    finally:
        jax.config.update("jax_enable_x64", x64_before)


def process(
    state,
    bow,
    hammer,
    bow_mask,
    hammer_mask,
    consts: SimConsts,
    Nt,
    chunk_size,
    device=None,
    save_path=None,
    sr=48000,
    skip_nan=True,
    collect_state=True,
    defer_state=False,
    mesh=None,
    postproc_keep=None,
    defer_out=False,
    kernel_gmres=None,
):
    """Chunked time loop (reference simulate.py:16-119).

    The reference re-feeds the last two state rows of each chunk as the first
    two of the next (2-sample overlap, simulate.py:57-107); the scan carry
    implements the same recursion directly.  On TPU, eligible pluck runs use
    the fused Pallas kernel.  Returns numpy outputs.
    """
    import jax
    import jax.numpy as jnp

    if _pallas_eligible(consts, device, np.float32 if state.u0.dtype != np.float64 else np.float64):
        try:
            return _process_pallas(
                state, bow, hammer, bow_mask, hammer_mask, consts, Nt, sr,
                collect_state, defer_state=defer_state, mesh=mesh,
                postproc_keep=postproc_keep, defer_out=defer_out,
                kernel_gmres=kernel_gmres,
            )
        except Exception as err:  # Mosaic/driver issues -> XLA engine fallback
            if os.environ.get("FDTD_REQUIRE_PALLAS") == "1":
                raise
            print(f"[simulate] pallas path unavailable ({err}); using XLA engine")

    dtype = jnp.float64 if state.u0.dtype == np.float64 else jnp.float32
    B = state.u0.shape[0]
    M_t, M_l = consts.M_t, consts.M_l

    u1_init, u2_init = fdm.initialize_state_rows(state.u0, state.v0, consts.k)
    carry = Carry(
        u1=jnp.asarray(u1_init, dtype),
        u2=jnp.asarray(u2_init, dtype),
        z1=jnp.zeros((B, M_l), dtype),
        z2=jnp.zeros((B, M_l), dtype),
        uH1=jnp.asarray(hammer.u_H[:, 1], dtype),
        uH2=jnp.asarray(hammer.u_H[:, 0], dtype),
    )
    sp = StringParams(
        kappa=jnp.asarray(state.kappa, dtype),
        alpha=jnp.asarray(state.alpha, dtype),
        p_a=jnp.asarray(state.p_a, dtype),
        f0=jnp.asarray(state.f0, dtype),
        pos=jnp.asarray(state.pos, dtype),
        T60=jnp.asarray(state.T60, dtype),
    )
    bp = BowParams(
        x_b=jnp.asarray(bow.x_b, dtype),
        v_b=jnp.asarray(bow.v_b, dtype),
        F_b=jnp.asarray(bow.F_b, dtype),
        phi_0=jnp.asarray(bow.phi_0, dtype),
        phi_1=jnp.asarray(bow.phi_1, dtype),
        wid=jnp.asarray(bow.wid, dtype),
    )
    hp = HammerParams(
        x_H=jnp.asarray(hammer.x_H, dtype),
        w_H=jnp.asarray(hammer.w_H, dtype),
        M_r=jnp.asarray(hammer.M_r, dtype),
        alpha=jnp.asarray(hammer.alpha, dtype),
    )
    bmask = jnp.asarray(bow_mask)
    hmask = jnp.asarray(hammer_mask)
    if mesh is not None:
        # shard the batch axis across the mesh: the scan engine is pure
        # batched ops, so GSPMD partitions it with no collectives beyond the
        # convergence-exit any() reductions
        from ..parallel import mesh as pmesh

        carry, sp, bp, hp, bmask, hmask = pmesh.shard_batch(
            (carry, sp, bp, hp, bmask, hmask), mesh
        )
    elif device is not None:
        carry, sp, bp, hp, bmask, hmask = _to_device(
            (carry, sp, bp, hp, bmask, hmask), device
        )

    outs = []
    np_dt = np.float64 if dtype == jnp.float64 else np.float32
    state_rows_u = [
        np.asarray(u2_init, np_dt)[:, None, :],
        np.asarray(u1_init, np_dt)[:, None, :],
    ]
    state_rows_z = [np.zeros((B, 1, M_l), np_dt), np.zeros((B, 1, M_l), np_dt)]
    # chunk boundaries over global steps 2..Nt-1 (reference advances
    # cn += chunk_size - 2 per chunk)
    starts = list(range(2, Nt, max(chunk_size - 2, 1)))
    wrote = 0
    for cs in starts:
        ce = min(cs + chunk_size - 2, Nt)
        if ce <= cs:
            break
        steps = jnp.arange(cs, ce, dtype=jnp.int32)
        carry, out = simulate_chunk(carry, steps, sp, bp, hp, bmask, hmask, consts)
        out = {k: np.asarray(v) for k, v in out.items()}
        outs.append(out)
        if collect_state:
            state_rows_u.append(out.pop("u").transpose(1, 0, 2))
            state_rows_z.append(out.pop("z").transpose(1, 0, 2))
        if skip_nan is False:
            bad = np.isnan(out["uout"]).any(axis=0)
            assert not bad.any(), np.nonzero(bad)
        if save_path is not None:
            uout = np.concatenate([o["uout"] for o in outs], axis=0).T  # (B, T)
            zout = np.concatenate([o["zout"] for o in outs], axis=0).T
            nan_b = np.isnan(uout.sum(-1))
            for b in range(B):
                if nan_b[b]:
                    continue
                d = f"{save_path}-{b}"
                os.makedirs(d, exist_ok=True)
                wavio.write(f"{d}/output-u.wav", uout[b], sr, "PCM_16")
                wavio.write(f"{d}/output-z.wav", zout[b], sr, "PCM_16")
                wavio.write(f"{d}/output.wav", uout[b] + zout[b], sr, "PCM_16")
        wrote = ce

    cat = lambda key: np.concatenate([o[key] for o in outs], axis=0).T  # (B, T)
    uout = cat("uout")
    zout = cat("zout")
    v_r = cat("v_r")
    F_H = cat("F_H")
    u_H = cat("u_H") / consts.k  # reference divides by k on return (simulator.cpp:57)
    sig0 = outs[-1]["sig0"][-1]
    sig1 = outs[-1]["sig1"][-1]
    if collect_state:
        state_u = np.concatenate(state_rows_u, axis=1)
        state_z = np.concatenate(state_rows_z, axis=1)
        if defer_state:  # uniform caller contract with the pallas path
            handle = _DeferredState(lambda: (state_u, state_z))
            handle.post = None
            if postproc_keep is not None and dtype == jnp.float32:
                # engine-path twin of the pallas postproc hookup (state is
                # host-resident here, but the batched upsample + YIN still
                # beat the per-item host loop; double-precision verification
                # runs keep the dtype-faithful host path)
                from ..ops import postproc as pp

                G = 32
                spread = pp.host_widths_spread(
                    np.asarray(state.f0, np.float32),
                    np.asarray(state.kappa), consts.k, consts.theta_t,
                    consts.lambda_c,
                )
                if spread < G:
                    keep_idx, keep_grid = postproc_keep
                    f0_np = np.asarray(state.f0, np.float32)
                    out_dev = pp.postprocess_batch(
                        jnp.asarray(
                            state_u[:, 2:].transpose(1, 0, 2), jnp.float32
                        ),
                        jnp.asarray(u1_init, jnp.float32),
                        jnp.asarray(u2_init, jnp.float32),
                        jnp.asarray(f0_np[:, :2]),
                        jnp.asarray(f0_np[:, 2:]),
                        jnp.asarray(state.kappa, jnp.float32),
                        _ostack_device(consts.M_t, keep_idx, keep_grid),
                        k=consts.k, theta_t=consts.theta_t,
                        lambda_c=consts.lambda_c, sr=sr, G=G,
                    )
                    handle.post = _DeferredPost(out_dev)
            return uout, zout, handle, None, v_r, F_H, u_H, sig0, sig1
    else:
        state_u = state_z = None
    return uout, zout, state_u, state_z, v_r, F_H, u_H, sig0, sig1


def simulate(
    model_name,
    sr,
    theta_t,
    length,
    batch_size,
    f0_inf,
    alpha_inf,
    lambda_c,
    cpu=False,
    load_config=None,
    chunk_length=-1,
    save_path=None,
    string_kwargs=None,
    hammer_kwargs=None,
    bow_kwargs=None,
    skip_nan=True,
    precision="single",
    relative_order=4,
    surface_integral=False,
    randomize_each="batch",
    manufactured=False,
    rng=None,
    collect_state=True,
    defer_state=False,
    postproc_keep=None,
    defer_out=False,
):
    """Build instruments + run the simulation (reference simulate.py:121-217)."""
    import jax

    rng = rng or np.random.default_rng()
    k = 1.0 / sr
    total_size = int(length * sr)
    chunk_size = total_size if chunk_length < 0 else int(chunk_length * sr)
    chunk_size = max(chunk_size, 3)

    pluck_batch = (
        True if model_name.endswith("pluck") else None if model_name == "random" else False
    )
    bow_mask, hammer_mask = prm.get_masks(rng, model_name, batch_size)
    pluck_mask = ~(bow_mask | hammer_mask)

    string = prm.sample_string(
        rng,
        k=k,
        theta_t=theta_t,
        lambda_c=lambda_c,
        sr=sr,
        length=length,
        f0_inf=f0_inf,
        alpha_inf=alpha_inf,
        batch_size=batch_size,
        precision=precision,
        pluck_batch=pluck_batch,
        pluck_mask=pluck_mask,
        hammer_mask=hammer_mask,
        randomize_each=randomize_each,
        manufactured=manufactured,
        **(string_kwargs or {}),
    )
    bow = prm.sample_bow(
        rng,
        sr=sr,
        length=length,
        batch_size=batch_size,
        precision=precision,
        randomize_each=randomize_each,
        **(bow_kwargs or {}),
    )
    hammer = prm.sample_hammer(
        rng,
        sr=sr,
        length=length,
        batch_size=batch_size,
        precision=precision,
        k=k,
        randomize_each=randomize_each,
        **(hammer_kwargs or {}),
    )

    if load_config is not None:
        _load_presets(load_config, total_size, string, bow, hammer, k)

    # device placement: TPU by default; CPU for proc.cpu or double precision
    backend = "cpu" if (cpu or precision == "double") else None
    try:
        devices = jax.devices(backend) if backend else jax.devices()
    except RuntimeError:
        devices = jax.devices("cpu")
    device = devices[0]
    # Multi-device dataset generation: shard the simulation batch over a
    # 1-D data mesh (reference: single-device batched sim only; TPU-native
    # scaling is embarrassingly data-parallel over ICI with no collectives)
    mesh = None
    if (len(devices) > 1 and batch_size % len(devices) == 0
            and not os.environ.get("FDTD_NO_MESH")):
        from ..parallel import mesh as pmesh

        mesh = pmesh.make_mesh(devices=devices)

    consts = SimConsts(
        k=k,
        theta_t=float(theta_t),
        lambda_c=float(lambda_c),
        relative_error=float(relative_order),
        M_t=string.Nx_t + 1,
        M_l=string.Nx_l + 1,
        surface_integral=bool(surface_integral),
        manufactured=bool(manufactured),
        collect_state=collect_state,
        has_bow=bool(np.any(bow_mask)),
        has_hammer=bool(np.any(hammer_mask)),
    )
    results = process(
        string,
        bow,
        hammer,
        bow_mask,
        hammer_mask,
        consts,
        total_size,
        chunk_size,
        device=device,
        save_path=save_path,
        sr=sr,
        skip_nan=skip_nan,
        collect_state=collect_state,
        defer_state=defer_state,
        mesh=mesh,
        postproc_keep=postproc_keep,
        defer_out=defer_out,
    )
    return results, (string, bow, hammer, [k, theta_t, lambda_c], consts), (
        bow_mask,
        hammer_mask,
        pluck_mask,
    )


def _load_presets(load_config, total_size, string, bow, hammer, k):
    """Apply ``<model>-<param>.npy`` preset overrides (simulate.py:164-182,
    simulator.py ``dump_parameter``)."""
    for npy_path in glob.glob(f"{load_config}/*.npy"):
        val = np.load(npy_path)
        if val.shape[-1] < total_size:
            val = np.pad(val, (0, total_size - val.shape[-1]), mode="edge")
        else:
            val = val[:total_size]
        target_model, target_param = os.path.basename(npy_path).split(".")[0].split("-")
        tm = target_model.lower()
        if tm == "string":
            if target_param == "f0":
                w0 = np.asarray(
                    fdm.stiff_string_modes(0.0, string.kappa.reshape(-1, 1), 1)[1][0]
                )
                string.f0 = (val[None, :] / w0).astype(string.f0.dtype)
                string.target_f0 = np.broadcast_to(
                    val, string.target_f0.shape
                ).astype(string.f0.dtype)
            else:
                setattr(string, target_param, np.asarray(val, string.f0.dtype))
        elif tm == "bow":
            cur = getattr(bow, target_param)
            setattr(
                bow, target_param, np.broadcast_to(val, cur.shape).astype(cur.dtype)
            )
        elif tm == "hammer":
            if target_param == "v_H":
                profile = val[None, :].astype(hammer.v_H.dtype)
                amp = hammer.v_H.max(axis=-1, keepdims=True)
                hammer.v_H = np.broadcast_to(profile, hammer.v_H.shape).copy()
                u_H = np.zeros_like(hammer.v_H)
                u_H[:, :2] += prm.M_HD_INIT
                hammer.u_H = u_H + k * hammer.v_H
            else:
                cur = getattr(hammer, target_param)
                setattr(hammer, target_param, np.broadcast_to(val, cur.shape).astype(cur.dtype))
        else:
            raise NotImplementedError(target_model)


def run(args, save_dir, model_name, n_samples):
    """Full dataset-generation loop (reference simulate.py:219-456)."""
    task = args.task
    sr = task.sr

    def _cond(cond_list, key):
        vals = [d[key] for d in cond_list if key in d and d[key] is not None]
        return vals[0] if vals else None

    if task.sampling_kappa == "fix":
        kappa_max = _cond(task.string_condition, "kappa_fixed")
    else:
        kappa_max = _cond(task.string_condition, "kappa_max")
        assert kappa_max is not None, "Specify 'kappa_max' in task.string_condition"
    if task.sampling_f0 == "fix":
        f0_min = _cond(task.string_condition, "f0_fixed")
        if np.ndim(f0_min) > 0:
            f0_min = min(f0_min)
    else:
        f0_min = _cond(task.string_condition, "f0_min")
    theta_t = (
        fdm.get_theta(kappa_max, f0_min, sr) if task.theta_t is None else task.theta_t
    )

    string_kwargs = dict(
        sampling_f0=task.sampling_f0 or "random",
        sampling_kappa=task.sampling_kappa or "random",
        sampling_alpha=task.sampling_alpha or "random",
        sampling_pickup=task.sampling_pickup or "random",
        sampling_T60=task.sampling_T60 or "random",
        precorrect=True if task.precorrect is None else task.precorrect,
    )
    for cond, kwargs in (
        (task.string_condition, string_kwargs),
        (task.pluck_condition, string_kwargs),
    ):
        for d in cond:
            ((key, val),) = d.items()
            if val is not None:
                kwargs[key] = val
    hammer_kwargs = {}
    for d in task.hammer_condition:
        ((key, val),) = d.items()
        if val is not None:
            hammer_kwargs[key] = val
    bow_kwargs = {}
    for d in task.bow_condition:
        ((key, val),) = d.items()
        if val is not None:
            bow_kwargs[key] = val

    rng = np.random.default_rng(args.proc.seed)
    time_log = []
    skip_stats = []
    os.makedirs(save_dir, exist_ok=True)
    # Fused simulate->dataset mode (task.fuse_preprocess): write the DMSP
    # training layout (per-x wavs + parameters.npz) directly from the run,
    # pulling each element's state at its NATIVE grid width (f16) instead of
    # the padded batch field, and skipping the multi-GB full-state
    # simulation.npz (a state-free bundle is still written when task.save;
    # set fuse_preprocess=false for the classic archival contract).
    fuse = bool(task.get("fuse_preprocess", False))
    fuse_stride = int(task.get("save_x_stride", 1) or 1)
    fuse_Nx = int(task.get("process_Nx", 256) or 256)
    fuse_dir = task.get("fuse_save_dir") or f"{save_dir}-prep"
    # task.save_modal=false skips the modal target (ua wavs + ua_f0): it is
    # only consumed by the test-time baseline comparison
    # (tasks/synthesize.py test scores), so training-split generation drops
    # it for ~2x fewer bytes per item
    save_modal = bool(task.get("save_modal", True))
    # task.save_output_wav=false: pure training-corpus mode — skip the
    # run-dir output{,-u,-z}.wav triplet AND the readout copies inside the
    # prepared parameters.npz (no training/eval consumer reads either), so
    # the readout waveforms never cross the device->host link
    save_wav = bool(task.get("save_output_wav", True))
    # task.save_compact_params=true (corpus mode): prepared items keep only
    # the keys the training/eval loaders read — ~1.7 MB/item of masked
    # bow/hammer series and grid-width curves stay off the disk
    compact_params = bool(task.get("save_compact_params", False))
    # FDTD_NO_POSTPROC=1 restores per-item native-width pulls + host
    # preprocessing (regression/debug escape hatch)
    fuse_keep = (
        np.arange(0, fuse_Nx, fuse_stride)
        if fuse and os.environ.get("FDTD_NO_POSTPROC") != "1" else None
    )
    # task.save_x_offset_jitter: draw a fresh stride offset per batch so the
    # corpus covers EVERY training-grid column over a run instead of the same
    # K strided positions for every string (round-3 lesson: the mode heads
    # memorize a small discrete x set and interpolate badly between).  A
    # dedicated generator keeps the parameter stream — and therefore the
    # _gen_meta.jsonl provenance contract — untouched.
    fuse_jitter = bool(task.get("save_x_offset_jitter", False))
    x_off_rng = (
        np.random.default_rng([int(args.proc.seed), 0x0FF5E7])
        if (fuse_keep is not None and fuse_jitter and fuse_stride > 1)
        else None
    )
    if fuse:
        from . import process_training_data as ptd
        from ..ops import postproc as pp
        from ..utils import data as udata

        os.makedirs(fuse_dir, exist_ok=True)
        # provenance line per generation job (ADVICE r3: params draw from
        # ONE sequential generator per batch, so the same seed at a
        # different batch size yields different samples — a split built at
        # mixed batch sizes must be detectable)
        with open(os.path.join(fuse_dir, "_gen_meta.jsonl"), "a") as f:
            f.write(json.dumps({
                "seed": int(args.proc.seed), "batch_size": int(task.batch_size),
                "num_samples": int(n_samples * task.batch_size),
                "save_x_stride": fuse_stride, "save_modal": save_modal,
                "save_x_offset_jitter": fuse_jitter,
                "time": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }) + "\n")
    # only state artifacts need the (huge) space-time fields; rainbowgram
    # plots use the readout waveforms alone
    collect_state = bool(task.save or task.plot_state or fuse)

    import concurrent.futures

    import jax

    pool = concurrent.futures.ThreadPoolExecutor(
        max_workers=max(int(args.proc.num_workers), 1)
    )
    pending = []

    for it in _progress(range(n_samples), "Simulating"):
        # bound the in-flight artifact queue to ~one iteration's items
        while len(pending) > task.batch_size:
            pending.pop(0).result()
        dx = str(it) if not task.randomize_name else ms.random_str(rng=rng)
        save_path = f"{save_dir}/{dx}/{sr}" if task.write_during_process else None
        # per-iteration kept-column set (same K for every offset, so the
        # device postproc O_stack keeps one shape and never recompiles)
        keep_it = fuse_keep
        if x_off_rng is not None:
            keep_it = np.arange(
                int(x_off_rng.integers(fuse_stride)), fuse_Nx, fuse_stride
            )

        st = time.time()
        results, params_out, masks = simulate(
            model_name,
            sr,
            theta_t,
            task.length,
            task.batch_size,
            task.f0_inf,
            task.alpha_inf,
            task.lambda_c,
            args.proc.cpu,
            task.load_config,
            task.chunk_length,
            save_path,
            string_kwargs,
            hammer_kwargs,
            bow_kwargs,
            task.skip_nan,
            task.precision,
            task.relative_order,
            task.surface_integral,
            task.randomize_each,
            task.manufactured,
            rng=rng,
            collect_state=collect_state,
            # big state fields are pulled lazily by the writer threads so the
            # device->host link overlaps the next batch's kernel
            defer_state=True,
            postproc_keep=(
                (keep_it, fuse_Nx) if keep_it is not None else None
            ),
            # keep readout waveforms on-device too; writers pull them lazily
            defer_out=True,
        )
        proc_time = time.time() - st
        time_log.append(proc_time)
        log_name = "cpu_time" if args.proc.cpu else "tpu_time"
        with open(f"{save_dir}/{log_name}.txt", "a") as f:
            f.write(f"{dx}\t{proc_time:.2f}\n")

        uout, zout, state_u, state_z, v_r, F_H, u_H, sig0, sig1 = results
        string, bow, hammer, consts_list, sim_consts = params_out
        bow_mask, hammer_mask, pluck_mask = masks

        # uout may be a device array (defer_out); .sum runs on-device then
        # np.isnan pulls only the (B,) reduction
        state_is_nan = np.asarray(np.isnan(np.asarray(uout.sum(-1))))
        # per-batch attrition accounting (VERDICT r3 weak #1): every sample
        # that fails to reach disk must be attributable to a named cause in
        # skip_stats.json — never silently dropped
        batch_stat = {
            "it": it, "n": int(task.batch_size),
            "nan_first_pass": int(state_is_nan.sum()),
            "rescued_kernel_gmres": 0, "rescued_f64": 0,
        }
        # Rescue ladder step 1 (f32, on-TPU): the fast kernel poisons every
        # untrustworthy coupling exit to NaN (ops/pallas_step.py poison-only
        # mode); re-run the batch through the GMRES-enabled kernel variant,
        # which solves the coupled system exactly (reference string.cpp:
        # 173-175 joint-solve parity) for the poisoned elements and
        # reproduces the healthy elements bit-identically.  Only genuinely
        # unstable discretizations stay NaN and fall through to the f64
        # host rescue / NaN-skip below.
        if state_is_nan.any() and kernel_gmres_rerun_enabled(task, args):
            import jax as _jax

            accel = [d for d in _jax.devices() if d.platform != "cpu"]
            if accel and _pallas_eligible(sim_consts, accel[0], np.float32):
                idx0 = np.nonzero(state_is_nan)[0]
                print(
                    f"[simulate] kernel-GMRES re-run for diverged "
                    f"element(s) {idx0.tolist()}", flush=True,
                )
                Nt_r = int(task.length * sr)
                ch_r = Nt_r if task.chunk_length < 0 else int(
                    task.chunk_length * sr)
                # The re-run reproduces healthy elements bit-identically, so
                # the first pass's deferred device state is dead weight; drop
                # every reference BEFORE dispatching or both generations of
                # (Nt, B, MP) fields coexist in HBM (~2x peak -> OOM at the
                # fused-prep corpus batch size)
                del results
                uout = zout = state_u = state_z = None
                v_r = F_H = u_H = sig0 = sig1 = None
                results = process(
                    string, bow, hammer, bow_mask, hammer_mask, sim_consts,
                    Nt_r, max(ch_r, 3), device=accel[0], save_path=None,
                    sr=sr, skip_nan=task.skip_nan,
                    collect_state=collect_state, defer_state=True,
                    postproc_keep=(
                        (keep_it, fuse_Nx) if keep_it is not None
                        else None
                    ),
                    defer_out=True, kernel_gmres=True,
                )
                (uout, zout, state_u, state_z, v_r, F_H, u_H, sig0,
                 sig1) = results
                prev_nan = state_is_nan
                state_is_nan = np.asarray(
                    np.isnan(np.asarray(uout.sum(-1))))
                batch_stat["rescued_kernel_gmres"] = int(
                    (prev_nan & ~state_is_nan).sum())
        rescued_set = set()  # spliced elements bypass the device postproc
        if (
            state_is_nan.any()
            and task.get("rescue_nan", True)
            and task.precision != "double"
        ):
            idx = np.nonzero(state_is_nan)[0]
            print(f"[simulate] f64-rescuing diverged element(s) {idx.tolist()}",
                  flush=True)
            rconsts = sim_consts  # authoritative run constants; the rescue
            # overrides only solver/excitation fields itself
            Nt_r = int(task.length * sr)
            ch_r = Nt_r if task.chunk_length < 0 else int(task.chunk_length * sr)
            r = rescue_nan_elements(
                string, bow, hammer, bow_mask, hammer_mask, idx, rconsts,
                Nt_r, max(ch_r, 3), sr,
            )
            r_uout, r_zout, r_su, r_sz, r_vr, r_FH, r_uH, r_s0, r_s1 = r
            ok = ~np.isnan(r_uout.sum(-1))
            oki = idx[ok]
            if len(oki):
                # np.asarray() on jax outputs yields read-only views; copy
                # before splicing the rescued rows in
                uout, zout, v_r, F_H, u_H = (
                    np.array(a) for a in (uout, zout, v_r, F_H, u_H)
                )
                uout[oki] = r_uout[ok].astype(uout.dtype)
                zout[oki] = r_zout[ok].astype(zout.dtype)
                v_r[oki] = r_vr[ok].astype(v_r.dtype)
                F_H[oki] = r_FH[ok].astype(F_H.dtype)
                u_H[oki] = r_uH[ok].astype(u_H.dtype)
                sig0 = np.asarray(sig0).copy()
                sig1 = np.asarray(sig1).copy()
                sig0[oki] = np.asarray(r_s0)[ok]
                sig1[oki] = np.asarray(r_s1)[ok]
                if collect_state and r_su is not None:
                    if isinstance(state_u, _DeferredState):
                        orig_h = state_u

                        def _patched(orig_h=orig_h, r_su=r_su, r_sz=r_sz,
                                     ok=ok, oki=oki):
                            su, sz = orig_h.get()
                            su[oki] = r_su[ok].astype(su.dtype)
                            sz[oki] = r_sz[ok].astype(sz.dtype)
                            return su, sz

                        # per-element pulls stay cheap for non-rescued rows
                        # (rescued rows are already on the host)
                        r_rows = {int(bi): r_su[ok][j]
                                  for j, bi in enumerate(oki)}

                        def _patched_elem(b, w, orig_h=orig_h, rows=r_rows):
                            if b in rows:
                                return np.asarray(rows[b][:, :w], np.float32)
                            return orig_h.fetch_element(b, w)

                        state_u = _DeferredState(_patched,
                                                 elem_fn=_patched_elem)
                        # keep the device-postproc handle: its consumer
                        # skips rescued elements, and dropping it would
                        # reroute the WHOLE batch through the host
                        # fallback (sliced-u0 items + full-state pull)
                        state_u.post = getattr(orig_h, "post", None)
                    else:
                        state_u[oki] = r_su[ok].astype(state_u.dtype)
                        state_z[oki] = r_sz[ok].astype(state_z.dtype)
                state_is_nan[oki] = False
                rescued_set.update(int(i) for i in oki)
                batch_stat["rescued_f64"] = len(oki)
        uout = uout * ~state_is_nan[:, None]
        if isinstance(uout, np.ndarray):
            is_silent = audio.dB_RMS(uout) <= task.silence_threshold
        else:
            # device twin of audio.dB_RMS (f32; threshold checks are far
            # from the -23 dB cut for real draws) -> (B,) pull only
            import jax.numpy as _jnp

            _rms_db = 20.0 * _jnp.log10(
                _jnp.sqrt(_jnp.mean(_jnp.square(uout), axis=-1)) + 1e-12
            )
            is_silent = np.asarray(_rms_db <= task.silence_threshold)

        # host twin (NOT the jnp variant: eager per-op dispatch through the
        # relay costs minutes cold; same eps-guarded floor => same integers)
        _, _, Nx_t, _, Nx_l, _ = [
            np.asarray(v)
            for v in fdm.get_derived_vars_host(
                string.f0,
                string.kappa[:, None],
                1.0 / sr,
                theta_t,
                task.lambda_c,
                string.alpha[:, None],
                # f32 regardless of run precision: the jnp call this
                # replaces ran under default-x64-off and computed f32
                dtype=np.float32,
            )
        ]

        # writer threads resolve the readout pulls off the critical path;
        # corpus runs with wav/bundle/plot all disabled never pull them
        uout = _LazyArray(uout)
        zout = _LazyArray(zout)

        # default-arg binding snapshots this iteration's arrays by value so
        # the writes can overlap the next iteration's simulation
        def _save_item(b, d, excitation, uout=uout, zout=zout, state_u=state_u,
                       state_z=state_z, v_r=v_r, F_H=F_H, u_H=u_H,
                       string=string, bow=bow, hammer=hammer, Nx_t=Nx_t,
                       Nx_l=Nx_l, sig0=sig0, sig1=sig1,
                       bow_mask=bow_mask, hammer_mask=hammer_mask,
                       pluck_mask=pluck_mask, fuse_keep=keep_it):
            bitrate = "PCM_24" if task.precision == "double" else "PCM_16"
            state_h = state_u
            # fused mode pulls per-element native-width slices instead of
            # resolving the full padded field
            need_full = bool(task.plot_state) or (task.save and not fuse)
            if isinstance(state_h, _DeferredState):
                if need_full:
                    state_u, state_z = state_h.get()
                else:
                    state_u = state_z = None
            # task.save_output_wav=false (training-corpus runs): the item
            # IS the fused prepared sample; skip the run-dir wav triplet so
            # the readout waveforms never cross the link
            if save_wav or task.save or task.plot or task.plot_state:
                os.makedirs(d, exist_ok=True)
            if save_wav:
                if task.normalize_output:
                    u_n, gain = audio.ell_infty_normalize(uout[b])
                    z_n = gain * zout[b]
                else:
                    u_n, z_n = uout[b], zout[b]
                wavio.write(f"{d}/output-u.wav", u_n, sr, bitrate)
                wavio.write(f"{d}/output-z.wav", z_n, sr, bitrate)
                wavio.write(f"{d}/output.wav", u_n + z_n, sr, bitrate)

            if task.save:
                overall = dict(
                    uout=uout[b],
                    zout=zout[b],
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
                        string.kappa[b],
                        string.alpha[b],
                        string.u0[b][None, :],
                        string.v0[b][None, :],
                        string.p_a[b],
                        string.f0[b],
                        string.pos[b],
                        string.T60[b],
                        string.target_f0[b],
                    ],
                    hammer_params=[
                        hammer.x_H[b],
                        hammer.v_H[b],
                        hammer.u_H[b],
                        hammer.w_H[b],
                        hammer.M_r[b],
                        hammer.alpha[b],
                    ],
                    bow_params=[
                        bow.x_b[b],
                        bow.v_b[b],
                        bow.F_b[b],
                        bow.phi_0[b],
                        bow.phi_1[b],
                        bow.wid[b],
                    ],
                )
                if not fuse:
                    # the multi-GB space-time fields go into the archival
                    # bundle only on the classic path; fused runs write the
                    # processed training layout instead (state-free bundle
                    # keeps the remaining simulation.npz contract)
                    overall["state_u"] = state_u[b, :, : int(Nx_t[b].max()) + 1]
                    overall["state_z"] = state_z[b, :, : int(Nx_l[b].max()) + 1]
                ms.save_simulation_data(d, excitation, overall, consts_list)

            if fuse:
                _sim = dict(
                    bow_mask=bow_mask[b], hammer_mask=hammer_mask[b],
                    pluck_mask=pluck_mask[b],
                    Nx_t=Nx_t[b], Nx_l=Nx_l[b], sig0=sig0[b], sig1=sig1[b],
                )
                if save_wav:
                    # readout copies in the prepared npz mirror the
                    # reference bundle; no training/eval consumer reads
                    # them, so corpus runs (save_output_wav=false) omit
                    # them and never pull the readouts off the device
                    _sim.update(
                        uout=uout[b], zout=zout[b], v_r_out=v_r[b],
                        F_H_out=F_H[b], u_H_out=u_H[b],
                    )
                _str = dict(
                    kappa=string.kappa[b], alpha=string.alpha[b],
                    u0=string.u0[b][None, :], v0=string.v0[b][None, :],
                    p_a=string.p_a[b], f0=string.f0[b], pos=string.pos[b],
                    T60=string.T60[b], target_f0=string.target_f0[b],
                )
                _bow = dict(
                    x_B=bow.x_b[b], v_B=bow.v_b[b], F_B=bow.F_b[b],
                    phi_0=bow.phi_0[b], phi_1=bow.phi_1[b], wid_B=bow.wid[b],
                )
                _ham = dict(
                    x_H=hammer.x_H[b], v_H=hammer.v_H[b], u_H=hammer.u_H[b],
                    w_H=hammer.w_H[b], M_r=hammer.M_r[b],
                    alpha=hammer.alpha[b],
                )
                post_h = getattr(state_h, "post", None)
                if post_h is not None and b not in rescued_set:
                    # device-postprocessed fast path: the state never
                    # crosses the link; assemble the item from the pulled
                    # kept-column arrays + host-side modal/mode data
                    t0 = time.perf_counter()
                    pz = post_h.get()
                    _acc_save_t("pull", time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    overall_p = _assemble_post_item(
                        pz, b, _sim, _str, _bow, _ham, string, Nx_t,
                        fuse_keep, fuse_Nx, task, sr, save_modal,
                    )
                    _acc_save_t("assemble", time.perf_counter() - t0)
                else:
                    w_b = int(Nx_t[b].max()) + 1
                    if isinstance(state_h, _DeferredState):
                        ut_nat = state_h.fetch_element(b, w_b)
                    else:
                        ut_nat = np.asarray(state_h[b, :, :w_b], np.float32)
                    _sim["state_u"] = ut_nat
                    x_keep = fuse_keep if fuse_stride > 1 else None
                    overall_p = ptd.build_processed(
                        _sim, _str, _bow, _ham, theta_t, task.lambda_c, sr,
                        fuse_Nx, strict=False, device_synth=False,
                        x_keep=x_keep,
                    )
                    if not save_modal:
                        for key in ("ua", "ua_f0"):
                            overall_p.pop(key, None)
                if compact_params:
                    # training-corpus mode: drop the (Nt,) series no loader
                    # reads (data/dataset.py KEYS) — masked bow/hammer
                    # tracks, grid-width curves, the f0 target twin.  The
                    # classic bundle contract keeps them (default false).
                    for key in ("Nx_t", "Nx_l", "target_f0", "x_B", "v_B",
                                "F_B", "wid_B", "v_H", "u_H"):
                        overall_p.pop(key, None)
                t0 = time.perf_counter()
                udata.save(
                    os.path.join(fuse_dir, os.path.basename(d)), overall_p,
                    sr=sr,
                )
                _acc_save_t("write", time.perf_counter() - t0)

            if task.plot:
                from ..utils import plot as uplot

                uplot.simulation_plots(d, uout[b], zout[b], string.target_f0[b], sr)
                su_b = (state_u[b, :, : int(Nx_t[b].max()) + 1]
                        if state_u is not None else None)
                sz_b = (state_z[b, :, : int(Nx_l[b].max()) + 1]
                        if state_z is not None else None)
                uplot.simulation_data(
                    d, uout[b], zout[b], v_r[b], F_H[b], u_H[b], su_b, sz_b,
                    string_params=[
                        string.kappa[b], string.alpha[b], string.u0[b][None, :],
                        string.v0[b][None, :], string.p_a[b], string.f0[b],
                        string.pos[b], string.T60[b], string.target_f0[b],
                    ],
                    bow_params=[
                        bow.x_b[b], bow.v_b[b], bow.F_b[b],
                        bow.phi_0[b], bow.phi_1[b], bow.wid[b],
                    ],
                    hammer_params=[
                        hammer.x_H[b], hammer.v_H[b], hammer.u_H[b],
                        hammer.w_H[b], hammer.M_r[b], hammer.alpha[b],
                    ],
                    sr=sr,
                )
            if task.plot_state:
                from ..utils import plot as uplot

                uplot.state_video(d, state_u[b, :, : int(Nx_t[b].max()) + 1], sr)

        batch_stat["nan_final"] = int(state_is_nan.sum())
        batch_stat["silent"] = int(
            (np.asarray(is_silent) & ~state_is_nan).sum()
        )
        batch_stat["written"] = 0
        def _dump_draw(b, why):
            # full parameter bundle so tools/attrition_study.py can re-run
            # the exact draw through the reference f64 engine (skip-rate
            # parity vs ref NaN-skip semantics, ref simulate.py:91-93)
            np.savez(
                f"{save_dir}/draw-{dx}-{b}.npz",
                why=why,
                kappa=np.asarray(string.kappa)[b],
                alpha=np.asarray(string.alpha)[b],
                u0=np.asarray(string.u0)[b],
                v0=np.asarray(string.v0)[b],
                p_a=np.asarray(string.p_a)[b],
                f0=np.asarray(string.f0)[b],
                pos=np.asarray(string.pos)[b],
                T60=np.asarray(string.T60)[b],
                x_b=np.asarray(bow.x_b)[b],
                v_b=np.asarray(bow.v_b)[b],
                F_b=np.asarray(bow.F_b)[b],
                phi_0=np.asarray(bow.phi_0)[b],
                phi_1=np.asarray(bow.phi_1)[b],
                wid=np.asarray(bow.wid)[b],
                x_H=np.asarray(hammer.x_H)[b],
                v_H=np.asarray(hammer.v_H)[b],
                u_H=np.asarray(hammer.u_H)[b],
                w_H=np.asarray(hammer.w_H)[b],
                M_r=np.asarray(hammer.M_r)[b],
                alpha_H=np.asarray(hammer.alpha)[b],
                bow_mask=np.asarray(bow_mask)[b],
                hammer_mask=np.asarray(hammer_mask)[b],
                k=sim_consts.k, theta_t=sim_consts.theta_t,
                lambda_c=sim_consts.lambda_c,
                relative_error=sim_consts.relative_error,
                M_t=sim_consts.M_t, M_l=sim_consts.M_l,
                surface_integral=sim_consts.surface_integral,
            )

        skipped_detail = []
        for b in range(task.batch_size):
            skipped_here = state_is_nan[b] or (
                task.skip_silence and is_silent[b]
            )
            if skipped_here:
                skipped_detail.append({
                    "b": int(b),
                    "why": "nan" if state_is_nan[b] else "silent",
                    "f0": round(float(np.asarray(string.f0)[b, 2]), 2),
                    "alpha": round(float(np.asarray(string.alpha)[b]), 3),
                    "p_a": round(float(np.asarray(string.p_a)[b]), 4),
                })
            if task.get("dump_draws") or (
                skipped_here and task.get("dump_skipped")
            ):
                _dump_draw(
                    b, skipped_detail[-1]["why"] if skipped_here else "kept"
                )
            if state_is_nan[b]:
                continue
            if task.skip_silence and is_silent[b]:
                continue
            batch_stat["written"] += 1
            excitation = ",".join(
                t
                for t, m in (
                    ("bow", bow_mask[b]),
                    ("hammer", hammer_mask[b]),
                    ("pluck", pluck_mask[b]),
                )
                if m
            )
            d = f"{save_dir}/{dx}-{b}"
            pending.append(pool.submit(_save_item, b, d, excitation))
        if skipped_detail:
            batch_stat["skipped"] = skipped_detail
            print(
                f"[simulate] batch {it}: wrote {batch_stat['written']}"
                f"/{task.batch_size} (nan={batch_stat['nan_final']}, "
                f"silent={batch_stat['silent']})", flush=True,
            )
        skip_stats.append(batch_stat)
        with open(f"{save_dir}/skip_stats.json", "w") as f:
            json.dump(skip_stats, f, indent=1)
    for f in pending:
        f.result()
    pool.shutdown(wait=True)
    timing = save_timing()
    if timing:
        with open(f"{save_dir}/skip_stats.json", "w") as f:
            json.dump({"batches": skip_stats, "save_timing": timing}, f,
                      indent=1)
    return time_log
