"""Device-side dataset postprocessing for the fused simulate->dataset path.

Round-2 measured the fused pipeline end-to-end and found two host-side walls
on this 1-core host (BENCH_r02 ``nsynth100_e2e`` = 0.19 audio_s/s):

  * the per-item native-width state pull moves ``Nt * w * 2`` bytes over a
    ~6-25 MB/s tunnel (tens of MB per item), and
  * the per-item YIN pitch track costs ~2.6 s in the frame-loop
    implementation (two tracks per item in the reference contract,
    ``/root/reference/src/task/process_training_data.py:151-166``).

This module moves the whole state-consuming part of preprocessing onto the
accelerator (the design VERDICT round-2 asked for): the padded space-time
state is spline-upsampled to the *kept* training-grid columns, reduced to
the summed-velocity track, max-normalised and pitch-tracked **on device**,
so only ``(Nt, K)`` float16 plus a few KB of tracks ever cross the link.

Reference parity targets:
  * spline upsample — ``process_training_data.py:136-149`` (RectBivariate-
    Spline evaluated at its own time knots == per-width 1-D x-spline; the
    same cached operators as :func:`..utils.data.upsample_columns`).
  * summed-velocity wav ``vt`` — reference ``audio.py:108-113``.
  * YIN track — CREPE substitute (see ``utils/frequency.py``); identical
    algorithm, vectorised over frames and batch.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import fdm


# ---------------------------------------------------------------------------
# batched YIN (difference function + CMNDF + parabolic interp + median-3)
# ---------------------------------------------------------------------------

def yin_track(wav, sr, hop_s=0.01, frame_s=0.064, fmin=32.0, fmax=2000.0,
              threshold=0.1, smooth=3):
    """Frame-wise YIN pitch track, batched: ``wav (B, Nt) -> (B, n_frames)``.

    Same algorithm and constants as the scalar loop in
    ``utils/frequency.py`` (difference function via Wiener-Khinchin,
    cumulative-mean normalisation, first-below-threshold walk to the local
    minimum, parabolic refinement, median-3 smoothing), restructured as
    fixed-shape array ops so it runs inside a jit on TPU/CPU.  f32 on
    device vs the host's f64 shifts near-tie frames by <1 frame-hop; the
    median filter absorbs isolated flips.
    """
    wav = jnp.asarray(wav)
    B, Nt = wav.shape
    hop = int(sr * hop_s)
    frame = int(sr * frame_s)
    n_frames = max(1, Nt // hop + 1)
    pad = frame // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad + frame)))

    idx = (jnp.arange(n_frames) * hop)[:, None] + jnp.arange(frame)[None, :]
    fr = x[:, idx]  # (B, F, n)
    silent = jnp.max(jnp.abs(fr), axis=-1) < 1e-8

    tau_max = min(int(sr / fmin), frame - 1)
    tau_min = max(int(sr / fmax), 1)

    w = fr - fr.mean(-1, keepdims=True)
    f = jnp.fft.rfft(w, 2 * frame)
    acf = jnp.fft.irfft(f * jnp.conj(f))[..., : tau_max + 1]
    ar = jnp.arange(tau_max + 1)
    # exact truncated-window difference function (utils/frequency.py twin):
    # d(tau) = E[0..n-tau-1] + E[tau..n-1] - 2 acf(tau)
    E = jnp.cumsum(w**2, axis=-1)
    Etot = E[..., -1:]
    term1 = E[..., frame - 1 - ar]
    term2 = Etot - jnp.concatenate(
        [jnp.zeros_like(Etot), E[..., :tau_max]], axis=-1
    )
    d = (term1 + term2 - 2.0 * acf) * (frame / (frame - ar))
    d = d.at[..., 0].set(0.0)
    e0 = Etot  # shape (..., 1) broadcast helper for the ones-column below
    cum = jnp.cumsum(d[..., 1:], axis=-1)
    cmndf = jnp.concatenate(
        [
            jnp.ones_like(e0),
            d[..., 1:] * ar[1:] / jnp.where(cum == 0, 1.0, cum),
        ],
        axis=-1,
    )

    valid = (ar >= tau_min) & (ar < tau_max)
    below = (cmndf < threshold) & valid
    any_below = below.any(-1)
    first_t = jnp.argmax(below, axis=-1)
    # walk forward while strictly decreasing: stop at the first tau >=
    # first_t whose successor does not decrease (the loop's inner while)
    cm_next = jnp.concatenate(
        [cmndf[..., 1:], jnp.full_like(e0, jnp.inf)], axis=-1
    )
    dec = (cm_next < cmndf) & ((ar + 1) < tau_max)
    stop = (~dec) & (ar >= first_t[..., None])
    walk_t = jnp.argmax(stop, axis=-1)
    fallback = jnp.argmin(jnp.where(valid, cmndf, jnp.inf), axis=-1)
    tau_i = jnp.where(any_below, walk_t, fallback)

    # subharmonic guard (utils/frequency.py twin): prefer an equally deep
    # dip at ~tau/2 — noise can push the true dip just over threshold while
    # the 2-period dip stays under
    t2 = jnp.clip(tau_i // 2, 1, tau_max - 1)
    t2n = jnp.stack([t2 - 1, t2, t2 + 1], axis=-1)
    sub3 = jnp.take_along_axis(cmndf, t2n, axis=-1)
    t2 = t2 + jnp.argmin(sub3, axis=-1) - 1
    cm_t2 = jnp.take_along_axis(cmndf, t2[..., None], axis=-1)[..., 0]
    cm_ti = jnp.take_along_axis(cmndf, tau_i[..., None], axis=-1)[..., 0]
    take = (t2 >= tau_min) & (cm_t2 < jnp.maximum(threshold, 1.15 * cm_ti))
    tau_i = jnp.where(take, t2, tau_i)

    # parabolic interpolation of the RAW difference function around the dip
    # (de Cheveigné step 5; utils/frequency.py twin)
    def _at(off):
        return jnp.take_along_axis(
            d, jnp.clip(tau_i + off, 0, tau_max)[..., None], axis=-1
        )[..., 0]

    a, b, c = _at(-1), _at(0), _at(1)
    denom = a - 2.0 * b + c
    inner = (tau_i >= 1) & (tau_i < tau_max) & (denom != 0)
    tau = tau_i + jnp.where(inner, 0.5 * (a - c) / jnp.where(denom == 0, 1.0, denom), 0.0)
    f0 = jnp.where(tau > 0, sr / jnp.where(tau > 0, tau, 1.0), 0.0)
    f0 = jnp.where(silent, 0.0, f0)

    if smooth > 1 and n_frames >= smooth:
        # median-3 with zero edge padding (scipy.signal.medfilt semantics)
        fp = jnp.pad(f0, ((0, 0), (1, 1)))
        f0 = jnp.median(
            jnp.stack([fp[:, :-2], fp[:, 1:-1], fp[:, 2:]], axis=-1), axis=-1
        )

    # spectral refinement (utils/frequency._refine_spectral twin): parabolic
    # log-magnitude interpolation of the Hann-spectrum peak nearest the YIN
    # estimate; gated to ±3% so octave decisions stay with YIN
    pad_mult = 4
    win = jnp.asarray(np.hanning(frame), fr.dtype)
    nfft = pad_mult * frame
    mag = jnp.abs(jnp.fft.rfft(fr * win, nfft))
    n_bins = nfft // 2 + 1
    k0 = jnp.round(jnp.clip(f0, 0.0, sr / 2.0) * nfft / sr).astype(jnp.int32)
    k0 = jnp.clip(k0, 2, n_bins - 3)
    span = jnp.arange(-pad_mult, pad_mult + 1)
    cand = jnp.clip(k0[..., None] + span, 1, n_bins - 2)  # (B, F, 2p+1)
    sub = jnp.take_along_axis(mag, cand, axis=-1)
    kpk = jnp.take_along_axis(
        cand, jnp.argmax(sub, axis=-1)[..., None], axis=-1
    )[..., 0]

    def _lm(off):
        return jnp.log(jnp.take_along_axis(
            mag, (kpk + off)[..., None], axis=-1
        )[..., 0] + 1e-30)

    la, lb, lc = _lm(-1), _lm(0), _lm(1)
    den = la - 2.0 * lb + lc
    delta = jnp.where(
        den != 0, 0.5 * (la - lc) / jnp.where(den == 0, 1.0, den), 0.0
    )
    delta = jnp.clip(delta, -0.5, 0.5)
    f_ref = (kpk + delta) * (sr / nfft)
    ok = (f0 > 0) & (jnp.abs(f_ref - f0) < 0.03 * jnp.maximum(f0, 1e-9))
    return jnp.where(ok, f_ref, f0)


# ---------------------------------------------------------------------------
# spline operator stack (host build, device apply)
# ---------------------------------------------------------------------------

_OSTACK_CACHE = {}


def spline_operator_stack(M, x_keep, n_grid=256, k=5):
    """(M+1, M, K+1) stack of per-width spline operators.

    Row ``w`` resamples a live slice of ``w`` points (uniform on [0, 1]) to
    (a) the ``K = len(x_keep)`` kept columns of the ``n_grid`` training grid
    and (b) its last column holds the ``n_grid``-column row-sum vector, so
    ``state @ O[w]`` yields the kept columns *and* the full-grid spatial sum
    in one GEMM.  Zero-padded beyond ``w`` — stale lanes in the padded state
    cannot leak through.  Built once per (M, keep, grid) on the host from
    the same cached operators as :func:`..utils.data.upsample_columns`.
    """
    from ..utils import data as udata

    key = (int(M), tuple(int(i) for i in x_keep), int(n_grid), int(k))
    st = _OSTACK_CACHE.get(key)
    if st is None:
        K = len(x_keep)
        st = np.zeros((M + 1, M, K + 1), np.float32)
        for w in range(2, M + 1):
            S = udata.spline_matrix(w, n_grid, k)  # (n_grid, w)
            st[w, :w, :K] = S[np.asarray(x_keep)].T
            st[w, :w, K] = S.sum(axis=0)
        _OSTACK_CACHE[key] = st
    return st


# ---------------------------------------------------------------------------
# fused device postprocess
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("G", "sr", "theta_t", "lambda_c", "k"),
)
def postprocess_batch(su, u1_init, u2_init, f0_head, f0_t, kappa, O_stack,
                      *, k, theta_t, lambda_c, sr, G=32):
    """Consume the on-device state field into training-grid arrays.

    Args:
      su: (T, B, M) f32 — kernel-collected state rows for t = 2..Nt-1.
      u1_init/u2_init: (B, M) f32 — the two initial rows (t=1, t=0).
      f0_head: (B, 2) f32 — f0 at t=0,1 (the kernel's ``tpad`` drops them).
      f0_t: (B, T_pad) f32 — the kernel's padded f0 track (first T used).
      kappa: (B,) f32;  O_stack: (M+1, M, K+1) from
      :func:`spline_operator_stack`.

    Returns dict of device arrays:
      ``ut_keep`` (B, Nt, K) f16 — kept training-grid columns,
      ``vt`` (B, Nt-1) f16 — summed-velocity wav (diff of the full-grid
      spatial sum, computed in f32 on device),
      ``ut_f0`` (B, n_frames) f32 — YIN track of the normalised sum,
      ``umax`` (B,) f32 — live-domain max-abs (the ell_infty gain source).

    Width handling matches the engine exactly: per-step ``N_t`` from
    :func:`..ops.fdm.get_derived_vars` (the same epsilon-guarded floor the
    kernel used to evolve the state), grouped as ``w = wmin_b + g`` for
    ``g < G``; the f0 sampler bounds drift to ~8% so G=32 covers the spread
    (the caller asserts this on the host before dispatch).
    """
    T, B, M = su.shape
    f0_full = jnp.concatenate([f0_head, f0_t[:, :T]], axis=1)  # (B, Nt)
    Nt = T + 2

    dv = fdm.get_derived_vars(
        f0_full, kappa[:, None], k, theta_t, lambda_c, 1.0
    )
    widths = jnp.clip(dv.N_t.astype(jnp.int32) + 1, 0, M)  # (B, Nt)

    sb = jnp.concatenate(
        [u2_init[:, None], u1_init[:, None], su.transpose(1, 0, 2)], axis=1
    )  # (B, Nt, M)

    wmin = widths.min(axis=1)  # (B,)
    Kp1 = O_stack.shape[-1]

    def group_step(acc, g):
        w = wmin + g  # (B,)
        Og = O_stack[jnp.clip(w, 0, M)]  # (B, M, K+1)
        y = jnp.einsum(
            "btm,bmk->btk", sb, Og, preferred_element_type=jnp.float32
        )
        mask = widths == w[:, None]
        return acc + jnp.where(mask[..., None], y, 0.0), None

    acc, _ = jax.lax.scan(
        group_step, jnp.zeros((B, Nt, Kp1), jnp.float32), jnp.arange(G)
    )
    ut_keep = acc[..., : Kp1 - 1]
    uts = acc[..., Kp1 - 1]

    live = jnp.arange(M)[None, None, :] < widths[..., None]
    umax = jnp.max(jnp.where(live, jnp.abs(sb), 0.0), axis=(1, 2))

    rms = jnp.sqrt(jnp.mean(uts**2, axis=1, keepdims=True))
    un = uts / jnp.where(rms == 0, 1.0, rms)
    ut_f0 = yin_track(un, sr)

    return {
        "ut_keep": ut_keep.astype(jnp.float16),
        # first difference of the full-grid spatial sum — the summed-velocity
        # wav (state_to_wav, k=1).  Shipped f16 instead of the f32 sum: the
        # diff is computed in f32 on device (identical math to the host
        # twin), f16 only rounds the result, and the <6 MB/s relay link is
        # the e2e dataset-generation bottleneck (halves this pull's bytes)
        "vt": (uts[:, 1:] - uts[:, :-1]).astype(jnp.float16),
        "ut_f0": ut_f0,
        "umax": umax,
    }


def host_widths_spread(f0, kappa, k, theta_t, lambda_c, dtype=np.float32):
    """Max per-element width spread (host pre-check for the G group cap).

    Uses the dtype-faithful host twin (``fdm.grid_widths_np``) of the
    device width formula; both land on the same integers, so ``spread <
    G`` here guarantees the device group sweep covers every width.
    """
    nx = np.stack(
        [
            fdm.grid_widths_np(f0[b], float(kappa[b]), k, theta_t, lambda_c,
                               dtype=dtype)
            for b in range(f0.shape[0])
        ]
    )
    w = nx.astype(np.int64) + 1
    return int((w.max(axis=1) - w.min(axis=1)).max())


# ---------------------------------------------------------------------------
# host-side modal target (exact f64 phase; tiny inputs, GEMM-contracted)
# ---------------------------------------------------------------------------

def modal_target_host(u0_256, f0, kappa, T60, Nt, sr, x_keep, strict=False,
                      synth=True):
    """Modal solution ``ua`` on the kept columns, plus mode data.

    The mode problem is solved from the pre-sim initial condition (host,
    ~0.1 s/item) and synthesised with f64 phase accumulation — the phase
    exactness of the stored baseline matters for the test-time si-sdr
    comparison (``tasks/synthesize.py`` scores the model *against* this
    baseline), so this stays off-device (f32 cumsum drifts ~5e-3 rad/s).

    u0_256: (n_grid,) initial profile on the full training grid.
    Returns (ua_keep (Nt, K) f32, uas (Nt,) f32, mode_freq (n,),
    mode_amps_keep (n, K), ua_f0 (n_frames,)).  ``synth=False`` computes
    only the mode data (training inputs) and returns None for the
    synthesised fields — the training-split recipe (``task.save_modal=
    false``) skips the baseline wavs entirely.
    """
    from ..core import analytic
    from ..utils import data as udata
    from ..utils import frequency as ufreq

    Na = 1024
    n_grid = u0_256.shape[0]
    u0_a = u0_256 @ udata.spline_matrix(n_grid, Na, k=5).T
    _, mode_freq, mode_amps = analytic.lossy_stiff_string(
        u0_a, f0, float(kappa), T60, Nt, Na, sr, strict=strict,
        return_field=False
    )
    mode_amps = mode_amps @ udata.spline_matrix(Na, n_grid, k=5).T  # (n, 256)
    if not synth:
        return (None, None, mode_freq,
                mode_amps[:, np.asarray(x_keep)], None)

    omega = np.asarray(f0, np.float64) / sr * (2 * math.pi)
    romg = omega - omega[0]
    freq_tv = mode_freq[None, :] + romg[:, None]  # (Nt, n)

    from ..tasks.process_training_data import t60_to_sigma_tv

    sig0_tv, _ = t60_to_sigma_tv(
        np.asarray(T60, np.float64), np.asarray(f0, np.float64),
        2.0 * np.asarray(f0, np.float64) * float(kappa)
    )
    ti = np.arange(Nt, dtype=np.float64) / sr
    damping = np.exp(-ti * sig0_tv)

    hz = freq_tv / (2 * np.pi) * sr
    aa = (hz < sr / 2).astype(np.float32) + 1e-4
    # f64 phase accumulation via add.accumulate: same math as np.cumsum but
    # ~30x faster on this host's numpy (cumsum hits an unvectorized path;
    # measured 1.0 s vs 0.06 s on the (Nt, n) bank)
    phase = np.add.accumulate(freq_tv, axis=0)
    tbank = np.cos(phase).astype(np.float32) * aa
    tbank *= damping.astype(np.float32)[:, None]

    sel = np.concatenate([np.asarray(x_keep, np.int64), [n_grid]])
    amps_ext = np.concatenate(
        [mode_amps, mode_amps.sum(axis=1, keepdims=True)], axis=1
    )  # (n, 257): kept columns + full-grid sum
    out = tbank @ np.ascontiguousarray(amps_ext[:, sel].astype(np.float32))
    ua_keep, uas = out[:, :-1], out[:, -1]

    rms = float(np.sqrt(np.mean(uas**2))) or 1.0
    ua_f0, _ = ufreq.track_f0(uas / rms, sr)
    return ua_keep, uas, mode_freq, mode_amps[:, np.asarray(x_keep)], ua_f0
