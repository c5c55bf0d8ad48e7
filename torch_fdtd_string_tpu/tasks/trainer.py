"""Training/eval harness (Lightning replacement).

Counterpart of reference ``src/trainer.py`` + ``src/callbacks.py``: epoch
loop with threaded data loading, data-parallel jitted train steps over the
device mesh, orbax checkpoints, JSONL metric logging (wandb-free), score
TSVs and plot artifacts, and snapshot-code execution for inference
(the reference imports ``codes.src...`` from the run dir, trainer.py:85-88).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np

from ..data.dataset import DataLoader, Testset, Trainset
from ..models.losses import build_loss_registry
from ..models import optim as optlib
from ..utils import plot as uplot
from . import synthesize as S


def _ckpt_dir(save_dir):
    return os.path.join(save_dir, "string", "ckpt", "checkpoints")


def _log(save_dir, record):
    with open(os.path.join(save_dir, "metrics.jsonl"), "a") as f:
        f.write(json.dumps({k: float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v for k, v in record.items()}) + "\n")


def _init_state(args, model, tx, sample_prep, seed):
    import jax

    rng = jax.random.key(seed)
    p_rng, n_rng, s_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": p_rng, "noise": n_rng},
        [
            sample_prep["xg"],
            sample_prep["tg"],
            sample_prep["ka"],
            sample_prep["al"],
            sample_prep["t60"],
            sample_prep["f_k"],
            sample_prep["c_k"],
        ],
        sample_prep["f_0"],
        sample_prep["u_0"],
    )
    params = variables["params"]
    constants = {k: v for k, v in variables.items() if k != "params"}
    opt_state = tx.init(params)
    return S.TrainState(params, constants, opt_state, 0, s_rng)


def _fast_forward_opt_counts(opt_state, step):
    """Set every ``count`` field in an optax state tree to ``step``.

    Used when resuming without an optstate checkpoint: optax schedules read
    their step from these counters, so a fresh state would re-warm the LR
    from 0 while metrics log schedule(global_step).
    """
    import jax.numpy as jnp

    def rec(s):
        if isinstance(s, tuple) and hasattr(s, "_fields"):
            vals = {f: rec(getattr(s, f)) for f in s._fields}
            if "count" in s._fields:
                c = vals["count"]
                vals["count"] = jnp.asarray(
                    step, getattr(c, "dtype", jnp.int32)
                )
            return type(s)(**vals)
        if isinstance(s, (list, tuple)):
            return type(s)(rec(x) for x in s)
        return s

    return rec(opt_state)


def save_checkpoint(save_dir, state, step, with_opt=True):
    """Write ``step_<n>`` (params + constants, the inference artifact the
    reference keeps as the Lightning ckpt) and, when training, a sibling
    ``optstate_<n>`` so ``train(resume=...)`` restores mid-run exactly."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(_ckpt_dir(save_dir), f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "constants": state.constants}, force=True)
    if with_opt and state.opt_state is not None:
        opath = os.path.abspath(
            os.path.join(_ckpt_dir(save_dir), f"optstate_{step}")
        )
        ckptr.save(opath, {"opt_state": state.opt_state}, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(ckpt_path, abstract):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(ckpt_path), abstract)


def latest_checkpoint(run_dir, prefer_best=False):
    """Find the single run checkpoint (reference trainer.py:21-27)."""
    pats = [
        f"{run_dir}/string/*/checkpoints/step_*",
        f"{run_dir}/checkpoints/step_*",
    ]
    hits = []
    for p in pats:
        hits += glob.glob(p)
    assert hits, f"no checkpoint under {run_dir}"
    # prefer the best-validation checkpoint when train() recorded one
    # (reference: Lightning ModelCheckpoint monitor='valid/loss'); resume
    # keeps using the latest step
    for p in pats if prefer_best else []:
        marker = os.path.join(os.path.dirname(p), "BEST")
        for m in glob.glob(marker):
            best = open(m).read().split()[0]
            cand = os.path.join(os.path.dirname(m), f"step_{best}")
            if os.path.isdir(cand):
                return cand
    return sorted(hits, key=lambda p: int(p.split("_")[-1]))[-1]


def use_snapshot_code(run_dir):
    """Execute the backed-up code snapshot if present (reference
    trainer.py:85-88 imports ``codes.src.task...``)."""
    codes = os.path.join(run_dir, "codes")
    if os.path.isdir(os.path.join(codes, "torch_fdtd_string_tpu")):
        sys.path.insert(0, codes)
        for name in list(sys.modules):
            if name.startswith("torch_fdtd_string_tpu"):
                del sys.modules[name]
        return True
    return False


def _prefetch(iterator, depth=2):
    """Overlap host batch prep + host->device upload with device compute.

    The streaming path (dataset too large for the device cache) otherwise
    serializes prepare_batch / the ~25 MB device_put behind each train step;
    a one-thread lookahead queue of ``device_put``-initiated batches keeps
    the link busy while the previous step runs (the reference gets this from
    torch DataLoader workers + Lightning's transfer hooks, trainer.py:62-78).
    """
    import queue as _q
    import threading

    import jax

    q = _q.Queue(maxsize=depth)
    END = object()

    err = []

    def worker():
        try:
            for item in iterator:
                q.put(jax.device_put(item))  # async: starts the transfer
        except BaseException as e:  # propagate, never truncate the epoch
            err.append(e)
        finally:
            q.put(END)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is END:
            if err:  # a worker crash must fail the epoch loudly, not
                raise err[0]  # silently end it early
            return
        yield item


def _build_host_cache(dataset, n_modes, block, sr, cache_path=None, drop=(),
                      chunk=4096):
    """Prepare the whole dataset into one host-side dict (and persist it).

    Runs in bounded memory by preparing ``chunk``-item slices and
    concatenating per key; fields listed in ``drop`` are removed BEFORE the
    save (train() always drops ``analytic``, and at x_stride=1 it would be
    ~15 GB of zeros on disk).  Fields whose rows are identical across items
    (e.g. the time grid) are stored as a single row — ``_device_cache``
    broadcasts them at gather time.  CPU-runnable: a pre-build on the host
    (tools/prebuild_cache.py) lets a training attempt start without the
    ~1 h dataset scan inside it.
    """
    from ..data.dataset import _collate

    if cache_path and os.path.exists(cache_path):
        with np.load(cache_path) as z:
            prep = {k: z[k] for k in z.files}
        # a cache prebuilt while the corpus was still filling (or against a
        # different x_stride) has fewer rows than the dataset; gathering
        # from it would silently train on clamped/garbage indices
        rows = max(v.shape[0] for v in prep.values())
        if rows == len(dataset):
            print(f"[trainer] loaded host cache {cache_path}")
            for k in drop:
                prep.pop(k, None)
            return prep
        print(f"[trainer] STALE host cache {cache_path}: {rows} rows != "
              f"{len(dataset)} items; rebuilding", flush=True)

    n = len(dataset)
    parts = []
    for lo in range(0, n, chunk):
        items = [dataset[i] for i in range(lo, min(lo + chunk, n))]
        p = S.prepare_batch(_collate(items), n_modes, block, sr)
        for k in drop:
            p.pop(k, None)
        parts.append(p)
        if len(parts) % 4 == 0 or lo + chunk >= n:
            print(f"[trainer] host cache build {min(lo + chunk, n)}/{n}",
                  flush=True)
    prep = {}
    for k in parts[0]:
        rows0 = parts[0][k]
        shared = (
            rows0.ndim >= 2
            and all(
                not np.ptp(p[k], axis=0).any()
                and np.array_equal(p[k][:1], rows0[:1])
                for p in parts
            )
        )
        prep[k] = rows0[:1] if shared else np.concatenate([p[k] for p in parts])
    if cache_path:
        tmp = cache_path + ".tmp.npz"
        np.savez(tmp, **prep)
        os.replace(tmp, cache_path)
        print(f"[trainer] wrote host cache {cache_path}")
    return prep


def _device_cache(dataset, n_modes, block, sr, drop=(), cache_path=None,
                  f16=False):
    """Upload the whole (prepared) dataset to the accelerator ONCE and return
    ``(gather, n)`` where ``gather(idx)`` assembles a batch on-device.

    Motivation: this environment reaches the TPU through a slow tunnel
    (~6 MB/s host->device), so streaming ~25 MB batches costs ~5-10 s/step
    while the train step itself takes ~0.17 s.  The prepared trainset is only
    ~1 GB, so one upfront transfer + on-device ``take`` makes epochs
    compute-bound.  Arrays that are identical across items (e.g. the time
    grid) are stored once and broadcast in the gather.
    """
    import jax
    import jax.numpy as jnp

    prep = _build_host_cache(dataset, n_modes, block, sr, cache_path, drop)
    n = len(dataset)
    shared, full = {}, {}
    # f16 mode (FDTD_CACHE_F16): store the big per-item float fields (the
    # audio-length targets dominate) as half precision on device and upcast
    # in the gather — halves HBM so ~40k-item sets still fit on one chip.
    # Quantization noise is ~-60 dB relative, below the PCM_16 floor the
    # reference's wav layout already imposes.
    big = 8192  # bytes/item threshold: only waveform-scale fields downcast
    for k, v in prep.items():
        if v.ndim >= 2 and v.shape[0] == 1 and n > 1:
            shared[k] = jax.device_put(v)  # row-compacted in the host cache
        elif v.ndim >= 2 and v.shape[0] == n and not np.ptp(v, axis=0).any():
            shared[k] = jax.device_put(v[:1])
        elif (f16 and v.dtype == np.float32
              and v.nbytes // max(v.shape[0], 1) >= big):
            full[k] = jax.device_put(v.astype(np.float16))
        else:
            full[k] = jax.device_put(v)

    # the cache tensors MUST be jit arguments, not closure captures — a
    # captured array becomes an HLO constant, bloating the program (and
    # overflowing remote-compile request limits) by the full cache size
    @jax.jit
    def _gather(full_d, shared_d, idx):
        out = {
            k: (jnp.take(v, idx, axis=0).astype(jnp.float32)
                if v.dtype == jnp.float16 else jnp.take(v, idx, axis=0))
            for k, v in full_d.items()
        }
        for k, v in shared_d.items():
            out[k] = jnp.broadcast_to(v, (idx.shape[0],) + v.shape[1:])
        return out

    def gather(idx):
        return _gather(full, shared, idx)

    t0 = time.time()
    jax.block_until_ready((full, shared))  # device_put is async; wait here so
    nbytes = sum(v.nbytes for v in list(full.values()) + list(shared.values()))
    print(f"[trainer] device-cached {n} samples ({nbytes/1e6:.0f} MB in "
          f"{time.time()-t0:.0f}s; shared: {sorted(shared)})", flush=True)
    return gather, n


def _eval_sweep(eval_fn, gather_fn, n_items, bs, state, rng, on_first=None):
    """Batched eval over a device-cached split with HBM-OOM backoff.

    The eval executable's scratch lives alongside the resident train cache,
    so a too-large eval batch can ResourceExhaust at dispatch time even
    though the train step itself fits (observed at valid_batch_size=256
    with the 8 GB f16 x1 cache, 2026-08-18).  Gathered batches are cheap
    and deterministic to re-produce, so on OOM the whole sweep restarts at
    half the batch; the adapted size is returned for reuse next epoch.
    """
    import jax

    while True:
        try:
            vals = []
            for vi, i in enumerate(range(0, n_items, bs)):
                hi = min(i + bs, n_items)
                prep = gather_fn(np.arange(i, hi))
                outputs, ld = eval_fn(state, prep, rng)
                d = {k: float(np.asarray(v)) for k, v in ld.items()}
                # batch length: split means are weighted by item count so
                # metrics are invariant to the batch partition (an
                # OOM-halved bs must not shift BEST-checkpoint selection)
                d["_n"] = hi - i
                vals.append(d)
                if vi == 0 and on_first is not None:
                    on_first(outputs)
            return vals, bs
        except jax.errors.JaxRuntimeError as err:
            if "RESOURCE_EXHAUSTED" not in str(err) or bs <= 1:
                raise
            bs //= 2
            print(f"[trainer] eval sweep OOM; retrying at batch {bs}",
                  flush=True)


def _wmean(vals, prefix):
    """Item-weighted split means from per-batch loss dicts ('_n' weights;
    legacy dicts without '_n' weigh batches equally)."""
    if not vals:
        return {}
    w = np.asarray([v.get("_n", 1) for v in vals], np.float64)
    return {
        f"{prefix}/{k}": float(
            np.sum([v[k] * wi for v, wi in zip(vals, w)]) / w.sum()
        )
        for k in vals[0]
        if k != "_n"
    }


def train(args, save_dir):
    import jax

    task = args.task
    model = S.build_model(args)
    inharmonic = model.inharmonic
    block = args.model.block_size
    sr = task.sr
    trim = int(task.train_lens * sr) if task.train_lens else None

    data_dir = task.load_dir
    x_stride = int(task.get("x_stride", 1) or 1)
    trainset = Trainset(data_dir, task.load_name, trim=trim, x_stride=x_stride)
    validset = Testset(data_dir, task.load_name, split="valid", x_stride=x_stride)
    train_loader = DataLoader(
        trainset, task.batch_size, shuffle=True, drop_last=True,
        num_workers=args.proc.num_workers, seed=args.proc.seed,
    )
    valid_loader = DataLoader(validset, task.valid_batch_size, shuffle=False)
    # dual-loader validation (reference validation_step runs valid AND test
    # each epoch, synthesize.py:333-383); BEST selection stays on valid/loss
    try:
        testset = Testset(data_dir, task.load_name, split="test",
                          x_stride=x_stride)
        test_loader = DataLoader(testset, task.valid_batch_size, shuffle=False)
    except Exception:
        testset = test_loader = None

    registry = build_loss_registry(sr, trim or sr)
    criteria = list(task.loss_criteria)
    eval_criteria = [c for c in task.eval_criteria if c in registry]

    grad_clip = None
    gc = task.grad_clip
    if isinstance(gc, (list, tuple)) and gc and gc[0]:
        grad_clip = gc[0]
    # schedules decay over the REAL run horizon (epochs x steps/epoch), not a
    # hardcoded default (reference relies on Lightning's trainer length)
    steps_per_epoch = max(len(trainset) // task.batch_size, 1)
    total_steps = int(task.total_epoch) * steps_per_epoch
    tx, schedule, needs_value = optlib.build(
        args.optimizer._name_, dict(args.optimizer),
        args.get("scheduler", {}).get("_name_") if args.get("scheduler") else None,
        dict(args.get("scheduler") or {}),
        grad_clip,
        total_steps=total_steps,
    )

    first = next(iter(train_loader))
    prep0 = S.prepare_batch(first, model.n_modes, block, sr)
    state = _init_state(args, model, tx, prep0, args.proc.seed)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"[trainer] params: {n_params/1e6:.2f}M; criteria: {criteria}")

    start_step = 0
    if task.get("resume"):
        # restore params/constants + optimizer state from the latest
        # checkpoint in this run dir (reference relies on Lightning ckpt +
        # wandb resume='allow', trainer.py:47)
        ckpt = latest_checkpoint(save_dir)
        restored = load_checkpoint(
            ckpt, {"params": state.params, "constants": state.constants}
        )
        start_step = int(ckpt.split("_")[-1])
        opt_path = ckpt.replace(f"step_{start_step}", f"optstate_{start_step}")
        opt_state = state.opt_state
        if os.path.isdir(opt_path):
            opt_state = load_checkpoint(
                opt_path, {"opt_state": state.opt_state}
            )["opt_state"]
        else:
            # No optimizer-state checkpoint (run dir predates optstate
            # saving).  Optimizer moments are unavoidably reset; fast-forward
            # every step counter inside the fresh state to start_step so the
            # APPLIED schedule LR matches the logged schedule(step) value
            # instead of silently re-warming from 0.
            print(
                f"[trainer] WARNING: {opt_path} missing - optimizer moments "
                f"reset; fast-forwarding schedule/opt counts to {start_step}"
            )
            opt_state = _fast_forward_opt_counts(opt_state, start_step)
        state = S.TrainState(
            restored["params"], restored["constants"], opt_state,
            start_step, jax.random.fold_in(state.rng, start_step),
        )
        print(f"[trainer] resumed from {ckpt} (step {start_step})")

    train_step = S.make_train_step(model, tx, registry, criteria, inharmonic, needs_value)
    eval_step = S.make_eval_step(model, registry, criteria, inharmonic)
    # test split synthesizes from the ModeEstimator's modes (reference
    # validation_step feeds [.., None, None] for dataloader_idx != 0)
    eval_step_est = S.make_eval_step(model, registry, criteria, inharmonic,
                                     use_gt_modes=False)

    # device-cache the datasets when items are deterministic (no random trim)
    # and small enough; otherwise stream host batches (see _device_cache)
    item_len = first["target"].shape[-1]
    cache_f16 = bool(os.environ.get("FDTD_CACHE_F16"))
    cache_gb = float(os.environ.get("FDTD_DEVICE_CACHE_GB", "6"))
    # per item the audio-length target dominates; the other per-item fields
    # (u0, f0 frames, mode tables) add ~20% ('analytic' is dropped from the
    # cache, so it no longer counts)
    est_gb = len(trainset) * 1.2 * item_len * (2 if cache_f16 else 4) / 1e9
    if not cache_f16 and est_gb > cache_gb and est_gb / 2 <= cache_gb:
        # f32 cache misses the budget but f16 fits: take the f16 cache over
        # the streaming path (an order of magnitude slower per step through
        # the slow host->device link).  FDTD_CACHE_F16=0/unset only forces
        # f32 when it fits; FDTD_NO_DEVICE_CACHE opts out entirely.
        cache_f16, est_gb = True, est_gb / 2
        print(f"[trainer] f32 device cache over budget -> f16 cache "
              f"({est_gb:.1f} GB <= {cache_gb:.0f} GB)")
    cacheable = (
        (trim is None or trim >= item_len)
        and est_gb <= cache_gb
        and not os.environ.get("FDTD_NO_DEVICE_CACHE")
    )
    if not cacheable and not os.environ.get("FDTD_NO_DEVICE_CACHE"):
        print(f"[trainer] device cache disabled (est {est_gb:.1f} GB > "
              f"{cache_gb:.0f} GB or random trim active) -> streaming path")
    # Data-parallel mesh over all visible devices (reference trains DDP out
    # of the box, trainer.py:62-78): batches shard over the "data" axis,
    # params/opt-state replicate, and jit inserts the gradient psum (the
    # mechanism tests/test_parallel.py proves equivalent to single-device).
    mesh = None
    n_dev = len(jax.devices())
    if (n_dev > 1 and task.batch_size % n_dev == 0
            and not os.environ.get("FDTD_NO_MESH")):
        from ..parallel import mesh as pmesh

        mesh = pmesh.make_mesh()
        state = pmesh.replicate(state, mesh)
        print(f"[trainer] data-parallel training over {n_dev} devices")

    gather = vgather = tgather = None
    n_test = 0
    if cacheable:
        # every knob that changes the prepared item set must be in the tag,
        # or a stale host cache silently feeds wrong rows to gather()
        ctag = f"{model.n_modes}_{block}_{sr}_{trim or 0}_x{x_stride}"
        gather, n_train = _device_cache(
            trainset, model.n_modes, block, sr, drop=("analytic",),
            cache_path=os.path.join(data_dir, task.load_name,
                                    f"_prep_train_{ctag}.npz"),
            f16=cache_f16,
        )
        vgather, n_valid = _device_cache(
            validset, model.n_modes, block, sr, drop=("analytic",),
            cache_path=os.path.join(data_dir, task.load_name,
                                    f"_prep_valid_{ctag}.npz"),
            f16=cache_f16,
        )
        if testset is not None:
            tgather, n_test = _device_cache(
                testset, model.n_modes, block, sr, drop=("analytic",),
                cache_path=os.path.join(data_dir, task.load_name,
                                        f"_prep_test_{ctag}.npz"),
                f16=cache_f16,
            )
        shuffle_rng = np.random.default_rng(args.proc.seed)

    from ..utils.profiling import Timer

    prof = Timer()
    step = start_step
    best_val = float("inf")
    eval_bs = int(task.valid_batch_size)
    test_bs = int(task.get("test_batch_size") or task.valid_batch_size)
    best_marker = os.path.join(_ckpt_dir(save_dir), "BEST")
    if start_step and os.path.exists(best_marker):
        # resumed runs must not demote the recorded best on their first
        # validation; the marker stores "step<TAB>valid_loss"
        parts = open(best_marker).read().split()
        if len(parts) > 1:
            best_val = float(parts[1])
    for epoch in range(start_step // steps_per_epoch, task.total_epoch):
        t0 = time.time()
        if gather is not None:
            order = shuffle_rng.permutation(n_train)
            nb = n_train // task.batch_size  # drop_last
            batch_iter = (
                gather(order[i * task.batch_size : (i + 1) * task.batch_size])
                for i in range(nb)
            )
        else:
            batch_iter = _prefetch(
                S.prepare_batch(b, model.n_modes, block, sr) for b in train_loader
            )
        with prof.scope("train_epoch"):
            for prep in batch_iter:
                if mesh is not None:
                    from ..parallel import mesh as pmesh

                    prep = pmesh.shard_batch(prep, mesh)
                with prof.scope("train_step"):
                    state, loss_dict = train_step(state, prep)
                step += 1
                if step <= 3 or step % 200 == 0:
                    jax.block_until_ready(loss_dict)
                    print(f"[trainer] step {step} done @ {time.time() - t0:.1f}s "
                          f"(epoch {epoch})", flush=True)
                if step % 50 == 0:
                    rec = {"epoch": epoch, "step": step, "split": "train",
                           "lr": float(schedule(step))}
                    rec.update({f"train/{k}": np.asarray(v) for k, v in loss_dict.items()})
                    _log(save_dir, rec)
        # validation
        if (epoch + 1) % max(task.valid_epoch, 1) == 0:
            vals = []
            rng = jax.random.key(1234 + epoch)
            if vgather is not None:
                def _on_first_valid(outputs):
                    if not task.get("plot"):
                        return
                    from .callbacks import plot_results

                    # slice to the plotted items BEFORE np.asarray pulls the
                    # batch across the (slow) device->host link
                    small = {k: v[:4] for k, v in outputs.items()}
                    plot_results(save_dir, "valid", small, sr, step=step)

                vals, eval_bs = _eval_sweep(
                    eval_step, vgather, n_valid, eval_bs, state, rng,
                    on_first=_on_first_valid)
            else:
                valid_iter = (
                    S.prepare_batch(b, model.n_modes, block, sr)
                    for b in valid_loader
                )
                for vi, prep in enumerate(valid_iter):
                    outputs, ld = eval_step(state, prep, rng)
                    vals.append({k: float(np.asarray(v)) for k, v in ld.items()})
                    if vi == 0 and task.get("plot"):
                        from .callbacks import plot_results

                        small = {k: v[:4] for k, v in outputs.items()}
                        plot_results(save_dir, "valid", small, sr, step=step)
            mean = _wmean(vals, "valid")
            mean.update({"epoch": epoch, "step": step, "split": "valid",
                         "lr": float(schedule(step)),
                         "epoch_time": time.time() - t0})
            _log(save_dir, mean)
            print(f"[trainer] epoch {epoch} step {step} "
                  + " ".join(f"{k}={v:.4f}" for k, v in mean.items()
                             if isinstance(v, float)))
            # dual-loader validation: the test split is evaluated each
            # validation epoch too (reference synthesize.py:333-383) so
            # metrics.jsonl carries both; BEST stays keyed on valid/loss
            if testset is not None:
                tvals = []
                if tgather is not None:
                    # the gather-path test sweep has its OWN batch size
                    # seeded from task.test_batch_size (ADVICE r3: it used
                    # to silently reuse the valid-derived eval_bs)
                    tvals, test_bs = _eval_sweep(
                        eval_step_est, tgather, n_test, test_bs, state, rng)
                else:
                    test_iter = (
                        S.prepare_batch(b, model.n_modes, block, sr)
                        for b in test_loader
                    )
                    for prep in test_iter:
                        _, ld = eval_step_est(state, prep, rng)
                        tvals.append({k: float(np.asarray(v))
                                      for k, v in ld.items()})
                if tvals:
                    tmean = _wmean(tvals, "test")
                    tmean.update({"epoch": epoch, "step": step, "split": "test"})
                    _log(save_dir, tmean)
            vloss = mean.get("valid/loss", float("inf"))
            # periodic safety checkpoint independent of best-val: long runs
            # through the flaky device relay must be resumable from a recent
            # epoch, not just from the last validation improvement
            ckpt_every = int(task.get("ckpt_every", 0) or 0)
            if ckpt_every and (epoch + 1) % ckpt_every == 0:
                save_checkpoint(save_dir, state, step)
            if vloss <= best_val:
                best_val = vloss
                save_checkpoint(save_dir, state, step)
                # marker so evaluate() tests the best-val params, not the
                # final (possibly overfit) state (reference: Lightning
                # ModelCheckpoint monitor='valid/loss')
                with open(best_marker, "w") as f:
                    f.write(f"{step}\t{vloss}")
    save_checkpoint(save_dir, state, step)
    # Lightning 'simple'-profiler-style summary (reference trainer.py:68)
    prof.dump(os.path.join(save_dir, "profile.json"))
    return state


def evaluate(args, save_dir):
    """Test loop: model + analytic-modal baseline scores (reference
    synthesize.py:385-476 + callbacks.py SaveTestResults)."""
    import jax

    run_dir = args.task.ckpt_dir or save_dir
    if use_snapshot_code(run_dir):
        # Delegate to the SNAPSHOT's own trainer module so every symbol
        # resolves within one code generation.  This module object was
        # imported from the live repo: its module-level references (S,
        # Testset, ...) keep pointing at live-repo modules even after
        # use_snapshot_code purges sys.modules, while lazy inner imports
        # re-resolve to the snapshot — a mixed-generation crash when the
        # model signature evolved since the run (observed: a run
        # snapshotted before `noise_floor` scored with the live
        # build_model passing the new kwarg into the snapshot's
        # Synthesizer).
        import importlib

        snap = importlib.import_module(__name__)
        if getattr(snap, "__file__", None) != __file__:
            return snap.evaluate(args, save_dir)

    task = args.task
    model = S.build_model(args)
    inharmonic = model.inharmonic
    block = args.model.block_size
    sr = task.sr

    testset = Testset(task.load_dir, task.load_name, split="test",
                      x_stride=int(task.get("x_stride", 1) or 1))
    test_loader = DataLoader(testset, task.test_batch_size, shuffle=False)

    registry = build_loss_registry(sr, sr)
    criteria = [c for c in task.loss_criteria if c in registry]

    first = next(iter(test_loader))
    prep0 = S.prepare_batch(first, model.n_modes, block, sr)
    rng = jax.random.key(0)
    variables = model.init(
        {"params": rng, "noise": rng},
        [prep0["xg"], prep0["tg"], prep0["ka"], prep0["al"], prep0["t60"],
         prep0["f_k"], prep0["c_k"]],
        prep0["f_0"],
        prep0["u_0"],
    )
    ckpt = latest_checkpoint(run_dir, prefer_best=True)
    restored = load_checkpoint(
        ckpt, {"params": variables["params"],
               "constants": {k: v for k, v in variables.items() if k != "params"}}
    )
    state = S.TrainState(restored["params"], restored["constants"], None, 0, rng)
    # reference test_step drives synthesis with the estimator's modes unless
    # model.use_precomputed_mode (synthesize.py:409-410; dmsp.yaml: false)
    upm = bool(args.model.get("use_precomputed_mode", False))
    eval_step = S.make_eval_step(model, registry, criteria, inharmonic,
                                 use_gt_modes=upm)

    from ..models.objective import build_metric_registry
    from .callbacks import plot_state_video, save_test_results

    metric_registry = build_metric_registry(sr)
    eval_criteria = [
        c for c in task.get("eval_criteria", []) if c in metric_registry
    ]

    header = ["x_grid", "kappa", "alpha", "p_a", "p_x",
              "si_sdr", "sdr", "logmag", "f0_error"]
    out_rows, mod_rows, ids = [], [], []
    for bi, batch in enumerate(test_loader):
        prep = S.prepare_batch(batch, model.n_modes, block, sr)
        outputs, _ = eval_step(state, prep, jax.random.key(bi))
        n = np.asarray(outputs["preds"]).shape[-1]
        analytic = prep["analytic"][..., :n]
        # model vs FDTD ground truth; modal baseline uses its own pitch track
        # ua_f0 (reference synthesize.py:421-426)
        model_scores = S.summarize_eval_scores(
            prep, outputs["preds"], outputs["target"],
            outputs["preds_f0"], prep["gt_f0"], sr,
        )
        an_f0 = prep.get("an_f0", prep["gt_f0"])
        modal_scores = S.summarize_eval_scores(
            prep, analytic, outputs["target"], an_f0, prep["gt_f0"], sr,
        )
        # running metric accumulators (reference compute_eval("test", batch),
        # torchmetrics dist_reduce_fx="sum" semantics — objective.py)
        for c in eval_criteria:
            metric, keys = metric_registry[c]
            pool = {k: np.asarray(v) for k, v in outputs.items()}
            metric.update(*[pool[k] for k in keys])
        for i in range(len(analytic)):
            ids.append(f"0-{bi}-{i}")
            out_rows.append([float(model_scores[k][i]) for k in header])
            mod_rows.append([float(modal_scores[k][i]) for k in header])
        # flush partial tables every few batches: a relay wedge mid-scoring
        # keeps the rows already scored.  Distinct *.partial names so
        # resume logic (tools/post_train_score.sh keys on a non-empty
        # score/output.txt) never mistakes a prefix for final scores.
        if bi % 8 == 7:
            save_test_results(save_dir, out_rows, header,
                              name="output.partial", ids=ids, partial=True)
            save_test_results(save_dir, mod_rows, header,
                              name="modals.partial", ids=ids, partial=True)
        if task.get("plot_test_video"):
            # the test batch dim is the spatial axis of one string
            # (reference callbacks.py:137-179 PlotStateVideo.summary)
            gain = np.asarray(prep.get("gain", np.ones((1, 1))))
            est = (np.asarray(outputs["preds"]) * gain).T
            tar = (np.asarray(outputs["target"]) * gain).T
            ana = (np.asarray(analytic) * gain).T
            plot_state_video(
                os.path.join(save_dir, "state"), est, ana, tar, sr,
                name=f"0-{bi}",
            )
        elif bi == 0 and task.get("plot"):
            uplot.rainbowgram(
                os.path.join(save_dir, "test_pred_spec.pdf"),
                np.asarray(outputs["preds"])[0], sr,
            )
            uplot.rainbowgram(
                os.path.join(save_dir, "test_target_spec.pdf"),
                np.asarray(outputs["target"])[0], sr,
            )
            # est/tar/analytic logmag+logmel table (reference est_tar_specs,
            # plot.py:926-1004)
            uplot.est_tar_specs(
                os.path.join(save_dir, "test_specs"),
                np.asarray(outputs["preds"])[:4],
                np.asarray(outputs["target"])[:4],
                np.asarray(analytic)[:4], sr,
            )
        if task.get("save_results"):
            # SaveResults twin (reference callbacks.py:259-279)
            from .callbacks import save_results

            save_results(
                os.path.join(save_dir, "eval", str(task.load_name)),
                np.asarray(outputs["preds"]), sr,
                ids=[f"0-{bi}-{i}" for i in range(len(analytic))],
            )

    save_test_results(save_dir, out_rows, header, name="output", ids=ids)
    save_test_results(save_dir, mod_rows, header, name="modals", ids=ids)
    for leftover in ("output.partial.txt", "modals.partial.txt"):
        p = os.path.join(save_dir, "score", leftover)
        if os.path.exists(p):
            os.remove(p)
    if eval_criteria:
        rec = {"split": "test"}
        rec.update({
            f"test/{c}": metric_registry[c][0].compute() for c in eval_criteria
        })
        _log(save_dir, rec)
        print("[trainer] test metrics: "
              + " ".join(f"{c}={metric_registry[c][0].compute():.4f}"
                         for c in eval_criteria))
    score_dir = os.path.join(save_dir, "score")
    print(f"[trainer] wrote scores for {len(out_rows)} items -> {score_dir}")
    return out_rows, mod_rows


def dryrun_train_step(mesh, batch_size=8):
    """Tiny data-parallel DMSP train step over a mesh (used by
    ``__graft_entry__.dryrun_multichip``)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.synthesizer import Synthesizer

    B, Nt, Nx, block = batch_size, 1024, 64, 256
    n_frames = Nt // block + 1
    model = Synthesizer(
        n_modes=8, n_bands=9, hidden_dim=32, embed_dim=16, block_size=block,
        # flagship parity: the physics mode path (table gather + batched
        # normal-equation solves + argsort merge) must shard over the mesh
        mode_estimator="physics",
    )
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    prep = {
        "xg": jnp.full((B, 1), 0.3),
        "tg": jnp.tile(jnp.arange(Nt) / 48000.0, (B, 1)),
        "ka": jnp.full((B, 1), 0.02),
        "al": jnp.full((B, 1), 2.0),
        "t60": jnp.tile(jnp.array([[[1000.0, 20.0], [100.0, 18.0]]]), (B, 1, 1)),
        "f_k": jnp.full((B, 1, 8), 0.03),
        "c_k": jnp.full((B, 1, 8), 0.01),
        "f_0": jnp.full((B, n_frames), 220.0),
        "u_0": jnp.zeros((B, 1, Nx)).at[:, 0, 20].set(0.01),
        "gt": jnp.zeros((B, Nt)),
        "gt_f0": jnp.full((B, n_frames), 0.028),
    }
    variables = model.init(
        rngs,
        [prep["xg"], prep["tg"], prep["ka"], prep["al"], prep["t60"],
         prep["f_k"], prep["c_k"]],
        prep["f_0"],
        prep["u_0"],
    )
    import optax

    tx = optax.adam(1e-4)
    state = S.TrainState(
        variables["params"],
        {k: v for k, v in variables.items() if k != "params"},
        tx.init(variables["params"]),
        0,
        jax.random.key(2),
    )
    registry = build_loss_registry(48000, Nt)
    step_fn = S.make_train_step(model, tx, registry, ["l1", "modeamps"], True)

    # shard batch over the mesh, replicate params -> jit inserts the psum
    batch_sharded = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        )
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B
        else x,
        prep,
    )
    state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P()))
        if hasattr(x, "ndim")
        else x,
        state,
    )
    new_state, loss_dict = step_fn(state, batch_sharded)
    jax.block_until_ready(loss_dict)
    assert np.isfinite(float(np.asarray(loss_dict["loss"])))
    return loss_dict
