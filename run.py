#!/usr/bin/env python3
"""CLI entry point — TPU-native StringFDTD + DMSP framework.

Usage mirrors the reference (reference run.py:54-151):

    python run.py experiment=nsynth-like task.num_samples=100
    python run.py experiment=linear-string
    python run.py experiment=synth-dmsp proc.train=true

Dispatch is driven by the ``proc.*`` booleans: simulate / evaluate /
summarize / process_training_data / train / test.
"""

import os
import sys
from shutil import copyfile

ROOT = os.path.dirname(os.path.abspath(__file__))
CONFIG_DIR = os.path.join(ROOT, "torch_fdtd_string_tpu", "configs")


def backup_code(cwd, run_dir):
    """Snapshot the source tree into <run_dir>/codes (reference run.py:30-52),
    so inference can execute the exact code version that trained a model."""
    exclude_dir = ["__pycache__", ".git", "results", "res", "log", "check",
                   "codes", ".pytest_cache", ".hypothesis", ".worktrees"]
    # "data" is excluded at the REPO ROOT only (reference parity: its
    # data/ holds datasets) — torch_fdtd_string_tpu/data is a SOURCE
    # subpackage and must snapshot, or the snapshot can't execute
    # (scoring imports ..data.dataset from it)
    root_only_exclude = ["data"]
    exclude_ext = [".png", ".jpg", ".pt", ".npz", ".ckpt", ".wav"]
    for dirpath, dirnames, filenames in os.walk(cwd, topdown=True):
        dirnames[:] = [
            d for d in dirnames
            if d not in exclude_dir
            and not (dirpath == cwd and d in root_only_exclude)
        ]
        rel = os.path.relpath(dirpath, cwd)
        for name in filenames:
            if os.path.splitext(name)[-1] in exclude_ext or name.endswith(".swp"):
                continue
            dst_dir = os.path.join(run_dir, "codes", rel)
            os.makedirs(dst_dir, exist_ok=True)
            try:
                copyfile(os.path.join(dirpath, name), os.path.join(dst_dir, name))
            except OSError:
                pass


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from torch_fdtd_string_tpu.utils.config import compose, print_config

    args = compose(CONFIG_DIR, argv)

    # precision/backend setup must happen before the first jax import
    # (JAX_PLATFORMS=axon is pinned globally in this environment, so force)
    precision = getattr(args.task, "precision", "single")
    if args.proc.cpu or precision == "double":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # multi-host SPMD (reference multi-node DDP analog, trainer.py:62-78):
    # FDTD_COORD=host:port FDTD_NPROCS=N FDTD_PROC_ID=i enables it; must
    # precede any backend use so jax.devices() is the global list
    from torch_fdtd_string_tpu.parallel.mesh import init_distributed

    if init_distributed():
        print(f"[run] distributed: process {jax.process_index()}"
              f"/{jax.process_count()}, {jax.device_count()} global devices")

    if precision == "double":
        jax.config.update("jax_enable_x64", True)
    # persistent compile cache: repeated runs of the same shapes are free
    cache_dir = os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.jax_fdtd_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    np.random.seed(args.proc.seed)

    args.cwd = ROOT
    if args.task.save_name is not None:
        save_dir_name = args.task.save_name
    elif args.proc.debug or args.task.result_dir == "debug":
        args.proc.debug = True
        save_dir_name = "debug"
    else:
        save_dir_name = args.task.result_dir

    if not os.path.isabs(args.task.root_dir):
        args.task.root_dir = os.path.join(ROOT, args.task.root_dir)
    if args.task.get("load_dir") and not os.path.isabs(args.task.load_dir):
        args.task.load_dir = os.path.join(ROOT, args.task.load_dir)

    save_dir = f"{args.task.root_dir}/{save_dir_name}"

    if args.task.measure_time:
        args.task.plot = False
        args.task.save = False
        args.task.plot_state = False

    if args.proc.simulate or args.proc.train:
        os.makedirs(save_dir, exist_ok=True)
        backup_code(ROOT, save_dir)
        print_config(args, os.path.join(save_dir, "config_tree.txt"))
    else:
        print_config(args)

    if args.proc.simulate:
        model_name = (
            "random" if args.model.get("excitation") is None else args.model.excitation
        )
        n_samples = max(args.task.num_samples // args.task.batch_size, 1)
        from torch_fdtd_string_tpu.tasks import simulate

        simulate.run(args, save_dir, model_name, n_samples=n_samples)

    if args.proc.evaluate:
        from torch_fdtd_string_tpu.tasks import evaluate

        load_dir = save_dir if args.task.get("load_dir") is None else args.task.load_dir
        evaluate.evaluate(load_dir)

    if args.proc.summarize:
        from torch_fdtd_string_tpu.tasks import summarize

        load_dir = save_dir if args.task.get("load_dir") is None else args.task.load_dir
        summarize.summarize(load_dir)

    if args.proc.process_training_data:
        from torch_fdtd_string_tpu.tasks import process_training_data

        process_training_data.process(args)

    if args.proc.train:
        from torch_fdtd_string_tpu.tasks import trainer

        trainer.train(args, save_dir)

    if args.proc.test:
        from torch_fdtd_string_tpu.tasks import trainer

        assert args.task.ckpt_dir is None or args.proc.train is False
        args.task.ckpt_dir = args.task.ckpt_dir or save_dir
        trainer.evaluate(args, save_dir)


if __name__ == "__main__":
    main()
