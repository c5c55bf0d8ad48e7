"""Pre-build the trainer's consolidated host prep caches on the CPU.

The first training attempt otherwise spends ~1 h (at x_stride=1, one-core
host) scanning ~80k wav/npz items before it can touch the TPU; building the
``_prep_<split>_<tag>.npz`` files here lets the attempt start compute-bound
(and lets the build run while the device relay is wedged).

Usage: python tools/prebuild_cache.py --load-name dmsp5k [--x-stride 1]
           [--data-dir ./results] [--n-modes 40] [--block 256] [--sr 48000]
           [--trim-s 1.0]
"""

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PYTHONPATH", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load-name", required=True)
    ap.add_argument("--data-dir", default="./results")
    ap.add_argument("--x-stride", type=int, default=1)
    ap.add_argument("--n-modes", type=int, default=40)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--sr", type=int, default=48000)
    ap.add_argument("--trim-s", type=float, default=1.0)
    ap.add_argument("--splits", default="train,valid,test",
                    help="comma list; e.g. test-only x1 cache for scoring "
                         "without paying a full-corpus train scan")
    a = ap.parse_args()

    from torch_fdtd_string_tpu.data.dataset import Testset, Trainset
    from torch_fdtd_string_tpu.tasks.trainer import _build_host_cache

    trim = int(a.trim_s * a.sr)
    ctag = f"{a.n_modes}_{a.block}_{a.sr}_{trim}_x{a.x_stride}"
    sets = {
        "train": Trainset(a.data_dir, a.load_name, trim=trim,
                          x_stride=a.x_stride),
        "valid": Testset(a.data_dir, a.load_name, split="valid",
                         x_stride=a.x_stride),
        "test": Testset(a.data_dir, a.load_name, split="test",
                        x_stride=a.x_stride),
    }
    wanted = {s.strip() for s in a.splits.split(",") if s.strip()}
    sets = {k: v for k, v in sets.items() if k in wanted}
    for split, ds in sets.items():
        path = os.path.join(a.data_dir, a.load_name,
                            f"_prep_{split}_{ctag}.npz")
        if os.path.exists(path):
            print(f"[prebuild] {path} exists, skipping")
            continue
        print(f"[prebuild] {split}: {len(ds)} items -> {path}", flush=True)
        _build_host_cache(ds, a.n_modes, a.block, a.sr, cache_path=path,
                          drop=("analytic",))
    print("[prebuild] done")


if __name__ == "__main__":
    main()
