"""Arrange a flat preprocessed dataset into train/valid/test split dirs.

The dataset loaders follow the reference layout
``{load_dir}/{load_name}/{split}/{string_id}/ut-*.wav``
(reference src/dataset/synthesize.py:45); preprocessing mirrors the
simulation directory tree, so a flat run needs a one-time deterministic
split.  Moves (renames) each sample dir into a split subdir, seeded by
name hash so reruns are stable and resumable.

Usage: python tools/make_splits.py results/dmsp480 [valid_n] [test_n]
"""

import hashlib
import os
import sys


def main():
    root = sys.argv[1]
    valid_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    test_n = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    splits = ("train", "valid", "test")
    dirs = sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and d not in splits
        and os.path.exists(os.path.join(root, d, "parameters.npz"))
    )
    # deterministic order by name hash (names are random per batch already,
    # but hashing decouples the split from generation order)
    dirs.sort(key=lambda d: hashlib.sha1(d.encode()).hexdigest())
    assign = {}
    for i, d in enumerate(dirs):
        if i < test_n:
            assign[d] = "test"
        elif i < test_n + valid_n:
            assign[d] = "valid"
        else:
            assign[d] = "train"
    for s in splits:
        os.makedirs(os.path.join(root, s), exist_ok=True)
    for d, s in assign.items():
        os.rename(os.path.join(root, d), os.path.join(root, s, d))
    counts = {
        s: len(os.listdir(os.path.join(root, s))) for s in splits
    }
    print(f"[make_splits] {root}: {counts}")


if __name__ == "__main__":
    main()
