"""Score-TSV writer semantics (reference callbacks.py:99-135
``SaveTestResults``): atomic rewrites, and partial-flush tables that can
never be mistaken for final scores (round-4 advisor findings)."""

import os

from torch_fdtd_string_tpu.tasks.callbacks import save_test_results

HEADER = ["si_sdr", "sdr"]


def test_final_table_has_mean_row(tmp_path):
    rows = [[1.0, 2.0], [3.0, 4.0]]
    p = save_test_results(str(tmp_path), rows, HEADER, ids=["a", "b"])
    lines = open(p).read().strip().splitlines()
    assert lines[0].split("\t")[0] == "id"
    assert len(lines) == 4
    mean = lines[-1].split("\t")
    assert mean[0] == "# mean"
    assert float(mean[1]) == 2.0 and float(mean[2]) == 3.0


def test_partial_flush_has_marker_not_mean(tmp_path):
    rows = [[1.0, 2.0]]
    p = save_test_results(str(tmp_path), rows, HEADER,
                          name="output.partial", ids=["a"], partial=True)
    assert p.endswith("output.partial.txt")
    txt = open(p).read()
    assert "# partial 1 rows" in txt
    assert "# mean" not in txt
    # the final table name is untouched by partial flushes
    assert not os.path.exists(os.path.join(str(tmp_path), "score",
                                           "output.txt"))


def test_write_is_atomic_no_tmp_left(tmp_path):
    save_test_results(str(tmp_path), [[1.0, 2.0]], HEADER, ids=["a"])
    d = os.path.join(str(tmp_path), "score")
    assert sorted(os.listdir(d)) == ["output.txt"]
