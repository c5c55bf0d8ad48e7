"""Table-seeded stiff-string root finding must return the dense sweep's
exact root set (count AND values to LM-convergence precision) — it is the
corpus-generation assemble hot path (reference analytic.py:143-260 solves
the same transcendental families per item with no table)."""

import os

import numpy as np
import pytest

from torch_fdtd_string_tpu.core import analytic


@pytest.mark.parametrize("kap", [0.01, 0.0173, 0.03])
def test_table_seeded_roots_match_sweep(kap):
    s = analytic.StiffStringModes(1.0 / (2.0 * kap * kap))
    for kind in ("even", "odds"):
        fast = s.roots(kind, strict=False, kappa_rel=kap)
        os.environ["FDTD_NO_ROOT_TABLE"] = "1"
        try:
            slow = s.roots(kind, strict=False, kappa_rel=kap)
        finally:
            del os.environ["FDTD_NO_ROOT_TABLE"]
        assert len(fast) == len(slow)
        assert np.max(np.abs(fast - slow) / slow) < 1e-12


def test_table_counts_constant_and_bounded():
    kgrid, fams = analytic.root_tables()
    assert kgrid[0] == analytic._ROOT_TABLE_LO
    assert kgrid[-1] == analytic._ROOT_TABLE_HI
    # constant per-family count is what guarantees sweep-set equality
    assert fams["even"].ndim == 2 and fams["odds"].ndim == 2
    # every tabulated root lies strictly inside the sweep window, with the
    # margin that keeps boundary behavior identical across the range
    for tab in fams.values():
        assert tab.min() > np.pi / 2
        assert tab.max() < 100 * np.pi - 1.0
        # rows sorted: interpolation between neighbors stays in-basin
        assert (np.diff(tab, axis=1) > 0).all()


def test_out_of_range_kappa_falls_back():
    kap = 0.06  # outside the table range
    s = analytic.StiffStringModes(1.0 / (2.0 * kap * kap))
    fast = s.roots("even", strict=False, kappa_rel=kap)
    os.environ["FDTD_NO_ROOT_TABLE"] = "1"
    try:
        slow = s.roots("even", strict=False, kappa_rel=kap)
    finally:
        del os.environ["FDTD_NO_ROOT_TABLE"]
    np.testing.assert_allclose(fast, slow, rtol=0)
