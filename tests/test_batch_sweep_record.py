"""Regression lock on the committed round-5 batch-sweep record.

VERDICT r4 #4 asked for the measured sweep (tools/batch_sweep.py) to be
committed and regression-tested: throughput over B in {16..256} must stay
monotone within the 10% acceptance band.  This test pins the committed
record (results/batch_sweep_r5.jsonl) so a future edit can't silently
replace it with a non-monotone or implausible one; the live acceptance
run itself needs hardware and stays in tools/.
"""

import json
import os

import pytest

RECORD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "results", "batch_sweep_r5.jsonl",
)


@pytest.fixture()
def rows():
    if not os.path.exists(RECORD):
        pytest.skip("committed sweep record absent")
    out = [json.loads(l) for l in open(RECORD) if l.strip()]
    points = [r for r in out if "B" in r]
    summary = [r for r in out if "monotone_within_10pct" in r]
    return points, summary


def test_sweep_covers_acceptance_batches(rows):
    points, _ = rows
    assert [r["B"] for r in points] == [16, 32, 64, 128, 256]
    for r in points:
        assert "error" not in r, r


def test_sweep_monotone_within_10pct(rows):
    points, summary = rows
    rates = [r["audio_s_per_s"] for r in points]
    assert all(b >= 0.9 * a for a, b in zip(rates, rates[1:])), rates
    assert summary and summary[0]["monotone_within_10pct"] is True


def test_sweep_rates_physically_plausible(rows):
    """Between the reference-CPU floor and the relay-ghost ceiling, and the
    B=64 mid-batch hole (round 3: 11.8 audio-s/s < B=16's rate) stays fixed."""
    points, _ = rows
    rate = {r["B"]: r["audio_s_per_s"] for r in points}
    assert all(0.1 < v < 2000.0 for v in rate.values()), rate
    assert rate[64] > rate[16], rate
