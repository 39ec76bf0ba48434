"""Opt-in slow differential harness (ADVICE r6): the 200k-row
adversarial alert-fold differential BASELINE.md cites, checked in and
reproducible. Run with::

    DARIADB_SLOW_TESTS=1 python -m pytest tests/test_slow_differential.py

Skipped by default — the per-commit property test
(tests/test_property_parity.py::test_alert_fold_matches_naive_reference)
covers the same contract at hypothesis scale; this harness is the
large-N version with deterministic adversarial structure (ties,
out-of-order arrival, spikes, constant stretches, round-boundary
values) that exercises long per-batch prefix sums — exactly the regime
where the cumsum recipe's error could in principle flip a round(·,6)
decision (now guarded by ``_exactify_boundary_sums``)."""

import math
import os

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("DARIADB_SLOW_TESTS"),
    reason="set DARIADB_SLOW_TESTS=1 to run the 200k differential",
)

WINDOW, MIN_N, THRESHOLD = 20, 10, 3.0
N_ROWS = 200_000
N_BATCHES = 13


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _adversarial_rows(rng: np.random.Generator) -> list[tuple]:
    """200k (time, value, flag) rows: 2-decimal telemetry base, planted
    spikes, constant (std=0) stretches, exact round-boundary values, and
    heavy time ties."""
    # times with many ties: ~N/4 distinct slots
    t = np.sort(rng.integers(0, N_ROWS // 4, N_ROWS)).astype(np.int64)
    v = np.round(rng.normal(50.0, 10.0, N_ROWS), 2)
    # 2% spikes
    spikes = rng.random(N_ROWS) < 0.02
    v[spikes] += rng.choice([-1.0, 1.0], spikes.sum()) * rng.uniform(
        60.0, 120.0, spikes.sum()
    )
    # constant stretches (std=0 windows must emit nothing)
    for _ in range(40):
        i = int(rng.integers(0, N_ROWS - 60))
        v[i : i + 60] = 42.0
    # round(·,6)-boundary-adjacent values: sums land near x.xxxxxx5
    boundary = rng.random(N_ROWS) < 0.05
    k = rng.integers(-2_000_000, 2_000_000, boundary.sum())
    v[boundary] = (k + 0.5) / 1e6
    f = rng.integers(0, 4, N_ROWS).astype(np.int64)
    return list(zip(t.tolist(), v.tolist(), f.tolist()))


def _naive_fold(batches):
    """Definitional per-point reference: trail = preceding WINDOW points
    by arrival, fresh ascending sums, HALF_UP moments — the round-5
    semantics the vectorized fold must reproduce byte-for-byte."""
    from dariadb_spark.streaming.stateful import _round_half_up

    tail: list[tuple] = []
    expected: list[tuple] = []
    for batch in batches:
        for t, v, f in batch:
            trail = tail[-WINDOW:]
            n = len(trail)
            if n >= MIN_N:
                s = 0.0
                s2 = 0.0
                for _, tv, _ in trail:
                    s += tv
                    s2 += tv * tv
                mean = _round_half_up(s, 6) / n
                ex2 = _round_half_up(s2, 6) / n
                std = math.sqrt(max(ex2 - mean * mean, 0.0))
                if std > 0:
                    z = _round_half_up((v - mean) / std, 4)
                    if abs(z) > THRESHOLD:
                        expected.append((7, t, v, f, n, z))
            tail.append((t, v, f))
            if len(tail) > WINDOW:
                tail = tail[-WINDOW:]
    return expected, tail


def test_alert_fold_200k_differential():
    from dariadb_spark.streaming.stateful import _make_alert_fold

    rng = np.random.default_rng(20260814)
    rows = _adversarial_rows(rng)
    # out-of-order ACROSS batches (late data), sorted WITHIN each batch
    # — the fold's documented arrival contract
    perm = rng.permutation(N_ROWS)
    shuffled = [rows[i] for i in perm]
    chunk = (N_ROWS + N_BATCHES - 1) // N_BATCHES
    batches = [
        sorted(shuffled[i : i + chunk])
        for i in range(0, N_ROWS, chunk)
    ]

    expected, tail = _naive_fold(batches)
    assert len(expected) > 1000  # the fixture genuinely alerts

    fold = _make_alert_fold(WINDOW, MIN_N, THRESHOLD)
    state = _FakeState()
    got: list[tuple] = []
    for batch in batches:
        pdf = pd.DataFrame(
            batch, columns=["time", "value", "flag"]
        ).astype({"time": "int64", "value": "float64", "flag": "int64"})
        for out in fold((7,), iter([pdf]), state):
            got.extend(
                tuple(r) for r in out.itertuples(index=False, name=None)
            )

    assert got == expected
    st_times, st_values, st_flags = state.get
    assert list(zip(st_times, st_values, st_flags)) == tail
