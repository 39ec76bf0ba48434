"""Fold-contract taxonomy sweep (VERDICT r17 item 5).

The r17 taxonomy classifies every ``applyInPandasWithState`` fold:

- **sample-class** (turning, burst, ltv, markov): the batch oracle
  keeps duplicate keys as samples, so the fold ACCEPTS an
  exact-duplicate key across triggers and RAISES on strictly-before
  (it would silently rewrite sequence-derived output).
- **LWW-class** (rate, runlen, ewma): the batch oracle LWW-dedups on
  time, so a cross-batch duplicate would have to rewrite
  already-emitted rows — EQUALITY raises too.
- **commutative-class** (ohlc, stateful rollup, sketch merges): the
  merge is order-insensitive over the input multiset, so there is NO
  in-order contract by construction; the pin is that a duplicate key
  split across triggers reaches the same standing result as the
  one-shot fold over the same multiset.

turning/rate/runlen/burst/ltv are pinned in their staged-round files
(test_staged_r17b.py, test_staged_r18.py); THIS file closes the sweep
for the remaining stateful twins: markov, ewma, ohlc, the stateful.py
bucket rollup, and the sketch.py HLL register merge — one
duplicate-key-across-trigger test per twin, plus the raise pins where
the class has one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class _FakeState:
    def __init__(self):
        self._v, self.exists = None, False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = tuple(v), True


# --- markov: sample-class -----------------------------------------------------


def _ev_batch(rows):  # rows: (event_id, ts_ns, event_type)
    return pd.DataFrame({
        "ts": pd.to_datetime([r[1] for r in rows], unit="ns"),
        "event_id": np.array([r[0] for r in rows], dtype=np.int64),
        "event_type": np.array([r[2] for r in rows], dtype=object),
    })


def test_markov_fold_accepts_cross_batch_duplicate_key():
    """An exact-duplicate (ts, event_id) event re-landing in a later
    trigger is an in-order sample: the batch lag window pairs duplicate
    rows too, producing a self-transition — the fold must emit the same
    pair, not raise."""
    from dariadb_spark.streaming.markov import _transition_fold

    st = _FakeState()
    out1 = list(_transition_fold(
        (7,), iter([_ev_batch([(1, 1000, "view"), (2, 2000, "cart")])]), st
    ))
    assert list(map(tuple, out1[-1].itertuples(index=False))) == [
        ("view", "cart")
    ]
    # duplicate key (2, 2000, cart) again: accepted, emits cart->cart
    out2 = list(_transition_fold(
        (7,), iter([_ev_batch([(2, 2000, "cart")])]), st
    ))
    assert list(map(tuple, out2[-1].itertuples(index=False))) == [
        ("cart", "cart")
    ]
    assert st.get == ("cart", 2000, 2)


def test_markov_fold_raises_on_cross_batch_out_of_order():
    from dariadb_spark.streaming.markov import _transition_fold

    st = _FakeState()
    list(_transition_fold(
        (7,), iter([_ev_batch([(1, 1000, "view"), (2, 2000, "cart")])]), st
    ))
    with pytest.raises(ValueError, match="in-order ingest contract"):
        list(_transition_fold(
            (7,), iter([_ev_batch([(9, 1500, "buy")])]), st
        ))


# --- ewma: LWW-class ----------------------------------------------------------


def _meas_batch(rows):  # rows: (time, value, flag)
    return pd.DataFrame({
        "id": 5,
        "time": np.array([r[0] for r in rows], dtype=np.int64),
        "value": np.array([r[1] for r in rows], dtype=np.float64),
        "flag": np.array([r[2] for r in rows], dtype=np.int64),
    })


def test_ewma_fold_raises_on_cross_batch_duplicate_time():
    """LWW-class (the rate.py precedent): the batch oracle LWW-dedups
    on time, so a duplicate time arriving in a LATER trigger would
    have to rewrite an already-emitted smoothed row — equality raises,
    unlike the sample-class folds."""
    from dariadb_spark.streaming.ewma import _ewma_fold

    st = _FakeState()
    list(_ewma_fold((5,), iter([_meas_batch([(1000, 1.0, 0)])]), st))
    with pytest.raises(ValueError, match="in-order ingest contract"):
        list(_ewma_fold((5,), iter([_meas_batch([(1000, 2.0, 0)])]), st))
    st2 = _FakeState()
    list(_ewma_fold((5,), iter([_meas_batch([(1000, 1.0, 0)])]), st2))
    with pytest.raises(ValueError, match="in-order ingest contract"):
        list(_ewma_fold((5,), iter([_meas_batch([(900, 2.0, 0)])]), st2))


def test_ewma_fold_lww_dedups_duplicates_inside_one_batch():
    """IN-batch duplicate times are legitimate and LWW'd silently
    (keep max (value, flag) per time — dedup_lww's total order), same
    as the batch plan's upfront dedup."""
    from dariadb_spark.streaming.ewma import _ewma_fold

    st = _FakeState()
    out = list(_ewma_fold(
        (5,),
        iter([_meas_batch([(1000, 1.0, 0), (1000, 3.0, 0), (2000, 2.0, 0)])]),
        st,
    ))
    pdf = out[-1]
    assert pdf["time"].tolist() == [1000, 2000]
    assert pdf["value"].tolist() == [3.0, 2.0]  # LWW kept 3.0
    assert list(st.get[0]) == [1000, 2000]


# --- ohlc: commutative-class ---------------------------------------------------


def test_ohlc_fold_duplicate_across_triggers_matches_one_shot():
    """Commutative-class pin: the SAME input multiset — including an
    exact-duplicate (time, value, flag) sample — folded as one batch or
    split across two triggers (duplicate straddling the cut) lands the
    identical standing bar; the duplicate is counted as a sample both
    ways, exactly like the batch groupBy over duplicate rows."""
    from dariadb_spark.streaming.ohlc import _ohlc_fold

    rows = [(1000, 2.0, 0), (2000, 5.0, 1), (2000, 5.0, 1), (3000, 1.0, 0)]

    def bar(batches):
        st = _FakeState()
        last = None
        for b in batches:
            out = list(_ohlc_fold((5, 0), iter([_meas_batch(b)]), st))
            last = out[-1]
        return tuple(last.iloc[0])

    one_shot = bar([rows])
    split = bar([rows[:2], rows[2:]])  # duplicate (2000,5.0,1) straddles
    assert one_shot == split
    # open=first by (t,v,f), close=last, n counts the duplicate
    _, _, o, hi, lo, c, n = one_shot
    assert (o, hi, lo, c, n) == (2.0, 5.0, 1.0, 1.0, 4)


# --- stateful.py bucket rollup: commutative-class -------------------------------


def test_bucket_state_fold_duplicate_across_triggers_matches_one_shot():
    """The per-bucket (cnt, min, max, sum) merge is order-insensitive
    over the input multiset: a duplicate sample split across triggers
    reaches the same standing aggregates as the one-shot fold (sum's
    float accumulation is exact here — planted values are integers)."""
    from dariadb_spark.streaming.stateful import _make_state_fold

    fold = _make_state_fold(bucket_width=1000)
    rows = [(100, 2.0, 0), (200, 4.0, 0), (200, 4.0, 0), (1100, 8.0, 0)]

    def run(batches):
        st = _FakeState()
        for b in batches:
            list(fold((5,), iter([_meas_batch(b)]), st))
        buckets, cnts, mins, maxs, sums = st.get
        return (
            list(buckets), list(cnts), list(mins), list(maxs), list(sums)
        )

    assert run([rows]) == run([rows[:2], rows[2:]])
    buckets, cnts, mins, maxs, sums = run([rows])
    assert buckets == [0, 1000]
    assert cnts == [3, 1]          # the duplicate counts as a sample
    assert sums == [10.0, 8.0]


# --- sketch.py HLL register merge: commutative-class ----------------------------


def test_hll_fold_duplicate_across_triggers_is_idempotent():
    """Register max-merge is idempotent: re-delivering the identical
    (idx, rho) occurrences in a later trigger leaves the registers
    byte-identical (only the update ordinal advances)."""
    from dariadb_spark.streaming.sketch import _hll_fold

    def occ(pairs):
        return pd.DataFrame({
            "idx": np.array([p[0] for p in pairs], dtype=np.int32),
            "rho": np.array([p[1] for p in pairs], dtype=np.int32),
        })

    st = _FakeState()
    list(_hll_fold(("en",), iter([occ([(0, 3), (5, 7), (0, 2)])]), st))
    upd1, regs1 = st.get[0], list(st.get[1])
    assert (regs1[0], regs1[5]) == (3, 7)
    # identical occurrences re-land: registers unchanged, ordinal bumps
    list(_hll_fold(("en",), iter([occ([(0, 3), (5, 7), (0, 2)])]), st))
    upd2, regs2 = st.get[0], list(st.get[1])
    assert regs2 == regs1
    assert upd2 == upd1 + 1
