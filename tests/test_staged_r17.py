"""Staged round-17 operators: parity + planted closed-form fixtures +
property tests (the staging discipline every late operator goes through
BEFORE its registration round — registry.py's staged-count comment is
the source of truth for what is staged)."""

from __future__ import annotations

# ARCHIVAL TIER (r20, VERDICT r19 item 2): every operator this module
# stages has long since REGISTERED, so its oracle parity and plan shape
# are re-proven every run by the registered-surface sweeps
# (test_oracle_parity, test_plans); the planted closed-form depth here
# is opt-in so the default suite fits the driver harness's pytest
# budget. DARIADB_SLOW_TESTS=1 (the round-close evidence tier) runs it.
import os as _os

import pytest as _pytest

pytestmark = _pytest.mark.skipif(
    not _os.environ.get("DARIADB_SLOW_TESTS"),
    reason="archival staged-cohort depth; set DARIADB_SLOW_TESTS=1",
)


from decimal import ROUND_HALF_UP, Decimal

import pytest

from tests.parity import compare, duckdb_connection


def _r6(x: float) -> float:
    """Spark ``round(x, 6)`` replay: HALF_UP on the shortest decimal
    rendering of the double (BigDecimal.valueOf semantics)."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


# --- ext_series_seq_acf -----------------------------------------------------------

def test_series_seq_acf_parity_and_planted_alternating(spark, oracle_sf_dir):
    """Fixture parity vs the DuckDB oracle, then the planted closed
    form: an alternating ±1.0 series sampled once per hourly cell has
    ȳ = 0 (even n), so r_k = (−1)^k·(n−k)/n exactly; a constant series
    has zero variance and must be dropped."""
    from dariadb_spark.ext.timeseries import (
        SERIES_SEQ_ACF_SQL,
        series_seq_acf,
        series_seq_acf_op,
    )

    con = duckdb_connection(oracle_sf_dir)
    res = compare(
        "ext_series_seq_acf", series_seq_acf(spark, oracle_sf_dir), con,
        SERIES_SEQ_ACF_SQL,
    )
    assert res.ok, res.problems
    assert res.rows_spark == 75  # 15 ids × 5 lags

    n = 48
    rows = [(1, t * 3_600_000, 1.0 if t % 2 == 0 else -1.0, 0)
            for t in range(n)]
    rows += [(2, t * 3_600_000, 7.5, 0) for t in range(n)]  # zero variance
    meas = spark.createDataFrame(
        rows, "id long, time long, value double, flag long"
    )
    got = [
        tuple(r)
        for r in series_seq_acf_op(meas, None, 0, n * 3_600_000, 3_600_000, 5)
        .collect()
    ]
    expect = [
        (1, k, n, _r6((-1) ** k * (n - k) / n)) for k in range(1, 6)
    ]
    assert got == expect, (got, expect)


def test_series_seq_acf_short_series_null_lags(spark):
    """A series with fewer cells than the lag yields NULL acf for the
    out-of-range lags (no pairs), not a crash or a dropped row."""
    from dariadb_spark.ext.timeseries import series_seq_acf_op

    rows = [(1, 0, 1.0, 0), (1, 3_600_000, 3.0, 0),
            (1, 7_200_000, 2.0, 0)]  # n = 3 cells
    meas = spark.createDataFrame(
        rows, "id long, time long, value double, flag long"
    )
    got = {
        r.lag: r.acf
        for r in series_seq_acf_op(meas, None, 0, 10_800_000, 3_600_000, 5)
        .collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[3] is None and got[4] is None and got[5] is None
    assert got[1] is not None and got[2] is not None


def test_series_seq_acf_matches_python_reference(spark):
    """Property: on a deterministic pseudo-random integer series the
    operator equals a pure-Python exact-integer replay of the same
    formula (one sample per cell so yq is exact)."""
    from dariadb_spark.ext.timeseries import series_seq_acf_op

    n = 97
    vals = [((i * 1103515245 + 12345) % 2000 - 1000) / 100.0
            for i in range(n)]
    meas = spark.createDataFrame(
        [(7, i * 3_600_000, v, 0) for i, v in enumerate(vals)],
        "id long, time long, value double, flag long",
    )
    got = [
        tuple(r)
        for r in series_seq_acf_op(meas, None, 0, n * 3_600_000, 3_600_000, 5)
        .collect()
    ]
    y = [round(v * 100) for v in vals]
    s, q = sum(y), sum(v * v for v in y)
    den = n * n * q - n * s * s
    expect = []
    for k in range(1, 6):
        p = sum(y[i] * y[i - k] for i in range(k, n))
        a = sum(y[k:])
        b = sum(y[: n - k])
        num = n * n * p - n * s * (a + b) + (n - k) * s * s
        expect.append((7, k, n, _r6(num / den)))
    assert got == expect


# --- ext_orders_pareto --------------------------------------------------------

def test_orders_pareto_parity_and_boundary_inclusivity(spark, oracle_sf_dir):
    """Fixture parity vs the DuckDB oracle, then the planted boundary
    grid: revenues 80/15/5 land EXACTLY on the 80%% and 95%% lines, and
    the integer decision (5·cum ≤ 4·total) must keep the boundary
    member inside its class on both engines."""
    from dariadb_spark.ext.relational import (
        ORDERS_PARETO_SQL,
        orders_pareto,
        orders_pareto_op,
    )

    con = duckdb_connection(oracle_sf_dir)
    res = compare(
        "ext_orders_pareto", orders_pareto(spark, oracle_sf_dir), con,
        ORDERS_PARETO_SQL,
    )
    assert res.ok, res.problems
    assert res.rows_spark == 3

    import datetime

    d = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 10, "O", 0.80, d, "P"),
        (2, 20, "O", 0.15, d, "P"),
        (3, 30, "O", 0.05, d, "P"),
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    got = [tuple(r) for r in orders_pareto_op(orders).collect()]
    assert got == [
        ("A", 1, 80, 800000),
        ("B", 1, 15, 150000),
        ("C", 1, 5, 50000),
    ], got


def test_orders_pareto_matches_python_reference(spark):
    """Property: deterministic pseudo-random revenues vs a pure-Python
    integer replay of the rank → prefix-sum → class grid."""
    from dariadb_spark.ext.relational import orders_pareto_op

    import datetime

    d = datetime.datetime(2024, 1, 1)
    n = 400
    cents = [((i * 2654435761) % 9973) + 1 for i in range(n)]
    orders = spark.createDataFrame(
        [(i, i, "O", c / 100.0, d, "P") for i, c in enumerate(cents)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    got = [tuple(r) for r in orders_pareto_op(orders).collect()]

    total = sum(cents)
    order = sorted(range(n), key=lambda i: (-cents[i], i))
    cum = 0
    agg: dict[str, list[int]] = {}
    for i in order:
        cum += cents[i]
        cls = ("A" if 5 * cum <= 4 * total
               else "B" if 20 * cum <= 19 * total else "C")
        a = agg.setdefault(cls, [0, 0])
        a[0] += 1
        a[1] += cents[i]
    expect = [
        (c, agg[c][0], agg[c][1],
         (2 * agg[c][1] * 10**6 + total) // (2 * total))
        for c in sorted(agg)
    ]
    assert got == expect


# --- ext_session_concurrency --------------------------------------------------

def test_session_concurrency_parity_and_planted_overlap(
    spark, oracle_sf_dir
):
    """Fixture parity vs the DuckDB oracle, then the planted grid that
    pins all three contract points: starts-before-ends at a shared
    timestamp (closed interval), a zero-length single-event session,
    and a session SPANNING midnight carrying +1 into the next day's
    sweep."""
    from dariadb_spark.ext.analytics import (
        DAY_MS,
        SESSION_CONCURRENCY_SQL,
        session_concurrency,
        session_concurrency_op,
    )

    con = duckdb_connection(oracle_sf_dir)
    res = compare(
        "ext_session_concurrency",
        session_concurrency(spark, oracle_sf_dir), con,
        SESSION_CONCURRENCY_SQL,
    )
    assert res.ok, res.problems
    assert res.rows_spark > 0

    rows = [
        # user 1: one session [1000, 1600]
        (1, 1000, 1.0, 0), (1, 1600, 1.0, 0),
        # user 2: session [1600, 1700] — starts exactly when user 1
        # ends; closed-interval + starts-first ⇒ both active at 1600
        (2, 1600, 1.0, 0), (2, 1700, 1.0, 0),
        # user 3: single event ⇒ zero-length session, still peak 1
        (3, 5000, 1.0, 0),
        # user 4: session spanning midnight [DAY-1000, DAY+1000]
        (4, DAY_MS - 1000, 1.0, 0), (4, DAY_MS + 1000, 1.0, 0),
    ]
    meas = spark.createDataFrame(
        rows, "id long, time long, value double, flag long"
    )
    got = [tuple(r) for r in session_concurrency_op(meas).collect()]
    # day 0: starts at 1000,1600,5000,DAY-1000 (4), ends 1600,1700,5000
    # (3); peak 2 at t=1600 (user1 still active, user2 starting)
    # day 1: user 4's end only; carry = 4-3 = 1 active at midnight,
    # peak 1
    assert got == [
        (0, 4, 3, 2),
        (DAY_MS, 0, 1, 1),
    ], got


def test_session_concurrency_matches_python_reference(spark):
    """Property: pseudo-random event times for 6 users over 3 days vs a
    pure-Python replay (gap sessionization, sorted endpoint sweep with
    starts-before-ends, per-day max)."""
    from dariadb_spark.ext.analytics import (
        DAY_MS,
        SESSION_GAP_MS,
        session_concurrency_op,
    )

    times: dict[int, list[int]] = {}
    for u in range(6):
        ts, t = [], (u * 977) % 50_000
        for j in range(120):
            t += ((u * 31 + j * 2654435761) % (3 * SESSION_GAP_MS)) + 1
            ts.append(t)
        times[u] = ts
    meas = spark.createDataFrame(
        [(u, t, 1.0, 0) for u, ts in times.items() for t in ts],
        "id long, time long, value double, flag long",
    )
    got = [tuple(r) for r in session_concurrency_op(meas).collect()]

    sessions = []
    for u, ts in times.items():
        start = prev = ts[0]
        for t in ts[1:]:
            if t - prev > SESSION_GAP_MS:
                sessions.append((start, prev))
                start = t
            prev = t
        sessions.append((start, prev))
    events = sorted(
        [(s, 0) for s, _ in sessions] + [(e, 1) for _, e in sessions]
    )  # (t, kind): kind 0 = start sorts first at equal t
    cur = 0
    by_day: dict[int, list[int]] = {}
    i = 0
    while i < len(events):
        t = events[i][0]
        starts = ends = 0
        while i < len(events) and events[i][0] == t:
            if events[i][1] == 0:
                starts += 1
            else:
                ends += 1
            i += 1
        peak = cur + starts
        cur = cur + starts - ends
        d = by_day.setdefault(t // DAY_MS, [0, 0, 0])
        d[0] += starts
        d[1] += ends
        d[2] = max(d[2], peak)
    expect = [
        (day * DAY_MS, v[0], v[1], v[2]) for day, v in sorted(by_day.items())
    ]
    assert got == expect


# --- ext_part_clustering ------------------------------------------------------

def _li_frame(spark, rows):
    return spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O") for o, p in rows],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string",
    )


def test_part_clustering_parity_and_planted_graph(spark, oracle_sf_dir):
    """Fixture parity vs the definitional DuckDB oracle, then the
    planted graph: a K4 clique (every node cc = 1), a 4-leaf star
    (center cc = 0 with deg 4, an exact zero for a triangle-free
    neighborhood), and a path node (cc = 0, deg 2)."""
    from dariadb_spark.ext.relational import (
        PART_CLUSTERING_SQL,
        part_clustering,
        part_clustering_op,
    )

    con = duckdb_connection(oracle_sf_dir)
    res = compare(
        "ext_part_clustering", part_clustering(spark, oracle_sf_dir), con,
        PART_CLUSTERING_SQL,
    )
    assert res.ok, res.problems
    assert res.rows_spark == 20

    # every edge planted in TWO orders to clear support >= 2
    def orders_for(edges, base):
        rows = []
        for i, (x, y) in enumerate(edges):
            rows += [(base + 2 * i, x), (base + 2 * i, y),
                     (base + 2 * i + 1, x), (base + 2 * i + 1, y)]
        return rows

    from itertools import combinations

    k4 = list(combinations([1, 2, 3, 4], 2))          # clique
    star = [(10, leaf) for leaf in (11, 12, 13, 14)]  # triangle-free hub
    path = [(20, 21), (21, 22)]                       # deg-2, cc 0
    li = _li_frame(
        spark,
        orders_for(k4, 0) + orders_for(star, 100) + orders_for(path, 200),
    )
    got = {r.part: (r.deg, r.tri_cnt, r.clustering)
           for r in part_clustering_op(li).collect()}
    for v in (1, 2, 3, 4):
        assert got[v] == (3, 3, 1.0), got[v]
    assert got[10] == (4, 0, 0.0)
    assert got[21] == (2, 0, 0.0)


def test_part_clustering_matches_brute_force_random_graphs(spark):
    """Property: on random basket sets the oriented pipeline's per-node
    cc equals the brute-force neighborhood enumeration."""
    from itertools import combinations

    import numpy as np

    from dariadb_spark.ext.relational import (
        BASKET_MIN_SUP,
        part_clustering_op,
    )

    rng = np.random.default_rng(23)
    for trial in range(3):
        baskets = [
            sorted(rng.choice(30, size=rng.integers(2, 6), replace=False))
            for _ in range(60)
        ]
        rows = [(o, int(p)) for o, parts in enumerate(baskets) for p in parts]
        li = _li_frame(spark, rows)
        sup: dict[tuple[int, int], int] = {}
        for parts in baskets:
            for a, b in combinations(sorted(set(parts)), 2):
                sup[(a, b)] = sup.get((a, b), 0) + 1
        edges = {e for e, s in sup.items() if s >= BASKET_MIN_SUP}
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = []
        for v, nbrs in adj.items():
            d = len(nbrs)
            if d < 2:
                continue
            t = sum(
                1 for a, b in combinations(sorted(nbrs), 2)
                if (a, b) in edges
            )
            cc = _r6(2 * t / (d * (d - 1)))
            want.append((v, d, t, cc))
        want.sort(key=lambda r: (-r[3], -r[1], r[0]))
        got = [
            (r.part, r.deg, r.tri_cnt, r.clustering)
            for r in part_clustering_op(li).collect()
        ]
        assert got == want[:20], (trial, got[:5], want[:5])
