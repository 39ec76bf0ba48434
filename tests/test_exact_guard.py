"""The self-guarding HALF_UP closure (ext/exact.py, round 12 — VERDICT
r11 item 5): the narrow int64 form silently wraps past its ceiling; the
guarded form must swap to DECIMAL(38)/HUGEINT per row EXACTLY at that
ceiling, agree across engines, and carry token_budget_plan's output
expressions cleanly through corpus sizes the narrow form corrupts.
"""

from __future__ import annotations

import duckdb
import pytest

from dariadb_spark.ext.exact import (
    ratio_ceiling,
    ratio_round_duck,
    ratio_round_guarded_duck,
    ratio_round_guarded_spark,
    ratio_round_spark,
)


def _half_up_two_step(a: int, b: int, d: int) -> float:
    """The reference BOTH engines compute: the exact integer quotient on
    the 10^d grid, converted to double, then divided by double 10^d —
    two IEEE roundings, identical op sequence in Spark and DuckDB."""
    q = (2 * a * 10**d + b) // (2 * b)
    return float(q) / float(10**d)


@pytest.mark.parametrize("d", [4, 6])
def test_guarded_closure_exact_at_the_ceiling(spark, d):
    """At C the narrow branch runs; at C+1 and far beyond, the wide
    branch — all rows exact vs the two-step reference in BOTH engines,
    across the boundary with no gap."""
    c = ratio_ceiling(d)
    cases = [
        (c - 1, 3), (c, 3), (c + 1, 3), (c + 12345, 7),
        (10 * c, 11), (c, c), (c + 1, c + 1), (4 * c, 2 * c + 1),
    ]
    for a, b in cases:
        gs = ratio_round_guarded_spark(str(a), str(b), d)
        sv = spark.sql(f"SELECT {gs} AS v").collect()[0].v
        gd = ratio_round_guarded_duck(str(a), str(b), d)
        dv = duckdb.sql(f"SELECT {gd} AS v").fetchone()[0]
        ref = _half_up_two_step(a, b, d)
        assert sv == dv == ref, (a, b, d, sv, dv, ref)


def test_narrow_form_overflows_loudly_past_ceiling_spark(spark):
    """Documents the hazard the guard removes: past the true overflow
    point (the guard's ceiling is deliberately a shade conservative),
    Spark's narrow int64 form dies with ARITHMETIC_OVERFLOW (ANSI mode,
    the Spark 4 default — a 100 TB run FAILS rather than corrupting;
    with ANSI off it would wrap silently) while the guarded form keeps
    computing exactly."""
    from pyspark.errors import ArithmeticException
    from py4j.protocol import Py4JJavaError

    d = 6
    a, b = 10**13, 3  # 2*a*10^6 = 2e19 > 2^63-1
    with pytest.raises((ArithmeticException, Py4JJavaError)):
        spark.sql(
            f"SELECT {ratio_round_spark(str(a), str(b), d)} AS v"
        ).collect()
    guarded = spark.sql(
        f"SELECT {ratio_round_guarded_spark(str(a), str(b), d)} AS v"
    ).collect()[0].v
    assert guarded == _half_up_two_step(a, b, d)


def test_narrow_duck_is_widened_by_hugeint_not_wrapped():
    """DuckDB's BIGINT arithmetic overflows LOUDLY (OutOfRange), never
    silently — the oracle side needs the guard for ENGINE AGREEMENT on
    which branch computes, not for wrap protection."""
    d = 6
    a, b = 10**13, 3  # 2*a*10^6 = 2e19 > 2^63-1
    with pytest.raises(duckdb.OutOfRangeException):
        duckdb.sql(
            "SELECT "
            + ratio_round_duck(f"CAST({a} AS BIGINT)", str(b), d)
            + " AS v"
        ).fetchone()


def test_token_budget_verdict_on_beyond_ceiling_worksheet(spark):
    """The operator-level claim (VERDICT r11 'one operator exercising
    the auto-scaled path'): token_budget_plan's output projection over
    a planted worksheet whose token totals sit PAST the narrow int64
    ceiling (a ~1e15-token source ≈ 4 PB of text) — epochs and
    budget_share come out exact against pure-Python integer replay,
    and the same worksheet replays identically in DuckDB through the
    registered oracle's guarded expressions."""
    from dariadb_spark.ext.exact import ratio_round_guarded_duck as _rrg_d
    from dariadb_spark.ext.sampling import _budget_verdict

    rows = [
        # (source, n_tokens, cap_tokens, alloc0, alloc2, budget, excess)
        ("huge", 10**15, 2 * 10**15, 9 * 10**14, 13 * 10**14 + 7,
         18 * 10**14, 0),
        ("big", 5 * 10**12, 10**13, 45 * 10**11, 9 * 10**12 + 3,
         18 * 10**14, 0),
        ("small", 10**6, 2 * 10**6, 9 * 10**5, 15 * 10**5,
         18 * 10**14, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "source string, n_tokens long, cap_tokens long, alloc0 long,"
        " alloc2 long, budget long, excess long",
    )
    got = {r.source: r for r in _budget_verdict(df).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE w (source VARCHAR, n_tokens BIGINT,"
        " cap_tokens BIGINT, alloc0 BIGINT, alloc2 BIGINT,"
        " budget BIGINT, excess BIGINT)"
    )
    con.executemany("INSERT INTO w VALUES (?, ?, ?, ?, ?, ?, ?)", rows)
    oracle = {
        r[0]: r
        for r in con.execute(
            f"""SELECT source, n_tokens, cap_tokens, alloc0,
                       alloc2 AS alloc,
                       {_rrg_d('alloc2', 'n_tokens', 4)} AS epochs,
                       CAST(alloc2 = cap_tokens AS INT) AS capped,
                       {_rrg_d('alloc2', 'budget', 6)} AS budget_share,
                       excess AS unplaced
                FROM w ORDER BY source"""
        ).fetchall()
    }
    for source, n_tokens, _cap, _a0, alloc2, budget, _x in rows:
        ref_epochs = _half_up_two_step(alloc2, n_tokens, 4)
        ref_share = _half_up_two_step(alloc2, budget, 6)
        g = got[source]
        assert (g.epochs, g.budget_share) == (ref_epochs, ref_share), source
        o = oracle[source]
        assert (o[5], o[7]) == (ref_epochs, ref_share), source
        assert tuple(g) == tuple(o), source


def test_guarded_closure_batched_fuzz(spark):
    """300 deterministic (a, b, d) cases straddling the ceiling —
    magnitudes from 1 to 1e18 — evaluated as COLUMNS in one DataFrame
    pass per engine (exercising codegen, not constant folding), against
    the exact-integer two-step reference."""
    import random

    import duckdb

    from dariadb_spark.ext.exact import (
        ratio_round_guarded_duck,
        ratio_round_guarded_spark,
    )

    rng = random.Random(12)
    cases = []
    for _ in range(300):
        mag_a = 10 ** rng.randrange(0, 19)
        mag_b = 10 ** rng.randrange(0, 13)
        a = rng.randrange(1, mag_a + 1)
        b = rng.randrange(1, mag_b + 1)
        # keep the scaled quotient inside int64 (the documented output
        # contract): a/b * 10^d <= ~9.2e18
        d = rng.choice([2, 4, 6])
        if a // b > (2**63 - 1) // (2 * 10**d):
            a = b * rng.randrange(1, 10**6)
        cases.append((a, b, d))

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b, _d) in enumerate(cases)],
        "i long, a long, b long",
    )
    # one column per distinct d, compared per row by its case's d
    by_d: dict[int, list[int]] = {}
    for i, (_a, _b, d) in enumerate(cases):
        by_d.setdefault(d, []).append(i)
    sel = ["i", "a", "b"] + [
        ratio_round_guarded_spark("a", "b", d) + f" AS v{d}" for d in by_d
    ]
    got = {r.i: r for r in df.selectExpr(*sel).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE c (i BIGINT, a BIGINT, b BIGINT)")
    con.executemany(
        "INSERT INTO c VALUES (?, ?, ?)",
        [(i, a, b) for i, (a, b, _d) in enumerate(cases)],
    )
    dsel = "SELECT i, " + ", ".join(
        ratio_round_guarded_duck("a", "b", d) + f" AS v{d}" for d in by_d
    ) + " FROM c ORDER BY i"
    duck = {r[0]: r for r in con.execute(dsel).fetchall()}
    dpos = {d: k + 1 for k, d in enumerate(by_d)}

    for i, (a, b, d) in enumerate(cases):
        ref = float((2 * a * 10**d + b) // (2 * b)) / float(10**d)
        sv = got[i][f"v{d}"]
        dv = duck[i][dpos[d]]
        assert sv == dv == ref, (i, a, b, d, sv, dv, ref)


# --- the finite-int64 screen guard (round 17, VERDICT r16 item 6) ----------

def test_finite_int64_pred_filters_identically(spark):
    """The shared screen guard keeps exactly the same rows on both
    engines for every member of the doctored-input class (NaN, ±Inf,
    ±1e19, the in-range extremes), BEFORE any BIGINT cast can run."""
    from dariadb_spark.ext.exact import finite_int64_pred

    vals = [
        "double('NaN')", "double('Infinity')", "double('-Infinity')",
        "1e19", "-1e19", "9e18", "-9e18", "123.4", "0.0",
    ]
    tagged = ", ".join(f"({i}, {v})" for i, v in enumerate(vals))
    pred = finite_int64_pred("v")
    got_spark = sorted(
        r.i for r in spark.sql(
            f"SELECT i FROM VALUES {tagged} AS t(i, v) WHERE {pred}"
        ).collect()
    )
    duck_vals = tagged.replace("double('NaN')", "'NaN'::DOUBLE").replace(
        "double('Infinity')", "'Infinity'::DOUBLE"
    ).replace("double('-Infinity')", "'-Infinity'::DOUBLE")
    got_duck = sorted(
        r[0] for r in duckdb.sql(
            f"SELECT i FROM (VALUES {duck_vals}) t(i, v) WHERE {pred}"
        ).fetchall()
    )
    assert got_spark == got_duck == [5, 6, 7, 8]


def test_value_histogram_screens_doctored_input_identically(spark):
    """The histogram's guarded bucket pipeline produces identical rows
    on both engines over doctored input. The UNGUARDED pipeline is the
    silent-wrong divergence the guard exists for — and the culprit is
    ``floor``, not the cast: Spark's floor(double) returns BIGINT and
    SATURATES silently even under ANSI (NaN→0, 1e21→int64-max; probed,
    pinned below), while DuckDB's floor stays DOUBLE so its cast
    RAISES. One engine fabricates buckets, the other dies."""
    from dariadb_spark.ext.exact import finite_int64_pred
    from dariadb_spark.ext.timeseries import HIST_WIDTH

    rows = "(1e19), (double('NaN')), (double('-Infinity')), (123.4), (-77.0), (9e18)"
    duck_rows = rows.replace("double('NaN')", "'NaN'::DOUBLE").replace(
        "double('-Infinity')", "'-Infinity'::DOUBLE"
    )
    core = (
        f"SELECT CAST(floor(value / {HIST_WIDTH}) AS BIGINT) AS bucket,"
        " count(*) AS n FROM {src} WHERE " + finite_int64_pred("value")
        + " GROUP BY bucket ORDER BY bucket"
    )
    got_spark = [
        tuple(r) for r in spark.sql(
            core.format(src=f"VALUES {rows} AS t(value)")
        ).collect()
    ]
    got_duck = duckdb.sql(
        core.format(src=f"(VALUES {duck_rows}) t(value)")
    ).fetchall()
    assert got_spark == got_duck
    assert len(got_spark) == 3  # -77, 123.4, 9e18 buckets survive

    unguarded = (
        f"SELECT CAST(floor(value / {HIST_WIDTH}) AS BIGINT) AS bucket"
        " FROM {src} ORDER BY bucket"
    )
    # Spark: floor() has already saturated, so the cast is a no-op and
    # the doctored rows come back as FABRICATED buckets (NaN→0,
    # -Inf→int64-min, 1e19→2e17) — silent and wrong
    fabricated = [
        r.bucket for r in spark.sql(
            unguarded.format(src=f"VALUES {rows} AS t(value)")
        ).collect()
    ]
    assert -(2**63) in fabricated and 0 in fabricated  # -Inf and NaN
    # DuckDB: the same pipeline RAISES — the cross-engine divergence
    with pytest.raises(duckdb.Error):
        duckdb.sql(unguarded.format(src=f"(VALUES {duck_rows}) t(value)")).fetchall()


def test_cents_recipe_envelope_and_identical_failure(spark):
    """The money rule's envelope, pinned: inside |price| < 9.2e16 both
    engines produce the IDENTICAL int64 cents (same double round, same
    cast) — and past the envelope both RAISE (duck's cast always
    checks; Spark's does via ANSI, the Spark 4 default), so the
    aggregate class fails identically rather than silently filtering.
    This is the class decision for why the cents recipes do NOT carry
    the screen guard (ext/exact.py)."""
    from pyspark.errors import ArithmeticException
    from py4j.protocol import Py4JJavaError

    inside = ["90000000000000.0", "9e15", "9.2e15", "92160000000000000.0"]
    expr = "CAST(round(p * 100) AS BIGINT)"
    for p in inside:
        s = spark.sql(f"SELECT {expr} AS c FROM VALUES ({p}) t(p)").collect()[0].c
        d = duckdb.sql(f"SELECT {expr} AS c FROM (VALUES ({p}::DOUBLE)) t(p)").fetchone()[0]
        assert s == d, p
    for p in ("1e17", "-1e17"):
        with pytest.raises((ArithmeticException, Py4JJavaError)):
            spark.sql(f"SELECT {expr} AS c FROM VALUES ({p}) t(p)").collect()
        with pytest.raises(duckdb.Error):
            duckdb.sql(f"SELECT {expr} AS c FROM (VALUES ({p}::DOUBLE)) t(p)").fetchone()
