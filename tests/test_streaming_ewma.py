"""Streaming EWMA maintenance (streaming/ewma.py, staged r14): the
per-series trailing-buffer state carry, pinned against the batch
``ext_ewma`` oracle and a planted cross-micro-batch buffer handoff."""

from __future__ import annotations


def test_streaming_ewma_matches_batch_window(spark, oracle_sf_dir):
    """The standing smoothed log hash-matches the batch EWMA oracle —
    the median-ts cut lands every series' history on both sides, so the
    trailing buffer genuinely carries across micro-batches."""
    from dariadb_spark.streaming.ewma import (
        STREAMING_EWMA_SQL,
        streaming_ewma_parity,
    )
    from tests.parity import compare, duckdb_connection

    con = duckdb_connection(oracle_sf_dir)
    res = compare(
        "streaming_ewma_parity",
        streaming_ewma_parity(spark, oracle_sf_dir),
        con,
        STREAMING_EWMA_SQL,
    )
    assert res.ok, res.problems


def test_streaming_ewma_cross_batch_buffer(spark, tmp_path):
    """Three hand-written micro-batches over one 30-sample series: the
    streaming output must be IDENTICAL (float-bit level) to the batch
    ``ewma_op`` over the union — the 20-deep buffer spans all three
    batches, a same-time LWW duplicate inside one batch dedups exactly
    as the batch plan does, and the head rows see the same partial-
    weight denominators."""
    from dariadb_spark.ext.timeseries import ewma_op
    from dariadb_spark.streaming.ewma import (
        ewma_from_log,
        streaming_ewma_log,
    )
    from dariadb_spark.streaming.scratch import await_parity_termination

    t0 = 1_704_067_200_000
    step = 60_000
    rows = [(1, t0 + i * step, float((i * 37) % 101), 1) for i in range(30)]
    # same-time LWW duplicate in batch 1: the (value, flag) max wins
    rows.append((1, t0 + 3 * step, -5.0, 9))  # loses to value at i=3
    ddl = "id long, time long, value double, flag long"

    def drop(sl, mode):
        spark.createDataFrame(sl, ddl).coalesce(1).write.mode(mode).parquet(
            str(tmp_path / "meas")
        )

    drop([r for r in rows if r[1] <= t0 + 9 * step], "overwrite")
    drop([r for r in rows if t0 + 9 * step < r[1] <= t0 + 19 * step], "append")
    drop([r for r in rows if r[1] > t0 + 19 * step], "append")

    qname = "ewma_cross_batch_r14"
    q = streaming_ewma_log(
        spark, str(tmp_path / "meas"), qname, max_files_per_trigger=1
    )
    await_parity_termination(q)
    got = [
        tuple(r)
        for r in ewma_from_log(spark.table(qname)).collect()
    ]
    meas = spark.createDataFrame(rows, ddl)
    want = [
        tuple(r)
        for r in ewma_op(meas, None, t0, t0 + 30 * step, 0)
        .orderBy("id", "time")
        .collect()
    ]
    assert len(got) == 30  # duplicate collapsed, every sample emitted once
    assert got == want
