"""Streaming transition-log maintenance (streaming/markov.py, staged
r13): the per-user last-event state carry, pinned against the batch
``ext_event_markov`` oracle and a planted cross-micro-batch handoff."""

from __future__ import annotations

import datetime as dt


def test_streaming_markov_matches_batch_matrix(spark, oracle_sf_dir):
    """The standing transition log's matrix hash-matches the batch
    Markov oracle — the fixture split lands users on both sides of the
    median-ts cut, so the cross-batch carry is genuinely exercised."""
    from dariadb_spark.streaming.markov import (
        STREAMING_MARKOV_SQL,
        streaming_markov_parity,
    )
    from tests.parity import compare, duckdb_connection

    con = duckdb_connection(oracle_sf_dir)
    res = compare(
        "streaming_markov_parity",
        streaming_markov_parity(spark, oracle_sf_dir),
        con,
        STREAMING_MARKOV_SQL,
    )
    assert res.ok, res.problems


def test_streaming_markov_cross_batch_carry(spark, tmp_path):
    """Three hand-written micro-batches: a user whose consecutive
    events arrive in different batches must still emit the transition
    exactly once (the state carry), and a user silent for a whole
    batch must resume from its carried last type."""
    from dariadb_spark.streaming.markov import (
        matrix_from_log,
        streaming_transition_log,
    )
    from dariadb_spark.streaming.scratch import await_parity_termination

    t0 = dt.datetime(2024, 1, 1)
    ddl = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )

    def drop(rows, mode):
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode(
            mode
        ).parquet(str(tmp_path / "events"))

    # batch 1: u1 [A], u2 [A, B]
    drop(
        [
            (0, t0, 1, "A", 0.0, "{}"),
            (1, t0, 2, "A", 0.0, "{}"),
            (2, t0 + dt.timedelta(seconds=1), 2, "B", 0.0, "{}"),
        ],
        "overwrite",
    )
    # batch 2: u1 [B]  (cross-batch A→B), u2 silent
    drop([(3, t0 + dt.timedelta(seconds=2), 1, "B", 0.0, "{}")], "append")
    # batch 3: u2 [C]  (resumes from carried B → B→C), u1 [A] (B→A)
    drop(
        [
            (4, t0 + dt.timedelta(seconds=3), 2, "C", 0.0, "{}"),
            (5, t0 + dt.timedelta(seconds=4), 1, "A", 0.0, "{}"),
        ],
        "append",
    )
    q = streaming_transition_log(
        spark,
        str(tmp_path / "events"),
        query_name="markov_carry_test",
        max_files_per_trigger=1,
    )
    await_parity_termination(q)
    got = {
        (r.event_type, r.next_type, r.cnt, r.p_next)
        for r in matrix_from_log(spark.table("markov_carry_test")).collect()
    }
    spark.catalog.dropTempView("markov_carry_test")
    assert got == {
        ("A", "B", 2, 1.0),  # u1 cross-batch + u2 in-batch
        ("B", "C", 1, 0.5),  # u2 resumed from its carried last type
        ("B", "A", 1, 0.5),  # u1 batch-3 continuation
    }, got
