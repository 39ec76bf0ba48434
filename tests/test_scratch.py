"""Scratch/localize hygiene guards (VERDICT r6 items 1-2)."""

import os

import pytest

from dariadb_spark.streaming.scratch import (
    MAX_LOCALIZED_ROWS,
    localize_and_cleanup,
    parity_stream_partitions,
)


def test_localize_returns_rows_and_removes_scratch(spark, tmp_path):
    scratch = tmp_path / "scratch"
    scratch.mkdir()
    (scratch / "marker").write_text("x")
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    out = localize_and_cleanup(spark, df.orderBy("id"), str(scratch))
    assert [r.v for r in out.collect()] == [0, 2, 4, 6, 8]
    assert not scratch.exists()


def test_localize_rejects_oversized_frame(spark, tmp_path):
    """A result beyond the ceiling must raise loudly — and the limit
    bounds what is fetched, so the failure is a clean ValueError, not a
    driver OOM."""
    scratch = tmp_path / "scratch2"
    scratch.mkdir()
    big = spark.range(50)  # ceiling shrunk via max_rows for test speed
    with pytest.raises(ValueError, match="exceeds 10 rows"):
        localize_and_cleanup(spark, big, str(scratch), max_rows=10)
    # cleanup still ran despite the raise
    assert not scratch.exists()
    assert MAX_LOCALIZED_ROWS == 100_000  # documented production ceiling


def test_localize_drops_sink_view(spark, tmp_path):
    scratch = tmp_path / "scratch3"
    scratch.mkdir()
    spark.range(3).createOrReplaceTempView("localize_guard_view")
    localize_and_cleanup(
        spark, spark.range(3), str(scratch), "localize_guard_view"
    )
    assert not spark.catalog.tableExists("localize_guard_view")


def test_parity_stream_partitions_scopes_and_restores(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with parity_stream_partitions(spark, 4):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    # restored even when the body raises
    with pytest.raises(RuntimeError):
        with parity_stream_partitions(spark, 4):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
