"""Streaming exact dedup at ingest (streaming/dedup.py, staged r13):
Spark's native dropDuplicates state store, pinned against the batch
DISTINCT oracle and a planted cross-micro-batch duplicate."""

from __future__ import annotations


def test_streaming_dedup_matches_batch_distinct(spark, oracle_sf_dir):
    from dariadb_spark.streaming.dedup import (
        STREAMING_EXACT_DEDUP_SQL,
        streaming_exact_dedup_parity,
    )
    from tests.parity import duckdb_connection

    got = [
        tuple(r)
        for r in streaming_exact_dedup_parity(spark, oracle_sf_dir)
        .collect()
    ]
    assert got, "no survivors returned"
    con = duckdb_connection(oracle_sf_dir)
    oracle = [
        tuple(r) for r in con.execute(STREAMING_EXACT_DEDUP_SQL).fetchall()
    ]
    assert got == oracle
    # survivors never exceed the input (the sf0.01 fixture happens to
    # hold zero exact text duplicates — the cross-batch planted test
    # below is what proves drops actually happen)
    n_docs = con.execute(
        "SELECT count(*) FROM documents WHERE text IS NOT NULL"
    ).fetchone()[0]
    assert len(got) <= n_docs


def test_streaming_dedup_crosses_micro_batches(spark, tmp_path):
    """The duplicate pair is split across the even/odd parquet drops
    (doc_ids 2 and 5), so with one file per trigger only CROSS-BATCH
    state can dedup it — exactly what dropDuplicates' state store is
    for. One survivor must remain; unique docs all survive."""
    from dariadb_spark.streaming.dedup import streaming_exact_dedup_parity

    dup = "the same exact text in two drops"
    rows = [
        (2, dup, "en", "a", len(dup)),
        (5, dup, "en", "b", len(dup)),
        (4, "unique one", "en", "a", 10),
        (7, "unique two", "en", "b", 10),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(d + "/documents.parquet")
    survivors = [
        tuple(r) for r in streaming_exact_dedup_parity(spark, d).collect()
    ]
    n_chars = {n for _h, n in survivors}
    assert len(survivors) == 3  # dup pair collapsed to one
    assert n_chars == {len(dup), 10}
