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


def test_streaming_dedup_watermarked_bounded_state(spark, tmp_path):
    """The documented 100 TB configuration (VERDICT r12 item 6 — the
    claim moves from prose to pinned): ``dropDuplicatesWithinWatermark``
    over the ingest-time column. Spark's actual state machine, probed
    and pinned here: (a) a re-fetch arriving within the horizon is
    dropped by LIVE state; (b) once the watermark passes the original's
    ``fetch_ts + horizon`` its state row is EVICTED (bounded memory —
    the point of the configuration), so a much-later re-fetch — whose
    fresh fetch_ts means the late filter never touches it — lands
    AGAIN; (c) one batch DISTINCT over the landed table (the
    ``ext_dedup_incremental`` backstop's job) restores global
    exactness. Files fold one per micro-batch so the watermark actually
    advances between arrivals."""
    import time

    from dariadb_spark.streaming.dedup import streaming_exact_dedup
    from dariadb_spark.streaming.scratch import (
        await_parity_termination,
        parity_stream_partitions,
    )

    t0 = 1_704_067_200_000  # ms
    d = str(tmp_path / "docs")
    ddl = (
        "doc_id long, text string, lang string, source string,"
        " n_chars long, fetch_ts timestamp"
    )

    def drop(rows, sub):
        spark.createDataFrame(
            [(i, t, "en", "s", len(t), ts) for i, t, ts in rows], ddl
        ).coalesce(1).write.parquet(f"{d}/{sub}")

    import datetime as dt

    def ts(ms):
        return dt.datetime.fromtimestamp(ms / 1000, dt.timezone.utc)

    X, Y = "doc X body", "doc Y body"
    # batch 1: originals X and Y
    drop([(1, X, ts(t0)), (2, Y, ts(t0))], "b1")
    time.sleep(1.05)
    # batch 2: re-fetch of X five seconds later — INSIDE the 10 s
    # horizon, state still live → deduped; plus a watermark advancer
    drop([(3, X, ts(t0 + 5_000)), (4, "advancer doc", ts(t0 + 3_600_000))],
         "b2")
    time.sleep(1.05)
    # batch 3: spacer — the advanced watermark (t0+1h−10s) now evicts
    # X and Y's state rows at this batch's end
    drop([(5, "spacer doc", ts(t0 + 3_600_001))], "b3")
    time.sleep(1.05)
    # batch 4: re-fetch of X two hours later with a FRESH fetch_ts —
    # state evicted, not late → lands again (the bounded-state trade)
    drop([(6, X, ts(t0 + 7_200_000))], "b4")

    qname = "dedup_wm_r13"
    with parity_stream_partitions(spark):
        q = streaming_exact_dedup(
            spark, d, qname, max_files_per_trigger=1,
            watermark="10 seconds",
        )
    await_parity_termination(q)
    landed = [tuple(r) for r in spark.table(qname).collect()]
    import hashlib

    def h60(text):
        return int(hashlib.md5(text.encode()).hexdigest()[:15], 16)

    by_h = {}
    for h, _n in landed:
        by_h[h] = by_h.get(h, 0) + 1
    # X landed TWICE (original + post-eviction re-fetch), the in-horizon
    # re-fetch was deduped; Y/advancer/spacer once each
    assert by_h[h60(X)] == 2, landed
    assert by_h[h60(Y)] == 1
    assert by_h[h60("advancer doc")] == 1
    assert by_h[h60("spacer doc")] == 1
    assert len(landed) == 5
    # the batch backstop: one DISTINCT restores global exactness
    backstop = spark.table(qname).dropDuplicates(["h"]).count()
    assert backstop == 4
