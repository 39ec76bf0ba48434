"""Incrementally-maintained sketches over a document stream.

The batch CMS (ext/sketches.py) is an additive cell table — which makes
it exactly the shape Structured Streaming maintains natively: a
complete-mode streaming aggregation whose state IS the sketch
(``depth × width`` ≤ 1024 rows, bounded forever, no watermark needed).
Every micro-batch folds its token counts into the standing cells, so
the heavy-hitter summary is queryable mid-ingest without ever
re-scanning the corpus — the sketch equivalent of the incremental
rollup pipeline (streaming/rollup.py), with O(1)-sized state instead
of O(buckets).

Pytest-only this round (the driver window is full); the batch-equality
contract (streamed cells == one-shot batch cells over the same corpus,
regardless of how ingestion was batched) is pinned in
tests/test_sketches.py and is the oracle a driver-checked upgrade
would replay.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

#: matches the documents fixture; a production ingest would carry the
#: same columns out of its landing zone.
_DOCS_DDL = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def streaming_cms_cells(
    spark: SparkSession, docs_dir: str, query_name: str = "cms_live"
) -> StreamingQuery:
    """Maintain the count-min cell table incrementally over a document
    stream (availableNow here; a production stream runs unbounded).

    The plan is the one-pass build bench_stress measures: bigram
    occurrences → depth fan-out (explode generator) → groupBy(depth,
    bucket) — map-side combine collapses each micro-batch's partition
    to ≤ 1024 cells before the state update, so per-batch shuffle
    volume is O(partitions × width) no matter how large the batch.
    Complete-mode memory sink: the result table is the whole sketch
    (≤ 1024 rows), re-emitted per batch — at scale swap the sink for a
    compacted parquet/Delta cell table; the aggregation is unchanged."""
    from dariadb_spark.ext.sketches import (
        _BG_SPARK,
        CMS_DEPTH,
        CMS_WIDTH,
    )
    from dariadb_spark.ext.hashes import _h60_spark

    fanout = ", ".join(f"{d}L" for d in range(CMS_DEPTH))
    cell = (
        _h60_spark("concat(cast(depth AS string), ':', bg)")
        + f" % {CMS_WIDTH}"
    )
    stream = (
        spark.readStream.schema(_DOCS_DDL)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(docs_dir)
    )
    cells = (
        stream.where("size(split(text, ' ')) >= 2")
        .selectExpr(f"explode({_BG_SPARK}) AS bg")
        .selectExpr(f"explode(array({fanout})) AS depth", "bg")
        .selectExpr("depth", f"{cell} AS bucket")
        .groupBy("depth", "bucket")
        .count()
    )
    return (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
