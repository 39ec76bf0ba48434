"""Incrementally-maintained rollups — the reference's scheme-level
downsampling (scheme/scheme.cpp derived ``param.average.hour`` series)
kept up to date ON INGEST, rendered with dariadb's own storage idea:

* each streaming micro-batch appends ALGEBRAIC PARTIAL aggregates
  (cnt/sum/min/max per (id, bucket)) to an append-only parquet dir —
  the WAL layer (storage/wal/wal_manager.cpp analog: raw, unmerged,
  bounded-size appends);
* readers MERGE ON READ: partials re-aggregate associatively, so the
  view is always exact regardless of how many partials a bucket has
  (storage/readers.cpp MergeSortReader analog);
* ``compact_rollup`` folds all partials into one partial per bucket —
  the Dropper's WAL→page conversion (storage/dropper.cpp analog) —
  shrinking read amplification without changing any value.

At 100 TB: per-batch partials are tiny (one row per touched (id,
bucket)); merge-on-read cost grows with partial count, which compaction
bounds — the same contract dariadb's layered LSM makes. avg is NEVER
stored, always derived from (sum, cnt) at read time, so partials stay
mergeable (the round(sum,6)/count parity recipe applies at the final
merge only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from dariadb_spark.operators.downsample import MS

_MEAS_DDL = "id bigint, time bigint, value double, flag bigint"
_PARTIAL_COLS = ("id", "bucket_ms", "_cnt", "_sum", "_min", "_max")


def _partials(batch: DataFrame, width_ms: int) -> DataFrame:
    return (
        batch.groupBy(
            "id",
            (F.col("time") - F.col("time") % width_ms).alias("bucket_ms"),
        )
        .agg(
            F.count("value").alias("_cnt"),
            F.sum("value").alias("_sum"),
            F.min("value").alias("_min"),
            F.max("value").alias("_max"),
        )
    )


def streaming_rollup(
    spark: SparkSession,
    data_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    interval: str = "hour",
) -> StreamingQuery:
    """Maintain the append-only partials layer from the ingest stream.
    Exactly-once per micro-batch via the streaming checkpoint; each
    batch writes one partial row per touched (id, bucket)."""
    width_ms = MS[interval]
    stream = (
        spark.readStream.schema(_MEAS_DDL)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(data_dir)
    )

    def write_partials(batch: DataFrame, batch_id: int) -> None:
        _partials(batch, width_ms).write.mode("append").parquet(rollup_dir)

    return (
        stream.writeStream.foreachBatch(write_partials)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Merge-on-read: re-aggregate partials associatively into the exact
    rollup block (same columns/values as the batch ``downsample()``)."""
    p = spark.read.parquet(rollup_dir)
    return (
        p.groupBy("id", "bucket_ms")
        .agg(
            F.sum("_cnt").alias("cnt"),
            (F.round(F.sum("_sum"), 6) / F.sum("_cnt")).alias("avg_value"),
            F.min("_min").alias("min_value"),
            F.max("_max").alias("max_value"),
            F.round(F.sum("_sum"), 4).alias("sum_value"),
        )
        .orderBy("id", "bucket_ms")
    )


def compact_rollup(spark: SparkSession, rollup_dir: str) -> None:
    """Fold all partials into one partial per (id, bucket) — raw moments
    kept raw so the layer stays mergeable. Write-new-then-swap keeps the
    dir readable at every moment (crash before swap = stale-but-valid)."""
    import shutil
    import uuid

    p = spark.read.parquet(rollup_dir)
    merged = (
        p.groupBy("id", "bucket_ms")
        .agg(
            F.sum("_cnt").alias("_cnt"),
            F.sum("_sum").alias("_sum"),
            F.min("_min").alias("_min"),
            F.max("_max").alias("_max"),
        )
        .select(*_PARTIAL_COLS)
    )
    tmp = f"{rollup_dir}__compact_{uuid.uuid4().hex[:8]}"
    merged.repartition(1).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(rollup_dir)
    shutil.move(tmp, rollup_dir)
