"""Bucketed-table co-location — the 100 TB layout that makes every
per-series operator shuffle-free.

Every reference verb shuffles (at most once) on ``id`` — as-of windows,
current-value, stat blocks, downsampling, moving windows, sessionization
(SCALE.md §2). Writing the measurements table bucketed by ``id`` and
sorted by ``(id, time)`` records that partitioning in the catalog, so
Catalyst elides the exchange entirely: groupBy("id") and
Window.partitionBy("id") plans contain ZERO Exchange nodes (proven in
tests/test_plans.py::test_bucketed_store_elides_shuffles), and
bucket-to-bucket joins co-locate without shuffling either side.

This is the Spark rendering of the reference's per-series chunk
clustering (storage/chunk.cpp — chunks are single-id; SURVEY.md §4): the
reference gets id-locality per chunk, a bucketed table gets it per task.

Plain path-based parquet cannot carry bucketing metadata — Spark only
trusts bucket layout recorded in a catalog table, hence ``saveAsTable``
(with an explicit ``path`` the table is external: data lives where the
store wants it, the catalog holds only layout metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    meas: DataFrame,
    table: str,
    n_buckets: int,
    path: str | None = None,
    bucket_col: str = "id",
    sort_cols: tuple[str, ...] = ("id", "time"),
) -> DataFrame:
    """Persist a measurements frame as a bucketed, sorted catalog table
    and return the re-read (bucket-aware) DataFrame. ``n_buckets`` at
    100 TB: ~2–4× executor count so every core owns a few buckets."""
    writer = (
        meas.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_cols)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return meas.sparkSession.table(table)
