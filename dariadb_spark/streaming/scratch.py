"""Scratch-dir hygiene for the streaming parity queries.

Each parity query materializes a fixture slice into a ``mkdtemp`` dir,
drives a real streaming query over it, and returns the result — which
previously kept the scratch parquet (and the memory-sink temp view)
alive for the life of the process, accumulating disk and driver memory
across repeated bench/test sweeps (VERDICT r5 item 5 / ADVICE r5).

:func:`localize_and_cleanup` closes that: it collects the (tiny —
parity outputs are tens-to-hundreds of rows) result into a driver-local
DataFrame whose lineage no longer references the scratch files, then
removes the dir and drops the sink view in a ``finally``.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession


def localize_and_cleanup(
    spark: SparkSession,
    df: DataFrame,
    scratch_dir: str,
    view_name: str | None = None,
) -> DataFrame:
    """Return a local-relation copy of ``df`` (row order preserved),
    deleting ``scratch_dir`` and dropping ``view_name`` afterwards even
    if the collect fails."""
    try:
        return spark.createDataFrame(df.collect(), df.schema)
    finally:
        if view_name is not None:
            try:
                spark.catalog.dropTempView(view_name)
            except Exception:
                pass  # sink view may not exist if the stream failed early
        shutil.rmtree(scratch_dir, ignore_errors=True)
