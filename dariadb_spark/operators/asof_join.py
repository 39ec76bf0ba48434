"""Generic as-of join between two measurement streams.

Generalizes the reference's point-in-time read (Engine::readTimePoint,
libdariadb/engine.cpp) from "one timestamp, many series" to "every left
row joined to the latest right row at-or-before it, per series" — the
pandas ``merge_asof`` / kdb ``aj`` operator a time-series engine needs
for event enrichment.

Scale shape — the union+window trick, NOT a range join: tag both sides,
union them, and take per-series ``last(right_value) IGNORE NULLS`` over
rows ordered by (time, side). One shuffle on ``id`` (the clustering key),
linear state, no O(|left|×|right|) candidate pair space, no range-join
explosion. Right rows sort before left rows at equal timestamps so an
exactly-simultaneous right row is visible (<= semantics, matching
readTimePoint's closed bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    value_alias: str = "right_value",
    time_alias: str = "right_time",
) -> DataFrame:
    """For each row of ``left``: the (time, value) of the latest ``right``
    row of the same id with ``right.time <= left.time`` (nulls when no
    such row). Both inputs are measurement frames (id, time, value, flag).

    Deterministic under duplicates: right rows tied on time resolve to
    the greatest (value, flag) — the same LWW order read_time_point uses.
    """
    lt = left.select(
        "id", "time", "value", "flag", F.lit(1).alias("_side"),
        F.lit(None).cast("double").alias("_rv"),
        F.lit(None).cast("bigint").alias("_rt"),
    )
    rt = right.select(
        "id", "time",
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("bigint").alias("flag"),
        F.lit(0).alias("_side"),
        F.col("value").alias("_rv"),
        F.col("time").alias("_rt"),
    )
    # right (side 0) sorts before left (side 1) at equal time → <= bound;
    # (_rv, _rt) in the order key makes duplicate right rows resolve LWW.
    w = (
        Window.partitionBy("id")
        .orderBy("time", "_side", "_rv", "_rt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        lt.unionByName(rt)
        .select(
            "id", "time", "value", "flag", "_side",
            F.last("_rv", ignorenulls=True).over(w).alias(value_alias),
            F.last("_rt", ignorenulls=True).over(w).alias(time_alias),
        )
        .where(F.col("_side") == 1)
        .drop("_side")
        .orderBy("id", "time", "value", "flag")
    )
