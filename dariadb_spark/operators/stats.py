"""Per-series summary operators.

* ``min_max_time`` — reference ``Engine::minMaxTime(id)`` /
  ``Engine::loadMinMax()`` (libdariadb/engine.cpp): earliest/latest
  timestamp per series, merged across storage layers. On Spark a single
  partial-aggregating groupBy (map-side combine, no full shuffle of rows).
* ``stat_block`` — reference ``Engine::stat(id, from, to)`` returning
  ``Statistic {count, minTime, maxTime, min/max value, sum, mean}``
  (libdariadb/stat.h): one aggregation pass over the filtered interval.

Sum/avg are rounded to 4 decimals in both engine and oracle so the
value-hash is insensitive to floating-point accumulation order across
partitions (SURVEY.md §7.3.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dariadb_spark.model import flag_predicate, ids_predicate, pushdown_time_bounds


def min_max_time(meas: DataFrame, ids: list[int] | None = None) -> DataFrame:
    """(id, min_time, max_time) per series; ids=None → all series
    (reference loadMinMax → Id2MinMax)."""
    return (
        meas.where(ids_predicate(ids))
        .groupBy("id")
        .agg(F.min("time").alias("min_time"), F.max("time").alias("max_time"))
        .orderBy("id")
    )


def stat_block(
    meas: DataFrame,
    ids: list[int] | None,
    from_ms: int,
    to_ms: int,
    flag: int = 0,
) -> DataFrame:
    """The reference's Statistic block per series over a closed interval."""
    return (
        meas.where(
            ids_predicate(ids)
            & pushdown_time_bounds(meas, from_ms, to_ms)
            & flag_predicate(flag)
        )
        .groupBy("id")
        .agg(
            F.count("value").alias("cnt"),
            F.min("time").alias("min_time"),
            F.max("time").alias("max_time"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            # mean as round(sum,6)/count — bit-identical across engines;
            # round(avg,4) diverges when 2-decimal inputs put the true
            # mean exactly on a .xxxx5 boundary (see downsample.py).
            (F.round(F.sum("value"), 6) / F.count("value")).alias("mean_value"),
        )
        .orderBy("id")
    )
