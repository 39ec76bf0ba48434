"""As-of / latest-point operators.

* ``read_time_point`` — reference ``Engine::readTimePoint(QueryTimePoint)``
  (libdariadb/engine.cpp): for each *requested* id, the latest point with
  ``time <= time_point``; ids with no candidate yield a synthesized
  ``Meas{id, time=tp, value=0, flag=_NO_DATA}``. Cardinality is always
  ``len(ids)`` — the subtle contract (SURVEY.md §7.3.1).
* ``current_value`` — reference ``Engine::currentValue(ids, flag)``:
  latest value per series.

Plan shape: filter → per-id top-1 via window → broadcast left join with the
requested-id list to synthesize ``_NO_DATA`` rows. The window shuffles by
``id`` only the *filtered* slice; the requested-id list is tiny and
broadcast. At 100 TB the heavy lifting is the pushed-down
``time <= tp AND id IN (...)`` scan prune.

Determinism: duplicate (id, time) pairs are broken by (value, flag)
descending — the same total order the DuckDB oracle uses, so engine and
oracle agree bit-for-bit (SURVEY.md §7.3.4 LWW policy pick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dariadb_spark.model import (
    FLAGS_NO_DATA,
    flag_predicate,
    ids_predicate,
    pushdown_time_bounds,
)

def _latest_order():
    """Deterministic per-id "latest first": time desc, then value/flag desc."""
    return [F.col("time").desc(), F.col("value").desc(), F.col("flag").desc()]


def _latest_per_id(filtered: DataFrame) -> DataFrame:
    w = Window.partitionBy("id").orderBy(*_latest_order())
    return (
        filtered.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def read_time_point(
    spark: SparkSession,
    meas: DataFrame,
    ids: list[int],
    time_point_ms: int,
    flag: int = 0,
) -> DataFrame:
    """One row per requested id: latest point at/before ``time_point_ms``,
    or a ``_NO_DATA`` filler row (value=0, time=tp)."""
    requested = spark.createDataFrame([(int(i),) for i in ids], "id bigint")
    latest = _latest_per_id(
        meas.where(
            ids_predicate(ids)
            & pushdown_time_bounds(meas, None, time_point_ms)
            & flag_predicate(flag)
        )
    )
    return (
        F.broadcast(requested)
        .join(latest, "id", "left")
        .select(
            F.col("id"),
            F.coalesce(F.col("time"), F.lit(time_point_ms)).alias("time"),
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
            F.coalesce(F.col("flag"), F.lit(FLAGS_NO_DATA)).alias("flag"),
        )
        .orderBy("id")
    )


def current_value(
    meas: DataFrame, ids: list[int] | None = None, flag: int = 0
) -> DataFrame:
    """Latest measurement per series (no ``_NO_DATA`` synthesis — the
    reference returns only series that exist; empty ids = all series)."""
    return (
        _latest_per_id(meas.where(ids_predicate(ids) & flag_predicate(flag)))
        .select("id", "time", "value", "flag")
        .orderBy("id")
    )
