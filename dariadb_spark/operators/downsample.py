"""Interval bucketing / downsampling — reference ``libdariadb/timeutil.h``
named calendar intervals ("minute30", "hour", "day", "week", "month") and
the scheme-level downsampling that stores ``param.average.hour``-style
derived series (scheme/scheme.cpp, SURVEY.md §2.5 W1/W2).

Fixed-width intervals bucket by pure int64 arithmetic on the epoch-ms
``time`` column — identical in Spark and DuckDB, no timezone/calendar
ambiguity. Calendar intervals (month) go through ``date_trunc`` on a UTC
timestamp reconstructed from ms, then back to ms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dariadb_spark.model import flag_predicate, ids_predicate, pushdown_time_bounds

MS = {"second": 1_000, "minute": 60_000, "minute30": 1_800_000,
      "hour": 3_600_000, "day": 86_400_000, "week": 604_800_000}

#: calendar intervals → date_trunc unit
CALENDAR = {"month": "month", "year": "year"}


def floor_bucket(col: Column, width_ms: int) -> Column:
    """Fixed-width bucket start with FLOOR semantics over the full int64
    ms domain. ``time - time % w`` truncates toward zero (Spark's ``%``
    takes the dividend's sign), so a pre-1970 sample would land in the
    bucket *after* it; ``pmod`` keeps the floor for negative times too.
    Stays inside whole-stage codegen (pmod is a JVM builtin)."""
    return col - F.pmod(col, F.lit(width_ms))


def floor_bucket_sql(expr: str, width_ms: int) -> str:
    """DuckDB rendering of :func:`floor_bucket` (no pmod builtin — the
    double-mod idiom gives the same floored remainder for any sign)."""
    return f"({expr} - (({expr} % {width_ms}) + {width_ms}) % {width_ms})"


def bucket_column(interval: str) -> Column:
    """Bucket start (epoch ms) for a named interval, over col ``time``."""
    if interval in MS:
        return floor_bucket(F.col("time"), MS[interval]).alias("bucket_ms")
    if interval in CALENDAR:
        unit = CALENDAR[interval]
        return F.unix_millis(
            F.date_trunc(unit, F.timestamp_millis(F.col("time")))
        ).alias("bucket_ms")
    raise ValueError(f"unknown interval {interval!r}")


def bucket_sql(interval: str) -> str:
    """DuckDB rendering of :func:`bucket_column` (UTC semantics)."""
    if interval in MS:
        return floor_bucket_sql("time", MS[interval])
    if interval in CALENDAR:
        return f"epoch_ms(date_trunc('{CALENDAR[interval]}', make_timestamp(time * 1000)))"
    raise ValueError(f"unknown interval {interval!r}")


def downsample_to_series(
    meas: DataFrame,
    catalog,
    fn_name: str,
    interval: str,
) -> DataFrame:
    """W2 scheme-level downsampling: aggregate each source series per
    bucket with one named statistic function and emit the result as NEW
    measurement rows whose ids live under derived scheme names —
    ``<source_name>.<fn>.<interval>`` (reference: scheme/scheme.cpp derived
    parameters like ``param.average.hour``). The output is a valid
    measurements frame (id/time/value/flag) appendable to any store: a
    rollup pipeline at 100 TB writes it partitioned by the same day key.

    ``catalog`` is a :class:`~dariadb_spark.scheme.SeriesCatalog`; source
    ids missing from it get a synthetic ``series<id>`` name first, so the
    operator is total. Derived rows carry flag=0 (they are synthesized,
    not sourced).
    """
    from dariadb_spark.functions.statistics import FUNCTION_REGISTRY

    if fn_name not in FUNCTION_REGISTRY:
        raise ValueError(f"unknown statistic function {fn_name!r}")
    src_ids = sorted(r.id for r in meas.select("id").distinct().collect())
    known = {v: k for k, v in catalog._name_to_id.items()}
    # Bind ALL source ids under names first, so derived-id allocation
    # starts above every existing series id (a derived series must never
    # collide with a source id, and add_param allocates max+1).
    names = {}
    for sid in src_ids:
        base = known.get(sid)
        if base is None:
            base = f"series{sid}"
            catalog.register(base, sid)
        names[sid] = base
    mapping = [  # (source_id, derived_id)
        (sid, catalog.add_param(f"{names[sid]}.{fn_name}.{interval}"))
        for sid in src_ids
    ]
    map_df = meas.sparkSession.createDataFrame(
        mapping, "id bigint, derived_id bigint"
    )
    agg = (
        meas.groupBy("id", bucket_column(interval))
        .agg(FUNCTION_REGISTRY[fn_name][0]().alias("value"))
        .join(F.broadcast(map_df), "id")
        .select(
            F.col("derived_id").alias("id"),
            F.col("bucket_ms").alias("time"),
            F.col("value").cast("double").alias("value"),
            F.lit(0).cast("bigint").alias("flag"),
        )
    )
    return agg


def downsample(
    meas: DataFrame,
    interval: str,
    ids: list[int] | None = None,
    from_ms: int | None = None,
    to_ms: int | None = None,
    flag: int = 0,
) -> DataFrame:
    """Per-series per-bucket aggregate block (the derived-series payload:
    avg/min/max/sum/count). Partial aggregation is map-side; the single
    shuffle is on (id, bucket) — the natural key a 100 TB rollup would
    also partition its output by."""
    cond = ids_predicate(ids) & flag_predicate(flag)
    if from_ms is not None or to_ms is not None:
        cond = cond & pushdown_time_bounds(meas, from_ms, to_ms)
    return (
        meas.where(cond)
        .groupBy(F.col("id"), bucket_column(interval))
        .agg(
            F.count("value").alias("cnt"),
            # avg as round(sum,6)/count with NO final rounding: the rounded
            # sum is bit-identical across engines (accumulation noise ~1e-8
            # << 5e-7 boundary gap) and IEEE division is deterministic, so
            # the quotient compares exactly. A final round(…,4) would
            # diverge: fixture values are 2-decimal and bucket counts are
            # powers of two, so averages land EXACTLY on .xxxx5 boundaries
            # where Spark (HALF_UP on shortest decimal repr) and DuckDB
            # (binary-value rounding) disagree.
            (F.round(F.sum("value"), 6) / F.count("value")).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("id", "bucket_ms")
    )
