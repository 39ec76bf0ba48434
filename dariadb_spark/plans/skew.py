"""Skew handling — salted two-stage aggregation.

A hot series (one id receiving a large share of all points — the typical
monitoring skew) turns a groupBy("id", bucket) into one straggler task at
100 TB. AQE's skew-join splitting doesn't help aggregations, so the
classic fix is salting: aggregate on (key, salt) first — partial results
spread over N tasks — then merge partials on the key alone. Both stages
are algebraic (count/min/max/sum merge associatively), so results are
identical to the direct aggregation; the registered query proves it by
sharing the *unsalted* oracle.

The salt is a deterministic hash of the non-key columns (no RNG state —
reproducible across runs and retries, which `rand()` salting is not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dariadb_spark.operators.downsample import bucket_column

DEFAULT_SALTS = 16


def _salt(n: int) -> Column:
    return F.pmod(F.xxhash64("time", "value", "flag"), F.lit(n)).alias("_salt")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Skew-proof equi-join: the big side salts each row into one of
    ``n_salts`` sub-keys (deterministic hash of the whole row, no RNG),
    the small side replicates once per salt value, and the join runs on
    (key, salt) — a hot key's rows spread over n_salts tasks instead of
    one straggler. Same row multiset as the plain join (each big row
    meets each matching small row in exactly its own salt slice).

    This is the manual fallback for joins AQE skew-splitting can't
    reach (e.g. a skewed BROADCAST probe side, or pre-3.2 sort-merge);
    the registered query proves value-identity by sharing the unsalted
    oracle."""
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salts = big.sparkSession.range(n_salts).select(
        F.col("id").cast("bigint").alias("_salt")
    )
    replicated_small = small.crossJoin(F.broadcast(salts))
    return salted_big.join(replicated_small, [key, "_salt"]).drop("_salt")


def salted_downsample(
    meas: DataFrame, interval: str, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """`downsample()` with a salted first stage: identical output columns
    and values (avg = round(sum,6)/count — the 6-decimal rounding absorbs
    the partial-sum reassociation), two bounded shuffles instead of one
    potentially skewed one. Partition sizes: stage 1 ≤ hottest-key/N,
    stage 2 = |groups| rows."""
    partial = (
        meas.groupBy(F.col("id"), bucket_column(interval), _salt(n_salts))
        .agg(
            F.count("value").alias("_cnt"),
            F.sum("value").alias("_sum"),
            F.min("value").alias("_min"),
            F.max("value").alias("_max"),
        )
    )
    return (
        partial.groupBy("id", "bucket_ms")
        .agg(
            F.sum("_cnt").alias("cnt"),
            (F.round(F.sum("_sum"), 6) / F.sum("_cnt")).alias("avg_value"),
            F.min("_min").alias("min_value"),
            F.max("_max").alias("max_value"),
            F.round(F.sum("_sum"), 4).alias("sum_value"),
        )
        .orderBy("id", "bucket_ms")
    )
