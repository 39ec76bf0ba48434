"""Distributed ranked prefix sums — the two-pass plan the
concentration screens swap in at extreme cardinality.

`orders_pareto_op` / `orders_gini_op` (ext/relational.py) rank
customers with a GLOBAL window: correct at any fixture scale and fine
up to tens of millions of rows, but a global ``Window.orderBy`` is one
range exchange into effectively sequential cumulative work — at a
billion customers that final pass is the bottleneck the docstrings
promise to split. THIS module is that split, as code with an equality
contract rather than prose:

  pass 1  ``repartitionByRange(order keys)`` then ONE within-partition
          window pass (rank + running sum per partition) — fully
          parallel, each task touching only its slice;
  bridge  a ≤ n_partitions-row aggregate of per-partition totals whose
          running offsets BROADCAST back (the carry — same shape as
          session_concurrency's cross-day carry);
  pass 2  rank = local rank + row-count offset, cum = local cum +
          value offset — a stateless projection.

Semantics are IDENTICAL to the global window by construction: range
partitioning puts every row of partition i strictly before partition
i+1 in the requested order, so offsets compose exactly; the pinned
equality test drives both plans over random tie-heavy inputs and the
planted fixture, and the 20M-row stress byte-compares the ABC output
of both paths while timing them.

Determinism note: ``spark_partition_id()`` after ``repartitionByRange``
identifies the range slice. Spark's range partitioner samples boundary
candidates deterministically for a given child plan, and the carry is
computed from the SAME materialized pass-1 output that pass 2 projects
— a recomputation under task retry re-runs both passes of the same
deterministic plan, so ranks cannot mix epochs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_prefix(
    df: DataFrame,
    order: list[Column],
    value: str,
    n_partitions: int = 32,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """``df`` plus ``rn`` (row_number over ``order``) and ``cum``
    (running sum of ``value`` over the same order) — the two-pass
    distributed equivalent of::

        w = Window.partitionBy(*partition_by).orderBy(*order)
        df.select("*", row_number().over(w).alias("rn"),
                  sum(value).over(w.rowsBetween(unboundedPreceding, 0))
                  .alias("cum"))

    With ``partition_by`` (the Gini per-segment shape) the range
    partitioner keys on (partition cols, order cols) so each group is
    CONTIGUOUS across range slices, ranks restart per group, and the
    offset carry runs per group over the tiny per-(group, slice)
    totals table."""
    grp = list(partition_by or [])
    parts = (
        df.repartitionByRange(
            n_partitions, *[F.col(g) for g in grp], *order
        )
        .withColumn("_pid", F.spark_partition_id())
    )
    lw = Window.partitionBy("_pid", *grp).orderBy(*order)
    local = parts.select(
        "*",
        F.row_number().over(lw).alias("_lrn"),
        F.sum(value).over(
            lw.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_lcum"),
    )
    ow = Window.partitionBy(*grp).orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        local.groupBy("_pid", *grp)
        .agg(F.count("*").alias("_n"), F.sum(value).alias("_s"))
        .select(
            "_pid",
            *grp,
            F.coalesce(F.sum("_n").over(ow), F.lit(0)).alias("_rn_off"),
            F.coalesce(F.sum("_s").over(ow), F.lit(0)).alias("_cum_off"),
        )
    )
    # cum must come back in the SAME type the global window's
    # sum(value) would produce (= _lcum's type), whatever the value
    # column is — an unconditional long cast would silently truncate
    # decimal/double callers (ADVICE r16). _cum_off re-sums across
    # slices (decimal re-widens), so cast the composed sum back down.
    cum_type = local.schema["_lcum"].dataType
    return (
        local.join(F.broadcast(offsets), ["_pid", *grp])
        .withColumn("rn", F.col("_lrn") + F.col("_rn_off"))
        .withColumn("cum", (F.col("_lcum") + F.col("_cum_off")).cast(cum_type))
        .drop("_pid", "_lrn", "_lcum", "_rn_off", "_cum_off")
    )


def abc_classes_distributed(
    cents: DataFrame, n_partitions: int = 32
) -> DataFrame:
    """The ABC/Pareto class summary of ``orders_pareto_op`` computed
    with the two-pass prefix machinery instead of the global window —
    byte-identical 3-row output (equality pytest + 20M-row stress).
    ``cents``: (o_custkey, cents) per customer."""
    ranked = ranked_prefix(
        cents,
        [F.col("cents").desc(), F.col("o_custkey").asc()],
        "cents",
        n_partitions,
    )
    total = cents.groupBy().agg(F.sum("cents").alias("total"))
    from dariadb_spark.ext.relational import (
        PARETO_A_DEN,
        PARETO_A_NUM,
        PARETO_B_DEN,
        PARETO_B_NUM,
    )

    return (
        ranked.crossJoin(F.broadcast(total))
        .selectExpr(
            "cents",
            "total",
            f"CASE WHEN {PARETO_A_DEN} * cum <= {PARETO_A_NUM} * total"
            " THEN 'A'"
            f" WHEN {PARETO_B_DEN} * cum <= {PARETO_B_NUM} * total"
            " THEN 'B' ELSE 'C' END AS abc_class",
        )
        .groupBy("abc_class")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("cents").alias("class_cents"),
            F.max("total").alias("total"),
        )
        .selectExpr(
            "abc_class",
            "n_customers",
            "class_cents",
            "(2 * class_cents * 1000000 + total) DIV (2 * total)"
            " AS share_micro",
        )
        .orderBy("abc_class")
    )


def gini_distributed(
    cents_with_segment: DataFrame, n_partitions: int = 32
) -> DataFrame:
    """The per-segment Gini summary of ``orders_gini_op`` computed with
    the partitioned two-pass prefix machinery instead of per-segment
    global windows — identical output (equality pytest).
    ``cents_with_segment``: (o_custkey, mktsegment, cents)."""
    from dariadb_spark.ext.exact import ratio_round_signed_wide_spark

    ranked = ranked_prefix(
        cents_with_segment,
        [F.col("cents").asc(), F.col("o_custkey").asc()],
        "cents",
        n_partitions,
        partition_by=["mktsegment"],
    )
    return (
        ranked.groupBy("mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("cents").alias("total_cents"),
            F.sum(
                F.col("rn").cast("decimal(38,0)") * F.col("cents")
            ).alias("wsum"),
        )
        .where(F.col("total_cents") > 0)
        .selectExpr(
            "mktsegment",
            "n_customers",
            "total_cents",
            ratio_round_signed_wide_spark(
                "2 * wsum - (n_customers + 1) * CAST(total_cents"
                " AS DECIMAL(38,0))",
                "n_customers * total_cents",
                6,
            )
            + " AS gini",
        )
        .orderBy("mktsegment")
    )
