"""The dariadb data model on Spark.

Reference: ``libdariadb/meas.h (struct Meas {Id id; Time time; Value value;
Flag flag})`` — ``Time`` is int64 epoch-milliseconds, ``Value`` is double,
``Flag`` a uint32 bitmask. Spark schema:

    id    BIGINT      -- series identifier
    time  BIGINT      -- epoch milliseconds (the reference's native unit)
    value DOUBLE
    flag  BIGINT      -- uint32 held safely in int64

The driver fixture maps the synthetic ``events`` table onto measurements
(see FIXTURES.md): ``user_id → id``, ``ts → time`` (ns → ms floor),
``value → value``, ``event_type → flag`` (bitmask-style code).

Both the Spark plan and the DuckDB oracle CTE below implement the *same*
mapping so the correctness harness compares like with like.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dariadb_spark.session import ensure_runtime_confs

#: Flags::_NO_DATA — all-ones uint32 marking "no value existed as-of t"
#: (reference: libdariadb/meas.h, Flags::_NO_DATA).
FLAGS_NO_DATA: int = 0xFFFFFFFF  # 4294967295

MEAS_FIELDS = ("id", "time", "value", "flag")

#: event_type → flag bitmask code (FIXTURES.md canonical mapping).
EVENT_FLAG_CASE_SQL = (
    "CAST(CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 "
    "WHEN 'signup' THEN 4 WHEN 'purchase' THEN 8 "
    "WHEN 'error' THEN 16 ELSE 0 END AS BIGINT)"
)

#: DuckDB CTE defining the identical measurements view for every oracle.
MEAS_CTE_SQL = (
    "measurements AS (SELECT user_id AS id, epoch_ms(ts) AS time, "
    "value AS value, " + EVENT_FLAG_CASE_SQL + " AS flag FROM events)"
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver fixture table (parquet, column-pruned at scan)."""
    ensure_runtime_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def measurements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical measurements DataFrame derived from ``events``.

    ``ts`` arrives as int64 nanoseconds (nanosAsLong); ``ts DIV 1000000``
    floors to ms exactly like DuckDB's ``epoch_ms``. Integer division —
    not ``/`` — because float division loses precision above 2**53.
    """
    events = load_table(spark, sf_dir, "events")
    ts_type = dict(events.dtypes)["ts"]
    if ts_type == "bigint":
        time_col = F.expr("ts DIV 1000000")
    else:  # pre-truncated timestamp (µs/ms) — e.g. rewritten fixtures
        time_col = F.unix_millis(F.col("ts"))
    return events.select(
        F.col("user_id").alias("id"),
        time_col.alias("time"),
        F.col("value").alias("value"),
        F.expr(EVENT_FLAG_CASE_SQL).alias("flag"),
    )


def flag_predicate(flag: int) -> Column:
    """dariadb flag filter (reference: libdariadb/meas.h, Meas::inFlag):
    query flag 0 matches everything, otherwise bitmask containment
    ``(meas.flag & q.flag) == q.flag``.
    """
    if flag == 0:
        return F.lit(True)
    return F.col("flag").bitwiseAND(F.lit(flag)) == F.lit(flag)


def flag_predicate_sql(flag: int) -> str:
    """The oracle-side rendering of :func:`flag_predicate` (pre-folded)."""
    if flag == 0:
        return "TRUE"
    return f"((flag & {flag}) = {flag})"


def interval_predicate(from_ms: int, to_ms: int) -> Column:
    """Closed-interval containment ``from <= time <= to`` (reference:
    libdariadb/meas.h, Meas::inInterval; SURVEY.md §7.3.3 pins closed ends
    and the oracle uses BETWEEN, identical semantics)."""
    return F.col("time").between(F.lit(from_ms), F.lit(to_ms))


def ids_predicate(ids: list[int] | None) -> Column:
    """QueryInterval.ids filter; empty/None = all series (reference:
    libdariadb/query_param.h, struct QueryInterval)."""
    if not ids:
        return F.lit(True)
    return F.col("id").isin(ids)
