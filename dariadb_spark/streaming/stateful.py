"""Custom stateful streaming operator — incremental per-series statistics.

The reference maintains an eager latest-value cache per series on every
append (Engine::currentValue / memstorage, SURVEY.md §2.8 T2). This module
generalizes that pattern to the full Statistic block (§2.4 A4) per time
bucket (§2.5 W1), maintained incrementally with *explicit* operator state
via ``applyInPandasWithState`` — the Spark rendering of "custom stateful
operator" (built-in windowed aggregation covers the simple cases; explicit
state is the extension point for semantics Spark lacks, e.g. the
reference's no-watermark accept-all-late-data policy).

State model (scale argument): one group per series id, state = open
buckets → (cnt, min, max, sum). State size is bounded by
|series| × |open buckets per series| — independent of throughput. Each
micro-batch emits only the buckets it touched (update semantics); late
data simply re-opens a bucket (no watermark eviction — matching the
reference's merge-on-read acceptance of arbitrarily late appends; a
production deployment bounds state with a timeout if the series set is
unbounded).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dariadb_spark.operators.downsample import MS

_MEAS_DDL = "id bigint, time bigint, value double, flag bigint"

#: emitted row schema — the incremental Statistic block per (id, bucket)
STAT_DDL = (
    "id BIGINT, bucket_ms BIGINT, cnt BIGINT, min_value DOUBLE, "
    "max_value DOUBLE, sum_value DOUBLE"
)

#: state schema: parallel arrays (bucket -> running aggregates)
_STATE_DDL = (
    "buckets ARRAY<BIGINT>, cnts ARRAY<BIGINT>, mins ARRAY<DOUBLE>, "
    "maxs ARRAY<DOUBLE>, sums ARRAY<DOUBLE>"
)


def _make_state_fold(bucket_width: int) -> Callable:
    """Build the per-group state-fold function (closure pickles cleanly to
    executors; a function attribute would not survive cloudpickle reliably)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (series_id,) = key
        if state.exists:
            buckets, cnts, mins, maxs, sums = state.get
            acc = {
                b: [c, lo, hi, s]
                for b, c, lo, hi, s in zip(buckets, cnts, mins, maxs, sums)
            }
        else:
            acc = {}
        touched: set[int] = set()
        for pdf in pdfs:
            for t, v in zip(pdf["time"], pdf["value"]):
                b = int(t) - int(t) % bucket_width
                touched.add(b)
                slot = acc.get(b)
                if slot is None:
                    acc[b] = [1, float(v), float(v), float(v)]
                else:
                    slot[0] += 1
                    slot[1] = min(slot[1], float(v))
                    slot[2] = max(slot[2], float(v))
                    slot[3] += float(v)
        ordered = sorted(acc)
        state.update(
            (
                ordered,
                [acc[b][0] for b in ordered],
                [acc[b][1] for b in ordered],
                [acc[b][2] for b in ordered],
                [acc[b][3] for b in ordered],
            )
        )
        out = sorted(touched)
        yield pd.DataFrame(
            {
                "id": [int(series_id)] * len(out),
                "bucket_ms": out,
                "cnt": [acc[b][0] for b in out],
                "min_value": [acc[b][1] for b in out],
                "max_value": [acc[b][2] for b in out],
                "sum_value": [acc[b][3] for b in out],
            }
        )

    return update


#: emitted alert row schema — matches the batch anomaly_zscore_op output
ALERT_DDL = (
    "id BIGINT, time BIGINT, value DOUBLE, flag BIGINT, "
    "n_trail BIGINT, z DOUBLE"
)

#: alert state: the trailing tail of the series, ≤ window points
_ALERT_STATE_DDL = (
    "times ARRAY<BIGINT>, values ARRAY<DOUBLE>, flags ARRAY<BIGINT>"
)


def _round_half_up(x: float, places: int) -> float:
    """Spark/DuckDB ``round()`` (BigDecimal HALF_UP on the exact binary
    value of the double) — Python's builtin ``round`` is HALF_EVEN and
    would diverge on .5 boundaries."""
    import decimal

    q = decimal.Decimal(1).scaleb(-places)
    return float(
        decimal.Decimal(x).quantize(q, rounding=decimal.ROUND_HALF_UP)
    )


def _make_alert_fold(window: int, min_n: int, threshold: float) -> Callable:
    """Per-series online z-score alert fold. State = the last ``window``
    (time, value, flag) points; each new point is scored against the
    trailing window that PRECEDES it — arithmetic identical to the
    batch ``anomaly_zscore_op`` (round(sum,6)/n moments, HALF_UP
    rounding), so a time-ordered replay reproduces the batch alerts
    bit-for-bit. Late data is scored against the state as-of arrival
    (already-emitted alerts are never retracted); the batch path is the
    reconciliation of record — SCALE.md §5's policy."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        (series_id,) = key
        if state.exists:
            times, values, flags = (list(c) for c in state.get)
        else:
            times, values, flags = [], [], []
        tail = list(zip(times, values, flags))
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(t), float(v), int(f))
                for t, v, f in zip(pdf["time"], pdf["value"], pdf["flag"])
            )
        # batch semantics order points by (time, value, flag) per series
        rows.sort()
        out: list[tuple] = []
        for t, v, f in rows:
            trail = tail[-window:]
            n = len(trail)
            if n >= min_n:
                s = 0.0
                s2 = 0.0
                for _, tv, _ in trail:  # ascending order, like the
                    s += tv             # window frame's running sum
                    s2 += tv * tv
                mean = _round_half_up(s, 6) / n
                ex2 = _round_half_up(s2, 6) / n
                std = math.sqrt(max(ex2 - mean * mean, 0.0))
                if std > 0:
                    z = _round_half_up((v - mean) / std, 4)
                    if abs(z) > threshold:
                        out.append((int(series_id), t, v, f, n, z))
            tail.append((t, v, f))
            if len(tail) > window:
                tail = tail[-window:]
        state.update(
            (
                [t for t, _, _ in tail],
                [v for _, v, _ in tail],
                [f for _, _, f in tail],
            )
        )
        yield pd.DataFrame(
            out, columns=["id", "time", "value", "flag", "n_trail", "z"]
        )

    return update


def streaming_anomaly_alerts(
    spark: SparkSession,
    data_dir: str,
    window: int = 20,
    min_n: int = 10,
    threshold: float = 3.0,
    query_name: str = "anomaly_alerts_live",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the online anomaly-alert stream — the push half of the
    reference's subscribe pattern pointed at a quality gate: every
    appended point is scored against its own series' trailing window
    and alert rows land in the in-memory table ``query_name``.

    Plan shape: file/Delta stream → one shuffle on ``id`` (stable state
    partitioning) → Arrow-batched state fold holding ≤ window points
    per series — state is |series| × window regardless of throughput."""
    reader = (
        spark.readStream.schema(_MEAS_DDL)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(data_dir)
    updated = stream.groupBy("id").applyInPandasWithState(
        _make_alert_fold(window, min_n, threshold),
        outputStructType=ALERT_DDL,
        stateStructType=_ALERT_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def streaming_anomaly_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible custom-stateful parity: run the REAL
    applyInPandasWithState alert stream over the fixture slice the
    batch ``ext_anomaly_zscore`` query covers and return the alert
    table. Oracle = that query's SQL — the explicit-state fold must
    reproduce the batch window plan exactly (same trailing-20 moments,
    same HALF_UP rounding, same (time, value, flag) total order)."""
    import tempfile

    from dariadb_spark.model import measurements
    from dariadb_spark.operators.interval import scan_interval
    from dariadb_spark.registry import FROM_MS, IDS, TO_MS

    base = tempfile.mkdtemp(prefix="dariadb_alert_parity_")
    data_dir = f"{base}/data"
    qname = "alert_parity_" + base.rsplit("_", 1)[-1]
    # ONE sorted file → the availableNow replay feeds each series its
    # points in (time, value, flag) order, the precondition for exact
    # batch parity (out-of-order arrival is policy-scored, not parity)
    scan_interval(
        measurements(spark, sf_dir), IDS, FROM_MS, TO_MS, 0
    ).orderBy("id", "time", "value", "flag").coalesce(1).write.parquet(
        data_dir
    )
    streaming_anomaly_alerts(spark, data_dir, query_name=qname).awaitTermination(
        600
    )
    return spark.table(qname).orderBy("id", "time", "value", "flag")


def streaming_stat_blocks(
    spark: SparkSession,
    data_dir: str,
    interval: str = "hour",
    query_name: str = "stat_blocks_live",
) -> StreamingQuery:
    """Start the incremental statistic maintenance stream; query the
    in-memory table ``query_name`` for the live per-(id, bucket) blocks.

    Plan shape: file/Delta stream → one shuffle on ``id`` (the state
    partitioning key, stable across batches) → Arrow-batched state fold.
    """
    stream = (
        spark.readStream.schema(_MEAS_DDL)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(data_dir)
    )
    updated = stream.groupBy("id").applyInPandasWithState(
        _make_state_fold(MS[interval]),
        outputStructType=STAT_DDL,
        stateStructType=_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
