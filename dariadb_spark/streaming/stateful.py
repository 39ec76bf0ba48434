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
