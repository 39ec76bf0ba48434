"""Stage-level timing for streaming_anomaly_parity (VERDICT r6 item 1).

Replays the exact parity pipeline with a stopwatch between stages:
  1. scratch write  — scan_interval + orderBy + coalesce(1) parquet write
  2. stream start/run — readStream → applyInPandasWithState → memory sink
                      (availableNow trigger, awaitTermination), with the
                      per-batch ``durationMs`` breakdown (addBatch is the
                      actual execution; the rest is offset/commit-log +
                      planning startup cost)
  3. localize       — orderBy + collect into a local relation
  4. cleanup        — rmtree + dropTempView

Findings recorded in BASELINE.md ("streaming_anomaly_parity stage
breakdown"). ``STREAM_SHUFFLE_PARTS`` overrides the state-partition
count for A/B runs — the measurement that motivated
``parity_stream_partitions`` (scratch.py): 4 partitions ~2× faster
addBatch than the session's 32 for the 15-series parity slice.

Run:  python tools/time_anomaly_parity.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from dariadb_spark.session import get_spark  # noqa: E402


def run_once(spark, sf_dir: str) -> dict[str, float]:
    from dariadb_spark.model import measurements
    from dariadb_spark.operators.interval import scan_interval
    from dariadb_spark.registry import FROM_MS, IDS, TO_MS
    from dariadb_spark.streaming.stateful import streaming_anomaly_alerts

    stages: dict[str, float] = {}
    base = tempfile.mkdtemp(prefix="dariadb_alert_timing_")
    data_dir = f"{base}/data"
    qname = "alert_timing_" + base.rsplit("_", 1)[-1]
    try:
        t0 = time.perf_counter()
        scan_interval(
            measurements(spark, sf_dir), IDS, FROM_MS, TO_MS, 0
        ).orderBy("id", "time", "value", "flag").coalesce(1).write.parquet(
            data_dir
        )
        t1 = time.perf_counter()
        stages["scratch_write"] = t1 - t0

        nparts = os.environ.get("STREAM_SHUFFLE_PARTS")
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        if nparts:
            spark.conf.set("spark.sql.shuffle.partitions", nparts)
        try:
            q = streaming_anomaly_alerts(spark, data_dir, query_name=qname)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        t2 = time.perf_counter()
        stages["stream_start"] = t2 - t1
        q.awaitTermination(600)
        t3 = time.perf_counter()
        stages["stream_run"] = t3 - t2
        for p in q.recentProgress:
            d = p["durationMs"] if isinstance(p, dict) else None
            if d is None:
                import json

                d = json.loads(p.json)["durationMs"]
            print("  batch durationMs:", d)

        rows = (
            spark.table(qname)
            .orderBy("id", "time", "value", "flag")
            .collect()
        )
        t4 = time.perf_counter()
        stages["localize"] = t4 - t3
        stages["rows"] = len(rows)
        t5 = time.perf_counter()
    finally:
        try:
            spark.catalog.dropTempView(qname)
        except Exception:
            pass
        shutil.rmtree(base, ignore_errors=True)
    stages["cleanup"] = time.perf_counter() - t5
    stages["total"] = time.perf_counter() - t0
    return stages


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    # warm the session the way bench.py does (JVM, Arrow, state store)
    spark.range(1).collect()
    for i in range(repeats):
        stages = run_once(spark, sf_dir)
        print(
            f"run {i}: "
            + ", ".join(
                f"{k}={v:.3f}" if k != "rows" else f"{k}={int(v)}"
                for k, v in stages.items()
            )
        )


if __name__ == "__main__":
    main()
