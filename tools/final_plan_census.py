"""Final-ADAPTIVE-plan census: REAL per-invocation parquet scans.

The static `explain` (and `tools/plan_census.py`) overcounts scans
that AQE exchange reuse dedupes at runtime, and a census via
`df.count()` measures a SEPARATE query execution whose plan never
finalizes (`isFinalPlan=false` — the static plan again; the r19
embedding_pca lesson). The truthful instrument: `collect()` the
query's own DataFrame, read the SAME DataFrame's `executedPlan()`
(`isFinalPlan=true`), strip the "Initial Plan" section, and count
`FileScan parquet` / `ReusedExchange` there.

Usage:
    python tools/final_plan_census.py [query ...]   # default: all
                                                    # non-streaming
    SPARK_GRAFT_SF_DIR=... to change the fixture (default sf0.01).

Output: one line per query —
    name scans=N reuse=N rdd=N t=SECS
where scans is the real runtime parquet-scan count, reuse the
ReusedExchange count, rdd the Scan ExistingRDD (pin) count.

Streaming parities are skipped (building them runs the stream).
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from dariadb_spark.registry import REGISTRY
    from dariadb_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or [
        n for n in sorted(REGISTRY) if not n.startswith("streaming_")
    ]
    spark = get_spark("final-plan-census")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        try:
            t0 = time.perf_counter()
            df = REGISTRY[n].fn(spark, sf)
            df.collect()
            s = df._jdf.queryExecution().executedPlan().toString()
            cut = s.find("Initial Plan")
            fin = s[:cut] if cut > 0 else s
            scans = len(re.findall(r"FileScan parquet|Scan parquet", fin))
            reuse = len(re.findall(r"ReusedExchange", fin))
            rdd = len(re.findall(r"Scan ExistingRDD", fin))
            dt = time.perf_counter() - t0
            print(
                f"{n} scans={scans} reuse={reuse} rdd={rdd} t={dt:.2f}",
                flush=True,
            )
        except Exception as ex:  # keep the census going past one failure
            print(f"{n} ERROR {type(ex).__name__}: {str(ex)[:80]}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
