"""Mechanical physical-plan census over registered queries.

For each query (default: a named subset, else the whole registry) build
the DataFrame at the given fixture dir and count plan nodes that matter
at 100 TB: parquet scans, join strategies, and the two red flags the
test suite pins to zero (`CartesianProduct` anywhere, unbounded
following window frames are covered separately by tests/test_plans.py).

Usage:
    python tools/plan_census.py [query ...]        # default sf0.01
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/plan_census.py

Output: one line per query —
    name scans=N bhj=N smj=N bnlj=N cartesian=N
plus a non-zero exit if any plan contains a CartesianProduct (so the
census can gate CI the way the pytest sweep does interactively).

Streaming parities are SKIPPED by default (building them RUNS the
stream); pass --streaming to include them anyway.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODES = {
    "scans": "Scan parquet",
    "bhj": "BroadcastHashJoin",
    "smj": "SortMergeJoin",
    "bnlj": "BroadcastNestedLoopJoin",
    "cartesian": "CartesianProduct",
}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    include_streaming = "--streaming" in sys.argv

    from dariadb_spark.registry import REGISTRY
    from dariadb_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan-census", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    names = args or [
        n
        for n in REGISTRY
        if include_streaming or not n.startswith("streaming_")
    ]
    bad = []
    for n in names:
        spec = REGISTRY[n]
        try:
            plan = (
                spec.fn(spark, sf)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # surfaced, census continues
            print(f"{n} ERROR {type(ex).__name__}: {ex}")
            bad.append(n)
            continue
        counts = {k: plan.count(v) for k, v in NODES.items()}
        print(
            f"{n} " + " ".join(f"{k}={v}" for k, v in counts.items())
        )
        if counts["cartesian"]:
            bad.append(n)
    if bad:
        print(f"FAIL: {bad}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
