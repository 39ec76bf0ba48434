"""Isolated re-measure of driver-flagged parity timings (the r10/r11
control protocol, executed for VERDICT r14 item 3).

Runs the N flagged queries plus byte-identical-code CONTROL queries of
the same execution class (checkpointed stateful streaming parities and
a sketch-merge batch query, none touched since the committed map) in a
FRESH session on a quiet machine: per query, one sf0.001 warmup then
best-of-3 at sf0.1 (bench.py's steady-state rule, one extra rep for an
adjudication run). Prints one JSON line with per-query seconds, the
ratio vs the committed BENCH_FULL.json map, and os load averages —
the adjudication evidence BASELINE.md records.

Reading: flagged ratios concentrating >1.3x while controls sit ~1.0x =
a real regression on those paths; flagged AND controls drifting
together = the shared-VM machine-epoch signature, same verdict as the
r11/r12 adjudications.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dariadb_spark.registry import REGISTRY  # noqa: E402
from dariadb_spark.session import get_spark  # noqa: E402

# r16 adjudication (VERDICT r15 item 2): the two paths the driver's r15
# control block flagged as code-changed >1.3x. The CONTROLS are
# byte-identical-code queries of the same execution classes untouched
# since the builder's committed map (e72de38).
FLAGGED = [
    "ext_part_pagerank",            # lazy-by-default edges, 37805d5
    "ext_series_seasonal_strength",  # timeseries.py edited r15
]
CONTROLS = [
    "ext_dedup_components",  # heavy iterative-graph batch sibling
    "ext_market_basket",     # co-purchase joins on the same basket scan
    "ext_series_trend",      # same timeseries window-batch family
    "ext_series_cross_corr",  # same family, untouched
    "ext_dedup_simhash",     # heavy batch path, untouched
]

# The committed-map epoch the driver's control block compared against
# (commit e72de38, the builder's 211-query refresh). The repo's CURRENT
# BENCH_FULL.json was overwritten by the driver's own r15 run — which
# CONTAINS the suspect 4.11 s value — so ratios must be taken against
# the builder epoch, pinned here.
COMMITTED_E72DE38 = {
    "ext_part_pagerank": 2.8884,
    "ext_series_seasonal_strength": 0.6271,
    "ext_dedup_components": 3.2375,
    "ext_market_basket": 1.8034,
    "ext_series_trend": 0.5981,
    "ext_series_cross_corr": 0.6692,
    "ext_dedup_simhash": 1.1491,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    committed = COMMITTED_E72DE38
    spark = get_spark("dariadb-remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    names = FLAGGED + CONTROLS
    out: dict[str, dict] = {}
    load0 = os.getloadavg()
    def _clear_memos() -> None:
        # dedup_components memoizes its CC labels per (path, plan) —
        # without clearing, every rep after the warmup is a memo hit
        # and the "measure" is a no-op (the r16 run recorded 0.04x
        # before this guard landed; that row was excluded as a control)
        from dariadb_spark.ext import dedup as D

        D._LABELS_MEMO.clear()

    for name in names:
        _clear_memos()
        REGISTRY[name].fn(spark, "/root/testdata/sf0.001").count()  # warmup
        best = float("inf")
        reps = []
        for _ in range(3):
            _clear_memos()
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            reps.append(round(dt, 4))
            best = min(best, dt)
        out[name] = {
            "best": round(best, 4),
            "reps": reps,
            "committed": committed.get(name),
            "ratio": round(best / committed[name], 3) if name in committed else None,
            "kind": "flagged" if name in FLAGGED else "control",
        }
    print(json.dumps({
        "metric": "flagged_parity_remeasure",
        "sf": sf_dir,
        "load_start": load0,
        "load_end": os.getloadavg(),
        "results": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
