"""Isolated re-measure of driver-flagged parity timings (the r10/r11
control protocol, executed for VERDICT r16 item 2).

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

# r17 adjudication (VERDICT r16 item 2): the four paths the driver's
# r16 control block flagged >2x with >=1 s absolute deltas. Judge-
# verified byte-identical since the committed map (git diff
# 055daf7..HEAD over streaming/rollup.py, streaming/stateful.py,
# operators/, functions/, sources/parquet_store.py, model.py is
# EMPTY), so the prior is machine-epoch — but the house protocol is
# to measure, not assume. The CONTROLS are byte-identical-code
# queries of the same execution classes (checkpointed stateful
# streaming parities, the temp-store file-stats sibling, a windowed
# batch sibling), also untouched since 055daf7.
FLAGGED = [
    "partition_file_stats_multi",     # driver r16: 3.25x (1.55 -> 5.03 s)
    "streaming_rollup_parity",        # driver r16: 2.31x (2.30 -> 5.32 s)
    "streaming_current_value_parity",  # driver r16: 2.41x (1.12 -> 2.71 s)
    "ext_derived_series",             # driver r16: 1.99x (1.03 -> 2.06 s)
]
CONTROLS = [
    "streaming_markov_parity",     # heaviest checkpointed stateful twin
    "streaming_sessionize_parity",  # stateful streaming sibling
    "streaming_ewma_parity",       # stateful streaming sibling
    "partition_file_stats",        # same temp-store layout machinery
    "ext_moving_avg",              # windowed batch sibling
]

# The committed-map epoch the driver's r16 control block compared
# against: commit 055daf7, the builder's post-merge 216-query refresh.
# (The repo's CURRENT BENCH_FULL.json was overwritten by the driver's
# own r16 run — which CONTAINS the flagged values — so ratios must be
# taken against the builder epoch, pinned here.)
COMMITTED_055DAF7 = {
    "partition_file_stats_multi": 1.5487,
    "streaming_rollup_parity": 2.3043,
    "streaming_current_value_parity": 1.1214,
    "ext_derived_series": 1.0319,
    "streaming_markov_parity": 4.5686,
    "streaming_sessionize_parity": 1.0249,
    "streaming_ewma_parity": 1.9534,
    "partition_file_stats": 0.3392,
    "ext_moving_avg": 0.1648,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    committed = COMMITTED_055DAF7
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
