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

FLAGGED = [
    "streaming_sessionize_parity",
    "streaming_dedup_parity",
    "streaming_interval_join_parity",
    "streaming_quality_gate_parity",
    "ext_sketch_hll_union",
    "streaming_anomaly_parity",
]
CONTROLS = [
    "streaming_markov_parity",   # same checkpointed-fold class
    "streaming_kmv_parity",      # same class, k-row state
    "streaming_ewma_parity",     # same class, registered r14
    "streaming_hdr_parity",      # same class, bucket state
    "ext_sketch_hll_m64",        # sketch-merge batch sibling
    "ext_dedup_simhash",         # heavy batch path, untouched
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    with open(os.path.join(os.path.dirname(__file__), "..", "BENCH_FULL.json")) as f:
        committed = json.load(f)["queries"]
    spark = get_spark("dariadb-remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    names = FLAGGED + CONTROLS
    out: dict[str, dict] = {}
    load0 = os.getloadavg()
    for name in names:
        REGISTRY[name].fn(spark, "/root/testdata/sf0.001").count()  # warmup
        best = float("inf")
        reps = []
        for _ in range(3):
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
