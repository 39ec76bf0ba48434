"""r20 graph-family A/B: iteration-exchange reduction (VERDICT r19 item 5).

Times the r19 (lazy per-iteration shuffle) vs r20 (one standing
partitioning + broadcast score vectors) forms of part_pagerank /
part_hits / part_kcore in ONE warm session, isolated best-of-N, and
verifies row-identical results. The *before* bodies are verbatim copies
of the r19 HEAD code (git 6a2a137). Run with order flag to control
first-measured variant (the r19 lesson: A/B in BOTH orders):

    python tools/r20_graph_ab.py [sf_dir] [ab|ba] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dariadb_spark.ext.relational import (  # noqa: E402
    BASKET_MIN_SUP,
    HITS_ITERS,
    KCORE_K,
    KCORE_ROUNDS,
    KCORE_TOP,
    PAGERANK_ITERS,
    PAGERANK_TOP,
    part_hits_op,
    part_kcore_op,
    part_pagerank_op,
)
from dariadb_spark.model import load_table  # noqa: E402
from dariadb_spark.session import get_spark  # noqa: E402


def _pairs(li):
    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .agg(F.count("*").alias("sup"))
        .where(F.col("sup") >= BASKET_MIN_SUP)
        .select("x", "y")
    )


def pagerank_before(li):
    pairs = _pairs(li)
    edges = pairs.selectExpr("x AS src", "y AS dst").unionByName(
        pairs.selectExpr("y AS src", "x AS dst")
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = edges.join(deg, "src")
    ranks = deg.selectExpr("src AS node", "CAST(1000000 AS BIGINT) AS r")
    for _ in range(PAGERANK_ITERS):
        ranks = (
            ed.join(ranks, ed.src == ranks.node)
            .selectExpr(
                "dst",
                "(34 * r + 20 * deg) DIV (40 * deg) AS contrib",
            )
            .groupBy("dst")
            .agg((F.lit(150_000) + F.sum("contrib")).alias("r"))
            .selectExpr("dst AS node", "CAST(r AS BIGINT) AS r")
        )
    return (
        ranks.selectExpr(
            "node AS part",
            "r AS rank_micro",
            "round(CAST(r AS DOUBLE) / 1000000.0d, 6) AS pagerank",
        )
        .orderBy(F.desc("rank_micro"), F.asc("part"))
        .limit(PAGERANK_TOP)
    )


def hits_before(orders, li):
    edges = (
        orders.select("o_orderkey", "o_custkey")
        .join(li.select("l_orderkey", "l_partkey"),
              orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
        )
        .distinct()
    )
    hubs = edges.select("cust").distinct().selectExpr(
        "cust", "CAST(1000000 AS BIGINT) AS h"
    )
    auth = None
    for _ in range(HITS_ITERS):
        a_raw = (
            edges.join(hubs, "cust")
            .groupBy("part")
            .agg(F.sum("h").alias("raw"))
        )
        a_tot = a_raw.agg(
            F.sum(F.col("raw").cast("decimal(38,0)")).alias("tot"),
            F.count("*").alias("n_side"),
        )
        auth = a_raw.crossJoin(F.broadcast(a_tot)).selectExpr(
            "part",
            "CAST((2 * CAST(raw AS DECIMAL(38,0)) * n_side * 1000000"
            " + tot) DIV (2 * tot) AS BIGINT) AS a",
        )
        h_raw = (
            edges.join(auth, "part")
            .groupBy("cust")
            .agg(F.sum("a").alias("raw"))
        )
        h_tot = h_raw.agg(
            F.sum(F.col("raw").cast("decimal(38,0)")).alias("tot"),
            F.count("*").alias("n_side"),
        )
        hubs = h_raw.crossJoin(F.broadcast(h_tot)).selectExpr(
            "cust",
            "CAST((2 * CAST(raw AS DECIMAL(38,0)) * n_side * 1000000"
            " + tot) DIV (2 * tot) AS BIGINT) AS h",
        )
    return (
        auth.selectExpr(
            "part",
            "a AS auth_micro",
            "(a / 1000000.0d) AS authority",
        )
        .orderBy(F.desc("auth_micro"), F.asc("part"))
        .limit(20)
    )


_KCB: list = []


def kcore_before(li):
    pairs = _pairs(li)
    edges = pairs.selectExpr("x AS src", "y AS dst").unionByName(
        pairs.selectExpr("y AS src", "x AS dst")
    )
    while _KCB:
        try:
            _KCB.pop().unpersist(blocking=False)
        except Exception:
            pass
    ed0 = edges.localCheckpoint(eager=False)
    _KCB.append(ed0)
    deg0 = ed0.groupBy("src").agg(F.count("*").alias("deg0"))
    ed = ed0
    for _ in range(KCORE_ROUNDS):
        keep = (
            ed.groupBy("src")
            .agg(F.count("*").alias("d"))
            .where(F.col("d") >= KCORE_K)
            .select("src")
            .localCheckpoint(eager=False)
        )
        _KCB.append(keep)
        ed = ed0.join(F.broadcast(keep), "src", "left_semi").join(
            F.broadcast(keep.selectExpr("src AS dst")), "dst", "left_semi"
        )
    core_deg = ed.groupBy("src").agg(F.count("*").alias("core_deg"))
    return (
        core_deg.where(F.col("core_deg") >= KCORE_K)
        .join(F.broadcast(deg0), "src")
        .selectExpr("src AS part", "deg0", "core_deg")
        .orderBy(F.desc("core_deg"), F.desc("deg0"), F.asc("part"))
        .limit(KCORE_TOP)
    )


def timed(label, fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().count()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label}: best-of-{reps} {best:.3f}s", flush=True)
    return best


def timed_alternating(before, after, reps, first="b"):
    """Interleave the variants (B,A,B,A,… or A,B,A,B,…) so monotone
    session-warmup drift cannot masquerade as a win in either
    direction (the r19 embedding_pca order-bias lesson, generalized);
    report best-of-reps per variant plus the per-round pairs."""
    b_times, a_times = [], []
    pair = ("b", "a") if first == "b" else ("a", "b")
    for _ in range(reps):
        for tag in pair:
            fn = before if tag == "b" else after
            t0 = time.perf_counter()
            fn().count()
            dt = time.perf_counter() - t0
            (b_times if tag == "b" else a_times).append(dt)
    print(
        "  rounds: "
        + " ".join(
            f"[b={b:.2f} a={a:.2f}]" for b, a in zip(b_times, a_times)
        ),
        flush=True,
    )
    return min(b_times), min(a_times)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    order = sys.argv[2] if len(sys.argv) > 2 else "ab"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("r20-graph-ab")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    spark.range(1).count()

    cases = [
        ("pagerank", lambda: pagerank_before(li), lambda: part_pagerank_op(li)),
        ("hits", lambda: hits_before(orders, li), lambda: part_hits_op(orders, li)),
        ("kcore", lambda: kcore_before(li), lambda: part_kcore_op(li)),
    ]
    for name, before, after in cases:
        rb = sorted(map(tuple, before().collect()))
        ra = sorted(map(tuple, after().collect()))
        assert rb == ra and len(ra) > 0, f"{name}: rows differ"
        print(f"{name}: rows identical ({len(ra)})", flush=True)
        b, a = timed_alternating(
            before, after, reps, first="b" if order == "ab" else "a"
        )
        print(f"{name}: before {b:.3f}s -> after {a:.3f}s "
              f"({b / a:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
