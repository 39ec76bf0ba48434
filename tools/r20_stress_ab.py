"""r20 item-9 stress A/Bs (VERDICT r19 item 9): re-run the r19-rejected
restructures at well-above-fixture scale to settle whether each
rejection was real or a latency-floor artifact.

Cases (all verified row-identical before timing; interleaved
alternation per tools/r20_graph_ab.py):

1. sem_dedup assignment pin — pin the (vec_id, cid, e, norm) table
   feeding 3 consumers vs the lazy r15-audited form, on 20k synthetic
   64-dim vectors (10x fixture; pair volume scales ~100x).
2. text_diversity tagged-explode — one tagged explode + groupBy(lang,n)
   vs the current 3 branch-parallel passes, on 100k synthetic docs.
3. sketch_hll_distinct per-component items pin vs lazy, on 100k docs.

Synthetic data is deterministic (hash/trig expressions over
spark.range) and written once per run to a temp dir shaped like an sf
dir, so the real operators run unmodified.

    python tools/r20_stress_ab.py [case ...] [--order ba] [--reps N]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dariadb_spark.session import get_spark  # noqa: E402

N_DOCS = 100_000
N_VECS = 20_000


def synth_sf_dir(spark) -> str:
    base = tempfile.mkdtemp(prefix="r20_stress_sf_")
    (
        spark.range(N_DOCS)
        .selectExpr(
            "id AS doc_id",
            # ~40-word docs over a 5k-word zipf-ish vocab, deterministic
            "concat_ws(' ', transform(sequence(1, 40), "
            " i -> concat('w', pmod(hash(id * 41 + i), 5000)))) AS text",
            "concat('l', pmod(id, 5)) AS lang",
            "concat('s', pmod(id, 7)) AS source",
            "CAST(200 AS BIGINT) AS n_chars",
        )
        .coalesce(4)
        .write.parquet(f"{base}/documents.parquet")
    )
    (
        spark.range(N_VECS)
        .selectExpr(
            "id AS vec_id",
            # strictly positive components -> nonzero norms everywhere
            "transform(sequence(0, 63), "
            " j -> CAST(cos(id * 0.37 + j * 1.13) + 1.5 AS FLOAT))"
            " AS embedding",
            "CAST(pmod(id, 3) AS INT) AS label",
        )
        .coalesce(4)
        .write.parquet(f"{base}/embeddings.parquet")
    )
    return base


# --- case 1: sem_dedup assignment pin --------------------------------------

def sem_dedup_pinned(spark, sf):
    from dariadb_spark.ext.similarity import (
        SEM_DEDUP_COS, _DOT, _emb, sim_kmeans,
    )

    emb = _emb(spark, sf)
    m = (
        sim_kmeans(spark, sf).select("vec_id", "cid").join(emb, "vec_id")
        .localCheckpoint(eager=True)  # the r19-rejected pin
    )
    a = m.selectExpr("cid", "vec_id AS a_id", "e AS ae", "norm AS anorm")
    b = m.selectExpr("cid", "vec_id AS b_id", "e AS be", "norm AS bnorm")
    cos = "round(" + _DOT.format(a="ae", b="be") + " / (anorm * bnorm), 4)"
    pairs = (
        a.join(b, "cid")
        .where("a_id < b_id")
        .selectExpr("a_id", "b_id", f"{cos} AS cos_ab")
        .where(f"cos_ab >= {SEM_DEDUP_COS}")
    )
    touched = (
        pairs.selectExpr("a_id AS vec_id", "cos_ab")
        .unionByName(pairs.selectExpr("b_id AS vec_id", "cos_ab"))
        .groupBy("vec_id")
        .agg(F.count("*").alias("n_dups"), F.max("cos_ab").alias("max_cos"))
    )
    dropped = (
        pairs.select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )
    return (
        m.select("vec_id", "cid")
        .join(touched, "vec_id", "left")
        .join(dropped, "vec_id", "left")
        .selectExpr(
            "vec_id", "cid",
            "CAST(coalesce(n_dups, 0) AS BIGINT) AS n_dups",
            "coalesce(max_cos, 0.0d) AS max_cos",
            "CAST(is_dropped IS NULL AS INT) AS keep",
        )
        .orderBy("vec_id")
    )


def case_sem_dedup(spark, sf):
    from dariadb_spark.ext.similarity import sem_dedup

    return (lambda: sem_dedup(spark, sf)), (lambda: sem_dedup_pinned(spark, sf))


# --- case 2: text_diversity tagged explode ----------------------------------

def text_diversity_tagged(spark, sf):
    from dariadb_spark.ext.exact import ratio_round_spark
    from dariadb_spark.model import load_table

    docs = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    w = "split(text, ' ')"
    ln2 = f"size({w}) - 1"
    ln3 = f"greatest(size({w}) - 2, 0)"
    g1 = f"transform({w}, x -> struct(1 AS n, x AS g))"
    g2 = (
        f"zip_with(slice({w}, 1, {ln2}), slice({w}, 2, {ln2}),"
        " (a, b) -> struct(2 AS n, concat(a, ' ', b) AS g))"
    )
    g3 = (
        f"zip_with(zip_with(slice({w}, 1, {ln3}), slice({w}, 2, {ln3}),"
        " (a, b) -> concat(a, ' ', b)),"
        f" slice({w}, 3, {ln3}),"
        " (p, c) -> struct(3 AS n, concat(p, ' ', c) AS g))"
    )
    # slice(.., size-1) errors on 1-word docs for g2: guard with filter
    ex = (
        docs.where(F.size(F.split(F.col("text"), " ")) >= 2)
        .selectExpr("lang", f"explode(concat({g1}, {g2}, {g3})) AS t")
        .unionByName(
            docs.where(F.size(F.split(F.col("text"), " ")) < 2)
            .selectExpr("lang", f"explode({g1}) AS t")
        )
    )
    return (
        ex.groupBy("lang", F.col("t.n").alias("n"))
        .agg(
            F.count("*").alias("total"),
            F.count_distinct("t.g").alias("uniq"),
        )
        .selectExpr(
            "lang", "CAST(n AS INT) AS n", "total", "uniq",
            ratio_round_spark("uniq", "total", 6) + " AS distinct_ratio",
        )
        .orderBy("lang", "n")
    )


def case_text_diversity(spark, sf):
    from dariadb_spark.ext.text import text_diversity

    return (
        lambda: text_diversity(spark, sf)
    ), (lambda: text_diversity_tagged(spark, sf))


# --- case 3: hll_distinct per-component items pin ---------------------------

def hll_distinct_pinned(spark, sf):
    from dariadb_spark.ext.sketches import _hll_items, sketch_hll_distinct

    items = _hll_items(spark, sf).localCheckpoint(eager=True)
    return sketch_hll_distinct(spark, sf, items=items)


def case_hll_distinct(spark, sf):
    from dariadb_spark.ext.sketches import sketch_hll_distinct

    return (
        lambda: sketch_hll_distinct(spark, sf)
    ), (lambda: hll_distinct_pinned(spark, sf))


CASES = {
    "sem_dedup": case_sem_dedup,
    "text_diversity": case_text_diversity,
    "hll_distinct": case_hll_distinct,
}


def main():
    argv = sys.argv[1:]
    order, reps, names = "ab", 3, []
    i = 0
    while i < len(argv):
        if argv[i] == "--order":
            order = argv[i + 1]
            i += 2
        elif argv[i] == "--reps":
            reps = int(argv[i + 1])
            i += 2
        else:
            names.append(argv[i])
            i += 1
    names = names or list(CASES)
    spark = get_spark("r20-stress-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sf = synth_sf_dir(spark)
    print(f"synth sf dir: {sf} (docs={N_DOCS}, vecs={N_VECS})", flush=True)

    from tools.r20_graph_ab import timed_alternating

    for name in names:
        current, variant = CASES[name](spark, sf)
        rc = sorted(map(tuple, current().collect()))
        rv = sorted(map(tuple, variant().collect()))
        assert rc == rv and len(rc) > 0, f"{name}: rows differ ({len(rc)} vs {len(rv)})"
        print(f"{name}: rows identical ({len(rc)})", flush=True)
        c, v = timed_alternating(
            current, variant, reps, first="b" if order == "ab" else "a"
        )
        print(
            f"{name}: current {c:.3f}s vs variant {v:.3f}s "
            f"({c / v:.2f}x; >1 means the r19 rejection was wrong at scale)",
            flush=True,
        )

    import shutil

    shutil.rmtree(sf, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
