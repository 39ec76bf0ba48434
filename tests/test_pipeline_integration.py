"""The LLM-data-pipeline ops COMPOSE: one corpus flows through the
RefinedWeb-ish chain — boilerplate pruning → exact dedup (keep-first)
→ quality gate → mixture plan + deterministic apply → train/val/test
split — each stage consuming the previous stage's survivors. Every
stage is the registered operator (fed via the load_table seam, the
property-test pattern), so this pins that the per-op contracts hold on
each other's outputs, not just on the pristine fixture."""

from __future__ import annotations

from unittest import mock

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def staged_corpus(spark, oracle_sf_dir):
    from dariadb_spark.model import load_table

    return load_table(spark, oracle_sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def _with_docs(module, docs):
    return mock.patch.object(module, "load_table", lambda _s, _sf, _n: docs)


def test_curation_chain_composes(spark, staged_corpus):
    import dariadb_spark.ext.dedup as dedup_mod
    import dariadb_spark.ext.sampling as sampling_mod
    from dariadb_spark.ext.dedup import dedup_boilerplate
    from dariadb_spark.ext.sampling import corpus_mixture_apply, split_assign

    n0 = staged_corpus.count()

    # 1. boilerplate pruning — drop docs that are mostly repeated chunks
    with _with_docs(dedup_mod, staged_corpus):
        verdicts = dedup_boilerplate(spark, "ignored").select(
            "doc_id", "keep"
        )
    stage1 = staged_corpus.join(verdicts, "doc_id").where("keep = 1").drop(
        "keep"
    )
    n1 = stage1.count()
    assert 0 < n1 < n0  # the prune branch fired on fixture near-dups

    # 2. exact dedup, keep-first (min doc_id per content hash)
    w_first = (
        F.row_number()
        .over(Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id"))
        .alias("rn")
    )
    stage2 = (
        stage1.withColumn("rn", w_first).where("rn = 1").drop("rn")
    )
    n2 = stage2.count()
    assert 0 < n2 <= n1

    # 3. quality gate — stopword-ratio bound (the curate_corpus rule)
    stop_ratio = (
        "size(filter(split(text, ' '), x -> x = 'a' OR x = 'the'))"
        " / CAST(size(split(text, ' ')) AS DOUBLE)"
    )
    stage3 = stage2.where(f"{stop_ratio} <= 0.35")
    n3 = stage3.count()
    assert 0 < n3 <= n2

    # 4. mixture plan + deterministic apply over the SURVIVORS
    with _with_docs(sampling_mod, stage3):
        audit = corpus_mixture_apply(spark, "ignored").collect()
    assert audit  # every surviving source is audited
    per_src_avail = {
        r.source: r.n
        for r in stage3.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert set(r.source for r in audit) == set(per_src_avail)
    for r in audit:
        assert 0 <= r.n_docs_kept <= per_src_avail[r.source]
        assert r.achieved_tokens >= 0 and r.expected_tokens > 0
    n_sampled = sum(r.n_docs_kept for r in audit)
    assert 0 < n_sampled <= n3

    # 5. split the sampled corpus — partitions exactly, deterministically
    sampled_count = n_sampled
    splits = {
        r.split: r.n
        for r in split_assign(stage3)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sum(splits.values()) == n3
    assert set(splits) <= {"train", "val", "test"}
    assert splits.get("train", 0) > splits.get("val", 0)

    # determinism: the whole chain replays to identical counts
    with _with_docs(dedup_mod, staged_corpus):
        verdicts2 = dedup_boilerplate(spark, "ignored").select(
            "doc_id", "keep"
        )
    assert (
        staged_corpus.join(verdicts2, "doc_id").where("keep = 1").count()
        == n1
    )
    with _with_docs(sampling_mod, stage3):
        audit2 = corpus_mixture_apply(spark, "ignored").collect()
    assert sorted(map(tuple, audit2)) == sorted(map(tuple, audit))
    assert sampled_count == sum(r.n_docs_kept for r in audit2)


def test_gated_mixture_closes_the_loop(spark, oracle_sf_dir):
    """VERDICT r9 item 2: the composite `ext_curate_gated_mixture`
    query's internal consistency against its own ingredients — the
    chosen threshold IS the best-F1 operating point from the sweep, the
    gate membership matches the scored frame filtered at that
    threshold, and the audit's kept sets are bounded by the gated
    corpus — so the registered oracle hash-check is backed by a
    piecewise replay here."""
    from dariadb_spark.ext.pipeline import curate_gated_mixture
    from dariadb_spark.ext.train import confusion_sweep, scored_embeddings
    from dariadb_spark.model import load_table

    rows = curate_gated_mixture(spark, oracle_sf_dir).collect()
    assert rows

    # one threshold across all sources, and it's the argmax-F1 one
    thrs = {r.thr for r in rows}
    assert len(thrs) == 1
    conf = confusion_sweep(scored_embeddings(spark, oracle_sf_dir)).collect()
    best = max(conf, key=lambda r: (r.f1, -r.thr)).thr
    assert thrs == {best}

    # gate membership: per-source gated counts equal the scored frame
    # joined to documents and filtered at the chosen threshold
    scored = scored_embeddings(spark, oracle_sf_dir).where(f"p > {best!r}")
    docs = load_table(spark, oracle_sf_dir, "documents")
    expect = {
        r.source: r.n
        for r in docs.join(
            scored.selectExpr("vec_id AS doc_id"), "doc_id"
        )
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {r.source: r.n_docs_gated for r in rows} == expect

    # the audit is bounded by what survived the gate, and something
    # was actually sampled below 100% somewhere (fractional rates)
    for r in rows:
        assert 0 <= r.n_docs_kept <= r.n_docs_gated
        assert 0 <= r.achieved_tokens <= r.gated_tokens
        assert r.expected_tokens > 0
    assert any(r.sample_rate < 1.0 for r in rows)


def test_preprocess_funnel_parity_and_stage_semantics(
    spark, oracle_sf_dir
):
    """Staged r11 funnel audit: DuckDB-oracle parity on the fixture,
    funnel monotonicity, split accounting — and a planted corpus where
    EVERY stage provably fires (the fixture's exact dups all die at the
    boilerplate stage, so the dedup column needs its own evidence)."""
    import duckdb

    import dariadb_spark.ext.pipeline as pipe_mod
    from dariadb_spark.ext.pipeline import (
        PREPROCESS_FUNNEL_SQL,
        preprocess_funnel,
    )

    rows = [
        tuple(r) for r in preprocess_funnel(spark, oracle_sf_dir).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{oracle_sf_dir}/documents.parquet')"
    )
    assert rows == [
        tuple(r) for r in con.execute(PREPROCESS_FUNNEL_SQL).fetchall()
    ]
    for lang, raw, d, b, q, tr, va, te in rows:
        assert raw >= d >= b >= q == tr + va + te, lang

    # planted corpus: 40 long clean docs (unique 10-word chunks), one
    # exact duplicate pair among them, and 4 boilerplate-heavy docs —
    # each stage must drop exactly its own victims. (Order is forced:
    # an exact dup pair shares every chunk, so boilerplate-first would
    # eat BOTH copies — the module docstring's dedup-first argument.)
    uniq = lambda i, j: " ".join(
        [f"d{i}c{j}w{k}" for k in range(10)]
    )  # noqa: E731
    header = "nav home about contact login search terms privacy cookie banner"
    mk = lambda i: f"{header} {uniq(i,1)} {uniq(i,2)} {uniq(i,3)}"  # noqa: E731
    rows_in = [(i, mk(i), "en", "src0", 400) for i in range(40)]
    rows_in[7] = (7, mk(3), "en", "src0", 400)  # exact dup of doc 3
    for i in range(40, 44):  # mostly boilerplate
        rows_in.append(
            (i, f"{header} {header} {header} {uniq(i,1)}", "en", "src0", 400)
        )
    docs = spark.createDataFrame(
        rows_in, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    with mock.patch.object(
        pipe_mod, "load_table", lambda _s, _sf, _n: docs
    ):
        out = preprocess_funnel(spark, "ignored").collect()
    (r,) = out
    # dedup drops the copy (doc 7); boilerplate then drops the 4
    # header-stuffed docs among the 43 distinct survivors
    assert (r.n_raw, r.n_dedup_kept, r.n_boiler_kept) == (44, 43, 39)
    assert r.n_quality_kept == 39  # clean docs pass the quality gate
    assert r.n_train + r.n_val + r.n_test == 39
