"""Structural guarantees of the deterministic sketches (ext/sketches.py)
and the weighted sampler — properties the oracle-parity hash check can't
express: CMS one-sided error, KMV error bound + mergeability, A-ExpJ
weight skew. Parity itself is covered by tests/test_oracle_parity.py."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cms_rows(spark, sf_dir):
    from dariadb_spark.ext.sketches import sketch_cms_topk

    return sketch_cms_topk(spark, sf_dir).collect()


def test_cms_never_undercounts(cms_rows):
    # The count-min guarantee: estimates are exact counts plus hash
    # collisions, never less.
    assert len(cms_rows) > 0
    for r in cms_rows:
        assert r.cms_est >= r.exact_cnt, r
        assert r.overcount == r.cms_est - r.exact_cnt


def test_cms_collisions_exercised(cms_rows):
    # Parameters are deliberately small (width 256 vs ~4.5k vocab) so the
    # fixtures exercise the error path — if every estimate were exact the
    # sketch would be an over-provisioned hash table, not a sketch.
    assert any(r.overcount > 0 for r in cms_rows)


def test_kmv_error_within_theory(spark, sf_dir):
    # KMV standard error is ~1/sqrt(k-2) ≈ 12.7% at k=64; assert a 3-sigma
    # envelope per group (fixtures are fixed, so this is deterministic).
    from dariadb_spark.ext.sketches import sketch_kmv_distinct

    rows = sketch_kmv_distinct(spark, sf_dir).collect()
    assert len(rows) == 5  # one per language
    for r in rows:
        assert r.rel_err_pct < 3 * 100 / np.sqrt(62), r


def test_kmv_sketch_is_mergeable():
    # The property the 100 TB path relies on: the k smallest of a union
    # equal the k smallest of the per-partition partial k-mins.
    rng = np.random.RandomState(7)
    parts = [rng.randint(0, 2**60, size=n) for n in (1000, 10, 500)]
    k = 64
    full = np.sort(np.unique(np.concatenate(parts)))[:k]
    partials = np.concatenate([np.sort(np.unique(p))[:k] for p in parts])
    merged = np.sort(np.unique(partials))[:k]
    assert np.array_equal(full, merged)


def test_cms_plan_shape(spark, sf_dir):
    # Depth fan-out must be a generator (explode), not a join with a
    # 4-row table (plans as BroadcastNestedLoopJoin); the sketch probe
    # must be a broadcast hash join — the sketch is ≤1024 rows by
    # construction, shuffling the candidates against it would be absurd.
    from dariadb_spark.ext.sketches import sketch_cms_topk

    df = sketch_cms_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # the explode fan-out
    assert "BroadcastHashJoin" in plan  # the sketch probe


def test_weighted_sample_shape_and_skew(spark, sf_dir):
    from dariadb_spark.ext.sampling import WEIGHTED_K, sample_weighted
    from dariadb_spark.model import load_table

    rows = sample_weighted(spark, sf_dir).collect()
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    docs = load_table(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    assert len(per_src) == n_sources
    for src, rs in per_src.items():
        assert len(rs) == WEIGHTED_K, src
        assert sorted(r.rk for r in rs) == list(range(1, WEIGHTED_K + 1))
    # Length-proportional inclusion must skew the sample long vs the corpus.
    corpus_mean = docs.groupBy().avg("n_chars").collect()[0][0]
    sample_mean = float(np.mean([r.n_chars for r in rows]))
    assert sample_mean > corpus_mean
