"""Streaming ingest quality gate (streaming/gate.py) — the parity claim
the module docstring makes, pinned: the checkpointed micro-batch gate,
the one-shot batch gate, and the DuckDB oracle replay all land on the
same standing verdict table, and planted corpora hit every verdict
branch (boilerplate-heavy drop, low-quality drop, clean keep).

Registered as ``streaming_quality_gate_parity`` since round 12 (window
discipline per registry.py); these tests are the pytest half of the
staging contract.
"""

from __future__ import annotations

import pytest


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(path)


def test_gate_streaming_matches_batch_and_oracle(spark, oracle_sf_dir):
    """Three-way parity at the oracle SF: streaming fold (one file per
    micro-batch) == batch gate == DuckDB replay of the registered
    oracle."""
    from dariadb_spark.ext.pipeline import _quality_gate_sql
    from dariadb_spark.model import load_table
    from dariadb_spark.streaming.gate import (
        boiler_chunk_artifact,
        gate_verdicts,
        streaming_quality_gate_parity,
    )
    from tests.parity import duckdb_connection

    got = [
        tuple(r)
        for r in streaming_quality_gate_parity(spark, oracle_sf_dir)
        .collect()
    ]
    assert got, "gate parity returned no rows"

    docs = load_table(spark, oracle_sf_dir, "documents").where(
        "text IS NOT NULL"
    )
    artifact = boiler_chunk_artifact(docs)
    batch = [
        tuple(r)
        for r in gate_verdicts(docs, artifact).orderBy("doc_id").collect()
    ]
    assert got == batch

    con = duckdb_connection(oracle_sf_dir)
    oracle = [tuple(r) for r in con.execute(_quality_gate_sql()).fetchall()]
    assert got == oracle


def test_gate_planted_verdicts(spark, tmp_path):
    """Planted corpus hits every branch: a 10-word chunk shared by two
    docs is boilerplate; a doc that is ALL that chunk fails the frac
    gate; a doc under FUNNEL_MIN_CHARS fails the scalar gate; a long
    clean doc passes both."""
    from dariadb_spark.ext.dedup import BOILER_MAX_FRAC
    from dariadb_spark.ext.pipeline import FUNNEL_MIN_CHARS
    from dariadb_spark.streaming.gate import (
        boiler_chunk_artifact,
        gate_verdicts,
    )
    from dariadb_spark.model import load_table

    chunk = " ".join(f"w{i}" for i in range(10))  # one exact gate chunk
    clean = " ".join(f"u{i}" for i in range(60))
    clean2 = " ".join(f"v{i}" for i in range(60))
    rows = [
        # doc 1: pure boilerplate (frac 1.0 → dropped), long enough to
        # pass the scalar gate on its own
        (1, " ".join([chunk] * 8), "en", "a", len(" ".join([chunk] * 8))),
        # doc 2: shares the chunk once in 7 chunks (frac < max) + clean
        (2, chunk + " " + clean, "en", "a", len(chunk + " " + clean)),
        # doc 3: clean and long → kept
        (3, clean2, "en", "b", len(clean2)),
        # doc 4: clean but too short → scalar gate drops it
        (4, "tiny doc", "en", "b", 8),
    ]
    d = str(tmp_path / "docs")
    _write_docs(spark, d + "/documents.parquet", rows)
    docs = load_table(spark, d, "documents").where("text IS NOT NULL")

    artifact = boiler_chunk_artifact(docs)
    assert chunk in artifact
    got = {r.doc_id: r for r in gate_verdicts(docs, artifact).collect()}

    assert got[1].boiler_frac >= BOILER_MAX_FRAC and got[1].kept == 0
    assert got[1].q_pass == 1  # dropped by the frac gate alone
    assert got[2].n_boiler == 1 and got[2].kept == 1
    assert got[3].n_boiler == 0 and got[3].kept == 1
    assert got[4].q_pass == 0 and got[4].kept == 0
    assert rows[3][4] < FUNNEL_MIN_CHARS  # the planted reason holds


def test_gate_artifact_ceiling_fails_loudly(spark, tmp_path, monkeypatch):
    """An artifact past BOILER_ARTIFACT_MAX is a refused broadcast, not
    a silent truncation (the localize_and_cleanup guard philosophy)."""
    import dariadb_spark.streaming.gate as gate
    from dariadb_spark.model import load_table

    # two docs sharing THREE distinct chunks → 3 artifact entries
    shared = [" ".join(f"s{k}_{i}" for i in range(10)) for k in range(3)]
    text = " ".join(shared)
    rows = [(1, text, "en", "a", len(text)), (2, text, "en", "a", len(text))]
    d = str(tmp_path / "docs")
    _write_docs(spark, d + "/documents.parquet", rows)
    docs = load_table(spark, d, "documents")

    monkeypatch.setattr(gate, "BOILER_ARTIFACT_MAX", 2)
    with pytest.raises(ValueError, match="boilerplate artifact exceeds"):
        gate.boiler_chunk_artifact(docs)
