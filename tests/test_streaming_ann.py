"""Streaming PQ encode-on-ingest (streaming/ann.py, STAGED r11):
the standing code table after a batched streaming ingest must equal
the one-shot batch encode AND the DuckDB argmin oracle — statelessness
makes batching invisible — and incremental appends must never rewrite
earlier codes."""

from __future__ import annotations

import duckdb


def test_streaming_pq_codes_match_batch_and_oracle(spark, oracle_sf_dir):
    from dariadb_spark.ext.similarity import (
        PQ_M,
        STREAMING_PQ_CODES_SQL,
        pq_encode_arrow,
    )
    from dariadb_spark.model import load_table
    from dariadb_spark.streaming.ann import (
        init_codebooks_from_corpus,
        streaming_pq_ingest_parity,
    )

    streamed = [
        tuple(r)
        for r in streaming_pq_ingest_parity(spark, oracle_sf_dir).collect()
    ]
    n_corpus = load_table(spark, oracle_sf_dir, "embeddings").count()
    assert len(streamed) == n_corpus  # every ingested vector is indexed

    # 1. == the one-shot batch encode (identical code path, no stream)
    emb = load_table(spark, oracle_sf_dir, "embeddings").selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
    )
    codebooks = init_codebooks_from_corpus(spark, oracle_sf_dir)
    batch = [
        tuple(r)
        for r in pq_encode_arrow(emb, codebooks).orderBy("vec_id").collect()
    ]
    assert streamed == batch

    # 2. == the engine-independent DuckDB argmin replay
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{oracle_sf_dir}/embeddings.parquet')"
    )
    oracle = [tuple(r) for r in con.execute(STREAMING_PQ_CODES_SQL).fetchall()]
    assert streamed == oracle

    # 3. the codebook's own vectors encode to themselves (distance 0
    # to their centroid) — the sanity anchor for the shared init
    by_id = {r[0]: r[1:] for r in streamed}
    from dariadb_spark.ext.similarity import PQ_K

    for k in range(PQ_K):
        assert by_id[k] == tuple([k] * PQ_M), (k, by_id[k])


def test_streaming_pq_appends_are_immutable(spark, oracle_sf_dir, tmp_path):
    """Append-only index maintenance: codes emitted for the first drop
    are byte-identical whether or not a second drop later arrives —
    the stream never restates earlier index entries."""
    from dariadb_spark.model import load_table
    from dariadb_spark.streaming.ann import (
        init_codebooks_from_corpus,
        streaming_pq_encode,
    )
    from dariadb_spark.streaming.scratch import parity_stream_partitions

    codebooks = init_codebooks_from_corpus(spark, oracle_sf_dir)
    emb = load_table(spark, oracle_sf_dir, "embeddings")
    first = emb.where("vec_id % 2 = 0")

    d1 = str(tmp_path / "only_first")
    first.write.parquet(d1)
    with parity_stream_partitions(spark):
        q = streaming_pq_encode(spark, d1, codebooks, "pq_imm_a")
    q.awaitTermination(600)
    codes_first_alone = {
        tuple(r) for r in spark.table("pq_imm_a").collect()
    }

    d2 = str(tmp_path / "both")
    first.write.parquet(d2)
    emb.where("vec_id % 2 = 1").write.mode("append").parquet(d2)
    with parity_stream_partitions(spark):
        q = streaming_pq_encode(
            spark, d2, codebooks, "pq_imm_b", max_files_per_trigger=1
        )
    q.awaitTermination(600)
    codes_both = {tuple(r) for r in spark.table("pq_imm_b").collect()}

    assert codes_first_alone <= codes_both
    assert len(codes_both) == emb.count()
    spark.catalog.dropTempView("pq_imm_a")
    spark.catalog.dropTempView("pq_imm_b")
