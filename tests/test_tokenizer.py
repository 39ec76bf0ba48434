"""BPE tokenizer induction (ext/tokenizer.py, staged): DuckDB parity,
a pure-Python greedy-BPE reference, and the boundary-encoding edge
cases the double-bar merge-application trick must get exactly right."""

from __future__ import annotations

from collections import Counter

import pytest


def _py_bpe(freq: dict[str, int], rounds: int):
    """Reference greedy BPE: per round, weighted pair counts → best pair
    (count DESC, pair ASC) → greedy left-to-right merge in every word."""
    vocab = {w: list(w) for w in freq}
    merges = []
    for r in range(rounds):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freq[w]
        top = max(pc.values())
        best = min(
            (p for p, c in pc.items() if c == top),
            key=lambda p: " ".join(p),
        )
        merges.append((r + 1, " ".join(best), "".join(best), pc[best]))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_learn_oracle_parity_and_python_reference(spark, oracle_sf_dir):
    import duckdb

    from dariadb_spark.ext.tokenizer import (
        BPE_LEARN_SQL,
        BPE_ROUNDS,
        bpe_learn,
    )
    from dariadb_spark.model import load_table

    rows = [tuple(r) for r in bpe_learn(spark, oracle_sf_dir).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{oracle_sf_dir}/documents.parquet')"
    )
    oracle = [tuple(r) for r in con.execute(BPE_LEARN_SQL).fetchall()]
    con.close()
    assert rows == oracle
    freq: Counter = Counter()
    for r in load_table(spark, oracle_sf_dir, "documents").collect():
        freq.update(r.text.split(" "))
    ref, _ = _py_bpe(dict(freq), BPE_ROUNDS)
    assert rows == ref


def test_bpe_token_stats_parity_and_bounds(spark, oracle_sf_dir):
    # Learn → apply → count: parity with the DuckDB twin, plus the
    # structural bounds — after merges, per-word token counts sit
    # strictly between 1 and the character count, so corpus-wide
    # n_words < n_bpe_tokens < n_chars.
    import duckdb

    from dariadb_spark.ext.tokenizer import (
        BPE_TOKEN_STATS_SQL,
        bpe_token_stats,
    )

    rows = bpe_token_stats(spark, oracle_sf_dir).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{oracle_sf_dir}/documents.parquet')"
    )
    oracle = con.execute(BPE_TOKEN_STATS_SQL).fetchall()
    con.close()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, oracle))
    for r in rows:
        assert r.n_words < r.n_bpe_tokens < r.n_chars, r
        assert 1.0 < r.tokens_per_word, r


@pytest.mark.parametrize(
    "corpus",
    [
        # overlap: (a,a) must merge greedily → [aa, a]; filler keeps
        # pairs available for all BPE_ROUNDS rounds
        ["aaa aaa aaa qrstu qrstu"],
        ["abab abab abab vwxyz"],  # learned symbol reused across rounds
        ["xy xy xy xyz mnopq"],  # merged symbol never split mid-symbol
    ],
)
def test_bpe_merge_application_matches_reference(spark, corpus, tmp_path):
    # The double-bar replace encoding vs the definitional greedy merge,
    # on the adversarial shapes (adjacent overlapping pairs, symbols
    # that are substrings of other symbols).
    from dariadb_spark.ext.tokenizer import BPE_ROUNDS, bpe_learn

    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)],
                               "doc_id long, text string")
    d = str(tmp_path / "docs")
    df.write.parquet(d + "/documents.parquet")
    freq: Counter = Counter(w for t in corpus for w in t.split(" "))
    ref, _ = _py_bpe(dict(freq), BPE_ROUNDS)
    got = [tuple(r) for r in bpe_learn(spark, str(tmp_path / "docs")).collect()]
    # bpe_learn loads <sf>/documents.parquet; we wrote it above
    assert got == ref, (got, ref)


def test_learn_bpe_arbitrary_rounds_matches_python_reference(
    spark, oracle_sf_dir
):
    # The production entry point at a round count NO unrolled oracle
    # can express (10 rounds): merge-for-merge equal to the
    # definitional Python implementation, and a strict continuation of
    # the 3-round oracled query.
    from collections import Counter

    from dariadb_spark.ext.tokenizer import learn_bpe
    from dariadb_spark.model import load_table

    docs = load_table(spark, oracle_sf_dir, "documents")
    got = learn_bpe(docs, 10)

    words = [
        w
        for (t,) in docs.select("text").collect()
        for w in t.split(" ")
        if "|" not in w
    ]
    ref, _ = _py_bpe(dict(Counter(words)), 10)
    assert got == ref
    assert len(got) == 10


def test_bpe_bar_words_dropped_identically(spark, tmp_path):
    # The bar-delimited encoding's precondition is ENFORCED, not
    # assumed (r7 ADVICE): a corpus word containing '|' is dropped from
    # the vocabulary in both engines, so the learned merges equal those
    # of the bar-free corpus — and parity still holds.
    import duckdb

    from dariadb_spark.ext.tokenizer import BPE_LEARN_SQL, bpe_learn

    rows = [
        (1, "aa bb aa bb aa", "en", "s", 14),
        (2, "aa x|y aa bb x|y", "en", "s", 16),  # '|' words must drop
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    d = str(tmp_path / "sfbar")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = [tuple(r) for r in bpe_learn(spark, d).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    oracle = [tuple(r) for r in con.execute(BPE_LEARN_SQL).fetchall()]
    con.close()
    assert got == oracle
    # merges come from the bar-free vocab {aa: 5, bb: 3} only:
    # round 1 merges ('a', 'a') with weight 5
    assert got[0][1:] == ("a a", "aa", 5)
    assert all("|" not in merged for (_r, _p, merged, _c) in got)
