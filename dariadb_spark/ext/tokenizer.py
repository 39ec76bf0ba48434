"""[EXT] BPE tokenizer induction — learn byte-pair-encoding merge rules
from the corpus, the step a training-data pipeline runs before any
token counting is meaningful. Three merge rounds unrolled with an exact
DuckDB oracle (the same unrolled-iteration pattern as the 2-round
k-means in ext/similarity.py), frequency-weighted over word TYPES.

Staged in round 7, registered + driver-windowed in round 8; parity and a
pure-Python greedy-BPE reference are pinned in tests/test_tokenizer.py.

Scale (100 TB): BPE learning never touches the corpus after the word
count — it iterates over the word-frequency TABLE (vocabulary-sized,
Zipf-bounded; this is how production tokenizer trainers work). The
corpus-sized work is exactly one explode + groupBy(word), shared with
``ext_text_word_freq``. Each merge round is then: a pair-count
aggregate over vocab rows (map-side combined), a 1-row argmax, and a
per-row string rewrite — all declarative, no driver round-trips (the
argmax joins back as a broadcast 1-row table, the sanctioned
tiny-build BroadcastNestedLoopJoin pattern).

The merge-application encoding is the part that must be EXACT: symbols
are joined with DOUBLE bars and the sequence is wrapped in them
(``||a||b||c||``); the pair (x, y) rewrites via
``replace(seq, '|x||y|', '|xy|')``. Each match consumes one bar of
each flanking double boundary, so adjacent occurrences (``a a a`` with
pair ``(a, a)``) remain non-overlapping in the ORIGINAL string and
left-to-right ``replace`` — identical semantics in Spark and DuckDB,
probed in tests — performs exactly greedy BPE merging: mid-symbol
matches are impossible (every pattern symbol is fully bar-delimited)
and ``a a a → [aa, a]``, not ``[aa, aa]``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dariadb_spark.ext.exact import (
    ratio_round_duck as _rr_d,
    ratio_round_spark as _rr_s,
)
from dariadb_spark.model import load_table
from dariadb_spark.registry import register

BPE_ROUNDS = 3

#: chars → '||a||b||c||' (double-bar boundaries, see module docstring).
#: regexp backref syntax differs: $1 (Spark) vs \1 + 'g' flag (DuckDB).
_SYM_SPARK = "concat('||', regexp_replace(word, '(.)', '$1||'))"
_SYM_DUCK = "'||' || regexp_replace(word, '(.)', '\\1||', 'g')"

#: symbol list of a sequence: split on '||', drop the empty ends.
_SYMS = "filter(split(seq, '\\\\|\\\\|'), x -> x != '')"
_SYMS_DUCK = "list_filter(string_split(seq, '||'), x -> x != '')"


#: The bar-delimited encoding requires bar-free words: a literal '|'
#: inside a word would corrupt the symbol boundaries and produce wrong
#: merges IDENTICALLY in both engines (parity can't catch it — r7
#: ADVICE). Enforced, not assumed: both engines drop such words from
#: the vocabulary before symbolization (token-stats' vocab join then
#: excludes them from the per-word counts too, consistently).
_BAR_FREE_SPARK = "word NOT LIKE '%|%'"
_BAR_FREE_DUCK = "word NOT LIKE '%|%'"

#: Pinned vocab tables from the PREVIOUS bpe_learn/token_stats call,
#: released on the next call (the kcore rotation pattern — ADVICE r19:
#: without explicit rotation every invocation leaked one pinned block
#: set per merge round until RDD GC, nondeterministic memory pressure
#: in long-lived sessions). Intra-invocation unpersist is NOT safe
#: here: the merges union (learn) references every round's ``best``,
#: whose lineage is truncated at that round's pin — dropping a
#: superseded pin would make the final evaluation unrecomputable.
_BPE_PREV_CHECKPOINTS: list = []


def _release_bpe_checkpoints() -> None:
    while _BPE_PREV_CHECKPOINTS:
        try:
            _BPE_PREV_CHECKPOINTS.pop().unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing retained anyway


def _pair_rounds_spark(docs: DataFrame):
    """Returns (merges_df) — one row per learned merge round.

    r19 perf: the vocabulary table (Zipf-bounded — KBs at any corpus
    scale) is localCheckpoint-pinned at round 0 and after each round's
    rewrite (the kcore rotation pattern): each unrolled round has two
    consumers (the pair aggregate and the next rewrite) plus the merges
    union, which otherwise re-inline the corpus word count per
    consumer. Isolated best-of-3 at sf0.1 (token_stats): 1.13 → 0.86 s,
    rows identical; pin cost is a vocab-sized job per round."""
    _release_bpe_checkpoints()
    words = (
        docs.selectExpr("explode(split(text, ' ')) AS word")
        .where(_BAR_FREE_SPARK)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .selectExpr("freq", f"{_SYM_SPARK} AS seq")
        .localCheckpoint(eager=True)
    )
    _BPE_PREV_CHECKPOINTS.append(words)
    merges = None
    for r in range(1, BPE_ROUNDS + 1):
        pairs = (
            words.selectExpr(
                "freq",
                f"explode(zip_with(slice({_SYMS}, 1, size({_SYMS}) - 1), "
                f"slice({_SYMS}, 2, size({_SYMS}) - 1), "
                "(x, y) -> concat(x, ' ', y))) AS pair",
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("pair_count"))
        )
        best = (
            pairs.orderBy(F.desc("pair_count"), F.asc("pair"))
            .limit(1)
            .selectExpr(
                f"{r}L AS round",
                "pair",
                "replace(pair, ' ', '') AS merged",
                "pair_count",
            )
        )
        merges = best if merges is None else merges.unionByName(best)
        # apply the round's merge to every sequence
        words = words.crossJoin(
            F.broadcast(best.selectExpr("pair AS _p", "merged AS _m"))
        ).selectExpr(
            "freq",
            "replace(seq, concat('|', replace(_p, ' ', '||'), '|'), "
            "concat('|', _m, '|')) AS seq",
        ).localCheckpoint(eager=True)
        _BPE_PREV_CHECKPOINTS.append(words)
    return merges.orderBy("round")


def bpe_learn(spark: SparkSession, sf: str) -> DataFrame:
    """The learned merge table: (round, pair, merged, pair_count)."""
    return _pair_rounds_spark(load_table(spark, sf, "documents"))


def _round_ctes_duck() -> str:
    parts = [
        """w0 AS (SELECT count(*) AS freq, {sym} AS seq
       FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       WHERE {bar_free}
       GROUP BY word)""".format(sym=_SYM_DUCK, bar_free=_BAR_FREE_DUCK)
    ]
    for r in range(1, BPE_ROUNDS + 1):
        prev = f"w{r - 1}"
        parts.append(
            f"""p{r} AS (
  SELECT u.pr AS pair, CAST(sum(freq) AS BIGINT) AS pair_count
  FROM (SELECT freq,
               unnest([s[i] || ' ' || s[i + 1]
                       for i in range(1, len(s))]) AS pr
        FROM (SELECT freq, {_SYMS_DUCK} AS s FROM {prev})) u
  GROUP BY u.pr),
b{r} AS (SELECT CAST({r} AS BIGINT) AS round, pair,
                replace(pair, ' ', '') AS merged, pair_count
         FROM p{r} ORDER BY pair_count DESC, pair ASC LIMIT 1),
w{r} AS (SELECT freq,
                replace(seq, '|' || replace(b.pair, ' ', '||') || '|',
                        '|' || b.merged || '|') AS seq
         FROM {prev}, b{r} b)"""
        )
    return ",\n".join(parts)


BPE_LEARN_SQL = (
    "WITH "
    + _round_ctes_duck()
    + "\n"
    + "\nUNION ALL ".join(
        f"SELECT round, pair, merged, pair_count FROM b{r}"
        for r in range(1, BPE_ROUNDS + 1)
    )
    + "\nORDER BY round"
)


def bpe_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Apply the learned merges and report per-language token economy:
    whitespace words, post-BPE tokens, characters, and the tokens-per-
    word ratio — the number a budget planner actually wants from a
    tokenizer. The application is vocabulary-routed: documents join
    their words against the REWRITTEN vocab table (word → token count
    after all merges), a broadcast join on the Zipf-bounded vocab — the
    per-document text is never re-symbolized.

    Vocab-table pin rotation per round as in :func:`_pair_rounds_spark`
    (r19 perf; 1.13 → 0.86 s isolated best-of-3 at sf0.1)."""
    docs = load_table(spark, sf, "documents")
    _release_bpe_checkpoints()
    words = (
        docs.selectExpr("explode(split(text, ' ')) AS word")
        .where(_BAR_FREE_SPARK)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .selectExpr("word", "freq", f"{_SYM_SPARK} AS seq")
        .localCheckpoint(eager=True)
    )
    _BPE_PREV_CHECKPOINTS.append(words)
    merges = None
    for r in range(1, BPE_ROUNDS + 1):
        pairs = (
            words.selectExpr(
                "freq",
                f"explode(zip_with(slice({_SYMS}, 1, size({_SYMS}) - 1), "
                f"slice({_SYMS}, 2, size({_SYMS}) - 1), "
                "(x, y) -> concat(x, ' ', y))) AS pair",
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("pair_count"))
        )
        best = pairs.orderBy(F.desc("pair_count"), F.asc("pair")).limit(1)
        words = words.crossJoin(
            F.broadcast(
                best.selectExpr(
                    "pair AS _p", "replace(pair, ' ', '') AS _m"
                )
            )
        ).selectExpr(
            "word", "freq",
            "replace(seq, concat('|', replace(_p, ' ', '||'), '|'), "
            "concat('|', _m, '|')) AS seq",
        ).localCheckpoint(eager=True)
        _BPE_PREV_CHECKPOINTS.append(words)
    tokens = words.selectExpr("word", f"size({_SYMS}) AS n_tokens")
    per_word = docs.selectExpr(
        "lang", "explode(split(text, ' ')) AS word"
    ).join(F.broadcast(tokens), "word")
    return (
        per_word.groupBy("lang")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tokens").alias("n_bpe_tokens"),
            F.sum(F.length("word")).alias("n_chars"),
        )
        .selectExpr(
            "lang", "n_words", "n_bpe_tokens", "n_chars",
            # exact-integer ratio -> HALF_UP recipe (ext/exact.py)
            _rr_s("n_bpe_tokens", "n_words", 4) + " AS tokens_per_word",
        )
        .orderBy("lang")
    )


def _token_round_ctes_duck() -> str:
    """Like the learn CTEs, but sequences stay keyed by ``word`` so the
    final rewritten vocab can route per-document token counts."""
    parts = []
    for r in range(1, BPE_ROUNDS + 1):
        prev = f"wv{r - 1}"
        parts.append(
            f"""pv{r} AS (
  SELECT u.pr AS pair, sum(freq) AS pair_count
  FROM (SELECT freq,
               unnest([s[i] || ' ' || s[i + 1]
                       for i in range(1, len(s))]) AS pr
        FROM (SELECT freq, {_SYMS_DUCK} AS s FROM {prev})) u
  GROUP BY u.pr),
bv{r} AS (SELECT pair, replace(pair, ' ', '') AS merged FROM pv{r}
          ORDER BY pair_count DESC, pair ASC LIMIT 1),
wv{r} AS (SELECT word, freq,
                 replace(seq, '|' || replace(b.pair, ' ', '||') || '|',
                         '|' || b.merged || '|') AS seq
          FROM {prev}, bv{r} b)"""
        )
    return ",\n".join(parts)


BPE_TOKEN_STATS_SQL = f"""
WITH wv0 AS (SELECT word, count(*) AS freq, {_SYM_DUCK} AS seq
             FROM (SELECT unnest(string_split(text, ' ')) AS word
                   FROM documents)
             WHERE {_BAR_FREE_DUCK}
             GROUP BY word),
{_token_round_ctes_duck()},
tok AS (SELECT word,
               len(list_filter(string_split(seq, '||'), x -> x != ''))
                 AS n_tokens
        FROM wv{BPE_ROUNDS}),
perw AS (SELECT lang, unnest(string_split(text, ' ')) AS word
         FROM documents)
SELECT p.lang, count(*) AS n_words,
       CAST(sum(t.n_tokens) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(length(p.word)) AS BIGINT) AS n_chars,
       {_rr_d("sum(t.n_tokens)", "count(*)", 4)} AS tokens_per_word
FROM perw p JOIN tok t ON p.word = t.word
GROUP BY p.lang ORDER BY p.lang"""


register("ext_bpe_learn", bpe_learn, BPE_LEARN_SQL)
register("ext_bpe_token_stats", bpe_token_stats, BPE_TOKEN_STATS_SQL)


def learn_bpe(docs: DataFrame, rounds: int) -> list[tuple[int, str, str, int]]:
    """Production BPE learning for an ARBITRARY round count — the
    library entry point behind the fixed-3-round oracled queries above
    (those unroll so DuckDB can replay them; real tokenizers run
    thousands of merges, which no unrolled oracle can express).

    MLlib-style driver iteration: the corpus is touched ONCE (word
    count); each round is a pair-count aggregate over the vocab-sized
    frame, a 1-row argmax ``collect`` (the per-iteration driver
    round-trip every iterative Spark algorithm pays), and a broadcast
    merge rewrite. The vocab frame is checkpoint-free because each
    round's plan grows by one replace() — for thousands of rounds,
    ``localCheckpoint()`` every ~50 rounds caps lineage (documented
    here, unnecessary at test scale).

    Returns [(round, pair, merged, pair_count), ...] — same rows the
    3-round ``bpe_learn`` query emits, pinned against the pure-Python
    greedy reference at 10 rounds in tests/test_tokenizer.py."""
    words = (
        docs.selectExpr("explode(split(text, ' ')) AS word")
        .where(_BAR_FREE_SPARK)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .selectExpr("freq", f"{_SYM_SPARK} AS seq")
    )
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        pairs = (
            words.selectExpr(
                "freq",
                f"explode(zip_with(slice({_SYMS}, 1, size({_SYMS}) - 1), "
                f"slice({_SYMS}, 2, size({_SYMS}) - 1), "
                "(x, y) -> concat(x, ' ', y))) AS pair",
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("pair_count"))
        )
        top = (
            pairs.orderBy(F.desc("pair_count"), F.asc("pair")).limit(1).collect()
        )
        if not top:  # every word is a single symbol — nothing to merge
            break
        pair, pair_count = top[0].pair, int(top[0].pair_count)
        merged = pair.replace(" ", "")
        merges.append((r, pair, merged, pair_count))
        pat = "|" + pair.replace(" ", "||") + "|"
        words = words.selectExpr(
            "freq",
            "replace(seq, {p}, {m}) AS seq".format(
                p=repr(pat), m=repr("|" + merged + "|")
            ),
        )
        if r % 50 == 0:  # cap lineage growth on long trainings
            words = words.localCheckpoint(eager=True)
    return merges


# --- Unigram-LM (SentencePiece-style) tokenizer induction -----------------
# STAGED for the round-12 driver window (round-11's is full; the staging
# every late operator goes through). The public recipe: "Subword
# Regularization" (Kudo, ACL 2018) / SentencePiece's unigram trainer —
# seed a substring vocabulary, then EM: segment every word under the
# current piece probabilities, re-estimate probabilities from the
# segmentation counts, prune pieces that fall out of use. This engine
# runs the hard-EM (Viterbi) variant with TWO rounds unrolled so DuckDB
# can replay it exactly — the same unrolled-iteration pattern as
# ``ext_bpe_learn`` / the 2-round k-means; ``learn_unigram`` below is
# the arbitrary-round production loop.
#
# Determinism recipe (the round-9 LR precedent, via _doc_nll): piece
# log-probabilities are int64 micro-units — CAST(round(round(ln(p), 6)
# * 1e6, 0) AS BIGINT) — so every lattice path score is an EXACT
# integer sum, and the best segmentation per word is picked by the
# fully deterministic key (score DESC, n_tokens ASC, path ASC): no
# float comparison anywhere downstream of the one rounded ln.
#
# Scale (100 TB): identical shape to BPE learning — the corpus is
# touched ONCE (word count + the final economy scan); everything else
# iterates over the word-frequency TABLE (vocabulary-sized,
# Zipf-bounded — exactly what SentencePiece's trainer does with its
# --input_sentence_size cap). The Viterbi lattice is built
# declaratively: UNI_MAX_WORD chained broadcast left-joins against the
# piece vocabulary (vocab-sized → always broadcastable; a production
# tokenizer vocab is ≤1M rows ≈ MBs), each extending partial paths by
# one matching piece; completed/dead-end rows pass through the left
# join unchanged. Lattice breadth = segmentations per word, bounded by
# the multi-char vocab density (UNI_MULTI pieces), not by corpus size.
# The only shuffles: the corpus word count, vocab-sized groupBys, and
# a per-word row_number window. DuckDB replays the same lattice as a
# recursive CTE.

UNI_MAX_WORD = 10  # train on words of 1..10 chars (corpus max is 8)
UNI_MAX_PIECE = 4  # candidate pieces: substrings of 1..4 chars
UNI_MULTI = 120  # multi-char vocab slots (top by seed count); chars always kept
UNI_ROUNDS = 2  # unrolled EM rounds in the oracled queries

#: int64 micro-unit log-probability of `{p}` (a 0..1 ratio expression):
#: round(ln, 6) is a 6-dp decimal, so *1e6 + round(,0) is exact (the
#: _doc_nll recipe — ext/curation.py).
_LOGP_MU = "CAST(round(round(ln({p}), 6) * 1000000, 0) AS BIGINT)"


def _uni_words(docs: DataFrame) -> DataFrame:
    """(word, freq) over the trainable domain (1..UNI_MAX_WORD chars)."""
    return (
        docs.selectExpr("explode(split(text, ' ')) AS word")
        .where(f"length(word) BETWEEN 1 AND {UNI_MAX_WORD}")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _logp_vocab(counts: DataFrame, col: str) -> DataFrame:
    """(piece, logp_mu) from a (piece, count) table — the M-step. The
    1-row total joins back as a broadcast (the sanctioned scalar
    pattern); micro-unit conversion per the module recipe."""
    tot = counts.agg(F.sum(col).alias("_tot"))
    return counts.crossJoin(F.broadcast(tot)).selectExpr(
        "piece", _LOGP_MU.format(p=f"{col} / _tot") + " AS logp_mu"
    )


def _viterbi_best(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Best segmentation per word under ``vocab`` — the E-step.

    The lattice is UNI_MAX_WORD chained broadcast LEFT joins: a partial
    path (pos < length) extends by every vocab piece matching at pos;
    completed rows (and dead ends, possible only after round-1 pruning)
    match nothing and pass through unchanged, so the plan stays LINEAR
    in the word length — no union, no recursion, no UDF. The winner per
    word is row_number 1 under (score DESC, ntok ASC, path ASC): exact
    int64 score, then fewest tokens, then lexicographic path — fully
    deterministic and engine-identical (UTF-8 binary string order).
    Returns (word, freq, ntok, path)."""
    vocab = vocab.localCheckpoint(eager=True)  # 10 joins, 1 materialization
    lat = words.selectExpr(
        "word",
        "freq",
        "CAST(0 AS INT) AS pos",
        "CAST(0 AS BIGINT) AS score",
        "CAST(0 AS INT) AS ntok",
        "'' AS path",
    )
    cond = F.expr(
        "pos < length(word) AND substring(word, pos + 1, length(piece)) = piece"
    )
    for _ in range(UNI_MAX_WORD):
        lat = lat.join(F.broadcast(vocab), cond, "left").selectExpr(
            "word",
            "freq",
            "CASE WHEN piece IS NULL THEN pos"
            " ELSE pos + length(piece) END AS pos",
            "CASE WHEN piece IS NULL THEN score"
            " ELSE score + logp_mu END AS score",
            "CASE WHEN piece IS NULL THEN ntok ELSE ntok + 1 END AS ntok",
            "CASE WHEN piece IS NULL THEN path WHEN path = '' THEN piece"
            " ELSE concat(path, ' ', piece) END AS path",
        )
    w = Window.partitionBy("word").orderBy(
        F.desc("score"), F.asc("ntok"), F.asc("path")
    )
    return (
        lat.where("pos = length(word)")
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("word", "freq", "ntok", "path")
    )


def _usage(best: DataFrame) -> DataFrame:
    """(piece, usage): frequency-weighted piece counts of the best
    segmentations. Pieces with zero usage simply don't appear — this IS
    the unigram-LM pruning step (a piece Viterbi never uses contributes
    no likelihood and drops from the vocabulary)."""
    return (
        best.selectExpr("freq", "explode(split(path, ' ')) AS piece")
        .groupBy("piece")
        .agg(F.sum("freq").alias("usage"))
    )


def _uni_pipeline(docs: DataFrame):
    """The 2-round unrolled pipeline: seed vocab → E → M → E → M.
    Returns (best2, usage2, vocab2). Seed = all single chars (always
    kept, so round 1 segments every word) + the top UNI_MULTI
    multi-char substrings by (seed count DESC, piece ASC); seed counts
    weight overlapping occurrences (``aaa`` seeds ``aa`` twice), the
    standard substring-count seeding. localCheckpoints bound the plan:
    each vocab feeds UNI_MAX_WORD joins, each usage feeds a scalar
    total plus a join."""
    words = _uni_words(docs).localCheckpoint(eager=True)
    subs = words.selectExpr(
        "freq",
        "explode(flatten(transform(sequence(1, length(word)), s -> "
        f"transform(sequence(1, least({UNI_MAX_PIECE}, length(word) - s + 1)),"
        " l -> substring(word, s, l))))) AS piece",
    )
    seed = subs.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    multi_w = Window.orderBy(F.desc("cnt"), F.asc("piece"))
    kept = seed.where("length(piece) = 1").unionByName(
        seed.where("length(piece) > 1")
        .withColumn("rk", F.row_number().over(multi_w))
        .where(f"rk <= {UNI_MULTI}")
        .drop("rk")
    )
    vocab0 = _logp_vocab(kept, "cnt")
    usage1 = _usage(_viterbi_best(words, vocab0)).localCheckpoint(eager=True)
    vocab1 = _logp_vocab(usage1, "usage")
    best2 = _viterbi_best(words, vocab1).localCheckpoint(eager=True)
    usage2 = _usage(best2).localCheckpoint(eager=True)
    vocab2 = _logp_vocab(usage2, "usage")
    return best2, usage2, vocab2


def unigram_lm(spark: SparkSession, sf: str) -> DataFrame:
    """The learned unigram-LM vocabulary after 2 hard-EM rounds:
    (piece, usage, logp_mu) — frequency-weighted Viterbi usage and the
    final micro-unit log-probability, most-used first."""
    docs = load_table(spark, sf, "documents")
    _, usage2, vocab2 = _uni_pipeline(docs)
    return (
        usage2.join(vocab2, "piece")
        .select("piece", F.col("usage").cast("long").alias("usage"), "logp_mu")
        .orderBy(F.desc("usage"), F.asc("piece"))
    )


def unigram_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language token economy under the final unigram segmentation
    — the direct comparison row for ``ext_bpe_token_stats`` (same
    columns, same corpus scan shape). Vocabulary-routed like BPE: the
    per-word token counts come from the round-2 best segmentations
    (word-vocab-sized, broadcast); words outside the trained domain
    (> UNI_MAX_WORD chars) fall back to character segmentation, the
    byte-fallback convention of real unigram tokenizers."""
    docs = load_table(spark, sf, "documents")
    best2, _, _ = _uni_pipeline(docs)
    tok = best2.selectExpr("word", "ntok")
    per_word = docs.selectExpr(
        "lang", "explode(split(text, ' ')) AS word"
    ).join(F.broadcast(tok), "word", "left")
    return (
        per_word.groupBy("lang")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.expr("coalesce(ntok, length(word))"))
            .cast("long")
            .alias("n_uni_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
        )
        .selectExpr(
            "lang",
            "n_words",
            "n_uni_tokens",
            "n_chars",
            _rr_s("n_uni_tokens", "n_words", 4) + " AS tokens_per_word",
        )
        .orderBy("lang")
    )


def _uni_vocab_cte(name: str, src: str, col: str) -> str:
    logp = _LOGP_MU.format(p=f"{col} / t.tot")
    return (
        f"{name} AS (SELECT piece, {logp} AS logp_mu\n"
        f"  FROM {src}, (SELECT sum({col}) AS tot FROM {src}) t)"
    )


def _uni_round_ctes(i: int, vocab: str) -> str:
    """Lattice round i as a recursive CTE (the declarative twin of
    _viterbi_best's chained joins), plus best/usage CTEs."""
    return f"""lat{i} AS (
  SELECT word, freq, 0 AS pos, CAST(0 AS BIGINT) AS score, 0 AS ntok,
         '' AS path FROM uwords
  UNION ALL
  SELECT l.word, l.freq, l.pos + length(v.piece), l.score + v.logp_mu,
         l.ntok + 1,
         CASE WHEN l.path = '' THEN v.piece
              ELSE l.path || ' ' || v.piece END
  FROM lat{i} l JOIN {vocab} v
    ON l.pos < length(l.word)
   AND substring(l.word, l.pos + 1, length(v.piece)) = v.piece),
best{i} AS (SELECT word, freq, ntok, path FROM (
    SELECT word, freq, ntok, path,
           row_number() OVER (PARTITION BY word
               ORDER BY score DESC, ntok ASC, path ASC) AS rn
    FROM lat{i} WHERE pos = length(word)) WHERE rn = 1),
usage{i} AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS usage
  FROM (SELECT freq, unnest(string_split(path, ' ')) AS piece FROM best{i})
  GROUP BY piece)"""


_UNI_CTES = f"""uwords AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE length(word) BETWEEN 1 AND {UNI_MAX_WORD} GROUP BY word),
useed AS (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT freq,
               unnest(flatten([[substring(word, s, l)
                 for l in range(1, least({UNI_MAX_PIECE},
                                         length(word) - s + 1) + 1)]
                 for s in range(1, length(word) + 1)])) AS piece
        FROM uwords)
  GROUP BY piece),
ukept AS (
  SELECT piece, cnt FROM useed WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt,
           row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rk
    FROM useed WHERE length(piece) > 1) WHERE rk <= {UNI_MULTI}),
{_uni_vocab_cte("uvocab0", "ukept", "cnt")},
{_uni_round_ctes(1, "uvocab0")},
{_uni_vocab_cte("uvocab1", "usage1", "usage")},
{_uni_round_ctes(2, "uvocab1")},
{_uni_vocab_cte("uvocab2", "usage2", "usage")}"""


UNIGRAM_LM_SQL = f"""WITH RECURSIVE {_UNI_CTES}
SELECT u.piece, u.usage, v.logp_mu
FROM usage2 u JOIN uvocab2 v ON u.piece = v.piece
ORDER BY u.usage DESC, u.piece ASC"""


UNIGRAM_TOKEN_STATS_SQL = f"""WITH RECURSIVE {_UNI_CTES},
uperw AS (SELECT lang, unnest(string_split(text, ' ')) AS word
          FROM documents)
SELECT p.lang, count(*) AS n_words,
       CAST(sum(coalesce(t.ntok, length(p.word))) AS BIGINT)
         AS n_uni_tokens,
       CAST(sum(length(p.word)) AS BIGINT) AS n_chars,
       {_rr_d("sum(coalesce(t.ntok, length(p.word)))", "count(*)", 4)}
         AS tokens_per_word
FROM uperw p LEFT JOIN best2 t ON p.word = t.word
GROUP BY p.lang ORDER BY p.lang"""


def learn_unigram(
    docs: DataFrame, rounds: int
) -> list[tuple[str, int, int]]:
    """Production unigram-LM training for an ARBITRARY round count —
    the library entry point behind the fixed-2-round oracled queries
    (the ``learn_bpe`` relationship). Same seed, E-step, and M-step as
    :func:`_uni_pipeline`; each round is one Viterbi pass over the
    vocab-sized word table plus a vocab-sized re-estimate, with
    localCheckpoints bounding lineage exactly as the unrolled form.
    Returns [(piece, usage, logp_mu), ...] sorted (usage DESC, piece)
    — identical rows to ``unigram_lm`` at rounds=UNI_ROUNDS, pinned in
    tests/test_tokenizer.py."""
    words = _uni_words(docs).localCheckpoint(eager=True)
    subs = words.selectExpr(
        "freq",
        "explode(flatten(transform(sequence(1, length(word)), s -> "
        f"transform(sequence(1, least({UNI_MAX_PIECE}, length(word) - s + 1)),"
        " l -> substring(word, s, l))))) AS piece",
    )
    seed = subs.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    multi_w = Window.orderBy(F.desc("cnt"), F.asc("piece"))
    kept = seed.where("length(piece) = 1").unionByName(
        seed.where("length(piece) > 1")
        .withColumn("rk", F.row_number().over(multi_w))
        .where(f"rk <= {UNI_MULTI}")
        .drop("rk")
    )
    vocab = _logp_vocab(kept, "cnt")
    usage = None
    for _ in range(rounds):
        usage = _usage(_viterbi_best(words, vocab)).localCheckpoint(
            eager=True
        )
        vocab = _logp_vocab(usage, "usage")
    out = (
        usage.join(vocab, "piece")
        .select("piece", F.col("usage").cast("long").alias("usage"), "logp_mu")
        .orderBy(F.desc("usage"), F.asc("piece"))
    )
    return [(r.piece, int(r.usage), int(r.logp_mu)) for r in out.collect()]


# round 12: the unigram-LM tokenizer pair staged through round 11 joins
# the driver-checked surface (window discipline per registry.py).
register("ext_unigram_lm", unigram_lm, UNIGRAM_LM_SQL)
register("ext_unigram_token_stats", unigram_token_stats, UNIGRAM_TOKEN_STATS_SQL)
