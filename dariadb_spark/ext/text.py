"""[EXT] text-analysis operators over ``documents`` (X3 / north_star):
token statistics, word frequencies, quality scoring, language histograms,
document fingerprinting (min-hash-of-shingles, a winnowing-style rolling
fingerprint), and an n-gram-heuristic language identifier (Pandas UDF,
with a SQL oracle replaying the heuristic).

Everything except lang-ID stays JVM-side via higher-order array functions
— no Python in the hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dariadb_spark.ext.shingles import _SHINGLE_CTE, _shingled
from dariadb_spark.ext.exact import (
    ratio_round_duck as _rr_d,
    ratio_round_spark as _rr_s,
)
from dariadb_spark.model import load_table
from dariadb_spark.registry import register

STOPWORDS = ("a", "the")
TOP_WORDS = 20


# --- per-document token statistics ---------------------------------------

def text_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token count, distinct count, type-token ratio, avg token length —
    narrow per-row map, no shuffle at all (the scan is the cost)."""
    return load_table(spark, sf, "documents").selectExpr(
        "doc_id",
        "n_chars",
        "size(split(text, ' ')) AS n_tokens",
        "size(array_distinct(split(text, ' '))) AS n_distinct",
        # exact-integer ratios -> HALF_UP recipe (ext/exact.py)
        _rr_s(
            "size(array_distinct(split(text, ' ')))",
            "size(split(text, ' '))", 4,
        )
        + " AS type_token_ratio",
        _rr_s(
            "aggregate(split(text, ' '), 0L, (acc, t) -> acc + length(t))",
            "size(split(text, ' '))", 4,
        )
        + " AS avg_token_len",
    ).orderBy("doc_id")


TEXT_TOKEN_STATS_SQL = f"""
WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents)
SELECT doc_id, n_chars, len(w) AS n_tokens,
       len(list_distinct(w)) AS n_distinct,
       {_rr_d("len(list_distinct(w))", "len(w)", 4)} AS type_token_ratio,
       {_rr_d("list_sum(list_transform(w, t -> len(t)))", "len(w)", 4)}
         AS avg_token_len
FROM t ORDER BY doc_id"""


# --- corpus word frequencies ---------------------------------------------

def text_word_freq(spark: SparkSession, sf: str) -> DataFrame:
    """Top words: explode → groupBy(word). At 100 TB the map-side partial
    aggregation collapses each partition to |vocabulary| rows before the
    shuffle, so the shuffle is tiny regardless of corpus size."""
    return (
        load_table(spark, sf, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(TOP_WORDS)
    )


TEXT_WORD_FREQ_SQL = f"""
SELECT word, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY word ORDER BY cnt DESC, word ASC LIMIT {TOP_WORDS}"""


# --- quality scoring ------------------------------------------------------

def text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic quality block: length, stopword ratio, mean token length.
    Mirrors the ratios LLM-data pipelines gate on."""
    stop_pred = " OR ".join(f"x = '{s}'" for s in STOPWORDS)
    return load_table(spark, sf, "documents").selectExpr(
        "doc_id",
        "n_chars",
        "size(split(text, ' ')) AS n_tokens",
        f"round(size(filter(split(text, ' '), x -> {stop_pred})) "
        "/ size(split(text, ' ')), 4) AS stopword_ratio",
        "CASE WHEN n_chars < 100 THEN 'short' WHEN n_chars < 300 THEN 'medium' "
        "ELSE 'long' END AS length_class",
    ).orderBy("doc_id")


_STOP_PRED_SQL = " OR ".join(f"x = '{s}'" for s in STOPWORDS)
TEXT_QUALITY_SQL = f"""
WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents)
SELECT doc_id, n_chars, len(w) AS n_tokens,
       round(len(list_filter(w, x -> {_STOP_PRED_SQL})) / len(w), 4) AS stopword_ratio,
       CASE WHEN n_chars < 100 THEN 'short' WHEN n_chars < 300 THEN 'medium'
            ELSE 'long' END AS length_class
FROM t ORDER BY doc_id"""


# --- language histogram ---------------------------------------------------

def text_lang_histogram(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang")
    )


TEXT_LANG_HISTOGRAM_SQL = """
SELECT lang, count(*) AS cnt, round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang"""


# --- document fingerprint (min-of-shingle-hashes) ------------------------

def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing-style fingerprint: the lexicographic min of md5 over the
    document's word 3-grams. md5 is identical across engines so the
    oracle verifies the fingerprint bit-for-bit."""
    return (
        _shingled(load_table(spark, sf, "documents"))
        .selectExpr(
            "doc_id",
            "array_min(transform(shingles, s -> md5(s))) AS fingerprint",
        )
        .orderBy("doc_id")
    )


TEXT_FINGERPRINT_SQL = f"""
WITH {_SHINGLE_CTE}
SELECT doc_id, list_min(list_transform(shingles, s -> md5(s))) AS fingerprint
FROM s ORDER BY doc_id"""


# --- language identification (heuristic, Pandas UDF, rows-only) ----------

#: tiny per-language stopword profiles (public-knowledge function words).
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ein"),
    "es": ("el", "la", "de", "y", "un"),
    "fr": ("le", "la", "de", "et", "un"),
    "zh": (),  # no-latin-stopword fallback bucket
}


def text_langid(spark: SparkSession, sf: str) -> DataFrame:
    """n-gram/stopword-heuristic language ID as an Arrow-batched Pandas
    UDF (the pattern for model-scoring UDFs: vectorized, stateless,
    per-batch); TEXT_LANGID_SQL replays the heuristic for the oracle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def guess_lang(texts: pd.Series) -> pd.Series:
        def guess(t: str) -> str:
            toks = t.split(" ")
            best, best_score = "zh", -1.0
            for lang, stops in _LANG_PROFILES.items():
                if not stops:
                    continue
                score = sum(tok in stops for tok in toks) / max(len(toks), 1)
                if score > best_score:
                    best, best_score = lang, score
            return best if best_score > 0 else "zh"

        return texts.map(guess)

    docs = load_table(spark, sf, "documents")
    return (
        docs.select("doc_id", "lang", guess_lang(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("cnt"))
        .orderBy("lang", "lang_pred")
    )


def _profile_pred(lang: str) -> str:
    return ", ".join(f"'{s}'" for s in _LANG_PROFILES[lang])


# The heuristic IS SQL-expressible (integer token counts, IEEE int/int
# division, argmax with ties broken by profile order en→de→es→fr — the
# same "first strict max wins" the Python loop implements), so the
# Pandas-UDF implementation gets an exact oracle after all.
TEXT_LANGID_SQL = f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
sc AS (
  SELECT doc_id, lang,
    len(list_filter(w, x -> x IN ({_profile_pred('en')}))) / greatest(len(w), 1) AS s_en,
    len(list_filter(w, x -> x IN ({_profile_pred('de')}))) / greatest(len(w), 1) AS s_de,
    len(list_filter(w, x -> x IN ({_profile_pred('es')}))) / greatest(len(w), 1) AS s_es,
    len(list_filter(w, x -> x IN ({_profile_pred('fr')}))) / greatest(len(w), 1) AS s_fr
  FROM t),
pred AS (
  SELECT lang,
    CASE WHEN greatest(s_en, s_de, s_es, s_fr) <= 0 THEN 'zh'
         WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         WHEN s_es >= s_fr THEN 'es'
         ELSE 'fr' END AS lang_pred
  FROM sc)
SELECT lang, lang_pred, count(*) AS cnt
FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred"""


# --- tf-idf top terms -----------------------------------------------------

TFIDF_TOP_K = 3


def text_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k terms per document by tf·idf. Plan: explode → per-(doc, word)
    counts (one shuffle), document frequency per word (map-side partial
    agg over the tiny vocabulary, broadcast back), rank per doc. At
    100 TB the vocabulary side stays broadcast and the only big shuffle
    is the (doc, word) count — linear in corpus token count."""
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents")
    # corpus size as a broadcast scalar IN the plan — a driver-side
    # .count() would be a separate full-scan job per invocation
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    words = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("doc_len"),
        F.explode(F.split("text", " ")).alias("word"),
    )
    # r19 pin: tf feeds the df aggregate AND the scored join with
    # different column pruning, which breaks exchange reuse — the
    # final adaptive plan re-ran the explode+count corpus scan per
    # consumer (3 documents scans, 0 ReusedExchange). Pinned, the
    # corpus explodes once; tf is the (doc, word) postings artifact a
    # tf-idf pipeline persists at 100 TB (the excess_loss cand_bi
    # class, disk-backed). Isolated best-of-3 at sf0.1: 2.57 → 2.40
    # (pin second) / 2.41 vs 2.71 (pin first) — wins both orders.
    tf = words.groupBy("doc_id", "word", "doc_len").agg(
        F.count("*").alias("cnt")
    ).localCheckpoint(eager=True)
    # tf rows are already unique per (doc_id, word): a plain count gives
    # the document frequency without countDistinct's two-phase expand
    df_ = tf.groupBy("word").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            F.round(
                (F.col("cnt") / F.col("doc_len"))
                * F.log(F.col("n_docs") / F.col("df")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TFIDF_TOP_K)
        .select("doc_id", "rk", "word", "tfidf")
        .orderBy("doc_id", "rk")
    )


TEXT_TFIDF_SQL = f"""
WITH w AS (
  SELECT doc_id, len(string_split(text, ' ')) AS doc_len,
         unnest(string_split(text, ' ')) AS word
  FROM documents),
tf AS (SELECT doc_id, word, doc_len, count(*) AS cnt
       FROM w GROUP BY doc_id, word, doc_len),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, word,
         round((cnt / doc_len) * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
  FROM tf JOIN df USING (word), n),
ranked AS (
  SELECT doc_id, word, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, word ASC) AS rk
  FROM scored)
SELECT doc_id, rk, word, tfidf FROM ranked WHERE rk <= {TFIDF_TOP_K}
ORDER BY doc_id, rk"""


# --- BPE-ish token counting ----------------------------------------------

#: greedy ≤4-char chunks per character class — a deterministic stand-in
#: for subword tokenization (real BPE needs a learned merge table; the
#: plan shape — regexp_extract_all + size, all codegen'd — is identical).
BPE_PATTERN = "[a-z]{1,4}|[0-9]{1,4}|[^a-z0-9 ]"


def text_bpe_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace vs BPE-ish token counts per document (the two counts an
    LLM-data pipeline gates on); pure per-row projection, no shuffle."""
    return load_table(spark, sf, "documents").selectExpr(
        "doc_id",
        "size(split(text, ' ')) AS n_ws_tokens",
        f"size(regexp_extract_all(text, '{BPE_PATTERN}', 0)) AS n_bpe_tokens",
        f"size(array_distinct(regexp_extract_all(text, '{BPE_PATTERN}', 0)))"
        " AS n_distinct_bpe",
        _rr_s(
            f"size(regexp_extract_all(text, '{BPE_PATTERN}', 0))",
            "size(split(text, ' '))", 4,
        )
        + " AS bpe_per_word",
    ).orderBy("doc_id")


TEXT_BPE_TOKENS_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
                  regexp_extract_all(text, '{BPE_PATTERN}') AS bpe
           FROM documents)
SELECT doc_id, len(w) AS n_ws_tokens, len(bpe) AS n_bpe_tokens,
       len(list_distinct(bpe)) AS n_distinct_bpe,
       {_rr_d("len(bpe)", "len(w)", 4)} AS bpe_per_word
FROM t ORDER BY doc_id"""


# --- BM25 keyword ranking -------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("dup", "merge", "spark")  # mixed-selectivity terms
BM25_TOP_K = 20


def text_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """Rank documents against a fixed keyword query with BM25 (the Lucene
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf variant). Plan shape matches
    tf-idf: one shuffle for per-(doc, term) counts, document frequencies
    and the corpus scalars (N, avgdl) fold in as broadcasts, then a
    per-query-term sum and global top-k. The query-term filter lands
    BEFORE the big count shuffle, so only matching postings move."""
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents")
    # corpus scalars inside the plan (no separate driver-side jobs);
    # avgdl via the round(sum,6)/count recipe so both engines agree
    scalars = docs.select(
        F.size(F.split("text", " ")).alias("dl")
    ).agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.round(F.sum("dl"), 6) / F.count("*")).alias("avgdl"),
    )
    words = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.explode(F.split("text", " ")).alias("word"),
    ).where(F.col("word").isin(*BM25_QUERY))
    # r19 pin: same two-consumer shape as text_tfidf's tf (df_ +
    # contrib prune differently → no exchange reuse → the full-corpus
    # explode ran twice); here tf is TINY (query-term postings only),
    # so the pin is all win: 1.13 → 0.93 / 0.87 vs 1.16 s (both
    # orders, isolated best-of-3, sf0.1).
    tf = words.groupBy("doc_id", "word", "dl").agg(
        F.count("*").alias("tf")
    ).localCheckpoint(eager=True)
    # tf rows are already unique per (doc_id, word): a plain count gives
    # the document frequency without countDistinct's two-phase expand
    df_ = tf.groupBy("word").agg(F.count("*").alias("df"))
    contrib = (
        tf.join(F.broadcast(df_), "word")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * (F.col("dl") / F.col("avgdl")))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.round(F.sum("c"), 4).alias("bm25")
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= BM25_TOP_K)
        .select("rk", "doc_id", "bm25")
        .orderBy("rk")
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY)
TEXT_BM25_SQL = f"""
WITH scalars AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         round(sum(len(string_split(text, ' '))), 6) / count(*) AS avgdl
  FROM documents),
w AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         unnest(string_split(text, ' ')) AS word
  FROM documents),
tf AS (SELECT doc_id, word, dl, count(*) AS tf
       FROM w WHERE word IN ({_BM25_TERMS_SQL})
       GROUP BY doc_id, word, dl),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word),
contrib AS (
  SELECT doc_id,
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * {BM25_K1 + 1.0})
           / (tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * (dl / avgdl)))
           AS c
  FROM tf JOIN df USING (word), scalars),
scored AS (SELECT doc_id, round(sum(c), 4) AS bm25
           FROM contrib GROUP BY doc_id),
ranked AS (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rk
  FROM scored)
SELECT rk, doc_id, bm25 FROM ranked WHERE rk <= {BM25_TOP_K} ORDER BY rk"""


# --- lexical entropy (quality signal) ------------------------------------

def text_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document Shannon word entropy (bits) — the lexical-diversity
    signal curation pipelines gate on next to type-token ratio (low
    entropy ⇒ repetitive/templated text). Computed entirely in the scan
    stage with higher-order array functions: per distinct word d,
    p = count(d)/n, entropy = -Σ p·ln(p)/ln(2). O(n·distinct) per row,
    ZERO shuffle — at 100 TB this is a pure map over the corpus.
    ``ln`` on both engines (tfidf precedent), rounded at 6."""
    w = "split(text, ' ')"
    # counts of each distinct word, computed against the full array
    counts = (
        f"transform(array_distinct({w}), "
        f"d -> size(filter({w}, x -> x = d)))"
    )
    n = f"size({w})"
    ent = (
        f"round(-aggregate({counts}, 0D, "
        f"(acc, c) -> acc + (c / {n}) * ln(c / {n})) / ln(2), 6)"
    )
    return load_table(spark, sf, "documents").selectExpr(
        "doc_id",
        "lang",
        f"{n} AS n_tokens",
        f"size(array_distinct({w})) AS n_distinct",
        f"{ent} AS entropy_bits",
    ).orderBy("doc_id")


TEXT_ENTROPY_SQL = """
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
c AS (SELECT doc_id, lang, w, len(w) AS n,
             list_transform(list_distinct(w),
                            d -> len(list_filter(w, x -> x = d))) AS cnts
      FROM t)
SELECT doc_id, lang, n AS n_tokens, len(list_distinct(w)) AS n_distinct,
       round(-list_sum(list_transform(cnts, c -> (c / n) * ln(c / n)))
             / ln(2), 6) AS entropy_bits
FROM c ORDER BY doc_id"""


# --- policy-term redaction (PII-masking plumbing) ------------------------

#: terms redacted by the masking policy. The fixture corpus is synthetic
#: DB-jargon with no real PII, so the policy list is a term set standing
#: in for the email/phone/ID regexes a deployment would configure — the
#: plumbing (tokenized match → mask → count → fingerprint the redacted
#: text) is what the operator provides.
REDACT_TERMS = ("customer", "value", "key")


def text_redact(spark: SparkSession, sf: str) -> DataFrame:
    """Redact policy terms from each document and fingerprint the result:
    per doc the masked token count and an md5 of the redacted text (the
    audit artifact — prove redaction ran without storing the original).
    Pure scan-stage array expressions, zero shuffle, so at 100 TB it
    runs at read bandwidth alongside any other per-doc signal."""
    in_list = ", ".join(f"'{t}'" for t in REDACT_TERMS)
    w = "split(text, ' ')"
    masked = (
        f"transform({w}, x -> CASE WHEN x IN ({in_list}) "
        f"THEN '[MASKED]' ELSE x END)"
    )
    return (
        load_table(spark, sf, "documents")
        .selectExpr(
            "doc_id",
            "lang",
            f"size(filter({w}, x -> x IN ({in_list}))) AS n_masked",
            f"md5(array_join({masked}, ' ')) AS masked_md5",
        )
        .orderBy("doc_id")
    )


_REDACT_IN_SQL = ", ".join(f"'{t}'" for t in REDACT_TERMS)
TEXT_REDACT_SQL = f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
SELECT doc_id, lang,
       len(list_filter(w, x -> x IN ({_REDACT_IN_SQL}))) AS n_masked,
       md5(list_aggregate(list_transform(w,
             x -> CASE WHEN x IN ({_REDACT_IN_SQL})
                       THEN '[MASKED]' ELSE x END),
           'string_agg', ' ')) AS masked_md5
FROM t ORDER BY doc_id"""


# --- PII pattern detection (the find half of the governance pair) --------

#: detector regexes — valid (and count-identical) under both Java regex
#: (Spark) and RE2 (DuckDB): no backtracking-ambiguous constructs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"


def text_pii_scan(spark: SparkSession, sf: str) -> DataFrame:
    """PII pattern detection — per-doc counts of email / IPv4 /
    SSN-shaped spans plus a ``has_pii`` flag: the detection half of the
    governance pair (``text_redact`` masks policy terms; this FINDS
    regex-shaped identifiers to route docs into the redact/forget
    pipeline). The fixture corpus is synthetic DB-jargon with no natural
    PII, so the probe first PLANTS deterministic spans in a derived
    column — every 3rd doc an email + IPv4, every 7th an SSN, same
    expression in both engines — and the detector runs against that
    known ground truth. Pure scan-stage ``regexp_count``, zero shuffle:
    at 100 TB this is a map over the corpus at read bandwidth."""
    docs = load_table(spark, sf, "documents")
    aug = (
        "CASE WHEN doc_id % 3 = 0 THEN concat(text, ' contact user',"
        " CAST(doc_id AS STRING), '@example.com from 10.0.',"
        " CAST(doc_id % 250 AS STRING), '.', CAST(doc_id % 200 AS STRING))"
        " WHEN doc_id % 7 = 0 THEN concat(text, ' id 123-45-',"
        " lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))"
        " ELSE text END"
    )
    return (
        docs.selectExpr("doc_id", "lang", f"{aug} AS aug")
        .select(
            "doc_id",
            "lang",
            F.regexp_count(F.col("aug"), F.lit(PII_EMAIL_RE))
            .cast("bigint")
            .alias("n_email"),
            F.regexp_count(F.col("aug"), F.lit(PII_IPV4_RE))
            .cast("bigint")
            .alias("n_ipv4"),
            F.regexp_count(F.col("aug"), F.lit(PII_SSN_RE))
            .cast("bigint")
            .alias("n_ssn"),
        )
        .withColumn(
            "has_pii",
            (
                (F.col("n_email") + F.col("n_ipv4") + F.col("n_ssn")) > 0
            ).cast("bigint"),
        )
        .orderBy("doc_id")
    )


TEXT_PII_SCAN_SQL = f"""
WITH a AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 3 = 0 THEN concat(text, ' contact user',
                CAST(doc_id AS VARCHAR), '@example.com from 10.0.',
                CAST(doc_id % 250 AS VARCHAR), '.',
                CAST(doc_id % 200 AS VARCHAR))
              WHEN doc_id % 7 = 0 THEN concat(text, ' id 123-45-',
                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
              ELSE text END AS aug
  FROM documents)
SELECT doc_id, lang,
       len(regexp_extract_all(aug, '{PII_EMAIL_RE}')) AS n_email,
       len(regexp_extract_all(aug, '{PII_IPV4_RE}')) AS n_ipv4,
       len(regexp_extract_all(aug, '{PII_SSN_RE}')) AS n_ssn,
       CAST(len(regexp_extract_all(aug, '{PII_EMAIL_RE}'))
            + len(regexp_extract_all(aug, '{PII_IPV4_RE}'))
            + len(regexp_extract_all(aug, '{PII_SSN_RE}')) > 0
            AS BIGINT) AS has_pii
FROM a ORDER BY doc_id"""


#: the aug CASE expression shared by pii_scan and pii_roundtrip — one
#: definition per engine dialect so the two queries plant identical spans
_PII_AUG_SPARK = (
    "CASE WHEN doc_id % 3 = 0 THEN concat(text, ' contact user',"
    " CAST(doc_id AS STRING), '@example.com from 10.0.',"
    " CAST(doc_id % 250 AS STRING), '.', CAST(doc_id % 200 AS STRING))"
    " WHEN doc_id % 7 = 0 THEN concat(text, ' id 123-45-',"
    " lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))"
    " ELSE text END"
)


def text_pii_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Governance round-trip — find → fix → verify in ONE query
    (VERDICT r6 item 5): plant the same deterministic PII spans as
    ``text_pii_scan``, count them, mask every span class with
    ``regexp_replace`` ([EMAIL]/[IP]/[SSN]), then RESCAN the redacted
    text and return the residual count per document — the proof a real
    pipeline needs that masking actually cleared the detector, plus an
    md5 audit fingerprint of the redacted text (prove redaction ran
    without storing the original). The full-pipeline oracle replays
    plant+mask+rescan in DuckDB, so a hash match pins every stage, not
    just the final zeros.

    Scale shape: pure scan-stage string expressions end to end — zero
    shuffle, zero UDFs; at 100 TB the round-trip runs at read bandwidth
    as a single map over the corpus."""
    docs = load_table(spark, sf, "documents")
    aug = F.expr(_PII_AUG_SPARK)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, F.lit(PII_EMAIL_RE), F.lit("[EMAIL]")),
            F.lit(PII_IPV4_RE),
            F.lit("[IP]"),
        ),
        F.lit(PII_SSN_RE),
        F.lit("[SSN]"),
    )

    def count3(col):
        return (
            F.regexp_count(col, F.lit(PII_EMAIL_RE))
            + F.regexp_count(col, F.lit(PII_IPV4_RE))
            + F.regexp_count(col, F.lit(PII_SSN_RE))
        ).cast("bigint")

    return (
        docs.select(
            "doc_id",
            "lang",
            count3(aug).alias("n_found"),
            count3(red).alias("n_residual"),
            F.md5(red).alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


TEXT_PII_ROUNDTRIP_SQL = f"""
WITH a AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 3 = 0 THEN concat(text, ' contact user',
                CAST(doc_id AS VARCHAR), '@example.com from 10.0.',
                CAST(doc_id % 250 AS VARCHAR), '.',
                CAST(doc_id % 200 AS VARCHAR))
              WHEN doc_id % 7 = 0 THEN concat(text, ' id 123-45-',
                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
              ELSE text END AS aug
  FROM documents),
r AS (
  SELECT doc_id, lang, aug,
         regexp_replace(regexp_replace(regexp_replace(aug,
           '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
           '{PII_IPV4_RE}', '[IP]', 'g'),
           '{PII_SSN_RE}', '[SSN]', 'g') AS red
  FROM a)
SELECT doc_id, lang,
       len(regexp_extract_all(aug, '{PII_EMAIL_RE}'))
         + len(regexp_extract_all(aug, '{PII_IPV4_RE}'))
         + len(regexp_extract_all(aug, '{PII_SSN_RE}')) AS n_found,
       len(regexp_extract_all(red, '{PII_EMAIL_RE}'))
         + len(regexp_extract_all(red, '{PII_IPV4_RE}'))
         + len(regexp_extract_all(red, '{PII_SSN_RE}')) AS n_residual,
       md5(red) AS redacted_md5
FROM r ORDER BY doc_id"""


register("ext_text_bm25", text_bm25, TEXT_BM25_SQL)
register("ext_text_token_stats", text_token_stats, TEXT_TOKEN_STATS_SQL)
register("ext_text_bpe_tokens", text_bpe_tokens, TEXT_BPE_TOKENS_SQL)
register("ext_text_tfidf", text_tfidf, TEXT_TFIDF_SQL)
register("ext_text_word_freq", text_word_freq, TEXT_WORD_FREQ_SQL)
register("ext_text_quality", text_quality, TEXT_QUALITY_SQL)
register("ext_text_lang_histogram", text_lang_histogram, TEXT_LANG_HISTOGRAM_SQL)
register("ext_text_fingerprint", text_fingerprint, TEXT_FINGERPRINT_SQL)
register("ext_text_langid", text_langid, TEXT_LANGID_SQL)
register("ext_text_entropy", text_entropy, TEXT_ENTROPY_SQL)
register("ext_text_redact", text_redact, TEXT_REDACT_SQL)
register("ext_text_pii_scan", text_pii_scan, TEXT_PII_SCAN_SQL)
register("ext_text_pii_roundtrip", text_pii_roundtrip, TEXT_PII_ROUNDTRIP_SQL)


# --- Zipf rank-frequency profile ------------------------------------------
# STAGED for the round-12 driver window (the staging every late operator
# goes through). The classic corpus-health diagnostic: natural text
# follows Zipf's law (freq ∝ rank^slope with slope ≈ −1); template spam
# flattens the head (slope → 0) and truncated/boilerplate corpora
# steepen it. Per language: the least-squares fit of ln(freq) on
# ln(rank) over the top ZIPF_TOP word frequencies.
#
# Exactness: each ln renders once as a 6-dp micro-int (the established
# round(ln, 6)·1e6 recipe) and the ENTIRE regression then runs in
# integer arithmetic — Σx, Σy, Σxy, Σx² as int64 sums of exact micro
# products (x·y ≤ ~6e13 per term, Σ ≤ ~6e15 at ZIPF_TOP = 100), the
# slope N/D = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) one SIGNED rational rendered
# HALF_UP via the ext/exact.py signed-WIDE recipe (2·|N|·1e6 crosses
# int64), and the intercept re-uses the scaled-int slope so no float
# ever multiplies a float. A float Σxy diverges between engines'
# accumulation orders — the same failure _doc_nll pinned.
#
# Scale shape: one token scan → word counts (map-side combined); the
# rank window and the regression run over the ZIPF_TOP-row-per-group
# head only (the per-group top-K pattern). At larger ZIPF_TOP the int64
# sum bounds take the kilo-unit convention (documented, not silent).

ZIPF_TOP = 100


def text_zipf(spark: SparkSession, sf: str) -> DataFrame:
    """Per language: fitted Zipf slope and intercept over the top-100
    word ranks, with the rank count and token mass fitted."""
    from pyspark.sql.window import Window

    from dariadb_spark.ext.exact import (
        ratio_round_signed_wide_spark as _rrsw_s,
    )

    docs = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    freq = (
        docs.selectExpr("lang", "explode(split(text, ' ')) AS word")
        .groupBy("lang", "word")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("word"))
    xy = (
        freq.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ZIPF_TOP)
        .selectExpr(
            "lang", "cnt",
            "CAST(round(round(ln(rank), 6) * 1000000, 0) AS BIGINT) AS x",
            "CAST(round(round(ln(cnt), 6) * 1000000, 0) AS BIGINT) AS y",
        )
    )
    agg = xy.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_ranks"),
        F.sum("cnt").cast("long").alias("fitted_tokens"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
    )
    num = "(n_ranks * sxy - sx * sy)"
    den = "(n_ranks * sxx - sx * sx)"
    s6 = (
        f"(CASE WHEN {num} < 0 THEN -1 ELSE 1 END"
        f" * ((2 * CAST(abs({num}) AS DECIMAL(38, 0)) * 1000000 + {den})"
        f" DIV (2 * {den})))"
    )
    return (
        agg.where(F.expr(den) > 0)
        .selectExpr(
            "lang", "n_ranks", "fitted_tokens", "sy", "sx",
            f"{s6} AS s6",
        )
        .selectExpr(
            "lang", "n_ranks", "fitted_tokens",
            "s6 / 1000000.0d AS zipf_slope",
            _rrsw_s(
                "(1000000 * sy - s6 * sx)", "(1000000000000 * n_ranks)", 6
            )
            + " AS zipf_intercept",
        )
        .orderBy("lang")
    )


from dariadb_spark.ext.exact import (  # noqa: E402
    ratio_round_signed_wide_duck as _rrsw_d,
)

_ZIPF_NUM = "(n_ranks * sxy - sx * sy)"
_ZIPF_DEN = "(n_ranks * sxx - sx * sx)"
_ZIPF_S6_DUCK = (
    f"(CASE WHEN {_ZIPF_NUM} < 0 THEN -1 ELSE 1 END"
    f" * ((2 * CAST(abs({_ZIPF_NUM}) AS HUGEINT) * 1000000 + {_ZIPF_DEN})"
    f" // (2 * {_ZIPF_DEN})))"
)

TEXT_ZIPF_SQL = f"""
WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS word
             FROM documents WHERE text IS NOT NULL),
freq AS (SELECT lang, word, count(*) AS cnt FROM tok GROUP BY lang, word),
ranked AS (SELECT lang, cnt,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY cnt DESC, word ASC) AS rank
           FROM freq),
xy AS (SELECT lang, cnt,
              CAST(round(round(ln(rank), 6) * 1000000, 0) AS BIGINT) AS x,
              CAST(round(round(ln(cnt), 6) * 1000000, 0) AS BIGINT) AS y
       FROM ranked WHERE rank <= {ZIPF_TOP}),
agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_ranks,
               CAST(sum(cnt) AS BIGINT) AS fitted_tokens,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM xy GROUP BY lang),
fit AS (SELECT lang, n_ranks, fitted_tokens, sx, sy,
               {_ZIPF_S6_DUCK} AS s6
        FROM agg WHERE {_ZIPF_DEN} > 0)
SELECT lang, n_ranks, fitted_tokens,
       s6 / 1000000.0 AS zipf_slope,
       {_rrsw_d("(1000000 * sy - s6 * sx)",
                "(1000000000000 * n_ranks)", 6)} AS zipf_intercept
FROM fit ORDER BY lang"""


# --- distinct-n diversity audit -------------------------------------------
# STAGED alongside text_zipf (round-12 window candidate). The standard
# generation/corpus diversity statistic (distinct-n, Li et al. 2016;
# the self-BLEU alternative that needs no pairwise work): per language,
# the ratio of DISTINCT n-grams to total n-grams for n = 1, 2, 3 —
# diversity collapse (template spam, decoding loops) drives the ratios
# toward 0; every ratio is one exact int/int rational (6-dp HALF_UP).
# One token scan per n (built linearly by the shifted-slice zip —
# ext/shingles.py's O(n) form); counts are map-side-combined groupBys.

def text_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Per language: total and distinct n-gram counts and distinct-n
    ratios for n = 1, 2, 3."""
    docs = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    w = "split(text, ' ')"
    grams = {
        1: f"explode({w})",
        2: (
            f"explode(zip_with(slice({w}, 1, size({w}) - 1),"
            f" slice({w}, 2, size({w}) - 1), (a, b) -> concat(a, ' ', b)))"
        ),
        # greatest(·, 0): slice() errors on a negative length and a
        # 1-word doc would reach size-2 = -1 (the shingles.py totality
        # lesson); an empty slice explodes to zero rows, as intended
        3: (
            f"explode(zip_with(zip_with(slice({w}, 1, greatest(size({w}) - 2, 0)),"
            f" slice({w}, 2, greatest(size({w}) - 2, 0)), (a, b) -> concat(a, ' ', b)),"
            f" slice({w}, 3, greatest(size({w}) - 2, 0)), (p, c) -> concat(p, ' ', c)))"
        ),
    }
    outs = []
    for n, expr in grams.items():
        g = (
            docs.where(F.size(F.split(F.col("text"), " ")) >= n)
            .selectExpr("lang", f"{expr} AS g")
            .groupBy("lang")
            .agg(
                F.count("*").alias("total"),
                F.count_distinct("g").alias("uniq"),
            )
            .selectExpr(
                "lang", f"{n} AS n", "total", "uniq",
                _rr_s("uniq", "total", 6) + " AS distinct_ratio",
            )
        )
        outs.append(g)
    out = outs[0]
    for g in outs[1:]:
        out = out.unionByName(g)
    return out.orderBy("lang", "n")


TEXT_DIVERSITY_SQL = f"""
WITH d AS (SELECT lang, string_split(text, ' ') AS w
           FROM documents WHERE text IS NOT NULL),
g1 AS (SELECT lang, unnest(w) AS g FROM d),
g2 AS (SELECT lang, unnest([w[i] || ' ' || w[i+1]
                            for i in range(1, len(w))]) AS g
       FROM d WHERE len(w) >= 2),
g3 AS (SELECT lang, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS g
       FROM d WHERE len(w) >= 3),
u AS (
  SELECT lang, 1 AS n, count(*) AS total, count(DISTINCT g) AS uniq
  FROM g1 GROUP BY lang
  UNION ALL
  SELECT lang, 2, count(*), count(DISTINCT g) FROM g2 GROUP BY lang
  UNION ALL
  SELECT lang, 3, count(*), count(DISTINCT g) FROM g3 GROUP BY lang)
SELECT lang, n, total, uniq,
       {_rr_d("uniq", "total", 6)} AS distinct_ratio
FROM u ORDER BY lang, n"""


# round 12: the two text-diversity audits staged through round 11 join
# the driver-checked surface (window discipline per registry.py).
register("ext_text_zipf", text_zipf, TEXT_ZIPF_SQL)
register("ext_text_diversity", text_diversity, TEXT_DIVERSITY_SQL)


# --- per-source token-distribution drift (total variation distance) ---------
# Registered round 13 (staged round 12 with the full discipline:
# implemented + oracled + pytest parity + planted stress first).


def corpus_drift_tvd(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r13 window (see :func:`corpus_drift_tvd_op`)."""
    return corpus_drift_tvd_op(load_table(spark, sf, "documents"))


def corpus_drift_tvd_op(docs: DataFrame) -> DataFrame:
    """Distribution drift per source: the total variation distance
    between each source's unigram token distribution and the rest of
    the corpus — THE monitoring number a training-data pipeline tracks
    per ingest feed (a feed whose token distribution walks away from
    the corpus is the first sign of scraper rot, language drift, or
    spam floods). TVD = ½ Σ_w |p_s(w) − p_rest(w)| ∈ [0, 1].

    Exact cross-engine arithmetic: with c = count of w in s, C = corpus
    count, N_s / N_r the token totals, every |·| term is the int64
    |c·N_r − (C−c)·N_s|, accumulated in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) — exact and order-free; ONE final division by
    2·N_s·N_r (both factors ≤ ~9e15 → exact doubles), rounded once.

    The vocabulary NEVER fans out to |vocab| × |sources|: words absent
    from s contribute Σ_{w∉s} C_w·N_s = N_s·(N − Σ_{w∈s} C_w), so the
    whole sum folds over only the OBSERVED (source, word) pairs plus
    one scalar — the algebraic identity that keeps the operator linear
    in observed pairs at any vocabulary size.

    Plan shape (100 TB): explode → partial-aggregated (source, word)
    counts (map-side combine collapses each partition to its local
    vocab), one join on ``word`` against the |vocab|-row corpus totals,
    one per-source fold, a |sources|-row broadcast of totals, and a
    1-row broadcast of N. No UDF, no driver state."""
    words = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    cnts = words.groupBy("source", "word").agg(F.count("*").alias("c"))
    wordtot = cnts.groupBy("word").agg(F.sum("c").alias("cw"))
    srctot = cnts.groupBy("source").agg(F.sum("c").alias("ns"))
    ntot = srctot.agg(F.sum("ns").alias("n"))
    obs = (
        cnts.join(wordtot, "word")
        .join(F.broadcast(srctot), "source")
        .crossJoin(F.broadcast(ntot))
    )
    term = F.abs(
        F.col("c").cast("decimal(38,0)") * (F.col("n") - F.col("ns"))
        - (F.col("cw") - F.col("c")).cast("decimal(38,0)") * F.col("ns")
    )
    folded = obs.groupBy("source").agg(
        F.max("ns").alias("n_tokens"),
        F.max("n").alias("n"),
        F.count("*").alias("n_vocab"),
        F.sum(term).alias("part1"),
        F.sum("cw").alias("cw_seen"),
    )
    num = F.col("part1") + (
        F.col("n_tokens").cast("decimal(38,0)")
        * (F.col("n") - F.col("cw_seen"))
    )
    den = (
        F.lit(2.0)
        * F.col("n_tokens").cast("double")
        * (F.col("n") - F.col("n_tokens")).cast("double")
    )
    return (
        folded.where(F.col("n_tokens") < F.col("n"))
        .select(
            "source",
            "n_tokens",
            "n_vocab",
            F.round(num.cast("double") / den, 6).alias("tvd_rest"),
        )
        .orderBy("source")
    )


CORPUS_DRIFT_TVD_SQL = """WITH
words AS (SELECT source, unnest(string_split(text, ' ')) AS word
          FROM documents),
cnts AS (SELECT source, word, count(*) AS c FROM words GROUP BY source, word),
wordtot AS (SELECT word, sum(c) AS cw FROM cnts GROUP BY word),
srctot AS (SELECT source, sum(c) AS ns FROM cnts GROUP BY source),
ntot AS (SELECT sum(ns) AS n FROM srctot),
folded AS (
  SELECT t.source, max(s.ns) AS n_tokens, max(v.n) AS n,
         count(*) AS n_vocab,
         sum(abs(CAST(t.c AS HUGEINT) * (v.n - s.ns)
                 - CAST(w.cw - t.c AS HUGEINT) * s.ns)) AS part1,
         sum(w.cw) AS cw_seen
  FROM cnts t
  JOIN wordtot w ON t.word = w.word
  JOIN srctot s ON t.source = s.source
  CROSS JOIN ntot v
  GROUP BY t.source)
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_vocab AS BIGINT) AS n_vocab,
       round(CAST(part1 + CAST(n_tokens AS HUGEINT) * (n - cw_seen)
                  AS DOUBLE)
             / (2.0 * n_tokens * (n - n_tokens)), 6) AS tvd_rest
FROM folded WHERE n_tokens < n ORDER BY source"""

register("ext_corpus_drift_tvd", corpus_drift_tvd, CORPUS_DRIFT_TVD_SQL)


# --- PMI bigram collocations -------------------------------------------------
# Registered round 13 (staged round 12, full staging discipline).

PMI_MIN_COUNT = 5  # Church & Hanks' sparse-count guard
PMI_TOP = 30


def token_pmi(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r13 window (see :func:`token_pmi_op`)."""
    return token_pmi_op(load_table(spark, sf, "documents"))


def token_pmi_op(docs: DataFrame) -> DataFrame:
    """Top bigram collocations by pointwise mutual information (Church
    & Hanks 1990, "Word Association Norms, Mutual Information, and
    Lexicography"): PMI(x,y) = ln( c_xy·N / (c_x·c_y) ) over adjacent
    word pairs, margins taken from the bigram table itself (c_x = Σ_y,
    c_y = Σ_x), counts below PMI_MIN_COUNT dropped. The collocation
    mine every tokenizer/phrase-table builder runs over a new corpus.

    Ranking is EXACT: the sort key is the micro-int rational
    (c_xy·N·10⁶) ⌊÷⌋ (c_x·c_y) — int64-identical in both engines (the
    quality_calibrate trick), with BOTH the numerator c_xy·N·10⁶ and
    the denominator c_x·c_y computed in DECIMAL(38,0)/HUGEINT so
    neither product wraps past the int64 line on a large corpus
    (ext/exact.py's overflow note; c_x and c_y each reach N). The
    displayed ``pmi`` is one float ln over an IEEE double·double
    ratio evaluated with the identical expression shape on both
    engines, rounded once — never part of the ordering.

    Plan shape (100 TB): bigrams by two shifted slices zipped (linear,
    the shingles lesson — no O(n²) re-inlined transform), one
    partial-aggregated (x, y) count shuffle, two |vocab|-row margin
    joins on a single word key each, a 1-row N broadcast, and a global
    top-30 (TakeOrderedAndProject — no full sort materializes).

    r19 perf: the bigram-count table (vocab-pair-sized) feeds FOUR
    consumers (cx, cy, N, the scored join), each re-inlining the
    corpus explode; one localCheckpoint pin — isolated best-of-3
    0.99 → 0.73 s at sf0.1, rows identical."""
    n_expr = "size(split(text, ' '))"
    s_expr = "split(text, ' ')"
    pairs = docs.where(
        F.size(F.split(F.col("text"), " ")) >= 2
    ).selectExpr(
        f"explode(zip_with(slice({s_expr}, 1, {n_expr} - 1), "
        f"slice({s_expr}, 2, {n_expr} - 1), "
        "(a, b) -> struct(a AS x, b AS y))) AS bg"
    ).select("bg.x", "bg.y")
    cxy = pairs.groupBy("x", "y").agg(F.count("*").alias("c_xy")).localCheckpoint(eager=True)
    cx = cxy.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    cy = cxy.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    nb = cxy.agg(F.sum("c_xy").alias("nb"))
    scored = (
        cxy.where(F.col("c_xy") >= PMI_MIN_COUNT)
        .join(cx, "x")
        .join(cy, "y")
        .crossJoin(F.broadcast(nb))
        .selectExpr(
            "x",
            "y",
            "c_xy",
            "c_x",
            "c_y",
            # the denominator product and the displayed-pmi numerator
            # go through wide integers too: c_x, c_y can each reach N,
            # so raw int64 c_x·c_y (or c_xy·N) silently wraps in
            # non-ANSI Spark on a large corpus while DuckDB raises —
            # same class as the rank_key numerator. The pmi ratio is
            # computed as one double·double multiply per side instead
            # (IEEE-identical on both engines, never part of ordering).
            "CAST(CAST(c_xy AS DECIMAL(38,0)) * nb * 1000000"
            " DIV (CAST(c_x AS DECIMAL(38,0)) * c_y) AS BIGINT)"
            " AS rank_key",
            "round(ln((CAST(c_xy AS DOUBLE) * nb)"
            " / (CAST(c_x AS DOUBLE) * c_y)), 6) AS pmi",
        )
    )
    return scored.orderBy(
        F.col("rank_key").desc(), F.col("x").asc(), F.col("y").asc()
    ).limit(PMI_TOP)


TOKEN_PMI_SQL = f"""WITH
t AS (SELECT string_split(text, ' ') AS w FROM documents),
b AS (SELECT unnest(w[1:len(w)-1]) AS x, unnest(w[2:len(w)]) AS y
      FROM t WHERE len(w) >= 2),
cxy AS (SELECT x, y, count(*) AS c_xy FROM b GROUP BY x, y),
cx AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x FROM cxy GROUP BY x),
cy AS (SELECT y, CAST(sum(c_xy) AS BIGINT) AS c_y FROM cxy GROUP BY y),
nb AS (SELECT CAST(sum(c_xy) AS BIGINT) AS nb FROM cxy)
SELECT p.x, p.y, p.c_xy, cx.c_x, cy.c_y,
       CAST(CAST(p.c_xy AS HUGEINT) * nb.nb * 1000000
            // (CAST(cx.c_x AS HUGEINT) * cy.c_y) AS BIGINT) AS rank_key,
       round(ln((CAST(p.c_xy AS DOUBLE) * nb.nb)
                / (CAST(cx.c_x AS DOUBLE) * cy.c_y)), 6)
         AS pmi
FROM cxy p JOIN cx ON p.x = cx.x JOIN cy ON p.y = cy.y CROSS JOIN nb
WHERE p.c_xy >= {PMI_MIN_COUNT}
ORDER BY rank_key DESC, p.x ASC, p.y ASC LIMIT {PMI_TOP}"""

register("ext_token_pmi", token_pmi, TOKEN_PMI_SQL)


# --- readability screen (LIX) --------------------------------------------------
# STAGED for the round-16 driver window (the staging every late operator
# goes through: implemented + oracled + pytest parity + planted stress
# now, registered at the next window rotation).
#
# The quality family's grade-level verb: LIX (Björnsson's läsbarhets-
# index, the classic punctuation-and-length readability measure —
# public formula: words/sentences + 100·longwords/words, long = ≥ 7
# chars) over the documents table, pooled per source. Chosen over
# syllable-based scores (Flesch) deliberately: LIX needs ONLY exact
# integer counts — no syllable regex whose engine-specific semantics
# would poison the hash gate. Sentences count '.', '!', '?' occurrences
# via the length-after-replace identity (identical in both engines),
# clamped to ≥ 1 (a fragment is one sentence, and the fixture corpus
# has no punctuation — every fixture doc pools as a single sentence,
# which the op handles as a first-class case, not an error).

LIX_LONG = 7    # long-word threshold (chars)
LIX_HARD = 40   # per-doc hardness line (LIX ≥ 40 ≈ "difficult" band)

_LIX_W_SPARK = "size(split(text, ' '))"
_LIX_S_SPARK = (
    "greatest(length(text) - length(replace(replace(replace("
    "text, '.', ''), '!', ''), '?', '')), 1)"
)
_LIX_L_SPARK = (
    f"size(filter(split(text, ' '), x -> length(x) >= {LIX_LONG}))"
)
_LIX_W_DUCK = "len(string_split(text, ' '))"
_LIX_S_DUCK = (
    "greatest(length(text) - length(replace(replace(replace("
    "text, '.', ''), '!', ''), '?', '')), 1)"
)
_LIX_L_DUCK = (
    f"len(list_filter(string_split(text, ' '), x -> length(x) >= {LIX_LONG}))"
)


def text_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r16 window (:func:`text_readability_op`)."""
    return text_readability_op(load_table(spark, sf, "documents"))


def text_readability_op(docs: DataFrame) -> DataFrame:
    """Per-source readability: exact word/sentence/long-word counts,
    the pooled LIX, and the fraction of docs past the LIX_HARD line.

    Exactness: every count is int64; pooled LIX = (W² + 100·L·S) /
    (S·W) and the per-doc hardness test w·w + 100·l·s ≥ {hard}·s·w are
    EXACT integer arithmetic (the ratio in DECIMAL(38,0)/HUGEINT — W²
    passes int64 around corpus token counts ~3·10⁹); the two floats
    per row are shared HALF_UP ratio recipes (ext/exact.py).

    Plan shape (100 TB): per-doc counts are scan-stage projections
    (whole-stage codegen, zero extra shuffles); ONE map-side-combined
    groupBy on source ends the plan — corpus-linear, text never
    shuffles.
    """
    from dariadb_spark.ext.exact import (
        ratio_round_spark,
        ratio_round_wide_spark,
    )

    per_doc = docs.selectExpr(
        "source",
        f"CAST({_LIX_W_SPARK} AS BIGINT) AS w",
        f"CAST({_LIX_S_SPARK} AS BIGINT) AS s",
        f"CAST({_LIX_L_SPARK} AS BIGINT) AS l",
    ).selectExpr(
        "source",
        "w",
        "s",
        "l",
        f"CASE WHEN w * w + 100 * l * s >= {LIX_HARD} * s * w"
        " THEN 1 ELSE 0 END AS hard",
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("w").alias("n_words"),
            F.sum("s").alias("n_sentences"),
            F.sum("l").alias("n_long_words"),
            F.sum("hard").alias("n_hard"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_words",
            "n_sentences",
            "n_long_words",
            ratio_round_wide_spark(
                "n_words * CAST(n_words AS DECIMAL(38,0))"
                " + 100 * n_long_words * CAST(n_sentences AS DECIMAL(38,0))",
                "n_sentences * CAST(n_words AS DECIMAL(38,0))", 4,
            )
            + " AS pooled_lix",
            ratio_round_spark("n_hard", "n_docs", 4) + " AS hard_frac",
        )
        .orderBy("source")
    )


def _readability_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_duck, ratio_round_wide_duck

    return f"""WITH
d AS (SELECT source,
             CAST({_LIX_W_DUCK} AS BIGINT) AS w,
             CAST({_LIX_S_DUCK} AS BIGINT) AS s,
             CAST({_LIX_L_DUCK} AS BIGINT) AS l
      FROM documents),
h AS (SELECT source, w, s, l,
             CASE WHEN w * w + 100 * l * s >= {LIX_HARD} * s * w
                  THEN 1 ELSE 0 END AS hard
      FROM d),
g AS (SELECT source, count(*) AS n_docs,
             CAST(sum(w) AS BIGINT) AS n_words,
             CAST(sum(s) AS BIGINT) AS n_sentences,
             CAST(sum(l) AS BIGINT) AS n_long_words,
             CAST(sum(hard) AS BIGINT) AS n_hard
      FROM h GROUP BY source)
SELECT source, n_docs, n_words, n_sentences, n_long_words,
       {ratio_round_wide_duck(
           "n_words * CAST(n_words AS HUGEINT)"
           " + 100 * n_long_words * CAST(n_sentences AS HUGEINT)",
           "n_sentences * CAST(n_words AS HUGEINT)", 4)}
         AS pooled_lix,
       {ratio_round_duck("n_hard", "n_docs", 4)} AS hard_frac
FROM g ORDER BY source"""


TEXT_READABILITY_SQL = _readability_sql()

# Registered round 16 (staged round 15 with the full discipline:
# implemented + oracled + pytest parity incl. the planted-docs closed
# form + planted ≥100k-row stress + hash-matched at sf0.1 in the
# staged sweep; exact-integer LIX chosen over syllable scores because
# it needs no engine-specific regex).
register("ext_text_readability", text_readability, TEXT_READABILITY_SQL)


# --- Heaps'-law vocabulary-growth curve ---------------------------------------
# STAGED for the round-16 driver window (the staging every late operator
# follows: implemented + oracled + pytest parity + planted stress now,
# registered at the next rotation). The corpus-analysis family's
# "how does the VOCABULARY grow?" verb next to zipf's rank-frequency
# slope: new-type and cumulative-type counts over ingest-order corpus
# deciles, the curve Heaps' law V = K·n^β describes. No exponent fit is
# shipped — the exact integer curve IS the result (a fit would add two
# transcendental-regression floats for no extra information; zipf
# already demonstrates the log-log fit recipe if a user wants β).


def text_heaps(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r16 window (:func:`text_heaps_op`)."""
    return text_heaps_op(load_table(spark, sf, "documents"))


def text_heaps_op(docs: DataFrame) -> DataFrame:
    """Vocabulary growth over corpus-prefix deciles: per decile the doc
    and token mass, the count of word types first seen there, the
    cumulative vocabulary, and the cumulative type-token ratio.

    Prefix semantics: deciles are doc_id RANGE buckets over the
    broadcast (min_id, max_id) span — decile(d) = least(9,
    (d − min)·10 div (max − min + 1)) — i.e. "ingest order" with O(1)
    per-row assignment. Equal-COUNT deciles would need a global rank
    (a total sort, or an exact two-pass quantile build) for a curve
    whose shape is the same at any honest bucketing; the range form is
    the 100 TB-safe choice and is exact and deterministic in both
    engines.

    Exactness: every count is int64 (token counts per decile bound the
    narrow HALF_UP closure only past ~4.6e12 cumulative tokens, so the
    type-token ratio uses the WIDE closure); a word's first-seen decile
    is min() over integers.

    Plan shape (100 TB): ONE doc-grain scan aggregates docs/tokens per
    decile (10 partial-agg rows); ONE explode feeds the vocab-sized
    (word → min decile) aggregate — the zipf/word-freq shuffle class,
    the unavoidable cost of exact type counts; everything after is
    10-row arithmetic (the cumulative window runs on a single 10-row
    partition by construction — K = 10 is the operator contract, so
    the "global" window is a constant, not a scale risk).
    """
    from dariadb_spark.ext.exact import ratio_round_wide_spark

    d = docs.where(F.col("text").isNotNull())
    bounds = d.agg(
        F.min("doc_id").alias("min_id"),
        (F.max("doc_id") - F.min("doc_id") + F.lit(1)).alias("span"),
    )
    dd = d.crossJoin(F.broadcast(bounds)).selectExpr(
        "least(9, ((doc_id - min_id) * 10) DIV span) AS decile",
        "text",
    )
    per_doc = dd.groupBy("decile").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    first_seen = (
        dd.select(
            "decile", F.explode(F.split("text", " ")).alias("word")
        )
        .groupBy("word")
        .agg(F.min("decile").alias("first_dec"))
        .groupBy("first_dec")
        .agg(F.count("*").alias("new_words"))
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(F.lit(0))  # ONE 10-row partition by contract
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_doc.join(
            first_seen, per_doc.decile == first_seen.first_dec, "left"
        )
        .selectExpr(
            "decile",
            "n_docs",
            "n_tokens",
            "COALESCE(new_words, CAST(0 AS BIGINT)) AS new_words",
        )
        .select(
            "decile",
            "n_docs",
            "n_tokens",
            "new_words",
            F.sum("n_docs").over(w).alias("cum_docs"),
            F.sum("n_tokens").over(w).alias("cum_tokens"),
            F.sum("new_words").over(w).alias("cum_vocab"),
        )
        .selectExpr(
            "decile",
            "n_docs",
            "n_tokens",
            "new_words",
            "cum_docs",
            "cum_tokens",
            "cum_vocab",
            ratio_round_wide_spark("cum_vocab", "cum_tokens", 6)
            + " AS ttr",
        )
        .orderBy("decile")
    )


def _heaps_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_wide_duck

    return f"""WITH
d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
bounds AS (SELECT min(doc_id) AS min_id,
                  max(doc_id) - min(doc_id) + 1 AS span FROM d),
dd AS (SELECT least(9, ((doc_id - min_id) * 10) // span) AS decile, text
       FROM d, bounds),
per_doc AS (SELECT decile, count(*) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                     AS n_tokens
            FROM dd GROUP BY decile),
fs AS (SELECT word, min(decile) AS first_dec FROM (
         SELECT decile, unnest(string_split(text, ' ')) AS word FROM dd)
       GROUP BY word),
nw AS (SELECT first_dec, count(*) AS new_words FROM fs GROUP BY first_dec),
j AS (SELECT p.decile, p.n_docs, p.n_tokens,
             CAST(COALESCE(n.new_words, 0) AS BIGINT) AS new_words
      FROM per_doc p LEFT JOIN nw n ON p.decile = n.first_dec),
c AS (SELECT decile, n_docs, n_tokens, new_words,
             CAST(sum(n_docs) OVER W AS BIGINT) AS cum_docs,
             CAST(sum(n_tokens) OVER W AS BIGINT) AS cum_tokens,
             CAST(sum(new_words) OVER W AS BIGINT) AS cum_vocab
      FROM j
      WINDOW W AS (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT decile, n_docs, n_tokens, new_words, cum_docs, cum_tokens, cum_vocab,
       {ratio_round_wide_duck("cum_vocab", "cum_tokens", 6)} AS ttr
FROM c ORDER BY decile"""


TEXT_HEAPS_SQL = _heaps_sql()

# Registered round 16 (staged round 15, second staging pass, full
# discipline: implemented + oracled + pytest parity incl. the planted
# vocabulary-growth closed form and the single-doc/null-text edge tests
# + planted ≥100k-row stress + hash-matched at sf0.1 in the staged
# sweep).
register("ext_text_heaps", text_heaps, TEXT_HEAPS_SQL)
