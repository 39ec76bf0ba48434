"""[EXT] deterministic sampling / dataset-split operators for training-data
pipelines (north_star): every document is assigned to train/val/test (or
kept/dropped by a stratified sampler) by a *pure arithmetic hash of its id*
— no RNG, no state, so the assignment is reproducible across engines, runs,
and scales, and expressible identically in Spark and the DuckDB oracle.

The hash is Knuth's multiplicative scheme ``(key · 2654435761) mod 2³²``
(golden-ratio multiplier; "The Art of Computer Programming" vol. 3 §6.4) —
chosen over xxhash64/murmur because those have no DuckDB twin (see
dedup.py's rows-only caveat) while this is two integer ops in any engine.
doc_id < 2³¹ keeps the product inside int64, so Spark's ANSI arithmetic
never overflows.

Scale notes (100 TB): split assignment is a stateless per-row projection —
no shuffle at all until the final stats aggregate (tiny key space); the
sampler is a pushable filter. Neither touches the document text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dariadb_spark.ext.exact import (
    ratio_round_duck as _rr_d,
    ratio_round_guarded_duck as _rrg_d,
    ratio_round_signed_duck as _rrs_d,
    ratio_round_signed_spark as _rrs_s,
    ratio_round_spark as _rr_s,
    ratio_round_wide_duck as _rrw_d,
    ratio_round_wide_spark as _rrw_s,
)
from dariadb_spark.model import load_table
KNUTH = 2654435761
MOD32 = 1 << 32

TRAIN_PCT = 90  # train < 90 ≤ val < 95 ≤ test
VAL_PCT = 95

SAMPLE_SEED_OFFSET = 12345  # decorrelates the sampler from the splitter
SAMPLE_PCT = 10


def _pct(key: Column, offset: int = 0) -> Column:
    return ((key + offset) * KNUTH) % MOD32 % 100


def _pct_sql(key: str, offset: int = 0) -> str:
    return f"((({key} + {offset}) * {KNUTH}) % {MOD32}) % 100"


def split_assign(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Add a ``split`` column (train/val/test, 90/5/5) keyed on ``key``."""
    pct = _pct(F.col(key))
    return docs.withColumn(
        "split",
        F.when(pct < TRAIN_PCT, "train")
        .when(pct < VAL_PCT, "val")
        .otherwise("test"),
    )


def split_train_test(spark: SparkSession, sf: str) -> DataFrame:
    """Per-(lang, split) corpus stats after deterministic 90/5/5
    assignment — the final sanity check a dataset build runs before
    writing shards."""
    docs = split_assign(load_table(spark, sf, "documents"))
    return (
        docs.groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang", "split")
    )


SPLIT_SQL = f"""
WITH assigned AS (
  SELECT lang, doc_id, n_chars,
         CASE WHEN {_pct_sql('doc_id')} < {TRAIN_PCT} THEN 'train'
              WHEN {_pct_sql('doc_id')} < {VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT lang, split, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM assigned GROUP BY lang, split ORDER BY lang, split"""


def sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic ~10% sample, uniform within every stratum because the
    hash is independent of lang/source — a pushable filter (no shuffle)
    that any 100 TB job can apply at the scan."""
    docs = load_table(spark, sf, "documents")
    return (
        docs.where(_pct(F.col("doc_id"), SAMPLE_SEED_OFFSET) < SAMPLE_PCT)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


SAMPLE_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_pct_sql('doc_id', SAMPLE_SEED_OFFSET)} < {SAMPLE_PCT}
ORDER BY doc_id"""


# --- token-budget shard packing -------------------------------------------

SHARD_TOKENS = 2_000  # target token budget per training shard


def pack_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Assign documents to contiguous training shards of ~SHARD_TOKENS
    whitespace tokens per language: docs are laid out in doc_id order and
    a shard boundary falls wherever the running token total crosses a
    budget multiple — ``shard = floor(cumsum_before / budget)``. This is
    the deterministic contiguous-packing rule (order-dependent greedy
    first-fit is NOT distributable; this is, and it's what sharded
    dataset writers actually do). One window pass per lang partition,
    then a tiny aggregate; the text column is never shuffled — only
    (lang, doc_id, n_tokens)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents").select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard = F.floor(
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / SHARD_TOKENS
    )
    return (
        docs.withColumn("shard", shard)
        .groupBy("lang", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "shard")
    )


PACK_SHARDS_SQL = f"""
WITH d AS (
  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens
  FROM documents),
assigned AS (
  SELECT lang, doc_id, n_tokens,
         CAST(floor(COALESCE(sum(n_tokens) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / {SHARD_TOKENS}) AS BIGINT) AS shard
  FROM d)
SELECT lang, shard, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM assigned GROUP BY lang, shard ORDER BY lang, shard"""


# --- fixed context-window packing audit -----------------------------------
# STAGED for the round-11 driver window (round-10's is full; the
# staging every late operator goes through). pack_shards answers "which
# SHARD does each doc land in"; this op audits the level below — the
# concat-and-chunk packing every pretraining pipeline runs to fill
# fixed CONTEXT windows: docs are laid out per source in doc_id order,
# the token stream is chunked every PACK_CTX_TOKENS, and the audit
# reports per WINDOW how it filled — docs overlapping it, documents
# sliced by its trailing boundary (the cross-document attention
# contamination a packing run budgets), token fill (= CTX everywhere
# except each source's tail window), and the doc id range. The whole
# statistic is integer arithmetic over (source, doc_id, n_tok) — the
# text column never shuffles.
#
# Scale shape: one window pass PARTITIONED BY source for the running
# offsets (pack_shards' distribution argument: contiguous packing is
# the distributable rule, order-dependent first-fit is not), then each
# doc explodes to the ≤ (n_tok DIV CTX + 2) windows it touches and one
# map-side-combined (source, win) aggregate sizes the result at
# total_tokens / CTX rows — window-count-sized, never token-sized.

#: training context length in whitespace tokens (fixture docs run
#: ~60–100 tokens, so windows hold several docs AND boundary-sliced
#: docs exist at every scale factor).
PACK_CTX_TOKENS = 256


def pack_context(spark: SparkSession, sf: str) -> DataFrame:
    """Per (source, context window): docs overlapping the window, docs
    sliced by its trailing boundary, token fill, and the doc id range
    — the fragmentation audit of concat-and-chunk packing."""
    from pyspark.sql import Window

    ctx = PACK_CTX_TOKENS
    docs = (
        load_table(spark, sf, "documents")
        .where(F.col("text").isNotNull())  # null docs pack zero tokens
        .select(
            "source", "doc_id", F.size(F.split("text", " ")).alias("n_tok")
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = docs.withColumn(
        "cum_end", F.sum("n_tok").over(w)
    ).selectExpr(
        "source",
        "doc_id",
        "n_tok",
        "cum_end - n_tok AS start_off",
        "cum_end",
        f"CAST((cum_end - n_tok) DIV {ctx} AS BIGINT) AS first_win",
        f"CAST((cum_end - 1) DIV {ctx} AS BIGINT) AS last_win",
    )
    per_win = spans.selectExpr(
        "source",
        "doc_id",
        "start_off",
        "cum_end",
        "explode(sequence(first_win, last_win)) AS win",
    ).selectExpr(
        "source",
        "win",
        "doc_id",
        f"least(cum_end, (win + 1) * {ctx})"
        f" - greatest(start_off, win * {ctx}) AS tok_in_win",
        f"CAST(cum_end > (win + 1) * {ctx} AS INT) AS crosses_out",
    )
    return (
        per_win.groupBy("source", "win")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("crosses_out").cast("long").alias("n_sliced"),
            F.sum("tok_in_win").cast("long").alias("win_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "win")
    )


PACK_CONTEXT_SQL = f"""
WITH d AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
  FROM documents WHERE text IS NOT NULL),
spans AS (
  SELECT source, doc_id, n_tok,
         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum_end
  FROM d),
sp AS (
  SELECT source, doc_id, cum_end - n_tok AS start_off, cum_end,
         CAST((cum_end - n_tok) // {PACK_CTX_TOKENS} AS BIGINT)
           AS first_win,
         CAST((cum_end - 1) // {PACK_CTX_TOKENS} AS BIGINT) AS last_win
  FROM spans),
per_win AS (
  SELECT source, u.win AS win, doc_id,
         least(cum_end, (u.win + 1) * {PACK_CTX_TOKENS})
           - greatest(start_off, u.win * {PACK_CTX_TOKENS}) AS tok_in_win,
         CASE WHEN cum_end > (u.win + 1) * {PACK_CTX_TOKENS}
              THEN 1 ELSE 0 END AS crosses_out
  FROM (SELECT source, doc_id, start_off, cum_end,
               unnest(range(first_win, last_win + 1)) AS win
        FROM sp) u)
SELECT source, win, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(crosses_out) AS BIGINT) AS n_sliced,
       CAST(sum(tok_in_win) AS BIGINT) AS win_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM per_win GROUP BY source, win ORDER BY source, win"""


# --- training-order interleaving audit ------------------------------------
# STAGED for the round-11 driver window (round-10's is full; the
# staging every late operator goes through). The ordering counterpart
# of the mixture ops: a training run streams docs in the deterministic
# hash-shuffle order (position key = Knuth hash of doc_id), and this
# audit answers "is every source well INTERLEAVED across that order,
# or does some source clump?" — clumped sources make the loss curve
# lurch (the model sees a wall of one distribution). Positions are
# audited at bucket granularity: the hash assigns each doc to one of
# SHUF_BUCKETS equal windows of the shuffled stream, and per source we
# chart the bucket histogram plus its χ² uniformity statistic against
# the ideal n/B-per-bucket fill. The χ² numerator Σ(B·obs − n)² is
# exact bigint arithmetic (one rounded division at the end, no float
# accumulation anywhere); zero-hit buckets enter the sum as (0 − n/B)²
# terms via the (B − buckets_hit)·n² correction.
#
# Scale shape: the bucket assignment is a stateless scan projection
# (same Knuth arithmetic as the splitter — no RNG, replayable in any
# engine); the only shuffle is the (source, bucket) groupBy, map-side
# combined to ≤ n_sources·SHUF_BUCKETS rows; the χ² fold then runs
# over that tiny table. At n_docs ≳ 3e9 per source the squared terms
# approach int64 — swap to DECIMAL(38) there, noted not hidden.

SHUF_SEED_OFFSET = 424_242  # decorrelates from splitter/sampler/temp
SHUF_BUCKETS = 64
#: loose gate above χ²₀.₉₅(df=63) ≈ 82.5 — flags real clumping only
INTERLEAVE_CHI2_MAX = 110.0


def interleave_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Per source: docs, position-buckets hit (of SHUF_BUCKETS), the
    min/max bucket fill, the exact-arithmetic χ² uniformity statistic
    of the bucket histogram, and an ok flag — the well-interleaved
    check over the deterministic hash-shuffle training order."""
    from pyspark.sql import Window

    b = SHUF_BUCKETS
    per = (
        load_table(spark, sf, "documents")
        .selectExpr(
            "source",
            # HIGH bits: the quality of a multiplicative hash lives
            # in the top of the word — low-bit mod would alias the
            # doc_id stride (20·k mod 64 cycles with period 16)
            f"(doc_id + {SHUF_SEED_OFFSET}) * {KNUTH}"
            f" % {MOD32} * {b} DIV {MOD32} AS bucket",
        )
        .groupBy("source", "bucket")
        .agg(F.count("*").alias("obs"))
    )
    w = Window.partitionBy("source")
    folded = (
        per.withColumn("n", F.sum("obs").over(w))
        .groupBy("source")
        .agg(
            F.max("n").alias("n_docs"),
            F.count("*").cast("long").alias("buckets_hit"),
            F.min("obs").alias("min_obs"),
            F.max("obs").alias("max_cnt"),
            F.sum(
                (F.lit(b) * F.col("obs") - F.col("n"))
                * (F.lit(b) * F.col("obs") - F.col("n"))
            ).alias("ss_hit"),
        )
    )
    return folded.selectExpr(
        "source",
        "n_docs",
        "buckets_hit",
        f"CASE WHEN buckets_hit < {b} THEN 0L ELSE min_obs END AS min_cnt",
        "max_cnt",
        # exact-integer ratio via the WIDE HALF_UP recipe (ext/exact.py:
        # the squared-deviation numerator can pass int64 x 2e6); the ok
        # flag compares in pure 1e-6 micro-integers
        _rrw_s(
            f"ss_hit + ({b} - buckets_hit) * n_docs * n_docs",
            f"{b} * n_docs", 6,
        )
        + " AS chi2",
        "CAST((2 * CAST(ss_hit"
        f" + ({b} - buckets_hit) * n_docs * n_docs AS DECIMAL(38, 0))"
        f" * 1000000 + {b} * n_docs) DIV (2 * {b} * n_docs)"
        f" <= {int(INTERLEAVE_CHI2_MAX * 1_000_000)} AS INT) AS ok",
    ).orderBy("source")


INTERLEAVE_AUDIT_SQL = f"""
WITH per AS (
  SELECT source,
         (doc_id + {SHUF_SEED_OFFSET}) * {KNUTH}
           % {MOD32} * {SHUF_BUCKETS} // {MOD32} AS bucket,
         count(*) AS obs
  FROM documents GROUP BY 1, 2),
folded AS (
  SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS buckets_hit,
         min(obs) AS min_obs, max(obs) AS max_cnt,
         CAST(sum(({SHUF_BUCKETS} * obs - n)
                  * ({SHUF_BUCKETS} * obs - n)) AS BIGINT) AS ss_hit
  FROM (SELECT source, bucket, obs,
               CAST(sum(obs) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM per)
  GROUP BY source)
SELECT source, n_docs, buckets_hit,
       CAST(CASE WHEN buckets_hit < {SHUF_BUCKETS}
                 THEN 0 ELSE min_obs END AS BIGINT) AS min_cnt,
       max_cnt,
       {_rrw_d("ss_hit + (" + str(SHUF_BUCKETS)
               + " - buckets_hit) * n_docs * n_docs",
               str(SHUF_BUCKETS) + " * n_docs", 6)} AS chi2,
       CASE WHEN (2 * CAST(ss_hit + ({SHUF_BUCKETS} - buckets_hit)
                           * n_docs * n_docs AS HUGEINT)
                  * 1000000 + {SHUF_BUCKETS} * n_docs)
                 // (2 * {SHUF_BUCKETS} * n_docs)
                 <= {int(INTERLEAVE_CHI2_MAX * 1_000_000)}
            THEN 1 ELSE 0 END AS ok
FROM folded ORDER BY source"""


# --- temperature-balanced multilingual sampling ---------------------------

TEMP_SEED_OFFSET = 777_777  # decorrelates from splitter + sampler
TEMP_TARGET_FRAC = 0.2  # expected kept fraction of the whole corpus
#: α = 0.5 (p_l ∝ n_l^α) — sqrt specifically: it is CORRECTLY ROUNDED in
#: IEEE 754 (unlike pow(x, 0.7), whose libm results can differ by an ulp
#: between engines), so the per-language rates match DuckDB bit-for-bit.


def sample_temperature(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature sampling across languages (the XLM-R/mT5 rebalance):
    keep documents with probability r_l chosen so each language's share
    of the sample follows p_l ∝ sqrt(n_l) instead of n_l — upweighting
    low-resource languages — with the total kept fraction ≈
    TEMP_TARGET_FRAC. Deterministic: the keep decision is the Knuth hash
    of doc_id against the per-language rate, so the sample is stable
    across runs/engines.

    Plan shape: language counts are a vocabulary-sized aggregate,
    broadcast back; the keep decision is then a pushable per-row filter
    — the corpus scans once, the text never shuffles."""
    docs = load_table(spark, sf, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_l"))
    tot = counts.agg(
        F.sum("n_l").alias("n_total"),
        F.round(F.sum(F.sqrt("n_l")), 6).alias("sum_sqrt"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_l",
        F.least(
            F.lit(1.0),
            F.lit(TEMP_TARGET_FRAC)
            * F.col("n_total")
            * F.sqrt("n_l")
            / F.col("sum_sqrt")
            / F.col("n_l"),
        ).alias("rate"),
    )
    kept = (
        docs.join(F.broadcast(rates), "lang")
        .where(
            _pct_f(F.col("doc_id"), TEMP_SEED_OFFSET)
            < F.col("rate") * 100.0
        )
    )
    return (
        kept.groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.min("doc_id").alias("min_doc_id"))
        .join(rates, "lang")
        .select(
            "lang",
            "n_l",
            F.round("rate", 6).alias("rate"),
            "n_sampled",
            "min_doc_id",
        )
        .orderBy("lang")
    )


def _pct_f(key: Column, offset: int) -> Column:
    """Hash percentile as a fine-grained fraction in [0, 100): modulo
    10⁶ scaled down, so fractional per-language rates resolve (the
    coarse ``% 100`` bucket would quantize rates to whole percents)."""
    return (((key + offset) * KNUTH) % MOD32 % 1_000_000) / 10_000.0


SAMPLE_TEMPERATURE_SQL = f"""
WITH counts AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
tot AS (SELECT CAST(sum(n_l) AS BIGINT) AS n_total,
               round(sum(sqrt(n_l)), 6) AS sum_sqrt FROM counts),
rates AS (
  -- CAST AS DOUBLE: DuckDB parses bare 0.2/100.0/10000.0 as exact
  -- DECIMAL while Spark uses DOUBLE; identical IEEE sequences are
  -- required for the boundary keep decisions + round(rate, 6) to match
  SELECT lang, n_l,
         least(CAST(1.0 AS DOUBLE),
               CAST({TEMP_TARGET_FRAC} AS DOUBLE) * n_total * sqrt(n_l)
                    / sum_sqrt / n_l) AS rate
  FROM counts, tot),
kept AS (
  SELECT d.lang, d.doc_id
  FROM documents d JOIN rates r ON d.lang = r.lang
  WHERE ((((d.doc_id + {TEMP_SEED_OFFSET}) * {KNUTH}) % {MOD32})
         % 1000000) / CAST(10000.0 AS DOUBLE)
        < r.rate * CAST(100.0 AS DOUBLE))
SELECT k.lang, r.n_l, round(r.rate, 6) AS rate,
       count(*) AS n_sampled, min(k.doc_id) AS min_doc_id
FROM kept k JOIN rates r ON k.lang = r.lang
GROUP BY k.lang, r.n_l, r.rate ORDER BY k.lang"""


# --- deterministic per-stratum reservoir (exact k) ------------------------

RESERVOIR_K = 20
RESERVOIR_SEED_OFFSET = 424_242  # decorrelates from the other samplers


def sample_reservoir(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-k-per-stratum sample (the "give me exactly 20 docs per
    language" ask rate-based sampling can't answer): rank documents
    inside each language by their Knuth hash and keep the first k. The
    hash order is a uniform random permutation to any observer but pure
    arithmetic to the engines, so the sample is reproducible and
    oracle-checkable. One shuffle on lang (the rank window); the text
    column is never read. At 100 TB with a hot stratum, rank via
    per-partition top-k first (the same two-stage trick as
    salted_downsample) — k rows survive per partition before the final
    window."""
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents")
    key = F.pmod(
        (F.col("doc_id") + F.lit(RESERVOIR_SEED_OFFSET)) * F.lit(KNUTH),
        F.lit(MOD32),
    )
    w = Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= RESERVOIR_K)
        .select("lang", "doc_id", "rk")
        .orderBy("lang", "rk")
    )


SAMPLE_RESERVOIR_SQL = f"""
WITH ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ((doc_id + {RESERVOIR_SEED_OFFSET}) * {KNUTH}) % {MOD32},
                    doc_id
         ) AS rk
  FROM documents)
SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {RESERVOIR_K}
ORDER BY lang, rk"""


# --- deterministic weighted sample without replacement (A-ExpJ) -----------

WEIGHTED_K = 5
WEIGHTED_SEED_OFFSET = 777_001  # decorrelates from the other samplers


def sample_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-k-per-source sample with inclusion probability proportional
    to document length — Efraimidis-Spirakis priority sampling ("Weighted
    random sampling with a reservoir", IPL 2006): each doc gets priority
    ``u^(1/w)`` for uniform ``u`` and weight ``w``; the k largest
    priorities per stratum are a weighted sample without replacement.
    Ranked in the equivalent log form ``ln(u)/w`` (monotone in the
    priority, avoids pow's underflow for large weights). ``u`` is the
    Knuth hash of doc_id mapped into (0,1) — pure arithmetic, so the
    sample is reproducible and fully oracle-checkable like the uniform
    reservoir above.

    Scale: identical shape to ``sample_reservoir`` — one rank window per
    stratum over a projection that never reads the text; with a hot
    stratum, pre-reduce with per-partition top-k before the window (the
    priorities are mergeable: the global top-k is the top-k of partial
    top-ks, same property a distributed reservoir relies on)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents")
    u = (
        F.pmod(
            (F.col("doc_id") + F.lit(WEIGHTED_SEED_OFFSET)) * F.lit(KNUTH),
            F.lit(MOD32),
        )
        + F.lit(0.5)
    ) / F.lit(MOD32)
    key = F.log(u) / F.col("n_chars")
    w = Window.partitionBy("source").orderBy(key.desc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= WEIGHTED_K)
        .select("source", "doc_id", "n_chars", "rk")
        .orderBy("source", "rk")
    )


SAMPLE_WEIGHTED_SQL = f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         ln((CAST(((doc_id + {WEIGHTED_SEED_OFFSET}) * {KNUTH}) % {MOD32}
              AS DOUBLE) + CAST(0.5 AS DOUBLE)) / {MOD32}) / n_chars AS k
  FROM documents),
ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY source ORDER BY k DESC, doc_id ASC) AS rk
  FROM keyed)
SELECT source, doc_id, n_chars, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {WEIGHTED_K}
ORDER BY source, rk"""


# --- per-source mixture planning ------------------------------------------

#: target token budget for the mixture — sized BELOW the sf0.01 corpus
#: (~28k tokens) so the oracle exercises fractional sampling rates, not
#: just the rate=1.0 cap
MIX_TOKEN_BUDGET = 10_000.0


def corpus_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Mixture planning per SOURCE — the audit table a training run's
    data recipe is built from (the Pile/DoReMi-style worksheet):
    natural token share per source, the temperature-rebalanced mixture
    weight (w_s ∝ sqrt(n_tokens) — sqrt for the same bit-exact
    cross-engine reason as ``sample_temperature``), and the per-source
    sampling rate + expected token yield against a fixed token budget
    (rates cap at 1.0 — a source can't yield more than it has; capped
    sources under-fill the budget, visible in the expected column).

    Complements ``sample_temperature`` (per-DOC keep decisions): this
    is the PLAN — what a pipeline reviews and version-controls before
    any sampling runs.

    Plan shape: one token-count aggregate per source (map-side
    combined, |sources| rows), then window arithmetic over that tiny
    aggregate table — the corpus scans once, the text never shuffles."""
    docs = load_table(spark, sf, "documents").selectExpr(
        "doc_id", "source", "size(split(text, ' ')) AS n_tok"
    )
    return mixture_plan_from_tokens(docs)


def mixture_plan_from_tokens(per_doc: DataFrame) -> DataFrame:
    """The mixture-plan arithmetic over any (doc_id, source, n_tok)
    frame — shared by :func:`corpus_mixture` (whole corpus) and the
    curation pipeline (quality-GATED corpus): per source the natural
    and sqrt-rebalanced token shares, the budget-capped sampling rate,
    and the expected token yield."""
    from pyspark.sql import Window

    per_src = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy()
    sum_w = F.round(F.sum(F.sqrt("n_tokens")).over(w), 6)
    mix_frac = F.round(F.sqrt("n_tokens") / sum_w, 6)
    # nat_frac / rate / expected are exact-integer ratios -> the
    # ext/exact.py HALF_UP recipe (mix_frac itself is sqrt-derived, so
    # its float round is safe; the rate re-enters integer space via the
    # 6-dp micro rendering of mix_frac)
    b = int(MIX_TOKEN_BUDGET)
    return (
        per_src.select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr(_rr_s("n_tokens", "sum(n_tokens) OVER ()", 6)).alias(
                "nat_frac"
            ),
            mix_frac.alias("mix_frac"),
        )
        .withColumn(
            "_rate_i",
            F.expr(
                "least(CAST(1000000 AS BIGINT), "
                "(2 * CAST(round(mix_frac * 1000000, 0) AS BIGINT)"
                f" * {b} + n_tokens) DIV (2 * n_tokens))"
            ),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_tokens",
            "nat_frac",
            "mix_frac",
            "_rate_i / 1000000.0d AS sample_rate",
            "((2 * _rate_i * n_tokens + 10000) DIV (2 * 10000))"
            " / 100.0d AS expected_tokens",
        )
        .orderBy("source")
    )


CORPUS_MIXTURE_SQL = f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
enr AS (
  SELECT source, n_docs, n_tokens,
         {_rr_d("n_tokens", "sum(n_tokens) OVER ()", 6)} AS nat_frac,
         round(sqrt(n_tokens)
               / round(sum(sqrt(n_tokens)) OVER (), 6), 6) AS mix_frac
  FROM per_src),
ri AS (
  SELECT *, least(CAST(1000000 AS BIGINT),
             (2 * CAST(round(mix_frac * 1000000, 0) AS BIGINT)
              * {int(MIX_TOKEN_BUDGET)} + n_tokens)
             // (2 * n_tokens)) AS rate_i
  FROM enr)
SELECT source, n_docs, n_tokens, nat_frac, mix_frac,
       rate_i / 1000000.0 AS sample_rate,
       ((2 * rate_i * n_tokens + 10000) // (2 * 10000)) / 100.0
         AS expected_tokens
FROM ri ORDER BY source"""


# --- mixture plan EXECUTION (the apply half of the recipe) ----------------
# Registered round 10 (staged through round 9 while that window was
# full; the staging
# every late operator goes through). `corpus_mixture` is the worksheet a
# pipeline reviews; this op EXECUTES it — the deterministic Knuth-hash
# Bernoulli keep at each source's planned rate — and audits achieved
# docs/tokens against the plan's expectations, the yield check a
# training run signs off before shipping shards. Plan shape: the plan
# is a |sources|-row broadcast; the keep decision is a pushable per-row
# filter; achieved counts are one map-side-combined aggregate — the
# corpus scans once and the text never shuffles.

MIX_SEED_OFFSET = 777_777  # decorrelated from split/sample/temperature


def corpus_mixture_apply(spark: SparkSession, sf: str) -> DataFrame:
    """Per source: the planned rate and expected token yield (from
    :func:`corpus_mixture`), the achieved kept-doc/token counts under
    the deterministic keep, and the relative yield gap in percent —
    sampling noise made visible against the plan (rate-1.0 sources gap
    0 exactly; Bernoulli sources land within sampling error)."""
    docs = load_table(spark, sf, "documents").selectExpr(
        "doc_id", "source", "size(split(text, ' ')) AS n_tok"
    )
    return mixture_apply_audit(docs, mixture_plan_from_tokens(docs))


def mixture_apply_audit(per_doc: DataFrame, plan: DataFrame) -> DataFrame:
    """Execute a mixture plan over any (doc_id, source, n_tok) frame —
    deterministic Knuth-hash Bernoulli keep at each source's planned
    rate — and audit achieved docs/tokens against the plan's
    expectations. Shared by :func:`corpus_mixture_apply` and the
    curation pipeline's gated variant."""
    plan = plan.select("source", "sample_rate", "expected_tokens")
    kept = per_doc.join(F.broadcast(plan), "source").where(
        _pct_f(F.col("doc_id"), MIX_SEED_OFFSET)
        < F.col("sample_rate") * 100.0
    )
    achieved = kept.groupBy("source").agg(
        F.count("*").alias("n_docs_kept"),
        F.sum("n_tok").cast("bigint").alias("achieved_tokens"),
    )
    return (
        plan.join(achieved, "source", "left")
        .selectExpr(
            "source",
            "sample_rate",
            "CAST(coalesce(n_docs_kept, 0) AS BIGINT) AS n_docs_kept",
            "CAST(coalesce(achieved_tokens, 0) AS BIGINT)"
            " AS achieved_tokens",
            "expected_tokens",
            # signed exact-integer ratio (ext/exact.py): gap can be
            # negative, and DIV/'//' truncation differs by sign
            _rrs_s(
                "(100 * coalesce(achieved_tokens, 0)"
                " - CAST(round(expected_tokens * 100, 0) AS BIGINT)) * 100",
                "CAST(round(expected_tokens * 100, 0) AS BIGINT)",
                2,
            )
            + " AS gap_pct",
        )
        .orderBy("source")
    )


CORPUS_MIXTURE_APPLY_SQL = f"""
WITH plan AS (SELECT source, sample_rate, expected_tokens
              FROM ({CORPUS_MIXTURE_SQL})),
d AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
      FROM documents),
kept AS (
  SELECT d.source, d.n_tok
  FROM d JOIN plan p ON d.source = p.source
  WHERE ((((d.doc_id + {MIX_SEED_OFFSET}) * {KNUTH}) % {MOD32})
         % 1000000) / 10000.0 < p.sample_rate * 100.0),
achieved AS (
  SELECT source, count(*) AS n_docs_kept,
         CAST(sum(n_tok) AS BIGINT) AS achieved_tokens
  FROM kept GROUP BY source)
SELECT p.source AS source, p.sample_rate,
       CAST(COALESCE(a.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
       CAST(COALESCE(a.achieved_tokens, 0) AS BIGINT) AS achieved_tokens,
       p.expected_tokens,
       {_rrs_d("(100 * COALESCE(a.achieved_tokens, 0)"
               " - CAST(round(p.expected_tokens * 100, 0) AS BIGINT)) * 100",
               "CAST(round(p.expected_tokens * 100, 0) AS BIGINT)",
               2)} AS gap_pct
FROM plan p LEFT JOIN achieved a ON p.source = a.source
ORDER BY source"""


# The registry import sits HERE, not at the top: registry's import
# chain re-enters this package (registry -> pipeline -> sampling.KNUTH
# and friends), so a sampling-first import order must have every name
# pipeline consumes defined BEFORE the chain starts. All register()
# calls live below this line (round 12; previously sampling-first
# imports crashed with a partially-initialized-module ImportError).
from dariadb_spark.registry import register  # noqa: E402

register("ext_split_train_test", split_train_test, SPLIT_SQL)
register("ext_sample_reservoir", sample_reservoir, SAMPLE_RESERVOIR_SQL)
register("ext_sample_temperature", sample_temperature, SAMPLE_TEMPERATURE_SQL)
register("ext_sample_stratified", sample_stratified, SAMPLE_SQL)
register("ext_sample_weighted", sample_weighted, SAMPLE_WEIGHTED_SQL)
register("ext_pack_shards", pack_shards, PACK_SHARDS_SQL)
register("ext_corpus_mixture", corpus_mixture, CORPUS_MIXTURE_SQL)
register("ext_corpus_mixture_apply", corpus_mixture_apply, CORPUS_MIXTURE_APPLY_SQL)

# round 11: the two ordering/packing audits staged through round 10 join
# the driver-checked surface (window discipline per registry.py).
register("ext_interleave_audit", interleave_audit, INTERLEAVE_AUDIT_SQL)
register("ext_pack_context", pack_context, PACK_CONTEXT_SQL)


# --- token-budget epoch planner (data-constrained scaling) ----------------
# STAGED for the round-12 driver window (round-11's is full; the staging
# every late operator goes through). The public recipe: "Scaling
# Data-Constrained Language Models" (Muennighoff et al., NeurIPS 2023) —
# when the token budget exceeds the fresh-token supply, repeat data up
# to a small epoch ceiling (returns decay little through ~4 epochs, fast
# beyond). The planner answers the operational question that follows:
# given budget B and per-source unique-token supplies U_s, how many
# EPOCHS of each source does a run make? Shares start uniform (the
# balanced-mix default; a mixture recipe slots in by replacing the base
# allocation row), every source caps at BUDGET_MAX_EPOCHS · U_s, and
# capped-source excess water-fills into sources with room,
# proportionally to remaining room — two redistribution rounds unrolled
# for the oracle, ``token_budget_iterate`` driving to convergence.
#
# Determinism: the whole schedule is exact int64 token arithmetic —
# integer base shares with remainder-by-source-order, integer caps,
# floor-proportional redistribution clamped to room (leftover pennies
# carry to the next round; the terminal residual is reported in the
# ``unplaced`` column) — and epochs are HALF_UP 4-dp integer quotients.
# No float enters any allocation decision.
#
# Scale shape: ONE corpus token-count aggregate (map-side combined,
# |sources| rows; the text never shuffles), then window arithmetic over
# the K-row worksheet — the mixture-plan/DoReMi shape. The epoch and
# share QUOTIENTS run the self-guarding closure (ext/exact.py, round
# 12): past the narrow int64 ceiling they swap to DECIMAL(38)/HUGEINT
# per row automatically. The water-filling pool·room PRODUCTS keep the
# int64 exact path to ~1e13 tokens (≈ 40 TB of text); past that the
# redistribution runs in kilotoken units, a granularity no epoch
# schedule cares about (documented, not silently truncated).

BUDGET_NUM, BUDGET_DEN = 9, 5  # B = ⌊9/5 · total tokens⌋
BUDGET_MAX_EPOCHS = 2  # per-source repetition ceiling


def _budget_round(df: DataFrame, a: str, out: str) -> DataFrame:
    """One water-filling round in exact integers: clamp ``a`` to the
    cap, pool the excess (plus any carried ``excess`` column), and
    redistribute floor-proportionally to remaining room. Emits ``out``
    (new allocation) and refreshed ``excess``."""
    from pyspark.sql import Window

    w = Window.partitionBy()
    held = F.expr(f"least({a}, cap_tokens)")
    df = df.withColumn("_held", held).withColumn(
        "_pool",
        F.sum(F.col(a) - F.col("_held")).over(w) + F.col("excess"),
    )
    df = df.withColumn("_room", F.col("cap_tokens") - F.col("_held"))
    df = df.withColumn("_rtot", F.sum("_room").over(w))
    df = df.withColumn(
        "_add",
        F.expr(
            "IF(_rtot = 0, 0L, least(_room, _pool * _room DIV _rtot))"
        ),
    )
    return (
        df.withColumn(out, F.col("_held") + F.col("_add"))
        .withColumn(
            "excess", F.col("_pool") - F.sum("_add").over(w)
        )
        .drop("_held", "_pool", "_room", "_rtot", "_add")
    )


def _budget_base(spark: SparkSession, sf: str) -> DataFrame:
    """The K-row worksheet: per-source supply, cap, and the uniform
    integer base allocation (remainder tokens to the first B mod K
    sources in name order)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents").where("text IS NOT NULL")
    per_src = docs.selectExpr(
        "source", "size(split(text, ' ')) AS n_tok"
    ).groupBy("source").agg(F.sum("n_tok").cast("bigint").alias("n_tokens"))
    w = Window.partitionBy()
    return (
        per_src.withColumn("_tot", F.sum("n_tokens").over(w))
        .withColumn("_k", F.count("*").over(w))
        .withColumn(
            "_rk", F.row_number().over(Window.orderBy(F.asc("source")))
        )
        .selectExpr(
            "source",
            "n_tokens",
            f"CAST({BUDGET_MAX_EPOCHS} * n_tokens AS BIGINT) AS cap_tokens",
            f"_tot * {BUDGET_NUM} DIV {BUDGET_DEN} AS budget",
            f"(_tot * {BUDGET_NUM} DIV {BUDGET_DEN}) DIV _k"
            f" + IF(_rk <= (_tot * {BUDGET_NUM} DIV {BUDGET_DEN}) % _k,"
            " 1L, 0L) AS alloc0",
            "CAST(0 AS BIGINT) AS excess",
        )
    )


def token_budget_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Per source: unique-token supply, the epoch cap in tokens, the
    uniform base allocation, the allocation after two water-filling
    rounds, its 4-dp epoch count, the capped flag, the 6-dp share of
    budget, and the terminal unplaced residual (constant per row).

    The epoch and share quotients run through the SELF-GUARDING closure
    (ext/exact.py round 12): numerators here are corpus-total token
    counts, the first operands to cross the narrow int64 ceiling at
    ~18 TB of text — past it the expressions swap to DECIMAL(38)/
    HUGEINT per row automatically instead of wrapping (the quotient
    itself — epochs ≤ 2, share ≤ 1 — always fits)."""
    df = _budget_base(spark, sf)
    df = _budget_round(df, "alloc0", "alloc1")
    df = _budget_round(df, "alloc1", "alloc2")
    return _budget_verdict(df)


def _budget_verdict(df: DataFrame) -> DataFrame:
    """The plan's output projection over a finished worksheet
    (source, n_tokens, cap_tokens, alloc0, alloc2, budget, excess) —
    split out so the ceiling-boundary pytest can drive the SAME guarded
    expressions on planted beyond-int64-ceiling worksheets."""
    from dariadb_spark.ext.exact import (
        ratio_round_guarded_spark as _rrg_s,
    )

    return df.selectExpr(
        "source",
        "n_tokens",
        "cap_tokens",
        "alloc0",
        "alloc2 AS alloc",
        _rrg_s("alloc2", "n_tokens", 4) + " AS epochs",
        "CAST(alloc2 = cap_tokens AS INT) AS capped",
        _rrg_s("alloc2", "budget", 6) + " AS budget_share",
        "excess AS unplaced",
    ).orderBy("source")


def _budget_round_sql(i: int, prev: str) -> str:
    """One water-filling round as TWO CTE stages: windows may not nest,
    so stage a materializes held/pool/room/rtot and stage b derives the
    clamped add, the new allocation, and the carried excess."""
    add = "CASE WHEN rtot = 0 THEN 0 ELSE least(room, pool * room // rtot) END"
    return f"""r{i} AS (
  SELECT source, n_tokens, cap_tokens, budget,
         least(a, cap_tokens) AS held,
         sum(a - least(a, cap_tokens)) OVER () + excess AS pool,
         cap_tokens - least(a, cap_tokens) AS room,
         sum(cap_tokens - least(a, cap_tokens)) OVER () AS rtot
  FROM {prev}),
b{i} AS (
  SELECT source, n_tokens, cap_tokens, budget,
         held + {add} AS a,
         pool - sum({add}) OVER () AS excess
  FROM r{i})"""


TOKEN_BUDGET_PLAN_SQL = f"""
WITH per_src AS (
  SELECT source,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL GROUP BY source),
b0 AS (
  SELECT source, n_tokens,
         CAST({BUDGET_MAX_EPOCHS} * n_tokens AS BIGINT) AS cap_tokens,
         sum(n_tokens) OVER () * {BUDGET_NUM} // {BUDGET_DEN} AS budget,
         (sum(n_tokens) OVER () * {BUDGET_NUM} // {BUDGET_DEN})
           // count(*) OVER ()
           + CASE WHEN row_number() OVER (ORDER BY source)
                       <= (sum(n_tokens) OVER () * {BUDGET_NUM}
                           // {BUDGET_DEN}) % count(*) OVER ()
                  THEN 1 ELSE 0 END AS a,
         CAST(0 AS BIGINT) AS excess
  FROM per_src),
{_budget_round_sql(1, "b0")},
{_budget_round_sql(2, "b1")}
SELECT b0.source, b0.n_tokens, b0.cap_tokens,
       CAST(b0.a AS BIGINT) AS alloc0,
       CAST(b2.a AS BIGINT) AS alloc,
       {_rrg_d("b2.a", "b0.n_tokens", 4)} AS epochs,
       CAST(CASE WHEN b2.a = b0.cap_tokens THEN 1 ELSE 0 END AS INT)
         AS capped,
       {_rrg_d("b2.a", "b0.budget", 6)} AS budget_share,
       CAST(b2.excess AS BIGINT) AS unplaced
FROM b0 JOIN b2 USING (source) ORDER BY b0.source"""


def token_budget_iterate(
    spark: SparkSession,
    sf: str,
    max_rounds: int = 64,
) -> list[dict]:
    """Production water-filling to convergence: collect the K-row
    worksheet once (the DoReMi driver-state bound) and iterate in exact
    Python ints until the excess pool is empty or no room remains.
    Round 2's state is bit-identical to the unrolled query (pinned in
    tests). Returns per-source dicts with the final allocation, epochs,
    capped flag, and rounds used."""
    base = _budget_base(spark, sf).orderBy("source").collect()
    src = [
        {"source": r.source, "u": int(r.n_tokens), "cap": int(r.cap_tokens)}
        for r in base
    ]
    budget = int(base[0].budget) if base else 0
    a = {s["source"]: None for s in src}
    alloc = [int(r.alloc0) for r in base]
    excess = 0
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        held = [min(x, s["cap"]) for x, s in zip(alloc, src)]
        pool = sum(x - h for x, h in zip(alloc, held)) + excess
        room = [s["cap"] - h for h, s in zip(held, src)]
        rtot = sum(room)
        add = [
            0 if rtot == 0 else min(r, pool * r // rtot) for r in room
        ]
        alloc = [h + ad for h, ad in zip(held, add)]
        excess = pool - sum(add)
        # done when placed, out of room, or stalled on terminal pennies
        # (a residual so small the floor-proportional shares all hit 0)
        if excess == 0 or rtot == 0 or sum(add) == 0:
            break
    out = []
    for s, x in zip(src, alloc):
        u = s["u"]
        out.append(
            {
                "source": s["source"],
                "n_tokens": u,
                "alloc": x,
                "epochs": ((2 * x * 10000 + u) // (2 * u)) / 10000.0,
                "capped": int(x == s["cap"]),
                "budget_share": (
                    ((2 * x * 10**6 + budget) // (2 * budget)) / 1e6
                    if budget
                    else 0.0
                ),
                "unplaced": excess,
                "rounds": rounds,
            }
        )
    return out


# --- deterministic epoch-seeded training-order shuffle --------------------
# STAGED for the round-12 driver window (the staging every late operator
# goes through). The PRODUCER of the training order the interleave
# audit above consumes: multi-epoch training re-shuffles the corpus
# every epoch, and reproducibility demands the permutation be a pure
# function of (epoch, doc_id) — no RNG state, no partition-order
# dependence, resumable from any position. The shuffle key is the
# 60-bit md5 of 'ord#epoch#doc_id' (the engine-wide h60 — mirrorable in
# the oracle, decorrelated across epochs by construction), position =
# rank of key within the epoch.
#
# Scale shape: the per-epoch global sort IS the shuffle — a
# range-partitioned sort on the 60-bit key, exactly what a training
# data loader needs to write position-ranged shards (shard i = key
# range i, already sorted; readers stream shards in order and get the
# global permutation without any coordinator). Epochs are independent
# plans — materialize them lazily per epoch, not all at once; the
# EPOCHS=3 fixture output just proves the cross-epoch decorrelation.

SHUF_EPOCHS = 3


def train_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """(epoch, position, doc_id, shuffle_key) for EPOCHS independent
    deterministic permutations of the corpus."""
    from pyspark.sql import Window

    from dariadb_spark.ext.hashes import _h60_spark

    docs = load_table(spark, sf, "documents").select("doc_id")
    key = _h60_spark(
        "concat('ord#', CAST(epoch AS STRING), '#', CAST(doc_id AS STRING))"
    )
    keyed = docs.selectExpr(
        "doc_id",
        f"explode(sequence(0, {SHUF_EPOCHS - 1})) AS epoch",
    ).selectExpr("epoch", "doc_id", f"{key} AS shuffle_key")
    w = Window.partitionBy("epoch").orderBy(
        F.asc("shuffle_key"), F.asc("doc_id")
    )
    return (
        keyed.select(
            "epoch",
            F.row_number().over(w).cast("long").alias("position"),
            "doc_id",
            "shuffle_key",
        )
        .orderBy("epoch", "position")
    )


from dariadb_spark.ext.hashes import _h60_duck  # noqa: E402

TRAIN_SHUFFLE_SQL = f"""
WITH keyed AS (
  SELECT e.epoch, d.doc_id,
         {_h60_duck("concat('ord#', CAST(e.epoch AS VARCHAR), '#',"
                    " CAST(d.doc_id AS VARCHAR))")} AS shuffle_key
  FROM documents d
  CROSS JOIN (SELECT unnest(range({SHUF_EPOCHS})) AS epoch) e)
SELECT epoch,
       CAST(row_number() OVER (PARTITION BY epoch
                               ORDER BY shuffle_key ASC, doc_id ASC)
            AS BIGINT) AS position,
       doc_id, shuffle_key
FROM keyed ORDER BY epoch, position"""


# round 12: the two sampling operators staged through round 11 join the
# driver-checked surface (parity + stress pytest cases pinned in
# tests/test_sketches.py since r11; window discipline per registry.py).
register("ext_token_budget_plan", token_budget_plan, TOKEN_BUDGET_PLAN_SQL)
register("ext_train_shuffle", train_shuffle, TRAIN_SHUFFLE_SQL)


# --- per-document overlapping chunk plan (RAG/eval ingest) -----------------
# STAGED for the round-19 driver window (ninth pass, same staging
# discipline). pack_context audits CONCAT-and-chunk packing (documents
# merged into one token stream, windows slice across docs); this is
# the OTHER chunking a pipeline runs — the document-PRESERVING
# sliding-window split every retrieval/eval ingest uses: each doc
# yields ceil-spaced windows of CHUNK_CHARS chars advancing by
# CHUNK_STRIDE (overlap = CHUNK_CHARS − CHUNK_STRIDE), the final
# window clipped at the doc end, never crossing a document boundary.
# The plan is pure integer arithmetic over (doc_id, source, n_chars) —
# the text column is never read, so at 100 TB the planner shuffles
# 24-byte rows while the payload stays in place (the length-mix /
# media-fingerprint convention). Every expression is TOTAL on the
# domain (greatest() before the ceil-div, the SCALE.md §total lesson):
# short docs (n_chars ≤ CHUNK_CHARS) emit exactly one clipped chunk,
# zero-length docs one empty chunk — the planner never drops a doc.
#
# Coverage invariants (pinned in pytest): with stride ≤ window every
# char of every doc lands in ≥ 1 chunk; chunk starts are i·stride; the
# last chunk always reaches the doc end.

#: retrieval chunk window, in chars (the fixture's n_chars run 48–553,
#: so 1-, 2- and 3-chunk docs all exist at every scale factor)
CHUNK_CHARS = 256
#: chunk-to-chunk advance; overlap = CHUNK_CHARS - CHUNK_STRIDE = 64
CHUNK_STRIDE = 192


def docs_chunk_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r19 window (:func:`docs_chunk_plan_op`)."""
    return docs_chunk_plan_op(load_table(spark, sf, "documents"))


def docs_chunk_plan_op(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_chunks, chunk_idx, start_char, len_chars,
    is_tail) — one row per planned chunk.

    n_chunks = 1 + ceil(max(n_chars − W, 0) / S) with W = CHUNK_CHARS,
    S = CHUNK_STRIDE; chunk i covers [i·S, i·S + min(W, n_chars − i·S)).
    A NULL n_chars plans like 0 (one empty chunk) — never a dropped
    doc.
    All integer; the greatest() keeps the ceil-div total on short docs
    (a bare (n_chars − W + S − 1) DIV S diverges between engines on
    negative dividends: Spark DIV truncates toward zero, DuckDB //
    floors).

    Plan shape (100 TB): stateless per-row projection → explode to
    chunk rows (output-sized, ≤ n_chars/S per doc) — no join, no
    window, and no exchange anywhere in the planning core; the one
    shuffle is the final presentation ORDER BY over the 24-byte
    output rows (drop the sort for a pipeline consumer and the plan
    is exchange-free); text never read."""
    w, s = CHUNK_CHARS, CHUNK_STRIDE
    return (
        # coalesce keeps the planner TOTAL on a NULL n_chars: without
        # it n_chunks goes NULL and explode(sequence(0, NULL)) DROPS
        # the doc silently in both engines — parity would stay green
        # while the "never drops a doc" contract broke
        docs.selectExpr(
            "doc_id",
            "source",
            f"CAST(1 + (greatest(coalesce(n_chars, 0) - {w}, 0)"
            f" + {s} - 1) DIV {s} AS BIGINT) AS n_chunks",
            "coalesce(n_chars, 0) AS n_chars",
        )
        .selectExpr(
            "doc_id",
            "source",
            "n_chunks",
            "explode(sequence(CAST(0 AS BIGINT), n_chunks - 1))"
            " AS chunk_idx",
            "n_chars",
        )
        .selectExpr(
            "doc_id",
            "source",
            "n_chunks",
            "chunk_idx",
            f"chunk_idx * {s} AS start_char",
            f"least(CAST({w} AS BIGINT),"
            f" n_chars - chunk_idx * {s}) AS len_chars",
            "CAST(chunk_idx = n_chunks - 1 AS INT) AS is_tail",
        )
        .orderBy("doc_id", "chunk_idx")
    )


DOCS_CHUNK_PLAN_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(1 + (greatest(coalesce(n_chars, 0) - {CHUNK_CHARS}, 0)
                   + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} AS BIGINT)
           AS n_chunks,
         coalesce(n_chars, 0) AS n_chars
  FROM documents),
c AS (
  SELECT doc_id, source, n_chunks,
         unnest(range(0, n_chunks)) AS chunk_idx, n_chars
  FROM d)
SELECT doc_id, source, n_chunks, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * {CHUNK_STRIDE} AS BIGINT) AS start_char,
       CAST(least({CHUNK_CHARS},
                  n_chars - chunk_idx * {CHUNK_STRIDE}) AS BIGINT)
         AS len_chars,
       CAST(CASE WHEN chunk_idx = n_chunks - 1 THEN 1 ELSE 0 END AS INT)
         AS is_tail
FROM c ORDER BY doc_id, chunk_idx"""
