"""[EXT] the closed curation loop — a data recipe EXECUTED BY A TRAINED
GATE (north_star composition; registered round 10, VERDICT r9 item 2):

    train → pick operating point → quality-gate the corpus →
    plan the mixture over the GATED corpus → apply it → audit yield.

Every production training-data pipeline runs exactly this chain; the
pieces all exist as individually-oracled operators (ext/train.py's
2-step LR + threshold sweep, ext/sampling.py's mixture plan/apply) and
this module composes them into ONE driver-checked query whose DuckDB
oracle replays the full chain — training included — so a hash mismatch
anywhere in the loop (weights, threshold choice, gate membership,
rates, kept sets) fails the check.

Spark-first shape, stage by stage (100 TB audit):
* training: 2 GD steps = 2 corpus scans producing 64 partial sums each
  + KB-sized broadcast weight round-trips (ext/train.py's shape);
* operating point: the threshold sweep is one scored scan fanned to
  |thresholds| confusion cells; argmax-F1 over that 3-row table rides
  back as a broadcast scalar — no driver decision outside the plan;
* gate: documents ⋈ scores is a co-keyed equi-join on doc_id = vec_id
  (both sides hash-partition on the same key; at scale the score table
  would be bucketed alongside the corpus), then a broadcast-scalar
  filter — the text column never shuffles, only (doc_id, source,
  n_tok);
* mixture: a |sources|-row aggregate + window arithmetic over it, then
  the deterministic Knuth-hash Bernoulli keep as a pushable per-row
  filter (ext/sampling.py's shape, unchanged by composition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dariadb_spark.ext.sampling import (
    KNUTH,
    MIX_SEED_OFFSET,
    MIX_TOKEN_BUDGET,
    MOD32,
    mixture_apply_audit,
    mixture_plan_from_tokens,
)
from dariadb_spark.ext.train import (
    _LR_P2_SQL,
    EVAL_THRESHOLDS,
    confusion_sweep,
    scored_embeddings,
)
from dariadb_spark.model import load_table
from dariadb_spark.registry import register


def curate_gated_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Per source, after quality-gating at the trained classifier's
    best-F1 operating point: the gated corpus size, the mixture plan
    over the GATED corpus (rate + expected tokens against the token
    budget), and the achieved yield under the deterministic keep —
    the sign-off table for "train a gate, then execute the recipe on
    what survives it"."""
    scored = scored_embeddings(spark, sf)
    best = (
        confusion_sweep(scored)
        .orderBy(F.desc("f1"), F.asc("thr"))
        .limit(1)
        .select("thr")
    )
    docs = load_table(spark, sf, "documents").selectExpr(
        "doc_id", "source", "size(split(text, ' ')) AS n_tok"
    )
    gated = (
        docs.join(scored.selectExpr("vec_id AS doc_id", "p"), "doc_id")
        .crossJoin(F.broadcast(best))
        .where("p > thr")
        .select("doc_id", "source", "n_tok")
    )
    plan = mixture_plan_from_tokens(gated)
    audit = mixture_apply_audit(gated, plan)
    return (
        audit.join(
            plan.select(
                "source",
                F.col("n_docs").alias("n_docs_gated"),
                F.col("n_tokens").alias("gated_tokens"),
            ),
            "source",
        )
        .crossJoin(F.broadcast(best))
        .selectExpr(
            "source",
            "thr",
            "n_docs_gated",
            "gated_tokens",
            "sample_rate",
            "n_docs_kept",
            "achieved_tokens",
            "expected_tokens",
            "gap_pct",
        )
        .orderBy("source")
    )


CURATE_GATED_MIXTURE_SQL = f"""
WITH {_LR_P2_SQL},
t AS (SELECT unnest([{', '.join(f'{t}::DOUBLE' for t in EVAL_THRESHOLDS)}])
        AS thr),
conf AS (SELECT t.thr AS thr,
                CAST(sum(CASE WHEN p.p > t.thr AND p.y = 1
                              THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                CAST(sum(CASE WHEN p.p > t.thr AND p.y = 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                CAST(sum(CASE WHEN p.p <= t.thr AND p.y = 1
                              THEN 1 ELSE 0 END) AS BIGINT) AS fneg
         FROM p2 p, t GROUP BY t.thr),
best AS (SELECT thr FROM (
           SELECT thr, round(2 * tp / CAST(greatest(2 * tp + fp + fneg, 1)
                             AS DOUBLE), 4) AS f1
           FROM conf)
         ORDER BY f1 DESC, thr ASC LIMIT 1),
d AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
      FROM documents),
gated AS (SELECT d.doc_id, d.source, d.n_tok
          FROM d JOIN p2 ON p2.vec_id = d.doc_id
          WHERE p2.p > (SELECT thr FROM best)),
per_src AS (SELECT source, count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS n_tokens
            FROM gated GROUP BY source),
enr AS (SELECT source, n_docs, n_tokens,
               round(sqrt(n_tokens)
                     / round(sum(sqrt(n_tokens)) OVER (), 6), 6) AS mix_frac
        FROM per_src),
plan AS (SELECT source, n_docs, n_tokens,
                least(1.0, round(mix_frac * {MIX_TOKEN_BUDGET} / n_tokens, 6))
                  AS sample_rate,
                round(least(1.0, round(mix_frac * {MIX_TOKEN_BUDGET}
                                       / n_tokens, 6)) * n_tokens, 2)
                  AS expected_tokens
         FROM enr),
kept AS (SELECT g.source, g.n_tok
         FROM gated g JOIN plan p ON g.source = p.source
         WHERE ((((g.doc_id + {MIX_SEED_OFFSET}) * {KNUTH}) % {MOD32})
                % 1000000) / 10000.0 < p.sample_rate * 100.0),
achieved AS (SELECT source, count(*) AS n_docs_kept,
                    CAST(sum(n_tok) AS BIGINT) AS achieved_tokens
             FROM kept GROUP BY source)
SELECT p.source AS source, (SELECT thr FROM best) AS thr,
       p.n_docs AS n_docs_gated, p.n_tokens AS gated_tokens,
       p.sample_rate,
       CAST(COALESCE(a.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
       CAST(COALESCE(a.achieved_tokens, 0) AS BIGINT) AS achieved_tokens,
       p.expected_tokens,
       round((COALESCE(a.achieved_tokens, 0) - p.expected_tokens)
             / p.expected_tokens * 100, 2) AS gap_pct
FROM plan p LEFT JOIN achieved a ON p.source = a.source
ORDER BY source"""

register("ext_curate_gated_mixture", curate_gated_mixture, CURATE_GATED_MIXTURE_SQL)
