"""[EXT] trainable quality classifier — logistic regression over the
embedding table by full-batch gradient descent, the fasttext-style
scorer a training-data pipeline fits to triage documents before the
expensive stages (north_star "quality scoring", learning variant).

Registered round 9 (staged through round 8 while that window was full):
two GD steps unroll into deterministic SQL exactly like the 2-round
k-means (ext/similarity.py) — the "iterative algorithms are rows-only"
escape hatch stays closed for training too.

Spark-first shape (the MLlib LBFGS/GD skeleton): each step is ONE
corpus scan producing 64 per-dimension gradient partial sums (posexplode
→ groupBy(pos), map-side combined to ≤64 rows per partition), and the
refreshed weight vector flows back as a broadcast single-row array — at
100 TB a step costs one scan + a KB-sized broadcast, independent of the
step count. No Python touches a row.

Determinism recipe: gradients use the round(sum, 6)/n aggregate the
k-means M-step pinned; dot products are sequential folds (identical in
both engines); sigmoid/log go through round(·, 6)/round(·, 4) so a
last-ulp exp/ln difference cannot flip a compared digit (same tolerance
class as pow() in the KMV estimator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dariadb_spark.ext.exact import (
    ratio_round_duck as _rr_d,
    ratio_round_spark as _rr_s,
)
from dariadb_spark.model import load_table
from dariadb_spark.registry import register

LR_ETA = 1.0
LR_DIM = 64
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"


def _emb_labeled(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "embeddings").selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS e",
        "CAST(label < 5 AS INT) AS y",
    )


def _lit(w: list[float]) -> str:
    return f"array({', '.join(repr(x) for x in w)})"


def _p_expr(w: list[float]) -> str:
    # clamp into [1e-6, 1 - 1e-6]: a post-round p of exactly 0/1
    # would make ln() blow up, identically in both engines
    return (
        "least(0.999999d, greatest(0.000001d, "
        "round(1.0d / (1.0d + exp(-round("
        + _DOT.format(a="e", b=_lit(w))
        + ", 6))), 6)))"
    )


def _grad(emb: DataFrame, n_row: int, p_expr: str) -> list[float]:
    """One full-batch gradient: 64 per-dim round(sum,6)/n values."""
    rows = (
        emb.selectExpr("e", "y", f"{p_expr} AS p")
        .selectExpr("posexplode(e) AS (pos, x)", "p", "y")
        .groupBy("pos")
        .agg((F.round(F.sum(F.expr("x * (p - y)")), 6) / n_row).alias("g"))
        .collect()
    )
    by_pos = {int(r.pos): float(r.g) for r in rows}
    return [by_pos[i] for i in range(LR_DIM)]


def _learned_w2(emb: DataFrame, n_row: int) -> list[float]:
    """The 2-step weights the oracled queries share: w2 = w1 − η·∇(p1)
    with w1 = −η·∇(0.5) — identical to the unrolled SQL chain."""
    w1 = [-LR_ETA * g for g in _grad(emb, n_row, "CAST(0.5 AS DOUBLE)")]
    return [
        a - LR_ETA * g for a, g in zip(w1, _grad(emb, n_row, _p_expr(w1)))
    ]


def train_quality_lr(spark: SparkSession, sf: str) -> DataFrame:
    """Per GD step (0 = the zero init, 1, 2): log-loss, accuracy, and
    weight-vector norm for the binary target ``label < 5`` — the
    learning curve IS the checked result (loss must fall, accuracy must
    beat the base rate; pinned in tests)."""
    emb = _emb_labeled(spark, sf)
    n_row = emb.count()

    def _metrics(step: int, w: list[float], p_expr: str):
        wn = 0.0
        for x in w:  # sequential fold == the engines' list folds
            wn += x * x
        return (
            emb.selectExpr("y", f"{p_expr} AS p")
            .selectExpr(
                "y", "p",
                "CASE WHEN p > 0.5 THEN 1 ELSE 0 END AS pred",
                "-(y * ln(p) + (1 - y) * ln(1 - p)) AS ll",
            )
            .groupBy()
            .agg(
                F.expr("round(avg(ll), 4)").alias("log_loss"),
                # accuracy is an exact-integer ratio -> HALF_UP recipe
                # (ext/exact.py); the float-sum log_loss stays on the
                # established round(float_expr, 4) contract
                F.expr(
                    _rr_s("sum(CAST(pred = y AS INT))", "count(*)", 4)
                ).alias("accuracy"),
            )
            .selectExpr(
                f"{step}L AS step", "log_loss", "accuracy",
                f"round(sqrt({repr(wn)}), 4) AS w_norm",
            )
        )

    p0 = "CAST(0.5 AS DOUBLE)"
    w1 = [-LR_ETA * g for g in _grad(emb, n_row, p0)]
    p1 = _p_expr(w1)
    w2 = [a - LR_ETA * g for a, g in zip(w1, _grad(emb, n_row, p1))]
    p2 = _p_expr(w2)
    out = (
        _metrics(0, [0.0] * LR_DIM, p0)
        .unionByName(_metrics(1, w1, p1))
        .unionByName(_metrics(2, w2, p2))
        .orderBy("step")
    )
    return out


#: the unrolled chain through the 2-step probabilities (`p2`) — shared
#: CTE prefix of the learning-curve and threshold-sweep oracles.
_LR_P2_SQL = f"""emb AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                    CAST(label < 5 AS INT) AS y
             FROM embeddings),
n AS (SELECT count(*) AS n, sum(y) AS ny FROM emb),
g1 AS (SELECT gs.i AS pos,
              round(sum(e[gs.i] * (0.5 - y)), 6) / (SELECT n FROM n) AS g
       FROM emb CROSS JOIN generate_series(1, {LR_DIM}) gs(i)
       GROUP BY gs.i),  -- g IS the gradient at p = 0.5 (p - y = 0.5 - y)
w1 AS (SELECT list(-{LR_ETA} * g ORDER BY pos) AS w FROM g1),
p1 AS (SELECT vec_id, e, y,
              least(0.999999, greatest(0.000001,
                    round(1.0 / (1.0 + exp(-round(
                          list_dot_product(e, (SELECT w FROM w1)), 6))), 6)))
                AS p
       FROM emb),
g2 AS (SELECT gs.i AS pos,
              round(sum(e[gs.i] * (p - y)), 6) / (SELECT n FROM n) AS g
       FROM p1 CROSS JOIN generate_series(1, {LR_DIM}) gs(i)
       GROUP BY gs.i),
w2 AS (SELECT list(w1e - {LR_ETA} * g2.g ORDER BY g2.pos) AS w
       FROM g2 JOIN (SELECT unnest(w) AS w1e,
                            generate_subscripts(w, 1) AS pos
                     FROM w1) u ON u.pos = g2.pos),
p2 AS (SELECT vec_id, e, y,
              least(0.999999, greatest(0.000001,
                    round(1.0 / (1.0 + exp(-round(
                          list_dot_product(e, (SELECT w FROM w2)), 6))), 6)))
                AS p
       FROM emb)"""

TRAIN_QUALITY_LR_SQL = f"""
WITH {_LR_P2_SQL},
m0 AS (SELECT CAST(0 AS BIGINT) AS step,
              round(-ln(0.5), 4) AS log_loss,
              {_rr_d("(SELECT n FROM n) - (SELECT ny FROM n)",
                      "(SELECT n FROM n)", 4)}
                AS accuracy,
              round(0.0, 4) AS w_norm
       FROM (SELECT 1)),
m1 AS (SELECT CAST(1 AS BIGINT) AS step,
              round(avg(-(y * ln(p) + (1 - y) * ln(1 - p))), 4) AS log_loss,
              {_rr_d("sum(CAST((CASE WHEN p > 0.5 THEN 1 ELSE 0 END)"
                      " = y AS INT))", "count(*)", 4)} AS accuracy,
              (SELECT round(sqrt(list_dot_product(w, w)), 4) FROM w1)
                AS w_norm
       FROM p1),
m2 AS (SELECT CAST(2 AS BIGINT) AS step,
              round(avg(-(y * ln(p) + (1 - y) * ln(1 - p))), 4) AS log_loss,
              {_rr_d("sum(CAST((CASE WHEN p > 0.5 THEN 1 ELSE 0 END)"
                      " = y AS INT))", "count(*)", 4)} AS accuracy,
              (SELECT round(sqrt(list_dot_product(w, w)), 4) FROM w2)
                AS w_norm
       FROM p2)
SELECT * FROM m0 UNION ALL SELECT * FROM m1 UNION ALL SELECT * FROM m2
ORDER BY step"""

register("ext_train_quality_lr", train_quality_lr, TRAIN_QUALITY_LR_SQL)


# --- operating-point audit (threshold sweep over the trained scorer) ------
# Registered round 10 (staged through round 9 while that window was
# full; the staging
# every late operator goes through). A trained scorer becomes a
# deployable quality GATE only once someone picks the threshold — this
# query is that worksheet: confusion counts and precision/recall/F1 at
# a threshold sweep over the 2-step-trained classifier (the exact
# weights the oracled learning curve produces). One corpus scan scores
# and fans each row out to |thresholds| confusion cells — a
# |thresholds|-row result regardless of corpus size.

EVAL_THRESHOLDS = (0.3, 0.5, 0.7)


def scored_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """(vec_id, y, p): every embedding row scored by the 2-step-trained
    weights — the frame the operating-point audit sweeps and the
    curation pipeline's quality gate filters on (vec_id is the join key
    back to ``documents.doc_id``)."""
    emb = _emb_labeled(spark, sf)
    p2 = _p_expr(_learned_w2(emb, emb.count()))
    return emb.selectExpr("vec_id", "y", f"{p2} AS p")


def confusion_sweep(scored: DataFrame) -> DataFrame:
    """Threshold sweep over a scored frame with (y, p) columns: per
    threshold (tp, fp, fneg, tn, precision, recall, f1). Zero-
    denominator guards use greatest(·, 1) identically in both
    engines."""
    thr_fanout = (
        "explode(array("
        + ", ".join(f"CAST({t} AS DOUBLE)" for t in EVAL_THRESHOLDS)
        + ")) AS thr"
    )
    return (
        scored.selectExpr("y", "p", thr_fanout)
        .groupBy("thr")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN p > thr AND y = 1 THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("tp"),
            F.expr(
                "CAST(sum(CASE WHEN p > thr AND y = 0 THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("fp"),
            F.expr(
                "CAST(sum(CASE WHEN p <= thr AND y = 1 THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("fneg"),
            F.expr(
                "CAST(sum(CASE WHEN p <= thr AND y = 0 THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("tn"),
        )
        .selectExpr(
            "thr",
            "tp",
            "fp",
            "fneg",
            "tn",
            # exact-integer ratios -> HALF_UP recipe (ext/exact.py)
            _rr_s("tp", "greatest(tp + fp, 1L)", 4) + " AS precision",
            _rr_s("tp", "greatest(tp + fneg, 1L)", 4) + " AS recall",
            _rr_s("2 * tp", "greatest(2 * tp + fp + fneg, 1L)", 4)
            + " AS f1",
        )
        .orderBy("thr")
    )


def train_quality_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Per threshold: (tp, fp, fneg, tn, precision, recall, f1) for the
    binary target ``label < 5`` under the 2-step weights — the
    operating-point worksheet a deployed quality gate is chosen from."""
    return confusion_sweep(scored_embeddings(spark, sf))


TRAIN_QUALITY_EVAL_SQL = f"""
WITH {_LR_P2_SQL},
t AS (SELECT unnest([{', '.join(f'{t}::DOUBLE' for t in EVAL_THRESHOLDS)}])
        AS thr),
c AS (SELECT t.thr AS thr,
             CAST(sum(CASE WHEN p.p > t.thr AND p.y = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN p.p > t.thr AND p.y = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN p.p <= t.thr AND p.y = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS fneg,
             CAST(sum(CASE WHEN p.p <= t.thr AND p.y = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM p2 p, t GROUP BY t.thr)
SELECT thr, tp, fp, fneg, tn,
       {_rr_d("tp", "greatest(tp + fp, 1)", 4)} AS precision,
       {_rr_d("tp", "greatest(tp + fneg, 1)", 4)} AS recall,
       {_rr_d("2 * tp", "greatest(2 * tp + fp + fneg, 1)", 4)}
         AS f1
FROM c ORDER BY thr"""

register("ext_train_quality_eval", train_quality_eval, TRAIN_QUALITY_EVAL_SQL)


def train_lr(
    emb: DataFrame, steps: int, eta: float = LR_ETA
) -> tuple[list[float], list[dict]]:
    """Production LR training for an ARBITRARY step count — the library
    entry point behind the 2-step oracled query (the learn_bpe
    pattern: the unrolled version exists so DuckDB can replay it; real
    training runs as many steps as the curve needs).

    ``emb``: (e ARRAY<DOUBLE>, y INT). Each step = one aggregate over
    the corpus (64 per-dim gradient sums, map-side combined) + one
    driver round-trip for the 512-byte weight vector — the per-
    iteration cost every distributed GD pays, independent of corpus
    size. Returns (final weights, per-step metrics dicts)."""
    n_row = emb.count()
    dim = len(emb.select("e").first().e)
    w = [0.0] * dim
    history: list[dict] = []
    for step in range(1, steps + 1):
        if w == [0.0] * dim:
            p_expr = "CAST(0.5 AS DOUBLE)"
        else:
            lit = f"array({', '.join(repr(x) for x in w)})"
            p_expr = (
                "least(0.999999d, greatest(0.000001d, "
                "round(1.0d / (1.0d + exp(-round("
                + _DOT.format(a="e", b=lit)
                + ", 6))), 6)))"
            )
        rows = (
            emb.selectExpr("e", "y", f"{p_expr} AS p")
            .selectExpr("posexplode(e) AS (pos, x)", "p", "y")
            .groupBy("pos")
            .agg(
                (F.round(F.sum(F.expr("x * (p - y)")), 6) / n_row).alias("g"),
                F.expr(
                    "round(avg(-(y * ln(p) + (1 - y) * ln(1 - p))), 4)"
                ).alias("ll"),
                F.expr(
                    "round(avg(CAST((CASE WHEN p > 0.5 THEN 1 ELSE 0 END)"
                    " = y AS DOUBLE)), 4)"
                ).alias("acc"),
            )
            .collect()
        )
        by_pos = {int(r.pos): float(r.g) for r in rows}
        history.append(
            {"step": step, "log_loss": rows[0].ll, "accuracy": rows[0].acc}
        )
        w = [w[i] - eta * by_pos[i] for i in range(dim)]
    return w, history
