"""[EXT] similarity search over ``embeddings`` (X2 / north_star).

* ``sim_topk_cosine`` — brute-force cosine top-k: the exact baseline.
  The query set is broadcast; each partition of the corpus computes dot
  products JVM-side (zip_with/aggregate — no Python), then a per-query
  window keeps k. Cost is O(|queries| × |corpus|) — fine for a handful
  of probes even at 100 TB because the corpus scan parallelizes and
  nothing but (query, k) rows shuffle.
* ``sim_ann_lsh`` — the approximate scale path: random-hyperplane LSH
  (sign sketches) bucket the corpus; candidates share a bucket in ≥1 of
  L tables; exact cosine re-ranks candidates. Recall < 1 vs brute force
  by design, but the pipeline itself is deterministic (fixed LCG
  hyperplanes) and fully mirrored in the DuckDB oracle → exact check.
* ``dedup_embedding_cosine`` — near-duplicate pairs by cosine ≥ τ over
  the full corpus (the embedding-space dedup); exact oracle at test SF,
  LSH-bucketed at scale.

Float32 arrays are cast to double *before* any arithmetic in both engines
(same IEEE ops in the same order → rounded results match exactly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dariadb_spark.ext.hashes import _h60_duck, _h60_spark
from dariadb_spark.model import load_table
from dariadb_spark.registry import register

QUERY_VEC_IDS = [0, 1, 2, 3, 4]
TOP_K = 10
# Synthetic embeddings are near-orthogonal (max pairwise cos ≈ 0.51 at
# sf0.01), so the near-dup threshold is set where pairs actually exist.
NEAR_DUP_COS = 0.4

#: expressions shared by brute/LSH paths (arrays pre-cast to double)
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    """(vec_id, e DOUBLE[], norm) with norm precomputed once."""
    return (
        load_table(spark, sf, "embeddings")
        .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
        .selectExpr("vec_id", "e", f"sqrt({_DOT.format(a='e', b='e')}) AS norm")
    )


def sim_topk_cosine(spark: SparkSession, sf: str) -> DataFrame:
    emb = _emb(spark, sf)
    q = emb.where(F.col("vec_id").isin(QUERY_VEC_IDS)).selectExpr(
        "vec_id AS q_id", "e AS qe", "norm AS qnorm"
    )
    dot = _DOT.format(a="qe", b="e")
    pairs = (
        F.broadcast(q)
        .crossJoin(emb)
        .where(F.col("vec_id") != F.col("q_id"))
        .selectExpr(
            "q_id", "vec_id", f"round({dot} / (qnorm * norm), 4) AS cos_sim"
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("q_id", "vec_id", "cos_sim", "rk")
        .orderBy("q_id", "rk")
    )


SIM_TOPK_COSINE_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS norm FROM emb),
q AS (SELECT vec_id AS q_id, e AS qe, norm AS qnorm FROM n
      WHERE vec_id IN ({", ".join(map(str, QUERY_VEC_IDS))})),
pairs AS (
  SELECT q_id, vec_id,
         round(list_dot_product(qe, e) / (qnorm * norm), 4) AS cos_sim
  FROM q, n WHERE vec_id != q_id),
ranked AS (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rk
  FROM pairs)
SELECT q_id, vec_id, cos_sim, rk FROM ranked WHERE rk <= {TOP_K}
ORDER BY q_id, rk"""


# --- embedding-space decontamination --------------------------------------
# STAGED for the round-11 driver window (round-10's is full; the
# staging every late operator goes through). The decontamination
# family's semantic member: ext_decontaminate / _fuzzy / _bloom catch
# LEXICAL train↔eval overlap (shared n-grams survive light edits);
# paraphrased or re-rendered eval leakage shares almost no n-grams but
# sits next to the eval item in embedding space — the gap SemDeDup
# exploits for dedup, pointed here at the train/eval boundary. Same
# holdout convention as the lexical decons (every HOLDOUT_MOD-th id is
# the eval slice), same cosine machinery as the near-dup ops.
#
# Scale shape: the eval side is a benchmark suite — thousands of rows
# at any corpus size — so it BROADCASTS and the train side streams
# through one scan (BroadcastNestedLoopJoin, eval-bounded work per
# row, the ext_decontaminate shape with vectors for shingles); the
# per-train aggregate is map-side combined. At 100 TB the committed
# cheaper path is the same blocking the ANN family already measures:
# assign both sides to IVF/k-means cells and compare within cells
# (sem_dedup_blocked), shrinking eval-side work per row to its cell.

#: embedding eval holdout: every 50th vec_id (matches the lexical
#: decontamination ops' document holdout convention).
EMB_HOLDOUT_MOD = 50
#: semantic-contamination bar — below the near-dup bar (0.4): eval
#: leakage worth FLAGGING is broader than a strict near-duplicate
#: (fixture cosines top out ≈ 0.5, so hits exist at every SF).
EMB_DECON_COS = 0.33


def decontaminate_embed(spark: SparkSession, sf: str) -> DataFrame:
    """Per train vector: how many eval-slice vectors sit within
    EMB_DECON_COS cosine, the strongest such cosine, the nearest eval
    id, and the contaminated flag. Rows cover the WHOLE train slice
    (zero-hit vectors carry 0/0.0/NULL) so the result is the audit
    table a pipeline left-joins its corpus against."""
    emb = _emb(spark, sf)
    ev = emb.where(F.col("vec_id") % EMB_HOLDOUT_MOD == 0).selectExpr(
        "vec_id AS eval_id", "e AS ee", "norm AS enorm"
    )
    train = emb.where(F.col("vec_id") % EMB_HOLDOUT_MOD != 0)
    dot = _DOT.format(a="e", b="ee")
    hits = (
        train.crossJoin(F.broadcast(ev))
        .selectExpr(
            "vec_id", "eval_id", f"round({dot} / (norm * enorm), 4) AS cos_te"
        )
        .where(f"cos_te >= {EMB_DECON_COS}")
        # strongest cosine wins, lowest eval_id breaks ties. A
        # row_number window over (cos_te DESC, eval_id) instead of a
        # packed-bigint max_by key (r10 ADVICE: the packed key was only
        # injective below 1e6 eval ids). The window shuffles only the
        # HIT pairs — already threshold-filtered, a sliver of the pair
        # space — on the same vec_id key the old groupBy used.
        .withColumn(
            "n_eval_hits",
            F.count("*")
            .over(Window.partitionBy("vec_id"))
            .cast("long"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("cos_te").desc(), F.col("eval_id")
                )
            ),
        )
        .where("rn = 1")
        .selectExpr(
            "vec_id", "n_eval_hits", "cos_te AS max_cos",
            "eval_id AS nearest_eval",
        )
    )
    return (
        train.select("vec_id")
        .join(hits, "vec_id", "left")
        .selectExpr(
            "vec_id",
            "CAST(coalesce(n_eval_hits, 0) AS BIGINT) AS n_eval_hits",
            "coalesce(max_cos, 0.0d) AS max_cos",
            "nearest_eval",
            "CAST(n_eval_hits IS NOT NULL AS INT) AS contaminated",
        )
        .orderBy("vec_id")
    )


DECONTAMINATE_EMBED_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS norm FROM emb),
ev AS (SELECT vec_id AS eval_id, e AS ee, norm AS enorm FROM n
       WHERE vec_id % {EMB_HOLDOUT_MOD} = 0),
train AS (SELECT * FROM n WHERE vec_id % {EMB_HOLDOUT_MOD} != 0),
pairs AS (
  SELECT t.vec_id, ev.eval_id,
         round(list_dot_product(t.e, ev.ee) / (t.norm * ev.enorm), 4)
           AS cos_te
  FROM train t, ev
  WHERE round(list_dot_product(t.e, ev.ee) / (t.norm * ev.enorm), 4)
          >= {EMB_DECON_COS}),
hits AS (
  SELECT vec_id,
         CAST(count(*) OVER (PARTITION BY vec_id) AS BIGINT)
           AS n_eval_hits,
         cos_te AS max_cos, eval_id AS nearest_eval
  FROM pairs
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY cos_te DESC, eval_id) = 1)
SELECT t.vec_id,
       COALESCE(h.n_eval_hits, 0) AS n_eval_hits,
       COALESCE(h.max_cos, 0.0) AS max_cos,
       h.nearest_eval,
       CAST(h.n_eval_hits IS NOT NULL AS INT) AS contaminated
FROM train t LEFT JOIN hits h ON t.vec_id = h.vec_id
ORDER BY t.vec_id"""


# --- k-NN label classification --------------------------------------------

KNN_K = 10


def knn_classify(spark: SparkSession, sf: str) -> DataFrame:
    """k-NN classification: each query vector takes the majority label
    of its KNN_K cosine-nearest neighbors (tie → smaller label — fully
    deterministic). Composes the broadcast-query × linear-scan top-k
    plan with a tiny per-query vote aggregate; the labeled corpus never
    shuffles more than the top-k path already does. At 100 TB the
    neighbor stage swaps for the IVF/LSH bucketed variants unchanged —
    the vote is downstream of whichever candidate generator runs."""
    emb = _emb(spark, sf)
    labels = load_table(spark, sf, "embeddings").select("vec_id", "label")
    q = emb.where(F.col("vec_id").isin(QUERY_VEC_IDS)).selectExpr(
        "vec_id AS q_id", "e AS qe", "norm AS qnorm"
    )
    dot = _DOT.format(a="qe", b="e")
    pairs = (
        F.broadcast(q)
        .crossJoin(emb)
        .where(F.col("vec_id") != F.col("q_id"))
        .selectExpr(
            "q_id", "vec_id", f"round({dot} / (qnorm * norm), 4) AS cos_sim"
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    nbrs = (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= KNN_K)
        .join(F.broadcast(labels), "vec_id")
    )
    votes = nbrs.groupBy("q_id", "label").agg(
        F.count("*").alias("votes"),
        F.round(F.max("cos_sim"), 4).alias("best_sim"),
    )
    pick = Window.partitionBy("q_id").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "q_id",
            F.col("label").cast("long").alias("pred_label"),
            "votes",
            "best_sim",
        )
        .orderBy("q_id")
    )


KNN_CLASSIFY_SQL = f"""
WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
n AS (SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS norm FROM emb),
q AS (SELECT vec_id AS q_id, e AS qe, norm AS qnorm FROM n
      WHERE vec_id IN ({", ".join(map(str, QUERY_VEC_IDS))})),
pairs AS (
  SELECT q_id, vec_id, label,
         round(list_dot_product(qe, e) / (qnorm * norm), 4) AS cos_sim
  FROM q, n WHERE vec_id != q_id),
nbrs AS (
  SELECT q_id, vec_id, label, cos_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rk
  FROM pairs),
votes AS (
  SELECT q_id, label, count(*) AS votes,
         round(max(cos_sim), 4) AS best_sim
  FROM nbrs WHERE rk <= {KNN_K} GROUP BY q_id, label),
picked AS (
  SELECT q_id, label, votes, best_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY votes DESC, label ASC) AS rn
  FROM votes)
SELECT q_id, CAST(label AS BIGINT) AS pred_label, votes, best_sim
FROM picked WHERE rn = 1 ORDER BY q_id"""


# --- embedding-space near-dup pairs --------------------------------------

def dedup_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """All pairs with cosine ≥ τ — blocked matrix products.

    The corpus matrix is broadcast into an Arrow-batched ``mapInPandas``;
    each task multiplies its batch block against the full corpus with one
    BLAS call (float64) and emits only the surviving (a < b, cos ≥ τ)
    pairs — the shuffle carries results, never the O(n²) pair space.
    At 100 TB the broadcast side becomes the LSH-bucketed candidate set
    (``sim_ann_lsh``); the per-block verification is identical.
    """
    from collections.abc import Iterator

    emb = _emb(spark, sf)
    # One collect of (ids, matrix): the broadcast "dimension" side. ~1 MB
    # per 2k×64 vectors; at larger corpora this is the bucketed subset.
    corpus = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in corpus], dtype=np.int64)
    mat = np.array([r["e"] for r in corpus], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            block_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            v = np.stack(pdf["e"].to_numpy()).astype(np.float64)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            sims = v @ mat.T  # (block, corpus)
            # Slightly under-filter: the authoritative threshold is applied
            # to the *rounded* value JVM-side, matching the oracle exactly.
            keep = (sims >= NEAR_DUP_COS - 1e-4) & (
                block_ids[:, None] < ids[None, :]
            )
            bi, ci = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "vec_a": block_ids[bi],
                    "vec_b": ids[ci],
                    "cos_raw": sims[bi, ci],
                }
            )

    return (
        emb.select("vec_id", "e")
        .mapInPandas(block, "vec_a bigint, vec_b bigint, cos_raw double")
        .select(
            "vec_a", "vec_b", F.round(F.col("cos_raw"), 4).alias("cos_sim")
        )
        .where(F.col("cos_sim") >= NEAR_DUP_COS)
        .orderBy("vec_a", "vec_b")
    )


DEDUP_EMBEDDING_COSINE_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS norm FROM emb)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.e, b.e) / (a.norm * b.norm), 4) AS cos_sim
FROM n a, n b
WHERE a.vec_id < b.vec_id
  AND round(list_dot_product(a.e, b.e) / (a.norm * b.norm), 4) >= {NEAR_DUP_COS}
ORDER BY vec_a, vec_b"""


# --- LSH-bucketed ANN (exact oracle via inlined hyperplanes) --------------

N_PLANES = 16  # one 16-bit sketch per table
N_TABLES = 4


def _hyperplanes(dim: int = 64) -> list[list[list[float]]]:
    """Deterministic pseudo-random hyperplanes (fixed LCG — no RNG state,
    reproducible across runs/engines).

    Round-7 fix, found by the at-scale ANN stress (bench_stress): the
    original scaling ``(state >> 33) / 2^31 - 1`` spans ``[-1, 0)`` —
    every component NEGATIVE, so all planes pointed into one orthant
    (mean pairwise |cos| ≈ 0.7) and the 16-bit sketch collapsed to a
    few effective bits: per-table bucket-collision probability ~5.5e-2
    instead of the ~1.5e-5 a uniform 2^16 sketch gives — a ~4000×
    candidate blowup at corpus scale, invisible at fixture size and to
    the oracle (which shares the planes). ``(state >> 32) / 2^31 - 1``
    spans ``[-1, 1)``; measured post-fix collision ~1.5e-5 (uniform)
    and mean plane |cos| ~0.09 (random-direction baseline)."""
    planes: list[list[list[float]]] = []
    state = 0x2545F4914F6CDD1D
    for _ in range(N_TABLES):
        table = []
        for _ in range(N_PLANES):
            row = []
            for _ in range(dim):
                state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
                row.append(((state >> 32) / float(1 << 31)) - 1.0)  # ~U(-1,1)
            table.append(row)
        planes.append(table)
    return planes


def sim_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """ANN top-k: per table, bucket = sign-bit sketch of 16 hyperplane
    dots; query joins its bucket per table; exact cosine re-ranks the
    union of candidates. Scale shape: corpus sketched once (linear scan),
    bucket join replaces the cross join — candidates per query ≈
    corpus / 2^16 × tables.

    The hyperplanes are fixed LCG output, so the DuckDB oracle inlines
    them as literals and mirrors the ENTIRE pipeline — sketching,
    bucketing, candidate join, re-rank — making the check an exact hash
    match with no recall caveat. (Only caveat: numpy's blocked matmul vs
    DuckDB's sequential dot could disagree on the sign of a dot product
    within ~1e-16 of zero — probability ~1e-8 on this fixture.)

    ADAPTIVE SKETCH WIDTH (round 7): the bucket key is the LOW
    ``K = clamp(ceil(log2(n)) − 4, 4, 16)`` bits of the 16-plane
    sketch, with ``n`` the corpus count — expected bucket occupancy
    ~2⁴ per table at ANY scale, so candidates per query stay ~constant
    (≈ 16 × tables) from the 500-vector fixture to a 500k corpus and
    beyond. With the round-7 orthant fix making buckets genuinely
    uniform, a fixed 16-bit key would over-partition small corpora
    (500 vectors / 65536 buckets → zero candidates) exactly as it
    under-partitioned huge ones pre-fix. Same count-driven adaptivity
    as the dedup family; the oracle computes K from the same count."""
    import math

    from pyspark.sql.functions import pandas_udf

    emb = _emb(spark, sf)
    mats = [np.array(t) for t in _hyperplanes()]  # N_TABLES × (16, 64)
    weights = 1 << np.arange(N_PLANES, dtype=np.int64)
    n_corpus = emb.count()
    k_bits = max(4, min(N_PLANES, math.ceil(math.log2(max(n_corpus, 2))) - 4))
    mask = (1 << k_bits) - 1

    @pandas_udf("array<bigint>")
    def sketch(vectors: pd.Series) -> pd.Series:
        """Arrow-batched sign sketches: one (batch × dim) @ (dim × planes)
        matmul per table — the whole batch sketched in a few BLAS calls."""
        mat = np.stack(vectors.to_numpy())
        per_table = [
            ((mat @ m.T) > 0).astype(np.int64) @ weights for m in mats
        ]
        return pd.Series(np.stack(per_table, axis=1).tolist())

    sketches = emb.select(
        "vec_id", "e", "norm", sketch(F.col("e")).alias("sk")
    ).select(
        "vec_id",
        "e",
        "norm",
        F.posexplode("sk").alias("tbl", "bucket"),
    ).withColumn("bucket", F.col("bucket").bitwiseAND(F.lit(mask)))
    q = sketches.where(F.col("vec_id").isin(QUERY_VEC_IDS)).selectExpr(
        "vec_id AS q_id", "e AS qe", "norm AS qnorm", "tbl", "bucket"
    )
    cand = (
        F.broadcast(q)
        .join(sketches, ["tbl", "bucket"])
        .where(F.col("vec_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "vec_id"])
    )
    dot = _DOT.format(a="qe", b="e")
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        cand.selectExpr(
            "q_id", "vec_id", f"round({dot} / (qnorm * norm), 4) AS cos_sim"
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("q_id", "vec_id", "cos_sim", "rk")
        .orderBy("q_id", "rk")
    )


def _planes_values_sql() -> str:
    """The LCG hyperplanes as SQL literals (repr = shortest round-trip
    decimal → DuckDB parses back the identical float64)."""
    return ",\n".join(
        f"({t}, {p}, [{', '.join(repr(x) for x in row)}])"
        for t, table in enumerate(_hyperplanes())
        for p, row in enumerate(table)
    )


SIM_ANN_LSH_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS norm FROM emb),
planes(tbl, p, w) AS (VALUES
{_planes_values_sql()}),
kb AS (SELECT CAST(pow(2, GREATEST(4, LEAST({N_PLANES},
              CAST(ceil(log2(count(*))) AS INT) - 4))) AS BIGINT) AS m
       FROM emb),
sk0 AS (
  SELECT n.vec_id, p.tbl,
         CAST(sum(CASE WHEN list_dot_product(n.e, p.w) > 0
                       THEN (CAST(1 AS BIGINT) << p.p)
                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
  FROM n CROSS JOIN planes p
  GROUP BY n.vec_id, p.tbl),
sk AS (SELECT vec_id, tbl, bucket % (SELECT m FROM kb) AS bucket FROM sk0),
q AS (SELECT vec_id AS q_id, tbl, bucket FROM sk
      WHERE vec_id IN ({", ".join(map(str, QUERY_VEC_IDS))})),
cand AS (SELECT DISTINCT q.q_id, s.vec_id
         FROM q JOIN sk s ON q.tbl = s.tbl AND q.bucket = s.bucket
         WHERE s.vec_id != q.q_id),
scored AS (
  SELECT c.q_id, c.vec_id,
         round(list_dot_product(nq.e, nv.e) / (nq.norm * nv.norm), 4)
           AS cos_sim
  FROM cand c
  JOIN n nq ON c.q_id = nq.vec_id
  JOIN n nv ON c.vec_id = nv.vec_id),
ranked AS (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rk
  FROM scored)
SELECT q_id, vec_id, cos_sim, rk FROM ranked WHERE rk <= {TOP_K}
ORDER BY q_id, rk"""


# --- IVF-bucketed ANN (deterministic → exact oracle) ----------------------

K_CELLS = 16  # inverted-file cells
N_PROBE = 4  # cells probed per query


def sim_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN top-k: the corpus is partitioned into K cells by nearest
    centroid; a query probes its N_PROBE nearest cells and re-ranks with
    exact cosine — the classic inverted-file index (cost drops from
    O(|corpus|) to ~N_PROBE/K of it per query).

    Centroids here are the first K corpus vectors (deterministic seed —
    production would run MLlib KMeans; the plan shape is identical).
    Assignment scores are rounded to 4 decimals with centroid-id
    tie-break, so cell assignment is bit-deterministic and the whole
    operator has an exact DuckDB oracle — unlike the LSH path.

    Scale shape: centroids broadcast (K×dim is KBs at any corpus size);
    assignment is one linear scan; the candidate join shuffles on cell id
    with per-cell candidate lists ~|corpus|/K. K is a DEPLOYMENT KNOB
    that must grow with the corpus: the standard sizing is K ≈ √n (per
    FAISS practice), making per-query probe cost N_PROBE·n/K ≈
    N_PROBE·√n — sublinear — while centroids stay broadcastable
    (√(10⁹)·64 doubles ≈ 16 MB). The fixture pins K = 16 so the cell
    structure (multiple occupied cells, probes crossing cell
    boundaries) is actually exercised at 500 vectors; the measured
    at-scale ANN path is the LSH variant (bench_stress, 500k vectors).
    """
    emb = _emb(spark, sf)
    cent = emb.where(F.col("vec_id") < K_CELLS).selectExpr(
        "vec_id AS cid", "e AS ce", "norm AS cnorm"
    )
    dotc = _DOT.format(a="e", b="ce")
    scored = emb.crossJoin(F.broadcast(cent)).selectExpr(
        "vec_id",
        "e",
        "norm",
        "cid",
        f"round({dotc} / (norm * cnorm), 4) AS ccos",
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cid").asc()
    )
    ranked_cells = scored.withColumn("rn", F.row_number().over(w))
    assigned = ranked_cells.where(F.col("rn") == 1).select(
        "vec_id", "e", "norm", "cid"
    )
    probes = (
        ranked_cells.where(
            F.col("vec_id").isin(QUERY_VEC_IDS) & (F.col("rn") <= N_PROBE)
        )
        .selectExpr("vec_id AS q_id", "e AS qe", "norm AS qnorm", "cid")
    )
    dot = _DOT.format(a="qe", b="e")
    wq = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        F.broadcast(probes)
        .join(assigned, "cid")
        .where(F.col("vec_id") != F.col("q_id"))
        .selectExpr(
            "q_id", "vec_id", f"round({dot} / (qnorm * norm), 4) AS cos_sim"
        )
        .withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= TOP_K)
        .select("q_id", "vec_id", "cos_sim", "rk")
        .orderBy("q_id", "rk")
    )


SIM_ANN_IVF_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS norm FROM emb),
cent AS (SELECT vec_id AS cid, e AS ce, norm AS cnorm FROM n
         WHERE vec_id < {K_CELLS}),
scored AS (
  SELECT n.vec_id, n.e, n.norm, c.cid,
         round(list_dot_product(n.e, c.ce) / (n.norm * c.cnorm), 4) AS ccos
  FROM n, cent c),
ranked_cells AS (
  SELECT vec_id, e, norm, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY ccos DESC, cid ASC) AS rn
  FROM scored),
assigned AS (SELECT vec_id, e, norm, cid FROM ranked_cells WHERE rn = 1),
probes AS (
  SELECT vec_id AS q_id, e AS qe, norm AS qnorm, cid
  FROM ranked_cells
  WHERE vec_id IN ({", ".join(map(str, QUERY_VEC_IDS))}) AND rn <= {N_PROBE}),
cand AS (
  SELECT p.q_id, a.vec_id,
         round(list_dot_product(p.qe, a.e) / (p.qnorm * a.norm), 4) AS cos_sim
  FROM probes p JOIN assigned a USING (cid)
  WHERE a.vec_id != p.q_id),
ranked AS (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rk
  FROM cand)
SELECT q_id, vec_id, cos_sim, rk FROM ranked WHERE rk <= {TOP_K}
ORDER BY q_id, rk"""


# --- ANN recall evaluation (IVF vs exact ground truth) --------------------

def ann_recall_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k of the IVF index against the exact brute-force top-k —
    the metric every ANN deployment reports before trading scan cost
    for probes. Composes the two existing plans and joins their result
    sets (query-count-sized — trivially broadcast); at 100 TB this runs
    over a sampled query set while the index serves the rest, same
    shape."""
    exact = sim_topk_cosine(spark, sf).select("q_id", "vec_id")
    ivf = sim_ann_ivf(spark, sf).select("q_id", "vec_id")
    hits = (
        exact.join(ivf, ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        exact.groupBy("q_id")
        .agg(F.count("*").alias("k"))
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            "k",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.col("k"), 4
            ).alias("recall_at_k"),
        )
        .orderBy("q_id")
    )


_QIDS = ", ".join(map(str, QUERY_VEC_IDS))
ANN_RECALL_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS norm FROM emb),
x_q AS (SELECT vec_id AS q_id, e AS qe, norm AS qnorm FROM n
        WHERE vec_id IN ({_QIDS})),
x_pairs AS (
  SELECT q_id, vec_id,
         round(list_dot_product(qe, e) / (qnorm * norm), 4) AS cos_sim
  FROM x_q, n WHERE vec_id != q_id),
x_ranked AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rk
  FROM x_pairs),
x_top AS (SELECT q_id, vec_id FROM x_ranked WHERE rk <= {TOP_K}),
i_cent AS (SELECT vec_id AS cid, e AS ce, norm AS cnorm FROM n
           WHERE vec_id < {K_CELLS}),
i_scored AS (
  SELECT n.vec_id, n.e, n.norm, c.cid,
         round(list_dot_product(n.e, c.ce) / (n.norm * c.cnorm), 4) AS ccos
  FROM n, i_cent c),
i_ranked_cells AS (
  SELECT vec_id, e, norm, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY ccos DESC, cid ASC) AS rn
  FROM i_scored),
i_assigned AS (SELECT vec_id, e, norm, cid FROM i_ranked_cells WHERE rn = 1),
i_probes AS (
  SELECT vec_id AS q_id, e AS qe, norm AS qnorm, cid
  FROM i_ranked_cells
  WHERE vec_id IN ({_QIDS}) AND rn <= {N_PROBE}),
i_cand AS (
  SELECT p.q_id, a.vec_id,
         round(list_dot_product(p.qe, a.e) / (p.qnorm * a.norm), 4) AS cos_sim
  FROM i_probes p JOIN i_assigned a USING (cid)
  WHERE a.vec_id != p.q_id),
i_ranked AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rk
  FROM i_cand),
i_top AS (SELECT q_id, vec_id FROM i_ranked WHERE rk <= {TOP_K}),
hits AS (
  SELECT x.q_id, count(*) AS n_hits
  FROM x_top x JOIN i_top i ON x.q_id = i.q_id AND x.vec_id = i.vec_id
  GROUP BY x.q_id),
ks AS (SELECT q_id, count(*) AS k FROM x_top GROUP BY q_id)
SELECT ks.q_id AS q_id, ks.k AS k,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(COALESCE(h.n_hits, 0) / ks.k, 4) AS recall_at_k
FROM ks LEFT JOIN hits h ON ks.q_id = h.q_id
ORDER BY q_id"""


# Driver row merged round 16 into ext_ann_recall_report (merge #5, the
# set_ops/hll_report shape) — the function and its pytest coverage stay;
# see ann_recall_report below for the audit note.


# --- per-label centroids (k-means M-step / IVF coarse training) -----------

def embedding_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label mean vector in long (label, dim, centroid) form — the
    k-means M-step a distributed IVF/clustering trainer runs each round.
    posexplode keeps everything JVM-side; the shuffle key (label, dim)
    has |labels|·64 groups with map-side partial sums, so shuffle bytes
    are O(groups), independent of corpus size. Long form beats re-packing
    into arrays here: the consumer (next E-step) broadcasts it anyway."""
    emb = load_table(spark, sf, "embeddings").selectExpr(
        "label", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
    )
    d = emb.select("label", F.posexplode("e").alias("dim", "x"))
    return (
        d.groupBy("label", F.col("dim").cast("bigint").alias("dim"))
        .agg(
            F.count("*").alias("n"),
            (F.round(F.sum("x"), 6) / F.count("*")).alias("centroid"),
        )
        .orderBy("label", "dim")
    )


# fixture embeddings are 64-dim at every scale factor (DuckDB's
# generate_series cannot reference the row's len(vec) laterally)
EMBEDDING_CENTROIDS_SQL = """
WITH ed AS (SELECT label, embedding::DOUBLE[] AS vec FROM embeddings),
x AS (SELECT label, CAST(i - 1 AS BIGINT) AS dim, vec[i] AS x
      FROM ed CROSS JOIN generate_series(1, 64) gs(i))
SELECT label, dim, count(*) AS n,
       round(sum(x), 6) / count(*) AS centroid
FROM x GROUP BY label, dim ORDER BY label, dim"""


# --- Lloyd's k-means (iterative, with an UNROLLED exact oracle) ------------

KMEANS_K = 8
_KM_DIM = 64  # fixture embedding dim (see EMBEDDING_CENTROIDS_SQL note)


def sim_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    """Two Lloyd rounds of cosine k-means over the corpus: assign to the
    nearest of K centroids (init = first K vectors), recompute centroids
    as per-cluster dimension means, re-assign. Output = the final
    (vec_id, cid, score) assignment.

    Scale shape — the MLlib pattern: centroids live DRIVER-side between
    iterations (K×dim doubles — KBs at any corpus size) and are inlined
    into the assignment expression as literals, so each E-step is a
    ZERO-shuffle projection (argmax over K codegen'd dot products via
    ``array_max`` on (score, −cid) structs); each M-step is one tiny
    (cid, dim)-key aggregate. Per-iteration cost = 1 corpus scan + 1
    vocabulary-sized shuffle, independent of K-means round count.

    Exactness: assignment scores are round(·,4) with cid tie-break and
    dimension means use the round(sum,6)/count recipe, so BOTH Lloyd
    rounds unroll into deterministic SQL — the oracle replays the whole
    iteration, which is the usual "iterative algorithms are rows-only"
    escape hatch closed. Python-side centroid math (sequential
    sum-of-squares + sqrt) is bit-identical to the engines' sequential
    list folds; repr() round-trips every float into the next stage.
    """
    emb = _emb(spark, sf).select("vec_id", "e", "norm")
    init = emb.where(F.col("vec_id") < KMEANS_K).orderBy("vec_id").collect()
    cent = [(int(r["vec_id"]), [float(x) for x in r["e"]]) for r in init]

    def _cnorm(ce: list[float]) -> float:
        s = 0.0
        for x in ce:  # sequential left-to-right == the engines' folds
            s += x * x
        return s ** 0.5

    def _assign(frame: DataFrame, centroids) -> DataFrame:
        structs = ", ".join(
            "struct(round({dot} / (norm * {cn}), 4) AS s, {nc} AS nc, {cid} AS cid)".format(
                dot=_DOT.format(
                    a="e", b=f"array({', '.join(repr(x) for x in ce)})"
                ),
                cn=repr(_cnorm(ce)),
                nc=-cid,
                cid=cid,
            )
            for cid, ce in centroids
        )
        return frame.selectExpr(
            "vec_id",
            "e",
            f"array_max(array({structs})) AS best",
        ).select(
            "vec_id",
            "e",
            F.col("best.cid").alias("cid"),
            F.col("best.s").alias("score"),
        )

    a1 = _assign(emb, cent)
    means = (
        a1.select("cid", F.posexplode("e").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg((F.round(F.sum("x"), 6) / F.count("*")).alias("cx"))
        .collect()
    )
    by_cid: dict[int, dict[int, float]] = {}
    for r in means:
        by_cid.setdefault(int(r["cid"]), {})[int(r["pos"])] = float(r["cx"])
    cent1 = [
        (cid, [dims[p] for p in sorted(dims)])
        for cid, dims in sorted(by_cid.items())
    ]
    return _assign(emb, cent1).select("vec_id", "cid", "score").orderBy("vec_id")


#: the 2-round Lloyd chain through the final assignment (`a2`) — shared
#: CTE prefix of SIM_KMEANS_SQL and SEM_DEDUP_SQL (the PQ `_PQ_EST_SQL`
#: pattern).
_KM_A2_SQL = f"""emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS norm FROM emb),
c0 AS (SELECT vec_id AS cid, e AS ce, norm AS cnorm FROM n
       WHERE vec_id < {KMEANS_K}),
a1 AS (SELECT vec_id, e, cid FROM (
  SELECT n.vec_id, n.e, c.cid,
         row_number() OVER (PARTITION BY n.vec_id ORDER BY
           round(list_dot_product(n.e, c.ce) / (n.norm * c.cnorm), 4) DESC,
           c.cid ASC) AS rn
  FROM n, c0 c) WHERE rn = 1),
u1 AS (SELECT cid, gs.i AS pos, round(sum(e[gs.i]), 6) / count(*) AS cx
       FROM a1 CROSS JOIN generate_series(1, {_KM_DIM}) gs(i)
       GROUP BY cid, gs.i),
c1 AS (SELECT cid, list(cx ORDER BY pos) AS ce FROM u1 GROUP BY cid),
c1n AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cnorm FROM c1),
a2 AS (SELECT vec_id, cid, s AS score FROM (
  SELECT n.vec_id, c.cid,
         round(list_dot_product(n.e, c.ce) / (n.norm * c.cnorm), 4) AS s,
         row_number() OVER (PARTITION BY n.vec_id ORDER BY
           round(list_dot_product(n.e, c.ce) / (n.norm * c.cnorm), 4) DESC,
           c.cid ASC) AS rn
  FROM n, c1n c) WHERE rn = 1)"""

SIM_KMEANS_SQL = f"""
WITH {_KM_A2_SQL}
SELECT vec_id, cid, score FROM a2 ORDER BY vec_id"""


# --- semantic dedup (cluster-local near-dup pruning) ----------------------
# Registered round 10 (staged through round 9 while that window was
# full). SemDeDup (Abbas et al., "SemDeDup:
# Data-efficient learning at web-scale through semantic deduplication",
# arXiv:2303.09540): k-means the embedding space, then pairwise-compare
# ONLY within each cluster and prune all but the lowest-id member of
# every near-dup relation — semantic duplicates that exact/lexical
# dedup can't see (paraphrases, re-renders). The cluster blocking is
# the whole scale story: the self-join is keyed by cell, so pairwise
# work is Σ|cell|² with K ~ √N sized cells, never the corpus-global
# O(N²) — the same bucketed-not-all-pairs contract as the LSH/banded
# dedups, with the blocking learned instead of hashed.

SEM_DEDUP_COS = NEAR_DUP_COS  # same near-dup bar as the cosine dedup


def sem_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Per vector: its k-means cell, how many cell-mates are within
    {SEM_DEDUP_COS} cosine (either direction), the strongest such
    cosine, and the keep verdict — a vector is pruned iff a LOWER-id
    cell-mate sits within the threshold (deterministic keep-first; the
    survivor of every dup relation is its minimum id). Composes
    :func:`sim_kmeans` (2 unrolled Lloyd rounds) so the whole pipeline
    — clustering included — replays deterministically in the oracle."""
    emb = _emb(spark, sf)
    m = sim_kmeans(spark, sf).select("vec_id", "cid").join(emb, "vec_id")
    a = m.selectExpr("cid", "vec_id AS a_id", "e AS ae", "norm AS anorm")
    b = m.selectExpr("cid", "vec_id AS b_id", "e AS be", "norm AS bnorm")
    cos = "round(" + _DOT.format(a="ae", b="be") + " / (anorm * bnorm), 4)"
    pairs = (
        a.join(b, "cid")
        .where("a_id < b_id")
        .selectExpr("a_id", "b_id", f"{cos} AS cos_ab")
        .where(f"cos_ab >= {SEM_DEDUP_COS}")
    )
    touched = (
        pairs.selectExpr("a_id AS vec_id", "cos_ab")
        .unionByName(pairs.selectExpr("b_id AS vec_id", "cos_ab"))
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n_dups"),
            F.max("cos_ab").alias("max_cos"),
        )
    )
    dropped = (
        pairs.select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )
    return (
        m.select("vec_id", "cid")
        .join(touched, "vec_id", "left")
        .join(dropped, "vec_id", "left")
        .selectExpr(
            "vec_id",
            "cid",
            "CAST(coalesce(n_dups, 0) AS BIGINT) AS n_dups",
            "coalesce(max_cos, 0.0d) AS max_cos",
            "CAST(is_dropped IS NULL AS INT) AS keep",
        )
        .orderBy("vec_id")
    )


SEM_DEDUP_SQL = f"""
WITH {_KM_A2_SQL},
m AS (SELECT a2.vec_id, a2.cid, n.e, n.norm
      FROM a2 JOIN n ON a2.vec_id = n.vec_id),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         round(list_dot_product(a.e, b.e) / (a.norm * b.norm), 4) AS cos_ab
  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.e, b.e) / (a.norm * b.norm), 4)
          >= {SEM_DEDUP_COS}),
touched AS (
  SELECT vec_id, count(*) AS n_dups, max(cos_ab) AS max_cos FROM (
    SELECT a_id AS vec_id, cos_ab FROM pairs
    UNION ALL SELECT b_id AS vec_id, cos_ab FROM pairs)
  GROUP BY vec_id),
dropped AS (SELECT DISTINCT b_id AS vec_id FROM pairs)
SELECT m.vec_id AS vec_id, m.cid AS cid,
       CAST(COALESCE(t.n_dups, 0) AS BIGINT) AS n_dups,
       COALESCE(t.max_cos, 0.0) AS max_cos,
       CAST(d.vec_id IS NULL AS INT) AS keep
FROM m LEFT JOIN touched t ON m.vec_id = t.vec_id
LEFT JOIN dropped d ON m.vec_id = d.vec_id
ORDER BY vec_id"""


# --- cluster-balanced diversity sampling ----------------------------------
# STAGED for the round-11 driver window (round-10's is full; the
# staging every late operator goes through). The selection family's
# diversity half: DSIR/temperature/mixture pick docs by target
# similarity or source weight, SemDeDup prunes semantic repeats —
# this op SUBSAMPLES TO A BUDGET while flattening the cluster
# distribution (the "cluster-balanced sampling" used to de-bias
# web-scale corpora toward rare semantic regions; same learned-cell
# machinery as SemDeDup, pointed at sampling instead of pruning).
# Every quota is INTEGER arithmetic (equal allocation, remainder to
# the largest cells first, capped by cell size) and the within-cell
# pick is a deterministic 60-bit-hash priority — no float boundary
# anywhere in the keep decision.
#
# Scale shape: composes sim_kmeans (zero-shuffle E-steps, broadcast
# centroids); the quota table is K rows → broadcast; the within-cell
# rank is a window PARTITIONED BY cell (distributed, no global sort);
# the keep decision is a pushable per-row comparison.

#: sampling budget (vectors kept across all cells; cells smaller than
#: their quota under-fill it — visible as kept < quota, like the
#: mixture plan's capped sources).
DIV_BUDGET = 256


def sample_diverse(spark: SparkSession, sf: str) -> DataFrame:
    """Per vector: its k-means cell, the cell size, the cell's integer
    quota (equal split of DIV_BUDGET, remainder to the largest cells
    first), its hash priority and within-cell rank, and the keep flag
    (rank ≤ quota). Flattens the cluster histogram: over-represented
    semantic regions are capped at ~budget/K while rare cells keep
    everything they have."""
    # localCheckpoint pins the k-means assignment ONCE: the quota
    # aggregate and the priority projection below are DIVERGING
    # consumers (different projections defeat exchange reuse), so the
    # lazy form re-ran the full zero-shuffle E-step scan per consumer
    # (r19 A/B at sf0.1 best-of-3: 3.81 s -> 2.78 s). The pinned frame
    # is (vec_id, cid) — 16 bytes/vector at any scale.
    asg = sim_kmeans(spark, sf).select("vec_id", "cid").localCheckpoint(
        eager=True
    )
    wall = Window.partitionBy()
    worder = Window.orderBy(F.desc("cell_n"), F.asc("cid"))
    quotas = (
        asg.groupBy("cid")
        .agg(F.count("*").alias("cell_n"))
        .withColumn("n_cells", F.count("*").over(wall))
        .withColumn("crank", F.row_number().over(worder))
        .selectExpr(
            "cid",
            "cell_n",
            f"CAST({DIV_BUDGET} DIV n_cells"
            f" + CAST(crank <= {DIV_BUDGET} % n_cells AS INT) AS BIGINT)"
            " AS quota",
        )
    )
    pri_expr = _h60_spark("concat('div#', cast(vec_id AS string))")
    pri = asg.selectExpr("vec_id", "cid", f"{pri_expr} AS pri")
    wcell = Window.partitionBy("cid").orderBy(F.asc("pri"), F.asc("vec_id"))
    return (
        pri.withColumn("rnk", F.row_number().over(wcell).cast("long"))
        .join(F.broadcast(quotas), "cid")
        .selectExpr(
            "vec_id",
            "cid",
            "cell_n",
            "quota",
            "pri",
            "rnk",
            "CAST(rnk <= quota AS INT) AS kept",
        )
        .orderBy("vec_id")
    )


SAMPLE_DIVERSE_SQL = f"""
WITH {_KM_A2_SQL},
sizes AS (SELECT cid, count(*) AS cell_n FROM a2 GROUP BY cid),
q AS (SELECT cid, cell_n,
             CAST({DIV_BUDGET} // n_cells
                  + CASE WHEN crank <= {DIV_BUDGET} % n_cells
                         THEN 1 ELSE 0 END AS BIGINT) AS quota
      FROM (SELECT cid, cell_n, count(*) OVER () AS n_cells,
                   row_number() OVER (ORDER BY cell_n DESC, cid ASC)
                     AS crank
            FROM sizes)),
pri AS (SELECT vec_id, cid,
               {_h60_duck("'div#' || CAST(vec_id AS VARCHAR)")} AS pri
        FROM a2),
r AS (SELECT vec_id, cid, pri,
             row_number() OVER (PARTITION BY cid
                                ORDER BY pri ASC, vec_id ASC) AS rnk
      FROM pri)
SELECT r.vec_id, r.cid, q.cell_n, q.quota, r.pri,
       CAST(r.rnk AS BIGINT) AS rnk,
       CAST(r.rnk <= q.quota AS INT) AS kept
FROM r JOIN q ON r.cid = q.cid ORDER BY vec_id"""


# --- int8 embedding quantization ------------------------------------------

def embedding_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric int8 quantization stats per vector — the compression
    step an ANN index applies before storing 100 TB of embeddings
    (scale = 127/max|x|, q = round(x·scale)). Stateless per-row JVM
    expressions (transform/aggregate on the array column): zero
    shuffle, zero Python. Outputs are integer-exact (sum of quantized
    ints, clip count) plus one deterministic double (the scale), so
    cross-engine parity is bitwise rather than tolerance-based."""
    emb = load_table(spark, sf, "embeddings")
    return (
        emb.selectExpr(
            "vec_id",
            "CAST(size(embedding) AS BIGINT) AS n_dims",
            "CAST(127.0 AS DOUBLE)"
            " / array_max(transform(embedding,"
            " x -> abs(CAST(x AS DOUBLE)))) AS scale",
            "embedding",
        )
        .selectExpr(
            "vec_id",
            "n_dims",
            "scale",
            "transform(embedding,"
            " x -> CAST(round(CAST(x AS DOUBLE) * scale) AS BIGINT)) AS q",
        )
        .selectExpr(
            "vec_id",
            "n_dims",
            "round(scale, 6) AS scale",
            "aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x) AS sum_q",
            "CAST(size(filter(q, x -> abs(x) = 127)) AS BIGINT) AS n_clipped",
        )
        .orderBy("vec_id")
    )


EMBEDDING_QUANTIZE_SQL = """WITH base AS (
  SELECT vec_id,
         CAST(len(embedding) AS BIGINT) AS n_dims,
         CAST(127.0 AS DOUBLE)
           / list_max(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE)))) AS scale,
         embedding
  FROM embeddings),
quant AS (
  SELECT vec_id, n_dims, scale,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * scale)
                                  AS BIGINT)) AS q
  FROM base)
SELECT vec_id, n_dims, round(scale, 6) AS scale,
       CAST(list_sum(q) AS BIGINT) AS sum_q,
       CAST(len(list_filter(q, x -> abs(x) = 127)) AS BIGINT) AS n_clipped
FROM quant ORDER BY vec_id"""


# --- embedding hygiene: norm distribution + outliers ----------------------

def embedding_norm(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-hygiene audit: per-label L2-norm distribution (count,
    mean, population stddev) plus how many vectors sit outside
    mean ± 2σ — the zero-vector / exploding-norm check run before any
    ANN indexing or dedup at scale. Two passes over a (vec_id, norm)
    projection: a 10-row per-label aggregate broadcast back onto the
    norms for the outlier count — the corpus shuffles nothing but its
    label column, and at 100 TB both passes are map-side partial aggs.

    Rounding rule (ADVICE r5 — state exactly what the code does): the
    per-vector ``norm`` and the ``sd_norm`` entering the band comparison
    are round(·,6); ``mean_norm`` in the band is the UNROUNDED quotient
    round(sum,6)/n — both engines build the band from those same three
    expressions in the same order, which is what makes its edges
    bit-identical (mean_norm is additionally round(·,6)'d in the FINAL
    projection only). Do not round mean_norm before the comparison on
    one engine without the other."""
    dot = _DOT.format(a="e", b="e")
    norms = (
        load_table(spark, sf, "embeddings")
        .selectExpr(
            "vec_id",
            "label",
            "transform(embedding, x -> CAST(x AS DOUBLE)) AS e",
        )
        .selectExpr("vec_id", "label", f"round(sqrt({dot}), 6) AS norm")
    )
    stats = norms.groupBy("label").agg(
        F.count("*").alias("n"),
        (F.round(F.sum("norm"), 6) / F.count("*")).alias("mean_norm"),
        F.round(F.stddev_pop("norm"), 6).alias("sd_norm"),
    )
    flagged = (
        norms.join(F.broadcast(stats), "label")
        .withColumn(
            "is_outlier",
            (
                (F.col("norm") < F.col("mean_norm") - 2 * F.col("sd_norm"))
                | (F.col("norm") > F.col("mean_norm") + 2 * F.col("sd_norm"))
            ).cast("long"),
        )
        .groupBy("label")
        .agg(F.sum("is_outlier").alias("n_outlier"))
    )
    return (
        stats.join(flagged, "label")
        .select(
            "label",
            "n",
            F.round("mean_norm", 6).alias("mean_norm"),
            "sd_norm",
            "n_outlier",
        )
        .orderBy("label")
    )


EMBEDDING_NORM_SQL = """
WITH emb AS (SELECT vec_id, label,
                    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
             FROM embeddings),
n AS (SELECT vec_id, label, round(sqrt(list_dot_product(e, e)), 6) AS norm
      FROM emb),
stats AS (SELECT label, count(*) AS n,
                 round(sum(norm), 6) / count(*) AS mean_norm,
                 round(stddev_pop(norm), 6) AS sd_norm
          FROM n GROUP BY label),
flagged AS (
  SELECT n.label,
         CAST(sum(CASE WHEN n.norm < s.mean_norm - 2 * s.sd_norm
                         OR n.norm > s.mean_norm + 2 * s.sd_norm
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier
  FROM n JOIN stats s ON n.label = s.label GROUP BY n.label)
SELECT s.label, s.n, round(s.mean_norm, 6) AS mean_norm, s.sd_norm,
       f.n_outlier
FROM stats s JOIN flagged f ON s.label = f.label ORDER BY s.label"""


register("ext_embedding_norm", embedding_norm, EMBEDDING_NORM_SQL)
register("ext_embedding_quantize", embedding_quantize, EMBEDDING_QUANTIZE_SQL)
register("ext_knn_classify", knn_classify, KNN_CLASSIFY_SQL)
register("ext_embedding_centroids", embedding_centroids, EMBEDDING_CENTROIDS_SQL)
register("ext_sim_kmeans", sim_kmeans, SIM_KMEANS_SQL)
register("ext_sim_topk_cosine", sim_topk_cosine, SIM_TOPK_COSINE_SQL)
register("ext_sim_ann_ivf", sim_ann_ivf, SIM_ANN_IVF_SQL)
register("ext_dedup_embedding_cosine", dedup_embedding_cosine, DEDUP_EMBEDDING_COSINE_SQL)
register("ext_sim_ann_lsh", sim_ann_lsh, SIM_ANN_LSH_SQL)
register("ext_sem_dedup", sem_dedup, SEM_DEDUP_SQL)


# --- product-quantization ANN (asymmetric distance computation) -----------
# Registered round 9 (staged through round 8 while that window was full —
# the staging every late operator goes through). PQ is the MEMORY half of the ANN
# story the LSH/IVF variants leave open: the index stores M=4 sub-codes
# per vector (4 bytes at K≤256) instead of 64 float64s (512 B) — 128×
# smaller, which is what lets a 100 TB embedding corpus serve from RAM.
# Queries never decompress the corpus: an M×K lookup table of
# query-to-centroid sub-distances is built per query (KB-sized,
# broadcast), and each corpus vector's estimated distance is M table
# lookups summed — the classic asymmetric distance computation (ADC)
# from Jégou et al., "Product Quantization for Nearest Neighbor
# Search" (TPAMI 2011).

PQ_M = 4       # subspaces
PQ_SUBDIM = 16  # dims per subspace (4 × 16 = the fixture's 64)
PQ_K = 8       # centroids per subspace codebook

#: squared L2 via norms (ssq + csq − 2·dot): every term is a sequential
#: left-to-right fold in BOTH engines, greatest(·, 0) clamps the
#: −1e−16-grade float residue a self-distance can leave (round would
#: surface it as −0.0 and hash-diverge).
_PQ_D2 = (
    "round(greatest({ssq} + {csq} - 2 * "
    + _DOT
    + ", 0D), 4)"
)


def _pq_candidates(spark: SparkSession, sf: str) -> DataFrame:
    """Shared ADC pipeline: learn per-subspace codebooks (init = first
    PQ_K vectors' sub-vectors, one unrolled Lloyd refinement — the
    sim_kmeans recipe), encode the corpus to PQ_M codes, and estimate
    the squared L2 of every (query, corpus vector) pair as M LUT
    lookups summed — (q_id, vec_id, pq_d2), unranked.
    :func:`sim_ann_pq` cuts it at TOP_K; :func:`ann_recall_pq` cuts a
    larger shortlist and re-ranks it by exact distance (the deployment
    shape).

    Fully declarative (no driver round-trips): codebooks are M×K-row
    tables flowing through broadcast joins; the M-step is a
    (m, cid, pos)-keyed aggregate over sub-vector dims. At 100 TB the
    corpus-sized work is one encode scan (M broadcast-join argmins) and
    the per-query cost is |corpus| lookup-sums over a broadcast
    KB-sized LUT — no full-vector math ever touches the query path."""
    emb = _emb(spark, sf).selectExpr(
        "vec_id", "e", "norm * norm AS esq"
    )
    m_fanout = (
        "explode(array("
        + ", ".join(str(m) for m in range(PQ_M))
        + ")) AS m"
    )
    subs = emb.selectExpr("vec_id", m_fanout, "e").selectExpr(
        "vec_id", "m", f"slice(e, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM}) AS sub"
    ).selectExpr(
        "vec_id", "m", "sub",
        _DOT.format(a="sub", b="sub") + " AS ssq",
    )
    c0 = subs.where(F.col("vec_id") < PQ_K).selectExpr(
        "m", "vec_id AS cid", "sub AS ce", "ssq AS csq"
    )
    d2 = _PQ_D2.format(ssq="ssq", csq="csq", a="sub", b="ce")

    def _assign(codebook: DataFrame) -> DataFrame:
        w = Window.partitionBy("vec_id", "m").orderBy(
            F.expr(d2).asc(), F.col("cid").asc()
        )
        return (
            subs.join(F.broadcast(codebook), "m")
            .withColumn("rn", F.row_number().over(w))
            .where("rn = 1")
        )

    a1 = _assign(c0).select("vec_id", "m", "cid", "sub")
    # NOTE on plan shape (r9 scan audit): this self-contained pipeline's
    # consumers re-derive the learn+encode lineage, so the recall eval's
    # plan holds ~22 fixture-parquet scans. Checkpointing the codebook
    # and/or code table (the artifacts a production PQ index PERSISTS —
    # the documented at-scale shape) was measured and made the fixture
    # queries 1.5–2.5× SLOWER: the forced materialization serializes
    # what the lazy plan overlaps, and at fixture size a re-scan is
    # cheaper than a checkpoint round-trip. At 100 TB the index is
    # written once and served from storage, so the repeated-lineage
    # shape never ships — keep the fixture plan lazy.
    c1 = (
        a1.select("m", "cid", F.posexplode("sub").alias("pos", "x"))
        .groupBy("m", "cid", "pos")
        .agg((F.round(F.sum("x"), 6) / F.count("*")).alias("cx"))
        .groupBy("m", "cid")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, cx))),"
                " s -> s.cx)"
            ).alias("ce")
        )
        .selectExpr("m", "cid", "ce", _DOT.format(a="ce", b="ce") + " AS csq")
    )
    codes = _assign(c1).selectExpr("vec_id", "m", "cid AS code")
    qids = ", ".join(map(str, QUERY_VEC_IDS))
    lut = (
        subs.where(f"vec_id IN ({qids})")
        .selectExpr("vec_id AS q_id", "m", "sub", "ssq")
        .join(F.broadcast(c1), "m")
        .selectExpr("q_id", "m", "cid", f"{d2} AS pd")
    )
    return (
        codes.join(
            F.broadcast(lut),
            (codes.m == lut.m) & (codes.code == lut.cid),
        )
        .where("vec_id != q_id")
        .groupBy("q_id", "vec_id")
        .agg(F.expr("round(sum(pd), 4)").alias("pq_d2"))
    )


def sim_ann_pq(spark: SparkSession, sf: str) -> DataFrame:
    """PQ/ADC top-k over :func:`_pq_candidates`. Output carries the
    exact squared L2 next to the estimate — the quantization error is
    part of the checked result, like every estimator here."""
    wq = Window.partitionBy("q_id").orderBy(
        F.col("pq_d2").asc(), F.col("vec_id").asc()
    )
    top = (
        _pq_candidates(spark, sf)
        .withColumn("rk", F.row_number().over(wq))
        .where(f"rk <= {TOP_K}")
    )
    emb = _emb(spark, sf).selectExpr("vec_id", "e", "norm * norm AS esq")
    nq = emb.selectExpr("vec_id AS q_id", "e AS qe", "esq AS qsq")
    nv = emb.selectExpr("vec_id", "e AS ve", "esq AS vsq")
    exact = _PQ_D2.format(ssq="qsq", csq="vsq", a="qe", b="ve")
    return (
        top.join(F.broadcast(nq), "q_id")
        .join(nv, "vec_id")
        .selectExpr("q_id", "vec_id", "pq_d2", f"{exact} AS exact_d2", "rk")
        .orderBy("q_id", "rk")
    )


_PQ_QIDS = ", ".join(map(str, QUERY_VEC_IDS))
_PQ_D2_DUCK = "round(greatest({ssq} + {csq} - 2 * list_dot_product({a}, {b}), 0), 4)"
_PQ_A_DUCK = _PQ_D2_DUCK.format(ssq="s.ssq", csq="c.csq", a="s.sub", b="c.ce")

#: the PQ pipeline through the unranked ADC estimates (`est`) — shared
#: CTE prefix of SIM_ANN_PQ_SQL and ANN_RECALL_PQ_SQL, mirroring the
#: Spark-side `_pq_candidates` split.
_PQ_EST_SQL = f"""emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
n AS (SELECT vec_id, e, list_dot_product(e, e) AS esq FROM emb),
subs0 AS (SELECT vec_id, m,
                 list_slice(e, m * {PQ_SUBDIM} + 1, m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sub
          FROM emb, (SELECT unnest(range({PQ_M})) AS m)),
subs AS (SELECT vec_id, m, sub, list_dot_product(sub, sub) AS ssq FROM subs0),
c0 AS (SELECT m, vec_id AS cid, sub AS ce, ssq AS csq FROM subs
       WHERE vec_id < {PQ_K}),
a1 AS (SELECT vec_id, m, cid, sub FROM (
  SELECT s.vec_id, s.m, c.cid, s.sub,
         row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
           {_PQ_A_DUCK} ASC, c.cid ASC) AS rn
  FROM subs s JOIN c0 c ON s.m = c.m) WHERE rn = 1),
u1 AS (SELECT m, cid, gs.i AS pos, round(sum(sub[gs.i]), 6) / count(*) AS cx
       FROM a1 CROSS JOIN generate_series(1, {PQ_SUBDIM}) gs(i)
       GROUP BY m, cid, gs.i),
c1 AS (SELECT m, cid, list(cx ORDER BY pos) AS ce FROM u1 GROUP BY m, cid),
c1n AS (SELECT m, cid, ce, list_dot_product(ce, ce) AS csq FROM c1),
codes AS (SELECT vec_id, m, cid AS code FROM (
  SELECT s.vec_id, s.m, c.cid,
         row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
           {_PQ_A_DUCK} ASC, c.cid ASC) AS rn
  FROM subs s JOIN c1n c ON s.m = c.m) WHERE rn = 1),
lut AS (SELECT s.vec_id AS q_id, s.m, c.cid, {_PQ_A_DUCK} AS pd
        FROM subs s JOIN c1n c ON s.m = c.m
        WHERE s.vec_id IN ({_PQ_QIDS})),
est AS (SELECT l.q_id, co.vec_id, round(sum(l.pd), 4) AS pq_d2
        FROM codes co JOIN lut l ON co.m = l.m AND co.code = l.cid
        WHERE co.vec_id != l.q_id
        GROUP BY l.q_id, co.vec_id)"""

SIM_ANN_PQ_SQL = f"""
WITH {_PQ_EST_SQL},
ranked AS (SELECT q_id, vec_id, pq_d2,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY pq_d2 ASC, vec_id ASC) AS rk
           FROM est)
SELECT t.q_id, t.vec_id, t.pq_d2,
       {_PQ_D2_DUCK.format(ssq="nq.esq", csq="nv.esq", a="nq.e", b="nv.e")}
         AS exact_d2,
       t.rk
FROM ranked t
JOIN n nq ON t.q_id = nq.vec_id
JOIN n nv ON t.vec_id = nv.vec_id
WHERE t.rk <= {TOP_K}
ORDER BY q_id, rk"""

register("ext_sim_ann_pq", sim_ann_pq, SIM_ANN_PQ_SQL)


# --- PQ recall evaluation (ADC vs exact L2 ground truth) -------------------
# VERDICT r8 item 3: the 128× compression claim needs a measured recall
# number, scored the way LSH/IVF are scored. PQ ranks by squared L2, so
# ground truth here is the exact-L2 top-k (the `exact_d2` metric the PQ
# query itself carries), not the cosine top-k the other evals use. Two
# recall columns: the raw ADC cut at k (what the sketch alone buys) and
# the deployment shape — an ADC SHORTLIST of PQ_SHORTLIST candidates
# re-ranked by exact distance, cut at k. The re-rank touches only
# shortlist-many full vectors per query, so its cost is O(queries ×
# shortlist), not O(queries × corpus) — the whole point of PQ.

PQ_SHORTLIST = 5 * TOP_K


def ann_recall_pq(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k of PQ/ADC against the exact brute-force L2 top-k, raw
    and shortlist-re-ranked. Same composition shape as
    :func:`ann_recall_eval`: all intermediate sets are query-count- or
    shortlist-sized (trivially broadcast); at 100 TB this runs over a
    sampled query set while the index serves the rest."""
    emb = _emb(spark, sf).selectExpr("vec_id", "e", "norm * norm AS esq")
    q = emb.where(F.col("vec_id").isin(QUERY_VEC_IDS)).selectExpr(
        "vec_id AS q_id", "e AS qe", "esq AS qsq"
    )
    d2 = _PQ_D2.format(ssq="qsq", csq="esq", a="qe", b="e")
    w = Window.partitionBy("q_id").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    exact = (
        q.crossJoin(emb)
        .where("vec_id != q_id")
        .selectExpr("q_id", "vec_id", f"{d2} AS d2")
        .withColumn("rk", F.row_number().over(w))
        .where(f"rk <= {TOP_K}")
        .select("q_id", "vec_id")
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.col("pq_d2").asc(), F.col("vec_id").asc()
    )
    sl = (
        _pq_candidates(spark, sf)
        .withColumn("rk_adc", F.row_number().over(wq))
        .where(f"rk_adc <= {PQ_SHORTLIST}")
    )
    rr_d2 = _PQ_D2.format(ssq="qsq", csq="esq", a="qe", b="e")
    wr = Window.partitionBy("q_id").orderBy(
        F.col("rr_d2").asc(), F.col("vec_id").asc()
    )
    rr = (
        sl.join(F.broadcast(q), "q_id")
        .join(emb, "vec_id")
        .selectExpr("q_id", "vec_id", "rk_adc", f"{rr_d2} AS rr_d2")
        .withColumn("rk_rr", F.row_number().over(wr))
    )
    adc_hits = (
        exact.join(rr.where(f"rk_adc <= {TOP_K}"), ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count("*").alias("n_hits_adc"))
    )
    rr_hits = (
        exact.join(rr.where(f"rk_rr <= {TOP_K}"), ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count("*").alias("n_hits_rerank"))
    )
    return (
        exact.groupBy("q_id")
        .agg(F.count("*").alias("k"))
        .join(adc_hits, "q_id", "left")
        .join(rr_hits, "q_id", "left")
        .select(
            "q_id",
            "k",
            F.coalesce("n_hits_adc", F.lit(0)).cast("long").alias("n_hits_adc"),
            F.round(
                F.coalesce("n_hits_adc", F.lit(0)) / F.col("k"), 4
            ).alias("recall_adc"),
            F.coalesce("n_hits_rerank", F.lit(0))
            .cast("long")
            .alias("n_hits_rerank"),
            F.round(
                F.coalesce("n_hits_rerank", F.lit(0)) / F.col("k"), 4
            ).alias("recall_rerank"),
        )
        .orderBy("q_id")
    )


ANN_RECALL_PQ_SQL = f"""
WITH {_PQ_EST_SQL},
x_pairs AS (
  SELECT nq.vec_id AS q_id, nv.vec_id AS vec_id,
         {_PQ_D2_DUCK.format(ssq="nq.esq", csq="nv.esq", a="nq.e", b="nv.e")}
           AS d2
  FROM n nq, n nv
  WHERE nq.vec_id IN ({_PQ_QIDS}) AND nv.vec_id != nq.vec_id),
x_ranked AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY d2 ASC, vec_id ASC) AS rk
  FROM x_pairs),
x_top AS (SELECT q_id, vec_id FROM x_ranked WHERE rk <= {TOP_K}),
sl AS (SELECT q_id, vec_id, pq_d2,
              row_number() OVER (PARTITION BY q_id
                                 ORDER BY pq_d2 ASC, vec_id ASC) AS rk_adc
       FROM est QUALIFY rk_adc <= {PQ_SHORTLIST}),
rr AS (SELECT s.q_id, s.vec_id, s.rk_adc,
              row_number() OVER (PARTITION BY s.q_id ORDER BY
                {_PQ_D2_DUCK.format(ssq="nq.esq", csq="nv.esq", a="nq.e", b="nv.e")}
                ASC, s.vec_id ASC) AS rk_rr
       FROM sl s
       JOIN n nq ON s.q_id = nq.vec_id
       JOIN n nv ON s.vec_id = nv.vec_id),
adc_hits AS (
  SELECT x.q_id, count(*) AS n_hits_adc
  FROM x_top x JOIN rr i ON x.q_id = i.q_id AND x.vec_id = i.vec_id
  WHERE i.rk_adc <= {TOP_K} GROUP BY x.q_id),
rr_hits AS (
  SELECT x.q_id, count(*) AS n_hits_rerank
  FROM x_top x JOIN rr i ON x.q_id = i.q_id AND x.vec_id = i.vec_id
  WHERE i.rk_rr <= {TOP_K} GROUP BY x.q_id),
ks AS (SELECT q_id, count(*) AS k FROM x_top GROUP BY q_id)
SELECT ks.q_id AS q_id, ks.k AS k,
       CAST(COALESCE(a.n_hits_adc, 0) AS BIGINT) AS n_hits_adc,
       round(COALESCE(a.n_hits_adc, 0) / ks.k, 4) AS recall_adc,
       CAST(COALESCE(r.n_hits_rerank, 0) AS BIGINT) AS n_hits_rerank,
       round(COALESCE(r.n_hits_rerank, 0) / ks.k, 4) AS recall_rerank
FROM ks
LEFT JOIN adc_hits a ON ks.q_id = a.q_id
LEFT JOIN rr_hits r ON ks.q_id = r.q_id
ORDER BY q_id"""

register("ext_ann_recall_pq", ann_recall_pq, ANN_RECALL_PQ_SQL)


#: Oracle for the STAGED streaming PQ encode-on-ingest parity
#: (streaming/ann.py, r11 registration): the batch argmin encode of
#: every corpus vector against the INIT codebook (the first PQ_K
#: vectors' sub-vectors — `c0` above, the artifact both sides share),
#: wide one-row-per-vector like the `pq_encode_arrow` output.
#: Statelessness of the encode makes the stream's batching invisible.
STREAMING_PQ_CODES_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
subs0 AS (SELECT vec_id, m,
                 list_slice(e, m * {PQ_SUBDIM} + 1, m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sub
          FROM emb, (SELECT unnest(range({PQ_M})) AS m)),
subs AS (SELECT vec_id, m, sub, list_dot_product(sub, sub) AS ssq FROM subs0),
c0 AS (SELECT m, vec_id AS cid, sub AS ce, ssq AS csq FROM subs
       WHERE vec_id < {PQ_K}),
codes AS (SELECT vec_id, m, cid FROM (
  SELECT s.vec_id, s.m, c.cid,
         row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
           {_PQ_A_DUCK} ASC, c.cid ASC) AS rn
  FROM subs s JOIN c0 c ON s.m = c.m) WHERE rn = 1)
SELECT vec_id,
       {', '.join(f'CAST(max(CASE WHEN m = {m} THEN cid END) AS INT) AS c{m}'
                  for m in range(PQ_M))}
FROM codes GROUP BY vec_id ORDER BY vec_id"""


def pq_encode_arrow(emb: DataFrame, codebooks) -> DataFrame:
    """Production PQ encode (the `sem_dedup_blocked` pattern: the
    oracled query carries the unrolled fixture pipeline; real corpora
    run this): one ``mapInPandas`` scan where each Arrow batch does M
    (batch×subdim)·(subdim×K) BLAS matmuls + row argmins against the
    broadcast codebook tensor.

    ``emb``: (vec_id BIGINT, e ARRAY<DOUBLE>); ``codebooks``: M×K×subdim
    array-like with M·subdim == dim(e). Returns (vec_id, c0..c{{M-1}}
    INT). Ranking runs on the shared round(d2, 4) grid and ties break
    to the smaller centroid id (argmin first-occurrence) — the exact
    contract of the expression encode and the DuckDB oracle, so all
    three paths agree bit-for-bit. Measured in bench_stress
    (`stress_pq_encode_arrow`): 100% code agreement with the codegen'd
    expression encode on a 10k sample and the faster path above K≈64 —
    the K-crossover is recorded in BASELINE.md."""
    import numpy as np
    import pandas as pd

    C = np.asarray(codebooks, dtype=np.float64)
    m_sub, k_cent, subdim = C.shape
    csq = (C * C).sum(axis=2)
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((C, csq))

    def encode(batches):
        Cw, csqw = bc.value
        for pdf in batches:
            X = np.vstack(pdf["e"].to_numpy())
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for m in range(m_sub):
                Xm = X[:, m * subdim: (m + 1) * subdim]
                # rank on the SAME quantized grid as the expression
                # encode and the DuckDB oracle — the full d2 clamped at
                # 0 and HALF_UP-rounded to 4 dp — so near-equidistant
                # centroids TIE on the grid and argmin's first-occurrence
                # rule (lowest cid) resolves them identically in all
                # three paths. Ranking the raw BLAS float instead
                # diverged at sf0.1 (caught by the round-12 full-scale
                # oracle sweep): two centroids 1e-6 apart tied in the
                # oracle but not in the unrounded argmin.
                ssq = (Xm * Xm).sum(axis=1)
                d = ssq[:, None] + csqw[m][None, :] - 2.0 * (Xm @ Cw[m].T)
                d4 = np.floor(np.maximum(d, 0.0) * 10000.0 + 0.5)
                out[f"c{m}"] = d4.argmin(axis=1).astype("int32")
            yield pd.DataFrame(out)

    schema = "vec_id long, " + ", ".join(f"c{m} int" for m in range(m_sub))
    return emb.select("vec_id", "e").mapInPandas(encode, schema)


def sem_dedup_blocked(
    emb: DataFrame,
    centroids,
    tau: float = SEM_DEDUP_COS,
) -> DataFrame:
    """Production-scale SemDeDup (the `learn_bpe`/`train_lr` pattern:
    the oracled query exists so DuckDB can replay it; real corpora run
    this): block vectors into cells by nearest centroid — fp32
    Arrow-matmul against the broadcast centroid matrix, ONE zero-
    shuffle scan stage — then emit near-dup pairs (cos ≥ tau, a < b)
    from per-cell BLAS cosine matrices via ``applyInPandas`` keyed by
    cell, so pairwise work is Σ|cell|², never corpus-global O(N²).

    ``emb``: (vec_id BIGINT, e ARRAY<DOUBLE>); ``centroids``: K×dim
    list/ndarray (K ≈ √N in the SemDeDup regime; learn them with
    :func:`sim_kmeans`'s recipe or any clustering). Returns
    (vec_a, vec_b, cell) pairs. Validated above fixture size by
    bench_stress.stress_sem_dedup: 500k vectors / 1024 cells — all 10
    planted clone pairs, zero false positives, pairwise work 9.8e-4 of
    all-pairs, 2.9 s warm."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float32)
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(C)

    def assign(batches):
        Cw = bc.value
        for pdf in batches:
            X = np.vstack(pdf["e"].to_numpy()).astype(np.float32)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell": (Xn @ Cw.T).argmax(axis=1).astype("int64"),
                    "e": list(X.astype(np.float64)),
                }
            )

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.vstack(pdf["e"].to_numpy()).astype(np.float32)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        ids = pdf["vec_id"].to_numpy()
        sims = X @ X.T
        ai, bi = np.nonzero(
            (sims >= tau) & (ids[:, None] < ids[None, :])
        )
        return pd.DataFrame(
            {
                "vec_a": ids[ai],
                "vec_b": ids[bi],
                "cell": pdf["cell"].to_numpy()[ai],
            }
        )

    assigned = emb.select("vec_id", "e").mapInPandas(
        assign, "vec_id long, cell long, e array<double>"
    )
    return assigned.groupBy("cell").applyInPandas(
        cell_pairs, "vec_a long, vec_b long, cell long"
    )


def _streaming_pq_ingest_parity(spark: SparkSession, sf: str) -> DataFrame:
    # Lazy import: streaming/ann.py is harness-side machinery registry
    # never imports at module load; the oracle constant is local.
    from dariadb_spark.streaming.ann import streaming_pq_ingest_parity

    return streaming_pq_ingest_parity(spark, sf)


# round 11: the three similarity-family operators staged through round
# 10 join the driver-checked surface (window discipline per registry.py).
register("ext_sample_diverse", sample_diverse, SAMPLE_DIVERSE_SQL)
register("ext_decontaminate_embed", decontaminate_embed, DECONTAMINATE_EMBED_SQL)
register(
    "streaming_pq_ingest_parity",
    _streaming_pq_ingest_parity,
    STREAMING_PQ_CODES_SQL,
)


# --- LSH recall evaluation --------------------------------------------------
# Registered round 13 (staged round 12, full staging discipline).
# ann_recall_pq closed the eval loop for the PQ index;
# this is the same loop for the LSH path — the recall@k a deployment
# monitors when it tunes tables/planes/bucket width. Composition shape
# identical to ann_recall_pq: the exact top-k baseline is the 5-query
# broadcast nested loop (query-count-sized, never corpus²), the LSH side
# IS the registered sim_ann_lsh pipeline, and recall joins two
# TOP_K·|queries|-row sets. Inherits sim_ann_lsh's one caveat (a
# hyperplane dot within ~1e-16 of zero could sign-flip between numpy
# and DuckDB — probability ~1e-8 on this fixture; everything else is
# exact).


def ann_recall_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Per query: exact-top-k size, how many of those the LSH index
    returned in ITS top-k, and recall@k."""
    emb = _emb(spark, sf)
    q = emb.where(F.col("vec_id").isin(QUERY_VEC_IDS)).selectExpr(
        "vec_id AS q_id", "e AS qe", "norm AS qnorm"
    )
    dot = _DOT.format(a="qe", b="e")
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    exact = (
        q.crossJoin(emb)
        .where("vec_id != q_id")
        .selectExpr(
            "q_id", "vec_id", f"round({dot} / (qnorm * norm), 4) AS cos_sim"
        )
        .withColumn("rk", F.row_number().over(w))
        .where(f"rk <= {TOP_K}")
        .select("q_id", "vec_id")
    )
    lsh = sim_ann_lsh(spark, sf).select("q_id", "vec_id")
    hits = (
        exact.join(lsh, ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        exact.groupBy("q_id")
        .agg(F.count("*").alias("k"))
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            "k",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.col("k"), 4
            ).alias("recall"),
        )
        .orderBy("q_id")
    )


# the recall oracle reuses SIM_ANN_LSH_SQL's whole CTE chain verbatim
# (everything above its final SELECT), then adds the exact baseline and
# the recall join — one source of truth for the LSH pipeline text.
_LSH_RANKED_CTES = SIM_ANN_LSH_SQL.rsplit(
    "SELECT q_id, vec_id, cos_sim, rk FROM ranked", 1
)[0].rstrip().rstrip(",")

ANN_RECALL_LSH_SQL = f"""{_LSH_RANKED_CTES},
lshk AS (SELECT q_id, vec_id FROM ranked WHERE rk <= {TOP_K}),
qv AS (SELECT vec_id AS q_id, e, norm FROM n
       WHERE vec_id IN ({", ".join(map(str, QUERY_VEC_IDS))})),
ex0 AS (SELECT qv.q_id, n.vec_id,
               round(list_dot_product(qv.e, n.e) / (qv.norm * n.norm), 4)
                 AS cos_sim
        FROM qv CROSS JOIN n WHERE n.vec_id != qv.q_id),
exr AS (SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cos_sim DESC, vec_id ASC) AS rk
        FROM ex0),
exk AS (SELECT q_id, vec_id FROM exr WHERE rk <= {TOP_K}),
hits AS (SELECT e.q_id, count(*) AS n_hits
         FROM exk e JOIN lshk l ON e.q_id = l.q_id AND e.vec_id = l.vec_id
         GROUP BY e.q_id)
SELECT e.q_id, count(*) AS k,
       CAST(coalesce(min(h.n_hits), 0) AS BIGINT) AS n_hits,
       round(coalesce(min(h.n_hits), 0) / CAST(count(*) AS DOUBLE), 4)
         AS recall
FROM exk e LEFT JOIN hits h ON e.q_id = h.q_id
GROUP BY e.q_id ORDER BY e.q_id"""


# --- principal component via integerized power iteration ---------------------
# Registered round 13 (staged round 12 with the full discipline:
# implemented + oracled + pytest parity + planted stress first).

PCA_SCALE = 10_000  # embedding → int grid (|e| ≤ ~0.53 → |q| ≤ ~5300)
_PCA_DOWN = 1_000_000  # inter-iteration magnitude scale-down


def embedding_pca(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the driver window. Since r15 this runs the
    PRODUCTION :func:`embedding_pca_arrow` path (blocked Arrow-matmul
    Gram) against the DEFINITIONAL posexplode oracle — the
    ext_dedup_edit_distance precedent: the hash gate proves the
    production plan equals the definition every round (measured 2.9 s
    → 0.77 s at sf0.1; the declared form stays as
    :func:`embedding_pca_op`, pytest-pinned byte-equal)."""
    return embedding_pca_arrow(load_table(spark, sf, "embeddings"))


def embedding_pca_op(emb: DataFrame) -> DataFrame:
    """Top principal direction of the embedding Gram matrix by TWO
    unrolled power-iteration steps (v = G²·1, normalized at the end) —
    the whitening/variance-axis primitive the SemDeDup/PQ family
    presumes (Sorscher et al. 2022 prune in PCA space; a drifting top
    component is also an embedding-pipeline health alarm). Two steps
    from the all-ones start give the standard one-power-method
    Rayleigh sharpening; the unrolled-chain form is the Lloyd-chain
    recipe (`ext_sim_kmeans`) — deterministic, oracle-replayable,
    no iteration-count knob hidden in a driver loop.

    Exactness: embeddings quantize to the PCA_SCALE int grid (the
    `ext_embedding_quantize` recipe); the Gram cells, both
    matrix-vector products, and the squared-norm accumulate in
    DECIMAL(38,0)/HUGEINT — exact, order-free. Between products the
    vector scales down by sign(v)·⌊|v|/10⁶⌋ with EXPLICIT sign
    decomposition (Spark DIV and DuckDB // both truncate toward zero,
    so the decomposition is belt-and-braces: both engines evaluate the
    shared magnitude expression identically — ext/exact.py's
    signed-variant lesson). The
    one float each output row sees is round(v_i/√S, 6) where √S is
    IEEE-correctly-rounded on an exact double — bit-identical across
    engines.

    Plan shape: the d²-per-vector pair fan-out (2M rows at the
    fixture) partial-aggregates to the 4096-cell Gram before any
    shuffle; everything after is d²/d-row arithmetic with broadcast
    joins. At 100 TB the fan-out swaps for :func:`gram_arrow` (the
    `pq_encode_arrow` shape: per-batch QᵀQ BLAS partials summed by
    cell — :func:`embedding_pca_arrow` is that production API) with
    zero change downstream: the declared form and the BLAS form meet
    at the same exact integer cell table, pinned by pytest and the
    500k-vector stress.
    """
    q = emb.selectExpr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)"
        f" * {PCA_SCALE}) AS BIGINT)) AS q"
    )
    pairs = q.select(
        "q", F.posexplode("q").alias("i", "qi")
    ).select(
        "i", "qi", F.posexplode("q").alias("j", "qj")
    )
    gram = pairs.groupBy("i", "j").agg(
        F.sum(F.col("qi").cast("decimal(38,0)") * F.col("qj")).alias("g")
    )
    return _pca_power_from_gram(gram)


def gram_arrow(emb: DataFrame, scale: int = PCA_SCALE) -> DataFrame:
    """Production Gram builder (VERDICT r14 item 2 — the blocked
    Arrow-matmul path `embedding_pca_op`'s docstring promises): ONE
    ``mapInPandas`` scan where each Arrow batch quantizes its vectors
    onto the `scale` int grid and emits the d² cells of the batch QᵀQ
    partial; a single groupBy(i, j) sums the partials into the SAME
    exact DECIMAL(38,0) cell table as the declared posexplode fan-out.

    Exactness: the per-batch matmul runs in float64 BLAS, which is
    exact integer arithmetic while every accumulated dot product stays
    below 2⁵³ — guarded per batch by rows·max|q|² < 2⁵³ (an assert, so
    an out-of-range corpus fails loudly instead of rounding); the
    partial then casts back to int64 losslessly, and the cross-batch
    sum accumulates in DECIMAL(38,0). At PCA_SCALE with |e| ≤ 1 the
    guard allows ~90M rows per Arrow batch — far above any real batch.

    Plan shape (100 TB): zero-shuffle scan stage (column-pruned to the
    embedding), each batch contributing exactly d² rows regardless of
    batch size, then one d²-group aggregate — the N·d² row fan-out of
    the declared form never materializes.

    ``emb``: (embedding ARRAY<FLOAT/DOUBLE>, …). Returns (i INT,
    j INT, g DECIMAL(38,0)) — `_pca_power_from_gram`'s input contract.
    """
    import numpy as np
    import pandas as pd

    def qtq(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            Q = np.floor(np.abs(X) * scale + 0.5) * np.sign(X)  # HALF_UP
            mx = float(np.abs(Q).max()) if Q.size else 0.0
            # float64 matmul is exact while every cell sum < 2^53
            assert len(Q) * mx * mx < 2.0**53, (
                "gram_arrow: batch exceeds the exact-float64 envelope "
                f"(rows={len(Q)}, max|q|={mx}); shrink "
                "spark.sql.execution.arrow.maxRecordsPerBatch or scale"
            )
            G = Q.T @ Q
            d = G.shape[0]
            ii, jj = np.indices((d, d))
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype(np.int32),
                    "j": jj.ravel().astype(np.int32),
                    "gp": G.ravel().astype(np.int64),
                }
            )

    parts = emb.select("embedding").mapInPandas(qtq, "i int, j int, gp long")
    return parts.groupBy("i", "j").agg(
        F.sum(F.col("gp").cast("decimal(38,0)")).alias("g")
    )


def embedding_pca_arrow(emb: DataFrame) -> DataFrame:
    """Production top-principal-direction: :func:`gram_arrow` feeding
    the SAME exact power-iteration tail as the declared/oracled
    :func:`embedding_pca_op` — bit-identical output (pytest-pinned and
    stress-asserted at 500k vectors), N·d² fan-out retired."""
    return _pca_power_from_gram(gram_arrow(emb))


def _pca_power_from_gram(gram: DataFrame) -> DataFrame:
    """The shared exact power-iteration tail: two unrolled G·v steps
    from the all-ones start, DECIMAL(38,0) throughout, sign-decomposed
    magnitude scale-down between steps, one float per output row
    (round(v_i/√S, 6)). Input contract: (i, j, g) — the exact integer
    Gram cell table from either builder.

    r19 audit: the gram feeds both power steps, but the final adaptive
    plan shows the second consumer reading a ReusedExchange of the
    gram aggregate — the corpus scan runs ONCE at runtime, so an eager
    pin here is pure overhead (A/B was a wash both orders). Left
    lazy; see OPTIMIZATION_r19.md."""
    sdiv = (
        "CAST(CASE WHEN {v} < 0 THEN -(abs({v}) DIV {d})"
        " ELSE abs({v}) DIV {d} END AS BIGINT)"
    )
    v1 = gram.groupBy(F.col("j").alias("k")).agg(F.sum("g").alias("v1"))
    v1s = v1.selectExpr(
        "k", sdiv.format(v="v1", d=_PCA_DOWN) + " AS v1s"
    )
    v2 = (
        gram.join(F.broadcast(v1s), gram.j == v1s.k)
        .groupBy(F.col("i").alias("dim"))
        .agg(F.sum(F.col("g") * F.col("v1s")).alias("v2"))
        .selectExpr("dim", sdiv.format(v="v2", d=_PCA_DOWN) + " AS v2s")
    )
    norm = v2.agg(
        F.sum(F.col("v2s").cast("decimal(38,0)") * F.col("v2s")).alias("s2")
    )
    return (
        v2.crossJoin(F.broadcast(norm))
        .where(F.col("s2") > 0)
        .selectExpr(
            "CAST(dim AS BIGINT) AS dim",
            "v2s",
            "round(CAST(v2s AS DOUBLE)"
            " / sqrt(CAST(s2 AS DOUBLE)), 6) AS loading",
        )
        .orderBy("dim")
    )


EMBEDDING_PCA_SQL = f"""WITH
q AS (SELECT vec_id, list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * {PCA_SCALE}) AS BIGINT)) AS q
      FROM embeddings),
e AS (SELECT vec_id, generate_subscripts(q, 1) - 1 AS i, unnest(q) AS qi
      FROM q),
gram AS (
  SELECT a.i AS i, b.i AS j, sum(CAST(a.qi AS HUGEINT) * b.qi) AS g
  FROM e a JOIN e b USING (vec_id)
  GROUP BY 1, 2),
v1 AS (SELECT j AS k, sum(g) AS v1 FROM gram GROUP BY j),
v1s AS (SELECT k, CAST(CASE WHEN v1 < 0 THEN -(abs(v1) // {_PCA_DOWN})
                            ELSE abs(v1) // {_PCA_DOWN} END AS BIGINT) AS v1s
        FROM v1),
v2 AS (SELECT g.i AS dim, sum(g.g * v.v1s) AS v2
       FROM gram g JOIN v1s v ON g.j = v.k GROUP BY g.i),
v2s AS (SELECT dim, CAST(CASE WHEN v2 < 0 THEN -(abs(v2) // {_PCA_DOWN})
                              ELSE abs(v2) // {_PCA_DOWN} END AS BIGINT) AS v2s
        FROM v2),
nrm AS (SELECT sum(CAST(v2s AS HUGEINT) * v2s) AS s2 FROM v2s)
SELECT CAST(dim AS BIGINT) AS dim, v2s,
       round(CAST(v2s AS DOUBLE) / sqrt(CAST(s2 AS DOUBLE)), 6) AS loading
FROM v2s CROSS JOIN nrm WHERE s2 > 0 ORDER BY dim"""

register("ext_embedding_pca", embedding_pca, EMBEDDING_PCA_SQL)


# --- ANN recall report (merge #5: the IVF + LSH recall evals) -----------------
# Registered round 16, executing VERDICT r15 item 3. The audit of the
# recall-eval trio (the retention-matrix duplication criterion, r13):
#   * ext_ann_recall_eval (IVF) and ext_ann_recall_lsh share the
#     IDENTICAL exact cosine top-k baseline per query and the identical
#     output shape (q_id, k, n_hits, recall) — each is a pure
#     method-filter of a method-tagged composite, so the merge is the
#     set_ops/hll_report shape and ONE slot is freed. The composite is
#     also strictly cheaper than the pair: the exact brute-force
#     baseline is computed ONCE and joined against both index outputs.
#   * ext_ann_recall_pq is NOT mergeable — the audit is allowed to say
#     no (the KMV precedent): its exact baseline is L2 distance (not
#     cosine, different ground-truth set), and its row shape carries
#     TWO variants per row (adc raw + shortlist-reranked), so
#     reproducing it from a tall method-tagged composite needs a
#     two-row pivot, which is outside the projection/filter line the
#     merge criterion draws. It stays individually registered.
# Both original functions keep their pytest coverage; the projections
# pin lives in tests/test_plans.py::test_ann_recall_report_projections.


def ann_recall_report(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k of BOTH bucketed ANN paths (IVF probes, LSH tables)
    against the ONE exact brute-force cosine top-k, method-tagged —
    filters ``method = 'ivf'`` / ``method = 'lsh'`` reproduce the two
    pre-merge driver rows (modulo the unified ``recall`` column name).

    Plan shape (100 TB): the exact baseline is the 5-query broadcast
    nested loop (query-count-sized, never corpus²) computed once; each
    method side joins a TOP_K·|queries|-row set against it — both
    joins broadcastable, no shuffle grows with the corpus."""
    exact = sim_topk_cosine(spark, sf).select("q_id", "vec_id")
    ks = exact.groupBy("q_id").agg(F.count("*").alias("k"))
    sides = []
    for method, pipeline in (("ivf", sim_ann_ivf), ("lsh", sim_ann_lsh)):
        hits = (
            exact.join(
                pipeline(spark, sf).select("q_id", "vec_id"),
                ["q_id", "vec_id"],
            )
            .groupBy("q_id")
            .agg(F.count("*").alias("n_hits"))
        )
        sides.append(
            ks.join(hits, "q_id", "left").select(
                F.lit(method).alias("method"),
                "q_id",
                "k",
                F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
                F.round(
                    F.coalesce("n_hits", F.lit(0)) / F.col("k"), 4
                ).alias("recall"),
            )
        )
    return sides[0].unionByName(sides[1]).orderBy("method", "q_id")


def _recall_report_sql() -> str:
    # the two pre-merge oracles verbatim as method-tagged subqueries
    # (one source of truth for each pipeline's SQL text) — DuckDB
    # supports WITH inside a parenthesized subquery
    ivf = ANN_RECALL_SQL.rsplit("ORDER BY q_id", 1)[0]
    lsh = ANN_RECALL_LSH_SQL.rsplit("ORDER BY e.q_id", 1)[0]
    return f"""
SELECT 'ivf' AS method, q_id, k, n_hits, recall_at_k AS recall
FROM ({ivf})
UNION ALL
SELECT 'lsh' AS method, q_id, k, n_hits, recall
FROM ({lsh})
ORDER BY method, q_id"""


ANN_RECALL_REPORT_SQL = _recall_report_sql()

register("ext_ann_recall_report", ann_recall_report, ANN_RECALL_REPORT_SQL)


# --- per-label embedding outlier screen ---------------------------------------
# Registered round 14 (staged round 13: implemented + oracled + pytest
# parity + planted stress first, registered at the window rotation).

OUTLIER_TOP = 5  # outliers reported per label
_OUT_SCALE = PCA_SCALE  # the shared 10^4 embedding int grid


def embedding_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r14 window (see :func:`embedding_outliers_op`)."""
    return embedding_outliers_op(load_table(spark, sf, "embeddings"))


def embedding_outliers_op(emb: DataFrame) -> DataFrame:
    """Per-label embedding QC: the top-5 vectors farthest from their
    label's mean vector — the mislabeled/garbage screen every
    embedding-table consumer (SemDeDup cells, IVF training, ANN audits)
    runs before trusting the labels. Distance is to the label MEAN, the
    same artifact `ext_embedding_centroids` maintains. Complementary to
    `ext_embedding_norm` (which screens vector MAGNITUDE — zero/
    exploding norms): a unit-norm vector pointing the wrong way is
    invisible to the norm audit and is exactly what this one catches.

    Exactness: vectors quantize to the shared 10⁴ int grid
    (ext_embedding_quantize's recipe); with n vectors in the label and
    S_d = Σ q_d the per-dimension sums, the scaled squared distance

        D²(v) = Σ_d (n·q_d(v) − S_d)²  =  n²·‖v − mean‖²  (exact)

    accumulates in DECIMAL(38,0)/HUGEINT — ranking is by the EXACT
    integer D² (vec_id ascending on ties), and the one float each
    output row sees is round(√D² / (n·10⁴), 6) — the distance in
    embedding units, computed from the same exact integer on both
    engines.

    Plan shape (100 TB): one posexplode to corpus×64 long form, a
    (label, dim) partial-sum aggregate — |labels|·64 groups, broadcast
    back — one per-vector fold shuffle, and a per-label top-5 window
    (partial top-k per partition then merge; no full sort)."""
    q = emb.selectExpr(
        "vec_id",
        "label",
        f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)"
        f" * {_OUT_SCALE}) AS BIGINT)) AS q",
    )
    long = q.select(
        "vec_id", "label", F.posexplode("q").alias("dim", "qd")
    )
    sums = long.groupBy(
        F.col("label").alias("slabel"), F.col("dim").alias("sdim")
    ).agg(F.count("*").alias("n"), F.sum("qd").alias("sd"))
    d2 = (
        long.join(
            F.broadcast(sums),
            (F.col("label") == F.col("slabel"))
            & (F.col("dim") == F.col("sdim")),
        )
        .selectExpr(
            "vec_id",
            "label",
            "n",
            "(CAST(n AS DECIMAL(38,0)) * qd - sd) AS dev",
        )
        .groupBy("vec_id", "label")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.col("dev") * F.col("dev")).alias("d2"),
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.col("d2").desc(), F.col("vec_id").asc()
    )
    return (
        d2.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= OUTLIER_TOP)
        .selectExpr(
            "label",
            "rk",
            "vec_id",
            f"round(sqrt(CAST(d2 AS DOUBLE)) / (n * {_OUT_SCALE}.0d), 6)"
            " AS dist",
        )
        .orderBy("label", "rk")
    )


EMBEDDING_OUTLIERS_SQL = f"""WITH
qv AS (SELECT vec_id, label,
              list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * {_OUT_SCALE}) AS BIGINT))
                AS q
       FROM embeddings),
lng AS (SELECT vec_id, label, generate_subscripts(q, 1) - 1 AS dim,
               unnest(q) AS qd
        FROM qv),
sums AS (SELECT label, dim, count(*) AS n, CAST(sum(qd) AS BIGINT) AS sd
         FROM lng GROUP BY label, dim),
d2 AS (SELECT l.vec_id, l.label, max(s.n) AS n,
              sum((CAST(s.n AS HUGEINT) * l.qd - s.sd)
                  * (CAST(s.n AS HUGEINT) * l.qd - s.sd)) AS d2
       FROM lng l JOIN sums s ON l.label = s.label AND l.dim = s.dim
       GROUP BY l.vec_id, l.label),
ranked AS (SELECT label, vec_id, n, d2,
                  row_number() OVER (PARTITION BY label
                                     ORDER BY d2 DESC, vec_id ASC) AS rk
           FROM d2)
SELECT label, CAST(rk AS BIGINT) AS rk, vec_id,
       round(sqrt(CAST(d2 AS DOUBLE)) / (n * {_OUT_SCALE}.0), 6) AS dist
FROM ranked WHERE rk <= {OUTLIER_TOP}
ORDER BY label, rk"""


register("ext_embedding_outliers", embedding_outliers, EMBEDDING_OUTLIERS_SQL)


# --- label separability audit ---------------------------------------------------
# Registered round 15 (staged round 14 with the full discipline:
# implemented + oracled + pytest parity + planted stress first,
# registered at the window rotation).
#
# The label-LEVEL companion to `ext_embedding_outliers` (which screens
# individual vectors): per label, how TIGHT is the cluster (RMS
# distance to its own mean) and how FAR is the nearest other label's
# mean — the Davies-Bouldin-style "are these labels even separable?"
# screen run before trusting kNN/centroid classifiers or stratified
# dedup on the label column. A label whose nearest-centroid distance
# is UNDER its own within-RMS is a merge/mislabel candidate.


def label_separability(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r15 window (:func:`label_separability_op`)."""
    return label_separability_op(load_table(spark, sf, "embeddings"))


def label_separability_op(emb: DataFrame) -> DataFrame:
    """Per label: vector count, within-cluster RMS distance, the
    nearest other label and its centroid distance, and the
    separation ratio (nearest / within).

    Exactness: vectors quantize to the shared 10⁴ int grid; with
    S_ad = Σ q_d the per-dimension label sums,

        W_a        = Σ_v Σ_d (n_a·q_d(v) − S_ad)²        (exact)
        B_ab       = Σ_d (n_b·S_ad − n_a·S_bd)²           (exact)

    accumulate in DECIMAL(38,0)/HUGEINT; within_rms =
    round(√(W_a/n_a)/(n_a·10⁴), 6) and dist_ab =
    round(√B_ab/(n_a·n_b·10⁴), 6) are the only float expressions,
    identical shape in both engines. The nearest-label rank orders by
    the ALREADY-ROUNDED distance with label_b as the total-order
    tiebreak, so the argmin is hash-stable. The ratio divides two
    already-rounded doubles — again identical IEEE in both engines.

    Plan shape (100 TB): the per-(label, dim) sums are ONE partial
    aggregate over the posexploded corpus (|labels|·64 groups,
    broadcastable); W comes from the same per-vector fold as the
    outlier screen; the centroid pair table is |labels|² rows — a
    label-count-bounded grid, never a corpus-sized object. At extreme
    label cardinality (n·S products past DECIMAL(38,0)) round the
    centroids onto the 10⁴ grid first — the PCA scale-down recipe —
    and the pair table stays exact on the rounded grid.
    """
    q = emb.selectExpr(
        "vec_id",
        "label",
        f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)"
        f" * {_OUT_SCALE}) AS BIGINT)) AS q",
    )
    long = q.select("vec_id", "label", F.posexplode("q").alias("dim", "qd"))
    sums = long.groupBy(
        F.col("label").alias("slabel"), F.col("dim").alias("sdim")
    ).agg(F.count("*").alias("n"), F.sum("qd").alias("sd"))
    within = (
        long.join(
            F.broadcast(sums),
            (F.col("label") == F.col("slabel"))
            & (F.col("dim") == F.col("sdim")),
        )
        .selectExpr(
            "label",
            "n",
            "(CAST(n AS DECIMAL(38,0)) * qd - sd) AS dev",
        )
        .groupBy("label")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.col("dev") * F.col("dev")).alias("w"),
        )
        .selectExpr(
            "label",
            "n",
            # dev*dev is never NULL, so a NULL sum is EXACTLY non-ANSI
            # DECIMAL(38,0) overflow — where DuckDB's HUGEINT raises.
            # Raise here too (ADVICE r14) instead of silently emitting
            # NULL within_rms; the docstring's scale-down recipe is the
            # remedy at extreme n·qd magnitudes.
            "IF(w IS NULL, raise_error('label_separability: "
            "DECIMAL(38,0) overflow in the within-sum — round the "
            "centroids onto the quantized grid first (docstring "
            "recipe)'), "
            f"round(sqrt(CAST(w AS DOUBLE) / n) / (n * {_OUT_SCALE}.0d), 6))"
            " AS within_rms",
        )
    )
    ca = sums.selectExpr("slabel AS la", "sdim AS da", "n AS na", "sd AS sa")
    cb = sums.selectExpr("slabel AS lb", "sdim AS db", "n AS nb", "sd AS sb")
    dists = (
        ca.join(
            F.broadcast(cb),
            (F.col("da") == F.col("db")) & (F.col("la") != F.col("lb")),
        )
        .selectExpr(
            "la",
            "lb",
            "na",
            "nb",
            "(CAST(nb AS DECIMAL(38,0)) * sa"
            " - CAST(na AS DECIMAL(38,0)) * sb) AS dd",
        )
        .groupBy("la", "lb")
        .agg(
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
            F.sum(F.col("dd") * F.col("dd")).alias("b2"),
        )
        .selectExpr(
            "la",
            "lb",
            # same overflow-surfacing guard as the within-sum above
            "IF(b2 IS NULL, raise_error('label_separability: "
            "DECIMAL(38,0) overflow in the between-sum — round the "
            "centroids onto the quantized grid first (docstring "
            "recipe)'), "
            "round(sqrt(CAST(b2 AS DOUBLE))"
            f" / (CAST(na AS DOUBLE) * nb * {_OUT_SCALE}), 6)) AS dist",
        )
    )
    wnear = Window.partitionBy("la").orderBy(F.asc("dist"), F.asc("lb"))
    nearest = (
        dists.withColumn("rk", F.row_number().over(wnear))
        .where("rk = 1")
        .selectExpr("la", "lb AS nearest_label", "dist AS nearest_dist")
    )
    return (
        within.join(nearest, within.label == nearest.la)
        .selectExpr(
            "label",
            "n AS n_vecs",
            "within_rms",
            "nearest_label",
            "nearest_dist",
            "CASE WHEN within_rms > 0"
            " THEN round(nearest_dist / within_rms, 6)"
            " ELSE CAST(NULL AS DOUBLE) END AS separation_ratio",
        )
        .orderBy("label")
    )


LABEL_SEPARABILITY_SQL = f"""WITH
qv AS (SELECT vec_id, label,
              list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * {_OUT_SCALE}) AS BIGINT))
                AS q
       FROM embeddings),
lng AS (SELECT vec_id, label, generate_subscripts(q, 1) - 1 AS dim,
               unnest(q) AS qd
        FROM qv),
sums AS (SELECT label, dim, count(*) AS n, CAST(sum(qd) AS BIGINT) AS sd
         FROM lng GROUP BY label, dim),
w AS (SELECT l.label, max(s.n) AS n,
             sum((CAST(s.n AS HUGEINT) * l.qd - s.sd)
                 * (CAST(s.n AS HUGEINT) * l.qd - s.sd)) AS w2
      FROM lng l JOIN sums s ON l.label = s.label AND l.dim = s.dim
      GROUP BY l.label),
within AS (SELECT label, n,
                  round(sqrt(CAST(w2 AS DOUBLE) / n) / (n * {_OUT_SCALE}.0), 6)
                    AS within_rms
           FROM w),
dists AS (SELECT a.label AS la, b.label AS lb,
                 round(sqrt(CAST(sum((CAST(b.n AS HUGEINT) * a.sd
                                      - CAST(a.n AS HUGEINT) * b.sd)
                                     * (CAST(b.n AS HUGEINT) * a.sd
                                        - CAST(a.n AS HUGEINT) * b.sd))
                                 AS DOUBLE))
                       / (CAST(max(a.n) AS DOUBLE) * max(b.n)
                          * {_OUT_SCALE}), 6) AS dist
          FROM sums a JOIN sums b
            ON a.dim = b.dim AND a.label <> b.label
          GROUP BY a.label, b.label),
nearest AS (SELECT la, lb AS nearest_label, dist AS nearest_dist
            FROM (SELECT la, lb, dist,
                         row_number() OVER (PARTITION BY la
                                            ORDER BY dist, lb) AS rk
                  FROM dists)
            WHERE rk = 1)
SELECT w.label, w.n AS n_vecs, w.within_rms,
       n.nearest_label, n.nearest_dist,
       CASE WHEN w.within_rms > 0
            THEN round(n.nearest_dist / w.within_rms, 6)
            ELSE CAST(NULL AS DOUBLE) END AS separation_ratio
FROM within w JOIN nearest n ON w.label = n.la
ORDER BY w.label"""

# Registered round 15 (staged round 14: implemented + oracled + pytest
# parity incl. planted-cluster fixtures + 500k-vector stress +
# hash-matched at sf0.1 in the staged second-pass sweep).
register("ext_label_separability", label_separability, LABEL_SEPARABILITY_SQL)


# --- persisted IVF index (build once, query many) -------------------------------
# Production API in the `pq_encode_arrow`/`sem_dedup_blocked` pattern
# (the oracled `ext_sim_ann_ivf` row exists so DuckDB can replay the
# semantics; real deployments run THIS): the index outlives the session
# as two parquet tables, so queries pay only their probes — the
# FAISS-style build/query split, re-expressed as Spark partition
# pruning. Staged r15 as a library API (pytest + stress, no driver row
# — the registered IVF row already covers the semantics).


def build_ivf_index(emb: DataFrame, path: str, centroids) -> dict:
    """Build and persist the inverted-file index: postings parquet
    PARTITIONED BY cell (the directory layout IS the index — a probe
    prunes to n_probe directories, verified in the read plan) plus the
    centroid table. Assignment is the fp32 Arrow-matmul scan
    (`sem_dedup_blocked`'s zero-shuffle stage).

    ``emb``: (vec_id BIGINT, e ARRAY<DOUBLE>); ``centroids``: K×dim
    array-like (K ≈ √N per FAISS practice — centroids stay KB-to-MB
    broadcastable at any corpus size). Returns build stats."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float32)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(Cn)

    def assign(batches):
        Cw = bc.value
        for pdf in batches:
            X = np.vstack(pdf["e"].to_numpy()).astype(np.float32)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell": (Xn @ Cw.T).argmax(axis=1).astype("int64"),
                    "e": list(X.astype(np.float64)),
                }
            )

    from pyspark.sql import Observation

    obs = Observation()
    assigned = (
        emb.select("vec_id", "e")
        .mapInPandas(assign, "vec_id long, cell long, e array<double>")
        .observe(obs, F.count(F.lit(1)).alias("n"))
    )
    # repartition on cell BEFORE the partitioned write: each cell's rows
    # land in exactly one task, so the index is K files, not K × tasks
    # small files (measured 195 s → 14 s at 500k × 1024 cells — the
    # write was file-count-bound, not data-bound)
    assigned.repartition("cell").write.partitionBy("cell").mode(
        "errorifexists"
    ).parquet(f"{path}/postings")
    cent_rows = [(int(i), [float(x) for x in C[i]]) for i in range(len(C))]
    spark.createDataFrame(
        cent_rows, "cid long, ce array<double>"
    ).coalesce(1).write.mode("errorifexists").parquet(f"{path}/centroids")
    return {"n_vectors": obs.get["n"], "k_cells": int(len(C)), "path": path}


def ivf_index_query(
    spark: SparkSession,
    path: str,
    queries,
    n_probe: int = 4,
    topk: int = 5,
) -> DataFrame:
    """Probe the persisted index: per query the n_probe nearest cells
    (computed driver-side against the K-row centroid table — KBs), then
    ONE pruned scan of those posting partitions, a broadcast join of
    the query vectors, and an exact fp64 cosine top-k re-rank per
    query. Cost per query ≈ n_probe·N/K candidate rows; the corpus
    outside the probed cells is never read (PartitionFilters — pinned
    in tests).

    ``queries``: iterable of (query_id, vector). Returns
    (query_id, rank, vec_id, cos) with rank 1..topk by (cos DESC,
    vec_id ASC)."""
    import numpy as np

    cent = spark.read.parquet(f"{path}/centroids").collect()
    C = np.zeros((len(cent), len(cent[0]["ce"])), dtype=np.float64)
    for r in cent:
        C[r["cid"]] = r["ce"]
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    qids, qvecs = [], []
    for qid, v in queries:
        qids.append(int(qid))
        qvecs.append(np.asarray(v, dtype=np.float64))
    Q = np.vstack(qvecs)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Qn @ Cn.T
    probe_rows = []
    for i, qid in enumerate(qids):
        # deterministic probe order: cos DESC, cid ASC
        order = np.lexsort((np.arange(sims.shape[1]), -sims[i]))[:n_probe]
        for c in order:
            probe_rows.append((qid, int(c)))
    cells = sorted({c for _, c in probe_rows})
    probes = spark.createDataFrame(probe_rows, "query_id long, cell long")
    qdf = spark.createDataFrame(
        [(qid, [float(x) for x in Q[i]]) for i, qid in enumerate(qids)],
        "query_id long, q array<double>",
    )
    posts = spark.read.parquet(f"{path}/postings").where(
        F.col("cell").isin([int(c) for c in cells])
    )
    cand = posts.join(F.broadcast(probes), "cell").join(
        F.broadcast(qdf), "query_id"
    )
    dot = _DOT.format(a="e", b="q")
    na = _DOT.format(a="e", b="e")
    nb = _DOT.format(a="q", b="q")
    scored = cand.selectExpr(
        "query_id",
        "vec_id",
        f"({dot}) / (sqrt({na}) * sqrt({nb})) AS cos",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", "rank", "vec_id", "cos")
        .orderBy("query_id", "rank")
    )
