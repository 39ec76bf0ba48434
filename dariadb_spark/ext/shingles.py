"""Shared word-shingle helpers for dedup/text operators.

Word 3-gram shingles are produced with identical 0-based (Spark) vs
1-based (DuckDB) index arithmetic so the oracle sees the same shingle
sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NGRAM = 3


def _shingled(docs: DataFrame) -> DataFrame:
    """(doc_id, shingles ARRAY<STRING>) — distinct word 3-grams.

    Built from three shifted slices zipped pairwise, which stays LINEAR in
    token count: each ``split``/``slice`` evaluates O(1) times per row.
    (The tempting ``transform(sequence(...), i -> element_at(split(...),
    i))`` form is O(n²): projection collapse re-inlines the split into
    every element access.)
    """
    n = "size(split(text, ' '))"
    s = "split(text, ' ')"
    return docs.where(F.size(F.split(F.col("text"), " ")) >= NGRAM).selectExpr(
        "doc_id",
        "array_distinct(zip_with("
        f"zip_with(slice({s}, 1, {n} - 2), slice({s}, 2, {n} - 2), "
        "(x, y) -> concat(x, ' ', y)), "
        f"slice({s}, 3, {n} - 2), "
        "(xy, z) -> concat(xy, ' ', z))) AS shingles",
    )


_SHINGLE_CTE = """
t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS shingles
      FROM t WHERE len(w) >= 3)"""
