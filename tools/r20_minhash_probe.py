"""VERDICT r19 item 8: profile ext_minhash_jaccard_est subtree by
subtree (noop-sink timing per guide §1.4) to locate the cost before
deciding whether the 64-permutation signature build should become an
Arrow-batched pass (guide §4).

    python tools/r20_minhash_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dariadb_spark.ext.dedup import (  # noqa: E402
    _bands_from_sig,
    _minhash_sig,
)
from dariadb_spark.ext.shingles import _shingled  # noqa: E402
from dariadb_spark.model import load_table  # noqa: E402
from dariadb_spark.registry import REGISTRY  # noqa: E402
from dariadb_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, mk, reps):
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"minhash probe: {label}")
        t0 = time.perf_counter()
        noop(mk())
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"  {label:34s} best-of-{reps} {best:.3f}s", flush=True)
    return best


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("r20-minhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["ext_minhash_jaccard_est"].fn(
        spark, "/root/testdata/sf0.001"
    ).count()  # warm

    docs = load_table(spark, sf, "documents")
    sh = _shingled(docs)

    def full():
        return REGISTRY["ext_minhash_jaccard_est"].fn(spark, sf)

    def shingle_scan():
        return sh

    def hashed():
        return sh.select(
            "doc_id", F.explode("shingles").alias("s")
        ).selectExpr("doc_id", "xxhash64(s) AS h")

    def signature():
        return _minhash_sig(sh)

    def bands():
        return _bands_from_sig(_minhash_sig(sh))[0]

    def cand():
        b, key = _bands_from_sig(_minhash_sig(sh))
        return (
            b.withColumnRenamed("doc_id", "doc_a")
            .join(b.withColumnRenamed("doc_id", "doc_b"), key)
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .dropDuplicates(["doc_a", "doc_b"])
        )

    timed(spark, "full query (count action)",
          lambda: full(), reps)
    timed(spark, "shingle projection", shingle_scan, reps)
    timed(spark, "exploded + hashed", hashed, reps)
    timed(spark, "signature (64 min aggs)", signature, reps)
    timed(spark, "bands (sig + explode)", bands, reps)
    timed(spark, "LSH candidates", cand, reps)
    spark.stop()


if __name__ == "__main__":
    main()
