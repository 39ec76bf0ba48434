"""SparkSession construction and runtime conf enforcement.

The correctness driver constructs its own SparkSession and hands it to the
query callables, so every conf the engine depends on must be *runtime*
settable and is (re-)applied via :func:`ensure_runtime_confs` at the top of
each query. ``get_spark`` is used by our own tests and ``bench.py``.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

#: Confs the engine semantics depend on; all runtime-settable.
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic wall-clock semantics: all timestamps interpreted in UTC.
    "spark.sql.session.timeZone": "UTC",
    # events.parquet carries TIMESTAMP(NANOS). Builds honoring this legacy
    # conf surface it as raw int64 nanos; newer builds ignore it and read
    # TIMESTAMP_NTZ floored to µs. model.measurements() handles both (the
    # engine-wide rule stays: time is int64 ms, ns→ms floor, matching
    # DuckDB epoch_ms()).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow transfer for any pandas interchange / pandas UDFs.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Runtime re-planning: partition coalescing, skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the confs the engine requires to an externally-built session."""
    for key, value in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:
            # Non-settable in some deployment: leave it; plans still run,
            # only ns-parquet reads would fail and that surfaces loudly.
            pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make ``dariadb_spark`` importable on executor Python workers.

    Pandas-UDF closures are pickled by reference to this module, so the
    workers must be able to import it — true on a cluster and equally on
    an externally-built local session whose cwd is not the repo root.
    ``addPyFile`` distributes a zip of the package and prepends it to the
    workers' (and driver's) import path; done once per SparkContext.
    """
    sc = spark.sparkContext
    if getattr(sc, "_dariadb_pkg_shipped", False):
        return
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"dariadb_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        "dariadb_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    try:
        sc.addPyFile(zip_path)
        sc._dariadb_pkg_shipped = True
    except Exception:
        pass  # already added under this name, or restricted deployment


def get_spark(
    app_name: str = "dariadb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local session sized from env (bench/tests entry point).

    On a real cluster none of the sizing below applies — the engine is pure
    DataFrame plans and inherits whatever the cluster provides; AQE picks
    post-shuffle parallelism at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    return ensure_runtime_confs(builder.getOrCreate())
