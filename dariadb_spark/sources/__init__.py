"""Storage sources/sinks (parquet-backed measurement store)."""

from dariadb_spark.sources.parquet_store import ParquetTsStore

__all__ = ["ParquetTsStore"]
