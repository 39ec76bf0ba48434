"""dariadb_spark — a PySpark-native analytics engine with the query surface
of lysevi/dariadb (an embeddable numeric time-series storage engine), plus
large-scale data-pipeline extensions (dedup, similarity search, text
analysis, multimodal columns).

Design (see SURVEY.md):
  * the unit of data is the dariadb measurement
    ``Meas {id, time, value, flag}`` (reference: libdariadb/meas.h,
    struct Meas) modeled as a DataFrame with schema
    ``(id BIGINT, time BIGINT /*epoch ms*/, value DOUBLE, flag BIGINT)``;
  * every reference verb (readInterval, readTimePoint, currentValue,
    minMaxTime, stat, statistic functions, subscribe, eraseOld, compact)
    is a declarative DataFrame plan — Catalyst/Tungsten pick the physical
    strategy; no hand-rolled execution;
  * times are int64 epoch-milliseconds everywhere, matching the
    reference's ``Time`` type (libdariadb/meas.h: Time = int64_t ms).
"""

from dariadb_spark.engine import TsEngine
from dariadb_spark.model import (
    FLAGS_NO_DATA,
    MEAS_FIELDS,
    load_table,
    measurements,
)
from dariadb_spark.net import TsClient, TsServer
from dariadb_spark.scheme import ConcurrentCatalogWriteError
from dariadb_spark.session import ensure_runtime_confs, get_spark

__all__ = [
    "TsEngine",
    "TsServer",
    "TsClient",
    "FLAGS_NO_DATA",
    "MEAS_FIELDS",
    "ConcurrentCatalogWriteError",
    "load_table",
    "measurements",
    "ensure_runtime_confs",
    "get_spark",
]

__version__ = "0.1.0"
