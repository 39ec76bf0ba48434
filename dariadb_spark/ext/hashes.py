"""Engine-agnostic 60-bit string hash — a LEAF module (no registry
import), so any ext module can import it without tripping the
ext ↔ registry import cycle (registry imports every ext module at its
tail; an ext module importing another *registry-importing* ext module
mid-cycle sees it partially initialized — the failure mode that hit
``import dariadb_spark.ext.dedup`` directly before this split).

The hash: low 15 hex digits of md5 parsed as an unsigned 60-bit integer
— the SAME value in Spark (``conv`` base 16 → 10) and DuckDB
(``'0x…'`` cast), verified value-for-value in tests. xxhash64 would
hash a few × faster at 100 TB but has no DuckDB twin; this keeps every
hash-derived pipeline (minhash/simhash candidates, CMS cells, KMV
ranks) fully mirrorable in the oracle. Swap for xxhash64 only if
oracle-independent throughput ever outweighs the checkable contract.
"""

from __future__ import annotations


def _h60_spark(col: str) -> str:
    return f"CAST(conv(substr(md5({col}), 1, 15), 16, 10) AS BIGINT)"


def _h60_duck(col: str) -> str:
    return f"CAST('0x' || substr(md5({col}), 1, 15) AS BIGINT)"
