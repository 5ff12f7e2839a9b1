"""Content addressing / hashing helpers.

The reference stamps ``sha256:<hex>`` hashes on raw content
(services/ingest/handler.ts:25), CSV rows (libs/adapters/csv/labx.ts:18) and
HL7 lines (libs/adapters/hl7/v2.ts:80), and mints uuid/random trace ids
(ingest/handler.ts:19, normalize/handler.ts:25-27).  For oracle determinism
(SURVEY §7.3) trace ids are content-derived hashes, not uuid().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sha256_hex(col: Column) -> Column:
    return F.sha2(col.cast("string"), 256)


def content_hash(col: Column) -> Column:
    """``sha256:<hex>`` content address (ingest/handler.ts:25)."""
    return F.concat(F.lit("sha256:"), sha256_hex(col))


def row_hash(*cols: Column) -> Column:
    """Deterministic row ingestHash: sha256 of the comma-joined serialized row
    (labx.ts:18 hashes the serialized source row).  concat_ws keeps the exact
    same bytes constructible in ANSI SQL for the oracle."""
    return F.concat(F.lit("sha256:"), F.sha2(F.concat_ws(",", *cols), 256))


def trace_id(*cols: Column) -> Column:
    """Deterministic trace id (replaces Math.random of normalize/handler.ts:25-27)."""
    return F.substring(F.sha2(F.concat_ws("|", *cols), 256), 1, 16)
