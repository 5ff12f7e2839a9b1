"""S5: raw landing sink — content-addressed, date-partitioned raw copies.

Reference: services/ingest/handler.ts:19-34 — raw payload copied to
``raw/<tenant>/<date>/<uuid>.json`` with a sha-256 content hash stamped in
metadata before anything is parsed (replay source for S11).

Spark-first: the uuid-per-object naming is an S3-ism; the engine's layout is
``partitionBy(tenantId, ingest_date)`` with the content hash as a column —
same replay/audit capability, but partition-prunable and idempotent (a
re-landed identical payload carries the same hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import content_hash


def land_raw(raw: DataFrame, landing_dir: str, content_col: str = "payload") -> None:
    """Stamp content hash + ingest date, append to the landing zone."""
    stamped = raw.withColumn("content_hash", content_hash(F.col(content_col))).withColumn(
        "ingest_date", F.date_format(F.current_timestamp(), "yyyy-MM-dd")
    )
    stamped.write.mode("append").partitionBy("tenantId", "ingest_date").json(landing_dir)


def read_landing(spark: SparkSession, landing_dir: str, tenant_id: str | None = None) -> DataFrame:
    """S11 replay source: deterministic re-read of landed raw payloads; the
    whole pipeline re-run is safe because the persist merge is idempotent
    (services/reprocess-prep/src/handler.ts:11-44 + U1)."""
    df = spark.read.json(landing_dir)
    if tenant_id is not None:
        df = df.where(F.col("tenantId") == tenant_id)
    return df


def read_binary_objects(spark: SparkSession, path_glob: str) -> DataFrame:
    """S3: whole-object fetch (the S3 GetObject -> Buffer step,
    services/normalize/handler.ts:29-35) as a distributed ``binaryFile``
    scan — one task per object, payload as BinaryType, object metadata
    (path/length/mtime) carried alongside for routing (P8 key sniffing)."""
    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select(
            F.col("path").alias("key"),
            F.col("length").alias("byte_len"),
            F.col("modificationTime").alias("mtime"),
            F.col("content").alias("payload"),
        )
    )
