"""S8 + S9: partitioned JSONL audit sink and partition-prefix listing.

Reference: services/audit/src/handler.ts:9-24 — append-only JSONL under
``tenantId=<id>/date=YYYY-MM-DD/hour=HH/``; line shape {at, type, tenantId,
traceId, payload}.  services/audit-list-api/src/handler.ts:28-62 — prefix
listing with tenant guard, cap 500.

Spark-first: Hive-style partitionBy on write; reads prune partitions from the
path predicates for free.  The hour column is zero-padded text exactly like
the reference's ``String(hour).padStart(2,'0')`` (audit handler :12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def audit_lines(events: DataFrame, event_type_col: str = "type") -> DataFrame:
    """Stamp partition columns from the `at` timestamp column."""
    return events.withColumn("date", F.date_format("at", "yyyy-MM-dd")).withColumn(
        "hour", F.lpad(F.hour("at").cast("string"), 2, "0")
    )


def append_audit(events: DataFrame, audit_dir: str) -> None:
    """S8: append-only partitioned JSONL."""
    (
        audit_lines(events)
        .write.mode("append")
        .partitionBy("tenantId", "date", "hour")
        .json(audit_dir)
    )


def list_audit(
    spark: SparkSession, audit_dir: str, tenant_id: str, date: str | None = None, limit: int = 100
) -> DataFrame:
    """S9/Q4: tenant-scoped listing; limit clamped 1..500
    (audit-list-api/src/handler.ts:28).  The tenant/date predicates become
    partition pruning — only the matching directories are listed/read."""
    limit = max(1, min(500, limit))
    df = spark.read.json(audit_dir)
    # partition-column type inference reads hour=09 back as int 9; restore the
    # reference's zero-padded form (audit handler :12 padStart)
    df = df.withColumn("hour", F.lpad(F.col("hour").cast("string"), 2, "0"))
    df = df.where(F.col("tenantId") == tenant_id)
    if date is not None:
        df = df.where(F.col("date") == date)
    return df.withColumn("file", F.input_file_name()).orderBy("at").limit(limit)


def last_audit_write(spark: SparkSession, audit_dir: str, tenant_id: str) -> DataFrame:
    """O5: newest audit line for a tenant (health-api handler :42-56)."""
    df = spark.read.json(audit_dir).where(F.col("tenantId") == tenant_id)
    return df.orderBy(F.col("at").desc()).limit(1)
