"""S1 + P1: LabX CSV source -> Observation DTO.

Reference: libs/adapters/csv/labx.ts:5-24 — csv-parse with
``columns:true, skip_empty_lines:true, trim:true`` (labx.ts:6), per-row
projection of (patientId, code, value, unit, effectiveDateTime), Number() cast
of value (labx.ts:14), sourceSystem "csv:labx" (labx.ts:16), sha256 ingestHash
of the serialized row (labx.ts:18), schemaVersion 1 (labx.ts:11).

Spark-first: one declarative read + one select; Catalyst prunes columns and
pushes the header/trim handling into the CSV reader.  No per-row loop — the
reference's for-row loop (labx.ts:9) IS the DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import row_hash

SOURCE_SYSTEM = "csv:labx"


def read_labx_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: header row, trimmed fields, empty lines skipped."""
    return (
        spark.read.option("header", True)
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def labx_rows_to_dto(df: DataFrame) -> DataFrame:
    """P1: project + cast + stamp.  Works on any DataFrame with the labx
    columns (from the CSV reader or an inline fixture DataFrame)."""
    return df.select(
        F.lit(1).alias("schemaVersion"),
        F.trim(F.col("patientId")).cast("string").alias("patientId"),
        F.trim(F.col("code")).cast("string").alias("code"),
        F.trim(F.col("value")).try_cast("double").alias("value"),
        F.lit(None).cast("string").alias("valueString"),
        F.trim(F.col("unit")).cast("string").alias("unit"),
        F.try_to_timestamp(F.trim(F.col("effectiveDateTime"))).alias("effectiveDateTime"),
        F.lit(SOURCE_SYSTEM).alias("sourceSystem"),
        row_hash(
            F.trim(F.col("patientId")),
            F.trim(F.col("code")),
            F.trim(F.col("value")),
            F.trim(F.col("unit")),
            F.trim(F.col("effectiveDateTime")),
        ).alias("ingestHash"),
    )


def parse_labx_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 + P1 composed: the adapter-registry entry for content type text/csv."""
    return labx_rows_to_dto(read_labx_csv(spark, path))
