"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with its
DuckDB oracle twin (see etl_healthcare_spark/plans/registry.py — conventions
for cross-engine determinism are documented there).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_healthcare_spark.plans.registry import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: patient lab-timeline summary — ingest the events stream as
    observations, compute the true latest observation per (tenant, patient,
    code) with a star-join enrichment (SURVEY §7.4)."""
    from etl_healthcare_spark.plans.registry import q3_latest_observation

    return q3_latest_observation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
