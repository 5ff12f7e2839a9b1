"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; the same settings are the ones we would
ship on a 1000-executor cluster:

* AQE on (runtime re-planning, skew-join splitting, small-partition coalescing)
  replaces any hand scheduling the reference did with SQS batching.
* ``spark.sql.shuffle.partitions`` sized to the parallelism of the local box;
  on a real cluster AQE coalesces from a deliberately-high initial number.
* Arrow enabled so the few Pandas-UDF code paths (multimodal decode) batch
  via Arrow instead of per-row pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "etl-healthcare-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # START exchanges wide and let AQE coalesce DOWN by bytes: under the
        # session's fixed 32 partitions, per-task state grows with the corpus
        # until it outruns execution memory — measured at sf27 as a
        # ShuffledHashJoin build-side failure ("Can't acquire 134217728
        # bytes", link_survivorship's 13.5M-row branch join; SCALE.md §49).
        # AQE only ever coalesces down, so the initial number is the
        # CEILING on per-task size safety; 8× cores keeps small workloads
        # coalesced back to a handful of tasks while giving corpus-scale
        # exchanges room to stay within ~advisory-size per task.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get(
                "SPARK_GRAFT_INITIAL_PARTITIONS",
                str(max(256, 8 * (int(cpus) if str(cpus).isdigit() else 32))),
            ),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # driver testdata writes TIMESTAMP(NANOS) parquet, which Spark cannot
        # map to TimestampType — read as long, convert in the loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # the local harness reads ONE parquet file per table, so the stock
        # 128 MB split would run a 50 MB-2 GB scan as 1-16 tasks and leave 32
        # cores idle on CPU-bound stages (regex, hashing).  A 16 MB split
        # restores the parallelism a real corpus has naturally from file
        # count; on a cluster, keep the default (override via env).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # managed (bucketed) tables land outside the repo checkout
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/etl_healthcare_spark_warehouse"),
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
