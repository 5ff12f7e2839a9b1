"""Skew mitigation wiring (SCALE.md §4 as assertions): salted two-level
aggregation on a deliberately 100x-skewed key — correctness vs the unsalted
plan, and bounded per-reduce-task work for the hot key."""

from pyspark.sql import functions as F

from etl_healthcare_spark.operators.skew import salted_latest_per_group, salted_sum_count
from etl_healthcare_spark.plans.queries import latest_per_group

BUCKETS = 32


def _skewed(spark):
    # hot tenant with 100x the rows of each of 50 normal tenants
    hot = spark.range(20000).select(
        F.lit("hot").alias("tenantId"),
        (F.col("id") % 97).alias("code"),
        F.col("id").alias("event_id"),
        (F.col("id") * 2).cast("double").alias("value"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("id"))).alias("ts"),
    )
    cold = spark.range(10000).select(
        F.concat(F.lit("t"), F.col("id") % 50).alias("tenantId"),
        (F.col("id") % 97).alias("code"),
        (F.col("id") + 1_000_000).alias("event_id"),
        F.col("id").cast("double").alias("value"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("id"))).alias("ts"),
    )
    return hot.unionByName(cold)


def test_salted_sum_count_matches_unsalted_on_skewed_input(spark):
    df = _skewed(spark)
    plain = {
        (r.tenantId): (r.value_sum, r.n)
        for r in df.groupBy("tenantId").agg(F.sum("value").alias("value_sum"), F.count("*").alias("n")).collect()
    }
    salted = {
        (r.tenantId): (r.value_sum, r.n)
        for r in salted_sum_count(df, ["tenantId"], F.col("value"), F.col("event_id"), BUCKETS).collect()
    }
    assert salted == plain
    assert salted["hot"][1] == 20000


def test_salt_bounds_hot_key_reduce_work(spark):
    """The level-1 group sizes ARE the per-reduce-task combine work: unsalted,
    the hot key concentrates 20000 rows in one task; salted, its largest
    (key, salt) slice carries ~1/32 of that."""
    df = _skewed(spark)
    salt = F.pmod(F.xxhash64(F.col("event_id")), F.lit(BUCKETS)).alias("_salt")
    slice_sizes = (
        df.select("tenantId", salt)
        .groupBy("tenantId", "_salt")
        .count()
        .where(F.col("tenantId") == "hot")
        .collect()
    )
    assert len(slice_sizes) == BUCKETS  # the hot key fans across every bucket
    biggest = max(r["count"] for r in slice_sizes)
    assert biggest <= (20000 / BUCKETS) * 1.5  # ~625 +- hash variance, never 20000


def test_salted_latest_per_group_wires_q3_shape(spark):
    """G6/Q3 (latest observation per (tenant, code)) through the salted
    two-level max_by: identical rows to the direct plan on skewed input."""
    df = _skewed(spark)
    plain = {
        (r.tenantId, r.code): r.event_id
        for r in latest_per_group(df, ["tenantId", "code"], "ts").collect()
    }
    salted = {
        (r.tenantId, r.code): r.event_id
        for r in salted_latest_per_group(df, ["tenantId", "code"], "ts", F.col("event_id"), BUCKETS).collect()
    }
    assert salted == plain and len(salted) == 51 * 97


def test_salted_latest_total_under_ties(spark):
    """With duplicate timestamps in a group, the tiebreak column must make
    both the plain and salted variants pick the SAME row deterministically."""
    rows = [("t1", 1, i, float(i), "2024-01-01 00:00:00") for i in range(50)]
    df = spark.createDataFrame(
        rows, "tenantId string, code int, event_id long, value double, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    plain = latest_per_group(df, ["tenantId", "code"], "ts", tiebreak=["event_id"]).collect()
    salted = salted_latest_per_group(
        df, ["tenantId", "code"], "ts", F.col("event_id"), BUCKETS, tiebreak=["event_id"]
    ).collect()
    assert len(plain) == 1 and len(salted) == 1
    assert plain[0].event_id == 49 and salted[0].event_id == 49
