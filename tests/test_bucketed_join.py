"""Bucketed co-located join: both sides bucketed on the key -> the join plans
with ZERO Exchange (the write paid the shuffle once; every later join is
free).  The 100 TB fact-to-fact join strategy of SCALE.md, held as a test."""

import contextlib
import io

from etl_healthcare_spark.operators.bucketing import write_bucketed


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(0, 50_000).selectExpr("id AS k", "id % 7 AS va")
    b = spark.range(0, 50_000).selectExpr("id AS k", "id % 13 AS vb")
    write_bucketed(a, "bt_fact_a", ["k"], buckets=8)
    write_bucketed(b, "bt_fact_b", ["k"], buckets=8)

    # force the join path (broadcast would hide the co-location)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bt_fact_a").join(spark.table("bt_fact_b"), "k")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan
        assert j.count() == 50_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_fact_a")
        spark.sql("DROP TABLE IF EXISTS bt_fact_b")
