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


def test_j11_store_is_write_once(spark):
    """The registered j11 query must not leak a new bucketed copy of both
    fact tables per invocation (round-8 fix: uuid-named mkdtemp leaked ~6 GB
    per probe run at sf9).  Same discipline as q2_partitioned_store: one
    content-keyed dir, reused across calls, stale keys wiped."""
    import glob
    import os
    import tempfile

    from etl_healthcare_spark.plans.registry import REGISTRY

    fn = REGISTRY["j11_bucketed_join"].fn
    r1 = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
    r2 = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
    assert r1 == r2 and len(r1) > 0
    # derive the root exactly as the product code does (a hardcoded /tmp
    # diverges whenever TMPDIR points elsewhere — round-8 ADVICE), and count
    # only THIS source's keys: other sf_dirs' stores legitimately coexist
    root = os.path.join(tempfile.gettempdir(), "etl_spark_bucketed_join")
    owned = []
    for kd in glob.glob(os.path.join(root, "*")):
        try:
            with open(os.path.join(kd, "_SF_DIR")) as fh:
                if fh.read() == os.path.abspath("/root/testdata/sf0.001"):
                    owned.append(kd)
        except OSError:
            pass
    assert len(owned) == 1
