"""Negative-timestamp (pre-1970) round-trips through the DECIMAL(38,0)
ts-packing decode (functions/packing.py) — the round-9 ADVICE defect: the
truncating ``div``/``%`` decode silently produced off-by-one timestamps and
garbage payloads for negative packed values.  The packing itself was always
order-isomorphic for negative timestamps; only the decode was wrong."""

from datetime import datetime

from pyspark.sql import functions as F

from etl_healthcare_spark.functions.packing import unpack_hi, unpack_lo
from etl_healthcare_spark.operators.sequences import m4_downsample


def test_unpack_round_trips_negative_and_positive_us(spark):
    K = 10**19
    rows = [(-1, 5), (-1, 2**63 - 1), (0, 0), (1, 7), (-10**15, 123), (10**15, 0)]
    df = spark.createDataFrame(rows, "us long, pid long")
    packed = df.select(
        "us", "pid",
        F.expr(f"CAST(us AS DECIMAL(38,0)) * {K} + pid").alias("p"),
    )
    out = packed.select(
        "us", "pid",
        unpack_hi("p", K).alias("hi"),
        unpack_lo("p", K).alias("lo"),
    ).collect()
    for r in out:
        assert (r.hi, r.lo) == (r.us, r.pid), f"decode mismatch at us={r.us}"


def test_packing_is_order_isomorphic_across_epoch(spark):
    K = 10**19
    rows = [(-2, 9), (-1, 0), (-1, 5), (0, 0), (0, 3), (1, 1)]
    df = spark.createDataFrame(rows, "us long, pid long")
    got = [
        (r.us, r.pid)
        for r in df.select("us", "pid", F.expr(f"CAST(us AS DECIMAL(38,0)) * {K} + pid").alias("p"))
        .orderBy("p")
        .collect()
    ]
    assert got == sorted(rows)


def test_m4_first_last_decode_pre_1970(spark):
    # two series points before the epoch: first/last must decode to the true
    # negative microsecond timestamps and true values
    rows = [
        ("s", datetime(1969, 12, 31, 23, 59, 59), 100),
        ("s", datetime(1969, 12, 31, 23, 59, 58), -200),
        ("s", datetime(1970, 1, 1, 0, 0, 1), 300),
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, cents long")
    out = m4_downsample(df, "series", "ts", "cents", "cents", 86_400_000_000).collect()
    by_bucket = {r.bucket: r for r in out}
    # the two pre-epoch rows and the post-epoch row share truncation bucket 0
    # (documented boundary convention, same as the DuckDB oracle's //)
    b0 = by_bucket[0]
    assert b0.t_first_us == -2_000_000 and b0.v_first_c == -200
    assert b0.t_last_us == 1_000_000 and b0.v_last_c == 300
    assert b0.v_min_c == -200 and b0.v_max_c == 300 and b0.n == 3
