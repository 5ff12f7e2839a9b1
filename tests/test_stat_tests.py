"""Unit tests for the nonparametric-statistics batch: exact KS, Mann-Whitney,
and the one-scan correlation matrix — planted samples checked against
brute-force pure-Python models."""

from pyspark.sql import functions as F

PPM = 1_000_000


def _ecdf_frame(spark, a_vals, b_vals, bucket_span=4):
    from etl_healthcare_spark.operators.stats import two_sample_ecdf

    rows = [(v, 1) for v in a_vals] + [(v, 0) for v in b_vals]
    df = spark.createDataFrame(rows, "v long, ia long")
    return two_sample_ecdf(df, "ia", "v", bucket_span=bucket_span)


def test_ecdf_cumulative_counts(spark):
    a = [1, 3, 3, 7]
    b = [2, 3, 9]
    out = {r.v: r for r in _ecdf_frame(spark, a, b).collect()}
    assert out[1].ca_cum == 1 and out[1].cb_cum == 0
    assert out[2].ca_cum == 1 and out[2].cb_cum == 1
    assert out[3].ca_cum == 3 and out[3].cb_cum == 2 and out[3].ca_v == 2
    assert out[7].ca_cum == 4 and out[7].cb_cum == 2
    assert out[9].ca_cum == 4 and out[9].cb_cum == 3
    # bucket_span=4 forces values into multiple buckets (1,2,3 | 7 | 9) so
    # the two-level prefix path is exercised, not just one window


def _brute_ks(a, b):
    import itertools

    na, nb = len(a), len(b)
    best = (0, None)
    for v in sorted(set(a) | set(b)):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        dn = abs(ca * nb - cb * na)
        if dn > best[0]:
            best = (dn, v)
    return best


def _brute_u2(a, b):
    u2 = 0
    for x in a:
        for y in b:
            if x > y:
                u2 += 2
            elif x == y:
                u2 += 1
    return u2


def test_ks_and_mwu_match_brute_force(spark):
    from etl_healthcare_spark.operators.stats import two_sample_ecdf

    a = [5, 5, 9, 12, 1, 7, 7]
    b = [2, 5, 8, 8, 13, 3]
    ecdf = _ecdf_frame(spark, a, b)
    tot = ecdf.agg(F.max("ca_cum").alias("na"), F.max("cb_cum").alias("nb"))
    d = ecdf.crossJoin(F.broadcast(tot)).select(
        "v",
        F.abs(F.col("ca_cum") * F.col("nb") - F.col("cb_cum") * F.col("na")).alias("dn"),
    )
    rows = {r.v: r.dn for r in d.collect()}
    bdn, bv = _brute_ks(a, b)
    assert max(rows.values()) == bdn
    assert min(v for v, dn in rows.items() if dn == bdn) == bv

    # Mann-Whitney: 2*R_A - nA(nA+1) == brute-force doubled pair count
    r = ecdf.select(
        "ca_v",
        ((F.col("ca_cum") + F.col("cb_cum")) - (F.col("ca_v") + F.col("cb_v"))).alias("c_before"),
        (F.col("ca_v") + F.col("cb_v")).alias("cnt"),
    )
    s = r.agg(F.sum(F.col("ca_v") * (2 * F.col("c_before") + F.col("cnt") + 1)).alias("r2_a")).collect()[0]
    na = len(a)
    assert s.r2_a - na * (na + 1) == _brute_u2(a, b)


def test_corr_matrix_signs_and_perfect_pairs(spark):
    from etl_healthcare_spark.plans.registry import REGISTRY

    # use the registry query at the smallest SF and sanity-check invariants
    rows = REGISTRY["stat_corr_matrix"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 6
    got = {(r.col_a, r.col_b): r for r in rows}
    assert set(got) == {
        ("qty", "price"), ("qty", "disc"), ("qty", "tax"),
        ("price", "disc"), ("price", "tax"), ("disc", "tax"),
    }
    for r in rows:
        assert 0 <= r.corr2_ppm <= PPM, r  # corr^2 in [0, 1]
        assert r.corr_sign in (-1, 0, 1)
