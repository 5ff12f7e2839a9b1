"""Unit tests for the privacy & time-series-diagnostics batch: k-anonymity,
l-diversity, CUSUM changepoint, and the seasonality profile — planted inputs
checked against brute-force pure-Python models."""

import contextlib
import datetime
import io

from etl_healthcare_spark.plans.registry import REGISTRY


def _plant_customers(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_acctbal double, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))


def test_k_anonymity_buckets(spark, tmp_path):
    rows = []
    k = 0
    # group A (nation 1, seg X, band 1): 1 member -> k=1
    rows.append((k, 1, 1500.00, "X")); k += 1
    # group B (nation 1, seg X, band 2): 3 members -> k=2-4
    for _ in range(3):
        rows.append((k, 1, 2500.00, "X")); k += 1
    # group C (nation 2, seg Y, band 0): 7 members -> k=5-9
    for _ in range(7):
        rows.append((k, 2, 500.00, "Y")); k += 1
    # group D (nation 3, seg Z, band 0): 12 members -> k>=10
    for _ in range(12):
        rows.append((k, 3, 900.00, "Z")); k += 1
    _plant_customers(spark, tmp_path, rows)
    out = {r.k_bucket: r for r in REGISTRY["privacy_k_anonymity"].fn(spark, str(tmp_path)).collect()}
    assert set(out) == {"k=1", "k=2-4", "k=5-9", "k>=10"}
    n = len(rows)
    for bucket, (groups, members) in {
        "k=1": (1, 1), "k=2-4": (1, 3), "k=5-9": (1, 7), "k>=10": (1, 12)
    }.items():
        r = out[bucket]
        assert (r.n_groups, r.n_rows) == (groups, members)
        assert r.row_share_ppm == members * 10**6 // n
    assert out["k=1"].min_k == out["k=1"].max_k == 1


def test_l_diversity_homogeneous_group_disclosed(spark, tmp_path):
    rows = [
        # QI group (nation 1, band 1): all share segment X -> l=1, 3 rows disclosed
        (0, 1, 1500.00, "X"),
        (1, 1, 1500.00, "X"),
        (2, 1, 1200.00, "X"),
        # QI group (nation 2, band 1): two segments -> l=2
        (3, 2, 1500.00, "X"),
        (4, 2, 1500.00, "Y"),
        (5, 2, 1200.00, "Y"),
    ]
    _plant_customers(spark, tmp_path, rows)
    out = {r.l: r for r in REGISTRY["privacy_l_diversity"].fn(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2}
    assert (out[1].n_groups, out[1].n_rows, out[1].rows_disclosed) == (1, 3, 3)
    assert (out[2].n_groups, out[2].n_rows, out[2].rows_disclosed) == (1, 3, 0)
    assert out[1].row_share_ppm == 3 * 10**6 // 6


def test_cusum_finds_planted_level_shift(spark, tmp_path):
    # 10 days at 100.00/day, then 10 days at 200.00/day: the max-|cusum|
    # day is the last day of the low regime
    rows = []
    eid = 0
    for d in range(20):
        ts = datetime.datetime(2024, 1, 1 + d, 12, 0, 0)
        v = 100.0 if d < 10 else 200.0
        rows.append((eid, ts, v)); eid += 1
    spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, value double").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = sorted(
        REGISTRY["ts_cusum_changepoint"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r.day_us,
    )
    assert len(out) == 20
    xs = [10000] * 10 + [20000] * 10
    n, total = 20, sum(xs)
    cum = 0
    expect_flags = []
    nums = []
    for i, x in enumerate(xs, start=1):
        cum += x
        nums.append(n * cum - i * total)
    peak = max(abs(v) for v in nums)
    for r, x, num in zip(out, xs, nums):
        assert r.x_cents == x
        assert r.cusum_num == num
        assert r.is_changepoint == (1 if abs(num) == peak else 0)
    # the planted shift: argmax |cusum| is exactly day 10 (last low day)
    flagged = [i for i, r in enumerate(out) if r.is_changepoint]
    assert flagged == [9]


def test_seasonality_profile_indexes(spark, tmp_path):
    # two cells: (Thursday 1970-01-01 hour 6) x 3 events of 10.00 and
    # (Friday hour 18) x 1 event of 50.00
    rows = [
        (0, datetime.datetime(1970, 1, 1, 6, 0, 0), 10.0),
        (1, datetime.datetime(1970, 1, 1, 6, 30, 0), 10.0),
        (2, datetime.datetime(1970, 1, 1, 6, 59, 0), 10.0),
        (3, datetime.datetime(1970, 1, 2, 18, 0, 0), 50.0),
    ]
    spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, value double").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = {(r.dow, r.hr): r for r in REGISTRY["ts_seasonality_profile"].fn(spark, str(tmp_path)).collect()}
    # epoch day 0 = Thursday -> dow 4; day 1 = Friday -> dow 5
    assert set(out) == {(4, 6), (5, 18)}
    thu, fri = out[(4, 6)], out[(5, 18)]
    assert (thu.n, thu.sum_cents) == (3, 3000)
    assert (fri.n, fri.sum_cents) == (1, 5000)
    cells, tot_n, tot_sv = 2, 4, 8000
    assert thu.traffic_index_ppm == 3 * cells * 10**6 // tot_n
    assert fri.traffic_index_ppm == 1 * cells * 10**6 // tot_n
    assert thu.value_index_ppm == 3000 * tot_n * 10**6 // (3 * tot_sv)
    assert fri.value_index_ppm == 5000 * tot_n * 10**6 // (1 * tot_sv)


def test_privacy_batch_plan_shapes(spark):
    """Every query collapses the scan through a partial-aggregable groupBy
    before any window runs, and reads its table exactly once."""
    for name in (
        "privacy_k_anonymity",
        "privacy_l_diversity",
        "ts_cusum_changepoint",
        "ts_seasonality_profile",
    ):
        df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert plan.count("Location: InMemoryFileIndex") == 1, name
        tree = plan.split("\n\n")[0]
        lines = tree.splitlines()
        win = [i for i, l in enumerate(lines) if "Window" in l]
        agg = [i for i, l in enumerate(lines) if "HashAggregate" in l]
        if win:  # windows, where present, sit above the scan-side aggregate
            assert agg and max(agg) > min(win), name
