"""Unit tests: corpus line dedup (CCNet pass) and integer-exact grouped
regression stats."""

from pyspark.sql import functions as F

from etl_healthcare_spark.operators.stats import grouped_regression
from etl_healthcare_spark.operators.textops import line_dedup_clean


def test_line_dedup_strips_frequent_lines_keeps_order(spark):
    boiler = "this line appears in many documents"
    docs = spark.createDataFrame(
        [
            (1, f"alpha first line one\n{boiler}\nunique tail 1"),
            (2, f"{boiler}\nbravo middle line two\nunique tail 2"),
            (3, "charlie only line three\nunique tail 3"),
        ],
        "doc_id long, t string",
    )
    out = {r["doc_id"]: r for r in line_dedup_clean(docs, "t", "doc_id").collect()}
    assert out[1]["clean_text"] == "alpha first line one\nunique tail 1"
    assert out[1]["n_dropped"] == 1 and out[1]["n_kept"] == 2
    assert out[2]["clean_text"] == "bravo middle line two\nunique tail 2"
    assert out[3]["clean_text"] == "charlie only line three\nunique tail 3"
    assert out[3]["n_dropped"] == 0


def test_line_dedup_short_lines_never_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "ok\nlong enough unique line a"), (2, "ok\nlong enough unique line b")],
        "doc_id long, t string",
    )
    out = {r["doc_id"]: r for r in line_dedup_clean(docs, "t", "doc_id").collect()}
    # "ok" is in both docs but below min_len — structural, kept
    assert out[1]["clean_text"].startswith("ok\n") and out[2]["n_dropped"] == 0


def test_grouped_regression_exact_linear(spark):
    rows = [("g", x, 2 * x + 3) for x in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    r = grouped_regression(df, F.col("x"), F.col("y"), ["grp"]).collect()[0]
    assert r["slope_sign"] == 1 and r["slope_abs_ppm"] == 2_000_000
    assert r["intercept_sign"] == 1 and r["intercept_abs"] == 3
    assert r["corr2_ppm"] == 1_000_000
    assert r["n"] == 4 and r["sum_x"] == 10 and r["sum_y"] == 26 + 6


def test_grouped_regression_negative_slope_and_constant_x(spark):
    rows = [("neg", x, -2 * x) for x in (1, 2, 3, 4)] + [("flat", 7, y) for y in (1, 5)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = {r["grp"]: r for r in grouped_regression(df, F.col("x"), F.col("y"), ["grp"]).collect()}
    assert out["neg"]["slope_sign"] == -1 and out["neg"]["slope_abs_ppm"] == 2_000_000
    assert out["neg"]["corr2_ppm"] == 1_000_000
    # constant x: zero variance -> guarded NULLs, not division errors
    assert out["flat"]["slope_abs_ppm"] is None and out["flat"]["corr2_ppm"] is None


def test_hll_merge_register_property(spark):
    from etl_healthcare_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
        merge_registers,
    )
    from pyspark.sql import functions as FF

    rows = [(f"s{i % 3}", f"item{i % 40}") for i in range(200)]
    df = spark.createDataFrame(rows, "shard string, item string")
    fine = hll_registers(df, "shard", "item")
    merged = merge_registers(fine, FF.lit("all"))
    direct = hll_registers(df.withColumn("g", FF.lit("all")), "g", "item")
    m = hll_estimate(merged).collect()[0]
    d = hll_estimate(direct).collect()[0]
    assert m["s_scaled"] == d["s_scaled"] and m["hll_estimate"] == d["hll_estimate"]


def test_shard_export_deterministic_and_offsets(spark):
    from etl_healthcare_spark.operators.sampling import shard_export

    df = spark.createDataFrame([(i, 10 + i) for i in range(50)], "doc_id long, ntok long")
    a = shard_export(df, "doc_id", "ntok", n_shards=4, salt="s").collect()
    b = shard_export(df, "doc_id", "ntok", n_shards=4, salt="s").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard = {}
    for r in sorted(a, key=lambda r: (r["shard"], r["pos"])):
        exp = by_shard.get(r["shard"], 0)
        assert r["token_offset"] == exp
        by_shard[r["shard"]] = exp + r["n_tokens"]
    assert {r["shard"] for r in a} <= set(range(4)) and len(a) == 50


def test_fuzzy_match_join_links_typos_to_catalog(spark):
    from etl_healthcare_spark.operators.linkage import fuzzy_match_join

    clean = spark.createDataFrame(
        [(1, "acme widgets inc"), (2, "bolt supply co"), (3, "zenith tooling ltd")],
        "cid long, cname string",
    )
    dirty = spark.createDataFrame(
        [(10, "acme widgets inx"), (20, "bolt supply co"), (30, "totally unrelated")],
        "did long, dname string",
    )
    out = {
        r["did"]: r
        for r in fuzzy_match_join(
            dirty, clean, "did", "dname", "cid", "cname", max_dist=2
        ).collect()
    }
    assert out[10]["match_id"] == 1 and out[10]["distance"] == 1
    assert out[20]["match_id"] == 2 and out[20]["distance"] == 0
    assert 30 not in out  # beyond max_dist -> absent, never a fabricated match


def test_apply_cdc_latest_wins_deletes_inserts(spark):
    from etl_healthcare_spark.operators.persist import apply_cdc

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, name string, bal long"
    )
    changes = spark.createDataFrame(
        [
            (1, 1, "U", "a", 11),
            (1, 2, "U", "a2", 12),  # latest wins
            (2, 1, "D", "", 0),
            (9, 1, "I", "new", 90),
        ],
        "k long, seq long, op string, name string, bal long",
    )
    out = {r["k"]: r for r in apply_cdc(base, changes, "k", "seq", "op", ["name", "bal"]).collect()}
    assert set(out) == {1, 3, 9}
    assert out[1]["name"] == "a2" and out[1]["bal"] == 12
    assert out[3]["bal"] == 30  # untouched passthrough
    assert out[9]["name"] == "new" and out[9]["bal"] == 90
