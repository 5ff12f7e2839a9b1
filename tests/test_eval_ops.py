"""Unit tests for the evaluation & feature-engineering batch: DICOM header
walk, multiplier-bootstrap replicates, out-of-fold target encoding, Benford
digit audit, and candidate-key discovery — planted inputs checked against
brute-force pure-Python models."""

import hashlib
import math

from pyspark.sql import functions as F

from etl_healthcare_spark.plans.registry import REGISTRY


# ---------------------------------------------------------------------------
# DICOM
# ---------------------------------------------------------------------------


def test_dicom_walk_roundtrip(spark):
    from etl_healthcare_spark.operators.multimodal import dicom_tags, synth_dicom

    df = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    d = F.col("doc_id")
    modality = F.element_at(
        F.array(F.lit("CT"), F.lit("MR"), F.lit("US"), F.lit("XA")), (d % 4 + 1).cast("int")
    )
    patient = F.concat(F.lit("P"), F.lpad(d.cast("string"), 7, "0"))
    media = df.select(
        "doc_id",
        synth_dicom(d, modality, patient, F.lit(64) + d % 192, F.lit(64) + (7 * d) % 192).alias(
            "payload"
        ),
    )
    out = {r.id: r for r in dicom_tags(media, "doc_id", "payload").collect()}
    assert len(out) == 12
    for i in range(12):
        r = out[i]
        assert r.modality == ["CT", "MR", "US", "XA"][i % 4]
        assert r.patient_id == "P" + str(i).zfill(7)
        assert r.n_rows == 64 + i % 192
        assert r.n_cols == 64 + (7 * i) % 192
        assert r.n_elements == 4


def test_dicom_rejects_corrupt(spark):
    from etl_healthcare_spark.operators.multimodal import dicom_tags

    rows = [(1, b"not a dicom"), (2, None), (3, b"\x00" * 127)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.id: r for r in dicom_tags(df, "doc_id", "payload").collect()}
    assert all(out[i].modality is None and out[i].n_rows is None for i in (1, 2, 3))


def test_dicom_long_form_vr_terminates_walk():
    import struct

    from etl_healthcare_spark.operators.multimodal import dicom_info

    def elem(g, e, vr, val):
        return struct.pack("<HH", g, e) + vr.encode() + struct.pack("<H", len(val)) + val

    b = (
        b"\x00" * 128
        + b"DICM"
        + elem(0x0008, 0x0060, "CS", b"CT")
        # OB uses the 4-byte length layout the short-form walker must NOT
        # misparse — it stops here instead of reading garbage
        + struct.pack("<HH", 0x7FE0, 0x0010)
        + b"OB\x00\x00"
        + struct.pack("<I", 4)
        + b"\x01\x02\x03\x04"
        + elem(0x0028, 0x0010, "US", struct.pack("<H", 99))
    )
    assert dicom_info(b) == ("CT", None, None, None, 1)


# ---------------------------------------------------------------------------
# multiplier bootstrap
# ---------------------------------------------------------------------------


def test_bootstrap_matches_brute_force(spark, tmp_path):
    vals = [(1, 1.25), (2, 7.5), (3, 0.03), (4, 12.0), (5, 3.33), (6, 99.99), (7, 0.5)]
    spark.createDataFrame(vals, "event_id long, value double").write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r.r: r for r in REGISTRY["stat_bootstrap_ci"].fn(spark, str(tmp_path)).collect()}
    xs = {i: math.floor(v * 100) for i, v in vals}
    n, total = len(xs), sum(xs.values())
    assert len(out) == 24
    for r in range(1, 25):
        eps = {
            i: (1 if hashlib.sha256(f"boot:{i}".encode()).hexdigest()[r - 1] in "13579bdf" else -1)
            for i in xs
        }
        e_sum = sum(eps.values())
        sx = sum(eps[i] * xs[i] for i in xs)
        row = out[r]
        assert (row.n, row.sum_cents) == (n, total)
        assert (row.e_sum, row.sx) == (e_sum, sx)
        assert row.dev_num == n * sx - total * e_sum


# ---------------------------------------------------------------------------
# out-of-fold target encoding
# ---------------------------------------------------------------------------


def test_target_encoding_is_leak_free(spark, tmp_path):
    rows = [
        # (orderkey, priority, price) — folds are orderkey % 5
        (0, "HIGH", 100.00),
        (1, "HIGH", 200.00),
        (2, "HIGH", 300.00),
        (5, "HIGH", 400.00),
        (3, "LOW", 50.00),
        (4, "LOW", 70.00),
        (8, "LOW", 90.00),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        (r.category, r.fold): r
        for r in REGISTRY["ml_target_encoding"].fn(spark, str(tmp_path)).collect()
    }
    cents = {k: int(p * 100) for k, _, p in rows}
    g_cnt, g_sum = len(rows), sum(cents.values())
    prior = g_sum // g_cnt
    m = 20
    for cat in ("HIGH", "LOW"):
        members = [(k, c) for (k, cc, _), c in zip(rows, cents.values()) if cc == cat]
        cat_cnt, cat_sum = len(members), sum(c for _, c in members)
        for fold in {k % 5 for k, _ in members}:
            in_fold = [(k, c) for k, c in members if k % 5 == fold]
            f_cnt, f_sum = len(in_fold), sum(c for _, c in in_fold)
            expect = (cat_sum - f_sum + m * prior) // (cat_cnt - f_cnt + m)
            row = out[(cat, fold)]
            assert row.n_in_fold == f_cnt and row.n_oof == cat_cnt - f_cnt
            assert row.prior_cents == prior
            assert row.enc_cents == expect
            # leak-freedom: the encoding never sees the fold's own rows —
            # shifting every in-fold target must leave enc_cents unchanged
            # (verified structurally by the complement subtraction above)


def test_target_encoding_unseen_fold_gets_prior_weighted_all_rows(spark, tmp_path):
    # a category entirely inside one fold: its encoding for that fold has
    # zero out-of-fold rows and must collapse to the prior
    rows = [(5, "ONLY", 500.00), (10, "ONLY", 700.00), (1, "OTHER", 100.00)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        (r.category, r.fold): r
        for r in REGISTRY["ml_target_encoding"].fn(spark, str(tmp_path)).collect()
    }
    prior = (50000 + 70000 + 10000) // 3
    r = out[("ONLY", 0)]
    assert r.n_oof == 0
    assert r.enc_cents == (0 + 20 * prior) // (0 + 20) == prior


# ---------------------------------------------------------------------------
# Benford audit
# ---------------------------------------------------------------------------


def test_benford_counts_and_chi2(spark, tmp_path):
    # prices with known leading cents-digits: 1xx, 1xx, 2xx, 9xx; 0 dropped
    rows = [(1, 1.00), (2, 1.99), (3, 2.50), (4, 9.99), (5, 0.00)]
    spark.createDataFrame(rows, "o_orderkey long, o_totalprice double").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    out = {r.digit: r for r in REGISTRY["profile_benford"].fn(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 9}
    assert out[1].n_obs == 2 and out[2].n_obs == 1 and out[9].n_obs == 1
    n = 4
    exp = {1: 301030, 2: 176091, 9: 45757}
    for d, row in out.items():
        assert row.obs_ppm == row.n_obs * 1_000_000 // n
        assert row.exp_ppm == exp[d]
        num = row.n_obs * 1_000_000 - n * exp[d]
        assert row.chi2_x1e6 == num * num // (n * exp[d])


# ---------------------------------------------------------------------------
# candidate keys
# ---------------------------------------------------------------------------


def test_candidate_keys_verdicts(spark, tmp_path):
    rows = [
        # (orderkey, linenumber, partkey, suppkey): (ok, ln) is a key;
        # ok repeats; (pk, sk) repeats once; sk repeats
        (1, 1, 10, 100),
        (1, 2, 11, 100),
        (2, 1, 10, 100),
        (3, 1, 12, 101),
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r.combo: r for r in REGISTRY["profile_candidate_keys"].fn(spark, str(tmp_path)).collect()}
    assert out["(l_orderkey, l_linenumber)"].is_key == 1
    assert out["(l_orderkey, l_linenumber)"].n_groups == 4
    ok = out["(l_orderkey)"]
    assert ok.is_key == 0 and ok.n_groups == 3 and ok.max_group_rows == 2
    pk = out["(l_partkey, l_suppkey)"]
    assert pk.is_key == 0 and pk.n_groups == 3 and pk.n_rows == 4
    sk = out["(l_suppkey)"]
    assert sk.is_key == 0 and sk.n_groups == 2 and sk.max_group_rows == 3


def test_candidate_keys_single_expand_plan(spark):
    import io

    df = REGISTRY["profile_candidate_keys"].fn(spark, "/root/testdata/sf0.001")
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Expand") >= 1
    # one wide aggregate over the expanded rows + the tiny per-gid reagg —
    # the lineitem scan itself must appear exactly once (one file index)
    assert plan.count("Location: InMemoryFileIndex") == 1
