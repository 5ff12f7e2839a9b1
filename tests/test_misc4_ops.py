"""Unit tests for the round-4 cross-module trio: chi-square independence,
blocking-scheme quality, and unit harmonization — planted inputs vs
brute-force pure-Python models."""

import datetime

from etl_healthcare_spark.plans.registry import REGISTRY


def test_chi2_independence_matches_brute_force(spark, tmp_path):
    rows = []
    k = 0
    # planted 2x2-ish table with clear association: HIGH skews to O
    for prio, status, cnt in [
        ("HIGH", "O", 30),
        ("HIGH", "F", 10),
        ("LOW", "O", 10),
        ("LOW", "F", 30),
    ]:
        for _ in range(cnt):
            rows.append((k, prio, status))
            k += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_orderstatus string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        (r.prio, r.status): r
        for r in REGISTRY["stat_chi2_independence"].fn(spark, str(tmp_path)).collect()
    }
    n = 80
    rtot = {"HIGH": 40, "LOW": 40}
    ctot = {"O": 40, "F": 40}
    obs = {("HIGH", "O"): 30, ("HIGH", "F"): 10, ("LOW", "O"): 10, ("LOW", "F"): 30}
    assert set(out) == set(obs)
    chi2 = 0
    for (p, s), o in obs.items():
        r = out[(p, s)]
        assert (r.observed, r.row_total, r.col_total) == (o, rtot[p], ctot[s])
        assert r.expected_x1e6 == rtot[p] * ctot[s] * 10**6 // n
        num = (n * o - rtot[p] * ctot[s]) ** 2
        assert r.chi2_term_x1e6 == num * 10**6 // (n * rtot[p] * ctot[s])
        chi2 += r.chi2_term_x1e6
    # the planted association is strong: X^2 = sum (n*O-RC)^2/(nRC) = 20
    assert chi2 == 20_000_000


def test_blocking_quality_covers_exact_dups(spark, tmp_path):
    # 3 copies of text A, 2 copies of text B, 3 distinct texts ->
    # gold pairs = 3 + 1 = 4; identical docs share every LSH band,
    # so with no mega-bucket cap hit all gold pairs are covered
    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta",
        2: "alpha beta gamma delta epsilon zeta eta theta",
        3: "alpha beta gamma delta epsilon zeta eta theta",
        4: "one two three four five six seven eight nine",
        5: "one two three four five six seven eight nine",
        6: "completely different words in this document here",
        7: "yet another unrelated body of text lives here",
        8: "the final unique document closes the tiny corpus",
    }
    spark.createDataFrame(list(texts.items()), "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    [r] = REGISTRY["link_blocking_quality"].fn(spark, str(tmp_path)).collect()
    assert r.n_docs == 8
    assert r.total_pairs == 28
    assert r.n_gold_pairs == 4
    assert r.n_gold_covered == 4
    assert r.pair_completeness_ppm == 10**6
    assert r.n_candidate_pairs >= 4
    assert r.reduction_ratio_ppm == (28 - r.n_candidate_pairs) * 10**6 // 28


def test_unit_normalize_exact_factors(spark, tmp_path):
    # code length % 3 selects the unit; values convert with exact rationals
    ts = datetime.datetime(2024, 5, 1, 10, 0, 0)
    rows = [
        # len("abc")=3 -> mmol_l: norm = cents * 1e4
        (0, ts, 7, "abc", 1.23, "{}"),
        (1, ts, 7, "abc", 2.00, "{}"),
        # len("abcd")=4 -> mg_dl: norm = cents * 1e7 // 18016
        (2, ts, 7, "abcd", 90.00, "{}"),
        # len("abcde")=5 -> g_l: norm = cents * 1e10 // 18016
        (3, ts, 7, "abcde", 1.00, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {(r.code, r.unit): r for r in REGISTRY["p14_unit_normalize"].fn(spark, str(tmp_path)).collect()}
    assert set(out) == {("abc", "mmol_l"), ("abcd", "mg_dl"), ("abcde", "g_l")}
    mmol = out[("abc", "mmol_l")]
    assert mmol.n == 2
    assert mmol.min_norm_micro == 123 * 10**4
    assert mmol.max_norm_micro == 200 * 10**4
    assert mmol.sum_norm_micro == (123 + 200) * 10**4
    mg = out[("abcd", "mg_dl")]
    # 90 mg/dL of glucose = 4.995... mmol/L -> exact floor arithmetic
    assert mg.sum_norm_micro == 9000 * 10**7 // 18016 == 4995559
    gl = out[("abcde", "g_l")]
    # 1.00 g/L = 100 mg/dL = 5.55 mmol/L
    assert gl.sum_norm_micro == 100 * 10**9 // 18016
    assert 5_000_000 < gl.sum_norm_micro < 6_000_000


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF walk
# ---------------------------------------------------------------------------


def _box(typ: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(body)) + typ + body


def _mvhd(timescale, duration) -> bytes:
    import struct

    return _box(
        b"mvhd",
        b"\x00" * 12 + struct.pack(">II", timescale, duration) + b"\x00" * 80,
    )


def test_mp4_walk_roundtrip(spark, tmp_path):
    from etl_healthcare_spark.operators.multimodal import mp4_container_info, synth_mp4
    from pyspark.sql import functions as F

    df = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    d = F.col("doc_id")
    media = df.select(
        "doc_id",
        synth_mp4(
            F.lit(1000) + d, F.lit(5000) + d * 7, F.lit(1) + d % 2,
            F.lit(320) + d, F.lit(240) + d, d % 16
        ).alias("payload"),
    )
    out = {r.id: r for r in mp4_container_info(media, "doc_id", "payload").collect()}
    for i in range(10):
        r = out[i]
        assert r.brand == "isom"
        assert (r.timescale, r.duration) == (1000 + i, 5000 + 7 * i)
        assert (r.track_id, r.width, r.height) == (1 + i % 2, 320 + i, 240 + i)
        assert (r.n_top_boxes, r.mdat_bytes) == (3, i % 16)


def test_mp4_walker_largesize_and_eof_boxes():
    import struct

    from etl_healthcare_spark.operators.multimodal import mp4_info

    ftyp = _box(b"ftyp", b"isom" + b"\x00" * 4 + b"isom")
    moov = _box(b"moov", _mvhd(90000, 12345))
    # mdat with 64-bit largesize layout: size field == 1, real size follows
    payload = b"\xab" * 5
    mdat1 = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    # trailing to-EOF box: size field == 0 runs to end of file
    mdat2 = struct.pack(">I", 0) + b"mdat" + b"\xcd" * 9
    info = mp4_info(ftyp + moov + mdat1 + mdat2)
    assert info is not None
    brand, timescale, duration, track_id, width, height, n_top, mdat_bytes = info
    assert (brand, timescale, duration) == ("isom", 90000, 12345)
    assert track_id is None and width is None  # no trak in this file
    assert n_top == 4
    assert mdat_bytes == 5 + 9


def test_mp4_walker_rejects_corrupt():
    from etl_healthcare_spark.operators.multimodal import mp4_info

    assert mp4_info(None) is None
    assert mp4_info(b"not an mp4 at all") is None
    assert mp4_info(b"\x00\x00\x00\x18ftypisom") is None  # truncated
    # a box whose size overruns the buffer must reject, not overread
    bad = _box(b"ftyp", b"isom\x00\x00\x00\x00isom") + b"\x00\x00\xff\xffmoov"
    assert mp4_info(bad) is None


# ---------------------------------------------------------------------------
# ZIP trailer-directed walk
# ---------------------------------------------------------------------------


def test_zip_walk_roundtrip_and_python_zipfile_agrees(spark):
    """The synthesized archives must be REAL zips: python's zipfile module
    opens them and agrees with the walker on every field."""
    import io as _io
    import zipfile

    from pyspark.sql import functions as F

    from etl_healthcare_spark.operators.multimodal import synth_zip, zip_central_dir

    df = spark.range(0, 9).select(F.col("id").alias("doc_id"))
    d = F.col("doc_id")
    media = df.select("doc_id", synth_zip(d, (F.lit(1) + d % 3).cast("int")).alias("payload"))
    payloads = {r.doc_id: bytes(r.payload) for r in media.collect()}
    out = {r.id: r for r in zip_central_dir(media, "doc_id", "payload").collect()}
    for i in range(9):
        n = 1 + i % 3
        r = out[i]
        assert r.n_entries == n
        assert r.sum_usize == sum(4 + (i + j) % 8 for j in range(n))
        assert r.first_name == "f0" and r.last_name == f"f{n - 1}"
        # independent reference parser: python zipfile
        zf = zipfile.ZipFile(_io.BytesIO(payloads[i]))
        infos = zf.infolist()
        assert [zi.filename for zi in infos] == [f"f{j}" for j in range(n)]
        assert sum(zi.file_size for zi in infos) == r.sum_usize
        # stored entries round-trip their payload bytes
        assert len(zf.read("f0")) == 4 + i % 8


def test_zip_walker_rejects_corrupt():
    from etl_healthcare_spark.operators.multimodal import zip_info

    assert zip_info(None) is None
    assert zip_info(b"PK\x03\x04 not a full zip") is None
    assert zip_info(b"\x00" * 100) is None
    # EOCD present but CD offset points past the buffer -> reject
    import struct

    bad = b"PK\x05\x06" + b"\x00" * 4 + struct.pack("<HHII", 1, 1, 46, 9999) + b"\x00\x00"
    assert zip_info(bad) is None
