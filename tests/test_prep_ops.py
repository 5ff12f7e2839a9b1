"""Unit tests for the round-4 training-prep batch: novelty, token shards,
cluster weights, FK orphans, embedding drift, common neighbors, tolerance
as-of — planted inputs checked against brute-force pure-Python models."""

from datetime import datetime

from pyspark.sql import functions as F


def test_novelty_first_occurrence_rule(spark):
    from etl_healthcare_spark.operators.textops import novelty_scores

    rows = [
        (1, "a b c"),       # shingles(2): ab, bc — both first here
        (2, "a b x"),       # ab first seen in doc 1; bx first here
        (3, "a b c"),       # both spans first seen in doc 1 -> novelty 0
        (4, "q"),           # < k tokens -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in novelty_scores(df, "text", "doc_id", k=2).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_spans == 2 and out[1].n_first == 2 and out[1].novelty_ppm == 1_000_000
    assert out[2].n_spans == 2 and out[2].n_first == 1 and out[2].novelty_ppm == 500_000
    assert out[3].n_spans == 2 and out[3].n_first == 0 and out[3].novelty_ppm == 0


def test_token_shards_matches_global_cumsum(spark):
    from etl_healthcare_spark.operators.sampling import token_shards

    toks = {i: (i % 5) + 1 for i in range(20)}
    df = spark.createDataFrame(
        [(i, n) for i, n in toks.items()], "doc_id long, n long"
    )
    # bucket_span 3 exercises the two-level prefix path
    out = {
        r.id: r
        for r in token_shards(df, "doc_id", "n", budget=7, bucket_span=3).collect()
    }
    run = 0
    for i in sorted(toks):
        assert out[i].token_offset == run, i
        assert out[i].shard == run // 7, i
        run += toks[i]
    assert len(out) == 20


def test_cluster_weights_downweight_and_default(spark):
    from etl_healthcare_spark.operators.sampling import cluster_weights

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3)], "node long, cluster_id long"
    )
    out = {r.doc_id: r for r in cluster_weights(docs, clusters, "doc_id").collect()}
    assert out[0].cluster_size == 3 and out[0].weight_ppm == 333_333
    assert out[3].cluster_size == 2 and out[3].weight_ppm == 500_000
    assert out[5].cluster_size == 1 and out[5].weight_ppm == 1_000_000


def test_fk_orphans_counts_nulls_and_misses(spark):
    from etl_healthcare_spark.operators.profile import fk_orphans

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, 99), (5, None), (6, 20)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    (row,) = fk_orphans([("c->p", child, "fk", parent, "pk")]).collect()
    assert row.relation == "c->p"
    assert row.n_child_rows == 6
    assert row.n_orphan_rows == 3      # two 99s + one NULL
    assert row.n_orphan_keys == 1      # distinct non-null orphan keys: {99}


def test_embedding_drift_exact_ppm(spark):
    from etl_healthcare_spark.operators.profile import embedding_drift

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.5, 1.0], 0),
        (2, [0.0, 2.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.dim: r for r in embedding_drift(df, "embedding", "vec_id", F.col("label") == 0).collect()}
    # dim 0: side A (label=0) sums 1000+500=1500 over 2; side B 0 over 1
    assert (out[0].sum_a, out[0].n_a, out[0].sum_b, out[0].n_b) == (1500, 2, 0, 1)
    assert out[0].delta_ppm == (1500 * 1 - 0 * 2) * 1_000_000 // (2 * 1)
    # dim 1: A sums 0+1000, B 2000 -> delta (1000*1 - 2000*2)*1e6 div 2 = -1.5e9
    assert out[1].delta_ppm == -1_500_000_000


def test_common_neighbors_non_adjacent_pairs_and_hub_cap(spark):
    from etl_healthcare_spark.operators.graph import common_neighbors

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "a long, b long"
    )
    out = [(r.u, r.v, r.n_common) for r in common_neighbors(edges, min_cn=2).collect()]
    assert out == [(1, 4, 2)]  # only non-adjacent pair; shares {2, 3}
    # cap at deg 2 drops apexes 2 and 3 (deg 3) -> no wedge produces (1,4)
    assert common_neighbors(edges, max_deg=2, min_cn=2).count() == 0


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_tolerance_backward_tie_and_miss(spark):
    from etl_healthcare_spark.operators.intervals import asof_tolerance_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:10:00"), 100), (1, _ts("2024-01-01 01:00:00"), 101)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:09:00"), 7),   # 60 s before purchase 100
            (1, _ts("2024-01-01 00:09:00"), 9),   # tie: higher id wins backward
            (1, _ts("2024-01-01 00:30:00"), 11),  # 30 min before purchase 101
        ],
        "user_id long, ts timestamp, click_id long",
    )
    out = {
        r.event_id: r
        for r in asof_tolerance_join(
            left, right, "user_id", "ts", "event_id", "click_id",
            tolerance_us=120_000_000, direction="backward",
        ).collect()
    }
    assert out[100].click_id == 9 and out[100].gap_us == 60_000_000 and out[100].matched
    assert out[101].click_id is None and not out[101].matched  # 30 min > 2 min


def test_asof_tolerance_forward_inclusive_boundary(spark):
    from etl_healthcare_spark.operators.intervals import asof_tolerance_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 100)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 5),   # same instant: forward includes
            (1, _ts("2024-01-01 00:02:00"), 6),
        ],
        "user_id long, ts timestamp, click_id long",
    )
    out = asof_tolerance_join(
        left, right, "user_id", "ts", "event_id", "click_id",
        tolerance_us=120_000_000, direction="forward",
    ).collect()
    assert [(r.event_id, r.click_id, r.gap_us) for r in out] == [(100, 5, 0)]


def test_png_chunk_walk_real_bytes_and_corrupt(spark):
    from etl_healthcare_spark.operators.multimodal import png_chunk_info, synth_png_with_chunks

    df = spark.createDataFrame([(3,)], "doc_id long")
    d = F.col("doc_id")
    (payload,) = df.select(
        synth_png_with_chunks(d, F.lit(20), F.lit(10), F.lit(2)).alias("p")
    ).collect()[0]
    b = bytes(payload)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    info = png_chunk_info(b)
    # IHDR + 2 tEXt + IDAT + IEND; values: i=1 -> 'x'*(1+(3+1)%5)=xxxxx, i=2 -> 'x'*1
    assert info == (5, 2, 1 + 3 % 7, "k1=xxxxx;k2=x")
    assert png_chunk_info(b[:-6]) is None          # truncated: no IEND
    assert png_chunk_info(b"\x89PNG\r\n\x1a\xFF") is None  # bad signature
    assert png_chunk_info(None) is None


def test_median_interp2_even_and_odd_groups(spark):
    from etl_healthcare_spark.operators.stats import median_interp2

    rows = [("a", 1.0), ("a", 2.0), ("a", 10.0), ("a", 11.0),   # even: 2+10
            ("b", 5.0), ("b", 7.0), ("b", 100.0)]               # odd: 7+7
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in median_interp2(df, "g", "v").collect()}
    assert out["a"].med2_cents == 200 + 1000 and out["a"].n == 4
    assert out["b"].med2_cents == 1400 and out["b"].n == 3


def test_median_interp2_middle_ranks_straddle_bins(spark):
    # histogram-refine edge cases (round-10 rewrite; bin_cents = 500):
    # c: even n where the two middle order statistics land in DIFFERENT
    #    bins (2.00 -> bin 0, 9.00 -> bin 1), so the lo/hi crossing picks
    #    must resolve independently;
    # d: many duplicate values crossing a bin edge — cumulative counts
    #    inside the crossing bin must start from the bin-prefix, not zero;
    # e: a one-value group (degenerate single bin, both ranks = 1).
    from etl_healthcare_spark.operators.stats import median_interp2

    rows = (
        [("c", 1.0), ("c", 2.0), ("c", 9.0), ("c", 9.5)]
        + [("d", 4.99)] * 3 + [("d", 5.0)] * 4   # n=7: both middles = 5.00
        + [("e", 42.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in median_interp2(df, "g", "v").collect()}
    assert out["c"].med2_cents == 200 + 900 and out["c"].n == 4
    assert out["d"].med2_cents == 1000 and out["d"].n == 7
    assert out["e"].med2_cents == 8400 and out["e"].n == 1


def test_zonemap_prune_clustered_beats_scattered(spark):
    from etl_healthcare_spark.operators.bucketing import zonemap_prune

    # values 0..999; predicate [100, 199]; clustered files span 100 values
    df = spark.createDataFrame([(i, i) for i in range(1000)], "id long, v long")
    out = {r.layout: r for r in zonemap_prune(df, "v", "id", 100, 199, 100, 8).collect()}
    c = out["clustered"]
    assert c.n_files == 10 and c.n_pruned_files == 9 and c.n_rows_skipped == 900
    s = out["scattered"]
    # sha-scattered files each span nearly the full range: nothing prunes
    assert s.n_files == 8 and s.n_pruned_files == 0 and s.n_rows_skipped == 0


def test_score_calibration_shuffle_fallback_matches_broadcast(spark):
    # ADVICE r3: wide score domains must be able to opt out of the
    # broadcast — same rows either way
    from etl_healthcare_spark.operators.sampling import score_calibration

    rows = [(i, "s" + str(i % 2), "tok " * (i % 7 + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = sorted(map(tuple, score_calibration(df, "text", "doc_id", "source").collect()))
    b = sorted(
        map(tuple, score_calibration(df, "text", "doc_id", "source", broadcast_map=False).collect())
    )
    assert a == b and len(a) == 40


def test_tiff_ifd_walk_both_endians_and_corrupt(spark):
    from etl_healthcare_spark.operators.multimodal import synth_tiff, tiff_ifd_info

    df = spark.createDataFrame([(2,), (3,)], "doc_id long")
    d = F.col("doc_id")
    rows = df.select(
        "doc_id", synth_tiff(d, F.lit(100) + d, F.lit(50) + d).alias("p")
    ).collect()
    by_id = {r.doc_id: bytes(r.p) for r in rows}
    assert by_id[2][:2] == b"II" and by_id[3][:2] == b"MM"
    assert tiff_ifd_info(by_id[2]) == ("II", 3, 102, 52, 3)   # orient 1+2%8
    assert tiff_ifd_info(by_id[3]) == ("MM", 4, 103, 53, 4)   # +SamplesPerPixel
    assert tiff_ifd_info(b"II\x2b\x00") is None               # wrong magic
    assert tiff_ifd_info(by_id[2][:10]) is None               # truncated IFD
    assert tiff_ifd_info(None) is None


def test_bucketed_join_query_zero_exchange_before_agg(spark):
    import contextlib
    import io

    from etl_healthcare_spark.plans.registry import REGISTRY

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY["j11_bucketed_join"].fn(spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # the co-located join itself must not shuffle: the only exchange in
        # the whole plan is the post-join groupBy on o_orderpriority
        n_exchanges = len([l for l in plan.splitlines() if l.strip().startswith("(")
                           and ") Exchange" in l])
        assert "SortMergeJoin" in plan
        assert n_exchanges == 1, f"expected only the agg exchange, got {n_exchanges}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_survivorship_field_rules(spark):
    from etl_healthcare_spark.operators.linkage import survivorship

    records = spark.createDataFrame(
        [(1, "short", 5, "b"), (2, "the longest text", 3, "a"),
         (3, "also long  text!", 9, "c"), (4, "solo", 7, "z")],
        "doc_id long, text string, score long, tag string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "node long, cluster_id long"
    )
    out = {r.cluster_id: r for r in survivorship(
        records, clusters, "doc_id", longest=("text",), maxs=("score",), mins=("tag",)
    ).collect()}
    g = out[1]
    assert g.canonical_id == 1 and g.n_members == 3
    # both 16-char strings tie on length -> lexicographically larger survives
    assert g.text_survived == "the longest text"
    assert g.score_max == 9 and g.tag_min == "a"
    s = out[4]   # unclustered singleton
    assert s.canonical_id == 4 and s.n_members == 1 and s.text_survived == "solo"


def test_kcenter_picks_farthest_points(spark):
    from etl_healthcare_spark.operators.clustering import kcenter_assign

    # three tight groups on a line; k=3 must pick one exemplar from each
    pts = [0.0, 0.01, 0.02, 5.0, 5.01, 10.0, 10.01, 10.02]
    df = spark.createDataFrame(
        [(i, [v, 0.0]) for i, v in enumerate(pts)], "vec_id long, embedding array<float>"
    )
    out = kcenter_assign(df, "embedding", "vec_id", k=3).collect()
    centers = sorted({r.center_id for r in out})
    # seed = id 0; farthest = one of the 10.x group; then the 5.x group
    assert len(centers) == 3 and centers[0] == 0
    assert any(c in (5, 6, 7) for c in centers) and any(c in (3, 4) for c in centers)
    by_id = {r.vec_id: r.center_id for r in out}
    assert by_id[1] == 0 and by_id[2] == 0          # first group -> seed
    assert len({by_id[3], by_id[4]}) == 1           # middle group together


def test_csv_roundtrip_preserves_trailing_embedded_newline(spark, tmp_path):
    """Regression (round-6 sf1.0 sweep): Spark's CSV WRITER trims
    leading/trailing whitespace by default, so a quoted value ENDING in an
    embedded newline (hostile doc with null lang) silently lost it.  The
    writer must disable the trimming; value fidelity is byte-exact."""
    vals = ['ends with newline\n', '\nstarts with newline', 'quote",\nmiddle', 'plain']
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v string")
    p = str(tmp_path / "csv_rt")
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(p)
    )
    back = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .schema("id long, v string")
        .csv(p)
    )
    got = {r.id: r.v for r in back.collect()}
    assert got == {i: v for i, v in enumerate(vals)}
