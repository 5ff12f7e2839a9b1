"""Scale-analytics operators: BM25 ranks planted relevance, profiling counts
exactly, HLL lands within its error bound and merges by MAX, int8 k-means
recovers planted clusters, z-score flags planted spikes, Morton keys
interleave correctly."""

import pytest
from pyspark.sql import functions as F

from etl_healthcare_spark.operators.anomaly import zscore_flags
from etl_healthcare_spark.operators.bucketing import morton_key
from etl_healthcare_spark.operators.clustering import kmeans_int8
from etl_healthcare_spark.operators.profile import profile_columns
from etl_healthcare_spark.operators.search import bm25_topk
from etl_healthcare_spark.operators.sketch import hll_distinct, hll_estimate, hll_registers


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_ranks_term_dense_doc_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark shuffle"),        # dense in the query term
            (2, "spark appears once here with lots of other words padding it out"),
            (3, "no relevant content at all"),
            (4, "spark shuffle spark"),              # dense + short
        ],
        ["doc_id", "text"],
    )
    hits = bm25_topk(docs, ["spark"], k=10).collect()
    ids = [r.id for r in hits]
    assert 3 not in ids  # no match -> no hit
    assert ids[0] in (1, 4)  # term-dense short docs outrank the padded one
    assert ids.index(2) == len(ids) - 1


def test_bm25_rare_term_outweighs_common(spark):
    # "rare" appears in 1 of 4 docs, "common" in all: a doc matching only
    # "rare" must outscore a doc matching only "common" (idf dominance)
    docs = spark.createDataFrame(
        [
            (1, "common rare"),
            (2, "common alpha beta"),
            (3, "common gamma delta"),
            (4, "common epsilon zeta"),
        ],
        ["doc_id", "text"],
    )
    scores = {r.id: r.score for r in bm25_topk(docs, ["rare", "common"], k=10).collect()}
    assert scores[1] > scores[2]


# ---------------------------------------------------------------------------
# profiling
# ---------------------------------------------------------------------------


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], ["k", "s"]
    )
    prof = {r.column_name: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert prof["k"].n_rows == 4
    assert prof["k"].n_null == 1 and prof["k"].n_distinct == 2
    assert prof["k"].min_s == "1" and prof["k"].max_s == "2"
    assert prof["s"].n_null == 1 and prof["s"].n_distinct == 2
    assert prof["s"].min_s == "a" and prof["s"].max_s == "b"


# ---------------------------------------------------------------------------
# HLL sketch
# ---------------------------------------------------------------------------


def test_hll_estimate_within_error_bound(spark):
    n = 5000
    df = spark.range(n).select(F.lit("g").alias("grp"), F.col("id").alias("item"))
    row = hll_distinct(df, "grp", "item").collect()[0]
    # m=256 -> standard error 6.5%; allow 4 sigma
    assert abs(row.hll_estimate - n) / n < 0.26
    assert row.used_registers <= 256


def test_hll_registers_merge_by_max(spark):
    """Sharded registers combined by MAX == registers of the union — the
    property that makes the sketch a distributed one-pass aggregate."""
    a = spark.range(0, 3000).select(F.lit("g").alias("grp"), F.col("id").alias("item"))
    b = spark.range(2000, 6000).select(F.lit("g").alias("grp"), F.col("id").alias("item"))
    merged = (
        hll_registers(a, "grp", "item")
        .union(hll_registers(b, "grp", "item"))
        .groupBy("grp", "register")
        .agg(F.max("rank").alias("rank"))
    )
    direct = hll_registers(a.union(b), "grp", "item")
    est_merged = hll_estimate(merged).collect()[0]
    est_direct = hll_estimate(direct).collect()[0]
    assert est_merged.s_scaled == est_direct.s_scaled
    assert est_merged.hll_estimate == est_direct.hll_estimate


def test_hll_duplicates_do_not_move_estimate(spark):
    once = spark.range(500).select(F.lit("g").alias("grp"), F.col("id").alias("item"))
    thrice = once.union(once).union(once)
    assert (
        hll_distinct(once, "grp", "item").collect()[0].s_scaled
        == hll_distinct(thrice, "grp", "item").collect()[0].s_scaled
    )


# ---------------------------------------------------------------------------
# int8 k-means
# ---------------------------------------------------------------------------


def test_kmeans_recovers_planted_clusters(spark):
    # two tight blobs in 4-d; k=2 must split them exactly
    rows = []
    for i in range(10):
        rows.append((i, [float(10 + i % 3), 10.0, 0.0, 0.0]))
    for i in range(10, 20):
        rows.append((i, [0.0, 0.0, float(10 + i % 3), 10.0]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    assigned = kmeans_int8(df, "embedding", "vec_id", k=2, rounds=2).collect()
    clusters = {r.id: r.cluster for r in assigned}
    blob1 = {clusters[i] for i in range(10)}
    blob2 = {clusters[i] for i in range(10, 20)}
    assert len(blob1) == 1 and len(blob2) == 1 and blob1 != blob2


def test_kmeans_is_deterministic(spark):
    df = (
        spark.range(50)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(8)),
                lambda i: F.conv(F.substring(F.sha2(F.concat_ws(":", F.col("id").cast("string"), i.cast("string")), 256), 1, 4), 16, 10).cast("float"),
            ).alias("embedding"),
        )
    )
    r1 = sorted((r.id, r.cluster, r.dist2) for r in kmeans_int8(df, "embedding", "vec_id", k=4).collect())
    r2 = sorted((r.id, r.cluster, r.dist2) for r in kmeans_int8(df, "embedding", "vec_id", k=4).collect())
    assert r1 == r2


# ---------------------------------------------------------------------------
# SemDeDup semantic dedup
# ---------------------------------------------------------------------------


def _planted_near_dups(spark):
    """Two topic blobs; within blob A, vectors 0/1 are near-identical (a
    semantic dup) while the rest are spread; blob B has no dups."""
    rows = [
        (0, [100.0, 100.0, 0.0, 0.0]),
        (1, [101.0, 100.0, 0.0, 0.0]),   # near-dup of 0
        (2, [100.0, 0.0, 0.0, 0.0]),     # same topic, different direction
        (3, [0.0, 100.0, 0.0, 0.0]),
        (10, [0.0, 0.0, 100.0, 50.0]),
        (11, [0.0, 0.0, 50.0, 100.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )


def test_semantic_dedup_drops_only_planted_dup(spark):
    from etl_healthcare_spark.operators.clustering import semantic_keep

    kept = semantic_keep(
        _planted_near_dups(spark), "embedding", "vec_id", k=2, rounds=1, tau_num=99, tau_den=100
    ).collect()
    ids = sorted(r.id for r in kept)
    # the higher id of the near-identical pair (1) is pruned; all else kept
    assert ids == [0, 2, 3, 10, 11]


def test_auto_cluster_count_holds_mean_cluster_size_constant():
    """The SemDeDup scale contract: k = ceil(n/2500) floored at 8, so total
    within-cluster pair work stays LINEAR in the corpus.  Every driver sf
    (<= 20000 embeddings) must keep the historic k=8 so small-sf oracle
    hashes are unchanged; big corpora must grow k proportionally."""
    from etl_healthcare_spark.operators.clustering import auto_cluster_count

    assert auto_cluster_count(500) == 8      # sf0.001
    assert auto_cluster_count(2000) == 8     # sf0.01
    assert auto_cluster_count(20000) == 8    # sf0.1 (exactly at the floor)
    assert auto_cluster_count(20001) == 9    # first corpus past the floor
    assert auto_cluster_count(200000) == 80  # sf1.0
    assert auto_cluster_count(2_000_000) == 800
    # mean cluster size is bounded by the target for any corpus past the floor
    for n in (50_000, 1_000_000, 123_456_789):
        assert n / auto_cluster_count(n) <= 2500


def test_semantic_assignment_kernels_agree_bit_for_bit(spark):
    """The Arrow assignment kernel (round-7: _assign's n x k crossJoin was
    the quadratic term left after §40 made pair work linear) must reproduce
    the Catalyst assignment EXACTLY — same integer distances, same
    ties-to-smallest-cid rule — across multiple Lloyd rounds."""
    from etl_healthcare_spark.operators.clustering import _cluster_assignments

    df = spark.range(120).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.conv(
                F.substring(
                    F.sha2(F.concat_ws(":", F.col("id").cast("string"), i.cast("string")), 256),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("float"),
        ).alias("embedding"),
    )
    expr = sorted(
        (r.id, r.cluster)
        for r in _cluster_assignments(df, "embedding", "vec_id", k=5, rounds=2).collect()
    )
    arrow = sorted(
        (r.id, r.cluster)
        for r in _cluster_assignments(
            df, "embedding", "vec_id", k=5, rounds=2, kernel="arrow"
        ).collect()
    )
    assert expr == arrow and len(expr) == 120 and len({c for _, c in expr}) > 1


def test_semantic_collect_k_guard_raises_with_migration_note():
    """Past the driver-collect ceiling the arrow path must fail with the
    documented IVF-coarse-quantizer migration pointer, not a driver OOM
    (round-7 verdict item 5)."""
    import pytest

    from etl_healthcare_spark.operators.clustering import (
        SEMANTIC_MAX_COLLECT_K,
        _guard_collect_k,
    )

    _guard_collect_k(SEMANTIC_MAX_COLLECT_K)  # at the ceiling: fine
    with pytest.raises(ValueError, match="IVF coarse-quantizer"):
        _guard_collect_k(SEMANTIC_MAX_COLLECT_K + 1)


def test_assign_arrow_empty_centroids_returns_empty(spark):
    """An empty centroid table must early-return an empty typed frame — the
    numpy kernel would AxisError on a 1-D empty C matrix (round-7 advice)."""
    from etl_healthcare_spark.operators.clustering import _assign_arrow

    vecs = spark.range(0).select(
        F.col("id"), F.array(F.lit(1).cast("bigint")).alias("qv")
    )
    out = _assign_arrow(vecs, [], "bigint")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "qv", "cluster", "dist2"]


def test_semantic_pair_kernels_agree_bit_for_bit(spark):
    """Integer math means the Catalyst self-join and the per-cluster int64
    GEMM Arrow kernel must produce IDENTICAL pairs — not just gap-separated
    ones like the float GEMM."""
    from etl_healthcare_spark.operators.clustering import semantic_dedup_pairs

    df = spark.range(80).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.conv(
                F.substring(
                    F.sha2(F.concat_ws(":", F.col("id").cast("string"), i.cast("string")), 256),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("float"),
        ).alias("embedding"),
    )
    kw = dict(k=4, rounds=1, tau_num=30, tau_den=100)
    expr = sorted(
        (r.id_a, r.id_b, r.cluster)
        for r in semantic_dedup_pairs(df, "embedding", "vec_id", kernel="expr", **kw).collect()
    )
    gemm = sorted(
        (r.id_a, r.id_b, r.cluster)
        for r in semantic_dedup_pairs(df, "embedding", "vec_id", kernel="arrow", **kw).collect()
    )
    assert expr == gemm and len(expr) > 0


# ---------------------------------------------------------------------------
# z-score anomalies
# ---------------------------------------------------------------------------


def test_zscore_flags_planted_spike_only(spark):
    base = [(i, "g", 10.0 + (i % 5) * 0.1) for i in range(100)]
    spike = [(100, "g", 500.0)]
    df = spark.createDataFrame(base + spike, ["event_id", "event_type", "value"])
    flags = zscore_flags(df, "event_type", "value", "event_id", z=3).collect()
    assert [r.id for r in flags] == [100]


def test_zscore_no_flags_on_uniform_group(spark):
    # uniform distribution: max |z| ~ 1.73 < 3 -> nothing flags
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(100)], ["event_id", "event_type", "value"]
    )
    assert zscore_flags(df, "event_type", "value", "event_id", z=3).count() == 0


# ---------------------------------------------------------------------------
# Morton keys
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "x,y,expected",
    [
        (0, 0, 0),
        (1, 0, 1),       # x bits land on even positions
        (0, 1, 2),       # y bits on odd
        (3, 3, 15),      # 0b11 interleaved with 0b11 = 0b1111
        (5, 3, 0b011011),  # x=101, y=011 -> y2x2 y1x1 y0x0 = 01 10 11
    ],
)
def test_morton_interleaves_bits(spark, x, y, expected):
    row = spark.range(1).select(morton_key(F.lit(x), F.lit(y), bits=10).alias("z")).collect()[0]
    assert row.z == expected


def test_morton_locality_prunes_both_dims(spark):
    """Rows sorted by z-value and chunked: each chunk's (x, y) bounding box
    is tight in BOTH dimensions — the footer-stat pruning property."""
    df = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    z = df.select("x", "y", morton_key(F.col("x"), F.col("y"), bits=5).alias("z"))
    rows = sorted((r.z, r.x, r.y) for r in z.collect())
    # 16 chunks of 64 rows = the 8x8 z-curve cells: each spans exactly 8x8
    for c in range(16):
        chunk = rows[c * 64 : (c + 1) * 64]
        xs = [r[1] for r in chunk]
        ys = [r[2] for r in chunk]
        assert max(xs) - min(xs) == 7 and max(ys) - min(ys) == 7


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_countmin_estimate_upper_bounds_exact(spark):
    from etl_healthcare_spark.operators.sketch import countmin_estimates

    rows = [("a",)] * 50 + [("b",)] * 10 + [(f"noise{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, ["item"])
    est = {r.item: (r.est, r.exact) for r in countmin_estimates(df, "item", ["a", "b", "zzz"]).collect()}
    assert est["a"][1] == 50 and est["b"][1] == 10 and est["zzz"][1] == 0
    # count-min never underestimates
    for e, x in est.values():
        assert e >= x


def test_countmin_tables_merge_by_sum(spark):
    from etl_healthcare_spark.operators.sketch import countmin_table
    from pyspark.sql import functions as F2

    a = spark.createDataFrame([(f"x{i % 17}",) for i in range(300)], ["item"])
    b = spark.createDataFrame([(f"y{i % 13}",) for i in range(300)], ["item"])
    merged = (
        countmin_table(a, "item")
        .unionByName(countmin_table(b, "item"))
        .groupBy("row", "bucket")
        .agg(F2.sum("cnt").alias("cnt"))
    )
    direct = countmin_table(a.unionByName(b), "item")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


# ---------------------------------------------------------------------------
# histogram quantiles
# ---------------------------------------------------------------------------


def test_histogram_quantiles_bound_true_percentile(spark):
    from etl_healthcare_spark.operators.sketch import histogram_quantiles

    # values 0.00 .. 99.99 in cents -> exact percentiles known
    df = spark.createDataFrame(
        [(i, "g", i / 100.0) for i in range(10000)], ["event_id", "event_type", "value"]
    )
    row = histogram_quantiles(df, "event_type", "value", bin_cents=500).collect()[0]
    assert row.n == 10000
    # true p50 = 50.00 (rank 5000 -> cents 4999); bin lower edge within one bin
    assert 4999 - 500 < row.q50_lo_cents <= 4999
    assert 8999 - 500 < row.q90_lo_cents <= 8999
    assert 9899 - 500 < row.q99_lo_cents <= 9899


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------


def test_ewma_weights_newest_most(spark):
    from etl_healthcare_spark.operators.anomaly import ewma_latest
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, "k", t0 + dt.timedelta(minutes=i), 10.0) for i in range(20)]
    rows.append((99, "k", t0 + dt.timedelta(hours=10), 100.0))  # newest spike
    df = spark.createDataFrame(rows, ["event_id", "key", "ts", "value"])
    row = ewma_latest(df, "key", "ts", "value", "event_id", k=16).collect()[0]
    # newest point has weight 1/2: ewma ~ 0.5*100 + 0.5*10 = 55 (truncation -> slightly less)
    assert row.n_used == 16
    assert 54.9 * 100 < row.ewma_cents < 55.0 * 100


def test_ewma_constant_series_converges_to_value(spark):
    from etl_healthcare_spark.operators.anomaly import ewma_latest
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, "k", t0 + dt.timedelta(minutes=i), 42.0) for i in range(30)],
        ["event_id", "key", "ts", "value"],
    )
    row = ewma_latest(df, "key", "ts", "value", "event_id", k=16).collect()[0]
    # sum of 16 dyadic weights = 1 - 2^-16: exact expected value
    assert row.ewma_cents == 4200 * (1 - 2 ** -16)


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def test_pagerank_hub_outranks_leaves(spark):
    from etl_healthcare_spark.operators.graph import pagerank_ppm

    # star: node 0 at the center of 5 leaves, plus one detached pair
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(10, 11)], ["doc_a", "doc_b"]
    )
    ranks = {r.node: r.rank_ppm for r in pagerank_ppm(pairs, iters=2).collect()}
    assert ranks[0] > max(ranks[i] for i in range(1, 6))  # hub dominates
    assert ranks[10] == ranks[11]  # symmetric pair ties exactly
    assert all(r >= 150_000 for r in ranks.values())  # damping floor


def test_pagerank_deterministic_under_repartition(spark):
    from etl_healthcare_spark.operators.graph import pagerank_ppm

    pairs = spark.createDataFrame(
        [(i, (i * 7 + 1) % 20) for i in range(20) if i != (i * 7 + 1) % 20],
        ["doc_a", "doc_b"],
    )
    a = sorted(map(tuple, pagerank_ppm(pairs, iters=2).collect()))
    b = sorted(map(tuple, pagerank_ppm(pairs.repartition(13), iters=2).collect()))
    assert a == b  # integer math: partitioning cannot move a single ppm


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_screen_has_no_false_negatives(spark):
    from etl_healthcare_spark.operators.bloom import bloom_build, bloom_screen

    members = spark.createDataFrame([(f"item{i}",) for i in range(50)], ["s"])
    bloom = bloom_build(members, "s")
    probes = spark.createDataFrame(
        [(f"item{i}",) for i in range(50)] + [(f"other{i}",) for i in range(200)], ["s"]
    )
    out = {r.s: r.might_contain for r in bloom_screen(probes, "s", bloom).collect()}
    # every true member must pass the screen
    assert all(out[f"item{i}"] for i in range(50))
    # false-positive rate stays near the theoretical (1-e^{-kn/m})^k ~ 1e-13
    fp = sum(out[f"other{i}"] for i in range(200))
    assert fp == 0


def test_bloom_contamination_upper_bounds_exact(spark):
    from etl_healthcare_spark.operators.bloom import bloom_contamination

    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),  # fully contaminated
            (2, "one two three four five six seven eight nine ten"),  # clean
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in bloom_contamination(corpus, eval_df, "text", "doc_id").collect()}
    assert rows[1].contam_ppm == 1_000_000 and rows[1].bloom_ppm == 1_000_000
    assert rows[2].contam_ppm == 0 and rows[2].bloom_ppm == 0
    for r in rows.values():  # bloom never under-reports
        assert r.bloom_ppm >= r.contam_ppm


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


def test_pq_codes_shape_and_range(spark):
    from etl_healthcare_spark.operators.pq import pq_codebook_and_codes

    df = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: F.conv(
                F.substring(F.sha2(F.concat_ws(":", F.col("id").cast("string"), i.cast("string")), 256), 1, 4),
                16, 10,
            ).cast("float"),
        ).alias("embedding"),
    )
    codebook, codes = pq_codebook_and_codes(df, "embedding", "vec_id", sub_dims=4, k=8)
    rows = codes.collect()
    # every vector gets exactly one code per subspace (16 dims / 4 = 4)
    per_vec = {}
    for r in rows:
        per_vec.setdefault(r.id, []).append((r.m, r.cid))
    assert all(len(v) == 4 for v in per_vec.values())
    assert all(0 <= m < 4 for v in per_vec.values() for m, _ in v)
    # codebook: centroid components stay in int8 range
    assert all(0 <= r.c <= 255 for r in codebook.collect())


def test_pq_adc_finds_planted_near_neighbor(spark):
    from etl_healthcare_spark.operators.pq import pq_adc_topk

    # vec 1 is a tiny perturbation of vec 0; the rest are far away
    rows = [(0, [10.0] * 8), (1, [10.5] * 8)]
    for i in range(2, 30):
        rows.append((i, [float(100 + (i * 13) % 50 + j) for j in range(8)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    top = pq_adc_topk(df, "embedding", "vec_id", query_id=0, k_top=3, sub_dims=4, k=4).collect()
    assert top[0].id == 1  # the planted neighbor wins ADC
    assert top[0].exact_d2 <= min(r.exact_d2 for r in top[1:])
