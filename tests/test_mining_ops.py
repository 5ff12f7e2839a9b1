"""Planted-data semantics tests for the round-3 mining batch: BFS hops,
salted skew join, CUSUM, autocovariance / cross-covariance, containment,
chi-squared keyness, range search, compaction planning."""

from datetime import datetime

from pyspark.sql import functions as F

from etl_healthcare_spark.operators.anomaly import cusum_changepoint
from etl_healthcare_spark.operators.bucketing import compaction_plan
from etl_healthcare_spark.operators.graph import bfs_hops
from etl_healthcare_spark.operators.similarity import range_search
from etl_healthcare_spark.operators.skew import salted_join
from etl_healthcare_spark.operators.stats import autocov_lags, cross_covariance
from etl_healthcare_spark.operators.textops import chi2_keyness, containment_pairs


# --- BFS --------------------------------------------------------------------


def test_bfs_hops_path_graph(spark):
    """Seed at one end of a path: hops = index; nodes past max_hops absent;
    a disconnected component never appears."""
    edges = [(i, i + 1) for i in range(8)] + [(100, 101)]
    df = spark.createDataFrame(edges, "a: long, b: long")
    seeds = spark.createDataFrame([(0,)], "node: long")
    got = {r["node"]: r["hops"] for r in bfs_hops(df, seeds, max_hops=4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_hops_multi_source_takes_min(spark):
    """Two seeds on a path: every node labeled by its NEAREST seed; the
    undirected expansion walks both directions."""
    edges = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(edges, "a: long, b: long")
    seeds = spark.createDataFrame([(0,), (10,)], "node: long")
    got = {r["node"]: r["hops"] for r in bfs_hops(df, seeds, max_hops=5).collect()}
    assert got[5] == 5 and got[4] == 4 and got[6] == 4 and got[10] == 0


def test_bfs_ignores_self_loops_and_duplicates(spark):
    edges = [(0, 0), (0, 1), (1, 0), (0, 1)]
    df = spark.createDataFrame(edges, "a: long, b: long")
    seeds = spark.createDataFrame([(0,)], "node: long")
    got = {r["node"]: r["hops"] for r in bfs_hops(df, seeds, max_hops=2).collect()}
    assert got == {0: 0, 1: 1}


# --- salted join ------------------------------------------------------------


def test_salted_join_equals_plain_join(spark):
    """Row-identical to the unsalted join, including a hot key carrying 70%
    of the fact rows and dim keys with no fact match."""
    fact = spark.createDataFrame(
        [(0 if i % 10 < 7 else i % 5, i) for i in range(500)], "key: long, row_id: long"
    )
    dim = spark.createDataFrame([(k, k * 100) for k in range(7)], "key: long, attr: long")
    got = salted_join(fact, dim, "key", salt_source=F.col("row_id"), buckets=8)
    want = fact.join(dim, "key")
    assert sorted(got.select("key", "row_id", "attr").collect()) == sorted(
        want.select("key", "row_id", "attr").collect()
    )
    assert "_salt" not in got.columns


# --- CUSUM ------------------------------------------------------------------


def test_cusum_finds_level_shift(spark):
    """Counts 1/hour for 6 hours then 5/hour for 6 hours: |S| peaks at the
    last low hour (the split point)."""
    rows = []
    for h in range(6):
        rows.append(("g", datetime(2024, 1, 1, h, 30)))
    for h in range(6, 12):
        rows += [("g", datetime(2024, 1, 1, h, m)) for m in range(5)]
    df = spark.createDataFrame(rows, "grp: string, ts: timestamp")
    out = cusum_changepoint(df, "ts", "grp").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_buckets"] == 12 and r["total"] == 36
    # argmax of |n*cum - t*T| is hour 5 (last pre-shift bucket): S = 12*6-6*36 = -144
    assert r["cp_hour_us"] == int(datetime(2024, 1, 1, 5).timestamp() * 1_000_000)
    assert r["max_abs_s"] == 144


# --- autocovariance ---------------------------------------------------------


def test_autocov_alternating_series_signs(spark):
    """A strictly alternating series has negative lag-1 and positive lag-2
    autocovariance; pair counts are n-k."""
    rows = []
    for h in range(8):
        n = 1 if h % 2 == 0 else 3
        rows += [("g", datetime(2024, 1, 1, h, m)) for m in range(n)]
    df = spark.createDataFrame(rows, "grp: string, ts: timestamp")
    out = {r["lag"]: r for r in autocov_lags(df, "ts", "grp", lags=(1, 2)).collect()}
    assert out[1]["n_pairs"] == 7 and out[2]["n_pairs"] == 6
    assert out[1]["acov_num"] < 0 < out[2]["acov_num"]


def test_cross_covariance_sign_and_symmetry(spark):
    """Two co-moving types -> positive cov_num; a<b ordering emits each pair
    once; hours where one side is absent are excluded."""
    rows = []
    for h in range(6):
        n = 1 if h % 2 == 0 else 4
        rows += [("a", datetime(2024, 1, 1, h, m)) for m in range(n)]
        rows += [("b", datetime(2024, 1, 1, h, m)) for m in range(n)]
    rows.append(("a", datetime(2024, 1, 2, 0, 0)))  # hour with no 'b'
    df = spark.createDataFrame(rows, "grp: string, ts: timestamp")
    out = cross_covariance(df, "ts", "grp").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["grp_a"], r["grp_b"]) == ("a", "b")
    assert r["n_hours"] == 6 and r["cov_num"] > 0


# --- containment ------------------------------------------------------------


def test_containment_short_doc_inside_long(spark):
    """A 7-token doc embedded verbatim in a 100-token doc: containment of the
    short side is 1.0 (1e6 ppm) even though Jaccard is tiny."""
    short = "alpha beta gamma delta epsilon zeta eta"
    long = short + " " + " ".join(f"w{i}" for i in range(93))
    other = " ".join(f"z{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, other)], "doc_id: long, text: string"
    )
    out = containment_pairs(df, "text", "doc_id", k=5, max_span_df=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"]) == (1, 2)
    assert r["n_a"] == 3 and r["n_inter"] == 3  # 7 tokens -> 3 distinct 5-grams
    assert r["containment_ppm"] == 1_000_000


def test_containment_common_span_blocked(spark):
    """A span shared by more than max_span_df docs must generate no candidate
    pairs (the boilerplate guard)."""
    boiler = "one two three four five"
    df = spark.createDataFrame(
        [(i, boiler + f" tail{i}") for i in range(12)], "doc_id: long, text: string"
    )
    out = containment_pairs(df, "text", "doc_id", k=5, max_span_df=8).collect()
    assert out == []


# --- chi2 keyness -----------------------------------------------------------


def test_chi2_keyness_exact_value(spark):
    """Hand-checked 2x2: token 'x' only in slice A, 'y' only in B, filler in
    both.  chi2 for a perfectly separating token with a=10,b=0,NA=30,NB=30:
    N(ad-bc)^2/((a+b)(c+d)(a+c)(b+d)) = 60*300^2/(10*50*30*30) = 12.0."""
    a_doc = ("x " * 10 + "f " * 20).strip()
    b_doc = ("y " * 10 + "f " * 20).strip()
    df = spark.createDataFrame(
        [(1, a_doc, "en"), (2, b_doc, "de")], "doc_id: long, text: string, lang: string"
    )
    out = {
        r["token"]: r
        for r in chi2_keyness(
            df, "text", "doc_id", side_pred=F.col("lang") == "en", min_total=5, top_n=10
        ).collect()
    }
    assert out["x"]["chi2_milli"] == 12_000 and out["y"]["chi2_milli"] == 12_000
    assert out["f"]["chi2_milli"] == 0
    assert (out["x"]["a"], out["x"]["b"]) == (10, 0)


# --- range search -----------------------------------------------------------


def test_range_search_threshold_boundary(spark):
    """Orthogonal vector excluded, parallel vector included, and the result
    never contains the query itself."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),   # cos = 1
        (2, [0.0, 1.0, 0.0, 0.0]),   # cos = 0
        (3, [0.8, 0.6, 0.0, 0.0]),   # cos = 0.8
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = range_search(
        df, "embedding", "vec_id", query_pred=F.col("vec_id") == 0, tau_ppm=500_000
    ).collect()
    got = sorted((r["query_id"], r["id"]) for r in out)
    assert got == [(0, 1), (0, 3)]


# --- compaction plan --------------------------------------------------------


def test_compaction_plan_bins_preserve_time_order(spark):
    """Hourly files of 100 payload bytes + overhead pack next-fit in time
    order; bin ids are non-decreasing over time within a partition."""
    rows = []
    for h in range(10):
        rows.append(("k", datetime(2024, 1, 1, h, 0), "x" * 100))
    df = spark.createDataFrame(rows, "part: string, ts: timestamp, payload: string")
    out = sorted(
        compaction_plan(df, "part", "ts", "payload", target_bytes=400, row_overhead=64).collect(),
        key=lambda r: r["bucket_us"],
    )
    assert [r["bytes"] for r in out] == [164] * 10
    bins = [r["bin"] for r in out]
    assert bins == sorted(bins)  # time order preserved
    assert bins[0] == 0 and bins[1] == 0 and bins[2] == 0  # 0,164,328 < 400
    assert bins[3] == 1  # cum_prev 492 -> bin 1


# --- k-core ----------------------------------------------------------------


def test_kcore_peels_tendrils_keeps_clique(spark):
    """A 5-clique with a pendant path: the path (and nothing else) must peel
    at k=3; clique degrees are 4."""
    from etl_healthcare_spark.operators.graph import kcore_nodes

    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    path = [(4, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + path, "a: long, b: long")
    got = {r["node"]: r["deg"] for r in kcore_nodes(df, k=3, rounds=4).collect()}
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}


def test_kcore_cascade_dissolves_chain(spark):
    """A pure cycle is its own 2-core but has no 3-core: peeling must empty
    it entirely once one round drops every node at once."""
    from etl_healthcare_spark.operators.graph import kcore_nodes

    cycle = [(i, (i + 1) % 8) for i in range(8)]
    df = spark.createDataFrame(cycle, "a: long, b: long")
    assert kcore_nodes(df, k=3, rounds=4).count() == 0
    got = {r["node"]: r["deg"] for r in kcore_nodes(df, k=2, rounds=4).collect()}
    assert got == {i: 2 for i in range(8)}


# --- spatial pairs ----------------------------------------------------------


def test_chebyshev_pairs_match_naive(spark):
    """Grid blocking must equal the naive quadratic join, including pairs
    that straddle cell boundaries."""
    from etl_healthcare_spark.operators.spatial import chebyshev_pairs

    pts = [(1, 0, 0), (2, 2, 1), (3, 3, 3), (4, 4, 4), (5, 100, 100), (6, 7, 0)]
    df = spark.createDataFrame(pts, "id: long, x: long, y: long")
    got = sorted((r["id_a"], r["id_b"]) for r in chebyshev_pairs(df, "id", "x", "y", dist=2, cell=4).collect())
    naive = sorted(
        (a[0], b[0])
        for a in pts
        for b in pts
        if a[0] < b[0] and abs(a[1] - b[1]) <= 2 and abs(a[2] - b[2]) <= 2
    )
    assert got == naive and got == [(1, 2), (2, 3), (3, 4)]
    assert (4, 6) not in got  # x distance 3 > 2


def test_chebyshev_pairs_no_duplicates_same_point(spark):
    """Coincident points pair exactly once with dx = dy = 0."""
    from etl_healthcare_spark.operators.spatial import chebyshev_pairs

    df = spark.createDataFrame([(1, 5, 5), (2, 5, 5)], "id: long, x: long, y: long")
    out = chebyshev_pairs(df, "id", "x", "y", dist=2, cell=4).collect()
    assert len(out) == 1 and out[0]["dx"] == 0 and out[0]["dy"] == 0


# --- audio autocorrelation --------------------------------------------------


def test_audio_autocorr_exact_values(spark):
    """Hand-built WAV with known samples: r_k must equal the brute-force
    integer sums; lag 0 equals the energy."""
    from etl_healthcare_spark.operators.multimodal import audio_autocorr, synth_wav_with_samples
    from pyspark.sql import functions as F2

    df = spark.createDataFrame([(7,)], "doc_id: long").select(
        "doc_id",
        synth_wav_with_samples(F2.lit(8000), F2.lit(1), F2.lit(16), F2.col("doc_id") % 251).alias(
            "payload"
        ),
    )
    out = {r["lag"]: r for r in audio_autocorr(df, "doc_id", "payload", max_lag=2).collect()}
    # regenerate samples exactly like the synth: (j*73+seed) % 65536, signed
    seed = 7 % 251
    s = [((j * 73 + seed) % 65536) - (65536 if (j * 73 + seed) % 65536 >= 32768 else 0) for j in range(16)]
    for k in (0, 1, 2):
        want = sum(s[t] * s[t + k] for t in range(16 - k))
        assert out[k]["r"] == want and out[k]["n_terms"] == 16 - k


# --- MAD --------------------------------------------------------------------


def test_mad_flags_outlier_and_ties(spark):
    """9 values at 10.00 plus one at 99.00: median 10.00, MAD 0 -> any
    deviation flags; the tied bulk never flags."""
    from etl_healthcare_spark.operators.anomaly import mad_flags

    rows = [("g", float(10), i) for i in range(9)] + [("g", 99.0, 99)]
    df = spark.createDataFrame(rows, "grp: string, value: double, event_id: long")
    out = mad_flags(df, "grp", "value", "event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert r["id"] == 99 and r["med"] == 1000 and r["mad"] == 0 and r["v_cents"] == 9900


def test_mad_even_count_uses_lower_median(spark):
    """n=4 distinct values: lower median (rank 2) on both passes."""
    from etl_healthcare_spark.operators.anomaly import mad_flags

    rows = [("g", v, i) for i, v in enumerate([1.0, 2.0, 3.0, 100.0])]
    df = spark.createDataFrame(rows, "grp: string, value: double, event_id: long")
    out = mad_flags(df, "grp", "value", "event_id").collect()
    # med = 200 cents (rank 2); devs = [100, 0, 100, 9800]; mad = lower median = 100
    assert len(out) == 1 and out[0]["id"] == 3 and out[0]["med"] == 200 and out[0]["mad"] == 100


# --- trigram backoff LM -----------------------------------------------------


def test_lm_trigram_backoff_levels(spark):
    """Hand-built corpus: a scored doc whose trigram IS in train scores the
    trigram ppm; one seen only at bigram level takes 0.4x the bigram ppm;
    fully unseen tokens score 0."""
    from etl_healthcare_spark.operators.textops import lm_trigram_backoff_scores

    train = "a b c a b c"          # trigrams: abc, bca, cab... tokens a b c a b c
    doc_tri = "a b c"              # trigram (a,b,c) seen in train
    doc_bi = "x b c"               # trigram unseen; bigram (b,c) seen
    doc_none = "q r s"             # nothing seen
    df = spark.createDataFrame(
        [(0, train, "en"), (1, doc_tri, "de"), (2, doc_bi, "de"), (3, doc_none, "de")],
        "doc_id: long, text: string, lang: string",
    )
    out = {
        r["doc_id"]: r
        for r in lm_trigram_backoff_scores(
            df, "text", "doc_id", side_pred=F.col("lang") == "en"
        ).collect()
    }
    # train: tokens [a,b,c,a,b,c]; trigrams abc, bca, cab, abc -> c3(abc)=2
    # bigram counts: ab=2, bc=2, ca=1; prefix c2(a,b)=2 -> p3 = 1e6*2//2 = 1e6
    assert out[1]["lm_bo_score_ppm"] == 1_000_000
    # doc 2: trigram (x,b,c) unseen; bigram (b,c)=2, c1(b)=2 -> p2=1e6, score=2*1e6//5=400000
    assert out[2]["lm_bo_score_ppm"] == 400_000
    assert out[3]["lm_bo_score_ppm"] == 0
    assert 0 not in out  # train docs are not scored


# --- mode -------------------------------------------------------------------


def test_mode_tiebreak_is_lexicographic(spark):
    """Equal counts resolve to the lexicographically smallest value."""
    from pyspark.sql import Window

    rows = [(1, "b"), (1, "a"), (2, "z"), (2, "z"), (2, "a")]
    df = spark.createDataFrame(rows, "cohort: long, event_type: string")
    counts = df.groupBy("cohort", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("cohort").orderBy(F.col("cnt").desc(), F.col("event_type"))
    out = {
        r["cohort"]: r["event_type"]
        for r in counts.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).collect()
    }
    assert out == {1: "a", 2: "z"}


# --- longest shared run -------------------------------------------------------


def test_longest_run_exact_length(spark):
    """A 12-token block shared verbatim between two docs yields
    max_run_tokens == 12; an 8-token isolated overlap elsewhere does not
    extend it."""
    from etl_healthcare_spark.operators.textops import longest_shared_run

    block = " ".join(f"s{i}" for i in range(12))
    other8 = " ".join(f"o{i}" for i in range(8))
    d1 = block + " xx yy " + other8
    d2 = "aa bb " + block + " zz " + other8
    filler = " ".join(f"f{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, filler)], "doc_id: long, text: string"
    )
    out = longest_shared_run(df, "text", "doc_id", k=5, max_span_df=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"]) == (1, 2)
    # 12-token block -> 8 consecutive 5-gram positions -> run 8+4 = 12
    assert r["max_run_tokens"] == 12


def test_longest_run_broken_by_one_token(spark):
    """Changing one middle token splits the run: two 7-token halves of a
    15-token near-copy report max 7, never 15."""
    from etl_healthcare_spark.operators.textops import longest_shared_run

    left = "a1 a2 a3 a4 a5 a6 a7"
    right = "b1 b2 b3 b4 b5 b6 b7"
    d1 = f"{left} mid {right}"
    d2 = f"{left} MIDX {right}"  # differs only at the middle token
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id: long, text: string")
    out = longest_shared_run(df, "text", "doc_id", k=5, max_span_df=8).collect()
    assert len(out) == 1 and out[0]["max_run_tokens"] == 7


# --- ANN recall report --------------------------------------------------------


def test_ann_recall_planted_clusters(spark):
    """Two well-separated clusters and axis-aligned planes: every query's
    exact top-k lives in its own bucket, so recall@k = 1e6 ppm."""
    from etl_healthcare_spark.operators.similarity import ann_recall_report

    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))        # cluster A (+x)
        rows.append((100 + i, [-1.0, 0.0, 0.01 * i, 0.0]))  # cluster B (-x)
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    planes = [[1.0, 0.0, 0.0, 0.0]]
    from pyspark.sql import functions as F2

    out = {
        r["query_id"]: r
        for r in ann_recall_report(
            df, "embedding", "vec_id", query_pred=F2.col("vec_id").isin(0, 100), planes=planes, k=3
        ).collect()
    }
    assert out[0]["recall_ppm"] == 1_000_000 and out[100]["recall_ppm"] == 1_000_000
    assert out[0]["n_ann"] == 3 and out[0]["n_hits"] == 3


def test_ann_recall_detects_bucket_loss(spark):
    """A query whose nearest neighbor lands across the hyperplane must report
    recall < 1: the metric isolates bucketing loss."""
    from etl_healthcare_spark.operators.similarity import ann_recall_report
    from pyspark.sql import functions as F2

    rows = [
        (0, [1.0, 0.1, 0.0, 0.0]),    # query, + side
        (1, [1.0, 0.2, 0.0, 0.0]),    # same side, similar
        (2, [-0.001, 1.0, 0.0, 0.0]), # NEGATIVE side of plane but high cos to q? no —
        (3, [-1.0, 0.0, 0.0, 0.0]),   # far, negative side
    ]
    # plane x: bucket(q)=1. neighbor 2 is on the other side; exact top-2 of q
    # is {1, 2} (cos(q,2) ~ 0.095 > cos(q,3) ~ -0.995) but ann set on q's
    # bucket only holds {1} -> recall@2 = 500000
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = {
        r["query_id"]: r
        for r in ann_recall_report(
            df, "embedding", "vec_id", query_pred=F2.col("vec_id") == 0,
            planes=[[1.0, 0.0, 0.0, 0.0]], k=2
        ).collect()
    }
    assert out[0]["n_ann"] == 1 and out[0]["n_hits"] == 1
    assert out[0]["recall_ppm"] == 500_000
