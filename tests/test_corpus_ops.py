"""Unit tests for the corpus-serving batch: RAG chunk windows, training-mix
planning, related-document ranking, trimmed means — planted inputs with
hand-computed expectations."""

from pyspark.sql import functions as F

from etl_healthcare_spark.operators.sampling import mixture_plan
from etl_healthcare_spark.operators.search import related_docs
from etl_healthcare_spark.operators.stats import trimmed_mean
from etl_healthcare_spark.operators.textops import chunk_windows


def test_chunk_windows_starts_sizes_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "solo"), (3, "")], "doc_id long, text string")
    rows = {
        (r.doc_id, r.chunk_idx): r
        for r in chunk_windows(df, "text", "doc_id", window=4, stride=3).collect()
    }
    # doc 1: starts 0,3,6,9 -> sizes 4,4,4,1
    assert [(k, rows[k].start_tok, rows[k].n_tok) for k in sorted(rows) if k[0] == 1] == [
        ((1, 0), 0, 4),
        ((1, 1), 3, 4),
        ((1, 2), 6, 4),
        ((1, 3), 9, 1),
    ]
    # doc 2: one 1-token chunk; doc 3 (no tokens): no chunks at all
    assert (2, 0) in rows and rows[(2, 0)].n_tok == 1
    assert not any(k[0] == 3 for k in rows)


def test_chunk_windows_hash_keys_identical_windows(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "a b c x")], "doc_id long, text string"
    )
    out = chunk_windows(df, "text", "doc_id", window=4, stride=4).collect()
    hashes = {r.doc_id: r.chunk_hash for r in out}
    assert hashes[1] == hashes[2] != hashes[3]


def test_mixture_plan_rates_and_epochs(spark):
    # en: 2 docs x 3 tokens = 6; zh: 1 doc x 2 tokens = 2; grand = 8
    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "d e f", "en"), (3, "g h", "zh"), (4, "q", None)],
        "doc_id long, text string, lang string",
    )
    # grand = 9 tokens (incl. the unk doc); target en 50%, zh 50%
    plan = {
        r.lang: r
        for r in mixture_plan(
            df, "text", "lang", {"en": 500_000, "zh": 500_000}
        ).collect()
    }
    en, zh, unk = plan["en"], plan["zh"], plan["unk"]
    assert en.tok_total == 6 and zh.tok_total == 2 and unk.tok_total == 1
    # required = 9*0.5 = 4 (floor); en rate = 4/6 -> 666666 ppm, 1 epoch
    assert en.required_tokens == 4 and en.rate_ppm == 666_666 and en.epochs == 1
    # zh rate = 4/2 -> 2_000_000 ppm -> 2 epochs (upsampled)
    assert zh.rate_ppm == 2_000_000 and zh.epochs == 2
    # unlisted group: rate 0, dropped
    assert unk.target_ppm == 0 and unk.rate_ppm == 0 and unk.epochs == 0


def test_related_docs_ranks_shared_rare_shingles(spark):
    rare = "alpha beta gamma delta"
    boiler = "the quick brown fox"
    docs = [
        (1, f"{rare} one two three"),
        (2, f"{rare} four five six"),
        (3, f"{boiler} seven"),
        (4, f"{boiler} eight"),
        (5, f"{boiler} nine"),
        (6, "nothing shared here at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = related_docs(df, "text", "doc_id", shingle_k=4, max_df=2, k=3).collect()
    pairs = {(r.doc_id, r.related_id) for r in out}
    # docs 1-2 share the rare 4-gram; boilerplate shared by 3 docs exceeds
    # max_df=2 so 3/4/5 never pair; doc 6 shares nothing
    assert (1, 2) in pairs and (2, 1) in pairs
    assert not any(a in (3, 4, 5, 6) or b in (3, 4, 5, 6) for a, b in pairs)


def test_trimmed_mean_drops_exact_tail_ranks(spark):
    rows = [("g", float(v), i) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    df = spark.createDataFrame(rows, "grp string, value double, id long")
    out = trimmed_mean(df, "grp", "value", "id", trim_ppm=100_000).collect()[0]
    # n=10: drop rank 1 (value 1) and rank 10 (value 1000); keep 2..9
    assert out.n_kept == 8
    assert out.sum_cents == sum(v * 100 for v in range(2, 10))
    assert out.mean_millicents == (out.sum_cents * 1000) // 8


def test_trimmed_mean_zero_trim_is_plain_mean(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 2.0, 2)], "grp string, value double, id long"
    )
    out = trimmed_mean(df, "grp", "value", "id", trim_ppm=0).collect()[0]
    assert out.n_kept == 2 and out.sum_cents == 300


def test_score_calibration_percent_rank_with_ties(spark):
    from etl_healthcare_spark.operators.sampling import score_calibration

    # source s1: scores 1,2,2,4 tokens -> pct = 0, 333333, 333333, 1000000
    docs = [
        (1, "a", "s1"),
        (2, "a b", "s1"),
        (3, "c d", "s1"),
        (4, "a b c d", "s1"),
        (5, "x y z", "s2"),  # single-doc source -> pct 0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in score_calibration(df, "text", "doc_id", "source", keep_ppm=900_000).collect()}
    assert out[1].pct_ppm == 0
    assert out[2].pct_ppm == out[3].pct_ppm == 333_333
    assert out[4].pct_ppm == 1_000_000 and out[4].kept
    assert out[5].pct_ppm == 0 and not out[5].kept
    assert not out[2].kept


def test_hard_negatives_band_excludes_positives_and_far(spark):
    from etl_healthcare_spark.operators.similarity import hard_negatives

    # anchor = (1, 0); duplicate (cos 1.0) excluded by hi=0.8; orthogonal
    # (cos 0) and opposite excluded by lo=0.3; the 45-degree vector
    # (cos ~0.707) is the only in-band negative
    rows = [
        (0, [1.0, 0.0]),     # anchor
        (1, [1.0, 0.001]),   # near-duplicate -> above hi
        (2, [1.0, 1.0]),     # cos ~0.707 -> in band
        (3, [0.0, 1.0]),     # orthogonal -> below lo
        (4, [-1.0, 0.0]),    # opposite -> dot < 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = hard_negatives(
        df, "embedding", "vec_id", query_pred=F.col("vec_id") == 0,
        lo_ppm=300_000, hi_ppm=800_000, k=5,
    ).collect()
    assert [(r.anchor_id, r.negative_id) for r in out] == [(0, 2)]


def test_sql_frontdoor_matches_dataframe_plan(spark):
    from etl_healthcare_spark.plans.registry import REGISTRY

    df = REGISTRY["sql_topn_hours"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 15  # 5 event types x top-3 hours
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == [1, 2, 3]
        assert rs[0].n >= rs[1].n >= rs[2].n
