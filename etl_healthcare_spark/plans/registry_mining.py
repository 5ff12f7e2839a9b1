"""Round-3 mining batch: graph reachability (multi-source BFS) and k-core
peeling, skew-salted and spatial grid-blocked joins,
changepoint/autocovariance/cross-covariance time-series moments, rank-exact
MAD outliers, asymmetric containment dedup, chi-squared corpus keyness,
cosine range search, PCM autocorrelation from real WAV bytes, and
small-file compaction planning.

All queries follow the registry's cross-engine determinism conventions
(integer/ppm/decimal(38,0) arithmetic, sha256-only hashing, total tiebreaks —
see plans/registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t, register

# ---------------------------------------------------------------------------
# graph: multi-source BFS hop distance
# ---------------------------------------------------------------------------

_BFS_EDGES_SQL = """raw AS (
      SELECT o_orderkey % 97 AS s, (o_orderkey * 13 + o_custkey) % 97 AS t
      FROM orders WHERE o_orderkey % 5 = 0
    )"""
_BFS_SEEDS_SQL = "SELECT * FROM (VALUES (0), (7), (23)) AS seeds(node)"
_BFS_HOPS = 4


def _bfs_oracle() -> str:
    from ..operators.graph import bfs_oracle_sql

    return bfs_oracle_sql(_BFS_EDGES_SQL, _BFS_SEEDS_SQL, _BFS_HOPS)


@register(
    "graph_bfs_hops",
    sql=_bfs_oracle(),
    doc="Multi-source BFS: shortest hop distance from a seed set, bounded to "
    "4 rounds (operators/graph.bfs_hops) — the contamination-trace primitive "
    "('everything within k dedup-graph hops of a flagged document').  Pregel "
    "frontier expansion in DataFrame ops: per round one node-keyed equi-join "
    "plus one anti-join against the visited set, frontier holds only NEWLY "
    "discovered nodes, visited localCheckpoints per round.  The oracle is a "
    "bounded recursive CTE collapsed by min(hops).",
)
def graph_bfs_hops(spark, sf_dir):
    from ..operators.graph import bfs_hops

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 5 == 0)
    edges = o.select(
        (F.col("o_orderkey") % 97).alias("a"),
        ((F.col("o_orderkey") * 13 + F.col("o_custkey")) % 97).alias("b"),
    )
    seeds = spark.range(0, 1).select(
        F.explode(F.array(F.lit(0), F.lit(7), F.lit(23))).alias("node")
    )
    return bfs_hops(edges, seeds, max_hops=_BFS_HOPS)


# ---------------------------------------------------------------------------
# joins: skew-salted shuffle join
# ---------------------------------------------------------------------------


@register(
    "j9_salted_skew_join",
    sql="""
    WITH fact AS (
      SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0 ELSE l_orderkey % 100 END AS key,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_cents
      FROM lineitem
    ),
    dim AS (
      SELECT p_partkey % 100 AS key, count(*) AS n_parts,
             sum(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS retail_cents
      FROM part GROUP BY 1
    )
    SELECT f.key, count(*) AS n_rows, CAST(sum(f.qty_cents) AS BIGINT) AS qty_cents,
           max(d.n_parts) AS n_parts, CAST(max(d.retail_cents) AS BIGINT) AS retail_cents
    FROM fact f JOIN dim d USING (key)
    GROUP BY f.key
    """,
    doc="Skew-proof shuffle join (operators/skew.salted_join): ~70% of fact "
    "rows share ONE key — the regime where a plain shuffle join puts the hot "
    "key on one reduce task and AQE's partition splitting cannot help "
    "(a single key bigger than memory still lands together).  The fact side "
    "salts on xxhash64(row id) % 16, the dim side replicates across all 16 "
    "salt values via a literal sequence+explode, the join keys on "
    "(key, salt) — row-identical to the plain join (the oracle IS the plain "
    "join), hot-key work spread over 16 tasks.  Post-join rollup keeps the "
    "output key-sized.",
)
def j9_salted_skew_join(spark, sf_dir):
    from ..operators.skew import salted_join

    cents = lambda c: (F.col(c).cast("decimal(18,2)") * 100).cast("long")  # noqa: E731
    li = _t(spark, sf_dir, "lineitem")
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(0))
        .otherwise(F.col("l_orderkey") % 100)
        .cast("long")
        .alias("key"),
        cents("l_quantity").alias("qty_cents"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("row_id"),
    )
    dim = (
        _t(spark, sf_dir, "part")
        .groupBy((F.col("p_partkey") % 100).cast("long").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(cents("p_retailprice")).alias("retail_cents"),
        )
    )
    joined = salted_join(fact, dim, "key", salt_source=F.col("row_id"), buckets=16)
    return joined.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("qty_cents").alias("qty_cents"),
        F.max("n_parts").alias("n_parts"),
        F.max("retail_cents").alias("retail_cents"),
    )


# ---------------------------------------------------------------------------
# time series: CUSUM changepoint, autocovariance, cross-covariance
# ---------------------------------------------------------------------------


def _cusum_oracle() -> str:
    from ..operators.anomaly import cusum_oracle_sql

    return cusum_oracle_sql("events", "ts", "event_type")


@register(
    "anomaly_cusum",
    sql=_cusum_oracle(),
    doc="Offline CUSUM changepoint scan (operators/anomaly.cusum_changepoint): "
    "per event type, the hour where the cumulative mean-removed sum "
    "S_t = sum(n*x_i - T) peaks in magnitude — the level-shift locator "
    "complementing anomaly_seasonal's pointwise flags.  All-integer "
    "cross-multiplied arithmetic, (abs_s, hour) total tiebreak; one "
    "bucket-count aggregation + one per-group ordered window.",
)
def anomaly_cusum(spark, sf_dir):
    from ..operators.anomaly import cusum_changepoint

    return cusum_changepoint(_t(spark, sf_dir, "events"), "ts", "event_type")


def _autocov_oracle() -> str:
    from ..operators.stats import autocov_oracle_sql

    return autocov_oracle_sql("events", "ts", "event_type", lags=(1, 2))


@register(
    "w9_autocov",
    sql=_autocov_oracle(),
    doc="Lag-1/lag-2 autocovariance numerators of the hourly volume series "
    "per event type (operators/stats.autocov_lags): dev_t = n*x_t - T exact "
    "int64, products promoted to decimal(38,0)/HUGEINT, both lags computed "
    "in ONE ordered window pass then unpivoted map-side with stack().  The "
    "persistence diagnostic behind alarm debouncing (high lag-1: shocks "
    "linger; flip-flopping sign: oscillating load).",
)
def w9_autocov(spark, sf_dir):
    from ..operators.stats import autocov_lags

    return autocov_lags(_t(spark, sf_dir, "events"), "ts", "event_type", lags=(1, 2))


def _crosscov_oracle() -> str:
    from ..operators.stats import cross_covariance_oracle_sql

    return cross_covariance_oracle_sql("events", "ts", "event_type")


@register(
    "g21_cross_covariance",
    sql=_crosscov_oracle(),
    doc="Cross-covariance numerators between every PAIR of event types' "
    "hourly volume series (operators/stats.cross_covariance) — 'which "
    "signals move together' correlation mining.  The self-join runs on the "
    "PRE-AGGREGATED (type, hour, count) table (bounded by |types| x time "
    "range, never row-level), keyed on the hour bucket; n*Sab - Sa*Sb in "
    "decimal(38,0)/HUGEINT.",
)
def g21_cross_covariance(spark, sf_dir):
    from ..operators.stats import cross_covariance

    return cross_covariance(_t(spark, sf_dir, "events"), "ts", "event_type")


# ---------------------------------------------------------------------------
# dedup: asymmetric containment
# ---------------------------------------------------------------------------


def _containment_oracle() -> str:
    from ..operators.textops import containment_oracle_sql

    return containment_oracle_sql(k=5, max_span_df=8)


@register(
    "dedup_containment",
    sql=_containment_oracle(),
    doc="Asymmetric n-gram CONTAINMENT |A∩B| / min(|A|,|B|) over rare-span "
    "candidate pairs (operators/textops.containment_pairs) — catches a short "
    "document embedded verbatim in a long one, which symmetric Jaccard "
    "structurally misses (quote inside a page: J≈0.01, C=1.0; Broder's "
    "containment).  Blocking: pairs only from shared 5-gram spans with "
    "2<=df<=8 (rare-feature blocking à la j7) — pair volume linear in corpus "
    "size; the intersection count is candidate-bounded via hash joins back "
    "to the two span sets.  Exact integer ppm.",
)
def dedup_containment(spark, sf_dir):
    from ..operators.textops import containment_pairs

    return containment_pairs(_t(spark, sf_dir, "documents"), "text", "doc_id", k=5, max_span_df=8)


# ---------------------------------------------------------------------------
# text: chi-squared keyness between corpus slices
# ---------------------------------------------------------------------------


def _chi2_oracle() -> str:
    from ..operators.textops import chi2_keyness_oracle_sql

    return chi2_keyness_oracle_sql("lang = 'en'", min_total=20, top_n=50)


@register(
    "corpus_chi2_keyness",
    sql=_chi2_oracle(),
    doc="Chi-squared keyness of every token between the lang='en' slice and "
    "the rest (operators/textops.chi2_keyness) — the corpus-drift test run "
    "before a training-mix change.  chi2 = N(ad-bc)^2/((a+b)(c+d)(a+c)(b+d)) "
    "computed EXACTLY in decimal(38,0)/HUGEINT (numerator ~1e33 at sf1.0), "
    "floor millis emitted via (num - num % den)/den so both engines agree "
    "bit-for-bit.  One conditional-sum token aggregation + a 1-row broadcast "
    "+ TakeOrderedAndProject.",
)
def corpus_chi2_keyness(spark, sf_dir):
    from ..operators.textops import chi2_keyness

    return chi2_keyness(
        _t(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        side_pred=F.col("lang") == "en",
        min_total=20,
        top_n=50,
    )


# ---------------------------------------------------------------------------
# similarity: cosine range (radius) search
# ---------------------------------------------------------------------------


def _range_search_oracle() -> str:
    from ..operators.similarity import range_search_oracle_sql

    return range_search_oracle_sql(query_mod=97, tau_ppm=200_000, scale=1_000, max_query_id=1000)


@register(
    "sim_range_search",
    sql=_range_search_oracle(),
    doc="Cosine RANGE search: all corpus vectors within tau=0.2 of each "
    "query vector (queries = vec_id % 97 == 0 below 1000 — a FIXED query "
    "batch at any sf, so the scan stays linear in the corpus alone), "
    "decided by the fully "
    "cross-multiplied integer predicate dot^2 * 1e12 >= tau_ppm^2 * "
    "|v|^2 * |q|^2 in decimal(38,0)/HUGEINT — no sqrt, no division "
    "(operators/similarity.range_search).  The query batch broadcasts; the "
    "scan is MAP-ONLY (zero shuffle).  Bounds result QUALITY where top-k "
    "bounds COUNT — the retrieval-filtering shape.",
)
def sim_range_search(spark, sf_dir):
    from ..operators.similarity import range_search

    return range_search(
        _t(spark, sf_dir, "embeddings"),
        "embedding",
        "vec_id",
        query_pred=(F.col("vec_id") % 97 == 0) & (F.col("vec_id") < 1000),
        tau_ppm=200_000,
        scale=1_000,
    )


# ---------------------------------------------------------------------------
# layout: small-file compaction planning
# ---------------------------------------------------------------------------


def _compaction_oracle() -> str:
    from ..operators.bucketing import compaction_oracle_sql

    return compaction_oracle_sql("events", "event_type", "ts", "props", target_bytes=262_144)


@register(
    "layout_compaction",
    sql=_compaction_oracle(),
    doc="Small-file compaction planner (operators/bucketing.compaction_plan): "
    "bin-packs each partition's hourly micro-files into ~256 KiB output "
    "files by next-fit over the TIME order — consecutive hours stay in one "
    "output file, so compacted footer min/max stats still prune timestamp "
    "predicates (size-sorted first-fit would destroy that).  Exact integer "
    "byte accounting; one aggregation + one ordered window.",
)
def layout_compaction(spark, sf_dir):
    from ..operators.bucketing import compaction_plan

    return compaction_plan(
        _t(spark, sf_dir, "events"), "event_type", "ts", "props", target_bytes=262_144
    )


# ---------------------------------------------------------------------------
# graph: k-core decomposition (fixed peel rounds)
# ---------------------------------------------------------------------------

_KCORE_EDGES_SQL = """raw AS (
      SELECT o_orderkey % 211 AS s, (o_orderkey * 7 + o_custkey) % 211 AS t
      FROM orders WHERE o_orderkey % 45 = 0
      UNION ALL
      SELECT a.n AS s, b.n AS t
      FROM (SELECT unnest(generate_series(0, 208, 13)) AS n) a,
           (SELECT unnest(generate_series(0, 208, 13)) AS n) b
      WHERE a.n < b.n
    )"""


def _kcore_oracle() -> str:
    from ..operators.graph import kcore_oracle_sql

    return kcore_oracle_sql(_KCORE_EDGES_SQL, k=10, rounds=4)


@register(
    "graph_kcore",
    sql=_kcore_oracle(),
    doc="k-core peeling (k=10, 4 fixed rounds; operators/graph.kcore_nodes): "
    "repeatedly drop nodes with degree < k — the dense-region extractor "
    "behind spam-farm detection and hub isolation (chains and tendrils peel "
    "away, a k-core survives only where every member keeps k surviving "
    "neighbors).  The workload plants a 17-clique inside a sparse random "
    "graph: peeling must dissolve the random part (mean degree ~3 at "
    "sf0.01) and keep exactly the clique — verified converged (rounds 4 and 6 "
    "identical).  Per round one partial-aggregable degree count + two "
    "node-keyed semi-joins; edges localCheckpoint per round, work shrinks "
    "monotonically.  The oracle unrolls the same 4 rounds as CTEs.",
)
def graph_kcore(spark, sf_dir):
    from ..operators.graph import kcore_nodes

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 45 == 0)
    rand_edges = o.select(
        (F.col("o_orderkey") % 211).alias("a"),
        ((F.col("o_orderkey") * 7 + F.col("o_custkey")) % 211).alias("b"),
    )
    nodes = spark.range(0, 209, 13).select(F.col("id").alias("n"))
    clique = (
        nodes.select(F.col("n").alias("a"))
        .crossJoin(F.broadcast(nodes.select(F.col("n").alias("b"))))
        .where(F.col("a") < F.col("b"))
    )
    return kcore_nodes(rand_edges.unionAll(clique), k=10, rounds=4)


# ---------------------------------------------------------------------------
# joins: spatial grid-blocked distance pairing
# ---------------------------------------------------------------------------

_SPATIAL_PTS_SQL = """pts AS (
      SELECT c_custkey AS id, (c_custkey * 7919) % 500 AS x,
             (c_custkey * 104729) % 500 AS y
      FROM customer WHERE c_custkey <= 15000
    )"""


def _spatial_oracle() -> str:
    from ..operators.spatial import chebyshev_oracle_sql

    return chebyshev_oracle_sql(_SPATIAL_PTS_SQL, dist=2)


@register(
    "j10_spatial_pairs",
    sql=_spatial_oracle(),
    doc="Spatial distance-threshold join (operators/spatial.chebyshev_pairs): "
    "all point pairs within Chebyshev distance 2 on an integer grid, found "
    "by grid-cell blocking — each point probes its 3x3 cell neighborhood "
    "(9x map-side explode, in-task) and hash-joins the home-cell side; the "
    "exact predicate filters survivors.  Pair cost bounded by cell density, "
    "never n^2; the oracle IS the naive quadratic join, so blocking must be "
    "provably lossless.  Probe<home id ordering emits each pair exactly "
    "once with no distinct.  Fixed 15k-point workload (scale-invariant "
    "result, like j8).",
)
def j10_spatial_pairs(spark, sf_dir):
    from ..operators.spatial import chebyshev_pairs

    pts = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") <= 15000)
        .select(
            F.col("c_custkey").alias("id"),
            ((F.col("c_custkey") * 7919) % 500).alias("x"),
            ((F.col("c_custkey") * 104729) % 500).alias("y"),
        )
    )
    return chebyshev_pairs(pts, "id", "x", "y", dist=2, cell=4)


# ---------------------------------------------------------------------------
# multimodal: PCM autocorrelation from real WAV bytes
# ---------------------------------------------------------------------------


@register(
    "mm_audio_autocorr",
    sql="""
    WITH src AS (SELECT doc_id FROM documents WHERE doc_id < 400),
    wav AS (
      SELECT doc_id, 32 + (doc_id % 8) * 8 AS n, doc_id % 251 AS seed FROM src
    ),
    s AS (
      SELECT doc_id, n, j,
             (j * 73 + seed) % 65536
               - CASE WHEN (j * 73 + seed) % 65536 >= 32768 THEN 65536 ELSE 0 END AS v
      FROM (SELECT doc_id, seed, n, unnest(generate_series(0, n - 1)) AS j FROM wav)
    ),
    lags AS (SELECT unnest(generate_series(0, 3)) AS lag)
    SELECT a.doc_id AS id, CAST(l.lag AS INT) AS lag,
           CAST(count(*) AS INT) AS n_terms, CAST(sum(a.v * b.v) AS BIGINT) AS r
    FROM lags l
    JOIN s a ON TRUE
    JOIN s b ON b.doc_id = a.doc_id AND b.j = a.j + l.lag
    GROUP BY a.doc_id, l.lag
    """,
    doc="Exact integer PCM autocorrelation r_k = sum s_t*s_{t+k}, k=0..3, "
    "from REAL decoded WAV bytes in the Arrow-batched mapInPandas kernel "
    "(operators/multimodal.audio_autocorr) — the periodicity/pitch screen "
    "of a speech curation pipeline (r_0 = energy; tonal clips hold |r_k| "
    "high at their period).  The oracle regenerates every sample "
    "arithmetically, so a chunk-walk/endianness/sign bug cannot hash-match; "
    "lag fan-out happens in-task.",
)
def mm_audio_autocorr(spark, sf_dir):
    from ..operators.multimodal import audio_autocorr, synth_wav_with_samples

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    d = F.col("doc_id")
    media = docs.select(
        "doc_id",
        synth_wav_with_samples(
            F.lit(8000), F.lit(1), F.lit(32) + (d % 8) * 8, d % 251
        ).alias("payload"),
    )
    return audio_autocorr(media, "doc_id", "payload", max_lag=3)


# ---------------------------------------------------------------------------
# anomaly: rank-exact MAD outliers
# ---------------------------------------------------------------------------


def _mad_oracle() -> str:
    from ..operators.anomaly import mad_oracle_sql

    return mad_oracle_sql("events", "event_type", "value", "event_id")


@register(
    "anomaly_mad",
    sql=_mad_oracle(),
    doc="Median-absolute-deviation outliers (operators/anomaly.mad_flags): "
    "|v - median| > 3 * 1.4826 * MAD by the exact integer cross-multiply "
    "10000*dev > 44478*mad — the robust rule that survives what breaks "
    "z-score (outliers drag mean and stddev) and IQR (degenerate under "
    ">50% ties).  Both medians rank-exact lower medians (r = (n+1) div 2) "
    "with (value, id) total tiebreaks; two per-group windows + broadcast "
    "joins back over a map-only flagging pass.",
)
def anomaly_mad(spark, sf_dir):
    from ..operators.anomaly import mad_flags

    return mad_flags(_t(spark, sf_dir, "events"), "event_type", "value", "event_id")


# ---------------------------------------------------------------------------
# text: cross-corpus trigram LM with stupid backoff
# ---------------------------------------------------------------------------


def _lm_bo_oracle() -> str:
    from ..operators.textops import lm_trigram_backoff_oracle_sql

    return lm_trigram_backoff_oracle_sql("lang = 'en'")


@register(
    "text_lm_trigram",
    sql=_lm_bo_oracle(),
    doc="CROSS-CORPUS trigram LM scoring with stupid backoff (Brants et al. "
    "2007; operators/textops.lm_trigram_backoff_scores): train on the "
    "lang='en' slice, score every other document against it — the CCNet "
    "held-out shape where backoff is real (unseen trigram -> 0.4 x bigram "
    "-> 0.16 x unigram, the alphas applied as exact integer "
    "cross-multiplies).  Three vocab-sized count aggregations on the train "
    "slice, three LEFT joins keyed on token tuples for scoring, one per-doc "
    "integer mean.  Complements the self-trained bigram proxy "
    "(text_lm_score).",
)
def text_lm_trigram(spark, sf_dir):
    from ..operators.textops import lm_trigram_backoff_scores

    return lm_trigram_backoff_scores(
        _t(spark, sf_dir, "documents"), "text", "doc_id", side_pred=F.col("lang") == "en"
    )


# ---------------------------------------------------------------------------
# aggregation: exact per-group mode
# ---------------------------------------------------------------------------


@register(
    "g22_mode",
    sql="""
    WITH counts AS (
      SELECT user_id % 100 AS cohort, event_type, count(*) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT cohort, event_type AS mode_type, cnt FROM (
      SELECT cohort, event_type, cnt,
             row_number() OVER (PARTITION BY cohort ORDER BY cnt DESC, event_type) AS rn
      FROM counts
    ) WHERE rn = 1
    """,
    doc="Exact per-group MODE (most frequent event type per user cohort) "
    "with a (count DESC, value ASC) total tiebreak — the SQL:2023 MODE() "
    "aggregate the engine's surface was missing.  One partial-aggregable "
    "histogram (|cohorts| x |types| rows) then a window over the TINY "
    "aggregated table — never a row-level window.",
)
def g22_mode(spark, sf_dir):
    from pyspark.sql import Window

    counts = (
        _t(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 100).alias("cohort"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("cohort").orderBy(F.col("cnt").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("cohort", F.col("event_type").alias("mode_type"), "cnt")
    )


# ---------------------------------------------------------------------------
# dedup: longest duplicated token run (substring-level, Lee et al. 2021)
# ---------------------------------------------------------------------------


def _longest_run_oracle() -> str:
    from ..operators.textops import longest_run_oracle_sql

    return longest_run_oracle_sql(k=5, max_span_df=8)


@register(
    "dedup_longest_run",
    sql=_longest_run_oracle(),
    doc="Longest duplicated token run per candidate pair "
    "(operators/textops.longest_shared_run) — the substring-level signal of "
    "Lee et al. 2021 (arXiv:2107.06499: remove exact duplicated spans >= 50 "
    "tokens), measured pairwise via gaps-and-islands over matching 5-gram "
    "positions on each (a, b, diagonal): a length-L island = an exact "
    "shared run of L+4 tokens.  Rare-span blocking bounds candidates; the "
    "position join is candidate-bounded.  Exact integers.",
)
def dedup_longest_run(spark, sf_dir):
    from ..operators.textops import longest_shared_run

    return longest_shared_run(_t(spark, sf_dir, "documents"), "text", "doc_id", k=5, max_span_df=8)


# ---------------------------------------------------------------------------
# similarity: ANN recall self-evaluation
# ---------------------------------------------------------------------------


def _recall_oracle() -> str:
    from ..operators.similarity import ann_recall_oracle_sql

    return ann_recall_oracle_sql(query_mod=97, plane_lo=1, plane_hi=8, k=10, max_query_id=1000)


@register(
    "sim_recall_report",
    sql=_recall_oracle(),
    doc="Recall@10 of single-bucket hyperplane-LSH retrieval vs exact search, "
    "per query (operators/similarity.ann_recall_report) — the index quality "
    "gate run BEFORE trusting probes at scale, as a first-class query.  "
    "Both rankings share one deterministic integer metric (multiprobe's "
    "int-dot / int-norm), so the recall number isolates bucketing loss; "
    "buckets are integer-exact sign decisions (hyperplane_bucket_exact).  "
    "One scored-pair shuffle, two windows, one semi-join.",
)
def sim_recall_report(spark, sf_dir):
    from ..operators.similarity import ann_recall_report

    emb = _t(spark, sf_dir, "embeddings")
    rows = (
        emb.where(F.col("vec_id").between(1, 8)).orderBy("vec_id").select("embedding").collect()
    )
    planes = [list(r[0]) for r in rows]
    return ann_recall_report(
        emb,
        "embedding",
        "vec_id",
        query_pred=(F.col("vec_id") % 97 == 0) & (F.col("vec_id") < 1000),
        planes=planes,
        k=10,
    )
