"""Round-3 corpus-serving batch: RAG chunk windows, training-mix planning,
related-document recommendation, and rank-exact trimmed means.

These close the retrieval/training-prep loop around the curation operators:
chunking feeds the embedding index the similarity family probes, the mixture
plan turns curated per-slice token masses into sampling rates, related-docs
is the lexical twin of embedding k-NN, and the trimmed mean is the robust
dashboard statistic between g11_median and plain AVG.

All queries follow the registry's cross-engine determinism conventions
(integer/ppm/decimal(38,0) arithmetic, sha256-only hashing, total tiebreaks —
see plans/registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t, register
from ..functions.materialize import materialize

# ---------------------------------------------------------------------------
# text: RAG chunking into overlapping token windows
# ---------------------------------------------------------------------------

_CHUNK_WIN, _CHUNK_STRIDE = 64, 48


def _chunk_oracle() -> str:
    from ..operators.textops import chunk_windows_oracle_sql

    return chunk_windows_oracle_sql(window=_CHUNK_WIN, stride=_CHUNK_STRIDE)


@register(
    "text_chunk_windows",
    sql=_chunk_oracle(),
    doc="RAG chunking (operators/textops.chunk_windows): every document "
    "split into 64-token windows with stride 48 (16-token overlap), each "
    "chunk carrying a deterministic (doc_id, chunk_idx) identity and a "
    "sha256 chunk hash for chunk-level exact dedup before any embedding "
    "cost is paid.  The fan-out is a sequence+explode+slice INSIDE the scan "
    "task — zero shuffle, scan-bandwidth-bound at 100 TB.",
)
def text_chunk_windows(spark, sf_dir):
    from ..operators.textops import chunk_windows

    return chunk_windows(
        _t(spark, sf_dir, "documents"), "text", "doc_id", window=_CHUNK_WIN, stride=_CHUNK_STRIDE
    )


# ---------------------------------------------------------------------------
# sampling: training-mix plan from target weights
# ---------------------------------------------------------------------------

_MIX_TARGET = {"en": 400_000, "zh": 200_000, "de": 150_000, "fr": 150_000, "es": 100_000}


def _mixture_oracle() -> str:
    from ..operators.sampling import mixture_plan_oracle_sql

    return mixture_plan_oracle_sql("lang", _MIX_TARGET)


@register(
    "sample_mixture_plan",
    sql=_mixture_oracle(),
    doc="Training-mix planning (operators/sampling.mixture_plan): per-lang "
    "token mass -> sampling rate / ceil-epochs against literal target "
    "weights (en 40% / zh 20% / de+fr 15% / es 10%; NULL and unlisted "
    "langs rate 0) — the LLaMA-style data-mixture table.  ONE partial-"
    "aggregable groupBy over per-doc token counts, a 1-row grand total and "
    "the weights table broadcast back; decimal(38,0)/HUGEINT products so "
    "the ppm math is exact at any corpus size.",
)
def sample_mixture_plan(spark, sf_dir):
    from ..operators.sampling import mixture_plan

    return mixture_plan(_t(spark, sf_dir, "documents"), "text", "lang", _MIX_TARGET)


# ---------------------------------------------------------------------------
# search: related documents (more-like-this)
# ---------------------------------------------------------------------------


def _related_oracle() -> str:
    from ..operators.search import related_docs_oracle_sql

    return related_docs_oracle_sql(shingle_k=4, max_df=16, k=5)


@register(
    "search_related_docs",
    sql=_related_oracle(),
    doc="Top-5 related documents per document by summed integer-idf weight "
    "of shared rare 4-gram shingles (operators/search.related_docs) — the "
    "lexical complement to embedding k-NN.  Shingles (not tokens) are the "
    "blocking feature because their variety is combinatorial: rare features "
    "exist even over a closed vocabulary.  Candidates come only from "
    "shingles with 2<=df<=16, bounding pair volume to max_df x |postings| "
    "(linear in the corpus, like j7/dedup_containment rare-feature "
    "blocking); pair joins carry shuffle_hash hints because every input "
    "descends from an aggregation (the sf1.0 broadcast-estimate lesson); "
    "per-doc top-k runs as a WindowGroupLimit rank, not a global sort.",
)
def search_related_docs(spark, sf_dir):
    from ..operators.search import related_docs

    return related_docs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", shingle_k=4, max_df=16, k=5
    )


# ---------------------------------------------------------------------------
# aggregation: rank-exact two-sided trimmed mean
# ---------------------------------------------------------------------------


def _trimmed_oracle() -> str:
    from ..operators.stats import trimmed_mean_oracle_sql

    return trimmed_mean_oracle_sql("events", "event_type", "value", "event_id")


@register(
    "g24_trimmed_mean",
    sql=_trimmed_oracle(),
    doc="10%-each-side trimmed mean of event value per type "
    "(operators/stats.trimmed_mean): rank-exact drop of floor(n/10) rows "
    "per tail under a (value, id) total order, mean emitted as exact "
    "(sum_cents, n_kept, floor-millicents) — the robust location estimate "
    "between AVG and g11_median.  One hash shuffle; the rank window reuses "
    "the group partitioning.",
)
def g24_trimmed_mean(spark, sf_dir):
    from ..operators.stats import trimmed_mean

    return trimmed_mean(_t(spark, sf_dir, "events"), "event_type", "value", "event_id")


# ---------------------------------------------------------------------------
# sampling: per-source quality-score calibration
# ---------------------------------------------------------------------------


def _calibration_oracle() -> str:
    from ..operators.sampling import score_calibration_oracle_sql

    return score_calibration_oracle_sql("source", keep_ppm=700_000)


@register(
    "sample_score_calibration",
    sql=_calibration_oracle(),
    doc="Per-source quality-score calibration "
    "(operators/sampling.score_calibration): each doc's score becomes its "
    "exact percent_rank WITHIN its source (integer ppm), so one global "
    "keep threshold means the same thing in a clean source and a noisy one "
    "— the guard against a raw cutoff silently dropping whole domains.  "
    "Scale shape: the rank window runs over the aggregated "
    "(source, score)-count table, never row-level (a partitionBy(source) "
    "row window would sort billions of rows on one task); the tiny pct map "
    "broadcast-joins back map-only.  The oracle derives the same "
    "percent_rank the OTHER way (row-level rank window) — two independent "
    "derivations cross-checked.",
)
def sample_score_calibration(spark, sf_dir):
    from ..operators.sampling import score_calibration

    return score_calibration(
        _t(spark, sf_dir, "documents"), "text", "doc_id", "source", keep_ppm=700_000
    )


# ---------------------------------------------------------------------------
# similarity: contrastive hard-negative mining
# ---------------------------------------------------------------------------


def _hardneg_oracle() -> str:
    from ..operators.similarity import hard_negatives_oracle_sql

    return hard_negatives_oracle_sql(
        query_mod=97, lo_ppm=300_000, hi_ppm=800_000, k=5, scale=1_000, max_query_id=1000
    )


@register(
    "sim_hard_negatives",
    sql=_hardneg_oracle(),
    doc="Contrastive hard-negative mining "
    "(operators/similarity.hard_negatives): per anchor vector, the top-5 "
    "corpus vectors with cosine in the [0.3, 0.8) band — similar enough to "
    "teach, below the near-duplicate bound that would poison the negatives "
    "(the embedding-finetuning / reranker-distillation recipe).  Band "
    "membership and ranking are sqrt-free cross-multiplied integer "
    "predicates in decimal(38,0)/HUGEINT; anchors are the fixed "
    "vec_id%97==0<1000 batch (sf-invariant), broadcast over a MAP-ONLY "
    "scan; the only shuffle is the per-anchor top-k WindowGroupLimit.",
)
def sim_hard_negatives(spark, sf_dir):
    from ..operators.similarity import hard_negatives

    return hard_negatives(
        _t(spark, sf_dir, "embeddings"),
        "embedding",
        "vec_id",
        query_pred=(F.col("vec_id") % 97 == 0) & (F.col("vec_id") < 1000),
        lo_ppm=300_000,
        hi_ppm=800_000,
        k=5,
        scale=1_000,
    )


# ---------------------------------------------------------------------------
# query surface: the SQL front door (spark.sql over registered views)
# ---------------------------------------------------------------------------

_SQL_TOPN_HOURS = """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM {events} GROUP BY event_type, date_trunc('hour', ts)
    )
    SELECT event_type, {epoch_us}(h) AS h_us, n, {rk_cast} AS rk
    FROM (SELECT *, rank() OVER (PARTITION BY event_type
                                 ORDER BY n DESC, h) AS rk
          FROM hourly)
    WHERE rk <= 3
"""


@register(
    "sql_topn_hours",
    sql=_SQL_TOPN_HOURS.format(events="events", epoch_us="epoch_us", rk_cast="CAST(rk AS INTEGER)"),
    doc="The SQL FRONT DOOR: the same engine driven through spark.sql() text "
    "over a registered temp view — CTE + grouped aggregation + rank window "
    "+ a total (n DESC, h) tiebreak, the top-3 busiest hours per event "
    "type.  Everything else in the registry declares plans via the "
    "DataFrame API; this entry proves SQL-text parity (identical Catalyst "
    "plan: partial agg -> one exchange -> WindowGroupLimit rank) for users "
    "who arrive with SQL, not Python.",
)
def sql_topn_hours(spark, sf_dir):
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_sql_v")
    return spark.sql(
        _SQL_TOPN_HOURS.format(events="events_sql_v", epoch_us="unix_micros", rk_cast="rk")
    )


# ---------------------------------------------------------------------------
# sampling: prototype-based data pruning (SSL prototypes)
# ---------------------------------------------------------------------------

_PROTO_WHERE_SQL = "vec_id % 61 = 0 AND vec_id < 400"
_PROTO_PRUNE_PPM = 250_000


def _proto_prune_oracle() -> str:
    from ..operators.sampling import prototype_prune_oracle_sql

    return prototype_prune_oracle_sql(_PROTO_WHERE_SQL, prune_ppm=_PROTO_PRUNE_PPM, scale=1_000)


@register(
    "sample_prototype_prune",
    sql=_proto_prune_oracle(),
    doc="Prototype-based data pruning (Sorscher et al. 2022, "
    "arXiv:2206.14486; operators/sampling.prototype_prune): every embedding "
    "assigns to its nearest prototype by an exact signed integer cosine "
    "surrogate, clusters rank by prototypicality, and the most-prototypical "
    "25% of each cluster is marked pruned — keeping the hard examples the "
    "paper shows beat power-law scaling at large corpus size.  The 7 fixed "
    "prototypes (vec_id%61==0<400, sf-invariant) are driver-collected into "
    "literal arrays, so assignment is MAP-ONLY (m int64 dots + one "
    "array_max inside the scan task); the single shuffle is the per-cluster "
    "rank/count window.",
)
def sample_prototype_prune(spark, sf_dir):
    from ..operators.sampling import prototype_prune

    return prototype_prune(
        _t(spark, sf_dir, "embeddings"),
        "embedding",
        "vec_id",
        (F.col("vec_id") % 61 == 0) & (F.col("vec_id") < 400),
        prune_ppm=_PROTO_PRUNE_PPM,
        scale=1_000,
    )


# ---------------------------------------------------------------------------
# sampling: deterministic curriculum interleave (training epoch order)
# ---------------------------------------------------------------------------


def _interleave_oracle() -> str:
    from ..operators.sampling import interleave_order_oracle_sql

    return interleave_order_oracle_sql("doc_id", "source", "n_chars")


@register(
    "sample_interleave_order",
    sql=_interleave_oracle(),
    doc="Deterministic curriculum interleave "
    "(operators/sampling.interleave_order): a total training order that "
    "round-robins across the 20 sources and visits each source "
    "easiest-first (n_chars ascending) — global_order = (per-source rank-1) "
    "* n_sources + source index, COMPUTED rather than sorted.  One "
    "per-source rank window is the only full-data shuffle; the source-index "
    "frame is vocabulary-sized and broadcast.  Injective by residue "
    "arithmetic, reproducible and resumable (no rand(), no global sort).",
)
def sample_interleave_order(spark, sf_dir):
    from ..operators.sampling import interleave_order

    return interleave_order(_t(spark, sf_dir, "documents"), "doc_id", "source", "n_chars")


# ---------------------------------------------------------------------------
# analytics: exact weighted median
# ---------------------------------------------------------------------------


def _wmedian_oracle() -> str:
    from ..operators.stats import weighted_median_oracle_sql

    return weighted_median_oracle_sql(
        "(SELECT *, l_orderkey * 10 + l_linenumber AS li_id FROM lineitem)",
        "l_returnflag",
        "l_extendedprice",
        "l_quantity",
        "li_id",
    )


@register(
    "g25_weighted_median",
    sql=_wmedian_oracle(),
    doc="Exact weighted (lower) median price per return flag, weighted by "
    "quantity (operators/stats.weighted_median): the smallest value whose "
    "cumulative weight reaches half the group's total (2*cumw >= total, "
    "all int64 — cents values, integer weights).  The token-mass-weighted "
    "twin of g11_median; one group-key shuffle shared by the cumulative "
    "window, the total window, and the closing min-aggregation.",
)
def g25_weighted_median(spark, sf_dir):
    from ..operators.stats import weighted_median

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "li_id", F.expr("l_orderkey * 10 + l_linenumber")
    )
    return weighted_median(li, "l_returnflag", "l_extendedprice", "l_quantity", "li_id")


# ---------------------------------------------------------------------------
# similarity: Matryoshka two-stage retrieval (prefix-dim rank, full re-rank)
# ---------------------------------------------------------------------------


def _mrl_oracle() -> str:
    from ..operators.similarity import mrl_rerank_oracle_sql

    return mrl_rerank_oracle_sql(query_id=0, prefix_dim=16, shortlist=50, k=10, scale=1_000)


@register(
    "sim_mrl_rerank",
    sql=_mrl_oracle(),
    doc="Matryoshka two-stage retrieval (Kusupati et al. 2022, "
    "arXiv:2205.13147; operators/similarity.mrl_rerank): coarse rank on the "
    "first 16 of 64 dims (4x less per-candidate compute), exact full-dim "
    "re-rank of the 50-row shortlist, top-10 out.  Both stages are signed "
    "integer cosine surrogates in decimal(38,0) — every rank position "
    "engine-reproducible, not an ID-set compare.  Plan: broadcast literal "
    "query, map-only scan, ONE TakeOrderedAndProject heap; the fine stage "
    "is shortlist-sized.",
)
def sim_mrl_rerank(spark, sf_dir):
    from ..operators.similarity import mrl_rerank

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    return mrl_rerank(
        emb.where(F.col("vec_id") != 0),
        "embedding",
        "vec_id",
        list(qvec),
        prefix_dim=16,
        shortlist=50,
        k=10,
        scale=1_000,
    )


# ---------------------------------------------------------------------------
# profiling: distribution drift as exact total-variation distance
# ---------------------------------------------------------------------------


def _drift_oracle() -> str:
    from ..operators.profile import drift_tvd_oracle_sql

    return drift_tvd_oracle_sql("events", "value", "user_id % 2 = 0", bin_cents=500)


@register(
    "profile_drift_tvd",
    sql=_drift_oracle(),
    doc="Distribution drift between two corpus slices (even vs odd user "
    "cohorts) as an exact per-bin total-variation decomposition "
    "(operators/profile.distribution_drift_tvd): tvd contribution per "
    "5-unit value bin = 1e6*|a*NB - b*NA| div (2*NA*NB) in "
    "decimal(38,0)/HUGEINT — the log-free drift score PSI/KL can't deliver "
    "exactly.  One partial-aggregable histogram groupBy + a 1-row totals "
    "broadcast; map-only arithmetic after.",
)
def profile_drift_tvd(spark, sf_dir):
    from ..operators.profile import distribution_drift_tvd

    return distribution_drift_tvd(
        _t(spark, sf_dir, "events"), "value", F.col("user_id") % 2 == 0, bin_cents=500
    )


# ---------------------------------------------------------------------------
# flagship composition: the training-prep pipeline end-to-end
# ---------------------------------------------------------------------------


def _training_prep_oracle() -> str:
    from ..operators.sampling import hash_fraction_hex

    qfilter = (
        "NOT (n_tok < 20 OR n_chars > 100000 "
        "OR (n_alpha + n_digit) < 2 * n_tok "
        "OR (n_alpha + n_digit) > 12 * n_tok "
        "OR 10 * n_alpha < 6 * n_chars)"
    )
    stage = (
        "SELECT {o} AS stage_ord, '{s}' AS stage, count(*) AS n_docs, "
        "CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS n_tokens FROM {t}"
    )
    return f"""
    WITH base AS (
      SELECT doc_id, text, source,
        len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                        x -> length(x) > 0)) AS n_tok,
        length(text) AS n_chars,
        length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
        length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
      FROM documents
    ),
    q AS (SELECT doc_id, text, source, n_tok FROM base WHERE {qfilter}),
    exk AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY sha256(text)),
    ex AS (SELECT q.* FROM q WHERE doc_id IN (SELECT doc_id FROM exk)),
    cnt AS (SELECT source, count(*) AS src_n FROM ex GROUP BY source),
    cap AS (
      SELECT ex.* FROM ex JOIN cnt USING (source)
      WHERE src_n <= 15
         OR substr(sha256('tp1:' || CAST(doc_id AS VARCHAR)), 1, 8)
              < printf('%08x', (15 * 4294967296) // src_n)
    ),
    tr AS (
      SELECT * FROM cap
      WHERE substr(sha256('tpsplit:' || CAST(doc_id AS VARCHAR)), 1, 8)
              < '{hash_fraction_hex(0.9)}'
    )
    {stage.format(o=1, s="raw", t="base")}
    UNION ALL {stage.format(o=2, s="quality", t="q")}
    UNION ALL {stage.format(o=3, s="exact_dedup", t="ex")}
    UNION ALL {stage.format(o=4, s="source_cap", t="cap")}
    UNION ALL {stage.format(o=5, s="train_split", t="tr")}
    """


@register(
    "training_prep_e2e",
    sql=_training_prep_oracle(),
    doc="The composed TRAINING-PREP pipeline, end-to-end (the curation_e2e "
    "companion that ends in training artifacts rather than a clean corpus): "
    "quality gate -> exact dedup (min-id keeper per sha256) -> source cap "
    "15 (domain rebalancing, hash-deterministic) -> 90/5/5 hash split, "
    "train shard out.  Returns the attrition funnel with BOTH doc counts "
    "and whitespace-token mass per stage — the token-budget view a "
    "training-mix owner actually reads.  Survivors persist once per "
    "compound stage; every stage reuses the registry operator it "
    "corresponds to (text_quality_gate / dedup_exact / sample_source_cap / "
    "sample_hash_split).",
)
def training_prep_e2e(spark, sf_dir):
    from pyspark.sql import Observation

    from ..functions.text import token_count_ws
    from ..operators.sampling import hash_split, source_cap
    from ..operators.textops import quality_gate

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "text", "source", token_count_ws(F.col("text")).alias("n_tok")
    )
    g = quality_gate(docs, "text", "doc_id").where(F.col("kept")).select("doc_id")
    # EAGER checkpoint: the exact-dedup key derivation and the survivor
    # semi-join consume q from CONCURRENT stages of the one report job — a
    # lazy persist races (each stage re-runs the regex-heavy gate chain
    # itself before blocks land; the round-10 dedup_ngram_jaccard defect
    # class), and nothing sequential warms it.  Round-11 (verdict item 3,
    # curation_e2e's recipe): the per-stage doc/token totals RIDE each
    # frame's dedicated materialization job as Observations — exactly-once
    # by construction (single consumer) — so the final union no longer
    # re-reads the q/ex/cap checkpoint blocks for three count branches.
    stage_metrics = lambda: (  # noqa: E731
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
    )
    obs_q, obs_ex, obs_cap = Observation(), Observation(), Observation()
    q = base.join(g, "doc_id", "left_semi").observe(obs_q, *stage_metrics()).transform(materialize)
    exk = (
        q.groupBy(F.sha2(F.col("text"), 256).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # eager checkpoints (not lazy persists) for the same reason as q: each
    # frame's successor-stage derivation starts in concurrent stages and
    # raced the lazy persist (round-10)
    ex = q.join(exk, "doc_id", "left_semi").observe(obs_ex, *stage_metrics()).transform(materialize)
    capk = (
        source_cap(ex, "doc_id", "source", cap=15, salt="tp1")
        .where(F.col("kept"))
        .select("doc_id")
    )
    cap = ex.join(capk, "doc_id", "left_semi").observe(obs_cap, *stage_metrics()).transform(materialize)
    tr = hash_split(cap, "doc_id", "tpsplit", train=0.9, val=0.05).where(
        F.col("split") == "train"
    )

    def _count_row(i, name, sdf):
        return sdf.agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
        ).select(
            F.lit(i).alias("stage_ord"), F.lit(name).alias("stage"), "n_docs", "n_tokens"
        )

    def _lit_row(i, name, obs):
        m = obs.get
        return spark.range(1).select(
            F.lit(i).alias("stage_ord"),
            F.lit(name).alias("stage"),
            F.lit(m["n_docs"]).cast("long").alias("n_docs"),
            F.lit(m["n_tokens"]).cast("long").alias("n_tokens"),
        )

    rows = [
        _count_row(1, "raw", base),
        _lit_row(2, "quality", obs_q),
        _lit_row(3, "exact_dedup", obs_ex),
        _lit_row(4, "source_cap", obs_cap),
        _count_row(5, "train_split", tr),
    ]
    out = rows[0]
    for row in rows[1:]:
        out = out.unionAll(row)
    return out
