"""Round-3 analytics batch: graph triangles, grid-blocked interval joins,
DSIR importance resampling, cross-corpus dedup, model-based quality scoring,
key-skew diagnosis, and frame-level audio features.

All queries follow the registry's cross-engine determinism conventions
(integer/ppm arithmetic, sha256-only hashing, total tiebreaks — see
plans/registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t, register

# ---------------------------------------------------------------------------
# graph: triangle counting (degree-oriented wedge closing)
# ---------------------------------------------------------------------------

_TRI_EDGES_SQL = """raw AS (
      SELECT o_orderkey % 61 AS s, (o_orderkey * 7 + o_custkey) % 61 AS t
      FROM orders WHERE o_orderkey % 3 = 0
    )"""


def _tri_oracle() -> str:
    from ..operators.graph import triangle_oracle_sql

    return triangle_oracle_sql(_TRI_EDGES_SQL)


@register(
    "graph_triangles",
    sql=_tri_oracle(),
    doc="Per-node triangle counts via DEGREE-ORIENTED wedge closing (Suri & "
    "Vassilvitskii): orient edges low-rank -> high-rank, form wedges only at "
    "the low endpoint, close with a hash join.  Wedge volume is bounded by "
    "m^1.5 regardless of hub degrees — the naive wedge count is d_hub^2.  "
    "Exact integer counts; the oracle counts u<v<w triples directly, so the "
    "orientation machinery cannot hide a double-count.",
)
def graph_triangles(spark, sf_dir):
    from ..operators.graph import triangle_counts

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 3 == 0)
    edges = o.select(
        (F.col("o_orderkey") % 61).alias("a"),
        ((F.col("o_orderkey") * 7 + F.col("o_custkey")) % 61).alias("b"),
    )
    return triangle_counts(edges, "a", "b")


# ---------------------------------------------------------------------------
# joins: interval overlap with grid-cell blocking
# ---------------------------------------------------------------------------

_IV_SQL = """iv AS (
      SELECT o_orderkey AS id,
             datediff('day', DATE '1992-01-01', o_orderdate) AS s,
             datediff('day', DATE '1992-01-01', o_orderdate) + o_orderkey % 15 AS e
      FROM orders WHERE o_orderkey % 37 = 0
    )"""


def _iv_oracle() -> str:
    from ..operators.intervals import interval_overlap_oracle_sql

    return interval_overlap_oracle_sql(_IV_SQL)


@register(
    "j8_interval_overlap",
    sql=_iv_oracle(),
    doc="Interval-overlap self-join with GRID-CELL blocking "
    "(operators/intervals.py): explode each interval to its 16-day cells, "
    "equi-join on the cell id, verify the true overlap, and count each pair "
    "only in the cell containing max(start) — duplicate-free with NO "
    "distinct.  The naive non-equi join is a cartesian at scale; this is one "
    "cell-keyed hash join whose cost is sum(|cell|^2), a density property.  "
    "The oracle runs the plain predicate join, so the blocking must lose no "
    "pair and invent none.",
)
def j8_interval_overlap(spark, sf_dir):
    from ..operators.intervals import interval_overlap_pairs

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 37 == 0)
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
    iv = o.select(
        F.col("o_orderkey").alias("id"),
        day.alias("start_day"),
        (day + F.col("o_orderkey") % 15).alias("end_day"),
    )
    return interval_overlap_pairs(iv, "id", "start_day", "end_day", cell_days=16)


# ---------------------------------------------------------------------------
# sampling: DSIR importance resampling toward a target slice
# ---------------------------------------------------------------------------


def _dsir_oracle() -> str:
    from ..operators.sampling import dsir_oracle_sql

    return dsir_oracle_sql("lang = 'en'", salt="dsir", gain=4)


@register(
    "sample_dsir",
    sql=_dsir_oracle(),
    doc="DSIR-style importance resampling (Xie et al. 2302.03169) in exact "
    "integer ppm: per-token smoothed target-share from ONE conditional-sum "
    "groupBy, per-doc integer mean, acceptance by a deterministic "
    "sha256-ppm draw against the gained importance — every non-target doc's "
    "fate is a pure integer function of (corpus, salt).  Here the target "
    "slice is lang='en'; candidates are the other languages.",
)
def sample_dsir(spark, sf_dir):
    from ..operators.sampling import dsir_resample

    docs = _t(spark, sf_dir, "documents").withColumn("is_en", F.col("lang") == "en")
    return dsir_resample(docs, "text", "doc_id", "is_en", salt="dsir", gain=4)


# ---------------------------------------------------------------------------
# dedup: cross-corpus (bipartite) minhash candidates
# ---------------------------------------------------------------------------


def _cross_oracle() -> str:
    from .registry_llm import _minhash_ctes

    return f"""
    WITH {_minhash_ctes()},
    side AS (SELECT doc_id, source LIKE 'src1%' AS is_ref FROM documents)
    SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.key = b.key
    JOIN side sa ON sa.doc_id = a.doc_id
    JOIN side sb ON sb.doc_id = b.doc_id
    WHERE NOT sa.is_ref AND sb.is_ref
      AND NOT EXISTS (SELECT 1 FROM big_buckets g
                      WHERE g.band = a.band AND g.key = a.key)
    """


@register(
    "dedup_cross_corpus",
    sql=_cross_oracle(),
    doc="BIPARTITE minhash dedup — which NEW docs near-duplicate the "
    "REFERENCE corpus (here: sources src1*) — one shared minhash pipeline "
    "over the tagged union, pairs expand in-task as refs x news per LSH "
    "bucket, never same-side and never a self-join "
    "(operators/dedup.minhash_cross_pairs).  The cross-dump dedup every "
    "incremental training run performs.",
)
def dedup_cross_corpus(spark, sf_dir):
    from ..operators.dedup import minhash_cross_pairs

    docs = _t(spark, sf_dir, "documents").withColumn(
        "is_ref", F.col("source").startswith("src1")
    )
    return minhash_cross_pairs(docs, "text", "doc_id", "is_ref")


# ---------------------------------------------------------------------------
# text: hashed-feature linear quality classifier
# ---------------------------------------------------------------------------


def _clf_oracle() -> str:
    from ..operators.textops import hashed_linear_oracle_sql

    return hashed_linear_oracle_sql(n_buckets=1024)


@register(
    "text_classifier_score",
    sql=_clf_oracle(),
    doc="fastText-style hashed linear quality classifier "
    "(operators/textops.hashed_linear_score): sha256 feature hashing into "
    "1024 buckets, int64 dot product with a deterministic weight scramble, "
    "sign label.  Map-only inference — the exact plan shape a trained "
    "broadcast weight table would use; zero shuffle before the result.",
)
def text_classifier_score(spark, sf_dir):
    from ..operators.textops import hashed_linear_score

    return hashed_linear_score(_t(spark, sf_dir, "documents"), "text", "doc_id")


# ---------------------------------------------------------------------------
# ops: join/agg key skew diagnosis
# ---------------------------------------------------------------------------


def _skew_oracle() -> str:
    from ..operators.profile import key_skew_oracle_sql

    return key_skew_oracle_sql("events", "user_id", top_n=10)


@register(
    "profile_key_skew",
    sql=_skew_oracle(),
    doc="Key-skew diagnosis for shuffle planning "
    "(operators/profile.key_skew_profile): top-10 hottest events.user_id "
    "values with corpus share and multiple-of-mean in integer ppm — the "
    "numbers that decide broadcast vs salting vs AQE skew-join before a "
    "100 TB shuffle is launched.  One partial-aggregated groupBy + "
    "TakeOrderedAndProject.",
)
def profile_key_skew(spark, sf_dir):
    from ..operators.profile import key_skew_profile

    return key_skew_profile(_t(spark, sf_dir, "events"), "user_id", top_n=10)


# ---------------------------------------------------------------------------
# multimodal: frame-level audio energy / silence detection
# ---------------------------------------------------------------------------


@register(
    "mm_audio_windows",
    sql="""
    WITH src AS (SELECT doc_id FROM documents WHERE doc_id < 400),
    wav AS (
      SELECT doc_id, 32 + (doc_id % 8) * 8 AS n, doc_id % 251 AS seed FROM src
    ),
    s AS (
      SELECT doc_id, j, j // 8 AS win,
             (j * 73 + seed) % 65536
               - CASE WHEN (j * 73 + seed) % 65536 >= 32768 THEN 65536 ELSE 0 END AS v
      FROM (SELECT doc_id, seed, unnest(generate_series(0, n - 1)) AS j FROM wav)
    )
    SELECT doc_id AS id, CAST(win AS INT) AS win, CAST(count(*) AS INT) AS n_samples,
           CAST(sum(v * v) AS BIGINT) AS energy, CAST(max(abs(v)) AS INT) AS peak,
           sum(v * v) < 1000000 * count(*) AS is_silence
    FROM s GROUP BY doc_id, win
    """,
    doc="Frame-level audio features on REAL decoded PCM16 bytes "
    "(operators/multimodal.audio_window_energy): per-8-sample window energy, "
    "peak, and an integer cross-multiply silence flag, computed inside the "
    "Arrow-batched mapInPandas kernel from genuinely synthesized WAV "
    "payloads.  The oracle regenerates every sample arithmetically, so a "
    "chunk-walk / endianness / sign bug cannot hash-match.  The frame "
    "fan-out multiplies rows inside the task, not across a shuffle.",
)
def mm_audio_windows(spark, sf_dir):
    from ..operators.multimodal import audio_window_energy, synth_wav_with_samples

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    d = F.col("doc_id")
    media = docs.select(
        "doc_id",
        synth_wav_with_samples(
            F.lit(8000), F.lit(1), F.lit(32) + (d % 8) * 8, d % 251
        ).alias("payload"),
    )
    return audio_window_energy(media, "doc_id", "payload", win=8)
