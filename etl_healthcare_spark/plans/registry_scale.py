"""Registry batch: corpus-scale analytics operators — BM25 full-text
relevance, one-pass column profiling, HyperLogLog distinct sketches,
integer-space k-means clustering, exact z-score anomaly flags, and Z-order
layout keys.

Each is the kind of operator a 100 TB training-data pipeline leans on daily
(search/inspect/cluster/monitor/layout) and each keeps the repo-wide
determinism rules (registry.py header): integer or single-IEEE-op math only,
sha256 as the only hash, total tiebreak orders — so every one of them
hash-compares against its DuckDB twin, including the APPROXIMATE sketch
(the sketch's bits are defined by sha256, not by engine internals).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..datasets import load_table
from ..functions.text import tokens
from ..operators.anomaly import zscore_flags, zscore_oracle_sql
from ..operators.bucketing import morton_key, morton_key_sql
from ..operators.clustering import kmeans_int8, kmeans_oracle_sql
from ..operators.profile import profile_columns, profile_oracle_sql
from ..operators.search import bm25_oracle_sql, bm25_topk
from ..operators.sketch import hll_distinct, hll_oracle_sql
from .registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


BM25_TERMS = ["spark", "merge", "customer", "window"]

PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


@register(
    "search_bm25",
    sql=bm25_oracle_sql(BM25_TERMS, k=15),
    doc="BM25 full-text relevance top-k over the documents corpus: per-doc "
    "term frequencies from the token array (map-only — no posting-list "
    "shuffle), one O(1)-row corpus-stats aggregate broadcast back, ln-free "
    "rational idf and fixed-association double sums so raw scores "
    "hash-compare (operators/search.py).",
)
def search_bm25(spark, sf_dir):
    return bm25_topk(_t(spark, sf_dir, "documents"), BM25_TERMS, k=15)


@register(
    "profile_table",
    sql=profile_oracle_sql("orders", PROFILE_COLS),
    doc="One-pass dataset profiling of the orders table: per-column "
    "null count, exact distinct, min/max in a single wide aggregate "
    "unpivoted via stack — the table is scanned once however many columns "
    "are profiled (operators/profile.py; exact multi-distinct costs an "
    "Expand — the HLL sketch is the one-pass-at-scale alternative).",
)
def profile_table(spark, sf_dir):
    return profile_columns(_t(spark, sf_dir, "orders"), PROFILE_COLS)


@register(
    "sketch_hll_distinct",
    sql=f"""
    WITH exact AS (
      SELECT lang AS grp, count(DISTINCT tok) AS exact_distinct
      FROM (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
            FROM documents)
      GROUP BY 1
    ),
    hll AS (
      {hll_oracle_sql("grp", "tok", "items AS (SELECT lang AS grp, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents)")}
    )
    SELECT hll.grp, hll.used_registers, hll.s_scaled, hll.hll_estimate,
           exact.exact_distinct
    FROM hll JOIN exact ON hll.grp = exact.grp
    """,
    doc="HyperLogLog distinct-token sketch per language, built from sha256 "
    "bits so the APPROXIMATE estimate is still bit-identical across engines "
    "and hash-checkable (operators/sketch.py).  Registers merge by MAX — a "
    "one-pass distributed aggregate shuffling <= groups x 256 rows at any "
    "corpus size; the exact count (shuffles every distinct value) rides "
    "along to show the accuracy (~6.5% at m=256).",
)
def sketch_hll_distinct(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    items = docs.select(F.col("lang"), F.explode(tokens(F.col("text"))).alias("tok"))
    hll = hll_distinct(items, "lang", "tok")
    exact = items.groupBy(F.col("lang").alias("grp")).agg(
        F.count_distinct("tok").alias("exact_distinct")
    )
    return hll.join(exact, "grp")


@register(
    "cluster_kmeans",
    sql=kmeans_oracle_sql(k=8, rounds=1),
    doc="k-means corpus clustering in quantized int8 space (k=8, one Lloyd "
    "round): every distance an exact integer, centroids exact floor-means, "
    "ties to the smallest centroid id — deterministic on any engine, unlike "
    "float k-means (operators/clustering.py).  Assignment broadcasts the "
    "k-row centroid table (map-only); the update is one skinny "
    "(cluster, pos) shuffle with map-side combine.",
)
def cluster_kmeans(spark, sf_dir):
    return kmeans_int8(_t(spark, sf_dir, "embeddings"), "embedding", "vec_id", k=8, rounds=1)


@register(
    "anomaly_zscore",
    sql=zscore_oracle_sql("events", "event_type", "value", "event_id", z=3),
    doc="Z-score anomaly flags (value > mean + 3 sample stddevs within the "
    "event type) decided by exact integer cross-multiplication in "
    "decimal(38,0)/HUGEINT — no division, no sqrt, no float boundary "
    "jitter (operators/anomaly.py).  One tiny (n, sum, sum-of-squares) "
    "moment sketch per group, broadcast back over a map-only flagging pass.",
)
def anomaly_zscore(spark, sf_dir):
    return zscore_flags(_t(spark, sf_dir, "events"), "event_type", "value", "event_id", z=3)


@register(
    "layout_zorder",
    sql=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           {morton_key_sql("l_partkey", "l_suppkey", bits=11)} AS zvalue
    FROM lineitem
    ORDER BY zvalue, l_orderkey, l_linenumber
    LIMIT 100
    """,
    doc="Z-order (Morton) layout key over lineitem (l_partkey, l_suppkey): "
    "bit-interleaved int64 curve index as a pure column expression — sort "
    "the write on it and every parquet file covers a tight rectangle in "
    "BOTH keys, so footer min/max stats prune scans filtered on either "
    "(the Delta OPTIMIZE ZORDER idea without the table format; "
    "operators/bucketing.py zorder_layout).",
)
def layout_zorder(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    z = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        morton_key(F.col("l_partkey"), F.col("l_suppkey"), bits=11).alias("zvalue"),
    )
    return z.orderBy("zvalue", "l_orderkey", "l_linenumber").limit(100)


from ..operators.anomaly import ewma_latest, ewma_oracle_sql  # noqa: E402
from ..operators.sketch import (  # noqa: E402
    countmin_estimates,
    countmin_oracle_sql,
    histogram_oracle_sql,
    histogram_quantiles,
)

CM_CANDIDATES = ["the", "spark", "merge", "customer", "qqqabsent"]


@register(
    "sketch_countmin",
    sql=countmin_oracle_sql(
        "items AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS item FROM documents)",
        CM_CANDIDATES,
    ),
    doc="Count-min frequency sketch (d=4 x w=256, sha256 buckets) over the "
    "token stream with exact counts alongside: the APPROXIMATE upper-bound "
    "estimates are bit-identical across engines because the bucket bits are "
    "sha256's, not engine-internal (operators/sketch.py).  Counters merge "
    "by element-wise SUM — the streaming/sharded property; the sketch is "
    "d x w rows however long the stream.",
)
def sketch_countmin(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    items = docs.select(F.explode(tokens(F.col("text"))).alias("item"))
    return countmin_estimates(items, "item", CM_CANDIDATES)


@register(
    "sketch_histogram_quantiles",
    sql=histogram_oracle_sql("events", "event_type", "value", bin_cents=500),
    doc="Mergeable fixed-bin histogram quantiles per event type: integer "
    "cents // 500 bins aggregate to a tiny histogram (one skinny shuffle), "
    "p50/p90/p99 read off the cumulative counts at rank ceil(p*n/100) — "
    "deterministic approx-percentile with error exactly one bin width, "
    "unlike approx_percentile's engine-internal sketch "
    "(operators/sketch.py:histogram_quantiles).",
)
def sketch_histogram_quantiles(spark, sf_dir):
    return histogram_quantiles(_t(spark, sf_dir, "events"), "event_type", "value", bin_cents=500)


@register(
    "w8_ewma",
    sql=ewma_oracle_sql("events", "event_type", "ts", "value", "event_id", k=16),
    doc="Exact dyadic EWMA (alpha=1/2, last 16 points) per event type: "
    "power-of-two weights turn exponential smoothing into int64 arithmetic "
    "closed by one IEEE division — bit-identical across engines, free of "
    "the accumulation-order drift of float-recursive smoothing "
    "(operators/anomaly.py:ewma_latest).  A row_number window bounds "
    "per-key state to K rows before any aggregation.",
)
def w8_ewma(spark, sf_dir):
    return ewma_latest(_t(spark, sf_dir, "events"), "event_type", "ts", "value", "event_id", k=16)


import tempfile  # noqa: E402


@register(
    "stream_anomaly_moments",
    sql="""
    SELECT event_type AS grp, count(*) AS n,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS s,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
               * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS q
    FROM events GROUP BY 1
    """,
    doc="§2.12 streaming face of the anomaly moment sketch: the exact "
    "(n, sum, sum-of-squares) int64-cents aggregate maintained "
    "incrementally by Structured Streaming (file source, availableNow, "
    "complete mode) with O(groups) state — after the full stream it "
    "provably equals the batch aggregate, so live z-score flagging reads "
    "a sketch that is always exact for the seen prefix "
    "(streaming/pipeline.py:moments_stream).",
)
def stream_anomaly_moments(spark, sf_dir):
    import uuid

    from ..streaming.pipeline import moments_stream

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    d = tempfile.mkdtemp(prefix="stream_moments_")
    ev.write.mode("overwrite").parquet(f"{d}/src")
    stream = spark.readStream.schema(ev.schema).parquet(f"{d}/src")
    agg = moments_stream(stream)
    name = f"smo_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
