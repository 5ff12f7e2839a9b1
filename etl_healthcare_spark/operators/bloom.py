"""Bloom-filter membership pre-screening — the classic big-data shape for
"does this item appear in that set?" at 100 TB (north-star LLM-pipeline
layer; companion to operators/dedup.ngram_contamination, which is the exact
check it accelerates).

A Bloom filter with k=4 sha256-derived positions in a 2^20-bit space answers
set membership with zero false NEGATIVES and a quantifiable false-positive
rate, using a constant-size structure however large the reference set grows.
At scale, the exact decontamination join must broadcast every distinct eval
shingle STRING; the Bloom pre-screen broadcasts only the set-bit positions
(<= k * |eval| longs, deduplicated — and bounded by 2^20 regardless), then
the exact join runs only on the tiny pre-screened survivor set.

Determinism: positions are sha256 bits (5 hex chars = exactly 20 bits), set
membership is a semi-join, the hit rule is an integer count — the whole
screen, INCLUDING its false positives, is bit-identical on any engine, so
the oracle hash-checks the approximate operator (same discipline as
operators/sketch.py).  Spark's own BloomFilterMightContain cannot promise
that (engine-internal hashing) — same reason approx_count_distinct is only
ever rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K_HASHES = 4
M_BITS = 20  # 2^20-bit space: 5 hex chars of the digest, exactly


def bloom_positions(item: Column) -> Column:
    """Array of K_HASHES positions in [0, 2^M_BITS) for one item."""
    return F.array(
        *[
            F.conv(F.substring(F.sha2(F.concat(F.lit(f"b{i}:"), item), 256), 1, 5), 16, 10).cast(
                "long"
            )
            for i in range(K_HASHES)
        ]
    )


def bloom_build(items: DataFrame, item_col: str) -> DataFrame:
    """The filter: the distinct set-bit positions of every item — a
    single-column long table, <= min(k * |items|, 2^20) rows, broadcast-sized
    by construction."""
    return (
        items.select(F.explode(bloom_positions(F.col(item_col))).alias("pos")).distinct()
    )


def bloom_screen(candidates: DataFrame, item_col: str, bloom: DataFrame) -> DataFrame:
    """Candidates annotated with might_contain: true iff ALL k positions are
    set.  No false negatives; false positives at the standard (1-e^{-kn/m})^k
    rate.  One posexplode + broadcast semi-join + integer count."""
    pos = candidates.select("*", F.posexplode(bloom_positions(F.col(item_col))).alias("_i", "_pos"))
    hit_counts = (
        pos.join(F.broadcast(bloom.select(F.col("pos").alias("_pos"))), "_pos", "left_semi")
        .groupBy(*candidates.columns)
        .agg(F.count(F.lit(1)).alias("_nset"))
    )
    return (
        candidates.join(hit_counts, candidates.columns, "left")
        .withColumn("might_contain", F.coalesce(F.col("_nset"), F.lit(0)) == K_HASHES)
        .drop("_nset")
    )


def bloom_contamination(
    corpus: DataFrame, eval_df: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Per-doc decontamination screen: exact 5-gram contamination next to the
    Bloom pre-screen's verdict, so the false-positive overhead is measurable.
    Returns (id, n_shingles, n_hits, n_bloom_hits, contam_ppm, bloom_ppm)."""
    from ..functions.text import shingles_from_tokens, tokens

    def distinct_shingles(df: DataFrame) -> DataFrame:
        tok = df.select(F.col(id_col), tokens(F.col(text_col)).alias("t")).where(F.size("t") >= k)
        return tok.select(
            F.col(id_col), F.explode(F.array_distinct(shingles_from_tokens(F.col("t"), k))).alias("s")
        )

    corpus_sh = distinct_shingles(corpus)
    eval_sh = distinct_shingles(eval_df).select("s").distinct()
    bloom = bloom_build(eval_sh, "s")
    screened = bloom_screen(corpus_sh, "s", bloom)
    exact_hits = corpus_sh.join(F.broadcast(eval_sh), "s").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    per_doc = screened.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.col("might_contain").cast("long")).alias("n_bloom_hits"),
    )
    return (
        per_doc.join(exact_hits, id_col, "left")
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)))
        .select(
            id_col,
            "n_shingles",
            "n_hits",
            "n_bloom_hits",
            F.expr("(1000000 * n_hits) div n_shingles").alias("contam_ppm"),
            F.expr("(1000000 * n_bloom_hits) div n_shingles").alias("bloom_ppm"),
        )
    )


def bloom_pos_sql(item_sql: str, i: int) -> str:
    """DuckDB twin of one position expression."""
    return f"('0x' || substr(sha256('b{i}:' || {item_sql}), 1, 5))::BIGINT"
