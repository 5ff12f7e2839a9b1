"""Deterministic corpus sampling for training-data curation (north-star
capability per BASELINE.json — no reference analog; the reference's only
"sampling" is its fixed 50-row latest-observation scan window,
services/api-query/src/handler.ts:123).

Everything here is HASH-based, never rand(): a sample decision is a pure
function of (salt, id), so it is reproducible across runs, engines (the
DuckDB oracle computes the identical sha256 prefix), and cluster sizes — the
property a 100 TB curation pipeline needs for resumable / incremental runs.
Comparisons happen on fixed-width lowercase-hex prefixes, where
lexicographic order == numeric order, so no engine-specific hex→int cast is
involved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_fraction_hex(rate: float) -> str:
    """8-hex-digit threshold t such that P[sha256 prefix < t] == rate
    (exact to 1/2^32)."""
    return format(min(int(rate * 2**32), 2**32 - 1), "08x")


def sample_bucket(id_col: Column, salt: str) -> Column:
    """First 8 hex chars of sha256('<salt>:' || id) — a uniform [0, 2^32)
    draw keyed by the row id, as a comparable hex string."""
    return F.substring(F.sha2(F.concat(F.lit(salt + ":"), id_col.cast("string")), 256), 1, 8)


def stratified_sample(
    df: DataFrame, id_col: str, strata_col: str, rates: dict[str, float], default_rate: float, salt: str
) -> DataFrame:
    """Per-stratum hash sampling: keep a row iff its hash bucket falls below
    the stratum's rate threshold.  One narrow projection + filter — no
    shuffle, no rand(); pushdown-friendly at any scale."""
    thr = F.lit(hash_fraction_hex(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == stratum, F.lit(hash_fraction_hex(rate))).otherwise(thr)
    return df.where(sample_bucket(F.col(id_col), salt) < thr)


def hash_split(df: DataFrame, id_col: str, salt: str, train: float = 0.98, val: float = 0.01) -> DataFrame:
    """Deterministic train/val/test assignment by hash bucket.  A document's
    split never changes as the corpus grows — the invariant that prevents
    train/test leakage across incremental curation runs."""
    b = sample_bucket(F.col(id_col), salt)
    split = (
        F.when(b < F.lit(hash_fraction_hex(train)), F.lit("train"))
        .when(b < F.lit(hash_fraction_hex(train + val)), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def source_cap(df: DataFrame, id_col: str, source_col: str, cap: int, salt: str) -> DataFrame:
    """Cap any one source's document count at ~`cap` by hash-downsampling
    over-represented sources (rate = cap/count), keeping under-cap sources
    whole — the domain-rebalancing step that stops one crawl domain from
    dominating the training mixture.

    The per-source keep rate is computed at runtime from the source counts
    (a tiny aggregate, broadcast back), then turned into an 8-hex-digit
    threshold with the same fixed-width-hex comparison contract as the rest
    of this module: threshold = %08x of (cap * 2^32) div count, which is
    < 2^32 exactly when count > cap (the only branch that compares).  The
    keep decision stays a pure function of (salt, id, source counts), so the
    capped corpus is reproducible across engines and cluster sizes."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("src_n"))
    thr = F.format_string("%08x", F.expr(f"(CAST({cap} AS BIGINT) * 4294967296) div src_n"))
    kept = (F.col("src_n") <= cap) | (sample_bucket(F.col(id_col), salt) < thr)
    return (
        df.join(F.broadcast(counts), source_col)
        .select(F.col(id_col), F.col(source_col), kept.alias("kept"))
    )
