"""Skew mitigation: salted two-level aggregation.

AQE's skew handling covers *joins*; a single hot GROUP BY key still lands on
one reducer.  The classic fix — salt the key, partially aggregate per
(key, salt), then roll up per key — works for any algebraic aggregate
(sum/count/min/max/decimal-sum).  One extra (tiny) shuffle whose input is at
most |keys| x |buckets| rows, in exchange for bounding the largest reduce
task at 1/buckets of the hot key.  This is the documented fallback of
SCALE.md §4, as code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_latest_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    salt_source: Column,
    buckets: int = 32,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """G6/Q3 (latest full row per group) with the hot-key story wired in:
    ``max_by`` is algebraic, so the same two-level trick applies — per
    (key, salt) partial max_by bounds any one reduce task at ~1/buckets of
    the hottest key, then a tiny per-key rollup picks the global latest.
    Output == queries.latest_per_group (bit-identical rows); only the
    shuffle topology changes.  ``tiebreak`` columns make the pick total
    under order-col ties (essential here: without one, the partial and
    rollup levels could legitimately pick DIFFERENT tied rows)."""
    cols = df.columns
    tb = tiebreak or []
    salt = F.pmod(F.xxhash64(salt_source), F.lit(buckets)).alias("_salt")
    key = F.struct(F.col(order_col), *[F.col(c) for c in tb])
    partial = (
        df.select(*cols, salt)
        .groupBy(*group_cols, "_salt")
        .agg(F.max_by(F.struct(*cols), key).alias("r"))
    )
    rollup_key = F.struct(F.col(f"r.{order_col}"), *[F.col(f"r.{c}") for c in tb])
    return (
        partial.groupBy(*group_cols)
        .agg(F.max_by(F.col("r"), rollup_key).alias("r"))
        .select("r.*")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_source: Column,
    buckets: int = 16,
) -> DataFrame:
    """Skew-proof shuffle equi-join: salt the FACT side's key with a
    deterministic bucket derived from ``salt_source`` (a within-key-varying
    column), replicate every DIM row across all ``buckets`` salt values, and
    join on (key, salt).  Result is row-identical to ``fact.join(dim, key)``;
    only the shuffle topology changes — a hot fact key's rows now land on
    ``buckets`` reduce tasks instead of one.

    When to use: the dim side is too large to broadcast AND the fact side has
    hot keys AQE's skew split can't fix (AQE splits oversized *partitions*,
    which helps only when a partition holds several keys; a single key bigger
    than memory still needs salting).  Cost: dim shuffle volume x buckets —
    cheap when |dim| << |fact|, which is exactly the skewed-join regime.

    The salt comes from xxhash64(salt_source) % buckets, never rand():
    rerun-stable plans and oracle determinism (SURVEY §7.3).  The replicated
    dim is built with a literal array+explode — no Python loop, no union of
    ``buckets`` scans.
    """
    salt = F.pmod(F.xxhash64(salt_source), F.lit(buckets)).cast("int")
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return f.join(d, [key, "_salt"]).drop("_salt")


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: Column,
    salt_source: Column,
    buckets: int = 32,
) -> DataFrame:
    """sum(value) + count(*) per key, shuffled in two salted levels.

    ``salt_source`` must be a column that varies *within* a key (a row id,
    event id, content hash) so a hot key's rows spread across ``buckets``
    reduce tasks; the salt is derived deterministically from it, never from
    rand() (oracle determinism, SURVEY §7.3 — and a rerun-stable plan).
    """
    salt = F.pmod(F.xxhash64(salt_source), F.lit(buckets)).alias("_salt")
    partial = df.select(*keys, salt, value.alias("_v")).groupBy(*keys, "_salt").agg(
        F.sum("_v").alias("_sum"), F.count("*").alias("_n")
    )
    return partial.groupBy(*keys).agg(
        F.sum("_sum").alias("value_sum"), F.sum("_n").alias("n")
    )
