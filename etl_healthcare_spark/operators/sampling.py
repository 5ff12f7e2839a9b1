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


def temperature_sample(df: DataFrame, id_col: str, group_col: str, salt: str) -> DataFrame:
    """Temperature-balanced downsampling across groups (languages, domains)
    at T=2: keep rate r_g = sqrt(n_min / n_g), so a group's expected kept
    count is sqrt(n_min * n_g) — the geometric-mean interpolation between
    the natural and uniform mixtures that multilingual training recipes use
    (alpha = 1/T exponentiated sampling; T=2 keeps every double op an
    IEEE-correctly-rounded sqrt/divide, so the threshold is bit-identical
    on any engine — arbitrary T would hinge on pow()'s last ulp).

    The per-group threshold is floor((2^32 * sqrt(n_min)) / sqrt(n_g)) in
    that exact association order (mirrored in the oracle), clamped to
    2^32-1, compared as fixed-width hex against the sha256 bucket — the
    same contract as source_cap.  The smallest group keeps everything by
    the n_g == n_min guard (no float boundary involved).

    Shape at 100 TB: one tiny group-count aggregate broadcast back over a
    map-only keep decision — no shuffle of the corpus itself.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("grp_n"))
    nmin = counts.agg(F.min("grp_n").alias("grp_min"))
    thr = F.format_string(
        "%08x",
        F.expr(
            "least(CAST(floor((4294967296.0 * sqrt(CAST(grp_min AS DOUBLE)))"
            " / sqrt(CAST(grp_n AS DOUBLE))) AS BIGINT), 4294967295)"
        ),
    )
    kept = (F.col("grp_n") == F.col("grp_min")) | (sample_bucket(F.col(id_col), salt) < thr)
    return (
        df.join(F.broadcast(counts), group_col)
        .crossJoin(F.broadcast(nmin))
        .select(F.col(id_col), F.col(group_col), kept.alias("kept"))
    )


def temperature_oracle_sql(id_col: str, group_col: str, salt: str, src: str = "documents") -> str:
    """DuckDB twin of temperature_sample — identical sqrt/divide association
    order, identical hex-threshold contract."""
    return f"""
    WITH counts AS (SELECT {group_col}, count(*) AS grp_n FROM {src} GROUP BY {group_col}),
    nmin AS (SELECT min(grp_n) AS grp_min FROM counts),
    thr AS (
      SELECT {group_col}, grp_n, grp_min,
             printf('%08x', least(CAST(floor((4294967296.0 * sqrt(CAST(grp_min AS DOUBLE)))
                                              / sqrt(CAST(grp_n AS DOUBLE))) AS BIGINT),
                                  4294967295)) AS t
      FROM counts CROSS JOIN nmin
    )
    SELECT d.{id_col}, d.{group_col},
           (t.grp_n = t.grp_min
            OR substr(sha256('{salt}:' || CAST(d.{id_col} AS VARCHAR)), 1, 8) < t.t) AS kept
    FROM {src} d JOIN thr t ON d.{group_col} = t.{group_col}
    """


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


def shard_export(
    df: DataFrame, id_col: str, tokens_col: str, n_shards: int, salt: str
) -> DataFrame:
    """Deterministic dataloader-shard export: assign every document a shard,
    a pseudo-random in-shard position, and a cumulative token offset — the
    (shard, position, offset) index a training job needs to stream packed
    shards resumably.

    Determinism contract (the whole point): shard = sha256(salt:id) mod
    n_shards and order-within-shard = the hash itself, so re-runs, engine
    swaps, and cluster resizes all emit byte-identical shard manifests, and
    a grown corpus only APPENDS new interleavings without reshuffling what a
    checkpointed run already consumed (same invariant as hash_split).  No
    rand(), no global sort.

    Scale: one shuffle — the per-shard window.  n_shards grows with the
    corpus (1 shard ~ one dataloader file), so window partitions stay
    bounded; there is deliberately NO global row_number (a single-partition
    sort bottleneck at 100 TB).

    Output (shard, pos, id, n_tokens, token_offset): pos 0-based hash order;
    token_offset = tokens before this doc in its shard.
    """
    from pyspark.sql import Window

    h = F.sha2(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string")), 256)
    shard = F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(n_shards))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).alias("n_tokens"),
        h.alias("__h"),
        shard.alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("__h", "id")
    wc = w.rowsBetween(Window.unboundedPreceding, -1)
    return base.select(
        "shard",
        (F.row_number().over(w) - 1).alias("pos"),
        "id",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(wc), F.lit(0)).alias("token_offset"),
    )
