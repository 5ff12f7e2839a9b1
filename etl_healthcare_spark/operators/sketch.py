"""Mergeable distinct-count sketches (HyperLogLog) built from first
principles on sha256 — the cardinality layer a 100 TB corpus dashboard needs
(north-star LLM-pipeline layer; no reference analog — the reference's stats
are exact counts over tenant-sized data, services/health-api/src/handler.ts).

Why not approx_count_distinct: Spark's HLL++ sketch is engine-internal and
non-reproducible across engines, so it can only ever be a rows-only check
(see g5b_approx_quantiles).  This sketch is defined purely in terms of
sha256 bits, so Spark and DuckDB compute IDENTICAL registers, identical
scaled sums, and (single IEEE division) identical raw estimates — a fully
hash-checkable approximate operator.

Construction (classic Flajolet m=256):
  h          = sha256(item)
  register   = first 2 hex chars (0..255)
  rank       = leading-zero count of the next 52 bits + 1, capped at 40
  registers  = MAX(rank) per (group, register)          [mergeable: MAX]
  S_scaled   = sum over registers of 2^(48-rank)        [int64-exact: <= 2^56]
  estimate   = alpha_m * m^2 * 2^48 / S_scaled          [one double division]

Merge property: registers from disjoint shards combine by element-wise MAX —
the same groupBy().agg(max) shape at any tree depth, which is what makes the
sketch a one-pass distributed aggregate at 100 TB (exact distinct needs a
full shuffle of every distinct value; the sketch shuffles at most
group x 256 rows).  `No small-range linear-counting correction is applied
(it needs ln, which is not bit-stable across engines) — raw HLL only,
documented accuracy ~1.04/sqrt(256) = 6.5%.`
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 256  # registers
ALPHA = 0.7213 / (1 + 1.079 / M)  # standard bias constant for m >= 128
A_LIT = ALPHA * M * M * float(1 << 48)  # one double literal, repr-exact in SQL
RANK_CAP = 40


def hll_registers(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """(group, register, rank) with rank = MAX over the group's items."""
    h = F.sha2(F.col(item_col).cast("string"), 256)
    base = df.select(
        F.col(group_col).alias("grp"),
        F.substring(h, 1, 2).alias("register"),
        F.conv(F.substring(h, 3, 13), 16, 10).cast("long").alias("v"),  # next 52 bits
    )
    # leading zeros in the 52-bit window = 52 - bitlength(v); rank = lz + 1
    bitlen = F.length(F.expr("bin(v)"))
    rank = F.when(F.col("v") == 0, F.lit(RANK_CAP)).otherwise(
        F.least(F.lit(53) - bitlen, F.lit(RANK_CAP))
    )
    return (
        base.select("grp", "register", rank.alias("rank"))
        .groupBy("grp", "register")
        .agg(F.max("rank").alias("rank"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """(grp, used_registers, s_scaled, hll_estimate) from a register table."""
    # SQL-form shiftleft: the pyspark wrapper requires a literal int shift,
    # the SQL function accepts an expression
    term = F.expr("shiftleft(CAST(1 AS BIGINT), 48 - rank)")
    return (
        registers.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("used_registers"),
            F.sum(term).alias("s_used"),
        )
        .select(
            "grp",
            "used_registers",
            # empty registers contribute 2^-0 = 1 each -> 2^48 scaled
            (F.col("s_used") + (F.lit(M) - F.col("used_registers")) * F.lit(1 << 48)).alias("s_scaled"),
        )
        .select(
            "grp",
            "used_registers",
            "s_scaled",
            (F.lit(A_LIT) / F.col("s_scaled").cast("double")).alias("hll_estimate"),
        )
    )


def hll_distinct(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """One-stop per-group raw-HLL distinct estimate."""
    return hll_estimate(hll_registers(df, group_col, item_col))


def hll_oracle_sql(group_col: str, item_col: str, src_cte: str) -> str:
    """DuckDB twin: identical sha256-derived registers, identical integer
    scaled sum, identical single-division estimate.  `src_cte` must define a
    relation `items({group_col}, {item_col})`."""
    return f"""
    WITH {src_cte},
    hashed AS (
      SELECT {group_col} AS grp,
             substr(sha256(CAST({item_col} AS VARCHAR)), 1, 2) AS register,
             ('0x' || substr(sha256(CAST({item_col} AS VARCHAR)), 3, 13))::BIGINT AS v
      FROM items
    ),
    ranked AS (
      SELECT grp, register,
             CASE WHEN v = 0 THEN {RANK_CAP}
                  ELSE least(53 - length(bin(v)), {RANK_CAP}) END AS rank
      FROM hashed
    ),
    regs AS (
      SELECT grp, register, max(rank) AS rank FROM ranked GROUP BY 1, 2
    ),
    summed AS (
      SELECT grp, count(*) AS used_registers,
             sum(1::BIGINT << (48 - rank)) AS s_used
      FROM regs GROUP BY 1
    )
    SELECT grp, used_registers,
           CAST(s_used + ({M} - used_registers) * (1::BIGINT << 48) AS BIGINT) AS s_scaled,
           {A_LIT!r} / CAST(s_used + ({M} - used_registers) * (1::BIGINT << 48) AS DOUBLE)
             AS hll_estimate
    FROM summed
    """
