"""Dataset profiling: per-column quality stats in ONE pass over the table —
the first thing a data engineer runs against a new 100 TB drop (north-star
LLM-pipeline layer; reference analog is the per-batch counters the validate
stage emits, services/validate/handler.ts:41-66, generalized to columns).

Shape: a single wide aggregate computes every (column x metric) cell, then a
`stack` unpivots driver-side constants into the long format — so the table is
scanned ONCE regardless of how many columns are profiled.  The one caveat is
exact `count(distinct)` over multiple columns: Catalyst plans k distinct
aggregates as an Expand (k x row multiplier) before the partial aggregate.
That is the honest cost of EXACT profiling; the sketch-based alternative
(operators/sketch.py hll_distinct) profiles distincts in one non-expanded
pass at ~6.5% error, and SCALE.md documents when to switch.

min/max are emitted as strings so heterogeneous columns share one schema;
only integer/string columns are profiled (float formatting is not
cross-engine-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format profile: (column, n_rows, n_null, n_distinct, min_s, max_s)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [f"'{c}'", f"_null_{c}", f"_nd_{c}", f"_min_{c}", f"_max_{c}"]
    long = wide.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS (column_name, n_null, n_distinct, min_s, max_s)"
        ),
    )
    return long.select("column_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s")


def profile_oracle_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin: one UNION ALL branch per column (the oracle does not need
    to be one-pass — only to agree)."""
    branches = [
        f"""
    SELECT '{c}' AS column_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_s, CAST(max({c}) AS VARCHAR) AS max_s
    FROM {table}"""
        for c in cols
    ]
    return "\n    UNION ALL".join(branches)


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Join/agg-key skew diagnosis — the operational companion to the salted
    aggregation (operators/skew.py): BEFORE picking a shuffle strategy for a
    key, measure how hot its hottest values are.  Emits the ``top_n``
    heaviest keys with their absolute count, corpus share in ppm (integer
    cross-multiply, engine-exact), and multiple-of-mean in ppm — the two
    numbers that decide broadcast vs salt vs AQE-skew-join.

    Scale: one partial-aggregable groupBy(key) (the thing being measured),
    then a top-n over the |keys|-row count table (TakeOrderedAndProject) and
    a broadcastable 1-row total.  Deterministic tiebreak on the key value.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "cnt",
            F.expr("(1000000 * cnt) DIV total").alias("share_ppm"),
            F.expr("(1000000 * cnt * n_keys) DIV total").alias("x_mean_ppm"),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(top_n)
    )


def key_skew_oracle_sql(table: str, key_col: str, top_n: int = 10, where: str = "TRUE") -> str:
    """DuckDB twin of key_skew_profile."""
    return f"""
    WITH counts AS (
      SELECT {key_col} AS key, count(*) AS cnt FROM {table} WHERE {where} GROUP BY 1
    ),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS n_keys FROM counts)
    SELECT key, cnt,
           (1000000 * cnt) // t.total AS share_ppm,
           (1000000 * cnt * t.n_keys) // t.total AS x_mean_ppm
    FROM counts CROSS JOIN t
    ORDER BY cnt DESC, key ASC LIMIT {top_n}
    """


def distribution_drift_tvd(
    df: DataFrame,
    value_col: str,
    side_pred,
    bin_cents: int = 500,
) -> DataFrame:
    """DISTRIBUTION DRIFT between two slices of a table as an exact TOTAL
    VARIATION DISTANCE over fixed value bins — the corpus-monitoring gate
    that answers "did this week's crawl shift the value distribution?"
    before a training mix is rebuilt.  TVD = (1/2) * sum_bins |p_i - q_i|
    is the L1 drift score; unlike PSI/KL it needs NO logarithms, so the
    statistic is exact integer arithmetic end-to-end, reproducible on any
    engine (chi2_keyness is the per-token companion; this is the
    distribution-level scalar with per-bin attribution).

    Integer form: with per-bin counts a_i (slice A, total NA) and b_i
    (slice B, total NB),

        tvd_ppm = 1e6 * sum_i |a_i * NB - b_i * NA|  div  (2 * NA * NB)

    — products run in decimal(38,0) (HUGEINT in the oracle; peak ~1e19 at
    100 TB scale, far past int64).  Output: one row per bin with both
    counts and the bin's drift contribution (ppm, same denominator), plus
    the bin ordering key — the scalar is the contribution sum; emitting
    per-bin rows keeps the result a diagnosable histogram, not a blind
    scalar.

    Shape: ONE partial-aggregable groupBy on the bin id with the side
    folded in as conditional sums (histogram-sized result), a 1-row total
    broadcast joined back, map-only arithmetic.  Same skeleton as
    sketch_histogram_quantiles.
    """
    # `div`, not `/`: Spark's `/` on longs is DOUBLE true-division (and a
    # double->long cast truncates where DuckDB's rounds); integer `div`
    # matches DuckDB `//` on the non-negative value domain (see
    # trimmed_mean's domain note for the signed caveat)
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    binned = df.select(
        cents.alias("cents"),
        F.when(side_pred, F.lit(1)).otherwise(F.lit(0)).alias("in_a"),
    ).select(F.expr(f"cents div {bin_cents}").alias("bin"), "in_a")
    counts = binned.groupBy("bin").agg(
        F.sum("in_a").alias("a"),
        F.sum(F.lit(1) - F.col("in_a")).alias("b"),
    )
    # totals via an unpartitioned window OVER THE HISTOGRAM (bin-count rows,
    # not corpus rows — the justified tiny-frame single partition), so the
    # corpus is scanned exactly once; an agg+rejoin would plan a second scan
    # of the input for the totals branch
    from pyspark.sql import Window

    w = Window.partitionBy()
    withtot = counts.select(
        "bin", "a", "b", F.sum("a").over(w).alias("na"), F.sum("b").over(w).alias("nb")
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    num = f"abs({dec.format('a')} * nb - {dec.format('b')} * na) * 1000000"
    den = f"2 * {dec.format('na')} * nb"
    return withtot.select(
        "bin",
        "a",
        "b",
        "na",
        "nb",
        F.expr(f"CAST({num} div ({den}) AS BIGINT)").alias("drift_ppm"),
    )


def drift_tvd_oracle_sql(
    table: str, value_col: str, side_sql: str, bin_cents: int = 500
) -> str:
    """DuckDB twin of distribution_drift_tvd.  ``side_sql`` is the slice-A
    predicate as SQL text."""
    return f"""
    WITH binned AS (
      SELECT CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT)
                  // {bin_cents} AS bin,
             CASE WHEN {side_sql} THEN 1 ELSE 0 END AS in_a
      FROM {table}
    ),
    counts AS (
      SELECT bin, CAST(sum(in_a) AS BIGINT) AS a,
             CAST(sum(1 - in_a) AS BIGINT) AS b
      FROM binned GROUP BY bin
    ),
    totals AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb FROM counts)
    SELECT bin, a, b, na, nb,
           CAST(abs(CAST(a AS HUGEINT) * nb - CAST(b AS HUGEINT) * na) * 1000000
                // (2 * CAST(na AS HUGEINT) * nb) AS BIGINT) AS drift_ppm
    FROM counts CROSS JOIN totals
    """
