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
    """Long-format profile: (column, n_rows, n_null, n_distinct, min_s, max_s).

    Plan shape (round-9 fix): min/max over STRING columns have non-mutable
    aggregation buffers, and the multi-count_distinct Expand gives the
    partial aggregate GROUPING KEYS — together the single wide aggregate
    planned SortAggregate over a Sort of the k×-expanded corpus (measured
    super-linear class, SCALE.md §48).  Split: branch A keeps the counts,
    distincts, and numeric min/max (all fixed-width buffers → HashAggregate
    even under the Expand — string columns appear only as grouping keys,
    which hash fine); branch B computes the string min/max in a GLOBAL
    aggregate with no grouping keys, where SortAggregate degenerates to a
    sort-free per-partition fold (requiredChildOrdering is empty) over a
    scan pruned to just the string columns.  The two 1-row frames broadcast-
    cross-join back together.  Zero Sort nodes anywhere (plan-pinned).
    """
    str_cols = [c for c, t in df.dtypes if c in cols and t == "string"]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
        ]
        if c not in str_cols:
            aggs += [
                F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
            ]
    wide = df.agg(*aggs)
    if str_cols:
        str_aggs = []
        for c in str_cols:
            str_aggs += [
                F.min(F.col(c)).alias(f"_min_{c}"),
                F.max(F.col(c)).alias(f"_max_{c}"),
            ]
        wide = wide.crossJoin(F.broadcast(df.select(*str_cols).agg(*str_aggs)))
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


def fk_orphans(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity AUDIT: for each declared FK relationship
    (name, child df, child key, parent df, parent key), the number of child
    rows whose key resolves to no parent (orphans), the number of DISTINCT
    orphaned key values, and the child row total — the data-quality
    expectation suite a warehouse runs after every load (dbt's
    `relationships` test, Deequ's `isContainedIn`, as one engine query).

    Shape (round-10 rewrite): each relation pre-aggregates its child to a
    (key, count) histogram in one single-column scan, then derives ALL
    THREE counts from one pass over that histogram via a LEFT join onto
    the DISTINCT parent keys (a resolution marker; distinct keeps the
    marker join exactly anti-join-shaped even if a parent key repeated):
    n_child_rows = sum(cnt), n_orphan_rows = sum(cnt) over unmarked keys,
    and countDistinct degenerates to count over the unmarked pre-grouped
    keys.  The old form scanned the child TWICE per relation (full-row
    anti-join + row total) and shuffled / broadcast RAW key streams; now
    the child is scanned once per relation (column-pruned to the key) and
    every join side is |distinct keys|-sized.  The marker join is
    MERGE-hinted: both sides descend from aggregations whose static
    estimates lie small — unhinted, Catalyst broadcast-planned the 45M-key
    orders side at sf3 and OOM'd the driver (SCALE.md §11 class;
    containment_pairs' lesson); sort-merge spills instead of failing at
    any keys:partitions ratio.  (A grouping-sets variant fusing the three
    lineitem histograms into ONE scan was probed at sf3 and lost: the
    3x Expand pushes every child row through the partial-aggregation hash
    map per grouping set, and the near-unique orderkey set barely
    collapses — single-column re-scans are cheaper than row inflation.)
    NULL child keys count as orphans (a NULL FK never joins — surfacing
    them is the point of the audit; declared in the oracle identically):
    the NULL-key histogram row never matches a parent, and the orphan-key
    count skips it exactly as countDistinct did.
    """
    outs = []
    for name, child, ckey, parent, pkey in relations:
        sl = (
            child.groupBy(F.col(ckey).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        marked = sl.hint("merge").join(
            parent.select(F.col(pkey).alias("k")).distinct().withColumn(
                "__hit", F.lit(1)
            ),
            "k",
            "left",
        )
        miss = F.col("__hit").isNull()
        outs.append(
            marked.agg(
                F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_child_rows"),
                F.coalesce(F.sum(F.when(miss, F.col("cnt"))), F.lit(0))
                .cast("long")
                .alias("n_orphan_rows"),
                F.count(F.when(miss, F.col("k"))).alias("n_orphan_keys"),
            ).select(
                F.lit(name).alias("relation"),
                "n_child_rows",
                "n_orphan_rows",
                "n_orphan_keys",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def fk_orphans_oracle_sql(relations: list[tuple[str, str, str, str, str]]) -> str:
    """DuckDB twin of fk_orphans over registered table views:
    relations = (name, child_table, child_key, parent_table, parent_key)."""
    parts = [
        f"""
    SELECT '{name}' AS relation,
           (SELECT count(*) FROM {child}) AS n_child_rows,
           (SELECT count(*) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pkey} = c.{ckey}))
             AS n_orphan_rows,
           (SELECT count(DISTINCT c.{ckey}) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pkey} = c.{ckey}))
             AS n_orphan_keys
    """
        for name, child, ckey, parent, pkey in relations
    ]
    return " UNION ALL ".join(parts)


def embedding_drift(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    side_pred,
    scale: int = 1_000,
) -> DataFrame:
    """EMBEDDING-SPACE drift between two corpus slices (side_pred true vs
    false): per-dimension delta between the slice centroids, in exact
    integer ppm of the quantization grid — the vector-space companion to
    profile_drift_tvd's categorical TVD ("did this week's crawl move the
    embedding distribution?", the check run before trusting an ANN index or
    a trained classifier on a new slice).

    Exactness: embeddings quantize to the 1/scale int64 grid (quantize_vec);
    each dimension aggregates (sum_a, n_a, sum_b, n_b) exactly, and the
    centroid delta is the cross-multiplied integer

        delta_ppm = (sum_a * n_b - sum_b * n_a) * 1e6 div (n_a * n_b)

    in decimal(38,0)/HUGEINT (sums ~1e12 x counts ~1e9 stay inside 38
    digits at any realistic corpus) — floor division, sign carried by the
    numerator; both engines agree bit-for-bit.  No sqrt, no mean floats.

    Scale shape: ONE posexplode feeds one partial-aggregable
    groupBy(dim) with conditional sums — output is |dims| rows; nothing
    else shuffles.  The whole-vector summary (cosine between centroids) is
    recoverable downstream from the emitted per-dim sums, since cosine is
    scale-invariant: cos(mean_a, mean_b) = cos(sum_a, sum_b).
    """
    from ..functions.vectors import quantize_vec

    base = df.select(
        F.coalesce(side_pred, F.lit(False)).alias("side"),
        F.posexplode(quantize_vec(F.col(vec_col), scale)).alias("dim", "qx"),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    agg = base.groupBy("dim").agg(
        F.sum(F.when(F.col("side"), F.col("qx")).otherwise(F.lit(0))).alias("sum_a"),
        F.sum(F.when(F.col("side"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("side"), F.col("qx")).otherwise(F.lit(0))).alias("sum_b"),
        F.sum(F.when(~F.col("side"), 1).otherwise(0)).alias("n_b"),
    )
    num = f"{dec.format('sum_a')} * n_b - {dec.format('sum_b')} * n_a"
    return agg.select(
        "dim",
        "sum_a",
        "n_a",
        "sum_b",
        "n_b",
        F.expr(
            f"CAST(CASE WHEN n_a > 0 AND n_b > 0 THEN ({num}) * 1000000 div ({dec.format('n_a')} * n_b) ELSE NULL END AS BIGINT)"
        ).alias("delta_ppm"),
    )


def embedding_drift_oracle_sql(
    side_sql: str, scale: int = 1_000, src: str = "embeddings", vec_col: str = "embedding"
) -> str:
    """DuckDB twin of embedding_drift (HUGEINT cross-multiplies)."""
    return f"""
    WITH base AS (
      SELECT coalesce(({side_sql}), FALSE) AS side,
             generate_subscripts({vec_col}, 1) - 1 AS dim,
             CAST(floor(CAST(unnest({vec_col}) AS DOUBLE) * {scale}) AS BIGINT) AS qx
      FROM {src}
    ),
    agg AS (
      SELECT dim,
             CAST(sum(CASE WHEN side THEN qx ELSE 0 END) AS BIGINT) AS sum_a,
             CAST(sum(CASE WHEN side THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN NOT side THEN qx ELSE 0 END) AS BIGINT) AS sum_b,
             CAST(sum(CASE WHEN NOT side THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM base GROUP BY dim
    )
    SELECT CAST(dim AS INTEGER) AS dim, sum_a, n_a, sum_b, n_b,
           CAST(CASE WHEN n_a > 0 AND n_b > 0
                THEN (sum_a::HUGEINT * n_b - sum_b::HUGEINT * n_a) * 1000000
                     // (n_a::HUGEINT * n_b)
                ELSE NULL END AS BIGINT) AS delta_ppm
    FROM agg
    """
