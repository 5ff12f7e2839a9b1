"""Grouped regression / correlation statistics — the REGR_SLOPE /
REGR_INTERCEPT / CORR aggregate surface (ANSI SQL:2003 OLAP aggregates),
re-expressed integer-exact so results hash-compare across engines.

Why not float aggregates: CORR/REGR_* accumulate doubles, and the partial-
aggregation combine order changes the last bits per engine/partitioning —
they could only ever be rows-only checks.  And >2^63 exact integers are not
safe to CAST to double either: measured DuckDB hugeint->double and Spark
decimal->double disagree by 1 ulp on e.g. 25000000000000000000001.  So the
whole computation stays in EXACT integer space (int64 raw values, decimal(38)
power sums — DuckDB hugeint on the oracle side) and the outputs are
ppm-scaled integer divisions of magnitudes plus explicit signs (negative
quotients floor vs truncate differently per engine, so only non-negative
values ever divide):

    Dxy = n*Sxy - Sx*Sy,  Dxx = n*Sxx - Sx^2,  Dyy = n*Syy - Sy^2
    slope     = sign(Dxy)   * (1e6*|Dxy|) div Dxx            [ppm, y/x units]
    intercept = sign(I_num) * |Sy*Dxx - Dxy*Sx| div (n*Dxx)  [floor |.|, y units]
    corr^2    = (1e6*Rxy^2) div (Rxx*Ryy)                    [ppm, 0..1e6]
      where Rxy = |Dxy| div n, Rxx = Dxx div n, Ryy = Dyy div n

The corr^2 moments are n-REDUCED first: Dxy^2 scales as n^4 and would
exceed decimal(38) around sf1 on lineitem, while the reduced quotients scale
as n^2 — headroom to n ~ 1e9 per group.  The reduction floor loses O(1/Dxy)
relative accuracy but is applied identically in both engines, so the
statistic stays hash-exact by definition.

Scale: ONE partial-aggregable groupBy — six sums and a count, map-side
combined to |groups| rows; no joins, no windows.  The aggregation shape
survives any corpus size; value WIDTH picks the unit (here: quantity as-is,
price floor-reduced to whole dollars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..functions.materialize import materialize


def _sign(c: Column) -> Column:
    return F.when(c > 0, F.lit(1)).when(c < 0, F.lit(-1)).otherwise(F.lit(0)).cast("bigint")


def grouped_regression(
    df: DataFrame, x: Column, y: Column, group_cols: list[str]
) -> DataFrame:
    """Per-group exact regression stats of integer column y on x.

    ``x``/``y`` must already be exact int64 expressions (caller picks the
    unit).  Output per group: n, sum_x, sum_y, slope/intercept/corr as the
    sign + ppm-magnitude integers documented in the module docstring.
    """
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(d(x) * d(x)).alias("sxx"),
        F.sum(d(y) * d(y)).alias("syy"),
        F.sum(d(x) * d(y)).alias("sxy"),
    )
    n, sx, sy = d(F.col("n")), d(F.col("sx")), d(F.col("sy"))
    dxy = n * F.col("sxy") - sx * sy
    dxx = n * F.col("sxx") - sx * sx
    dyy = n * F.col("syy") - sy * sy
    inum = sy * dxx - dxy * sx  # intercept numerator over (n*dxx)
    e6 = d(F.lit(1000000))
    # Spark decimal `div` returns a LONG of the integral quotient — exact
    # whenever the quotient fits int64, which every output here does by
    # construction (ppm of bounded ratios).  Magnitudes only: |.| before div.
    mids = agg.select(
        *group_cols,
        F.col("n"),
        F.col("sx").alias("sum_x"),
        F.col("sy").alias("sum_y"),
        _sign(dxy).alias("slope_sign"),
        _sign(inum).alias("intercept_sign"),
        (e6 * F.abs(dxy)).alias("_sl_num"),
        dxx.alias("_dxx"),
        F.abs(inum).alias("_i_num"),
        (n * dxx).alias("_i_den"),
        F.abs(dxy).alias("_adxy"),
        dyy.alias("_dyy"),
        n.alias("_nd"),
    )
    red = mids.select(
        *group_cols,
        "n",
        "sum_x",
        "sum_y",
        "slope_sign",
        F.expr("_sl_num div nullif(_dxx, CAST(0 AS DECIMAL(38,0)))").alias("slope_abs_ppm"),
        "intercept_sign",
        F.expr("_i_num div nullif(_i_den, CAST(0 AS DECIMAL(38,0)))").alias("intercept_abs"),
        # n-reduced second moments (long-ranged; re-promoted to square)
        F.expr("_adxy div _nd").cast("decimal(38,0)").alias("_rxy"),
        F.expr("_dxx div _nd").cast("decimal(38,0)").alias("_rxx"),
        F.expr("_dyy div _nd").cast("decimal(38,0)").alias("_ryy"),
    )
    return red.select(
        *group_cols,
        "n",
        "sum_x",
        "sum_y",
        "slope_sign",
        "slope_abs_ppm",
        "intercept_sign",
        "intercept_abs",
        F.expr(
            "(CAST(1000000 AS DECIMAL(38,0)) * _rxy * _rxy) div nullif(_rxx * _ryy, CAST(0 AS DECIMAL(38,0)))"
        ).alias("corr2_ppm"),
    )


# ---------------------------------------------------------------------------
# time-series second moments: autocovariance and cross-covariance
# ---------------------------------------------------------------------------


def autocov_lags(
    df: DataFrame, ts_col: str, group_col: str, lags: tuple[int, ...] = (1, 2)
) -> DataFrame:
    """Per-group lag-k autocovariance NUMERATORS over the hourly volume
    series: acov_num(k) = sum_t dev_t * dev_{t-k} with dev_t = n*x_t - T
    (mean removed by cross-multiplication — exact int64, no division).  A
    strongly positive lag-1 value means volume shocks persist hour-to-hour;
    sign flips expose oscillating load.  The n-scaled numerator orders lags
    identically to the normalized autocorrelation within a group, so the
    exact-integer form keeps the full diagnostic power without a float
    boundary.

    Shape: one bucket-count aggregation, a broadcast of (n, T), ONE ordered
    window computing all lags in a single pass, then a partial-aggregable
    rollup; the stack() unpivot is map-side.  Products promote to
    decimal(38,0) before summing — dev^2 crosses int64 near 10^9-row groups.
    """
    from pyspark.sql import Window

    counts = df.groupBy(
        F.col(group_col).alias("grp"), F.date_trunc("hour", F.col(ts_col)).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_buckets"), F.sum("cnt").alias("total")
    )
    w = Window.partitionBy("grp").orderBy("bucket")
    dev = (
        counts.join(F.broadcast(tot), "grp")
        .withColumn("dev", F.col("n_buckets") * F.col("cnt") - F.col("total"))
    )
    for k in lags:
        dev = dev.withColumn(
            f"p{k}",
            (
                F.col("dev").cast("decimal(38,0)")
                * F.lag("dev", k).over(w).cast("decimal(38,0)")
            ),
        )
    pairs = dev.select(
        "grp",
        F.expr(
            "stack("
            + str(len(lags))
            + ", "
            + ", ".join(f"{k}, p{k}" for k in lags)
            + ") AS (lag, prod)"
        ),
    )
    return pairs.groupBy("grp", "lag").agg(
        F.count("prod").alias("n_pairs"),
        F.sum("prod").cast("long").alias("acov_num"),
    )


def autocov_oracle_sql(table: str, ts_col: str, group_col: str, lags: tuple[int, ...] = (1, 2)) -> str:
    """DuckDB twin of autocov_lags (HUGEINT products, identical lag frame)."""
    lag_rows = "\nUNION ALL\n".join(
        f"SELECT grp, {k} AS lag, CAST(dev AS HUGEINT) * CAST("
        f"lag(dev, {k}) OVER (PARTITION BY grp ORDER BY bucket) AS HUGEINT) AS prod FROM dev"
        for k in lags
    )
    return f"""
    WITH counts AS (
      SELECT {group_col} AS grp, date_trunc('hour', {ts_col}) AS bucket, count(*) AS cnt
      FROM {table} GROUP BY 1, 2
    ),
    tot AS (SELECT grp, count(*) AS n_buckets, sum(cnt) AS total FROM counts GROUP BY grp),
    dev AS (
      SELECT c.grp, c.bucket, t.n_buckets * c.cnt - t.total AS dev
      FROM counts c JOIN tot t USING (grp)
    ),
    pairs AS ({lag_rows})
    SELECT grp, lag, count(prod) AS n_pairs, CAST(sum(prod) AS BIGINT) AS acov_num
    FROM pairs GROUP BY grp, lag
    """


def cross_covariance(df: DataFrame, ts_col: str, group_col: str) -> DataFrame:
    """Cross-covariance NUMERATOR between every pair of groups' hourly volume
    series: cov_num = n*S_ab - S_a*S_b over the hours BOTH groups are active
    — the correlation-mining primitive behind "which event types move
    together" (co-incident errors and purchases point at checkout trouble;
    decoupled view/click at a broken tracker).

    Shape: the (grp, bucket, cnt) table is tiny relative to the input (bounded
    by |groups| x time range), so the bucket-keyed self-join below it is NOT a
    row-level self-join — it shuffles the pre-aggregated series only.  Pair
    count is |groups| choose 2; products promote to decimal(38,0).
    """
    counts = df.groupBy(
        F.col(group_col).alias("grp"), F.date_trunc("hour", F.col(ts_col)).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    a = counts.select(F.col("grp").alias("grp_a"), "bucket", F.col("cnt").alias("ca"))
    b = counts.select(F.col("grp").alias("grp_b"), "bucket", F.col("cnt").alias("cb"))
    joined = a.join(b, "bucket").where(F.col("grp_a") < F.col("grp_b"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = joined.groupBy("grp_a", "grp_b").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("ca").alias("sa"),
        F.sum("cb").alias("sb"),
        F.sum(F.col("ca").cast("decimal(38,0)") * F.col("cb").cast("decimal(38,0)")).alias("sab"),
    )
    return agg.select(
        "grp_a",
        "grp_b",
        "n_hours",
        (dec("n_hours") * F.col("sab") - dec("sa") * dec("sb")).cast("long").alias("cov_num"),
    )


def cross_covariance_oracle_sql(table: str, ts_col: str, group_col: str) -> str:
    """DuckDB twin of cross_covariance."""
    return f"""
    WITH counts AS (
      SELECT {group_col} AS grp, date_trunc('hour', {ts_col}) AS bucket, count(*) AS cnt
      FROM {table} GROUP BY 1, 2
    ),
    j AS (
      SELECT a.grp AS grp_a, b.grp AS grp_b, a.cnt AS ca, b.cnt AS cb
      FROM counts a JOIN counts b ON a.bucket = b.bucket AND a.grp < b.grp
    )
    SELECT grp_a, grp_b, count(*) AS n_hours,
           CAST(CAST(count(*) AS HUGEINT) * sum(CAST(ca AS HUGEINT) * CAST(cb AS HUGEINT))
                - CAST(sum(ca) AS HUGEINT) * CAST(sum(cb) AS HUGEINT) AS BIGINT) AS cov_num
    FROM j GROUP BY grp_a, grp_b
    """


# ---------------------------------------------------------------------------
# robust location: two-sided trimmed mean (rank-exact)
# ---------------------------------------------------------------------------


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    trim_ppm: int = 100_000,
) -> DataFrame:
    """Per-group trimmed mean: drop the lowest and highest trim_ppm share of
    values (by exact rank, floor(n*trim/1e6) rows per side) and average the
    rest — the robust location estimate between mean (trim 0) and median
    (trim 0.5); the standard guardrail for latency/value dashboards where a
    handful of sentinel values would drag the mean.

    Integer-exact: values quantize to int64 cents, the kept-set boundary is
    a pure rank function of (value, id) — total order, so re-runs and
    engines agree on exactly WHICH rows are kept — and the mean is emitted
    as (sum_cents, n_kept, floor-millis ratio).  One hash shuffle on the
    group key + one in-partition rank window over it (same single-shuffle
    layout as anomaly_iqr/anomaly_mad: the window reuses the groupBy
    partitioning).

    Domain: group sums must be non-negative (Spark's `div` truncates toward
    zero, DuckDB's `//` floors — they agree only at >= 0; events.value is
    positive by construction).  For signed data use the (num - num % den)/den
    floor spelling (chi2_keyness does)."""
    from pyspark.sql import Window

    v = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    src = df.select(
        F.col(group_col).alias("grp"), v.alias("v"), F.col(id_col).alias("id")
    )
    w = Window.partitionBy("grp")
    ranked = src.select(
        "grp",
        "v",
        F.row_number().over(w.orderBy("v", "id")).alias("r"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    kept = ranked.where(
        (F.col("r") > F.expr(f"n * {trim_ppm} div 1000000"))
        & (F.col("r") <= F.expr(f"n - n * {trim_ppm} div 1000000"))
    )
    return kept.groupBy(F.col("grp").alias(group_col)).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("v").alias("sum_cents"),
        F.expr("sum(v) * 1000 div count(1)").alias("mean_millicents"),
    )


def trimmed_mean_oracle_sql(
    table: str, group_col: str, value_col: str, id_col: str, trim_ppm: int = 100_000
) -> str:
    """DuckDB twin of trimmed_mean."""
    return f"""
    WITH src AS (
      SELECT {group_col} AS grp, {id_col} AS id,
             CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM {table}
    ),
    ranked AS (
      SELECT grp, v,
             row_number() OVER (PARTITION BY grp ORDER BY v, id) AS r,
             count(*) OVER (PARTITION BY grp) AS n
      FROM src
    )
    SELECT grp AS {group_col}, count(*) AS n_kept,
           CAST(sum(v) AS BIGINT) AS sum_cents,
           CAST(sum(v) * 1000 // count(*) AS BIGINT) AS mean_millicents
    FROM ranked
    WHERE r > n * {trim_ppm} // 1000000 AND r <= n - n * {trim_ppm} // 1000000
    GROUP BY grp
    """


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    id_col: str,
    bin_cents: int = 500,
) -> DataFrame:
    """Per-group exact WEIGHTED (lower) median: the smallest value v such
    that the cumulative weight of values <= v reaches half the group's
    total weight (2*cumw >= total in integers — no halves).  The
    token-weighted statistic training-corpus dashboards need ("median
    document quality BY TOKEN MASS, not by document count"): a million empty
    docs can drag a plain median but carry no token weight.

    HISTOGRAM-REFINE shape (the scale story): a raw-row cumulative window
    partitioned by a LOW-cardinality group buffers millions of rows in a
    single window task (a 20M-row partition at 60M-row scale — observed heap
    exhaustion).  Instead: (1) ONE partial-aggregable histogram groupBy on
    (grp, v div bin_cents) — tiny; (2) per-group bin-level cumulative window
    over the HISTOGRAM locates the crossing bin (the first bin whose
    cumulative weight reaches half) — bins-per-group rows, never raw rows;
    (3) a value-level aggregation over ONLY the crossing bin's rows
    (broadcast-joined crossing frame prunes the second scan's shuffle to
    <= bin_cents distinct values per group) finds the exact crossing value.
    Every shuffle is partial-aggregable; every window partition is
    histogram- or bin-sized.

    Integer-exact: values quantize to int64 cents, weights are int64, and
    the result depends only on value-level cumulative weights (run-end
    sums), so the deliberately-different DuckDB oracle — a straightforward
    row-level cumulative window over the (value, id) total order — derives
    the IDENTICAL median independently: two derivations, one hash.
    Domain: non-negative values (`div` vs `//` floor agreement; see
    trimmed_mean's note).
    """
    from pyspark.sql import Window

    v = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    src = df.select(
        F.col(group_col).alias("grp"),
        v.alias("v"),
        F.col(weight_col).cast("long").alias("wt"),
    ).select("grp", "v", "wt", F.expr(f"v div {bin_cents}").alias("bin"))

    # ONE corpus scan (round-10): the VALUE-level histogram (grp, bin, v) ->
    # sum(wt) is partial-aggregable and |distinct values|-sized, and it is
    # sufficient for BOTH downstream needs — the bin histogram is a regroup
    # of it, and the crossing-bin refine reads its rows directly instead of
    # re-scanning the raw data (the old step 3 paid a second full corpus
    # scan).  Checkpointed because the two consumers' subtrees canonicalize
    # differently (the join branch infers an extra IsNotNull(bin) into the
    # scan filter and prunes different columns), so AQE exchange reuse
    # cannot dedupe them — measured: without the checkpoint the plan runs
    # the scan+aggregate twice.  The checkpointed frame is domain-bounded
    # (|distinct values|), never corpus-sized.
    vhist = (
        src.groupBy("grp", "bin", "v")
        .agg(F.sum("wt").alias("vw"))
        .transform(materialize)
    )
    hist = vhist.groupBy("grp", "bin").agg(F.sum("vw").alias("binw"))
    wg = Window.partitionBy("grp")
    cum = hist.select(
        "grp",
        "bin",
        "binw",
        F.sum("binw").over(wg.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_end"
        ),
        F.sum("binw").over(wg).alias("total_weight"),
    )
    # first crossing bin per group: scalar min/min_by aggregates only —
    # min_by(struct, bin) buffers a struct (not UnsafeRow-mutable) and
    # planned SortAggregate; min_by(long, long) buffers two longs and stays
    # HashAggregate (bin is unique per grp in the histogram, so the three
    # scalar picks land on the same row — no tie ambiguity).
    crossing = (
        cum.where(2 * F.col("cum_end") >= F.col("total_weight"))
        .groupBy("grp")
        .agg(
            F.min("bin").alias("c_bin"),
            F.min_by("cum_end", "bin").alias("c_cum_end"),
            F.min_by("binw", "bin").alias("c_binw"),
            F.max("total_weight").alias("total_weight"),
        )
        .select(
            F.col("grp").alias("xgrp"),
            F.col("c_bin").alias("xbin"),
            (F.col("c_cum_end") - F.col("c_binw")).alias("cum_before"),
            "total_weight",
        )
    )
    inbin = vhist.join(
        F.broadcast(crossing),
        (F.col("grp") == F.col("xgrp")) & (F.col("bin") == F.col("xbin")),
    ).select("grp", "v", "vw", "cum_before", "total_weight")
    wv = Window.partitionBy("grp")
    vcum = inbin.select(
        "grp",
        "v",
        "total_weight",
        (
            F.col("cum_before")
            + F.sum("vw").over(wv.orderBy("v").rowsBetween(Window.unboundedPreceding, 0))
        ).alias("cumv"),
    )
    return (
        vcum.where(2 * F.col("cumv") >= F.col("total_weight"))
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.min("v").alias("w_median_cents"),
            F.max("total_weight").alias("total_weight"),
        )
    )


def weighted_median_oracle_sql(
    table: str, group_col: str, value_col: str, weight_col: str, id_col: str
) -> str:
    """DuckDB twin of weighted_median."""
    return f"""
    WITH src AS (
      SELECT {group_col} AS grp, {id_col} AS id,
             CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CAST({weight_col} AS BIGINT) AS wt
      FROM {table}
    ),
    cum AS (
      SELECT grp, v,
             sum(wt) OVER (PARTITION BY grp ORDER BY v, id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             sum(wt) OVER (PARTITION BY grp) AS total_weight
      FROM src
    )
    SELECT grp AS {group_col}, CAST(min(v) AS BIGINT) AS w_median_cents,
           CAST(max(total_weight) AS BIGINT) AS total_weight
    FROM cum WHERE 2 * cumw >= total_weight GROUP BY grp
    """


def median_interp2(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group INTERPOLATED median (SQL percentile_cont(0.5) / type-7),
    emitted exactly: because the interpolated median is the mean of the two
    middle order statistics, TWICE the median — ``med2_cents = v_at(ceil
    (n/2)) + v_at(n div 2 + 1)`` in integer cents — is an exact int64, so
    the float-blend last-ulp problem that keeps percentile_cont out of the
    cross-engine registry disappears (a consumer divides by 2 for display;
    g11_median stays the rank-selected lower median, this closes the
    interpolated variant).

    HISTOGRAM-REFINE shape (round-10; guide §8.4 "decide with small rows,
    move big rows once"): the value at any rank is the smallest value
    whose cumulative count reaches it.  The previous form ran ONE
    cumulative window over the full (g, v) histogram — near-unique values
    make that histogram corpus-sized, and a low-cardinality group column
    packs it into |groups| window tasks (3 tasks sorting ~200k rows each
    at sf0.1; an unbounded straggler at 100 TB).  Instead: (1) ONE corpus
    scan builds a (g, bin, v) value histogram — domain-bounded (distinct
    cents values), lazily checkpointed because its two consumers below
    canonicalize differently so AQE exchange reuse cannot dedupe them;
    (2) a bin-level cumulative window over the regrouped bin histogram
    (|value domain| / bin_cents rows per group) locates BOTH middle
    ranks' crossing bins in one exploded ('lo'/'hi') pass; (3) the
    crossing bins' histogram rows (a broadcast join prunes to ~2 bins per
    group) feed an in-bin cumulative window over <= bin_cents distinct
    values per (group, rank); med2 = sum of the two picks.  Two probed
    and rejected variants (sf3, 180M rows): refine straight off parquet
    with no checkpoint — LOST 2.6x, the decimal decode makes every corpus
    pass expensive; LAZY checkpoint — LOST 2.4x, the first consumer here
    is the crossing-bin BROADCAST subquery and materializing the blocks
    inside that job serializes it against the main scan, so the eager
    variant's dedicated 32-way job wins.  Domain: non-negative NON-NULL
    values (`div` floor agreement, weighted_median's note; an all-NULL
    group aggregates xbin to NULL and drops out of the inbin equi-join, so
    it vanishes from the output instead of emitting (g, n, NULL) — callers
    with nullable value columns must filter or impute first) and MODEST
    group cardinality: ``cross`` (~2 rows per group) is broadcast, so at
    millions of groups the hint would rebuild the driver-side broadcast
    pressure fk_orphans removed — drop the hint and let the planner choose
    if the operator is ever pointed at a high-cardinality group column.
    """
    from pyspark.sql import Window

    bin_cents = 500
    v = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    vhist = (
        df.select(F.col(group_col).alias("g"), v.alias("v"))
        .select("g", "v", F.expr(f"v div {bin_cents}").alias("bin"))
        .groupBy("g", "bin", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # EAGER: the first consumer is the broadcast subquery (cross), and
        # lazy materialization inside that job probed 2.4x slower at sf3
        # (docstring) — the b1ae41f lazy discipline applies only when the
        # first consumer is a full-parallelism driver action
        .transform(materialize)
    )
    hist = vhist.groupBy("g", "bin").agg(F.sum("cnt").alias("binc"))
    wg = Window.partitionBy("g")
    cum = hist.select(
        "g",
        "bin",
        "binc",
        F.sum("binc").over(wg.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_end"
        ),
        F.sum("binc").over(wg).alias("n"),
    )
    # both middle ranks in one pass: explode the two targets, keep the
    # first bin whose cumulative count reaches each; min_by(long, long)
    # keeps the pick HashAggregate (bin unique per (g, tag) here)
    targets = cum.select(
        "g",
        "bin",
        "binc",
        "cum_end",
        "n",
        F.explode(
            F.array(
                F.struct(F.lit("lo").alias("tag"), F.expr("(n + 1) DIV 2").alias("rt")),
                F.struct(F.lit("hi").alias("tag"), F.expr("n DIV 2 + 1").alias("rt")),
            )
        ).alias("t"),
    ).select("g", "bin", "binc", "cum_end", "n", "t.tag", "t.rt")
    cross = (
        targets.where(F.col("cum_end") >= F.col("rt"))
        .groupBy("g", "tag")
        .agg(
            F.min("bin").alias("xbin"),
            F.min_by("cum_end", "bin").alias("c_end"),
            F.min_by("binc", "bin").alias("c_cnt"),
            F.max("n").alias("n"),
            F.max("rt").alias("rt"),
        )
        .select(
            F.col("g").alias("xg"),
            "tag",
            "xbin",
            (F.col("c_end") - F.col("c_cnt")).alias("cum_before"),
            "rt",
            "n",
        )
    )
    # the crossing bins' value-histogram rows (~2 bins per group, pruned by
    # the broadcast join) feed the in-bin cumulative window — reading the
    # checkpointed histogram, never the raw corpus again
    inbin = vhist.join(
        F.broadcast(cross),
        (F.col("g") == F.col("xg")) & (F.col("bin") == F.col("xbin")),
    ).select("g", "tag", "v", "cnt", "cum_before", "rt", "n")
    wv = Window.partitionBy("g", "tag").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    vcum = inbin.withColumn("cumv", F.col("cum_before") + F.sum("cnt").over(wv))
    pick = (
        vcum.where(F.col("cumv") >= F.col("rt"))
        .groupBy("g", "tag")
        .agg(F.min("v").alias("pv"), F.max("n").alias("n"))
    )
    return (
        pick.groupBy("g")
        .agg(F.max("n").alias("n"), F.sum("pv").alias("med2_cents"))
        .select(F.col("g").alias(group_col), "n", "med2_cents")
    )


def median_interp2_oracle_sql(
    table: str, group_col: str, value_col: str, where: str = "TRUE"
) -> str:
    """DuckDB twin of median_interp2 via row-level rank selection (the
    derivation the Spark side deliberately avoids)."""
    return f"""
    WITH src AS (
      SELECT {group_col} AS g,
             CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM {table} WHERE {where}
    ),
    ranked AS (
      SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS r,
             count(*) OVER (PARTITION BY g) AS n
      FROM src
    )
    SELECT g AS {group_col}, max(n) AS n,
           CAST(max(CASE WHEN r = (n + 1) // 2 THEN v END)
                + max(CASE WHEN r = n // 2 + 1 THEN v END) AS BIGINT) AS med2_cents
    FROM ranked GROUP BY g
    """


def two_sample_ecdf(
    df: DataFrame,
    is_a,
    val_col: str,
    bucket_span: int = 50_000,
) -> DataFrame:
    """Per-distinct-value joint ECDF frame for two samples sharing one value
    axis: (v, ca_v, cb_v, ca_cum, cb_cum) with cumulative counts INCLUSIVE
    of v — the shared substrate of the exact KS and Mann-Whitney statistics.

    Scale shape — an exact GLOBAL cumulative sum with NO global sort (the
    token_shards rule, operators/sampling.py:788): distinct values
    coarse-bucket by ``v div bucket_span``; per-bucket totals are one
    partial-aggregable groupBy, the bucket PREFIX runs in a window over the
    AGGREGATED bucket frame and broadcasts back, and the within-bucket
    cumulative window never holds more than a bucket's distinct values.
    Requires non-negative integer values (div = floor agreement)."""
    from pyspark.sql import Window

    a_flag = is_a if not isinstance(is_a, str) else F.col(is_a)
    per_val = (
        df.select(F.col(val_col).alias("v"), a_flag.cast("long").alias("ia"))
        .groupBy("v")
        .agg(F.sum("ia").alias("ca_v"), F.sum(F.lit(1) - F.col("ia")).alias("cb_v"))
        .withColumn("bucket", F.expr(f"v div {bucket_span}"))
    )
    bsums = per_val.groupBy("bucket").agg(
        F.sum("ca_v").alias("ba"), F.sum("cb_v").alias("bb")
    )
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bsums.select(
        "bucket",
        F.coalesce(F.sum("ba").over(wb), F.lit(0)).alias("pa"),
        F.coalesce(F.sum("bb").over(wb), F.lit(0)).alias("pb"),
    )
    wi = Window.partitionBy("bucket").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_val.join(F.broadcast(prefix), "bucket")
        .select(
            "v",
            "ca_v",
            "cb_v",
            (F.col("pa") + F.sum("ca_v").over(wi)).alias("ca_cum"),
            (F.col("pb") + F.sum("cb_v").over(wi)).alias("cb_cum"),
        )
    )


def ecdf_oracle_cte(base_sql: str) -> str:
    """DuckDB twin of two_sample_ecdf as a CTE chain ending in ``ecdf``.
    ``base_sql`` must select (v, ia) rows; the oracle takes the row-level
    global cumulative windows the Spark side deliberately avoids."""
    return f"""base AS (
      {base_sql}
    ),
    per_val AS (
      SELECT v, CAST(sum(ia) AS BIGINT) AS ca_v,
             CAST(sum(1 - ia) AS BIGINT) AS cb_v
      FROM base GROUP BY v
    ),
    ecdf AS (
      SELECT v, ca_v, cb_v,
             CAST(sum(ca_v) OVER (ORDER BY v) AS BIGINT) AS ca_cum,
             CAST(sum(cb_v) OVER (ORDER BY v) AS BIGINT) AS cb_cum
      FROM per_val
    )"""
