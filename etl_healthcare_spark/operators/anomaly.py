"""Statistical anomaly flagging (z-score outliers) with EXACT integer
arithmetic (north-star analytics layer; reference analog is the threshold
alarm G3, services/metrics/src/alarms.ts:30-52, generalized from a fixed
threshold to a distribution-relative one).

The naive form  (v - mean)/stddev > z  is float math whose accumulation
order differs per engine.  Cross-multiplying removes every division and
square root: with per-group  n, s = sum(v), q = sum(v^2)  in int64 cents,

    z^2 > Z^2   <=>   (n*v - s)^2 * (n - 1)  >  Z^2 * n * (n*q - s^2)

— all integer products, evaluated in decimal(38,0) (Spark) / HUGEINT
(DuckDB), so the flag decision is bit-for-bit identical on any engine, with
no boundary jitter ever.

Scale shape: one partial-aggregated shuffle over the group key for (n, s, q)
— the moment sketch is tiny and mergeable — then the flagging pass is a
broadcast join + map-only predicate.  The decimal headroom holds to ~10^12
rows per group x 10^6 cents; past that, pre-aggregate per partition or step
down to double with an epsilon band (documented in SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..functions.materialize import materialize


def _cents(c: Column) -> Column:
    """Exact int64 cents via the repo-wide decimal(18,2) convention."""
    return (c.cast("decimal(18,2)") * 100).cast("long")


def group_moments(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(grp, n, s, q): count, sum and sum-of-squares of cents — the exact,
    mergeable 2nd-moment sketch."""
    v = _cents(F.col(value_col))
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("q"),
    )


def zscore_flags(
    df: DataFrame, group_col: str, value_col: str, id_col: str, z: int = 3
) -> DataFrame:
    """Rows whose value exceeds the group mean by more than ``z`` sample
    standard deviations (one-sided, the fraud/spike direction).

    Exact decision: (n*v - s) > 0  AND  (n*v-s)^2 * (n-1) > z^2 * n * (n*q - s^2).
    """
    moments = group_moments(df, group_col, value_col)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    v = _cents(F.col(value_col))
    joined = df.select(
        F.col(id_col).alias("id"), F.col(group_col).alias("grp"), v.alias("v_cents")
    ).join(F.broadcast(moments), "grp")
    # promote to decimal(38,0) BEFORE any product: n*q and s*s overflow int64
    # past ~10^5 rows/group x 10^4.7 cents (hit at sf1.0: 2M rows/group), and
    # DuckDB's side is already HUGEINT because sum() auto-promotes
    dev = dec(F.col("n")) * dec(F.col("v_cents")) - dec(F.col("s"))
    lhs = dev * dev * dec(F.col("n") - 1)
    rhs = dec(F.lit(z * z)) * dec(F.col("n")) * (
        dec(F.col("n")) * dec(F.col("q")) - dec(F.col("s")) * dec(F.col("s"))
    )
    return joined.where((F.col("n") > 1) & (dev > 0) & (lhs > rhs)).select(
        "grp", "id", "v_cents", "n"
    )


def zscore_oracle_sql(
    table: str, group_col: str, value_col: str, id_col: str, z: int = 3
) -> str:
    """DuckDB twin: identical cents quantization and HUGEINT cross-multiply."""
    return f"""
    WITH src AS (
      SELECT {group_col} AS grp, {id_col} AS id,
             CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM {table}
    ),
    m AS (
      SELECT grp, count(*) AS n, sum(v) AS s, sum(v * v) AS q
      FROM src GROUP BY grp
    )
    SELECT src.grp, src.id, src.v AS v_cents, m.n
    FROM src JOIN m USING (grp)
    WHERE m.n > 1
      AND (m.n * src.v - m.s) > 0
      AND CAST(m.n * src.v - m.s AS HUGEINT) * CAST(m.n * src.v - m.s AS HUGEINT)
            * CAST(m.n - 1 AS HUGEINT)
          > CAST({z * z} AS HUGEINT) * CAST(m.n AS HUGEINT)
            * CAST(m.n * m.q - m.s * m.s AS HUGEINT)
    """


# ---------------------------------------------------------------------------
# EWMA — exact dyadic exponential smoothing
# ---------------------------------------------------------------------------
#
# EWMA with alpha = 1/2 over the last K points:  s = sum_k v_{t-k} / 2^(k+1).
# Every weight is a power of two, so scaling by 2^K turns the whole sum into
# EXACT int64 arithmetic (cents * 2^(K-1-k), summed order-free), closed by a
# single IEEE division — bit-identical across engines, unlike float-recursive
# smoothing whose result depends on accumulation order.  The K-point
# truncation under-weights by at most 2^-K (K=16 -> 1.5e-5 relative).
#
# Scale shape: a row_number window bounds state to K rows per key BEFORE the
# collect (never an unbounded per-key array), then one groupBy fold.


def ewma_latest(
    df: DataFrame, key_col: str, ts_col: str, value_col: str, id_col: str, k: int = 16
) -> DataFrame:
    """(key, n_used, ewma): alpha=1/2 EWMA of the newest <=K values per key,
    ordered newest-first by (ts, id)."""
    from pyspark.sql import Window as W

    v = _cents(F.col(value_col))
    recent = (
        df.select(F.col(key_col).alias("key"), F.col(ts_col).alias("ts"), F.col(id_col).alias("id"), v.alias("v"))
        .withColumn("rn", F.row_number().over(W.partitionBy("key").orderBy(F.col("ts").desc(), F.col("id").desc())))
        .where(F.col("rn") <= k)
    )
    # newest first: weight of rn=r is 2^(K-r); scaled sum is exact int64
    # (v <= 1e6 cents, K=16 -> term <= 2^15 * 1e6 < 2^36, sum < 2^41)
    term = F.col("v") * F.expr(f"shiftleft(CAST(1 AS BIGINT), {k} - rn)")
    agg = recent.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_used"), F.sum(term).alias("s_scaled")
    )
    return agg.select(
        "key",
        "n_used",
        (F.col("s_scaled").cast("double") / F.lit(float(1 << k))).alias("ewma_cents"),
    )


def ewma_oracle_sql(
    table: str, key_col: str, ts_col: str, value_col: str, id_col: str, k: int = 16
) -> str:
    """DuckDB twin: same window bound, same dyadic integer weights."""
    return f"""
    WITH src AS (
      SELECT {key_col} AS key, {ts_col} AS ts, {id_col} AS id,
             CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             row_number() OVER (PARTITION BY {key_col}
                                ORDER BY {ts_col} DESC, {id_col} DESC) AS rn
      FROM {table}
    )
    SELECT key, count(*) AS n_used,
           CAST(sum(v * (1::BIGINT << ({k} - rn))) AS DOUBLE) / {float(1 << k)!r}
             AS ewma_cents
    FROM src WHERE rn <= {k}
    GROUP BY key
    """


def iqr_outlier_stats(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """Tukey-fence outlier profile per group on EXACT rank-selected quartiles
    (quantile type 1: the value at rank ceil(p*n), no interpolation — an
    interpolated quantile is a float blend whose last ulp differs by engine;
    the rank-selected one is a value that exists in the data, integer-exact).

    Fences at 3x IQR are compared via integer cross-multiplies
    (2*v < 2*q1 - 3*iqr), so the whole profile — quartiles, fence crossings —
    is a pure integer function of the input.  ``value_col`` must already be
    integer (fixed-point) units.

    HISTOGRAM shape (weighted_median's scale rule): the value at rank r
    under any (v, id) order is the smallest v whose cumulative count reaches
    r, so NOTHING here needs a raw-row window — (1) one partial-aggregable
    groupBy(g, v) histogram; (2) the cumulative window runs over the
    HISTOGRAM (|g| x |distinct v| rows, never raw rows); (3) quartiles fall
    out as conditional mins over the cumulated histogram, and the fence
    counts aggregate the SAME histogram against the broadcast quartile
    frame — the raw data is scanned exactly once.  (``id_col`` is kept for
    API compatibility; rank-selected VALUES never depended on the id
    tiebreak.)
    """
    from pyspark.sql import Window

    # checkpointed: the quartile path and the fence-count path both consume
    # the histogram — un-materialized, each re-ran the corpus scan +
    # aggregate (round-10; now exactly one raw pass).  |g x distinct
    # v|-sized, never corpus-sized.
    hist = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(materialize)
    )
    wg = Window.partitionBy("g")
    cum = hist.select(
        "g",
        "v",
        "cnt",
        F.sum("cnt").over(wg.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(wg).alias("n"),
    )
    q = cum.groupBy("g").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") >= F.expr("(n + 3) DIV 4"), F.col("v"))).alias("q1"),
        F.min(F.when(F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("v"))).alias("med"),
        F.min(F.when(F.col("cum") >= F.expr("(3 * n + 3) DIV 4"), F.col("v"))).alias("q3"),
    )
    flagged = (
        hist.join(F.broadcast(q.select("g", "q1", "q3")), "g")
        .withColumn("iqr", F.col("q3") - F.col("q1"))
        .groupBy("g")
        .agg(
            F.sum(
                F.when(2 * F.col("v") < 2 * F.col("q1") - 3 * F.col("iqr"), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("n_low"),
            F.sum(
                F.when(2 * F.col("v") > 2 * F.col("q3") + 3 * F.col("iqr"), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("n_high"),
        )
    )
    return (
        q.join(flagged, "g")
        .select(
            F.col("g").alias(group_col),
            "n", "q1", "med", "q3",
            (F.col("q3") - F.col("q1")).alias("iqr"),
            "n_low", "n_high",
        )
    )


def iqr_oracle_sql(table: str, group_col: str, value_expr: str, id_col: str, where: str = "TRUE") -> str:
    """DuckDB twin of iqr_outlier_stats (same integer ranks and fences)."""
    return f"""
    WITH src AS (
      SELECT {group_col} AS g, {value_expr} AS v, {id_col} AS i FROM {table} WHERE {where}
    ),
    ranked AS (
      SELECT g, v, i,
             row_number() OVER (PARTITION BY g ORDER BY v, i) AS r,
             count(*) OVER (PARTITION BY g) AS n
      FROM src
    ),
    q AS (
      SELECT g, max(n) AS n,
             max(CASE WHEN r = (n + 3) // 4 THEN v END) AS q1,
             max(CASE WHEN r = (n + 1) // 2 THEN v END) AS med,
             max(CASE WHEN r = (3 * n + 3) // 4 THEN v END) AS q3
      FROM ranked GROUP BY g
    ),
    f AS (
      SELECT ranked.g,
             CAST(sum(CASE WHEN 2 * v < 2 * q.q1 - 3 * (q.q3 - q.q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
             CAST(sum(CASE WHEN 2 * v > 2 * q.q3 + 3 * (q.q3 - q.q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      FROM ranked JOIN q ON ranked.g = q.g GROUP BY ranked.g
    )
    SELECT q.g AS {group_col}, q.n, q.q1, q.med, q.q3, q.q3 - q.q1 AS iqr, f.n_low, f.n_high
    FROM q JOIN f ON q.g = f.g
    """


def seasonal_baseline_flags(
    df: DataFrame, ts_col: str, group_col: str, high_x2: int = 4, low_x2: int = 1
) -> DataFrame:
    """Seasonality-aware volume anomalies: each (group, hour) bucket's event
    count compares against the RANK-EXACT MEDIAN count of the same
    hour-of-day across the observation window — the robust baseline that a
    global mean would get wrong twice (diurnal cycles inflate daytime
    variance; outages drag the mean toward themselves).

    Integer end to end: counts are exact, the baseline is the value at rank
    ceil(n/2) (no interpolation — same discipline as iqr_outlier_stats),
    and flags are cross-multiplies ``2*cnt > high_x2*med`` / ``2*cnt <
    low_x2*med`` (default: flag hours above 2x or below 0.5x their
    hour-of-day median).

    Scale: one (group, hour-bucket) count aggregation (partial-aggregated:
    buckets ~ groups x hours-of-window), one window over the per-(group,
    hod) count series for the median rank, one broadcast-sized join back.
    Output one row per flagged hour bucket."""
    from pyspark.sql import Window

    hourly = (
        df.select(
            F.col(group_col).alias("g"),
            F.date_trunc("hour", F.col(ts_col)).alias("h"),
        )
        .groupBy("g", "h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("hod", F.hour("h"))
    )
    w = Window.partitionBy("g", "hod").orderBy("cnt", "h")
    ranked = hourly.withColumn("r", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g", "hod"))
    )
    med = (
        ranked.where(F.col("r") == F.expr("(n + 1) DIV 2"))
        .select(F.col("g"), F.col("hod"), F.col("cnt").alias("med"))
    )
    return (
        hourly.join(med, ["g", "hod"])
        .where(
            (2 * F.col("cnt") > F.lit(high_x2) * F.col("med"))
            | (2 * F.col("cnt") < F.lit(low_x2) * F.col("med"))
        )
        .select(
            F.col("g").alias(group_col),
            F.unix_micros("h").alias("hour_us"),
            "hod",
            "cnt",
            "med",
            (2 * F.col("cnt") > F.lit(high_x2) * F.col("med")).alias("is_high"),
        )
    )


def seasonal_oracle_sql(
    table: str, ts_col: str, group_col: str, high_x2: int = 4, low_x2: int = 1
) -> str:
    """DuckDB twin of seasonal_baseline_flags."""
    return f"""
    WITH hourly AS (
      SELECT {group_col} AS g, date_trunc('hour', {ts_col}) AS h, count(*) AS cnt
      FROM {table} GROUP BY 1, 2
    ),
    hod AS (SELECT g, h, cnt, extract(hour FROM h) AS hod FROM hourly),
    ranked AS (
      SELECT g, hod, cnt,
             row_number() OVER (PARTITION BY g, hod ORDER BY cnt, h) AS r,
             count(*) OVER (PARTITION BY g, hod) AS n
      FROM hod
    ),
    med AS (SELECT g, hod, cnt AS med FROM ranked WHERE r = (n + 1) // 2)
    SELECT hod.g AS {group_col}, epoch_us(hod.h) AS hour_us,
           CAST(hod.hod AS INT) AS hod, hod.cnt, med.med,
           2 * hod.cnt > {high_x2} * med.med AS is_high
    FROM hod JOIN med ON hod.g = med.g AND hod.hod = med.hod
    WHERE 2 * hod.cnt > {high_x2} * med.med OR 2 * hod.cnt < {low_x2} * med.med
    """


# ---------------------------------------------------------------------------
# CUSUM — exact integer cumulative-sum changepoint scan
# ---------------------------------------------------------------------------


def cusum_changepoint(df: DataFrame, ts_col: str, group_col: str) -> DataFrame:
    """Per-group changepoint candidate by the CUSUM statistic over hourly
    volumes: S_t = sum_{i<=t} (n*x_i - T) — the mean-removed cumulative sum
    cross-multiplied by n so every term is an exact int64 (no mean division).
    |S_t| peaks at the split point where the before/after level difference is
    largest (Page's CUSUM, offline form); the emitted row per group is that
    argmax hour with (abs_s DESC, hour ASC) total tiebreak.

    Scale shape: one bucket-count aggregation (partial-aggregable), a
    broadcast of the per-group (n, T) totals, one per-group ordered window
    for the running sum — the same topology as w3_moving_avg, so a hot group
    degrades to one sorted partition of its OWN buckets (bounded by the time
    range, not the row count).  Magnitudes: |S| <= n * T <= 10^4 buckets x
    row count — int64-safe beyond 10^14 rows per group.
    """
    from pyspark.sql import Window

    counts = df.groupBy(
        F.col(group_col).alias("grp"), F.date_trunc("hour", F.col(ts_col)).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_buckets"), F.sum("cnt").alias("total")
    )
    w_cum = Window.partitionBy("grp").orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_seq = Window.partitionBy("grp").orderBy("bucket")
    s = (
        counts.join(F.broadcast(tot), "grp")
        .withColumn(
            "s",
            F.col("n_buckets") * F.sum("cnt").over(w_cum)
            - F.row_number().over(w_seq) * F.col("total"),
        )
        .withColumn("abs_s", F.abs(F.col("s")))
    )
    w_pick = Window.partitionBy("grp").orderBy(F.col("abs_s").desc(), F.col("bucket").asc())
    return (
        s.withColumn("rn", F.row_number().over(w_pick))
        .where(F.col("rn") == 1)
        .select(
            "grp",
            "n_buckets",
            "total",
            F.unix_micros(F.col("bucket")).alias("cp_hour_us"),
            F.col("abs_s").alias("max_abs_s"),
        )
    )


def cusum_oracle_sql(table: str, ts_col: str, group_col: str) -> str:
    """DuckDB twin of cusum_changepoint: identical bucket counts, running
    cross-multiplied sum, and (abs_s, bucket) argmax tiebreak."""
    return f"""
    WITH counts AS (
      SELECT {group_col} AS grp, date_trunc('hour', {ts_col}) AS bucket, count(*) AS cnt
      FROM {table} GROUP BY 1, 2
    ),
    tot AS (SELECT grp, count(*) AS n_buckets, sum(cnt) AS total FROM counts GROUP BY grp),
    s AS (
      SELECT c.grp, t.n_buckets, t.total, c.bucket,
             abs(t.n_buckets * sum(c.cnt) OVER (PARTITION BY c.grp ORDER BY c.bucket)
                 - (row_number() OVER (PARTITION BY c.grp ORDER BY c.bucket)) * t.total
             ) AS abs_s
      FROM counts c JOIN tot t USING (grp)
    )
    SELECT grp, n_buckets, CAST(total AS BIGINT) AS total,
           epoch_us(bucket) AS cp_hour_us, CAST(abs_s AS BIGINT) AS max_abs_s
    FROM (
      SELECT *, row_number() OVER (PARTITION BY grp ORDER BY abs_s DESC, bucket ASC) AS rn
      FROM s
    ) WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# MAD — rank-exact median absolute deviation outliers
# ---------------------------------------------------------------------------


def mad_flags(df: DataFrame, group_col: str, value_col: str, id_col: str) -> DataFrame:
    """Rows where |value - median| exceeds 3 * 1.4826 * MAD within the group
    (MAD = median of absolute deviations from the median) — the robust
    outlier rule that survives what breaks both z-score (mean and stddev are
    themselves dragged by the outliers being hunted) and IQR (degenerate when
    >50% of values tie).  Hampel's standard consistency constant 1.4826
    enters as the exact integer cross-multiply 10000*dev > 44478*mad — no
    float boundary.

    Both medians are RANK-exact lower medians (r = (n+1)//2).  HISTOGRAM
    shape (anomaly_iqr's scale rule — the raw-row windows here were the
    sf1.0 heap hot spot): the lower median is the smallest value whose
    cumulative count reaches (n+1)//2, so (1) one partial-aggregable
    groupBy(grp, v) histogram feeds a cumulative window over the HISTOGRAM
    for the value median; (2) the DEVIATION histogram is derived from the
    same value histogram (|v - med| re-aggregated — histogram-sized, no
    second raw pass) and cumulated the same way for the MAD; (3) one
    map-only flagging scan over the raw rows against the broadcast
    (med, mad) frame.  Raw data: one histogram shuffle + one scan — no
    raw-row window at any group cardinality.  Emits
    (grp, id, v_cents, med, mad).
    """
    from pyspark.sql import Window

    v = _cents(F.col(value_col))
    src = df.select(
        F.col(group_col).alias("grp"), F.col(id_col).alias("id"), v.alias("v_cents")
    )
    # checkpointed: the value-median path, the deviation-histogram path, and
    # (via dev_hist) the MAD path each re-derived this histogram from a
    # fresh corpus scan (round-10 plan: 4 scans of the source; now 2 — the
    # histogram pass + the unavoidable row-level flagging scan).  The frame
    # is |grp x distinct value|-sized, never corpus-sized.
    hist = (
        src.groupBy("grp", "v_cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(materialize)
    )
    wg = Window.partitionBy("grp")

    def lower_median(h: DataFrame, val: str, out: str) -> DataFrame:
        cum = h.select(
            "grp",
            F.col(val),
            F.sum("cnt")
            .over(wg.orderBy(val).rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
            F.sum("cnt").over(wg).alias("n"),
        )
        return cum.groupBy("grp").agg(
            F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col(val))).alias(out)
        )

    med = lower_median(hist, "v_cents", "med")
    dev_hist = (
        hist.join(F.broadcast(med), "grp")
        .select("grp", F.abs(F.col("v_cents") - F.col("med")).alias("dev"), "cnt")
        .groupBy("grp", "dev")
        .agg(F.sum("cnt").alias("cnt"))
    )
    mad = lower_median(dev_hist, "dev", "mad")
    return (
        src.join(F.broadcast(med.join(mad, "grp")), "grp")
        .withColumn("dev", F.abs(F.col("v_cents") - F.col("med")))
        .where(F.lit(10000) * F.col("dev") > F.lit(44478) * F.col("mad"))
        .select("grp", "id", "v_cents", "med", "mad")
    )


def mad_oracle_sql(table: str, group_col: str, value_col: str, id_col: str) -> str:
    """DuckDB twin of mad_flags: identical cents quantization, lower-median
    ranks, and integer cross-multiply."""
    return f"""
    WITH src AS (
      SELECT {group_col} AS grp, {id_col} AS id,
             CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM {table}
    ),
    med AS (
      SELECT grp, v AS med FROM (
        SELECT grp, v,
               row_number() OVER (PARTITION BY grp ORDER BY v, id) AS r,
               count(*) OVER (PARTITION BY grp) AS n
        FROM src
      ) WHERE r = (n + 1) // 2
    ),
    dev AS (
      SELECT src.grp, src.id, src.v, med.med, abs(src.v - med.med) AS dev
      FROM src JOIN med USING (grp)
    ),
    mad AS (
      SELECT grp, dev AS mad FROM (
        SELECT grp, dev,
               row_number() OVER (PARTITION BY grp ORDER BY dev, id) AS r,
               count(*) OVER (PARTITION BY grp) AS n
        FROM dev
      ) WHERE r = (n + 1) // 2
    )
    SELECT dev.grp, dev.id, dev.v AS v_cents, dev.med, mad.mad
    FROM dev JOIN mad USING (grp)
    WHERE 10000 * dev.dev > 44478 * mad.mad
    """
