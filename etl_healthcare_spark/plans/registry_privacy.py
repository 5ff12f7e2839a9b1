"""Round-4 privacy & time-series-diagnostics batch: k-anonymity and
l-diversity audits of a quasi-identifier projection, CUSUM changepoint
detection over the event stream, and a day-of-week x hour seasonality
profile.

Training corpora carry people: before documents or records ship to a
training run, the pipeline must answer "how re-identifiable is a row from
its quasi-identifiers" (k-anonymity, Sweeney) and "does a small group leak
its sensitive attribute" (l-diversity, Machanavajjhala) — the reference
stores consent flags but never measures disclosure risk
(services/normalize/handler.ts persists; nothing audits).  The two
time-series reports are the drift alarms that page before a bad ingest
poisons a training mix: CUSUM localizes a level shift exactly, the
seasonality profile is the baseline it shifts against.

Exactness discipline: group sizes and distinct counts are integers;
deviations are kept as the cross-multiplied numerator n*x_i - total (no
integer-mean rounding is ever summed); seasonal indexes are
cross-multiplied ppm; event values enter as floor-cents per the registry
rule.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import _t, register

PPM = 1_000_000

# quasi-identifier projection: nation + market segment + $1000 balance band
_QI_BAND = "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000"
_QI_BAND_SPARK = _QI_BAND.replace("//", "div")


@register(
    "privacy_k_anonymity",
    sql=f"""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment, {_QI_BAND} AS bal_band,
             count(*) AS k
      FROM customer GROUP BY 1, 2, 3
    ),
    b AS (
      SELECT CASE WHEN k = 1 THEN 'k=1'
                  WHEN k < 5 THEN 'k=2-4'
                  WHEN k < 10 THEN 'k=5-9'
                  ELSE 'k>=10' END AS k_bucket,
             k
      FROM qi
    )
    SELECT k_bucket,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(k) AS BIGINT) AS n_rows,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(CAST(sum(k) AS HUGEINT) * {PPM} // CAST(sum(sum(k)) OVER () AS HUGEINT) AS BIGINT) AS row_share_ppm
    FROM b GROUP BY k_bucket
    """,
    doc="K-ANONYMITY AUDIT (Sweeney) of the (nation, market segment, $1000 "
    "balance band) quasi-identifier projection: every row's group size k "
    "is how many records an attacker holding those three attributes "
    "cannot tell apart — the report buckets groups into k=1 (unique, "
    "re-identifiable), 2-4, 5-9, >=10 and gives each bucket's exact row "
    "share in ppm.  Shape: one partial-aggregable groupBy collapses the "
    "scan to QI-group cardinality, a second tiny groupBy buckets it; the "
    "share denominator rides a constant-key window over the 4-row frame.  "
    "The release gate a training-data pipeline runs before shipping "
    "records keyed on demographic-like columns.",
)
def privacy_k_anonymity(spark, sf_dir):
    qi = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment", F.expr(_QI_BAND_SPARK).alias("bal_band"))
        .agg(F.count(F.lit(1)).alias("k"))
    )
    b = qi.select(
        F.when(F.col("k") == 1, F.lit("k=1"))
        .when(F.col("k") < 5, F.lit("k=2-4"))
        .when(F.col("k") < 10, F.lit("k=5-9"))
        .otherwise(F.lit("k>=10"))
        .alias("k_bucket"),
        "k",
    )
    agg = b.groupBy("k_bucket").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("k").alias("n_rows"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )
    return agg.select(
        "k_bucket",
        "n_groups",
        "n_rows",
        "min_k",
        "max_k",
        F.expr(f"n_rows * {PPM} div (sum(n_rows) OVER ())").alias("row_share_ppm"),
    )


@register(
    "privacy_l_diversity",
    sql=f"""
    WITH grp AS (
      SELECT c_nationkey, {_QI_BAND} AS bal_band,
             count(*) AS k,
             count(DISTINCT c_mktsegment) AS l
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(l AS BIGINT) AS l,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(k) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN l = 1 THEN k ELSE 0 END) AS BIGINT) AS rows_disclosed,
           CAST(CAST(sum(k) AS HUGEINT) * {PPM} // CAST(sum(sum(k)) OVER () AS HUGEINT) AS BIGINT) AS row_share_ppm
    FROM grp GROUP BY l
    """,
    doc="L-DIVERSITY AUDIT (Machanavajjhala): with (nation, balance band) "
    "as the quasi-identifier and market segment as the SENSITIVE "
    "attribute, a group where every member shares one segment (l=1) "
    "discloses that attribute to anyone who can place a person in the "
    "group — k-anonymity alone misses this homogeneity attack.  The "
    "report histograms groups by their distinct-sensitive-value count l "
    "with exact row shares; rows_disclosed surfaces the l=1 mass.  "
    "Shape: one groupBy with a distinct-count (two-phase partial "
    "aggregate, map-side combinable) to the QI frame, one tiny reagg; "
    "the denominator is a constant-key window over <=5 rows.  Runs next "
    "to privacy_k_anonymity on every release.",
)
def privacy_l_diversity(spark, sf_dir):
    grp = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey", F.expr(_QI_BAND_SPARK).alias("bal_band"))
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("c_mktsegment").alias("l"),
        )
    )
    agg = grp.groupBy("l").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("k").alias("n_rows"),
        F.sum(F.when(F.col("l") == 1, F.col("k")).otherwise(F.lit(0))).alias("rows_disclosed"),
    )
    return agg.select(
        F.col("l").cast("long").alias("l"),
        "n_groups",
        "n_rows",
        "rows_disclosed",
        F.expr(f"n_rows * {PPM} div (sum(n_rows) OVER ())").alias("row_share_ppm"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint localization over daily event totals
# ---------------------------------------------------------------------------


@register(
    "ts_cusum_changepoint",
    sql="""
    WITH daily AS (
      SELECT epoch_us(date_trunc('day', ts)) AS day_us,
             sum(CAST(floor(value * 100) AS BIGINT)) AS x
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT day_us, x,
             count(*) OVER () AS n,
             sum(x) OVER () AS total,
             sum(x) OVER (ORDER BY day_us) AS cum
      FROM daily
    ),
    c AS (
      SELECT day_us, x, n, total,
             n * cum - (row_number() OVER (ORDER BY day_us)) * total AS cusum_num
      FROM t
    )
    SELECT day_us, CAST(x AS BIGINT) AS x_cents,
           CAST(cusum_num AS BIGINT) AS cusum_num,
           CAST(CASE WHEN abs(cusum_num) = max(abs(cusum_num)) OVER ()
                     THEN 1 ELSE 0 END AS BIGINT) AS is_changepoint
    FROM c
    """,
    doc="CUSUM CHANGEPOINT localization over daily event totals, EXACT: "
    "the classic statistic max_i |sum_{j<=i}(x_j - mean)| is kept as the "
    "cross-multiplied integer n*cum_i - i*total (never a rounded integer "
    "mean summed i times — that drifts by up to i/2 cents), so the argmax "
    "day is a pure function of the data on any engine.  The flagged day "
    "is where a level shift most likely begins — the first question "
    "('when did the metric move?') after profile_drift_tvd says THAT it "
    "moved.  Shape: one partial-aggregable groupBy to the O(days) frame; "
    "all windows (totals, running sum, global argmax) run on those ~365 "
    "rows.  Sibling of anomaly_cusum (registry_mining), which locates "
    "per-event-type hourly shifts — this is the single corpus-level "
    "daily series an ingest-volume dashboard tracks; same exact "
    "cross-multiplied statistic, different grain.",
)
def ts_cusum_changepoint(spark, sf_dir):
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"))
        .agg(F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)")).alias("x"))
    )
    wall = W.partitionBy(F.lit(0))
    word = W.partitionBy(F.lit(0)).orderBy("day_us")
    t = daily.select(
        "day_us",
        "x",
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x").over(wall).alias("total"),
        F.sum("x").over(word).alias("cum"),
        F.row_number().over(word).alias("i"),
    )
    c = t.select(
        "day_us",
        "x",
        (F.col("n") * F.col("cum") - F.col("i") * F.col("total")).alias("cusum_num"),
    )
    return c.select(
        "day_us",
        F.col("x").cast("long").alias("x_cents"),
        F.col("cusum_num").cast("long").alias("cusum_num"),
        (F.abs("cusum_num") == F.max(F.abs("cusum_num")).over(wall))
        .cast("long")
        .alias("is_changepoint"),
    )


# ---------------------------------------------------------------------------
# day-of-week x hour seasonality profile
# ---------------------------------------------------------------------------


@register(
    "ts_seasonality_profile",
    sql=f"""
    WITH e AS (
      SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
             hour(ts) AS hr,
             CAST(floor(value * 100) AS BIGINT) AS v
      FROM events
    ),
    g AS (
      SELECT dow, hr, count(*) AS n, sum(v) AS sv FROM e GROUP BY 1, 2
    )
    SELECT CAST(dow AS BIGINT) AS dow, CAST(hr AS BIGINT) AS hr,
           CAST(n AS BIGINT) AS n, CAST(sv AS BIGINT) AS sum_cents,
           CAST(CAST(n AS HUGEINT) * (count(*) OVER ()) * {PPM}
                // CAST(sum(n) OVER () AS HUGEINT) AS BIGINT) AS traffic_index_ppm,
           CAST(CAST(sv AS HUGEINT) * sum(n) OVER () * {PPM}
                // (CAST(n AS HUGEINT) * CAST(sum(sv) OVER () AS HUGEINT)) AS BIGINT)
             AS value_index_ppm
    FROM g
    """,
    doc="SEASONALITY PROFILE over (day-of-week, hour) cells: each cell's "
    "traffic index (share of events vs. a uniform cell, ppm) and value "
    "index (cell mean vs. global mean, cross-multiplied exact ppm — "
    "sv*N_rows*1e6 / (n*Total), no float division).  Day-of-week is the "
    "portable epoch-day formula (epoch_us div 86400e6 + 4) mod 7 — "
    "Spark's dayofweek() is 1-based-Sunday while DuckDB's is 0-based, so "
    "neither builtin crosses engines; Thursday-anchored arithmetic does.  "
    "Shape: one partial-aggregable groupBy to <=168 cells; all "
    "normalizing windows run on that frame.  The baseline "
    "ts_cusum_changepoint's level shift is judged against.",
)
def ts_seasonality_profile(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        F.expr("(unix_micros(ts) div 86400000000 + 4) % 7").alias("dow"),
        F.hour("ts").alias("hr"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v"),
    )
    g = e.groupBy("dow", "hr").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    wall = W.partitionBy(F.lit(0))
    dec = "decimal(38,0)"
    w = g.select(
        "dow",
        "hr",
        "n",
        "sv",
        F.count(F.lit(1)).over(wall).cast(dec).alias("cells"),
        F.sum("n").over(wall).cast(dec).alias("tot_n"),
        F.sum("sv").over(wall).cast(dec).alias("tot_sv"),
    )
    return w.select(
        F.col("dow").cast("long").alias("dow"),
        F.col("hr").cast("long").alias("hr"),
        "n",
        F.col("sv").cast("long").alias("sum_cents"),
        F.expr(f"CAST(CAST(n AS DECIMAL(38,0)) * cells * {PPM} div tot_n AS BIGINT)").alias(
            "traffic_index_ppm"
        ),
        F.expr(
            f"CAST(CAST(sv AS DECIMAL(38,0)) * tot_n * {PPM}"
            f" div (CAST(n AS DECIMAL(38,0)) * tot_sv) AS BIGINT)"
        ).alias("value_index_ppm"),
    )
