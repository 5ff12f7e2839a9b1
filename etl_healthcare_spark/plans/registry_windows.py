"""Registry batch: window functions (SURVEY §2.9 — the G6/Q3 latest-per-group
of api-query/src/handler.ts:110-139 generalized), set operations (§2.10),
sorts/limits/top-k/keyset pagination (§2.7, api-query/src/handler.ts:84-127)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..datasets import load_table
from ..operators.pagination import encode_token, keyset_page
from .registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "w1_ranking",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER w AS rn,
             rank()       OVER w AS rk,
             dense_rank() OVER w AS drk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
    doc="W1 ranking trio (row_number/rank/dense_rank): top-3 orders per "
    "customer — Q3 latestObservation generalized (SURVEY §2.9).",
)
def w1_ranking(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "w2_lag_delta",
    sql="""
    SELECT event_id, user_id, event_type, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    """,
    doc="W2 lag/lead analytics: change since previous observation per "
    "(patient, code) — the observation-delta extension of the reference's "
    "patient timeline (SURVEY §2.9).",
)
def w2_lag_delta(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "w3_moving_avg",
    sql="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,3))) OVER w AS DOUBLE) AS sum7,
           count(*) OVER w AS n7,
           CAST(sum(CAST(value AS DECIMAL(18,3))) OVER w AS DOUBLE)
             / (count(*) OVER w) AS avg7
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    doc="W3 moving average over a 7-row frame per patient — vitals smoothing "
    "over the timeline (SURVEY §2.9 rowsBetween); decimal-exact sum, single "
    "double division.",
)
def w3_moving_avg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, W.currentRow)
    sum7 = F.sum(F.col("value").cast("decimal(18,3)")).over(w).cast("double")
    n7 = F.count("*").over(w)
    return ev.select("event_id", "user_id", sum7.alias("sum7"), n7.alias("n7"), (sum7 / n7).alias("avg7"))


@register(
    "w4_range_frame",
    sql="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_10min,
           CAST(sum(CAST(value AS DECIMAL(18,3))) OVER w AS DOUBLE) AS sum_10min
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="W4 time-range frame: trailing 10-minute window per patient "
    "(rangeBetween over epoch-us ordering — SURVEY §2.9 rangeBetween).",
)
def w4_range_frame(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = W.partitionBy("user_id").orderBy("ts_us").rangeBetween(-600_000_000, W.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_10min"),
        F.sum(F.col("value").cast("decimal(18,3)")).over(w).cast("double").alias("sum_10min"),
    )


@register(
    "set_ops",
    sql="""
    WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'both' AS tag, c_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
    UNION ALL
    SELECT 'only_a' AS tag, c_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
    UNION ALL
    SELECT 'only_b' AS tag, c_custkey FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
    """,
    doc="Set operations (SURVEY §2.10): intersect / except / union composed — "
    "the audit-vs-persisted reconciliation pattern (README.md:63-65).",
)
def set_ops(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    both = a.intersect(b).select(F.lit("both").alias("tag"), "c_custkey")
    only_a = a.subtract(b).select(F.lit("only_a").alias("tag"), "c_custkey")  # EXCEPT DISTINCT
    only_b = b.subtract(a).select(F.lit("only_b").alias("tag"), "c_custkey")
    return both.unionByName(only_a).unionByName(only_b)


@register(
    "o2_topk",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="O2 descending top-k with total tiebreak order (latest-first scan + "
    "limit, api-query/src/handler.ts:115-127) — TakeOrderedAndProject, no "
    "global sort.",
)
def o2_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "o4_keyset_page",
    sql="""
    SELECT event_id, epoch_us(ts) AS ts_us
    FROM events
    WHERE (ts, event_id) > (TIMESTAMP '2024-01-15 00:00:00', 5000)
    ORDER BY ts, event_id LIMIT 100
    """,
    doc="O4 keyset pagination: opaque token -> strictly-after predicate + "
    "ordered limit (api-query/src/handler.ts:85,106 nextToken semantics; "
    "keyset, NOT offset — O(page) at any depth).",
)
def o4_keyset_page(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    token = encode_token(["2024-01-15 00:00:00", 5000])
    page = keyset_page(ev.select("ts", "event_id"), ["ts", "event_id"], 100, token)
    return page.select("event_id", F.unix_micros("ts").alias("ts_us"))


@register(
    "w5_rank_distribution",
    sql="""
    SELECT event_id, user_id,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           dense_rank() OVER w AS drank
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
    doc="§2.9 ranking distribution functions: ntile/percent_rank/cume_dist/"
    "dense_rank over a per-user frame with a total tiebreak order — the "
    "generalization of Q3's row_number ranking.",
)
def w5_rank_distribution(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
    )


@register(
    "g9_session_window",
    sql="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id < 200
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
    doc="Session windows (30-min inactivity gap) — the [capability] streaming "
    "window family of SURVEY §2.12 in batch form via F.session_window "
    "(state-merging windows in one shuffle); the oracle derives identical "
    "sessions with the gaps-and-islands pattern.  Spark's session end = last "
    "event + gap, mirrored in the oracle.",
)
def g9_session_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 200)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
        )
    )


@register(
    "w6_locf_gapfill",
    sql="""
    WITH src AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      FROM events WHERE user_id < 100
    )
    SELECT user_id, event_id,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM src
    """,
    doc="LOCF gap-fill (last observation carried forward): last_value "
    "ignoreNulls over an ordered per-entity frame — the standard imputation "
    "for sensor/vitals time-series and sparse training features; one window "
    "shuffle on the entity key, NULLs injected deterministically.",
)
def w6_locf_gapfill(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 100)
    src = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double")).otherwise(F.col("value")).alias("v"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    return src.select(
        "user_id", "event_id", F.last("v", ignorenulls=True).over(w).alias("v_filled")
    )


@register(
    "g11_median",
    sql="""
    SELECT l_returnflag,
           median(l_quantity) AS med_qty,
           CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(max(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="G5 exact-percentile variant: exact median per group (full-sort "
    "percentile — the exact complement of g5b's GK sketch; at 100 TB the "
    "sketch is the default and this is the verification path).",
)
def g11_median(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
    )


@register(
    "w7_interpolate",
    sql="""
    WITH src AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      FROM events WHERE user_id < 100
    ),
    ctx AS (
      SELECT user_id, event_id, ts_us, v,
        last_value(v IGNORE NULLS) OVER wp AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS) OVER wp AS pt,
        first_value(v IGNORE NULLS) OVER wn AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS) OVER wn AS nt
      FROM src
      WINDOW wp AS (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + ((nv - pv) * CAST(ts_us - pt AS DOUBLE))
                          / CAST(nt - pt AS DOUBLE)
           END AS v_interp
    FROM ctx
    """,
    doc="Linear-interpolation gap-fill (the numeric complement of w6's LOCF): "
    "NULL runs replaced by the time-weighted line between the neighboring "
    "observations — two mirrored ignoreNulls window passes over one "
    "partition shuffle; leading/trailing gaps fall back to nearest "
    "observation.  The interpolation expression is structured identically "
    "in both engines (one multiply, one divide, one add on doubles), so "
    "results are bit-exact.",
)
def w7_interpolate(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 100)
    src = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double")).otherwise(F.col("value")).alias("v"),
    )
    wp = W.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    wn = W.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(W.currentRow, W.unboundedFollowing)
    nn_ts = F.when(F.col("v").isNotNull(), F.col("ts_us"))
    ctx = src.select(
        "user_id", "event_id", "ts_us", "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(nn_ts, ignorenulls=True).over(wp).alias("pt"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(nn_ts, ignorenulls=True).over(wn).alias("nt"),
    )
    interp = F.col("pv") + (
        (F.col("nv") - F.col("pv")) * (F.col("ts_us") - F.col("pt")).cast("double")
    ) / (F.col("nt") - F.col("pt")).cast("double")
    return ctx.select(
        "user_id",
        "event_id",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(interp)
        .alias("v_interp"),
    )


@register(
    "g13_sliding_window",
    sql="""
    WITH ks AS (SELECT unnest(generate_series(0, 1)) AS k),
    assigned AS (
      SELECT time_bucket(INTERVAL '1 minute', ts) - k * INTERVAL '1 minute' AS w_start,
             event_type, value, ts
      FROM events, ks
      WHERE ts >= time_bucket(INTERVAL '1 minute', ts) - k * INTERVAL '1 minute'
        AND ts < time_bucket(INTERVAL '1 minute', ts) - k * INTERVAL '1 minute'
              + INTERVAL '2 minutes'
    )
    SELECT epoch_us(w_start) AS w_start_us, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS value_sum
    FROM assigned
    GROUP BY 1, 2
    """,
    doc="Sliding (hopping) window aggregation: 2-minute windows every 1 "
    "minute — each event lands in exactly two windows (Spark's window() "
    "with a slide; the oracle expands the window membership explicitly).  "
    "Decimal-exact sums; the same shape runs unchanged as a watermarked "
    "streaming query.",
)
def g13_sliding_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 minutes", "1 minute").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("value_sum"),
        )
        .select(F.unix_micros("w.start").alias("w_start_us"), "event_type", "n", "value_sum")
    )


@register(
    "u5_incremental_agg",
    sql="""
    SELECT user_id,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT)) AS BIGINT)
             AS total_milli,
           count(*) AS n
    FROM events GROUP BY 1
    """,
    doc="Incremental aggregate maintenance: a materialized per-key partial "
    "state (sum/count over the historical 80%) merged with a new delta "
    "batch by RE-AGGREGATING PARTIALS — the algebraic-aggregate update that "
    "avoids rescanning history at 100 TB.  The oracle recomputes from "
    "scratch; matching hashes prove partial-merge == full recompute "
    "(exact int64 milli-units make the equality safe).",
)
def u5_incremental_agg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    milli = (F.col("value").cast("decimal(18,3)") * 1000).cast("long")

    def partial(df):
        return df.groupBy("user_id").agg(
            F.sum(milli).alias("total_milli"), F.count("*").alias("n")
        )

    state = partial(ev.where(F.col("event_id") % 5 < 4))   # the materialized history
    delta = partial(ev.where(F.col("event_id") % 5 == 4))  # the incoming micro-batch
    return (
        state.unionByName(delta)
        .groupBy("user_id")
        .agg(F.sum("total_milli").alias("total_milli"), F.sum("n").alias("n"))
    )


@register(
    "g19_ohlc_bars",
    sql="""
    WITH base AS (
      SELECT event_type,
             epoch_us(date_trunc('hour', ts)) AS bar_us,
             CAST(epoch_us(ts) AS HUGEINT) * 10000000000000
               + (CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) + 5000000000000) AS packed,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    )
    SELECT event_type, bar_us,
           -- positive-modulus decode: negative-timestamp-safe, in lockstep
           -- with the engine's pmod decode (functions/packing.py)
           CAST(((min(packed) % 10000000000000) + 10000000000000) % 10000000000000
                AS BIGINT) - 5000000000000 AS open_cents,
           CAST(((max(packed) % 10000000000000) + 10000000000000) % 10000000000000
                AS BIGINT) - 5000000000000 AS close_cents,
           max(cents) AS high_cents,
           min(cents) AS low_cents,
           CAST(count(*) AS BIGINT) AS n_ticks,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(cents) AS DOUBLE) / count(*) AS avg_cents
    FROM base
    GROUP BY 1, 2
    """,
    doc="G19 OHLC time bars — the first/last-by-timestamp rollup every "
    "time-series store ships: per (metric, hour) open/high/low/close in "
    "exact int64 cents, tick count, and a single-division average.  "
    "First/last are exact MIN/MAX over the DECIMAL(38,0)/HUGEINT packing "
    "us·10^13 + (cents + 5·10^12), order-isomorphic with (ts, cents) — a "
    "total order on what the bar reports (same-µs same-cents ticks are "
    "interchangeable) that both engines replay identically.  The packing "
    "replaces struct min/max, whose non-UnsafeRow-mutable buffer silently "
    "planned SORTAGGREGATE — a per-partition sort of the full tick stream "
    "(the SCALE.md §48 super-linear class); decimal buffers hash, so the "
    "whole bar is ONE partial-aggregable HashAggregate that map-side "
    "combines at any volume (plan-pinned in test_plans.py).",
)
def g19_ohlc_bars(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    OFF, K = 5_000_000_000_000, 10_000_000_000_000
    cents = F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
    base = ev.select(
        "event_type",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("bar_us"),
        F.unix_micros(F.col("ts")).alias("us"),
        cents.alias("cents"),
    )
    packed = F.expr(
        f"CAST(us AS DECIMAL(38,0)) * {K} + (CASE WHEN abs(cents) >= {OFF} THEN "
        f"raise_error('g19: |cents| >= 5e12 overflows the ts*1e13+cents packing') "
        f"ELSE cents END + {OFF})"
    )
    return base.groupBy("event_type", "bar_us").agg(
        # pmod decode: negative-timestamp-safe (functions/packing.py)
        F.pmod(F.min(packed), F.lit(K)).cast("long").alias("__open_raw"),
        F.pmod(F.max(packed), F.lit(K)).cast("long").alias("__close_raw"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum("cents").alias("sum_cents"),
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("avg_cents"),
    ).select(
        "event_type",
        "bar_us",
        (F.col("__open_raw") - F.lit(OFF)).alias("open_cents"),
        (F.col("__close_raw") - F.lit(OFF)).alias("close_cents"),
        "high_cents",
        "low_cents",
        "n_ticks",
        "sum_cents",
        "avg_cents",
    )
