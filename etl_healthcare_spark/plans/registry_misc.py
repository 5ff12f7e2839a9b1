"""Registry batch: scalar-function surface (SURVEY §2.11 — the function
families the reference exercises across its handlers), approximate
aggregates (scale path), streaming-mode query, pivot/subquery surface, and
on-disk store operators (rows-only checks — filesystem side effects are not
SQL-expressible)."""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F

from ..datasets import load_table
from .registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "scalar_functions",
    sql="""
    SELECT event_id,
           lower(event_type) AS f_lower,
           upper(event_type) AS f_upper,
           substr(event_type, 1, 3) AS f_substr,
           event_type || ':' || CAST(user_id AS VARCHAR) AS f_concat,
           concat_ws('#', 'TENANT', CAST(user_id % 10 AS VARCHAR)) AS f_concat_ws,
           printf('EVENT#%s#%d', event_type, user_id) AS f_format,
           lpad(CAST(user_id AS VARCHAR), 6, '0') AS f_lpad,
           length(event_type) AS f_length,
           CASE WHEN event_type LIKE 'c%' THEN 1 ELSE 0 END AS f_like,
           contains(event_type, 'ick') AS f_contains,
           ends_with(event_type, 'or') AS f_endswith,
           regexp_replace(event_type, '[aeiou]', '_', 'g') AS f_regexp_replace,
           regexp_extract(props, '"k": (\\d+)', 1) AS f_regexp_extract,
           to_base64(encode(event_type)) AS f_base64,
           decode(from_base64(to_base64(encode(event_type)))) AS f_unbase64,
           least(user_id, 75) AS f_least,
           greatest(user_id, 75) AS f_greatest,
           coalesce(nullif(event_type, 'error'), 'ERR') AS f_nullif_coalesce,
           CASE WHEN value > 50 THEN 'high' ELSE 'low' END AS f_when,
           strftime(ts, '%Y-%m-%d') AS f_date,
           CAST(hour(ts) AS BIGINT) AS f_hour,
           epoch_us(date_trunc('day', ts)) AS f_trunc_us,
           epoch_us(ts + INTERVAL 90 MINUTE) AS f_interval_us,
           abs(value - 50) AS f_abs,
           round(CAST(value AS DECIMAL(10,3)) * 2, 1) AS f_round_dec,
           CAST(floor(value) AS BIGINT) AS f_floor,
           CAST(ceil(value) AS BIGINT) AS f_ceil,
           sha256(event_type) AS f_sha256,
           json_extract_string(props, '$.k') AS f_json
    FROM events WHERE event_id < 500
    """,
    doc="§2.11 scalar-function surface in one query: string ops (split/trim "
    "family exercised in P1-P4), concat/format/pad key templates "
    "(persist/handler.ts:20-26), LIKE/contains/endsWith routing "
    "(normalize/handler.ts:63-70), regex, base64 tokens "
    "(api-query/src/handler.ts:85,106), least/greatest clamps, coalesce/"
    "nullif/when fallback chains, date/interval arithmetic, hashing, JSON.",
)
def scalar_functions(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 500)
    et, uid = F.col("event_type"), F.col("user_id")
    return ev.select(
        "event_id",
        F.lower(et).alias("f_lower"),
        F.upper(et).alias("f_upper"),
        F.substring(et, 1, 3).alias("f_substr"),
        F.concat(et, F.lit(":"), uid.cast("string")).alias("f_concat"),
        F.concat_ws("#", F.lit("TENANT"), (uid % 10).cast("string")).alias("f_concat_ws"),
        F.format_string("EVENT#%s#%d", et, uid).alias("f_format"),
        F.lpad(uid.cast("string"), 6, "0").alias("f_lpad"),
        F.length(et).alias("f_length"),
        F.when(et.like("c%"), 1).otherwise(0).alias("f_like"),
        et.contains("ick").alias("f_contains"),
        et.endswith("or").alias("f_endswith"),
        F.regexp_replace(et, "[aeiou]", "_").alias("f_regexp_replace"),
        F.regexp_extract("props", r'"k": (\d+)', 1).alias("f_regexp_extract"),
        F.base64(F.encode(et, "UTF-8")).alias("f_base64"),
        F.decode(F.unbase64(F.base64(F.encode(et, "UTF-8"))), "UTF-8").alias("f_unbase64"),
        F.least(uid, F.lit(75)).alias("f_least"),
        F.greatest(uid, F.lit(75)).alias("f_greatest"),
        F.coalesce(F.nullif(et, F.lit("error")), F.lit("ERR")).alias("f_nullif_coalesce"),
        F.when(F.col("value") > 50, "high").otherwise("low").alias("f_when"),
        F.date_format("ts", "yyyy-MM-dd").alias("f_date"),
        F.hour("ts").cast("long").alias("f_hour"),
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("f_trunc_us"),
        F.unix_micros(F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("f_interval_us"),
        F.abs(F.col("value") - 50).alias("f_abs"),
        F.round(F.col("value").cast("decimal(10,3)") * 2, 1).alias("f_round_dec"),
        F.floor("value").alias("f_floor"),
        F.ceil("value").alias("f_ceil"),
        F.sha2(et, 256).alias("f_sha256"),
        F.get_json_object("props", "$.k").alias("f_json"),
    )


@register(
    "array_map_functions",
    sql="""
    WITH t AS (
      SELECT event_id, string_split(event_type, 'i') AS arr,
             CAST(value AS DECIMAL(10,3)) AS v
      FROM events WHERE event_id < 200
    )
    SELECT event_id,
           len(arr) AS a_size,
           arr[1] AS a_first,
           arr[len(arr)] AS a_last,
           array_to_string(arr, '|') AS a_joined,
           list_contains(arr, 'cl') AS a_contains,
           CAST(len(list_filter(arr, x -> length(x) > 1)) AS INT) AS a_filtered,
           array_to_string(list_transform(arr, x -> upper(x)), '|') AS a_upper,
           array_to_string(list_sort(arr), '|') AS a_sorted
    FROM t
    """,
    doc="§2.11 array surface: split/size/element_at/array_join/contains/"
    "filter/transform/sort — the HL7 component machinery (P2-P4) generalized.",
)
def array_map_functions(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 200)
    t = ev.select("event_id", F.split("event_type", "i").alias("arr"))
    return t.select(
        "event_id",
        F.size("arr").alias("a_size"),
        F.try_element_at("arr", F.lit(1)).alias("a_first"),
        F.try_element_at("arr", F.size("arr")).alias("a_last"),
        F.array_join("arr", "|").alias("a_joined"),
        F.array_contains("arr", "cl").alias("a_contains"),
        F.size(F.filter("arr", lambda x: F.length(x) > 1)).alias("a_filtered"),
        F.array_join(F.transform("arr", lambda x: F.upper(x)), "|").alias("a_upper"),
        F.array_join(F.sort_array("arr"), "|").alias("a_sorted"),
    )


@register(
    "g5b_approx_quantiles",
    sql=None,  # approximate sketch: engine-specific by construction
    doc="G5 scale path: approx_percentile (GK sketch) + approx_count_distinct "
    "(HLL) — the 100 TB form of g5/g7's exact variants; rows-only check "
    "(sketches are engine-specific by design).",
)
def g5b_approx_quantiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias("approx_pcts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
    )


@register(
    "stream_g1_windowed",
    sql="""
    SELECT epoch_us(date_trunc('minute', ts)) AS minute_us, event_type AS metric,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1, 2
    """,
    doc="§2.12 streaming G1: the same windowed counters executed as a "
    "Structured Streaming job (file source, availableNow trigger, complete "
    "mode) — output provably equals the batch aggregation, which is the "
    "exactly-once story in one query.",
)
def stream_g1_windowed(spark, sf_dir):
    import uuid

    from ..streaming.pipeline import windowed_counters_stream

    ev = _t(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="stream_g1_")
    ev.write.mode("overwrite").parquet(f"{d}/src")
    stream = spark.readStream.schema(ev.schema).parquet(f"{d}/src")
    agg = windowed_counters_stream(
        stream.withColumn("value", F.col("value").cast("decimal(18,3)")), watermark="10 minutes"
    )
    name = f"sg1_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.table(name)
    return out.select(
        F.unix_micros("minute").alias("minute_us"),
        "metric",
        "n",
        F.col("value_sum").cast("double").alias("value_sum"),
    )


@register(
    "stream_g13_sliding",
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
    SELECT epoch_us(w_start) AS w_start_us, event_type AS metric,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS value_sum
    FROM assigned
    GROUP BY 1, 2
    """,
    doc="§2.12 streaming G13: hopping windows (2-minute windows every minute) "
    "as a Structured Streaming job (file source, availableNow, complete "
    "mode) — each event lands in exactly two open windows and the output "
    "provably equals the batch sliding aggregation; watermark eviction "
    "bounds state at |open windows x metrics|.",
)
def stream_g13_sliding(spark, sf_dir):
    import uuid

    from ..streaming.pipeline import windowed_counters_stream

    ev = _t(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="stream_g13_")
    ev.write.mode("overwrite").parquet(f"{d}/src")
    stream = spark.readStream.schema(ev.schema).parquet(f"{d}/src")
    agg = windowed_counters_stream(
        stream.withColumn("value", F.col("value").cast("decimal(18,3)")),
        watermark="10 minutes",
        window="2 minutes",
        slide="1 minute",
    )
    name = f"sg13_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.table(name)
    return out.select(
        F.unix_micros("minute").alias("w_start_us"),
        "metric",
        "n",
        F.col("value_sum").cast("double").alias("value_sum"),
    )


@register(
    "u1b_store_merge_twice",
    sql=None,  # filesystem side effects: rows-only
    doc="U1 on disk: ParquetStateStore double-merge — batch 1 inserts, "
    "batch 2 re-sends half with the same idempotencyKey (no-ops) and half "
    "with new keys (version 2); returns the final state's (version, action) "
    "census.  The VALIDATION.md:198-215 idempotency demo as a query.",
)
def u1b_store_merge_twice(spark, sf_dir):
    from ..operators.persist import ParquetStateStore

    d = tempfile.mkdtemp(prefix="u1b_store_")
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 2000)

    def to_batch(df, key_col):
        return df.select(
            F.concat(F.lit("t"), (F.col("user_id") % 10).cast("string")).alias("tenantId"),
            F.lit("observation").alias("entityType"),
            F.concat(F.lit("p"), F.col("user_id").cast("string"), F.lit(":"), F.col("event_type")).alias(
                "entityId"
            ),
            F.concat(F.lit("p"), F.col("user_id").cast("string")).alias("patientId"),
            F.col("ts").alias("effectiveDateTime"),
            F.col("value"),
            key_col.alias("idempotencyKey"),
        )

    store = ParquetStateStore(spark, f"{d}/state")
    b1 = to_batch(ev, F.concat(F.lit("k"), F.col("event_id").cast("string")))
    store.merge(b1, updated_at=dt.datetime(2025, 1, 1))
    # resend: even users same key (no-op), odd users new key (update)
    b2 = to_batch(
        ev,
        F.when(
            F.col("user_id") % 2 == 0, F.concat(F.lit("k"), F.col("event_id").cast("string"))
        ).otherwise(F.concat(F.lit("k2-"), F.col("event_id").cast("string"))),
    )
    log2 = store.merge(b2, updated_at=dt.datetime(2025, 1, 2))
    return log2.groupBy("action", "version").count().orderBy("action", "version")


@register(
    "s8_s9_audit_roundtrip",
    sql=None,  # filesystem side effects: rows-only
    doc="S8+S9: partitioned JSONL audit append then tenant/date-pruned "
    "listing — returns per-(tenant, date, hour) line counts read back "
    "through Hive partition discovery.",
)
def s8_s9_audit_roundtrip(spark, sf_dir):
    from ..sources.audit import append_audit, list_audit

    d = tempfile.mkdtemp(prefix="s8_audit_")
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    lines = ev.select(
        F.col("ts").alias("at"),
        F.lit("etl.persisted.v1").alias("type"),
        F.concat(F.lit("t"), (F.col("user_id") % 3).cast("string")).alias("tenantId"),
        F.col("event_id").cast("string").alias("traceId"),
        F.col("props").alias("payload"),
    )
    append_audit(lines, f"{d}/audit")
    listed = list_audit(spark, f"{d}/audit", "t1", limit=500)
    return listed.groupBy("tenantId", "date", "hour").count().orderBy("date", "hour")


@register(
    "map_json_functions",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS j_k,
           json_structure(props) IS NOT NULL AS j_parseable,
           map_extract(MAP(['id','type'],
                           [CAST(event_id AS VARCHAR), event_type]), 'type')[1] AS m_type,
           cardinality(MAP(['id','type'],
                           [CAST(event_id AS VARCHAR), event_type])) AS m_size,
           array_to_string(map_keys(MAP(['id','type'],
                           [CAST(event_id AS VARCHAR), event_type])), ',') AS m_keys
    FROM events WHERE event_id < 300
    """,
    doc="§2.11 map + JSON-struct surface: from_json typed extraction "
    "(normalize/handler.ts:81 JSON.parse analog), map_from_entries/"
    "element_at/size/map_keys (the attributes open-map of "
    "etl.normalized.v1.json:33-37).",
)
def map_json_functions(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 300)
    m = F.map_from_entries(
        F.array(
            F.struct(F.lit("id").alias("k"), F.col("event_id").cast("string").alias("v")),
            F.struct(F.lit("type").alias("k"), F.col("event_type").alias("v")),
        )
    )
    parsed = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        parsed["k"].alias("j_k"),
        parsed.isNotNull().alias("j_parseable"),
        F.element_at(m, "type").alias("m_type"),
        F.size(m).cast("bigint").alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
    )


@register(
    "g10_pivot",
    sql="""
    SELECT user_id % 10 AS tenant_bucket,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS error
    FROM events GROUP BY 1
    """,
    doc="Pivot: per-tenant event-type matrix (the alarms dashboard rows of "
    "alarms-stack.ts:94-157 as columns).  DataFrame pivot with an explicit "
    "value list — no extra distinct-scan job, and the pivot compiles to the "
    "same single-shuffle conditional aggregation as the oracle's CASE sums.",
)
def g10_pivot(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy((F.col("user_id") % 10).alias("tenant_bucket"))
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=["click", "view", "purchase", "error"])
    )


@register(
    "g10b_unpivot",
    sql="""
    SELECT l_orderkey, 'qty' AS measure, CAST(l_quantity AS DOUBLE) AS val
    FROM lineitem WHERE l_orderkey < 200
    UNION ALL
    SELECT l_orderkey, 'price', l_extendedprice FROM lineitem WHERE l_orderkey < 200
    UNION ALL
    SELECT l_orderkey, 'discount', l_discount FROM lineitem WHERE l_orderkey < 200
    """,
    doc="Unpivot (melt): wide measures -> (key, measure, value) rows via "
    "DataFrame unpivot — an in-task Expand, one scan, no shuffle (the oracle "
    "expresses the same reshape as UNION ALL).",
)
def g10b_unpivot(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("double").alias("qty"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
    ).unpivot("l_orderkey", ["qty", "price", "discount"], "measure", "val")


@register(
    "sq_subqueries",
    sql="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
      AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
    doc="SQL subquery surface: correlated EXISTS (-> left semi join), "
    "uncorrelated IN (-> semi join), scalar subquery (-> broadcast one-row "
    "agg) — Catalyst decorrelates all three into joins; exercised through "
    "spark.sql to cover the SQL entry point alongside the DataFrame API.",
)
def sq_subqueries(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("sq_lineitem")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("sq_customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM sq_orders o
        WHERE EXISTS (SELECT 1 FROM sq_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
          AND o_custkey IN (SELECT c_custkey FROM sq_customer WHERE c_mktsegment = 'BUILDING')
          AND o_totalprice > (SELECT avg(o_totalprice) FROM sq_orders)
        """
    )


@register(
    "g12_salted_skew_agg",
    sql="""
    SELECT CASE WHEN user_id < 5 THEN 'hot' ELSE 'u' || CAST(user_id AS VARCHAR) END AS k,
           CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS value_sum,
           count(*) AS n
    FROM events GROUP BY 1
    """,
    doc="Skew-safe aggregation: a deliberately hot key ('hot' absorbs users "
    "0-4) aggregated through the salted two-level path "
    "(operators/skew.salted_sum_count) — partial agg per (key, salt-of-"
    "event_id) bounds the largest reduce task at 1/32 of the hot key; the "
    "oracle computes the same totals with a plain GROUP BY, proving the "
    "salting is semantics-free.",
)
def g12_salted_skew_agg(spark, sf_dir):
    from ..operators.skew import salted_sum_count

    ev = _t(spark, sf_dir, "events")
    keyed = ev.select(
        F.when(F.col("user_id") < 5, "hot")
        .otherwise(F.concat(F.lit("u"), F.col("user_id").cast("string")))
        .alias("k"),
        F.col("value").cast("decimal(18,3)").alias("v"),
        "event_id",
    )
    out = salted_sum_count(keyed, ["k"], F.col("v"), F.col("event_id"), buckets=32)
    return out.select("k", F.col("value_sum").cast("double").alias("value_sum"), "n")


# ===========================================================================
# TPC-H join/agg shapes beyond Q1 — classic analytics plans the optimizer
# must get right at scale (broadcast dims, pushdown, partial agg, top-k)
# ===========================================================================


@register(
    "g7b_tpch_q6",
    sql="""
    SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
             / 10000.0 AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan+filter+aggregate — the pushdown "
    "showcase: every predicate reaches the parquet scan (shipdate range, "
    "discount band, quantity), zero joins, one partial-aggregated exchange "
    "of a single row.  Revenue in exact int64 cents*cents, one final IEEE "
    "division.",
)
def g7b_tpch_q6(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cents = lambda c: (F.col(c).cast("decimal(18,2)") * 100).cast("long")  # noqa: E731
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents("l_extendedprice") * cents("l_discount")).cast("double") / 10000.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "g7c_tpch_q3",
    sql="""
    SELECT l_orderkey,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS DOUBLE)
             / 10000.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): selective dim filter -> "
    "broadcast customer into orders -> join lineitem -> grouped revenue -> "
    "top-10 via TakeOrderedAndProject (no global sort).  Total tiebreak "
    "(revenue desc, orderkey) keeps the LIMIT deterministic across engines.",
)
def g7c_tpch_q3(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-03-15 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00")
    )
    cents = lambda c: (F.col(c).cast("decimal(18,2)") * 100).cast("long")  # noqa: E731
    joined = li.join(
        F.broadcast(orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])),
        li["l_orderkey"] == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (
                F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))).cast("double")
                / 10000.0
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "g7d_tpch_q5",
    sql="""
    SELECT n_name,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS DOUBLE)
             / 10000.0 AS revenue,
           count(*) AS n_lines
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): 6-way join where every "
    "dimension (customer, supplier, nation, region) broadcasts and only the "
    "orders-lineitem fact join shuffles; the c_nationkey = s_nationkey "
    "equality rides the supplier broadcast.  Exact cents arithmetic.",
)
def g7d_tpch_q5(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cents = lambda c: (F.col(c).cast("decimal(18,2)") * 100).cast("long")  # noqa: E731
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"]) & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
    )
    return joined.groupBy("n_name").agg(
        (
            F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))).cast("double")
            / 10000.0
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "stream_dedup",
    sql="SELECT DISTINCT user_id, event_type FROM events",
    doc="§2.12 streaming exact dedup: dropDuplicatesWithinWatermark over the "
    "events stream (file source, availableNow) with the horizon wider than "
    "the data, so the surviving key set provably equals batch DISTINCT.  "
    "Only key columns are emitted — which physical row survives is arrival-"
    "order dependent, the key set is not.  In production the horizon bounds "
    "state to arrival-rate x watermark (SCALE.md §5).",
)
def stream_dedup(spark, sf_dir):
    import uuid

    from ..streaming.pipeline import dedup_stream

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    d = tempfile.mkdtemp(prefix="stream_dedup_")
    ev.write.mode("overwrite").parquet(f"{d}/src")
    stream = spark.readStream.schema(ev.schema).parquet(f"{d}/src")
    out = dedup_stream(stream, ["user_id", "event_type"], ts_col="ts", watermark="36500 days")
    name = f"sdd_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).select("user_id", "event_type")


@register(
    "stream_stream_join",
    sql="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id AS user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
    FROM events c JOIN events p ON c.user_id = p.user_id
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    doc="§2.12 stream-stream interval join: click->purchase attribution "
    "(same user, purchase within 30 min of the click) executed as a "
    "watermarked Structured Streaming join (file sources, availableNow, "
    "append) — the event-time bound is what lets Spark evict join state, "
    "and the bounded-input output provably equals the batch self-join "
    "(streaming/pipeline.py:interval_join_streams).",
)
def stream_stream_join(spark, sf_dir):
    import uuid

    from ..streaming.pipeline import interval_join_streams

    ev = _t(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="stream_ssj_")
    ev.write.mode("overwrite").parquet(f"{d}/src")

    def side(etype, id_alias, ts_alias):
        return (
            spark.readStream.schema(ev.schema)
            .parquet(f"{d}/src")
            .where(F.col("event_type") == etype)
            .select(F.col("event_id").alias(id_alias), "user_id", F.col("ts").alias(ts_alias))
        )

    clicks = side("click", "click_id", "c_ts")
    purchases = side("purchase", "purchase_id", "p_ts")
    joined = interval_join_streams(
        clicks, purchases, "user_id", "c_ts", "p_ts",
        horizon="30 minutes", watermark="36500 days",
    )
    out = joined.select(
        "click_id", "purchase_id", clicks["user_id"].alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("delta_us"),
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


@register(
    "stream_sessionize",
    sql="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1
                  ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    agg AS (
      SELECT user_id, sid,
             min(ts) AS session_start, max(ts) AS last_ts,
             count(*) AS n_events
      FROM sess GROUP BY 1, 2
    ),
    open_s AS (SELECT user_id, max(sid) AS m FROM agg GROUP BY 1)
    SELECT a.user_id,
           epoch_us(a.session_start) AS session_start_us,
           epoch_us(a.last_ts + INTERVAL 30 MINUTE) AS session_end_us,
           CAST(a.n_events AS BIGINT) AS n_events
    FROM agg a JOIN open_s o ON a.user_id = o.user_id
    WHERE a.sid < o.m
    """,
    doc="§2.12 custom stateful streaming sessionization "
    "(applyInPandasWithState, the sanctioned stateful-Python slot): per-user "
    "30-min-gap sessions over the events stream.  Source written as ONE "
    "file so availableNow is a single deterministic batch: the emitted set "
    "is then provably every CLOSED session (each user's trailing open "
    "session stays in state), which the oracle reproduces as gaps-and-"
    "islands minus each user's last island.  State is O(active users) at "
    "any stream volume (streaming/pipeline.sessionize_stream).",
)
def stream_sessionize(spark, sf_dir):
    import uuid

    from ..streaming.pipeline import sessionize_stream

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    d = tempfile.mkdtemp(prefix="stream_sess_")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{d}/src")
    stream = spark.readStream.schema(ev.schema).parquet(f"{d}/src")
    out = sessionize_stream(stream, gap_minutes=30)
    name = f"sse_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
    )


@register(
    "u7_cdc_apply",
    sql="""
    WITH base AS (
      SELECT c_custkey AS k, c_name AS name,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal
      FROM customer
    ),
    changes AS (
      SELECT k, 1 AS seq, 'U' AS op, name, k AS bal
      FROM base WHERE k % 10 BETWEEN 1 AND 3
      UNION ALL
      SELECT k, 2, 'U', name, k * 2 FROM base WHERE k % 10 BETWEEN 1 AND 2
      UNION ALL
      SELECT k, 1, 'D', '', 0 FROM base WHERE k % 10 = 0
      UNION ALL
      SELECT k + 1000000, 1, 'I', 'Customer#new' || CAST(k AS VARCHAR), k * 3
      FROM base WHERE k % 10 = 4
    ),
    -- latest-wins is the same lexicographic max the engine computes over
    -- (seq, op, name, bal) structs, expressed via row_number: DuckDB's
    -- planner explodes (OOM at sf1.0, found by the round-6 sweep) when a
    -- FULL JOIN's post-filter reads a struct FIELD of the nullable side
    -- (max(struct_pack(...)).op), so the twin avoids structs entirely.
    latest AS (
      SELECT k, op, name, bal FROM (
        SELECT k, op, name, bal,
               row_number() OVER (
                 PARTITION BY k
                 ORDER BY seq DESC, op DESC, name DESC, bal DESC) AS rn
        FROM changes) WHERE rn = 1
    )
    SELECT coalesce(b.k, l.k) AS c_custkey,
           CASE WHEN l.k IS NULL THEN b.name ELSE l.name END AS name,
           CASE WHEN l.k IS NULL THEN b.bal ELSE l.bal END AS bal_cents
    FROM base b FULL JOIN latest l ON b.k = l.k
    WHERE l.k IS NULL OR l.op <> 'D'
    """,
    doc="U7 CDC change-stream apply — MERGE WHEN MATCHED UPDATE/DELETE, "
    "WHEN NOT MATCHED INSERT, as pure DataFrame ops: latest op per key is "
    "an exact MAX over (seq, op, payload) structs (one partial-aggregable "
    "groupBy of the change batch), the apply ONE key-grained full-outer "
    "join.  Seeded ops exercise every path: double-update latest-wins, "
    "deletes, inserts, untouched passthrough "
    "(operators/persist.apply_cdc).",
)
def u7_cdc_apply(spark, sf_dir):
    from ..operators.persist import apply_cdc

    cust = _t(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("bal"),
    )
    k, m = F.col("k"), F.col("k") % 10
    changes = (
        base.where(m.between(1, 3)).select(
            k, F.lit(1).alias("seq"), F.lit("U").alias("op"), "name", k.alias("bal")
        )
        .unionAll(
            base.where(m.between(1, 2)).select(
                k, F.lit(2).alias("seq"), F.lit("U").alias("op"), "name",
                (k * 2).alias("bal"),
            )
        )
        .unionAll(
            base.where(m == 0).select(
                k, F.lit(1).alias("seq"), F.lit("D").alias("op"),
                F.lit("").alias("name"), F.lit(0).cast("long").alias("bal"),
            )
        )
        .unionAll(
            base.where(m == 4).select(
                (k + 1000000).alias("k"), F.lit(1).alias("seq"), F.lit("I").alias("op"),
                F.concat(F.lit("Customer#new"), k.cast("string")).alias("name"),
                (k * 3).alias("bal"),
            )
        )
    )
    return apply_cdc(base, changes, "k", "seq", "op", ["name", "bal"]).select(
        F.col("k").alias("c_custkey"), "name", F.col("bal").alias("bal_cents")
    )
