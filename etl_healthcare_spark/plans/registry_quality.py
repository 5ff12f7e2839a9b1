"""Round-4 quality/maintenance batch: snapshot diff, incremental join-MV
maintenance, a Deequ/dbt-style expectations report, log-free per-document
keyword extraction, and a hostile-content JSONL round trip.

All queries follow the registry's cross-engine determinism conventions
(integer/ppm arithmetic, sha256-only hashing, total tiebreaks — see
plans/registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .registry import _t, register

PPM = 1_000_000

# ---------------------------------------------------------------------------
# U8: snapshot diff
# ---------------------------------------------------------------------------


@register(
    "u8_snapshot_diff",
    sql="""
    WITH a AS (
      SELECT event_id AS k, CAST(floor(value * 100) AS BIGINT) AS v
      FROM events WHERE event_id % 17 <> 0
    ),
    b AS (
      SELECT event_id AS k,
             CAST(floor(value * 100) AS BIGINT)
               + CASE WHEN event_id % 23 = 0 THEN 100 ELSE 0 END AS v
      FROM events WHERE event_id % 19 <> 0
    ),
    j AS (
      SELECT coalesce(a.k, b.k) AS k,
             CASE WHEN a.k IS NULL THEN 'added'
                  WHEN b.k IS NULL THEN 'removed'
                  WHEN a.v <> b.v THEN 'changed'
                  ELSE 'unchanged' END AS change
      FROM a FULL OUTER JOIN b ON a.k = b.k
    )
    SELECT change, count(*) AS n, min(k) AS key_min, max(k) AS key_max
    FROM j GROUP BY change
    """,
    doc="U8 SNAPSHOT DIFF (operators/maintenance.snapshot_diff): two event "
    "snapshots (divergent row sets + revised values) classified "
    "added/removed/changed/unchanged off ONE full-outer key join — the "
    "audit/CDC-validation/backfill-scoping primitive.  Classification and "
    "the per-class rollup are map-side on top of the join; output is "
    "O(#classes).  Values compared in exact floor-cents int64.",
)
def u8_snapshot_diff(spark, sf_dir):
    from ..operators.maintenance import snapshot_diff

    ev = _t(spark, sf_dir, "events")
    vc = F.expr("CAST(floor(value * 100) AS BIGINT)")
    a = ev.where(F.col("event_id") % 17 != 0).select("event_id", vc.alias("v"))
    b = ev.where(F.col("event_id") % 19 != 0).select(
        "event_id",
        (vc + F.when(F.col("event_id") % 23 == 0, F.lit(100)).otherwise(F.lit(0))).alias("v"),
    )
    return snapshot_diff(a, b, "event_id", "v")


# ---------------------------------------------------------------------------
# U9: incremental join-MV maintenance
# ---------------------------------------------------------------------------


@register(
    "u9_incremental_join_mv",
    sql="""
    SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment AS segment,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="U9 incremental JOIN-MV maintenance (operators/maintenance."
    "incremental_join_mv): a stored orders-customer MV holds STALE prices "
    "for the 1-in-101 delta keys; maintenance evicts those keys with a "
    "BROADCAST anti-join and unions the re-enriched delta (delta side "
    "broadcast into the dimension join) — history never reshuffles to "
    "apply a 1% delta, the join twin of u5_incremental_agg's algebraic "
    "partial merge.  The oracle RECOMPUTES the join from scratch with true "
    "prices: hash equality is the maintenance-correctness proof.",
)
def u9_incremental_join_mv(spark, sf_dir):
    from ..operators.maintenance import incremental_join_mv

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    is_delta = F.col("o_orderkey") % 101 == 0
    stale = orders.select(
        "o_orderkey",
        "o_custkey",
        (cents - F.when(is_delta, F.lit(50)).otherwise(F.lit(0))).alias("price_cents"),
    )
    mv_base = stale.join(cust, stale["o_custkey"] == cust["c_custkey"]).select(
        "o_orderkey", "c_custkey", F.col("c_mktsegment").alias("segment"), "price_cents"
    )
    delta = orders.where(is_delta).select(
        "o_orderkey", "o_custkey", cents.alias("price_cents")
    )
    dim = cust.select("c_custkey", F.col("c_mktsegment").alias("segment"))
    return incremental_join_mv(
        mv_base.select("o_orderkey", "c_custkey", "segment", "price_cents"),
        delta,
        dim,
        "o_orderkey",
        "o_custkey",
        "c_custkey",
    )


# ---------------------------------------------------------------------------
# expectations: the dbt-tests / Deequ constraint suite as one report
# ---------------------------------------------------------------------------


@register(
    "profile_expectations",
    sql="""
    WITH checks AS (
      SELECT 'orders_pk_unique' AS check_name,
             (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS metric
      UNION ALL
      SELECT 'customer_name_not_null',
             (SELECT count(*) FROM customer WHERE c_name IS NULL)
      UNION ALL
      SELECT 'orders_status_in_o_f',
             (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O','F'))
      UNION ALL
      SELECT 'lineitem_qty_1_to_50',
             (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
      UNION ALL
      SELECT 'lineitem_fk_orders',
             (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    )
    SELECT check_name, CAST(metric AS BIGINT) AS metric,
           CASE WHEN metric = 0 THEN 'pass' ELSE 'fail' END AS status
    FROM checks ORDER BY check_name
    """,
    doc="EXPECTATIONS REPORT — the dbt-tests / AWS-Deequ constraint suite "
    "(unique key, not-null, accepted values, range, relationship) evaluated "
    "as ONE engine query: each table scanned once with conditional "
    "aggregates (three orders checks share a scan), the referential check "
    "is a left-anti count, and the five 1-row frames union into the "
    "(check, metric, pass/fail) report.  Includes a deliberately failing "
    "check (status domain {O,F} while the data carries P) so the fail path "
    "is exercised, not just asserted.",
)
def profile_expectations(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    o_checks = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("orders_pk_unique"),
        F.sum((~F.col("o_orderstatus").isin("O", "F")).cast("long")).alias("orders_status_in_o_f"),
    )
    c_checks = cust.agg(F.sum(F.col("c_name").isNull().cast("long")).alias("customer_name_not_null"))
    l_checks = li.agg(
        F.sum(((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("long")).alias("lineitem_qty_1_to_50")
    )
    fk = (
        li.join(orders.select("o_orderkey"), li["l_orderkey"] == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("lineitem_fk_orders"))
    )
    wide = o_checks.crossJoin(c_checks).crossJoin(l_checks).crossJoin(fk)
    names = [
        "customer_name_not_null",
        "lineitem_fk_orders",
        "lineitem_qty_1_to_50",
        "orders_pk_unique",
        "orders_status_in_o_f",
    ]
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return (
        wide.select(F.expr(f"stack({len(names)}, {stack}) AS (check_name, metric)"))
        .select(
            "check_name",
            F.col("metric").cast("long").alias("metric"),
            F.when(F.col("metric") == 0, F.lit("pass")).otherwise(F.lit("fail")).alias("status"),
        )
        .orderBy("check_name")
    )


# ---------------------------------------------------------------------------
# text: per-document keyword extraction (log-free tf-idf surrogate)
# ---------------------------------------------------------------------------


@register(
    "text_doc_keywords",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents
    ),
    tf AS (
      SELECT doc_id, t, count(*) AS tf FROM tok WHERE length(t) >= 3
      GROUP BY doc_id, t
    ),
    dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
    nd AS (SELECT count(*) AS nd FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.t AS term, tf.tf,
             CAST((tf.tf * nd.nd * {PPM}) // dfreq.df AS BIGINT) AS score_ppm
      FROM tf JOIN dfreq ON tf.t = dfreq.t CROSS JOIN nd
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_ppm DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term, tf, score_ppm FROM ranked WHERE rn <= 3
    """,
    doc="Per-document KEYWORD extraction: top-3 terms by the log-free "
    "tf-idf surrogate score_ppm = tf * N * 1e6 div df — same ranking as "
    "tf * (N/df) but exact int64, so every rank position is "
    "engine-reproducible (log-based idf would hash-drift in the last ulp).  "
    "Shape: explode -> partial-aggregated (doc,term) tf -> vocabulary-sized "
    "df aggregate joined back on the term (shuffle-hash: both sides "
    "aggregation-descended) -> per-doc WindowGroupLimit rank<=3 with a "
    "total (score desc, term asc) tiebreak.  The keyword sidecar a search/"
    "RAG corpus ships with each document.",
)
def text_doc_keywords(spark, sf_dir):
    from ..functions.text import tokens as _tokens

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("t")).where(
        F.length("t") >= 3
    )
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    scored = (
        tf.join(dfreq, "t")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            F.col("t").alias("term"),
            "tf",
            F.expr(f"(tf * nd * {PPM}) div df").alias("score_ppm"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score_ppm").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "score_ppm")
    )


# ---------------------------------------------------------------------------
# IO: hostile-content JSONL round trip (nested struct + escapes)
# ---------------------------------------------------------------------------


@register(
    "io_jsonl_roundtrip",
    sql="""
    SELECT doc_id,
           text || chr(34) || chr(92) || chr(10) || chr(9)
                || coalesce(lang, '') AS hostile,
           lang AS m_lang, n_chars AS m_chars,
           length(text) AS t_len
    FROM documents WHERE doc_id < 2000
    """,
    doc="JSONL ROUND TRIP under hostile content: every document gets a "
    "double quote, a backslash, a newline, and a tab appended — the four "
    "characters JSON must escape — plus a NESTED struct column, written "
    "through Spark's JSON-lines writer and read back with an explicit "
    "schema.  The oracle computes the same strings and struct fields "
    "directly (no file IO): a lossless round trip hash-matches, any "
    "escaping or nested-field bug cannot.  Completes the format-fidelity "
    "triangle with io_csv_roundtrip (text/quoting) and io_orc_roundtrip "
    "(columnar).",
)
def io_jsonl_roundtrip(spark, sf_dir):
    import tempfile as _tf

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 2000)
    hostile = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit('"\\\n\t'), F.coalesce(F.col("lang"), F.lit(""))
        ).alias("hostile"),
        F.struct(F.col("lang"), F.col("n_chars")).alias("meta"),
        F.length("text").cast("long").alias("t_len"),
    )
    d = _tf.mkdtemp(prefix="jsonl_rt_")
    hostile.write.mode("overwrite").json(f"{d}/docs_jsonl")
    back = spark.read.schema(
        "doc_id long, hostile string, meta struct<lang:string,n_chars:long>, t_len long"
    ).json(f"{d}/docs_jsonl")
    return back.select(
        "doc_id",
        "hostile",
        F.col("meta.lang").alias("m_lang"),
        F.col("meta.n_chars").alias("m_chars"),
        "t_len",
    )
