"""Registry batch: additional TPC-H query shapes (§2.4/§2.5 breadth) over the
driver's TPC-H-ish tables — each one exercises a distinct physical-plan
pattern the engine must get right at 100 TB:

* Q4  — EXISTS decorrelated to a left-semi join (never a row-per-match blowup);
* Q10 — multi-join grouped top-k with the dims broadcast;
* Q14 — conditional aggregation over a broadcast part join (exact int cents);
* Q18 — having-filtered self-aggregation feeding an IN-semi-join;
* Q19 — OR-of-ANDs disjunctive predicate across both join sides.

The driver tables lack l_shipmode/l_commitdate/l_receiptdate/partsupp, so Q4's
EXISTS predicate and Q19's bands are adapted to the available columns; the
plan shapes (which is what these queries pin down) are unchanged.

Determinism conventions per plans/registry.py: money as exact int64 cents with
one final IEEE division, total tiebreak on every LIMIT, integer ppm ratios.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..datasets import load_table
from .registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _cents(c):
    return (F.col(c).cast("decimal(18,2)") * 100).cast("long")


_REV_SQL = """CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))"""


def _rev_col():
    return _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))


@register(
    "g7e_tpch_q4",
    sql="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking): correlated EXISTS "
    "decorrelated to a LEFT SEMI join on l_orderkey with the residual "
    "l_shipdate > o_orderdate condition — one row per qualifying order "
    "regardless of how many lineitems match, then a tiny 5-group aggregate. "
    "The driver schema lacks l_commitdate/l_receiptdate, so the EXISTS "
    "predicate is 'shipped after the order date' — same semi-join plan.",
)
def g7e_tpch_q4(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > orders["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "g7f_tpch_q14",
    sql=f"""
    SELECT
      CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
        / 10000.0 AS promo_revenue,
      CAST(sum({_REV_SQL}) AS DOUBLE) / 10000.0 AS total_revenue,
      CAST((1000000 * sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END))
        // sum({_REV_SQL}) AS BIGINT) AS promo_ppm
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape (promotion effect): month-sliced lineitem scan "
    "(shipdate range pushed to parquet), part broadcast, conditional sum — "
    "promo share as exact integer ppm over int64-cents revenue.  The ppm "
    "numerator (1e6 x a month of cent-percent revenue) exceeds int64 at "
    "sf1.0 (caught by the round-6 full-registry sf1.0 sweep), so the "
    "cross-multiplication runs in DECIMAL(38,0)/HUGEINT — the same idiom "
    "as the round-4 lift/pinball overflow fixes (SCALE.md §37).",
)
def g7f_tpch_q14(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00"))
    )
    part = _t(spark, sf_dir, "part")
    rev = _rev_col()
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("long"))
    agg = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).agg(
        F.sum(promo_rev).alias("_pr"), F.sum(rev).alias("_tr")
    )
    return agg.select(
        (F.col("_pr").cast("double") / 10000.0).alias("promo_revenue"),
        (F.col("_tr").cast("double") / 10000.0).alias("total_revenue"),
        F.expr(
            "CAST((1000000 * CAST(_pr AS DECIMAL(38,0)))"
            " div CAST(_tr AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("promo_ppm"),
    )


@register(
    "g7g_tpch_q18",
    sql="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) > 300
    )
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q18 shape (large-volume customers): HAVING-filtered "
    "self-aggregation of lineitem produces a small key set, re-joined as a "
    "LEFT SEMI (IN) against the same fact, dims broadcast, top-10 via "
    "TakeOrderedAndProject with a total tiebreak.  Quantities summed as "
    "exact BIGINT (they are integral doubles in the data).",
)
def g7g_tpch_q18(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .where(F.col("q") > 300)
        .select("l_orderkey")
    )
    fact = li.join(F.broadcast(big), "l_orderkey", "left_semi")
    joined = fact.join(
        F.broadcast(orders), fact["l_orderkey"] == orders["o_orderkey"]
    ).join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
    return (
        joined.groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "g7h_tpch_q19",
    sql=f"""
    SELECT CAST(sum({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicate): "
    "OR-of-ANDs mixing columns from both join sides.  The per-side "
    "implications (p_brand IN (...), p_size <= 35, l_quantity BETWEEN 1 AND "
    "30) are CNF-extractable and push below the join; the full disjunction "
    "evaluates as the join residual.  Part side broadcast.",
)
def g7h_tpch_q19(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    band = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(band).agg(
        (F.sum(_rev_col()).cast("double") / 10000.0).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "g7i_tpch_q10",
    sql=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(sum({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): quarter-sliced orders, "
    "returnflag filter pushed to the lineitem scan, customer and nation "
    "broadcast, grouped revenue, top-20 via TakeOrderedAndProject with a "
    "total tiebreak.",
)
def g7i_tpch_q10(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00"))
    )
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(orders), li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(_rev_col()).cast("double") / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )
