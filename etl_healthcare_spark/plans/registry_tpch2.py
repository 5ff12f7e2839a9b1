"""Registry batch: the remaining TPC-H query shapes (Q2, Q7, Q8, Q9, Q11,
Q12, Q13, Q15, Q16, Q17, Q20, Q21, Q22) — with registry.py's Q1 and
registry_misc/registry_tpch's Q3/Q4/Q5/Q6/Q10/Q14/Q18/Q19 this completes all
22 canonical plan shapes over the driver's tables.

Schema adaptations (the driver tables lack partsupp, l_commitdate,
l_receiptdate, l_shipmode, c_phone, o_comment — each stand-in preserves the
canonical PLAN SHAPE, which is what these queries pin down):

* partsupp            -> DISTINCT (l_partkey, l_suppkey) from lineitem
                         (who supplies what, derived from shipments);
* ps_supplycost       -> s_acctbal (Q2's correlated-min metric) /
                         p_retailprice (Q9's cost term);
* lateness            -> l_shipdate vs o_orderdate + INTERVAL (Q12/Q21);
* l_shipmode          -> l_linestatus (Q12's band column);
* c_phone country code-> c_custkey % 7 (Q22);
* o_comment filter    -> o_orderpriority <> '1-URGENT' (Q13).

Determinism conventions per plans/registry.py: money in exact int64 cents
(cent-percent for discounted revenue) with ONE final IEEE division, integer
ppm for shares, total tiebreak on every LIMIT, threshold comparisons done in
integer cross-multiplied form (never float-vs-float).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..datasets import load_table
from .registry import register
from .registry_tpch import _REV_SQL, _cents, _rev_col


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


_PS_SQL = "(SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem)"


def _ps(spark, sf_dir):
    """The partsupp stand-in: who supplies which part, from shipments."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated scalar MIN decorrelated to agg+join)
# ---------------------------------------------------------------------------


@register(
    "g7j_tpch_q2",
    sql=f"""
    WITH ps AS {_PS_SQL},
    cand AS (
      SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
             CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
      FROM part
      JOIN ps ON ps_partkey = p_partkey
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_size = 15 AND p_type = 'LARGE' AND n_regionkey = 2
    ),
    best AS (SELECT p_partkey AS bk, min(bal_cents) AS min_bal FROM cand GROUP BY 1)
    SELECT p_partkey, p_name, s_suppkey, s_name, n_name, bal_cents
    FROM cand JOIN best ON bk = p_partkey AND bal_cents = min_bal
    ORDER BY bal_cents DESC, p_partkey, s_suppkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (minimum-cost supplier): the correlated scalar MIN "
    "subquery decorrelated into a per-part aggregate joined back against the "
    "candidate set — partsupp derived as DISTINCT shipment pairs, supply "
    "cost stood in by s_acctbal (exact cents).  Region-filtered via the "
    "(broadcast) nation dim; top-100 with a total tiebreak.",
)
def g7j_tpch_q2(spark, sf_dir):
    part = _t(spark, sf_dir, "part").where((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2)
    cand = (
        _ps(spark, sf_dir)
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            _cents("s_acctbal").alias("bal_cents"),
        )
    )
    best = cand.groupBy(F.col("p_partkey").alias("bk")).agg(F.min("bal_cents").alias("min_bal"))
    return (
        cand.join(
            F.broadcast(best),
            (F.col("bk") == F.col("p_partkey")) & (F.col("bal_cents") == F.col("min_bal")),
        )
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "n_name", "bal_cents")
        .orderBy(F.col("bal_cents").desc(), "p_partkey", "s_suppkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (dual-direction pair filter)
# ---------------------------------------------------------------------------


@register(
    "g7k_tpch_q7",
    sql=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(CAST(sum({_REV_SQL}) AS DOUBLE) / 10000.0 AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape (volume shipping): the fact joins BOTH dimension "
    "chains (supplier->nation, orders->customer->nation) with a symmetric "
    "two-nation pair disjunction, sliced by ship year — nations broadcast "
    "twice under different aliases; revenue as exact cent-percent summed "
    "then one division.",
)
def g7k_tpch_q7(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("n1k"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("n2k"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1k"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2k"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(_rev_col()).cast("double") / 10000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share (conditional share of grouped revenue)
# ---------------------------------------------------------------------------


@register(
    "g7l_tpch_q8",
    sql=f"""
    SELECT year(o_orderdate) AS o_year,
           CAST((1000000 * sum(CASE WHEN n1.n_name = 'NATION_6' THEN {_REV_SQL} ELSE 0 END))
                // sum({_REV_SQL}) AS BIGINT) AS mkt_share_ppm
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n2.n_regionkey = 1 AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1 ORDER BY 1
    """,
    doc="TPC-H Q8 shape (national market share): six-table star with the "
    "market region filtered on the customer's nation chain and the share "
    "nation read off the supplier's — share emitted as exact integer ppm of "
    "cent-percent revenue (conditional-sum over total, single integer "
    "division; no float ratio drift).",
)
def g7l_tpch_q8(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00"))
    )
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("n1k"), F.col("n_name").alias("supp_nation"))
    n2 = nat.where(F.col("n_regionkey") == 1).select(F.col("n_nationkey").alias("n2k"))
    rev = _rev_col()
    share = F.when(F.col("supp_nation") == "NATION_6", rev).otherwise(F.lit(0).cast("long"))
    j = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1k"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2k"), "left_semi")
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # 1e6 x a year-group of cent-percent revenue can exceed int64 at
            # sf1.0+ (the q14 sibling DID overflow there) — cross-multiply in
            # DECIMAL(38,0), matching the oracle's HUGEINT arithmetic
            F.expr(
                f"CAST((1000000 * CAST(sum({_spark_share_expr()}) AS DECIMAL(38,0)))"
                f" div CAST(sum({_spark_rev_expr()}) AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("mkt_share_ppm")
        )
        .orderBy("o_year")
    )


def _spark_rev_expr() -> str:
    return (
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))"
    )


def _spark_share_expr() -> str:
    return f"CASE WHEN supp_nation = 'NATION_6' THEN {_spark_rev_expr()} ELSE 0L END"


# ---------------------------------------------------------------------------
# Q9 — product-type profit (revenue minus cost over a name-filtered part set)
# ---------------------------------------------------------------------------


@register(
    "g7m_tpch_q9",
    sql=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(CAST(sum({_REV_SQL}
                 - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   * CAST(l_quantity AS BIGINT) * 100) AS DOUBLE) / 10000.0 AS DOUBLE)
             AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
    doc="TPC-H Q9 shape (product-type profit): name-wildcard part filter, "
    "profit = discounted revenue minus cost (p_retailprice standing in for "
    "ps_supplycost), grouped by supplier nation x order year.  All terms in "
    "exact int64 cent-percent; one final division.",
)
def g7m_tpch_q9(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nat = _t(spark, sf_dir, "nation")
    cost = _cents("p_retailprice") * F.col("l_quantity").cast("long") * F.lit(100)
    j = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(_rev_col() - cost).cast("double") / 10000.0).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 — important stock (grouped value vs a global-total scalar threshold)
# ---------------------------------------------------------------------------


@register(
    "g7n_tpch_q11",
    sql=f"""
    WITH v AS (
      SELECT l_partkey, CAST(sum({_REV_SQL}) AS BIGINT) AS value_cp
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(value_cp) AS BIGINT) AS total_cp FROM v)
    SELECT l_partkey, CAST(CAST(value_cp AS DOUBLE) / 10000.0 AS DOUBLE) AS value
    FROM v, tot
    WHERE 1300 * value_cp > total_cp
    ORDER BY value_cp DESC, l_partkey
    LIMIT 50
    """,
    doc="TPC-H Q11 shape (important stock): per-key value aggregate compared "
    "against a fraction of the GLOBAL total — the scalar subquery becomes a "
    "one-row broadcast cross join; the threshold compare is integer "
    "cross-multiplied (1300*v > total), never float-vs-float.  Top-50 with "
    "tiebreak.",
)
def g7n_tpch_q11(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    v = li.groupBy("l_partkey").agg(F.sum(_rev_col()).alias("value_cp"))
    tot = v.agg(F.sum("value_cp").alias("total_cp"))
    return (
        v.crossJoin(F.broadcast(tot))
        .where(F.lit(1300) * F.col("value_cp") > F.col("total_cp"))
        .select("l_partkey", (F.col("value_cp").cast("double") / 10000.0).alias("value"),
                F.col("value_cp"))
        .orderBy(F.col("value_cp").desc(), "l_partkey")
        .limit(50)
        .drop("value_cp")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping modes & priority (conditional counts by band)
# ---------------------------------------------------------------------------


@register(
    "g7o_tpch_q12",
    sql="""
    SELECT l_linestatus AS ship_band,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1 ORDER BY 1
    """,
    doc="TPC-H Q12 shape (shipping priority by mode): the late-shipment "
    "predicate correlates both join sides (l_shipdate vs o_orderdate + 60 "
    "days — the commit/receipt-date stand-in), with priority split into "
    "conditional counts per band (l_linestatus standing in for l_shipmode).",
)
def g7o_tpch_q12(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    orders = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_linestatus").alias("ship_band"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_band")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer + double aggregate)
# ---------------------------------------------------------------------------


@register(
    "g7p_tpch_q13",
    sql="""
    WITH co AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    SELECT c_count, count(*) AS custdist
    FROM co GROUP BY 1
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape (customer distribution): LEFT OUTER join with the "
    "filter INSIDE the join condition (customers with zero qualifying orders "
    "must survive with count 0), then a second aggregation over the first's "
    "output — the histogram-of-group-sizes pattern.",
)
def g7p_tpch_q13(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    co = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        co.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (scalar MAX over a derived revenue view)
# ---------------------------------------------------------------------------


@register(
    "g7q_tpch_q15",
    sql=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, CAST(sum({_REV_SQL}) AS BIGINT) AS total_cp
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name,
           CAST(CAST(total_cp AS DOUBLE) / 10000.0 AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_cp = (SELECT max(total_cp) FROM rev)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape (top supplier): quarter-sliced revenue-per-supplier "
    "view evaluated once, its scalar MAX broadcast back as the filter — "
    "exact int64 cent-percent makes the equality safe cross-engine (ties "
    "all returned, as the spec requires).",
)
def g7q_tpch_q15(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_col()).alias("total_cp")
    )
    mx = rev.agg(F.max("total_cp").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_cp") == F.col("mx"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", (F.col("total_cp").cast("double") / 10000.0).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes (anti-join + count distinct)
# ---------------------------------------------------------------------------


@register(
    "g7r_tpch_q16",
    sql=f"""
    WITH ps AS {_PS_SQL}
    SELECT p_brand, p_type, p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship): NOT IN over a "
    "filtered supplier set planned as an anti-join (negative-balance "
    "suppliers standing in for the complaints comment filter), then COUNT "
    "DISTINCT suppliers per (brand, type, size) — the two-phase distinct "
    "aggregate.",
)
def g7r_tpch_q16(spark, sf_dir):
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        _ps(spark, sf_dir)
        .join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey"))
        .join(F.broadcast(bad), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated AVG, integer-exact compare)
# ---------------------------------------------------------------------------


@register(
    "g7s_tpch_q17",
    sql=f"""
    WITH pq AS (
      SELECT l_partkey AS ak, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
             count(*) AS cnt
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(CAST(sum({_REV_SQL}) AS DOUBLE) / 10000.0 / 7.0 AS DOUBLE) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON ak = l_partkey
    WHERE p_brand = 'Brand#23' AND p_size <= 5
      AND 5 * CAST(l_quantity AS BIGINT) * cnt < sq
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): the correlated "
    "per-part AVG subquery decorrelated to a self-aggregate joined back on "
    "partkey; the 'quantity < 0.2 * avg' test is integer cross-multiplied "
    "(5*q*cnt < sum) so both engines compare exactly.  p_size stands in for "
    "the container filter.",
)
def g7s_tpch_q17(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 5))
    pq = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sq"), F.count("*").alias("cnt")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("ak") == F.col("l_partkey"))
        .where(F.lit(5) * F.col("l_quantity").cast("long") * F.col("cnt") < F.col("sq"))
        .agg(
            (F.sum(_rev_col()).cast("double") / 10000.0 / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (nested semi-join chain + threshold agg)
# ---------------------------------------------------------------------------


@register(
    "g7t_tpch_q20",
    sql="""
    WITH shipped AS (
      SELECT l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 400
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 0
      AND s_suppkey IN (SELECT l_suppkey FROM shipped)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q20 shape (part promotion): nested IN-subqueries planned as a "
    "semi-join chain — name-prefixed parts gate the lineitem scan (semi), a "
    "HAVING threshold aggregate derives qualifying suppliers (availqty "
    "stand-in: year's shipped volume > 400), and the outer supplier/nation "
    "query semi-joins against that set.",
)
def g7t_tpch_q20(spark, sf_dir):
    parts = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%")).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
    )
    shipped = (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .where(F.col("qty") > 400)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_regionkey") == 0)
    return (
        supp.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(shipped), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS correlation)
# ---------------------------------------------------------------------------


@register(
    "g7u_tpch_q21",
    sql="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
      AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): the classic "
    "EXISTS (another supplier touched the order) + NOT EXISTS (no OTHER "
    "supplier was also late) double correlation, planned as a LEFT SEMI then "
    "LEFT ANTI join against lineitem — lateness adapted to l_shipdate > "
    "o_orderdate + 30 days (no receipt/commit dates in this schema).",
)
def g7u_tpch_q21(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    l1 = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", F.col("o_orderdate"))
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = li.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"), F.col("l_shipdate").alias("d3")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("k3") == F.col("l_orderkey"))
            & (F.col("s3") != F.col("l_suppkey"))
            & (F.col("d3") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (scalar AVG threshold + anti-join)
# ---------------------------------------------------------------------------


@register(
    "g7v_tpch_q22",
    sql="""
    WITH pool AS (
      SELECT c_custkey, c_custkey % 7 AS cntrycode,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
      FROM customer WHERE c_custkey % 7 IN (1, 3, 5)
    ),
    thresh AS (
      SELECT CAST(sum(bal_cents) AS BIGINT) AS s, count(*) AS n
      FROM pool WHERE bal_cents > 0
    )
    SELECT cntrycode, count(*) AS numcust,
           CAST(CAST(CAST(sum(bal_cents) AS BIGINT) AS DOUBLE) / 100.0 AS DOUBLE) AS totacctbal
    FROM pool, thresh
    WHERE bal_cents * n > s
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY 1 ORDER BY 1
    """,
    doc="TPC-H Q22 shape (global sales opportunity): country-coded customer "
    "pool (c_custkey % 7 standing in for the phone prefix), the positive-"
    "balance AVG threshold cross-multiplied to integer cents (bal*n > sum — "
    "no float average), and customers with no orders since 1999 (every customer here has "
    "SOME order, so the dormancy window keeps the anti-join meaningful) as "
    "a LEFT ANTI join.",
)
def g7v_tpch_q22(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00"))
        .select("o_custkey")
    )
    pool = cust.where((F.col("c_custkey") % 7).isin(1, 3, 5)).select(
        "c_custkey",
        (F.col("c_custkey") % 7).alias("cntrycode"),
        _cents("c_acctbal").alias("bal_cents"),
    )
    thresh = pool.where(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("s"), F.count("*").alias("n")
    )
    return (
        pool.crossJoin(F.broadcast(thresh))
        .where(F.col("bal_cents") * F.col("n") > F.col("s"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal_cents").cast("double") / 100.0).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
