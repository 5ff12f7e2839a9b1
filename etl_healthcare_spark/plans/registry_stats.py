"""Round-4 nonparametric-statistics batch: exact two-sample KS and
Mann-Whitney tests on the shared no-global-sort ECDF frame, and the
one-scan pairwise correlation matrix.

These are the distribution-shift tests a training-mix owner runs between
corpus slices before trusting a blend change — the hypothesis-test
companions of profile_drift_tvd (exact TVD) and profile_embedding_drift
(centroid ppm).  All statistics are exact integers (cross-multiplied
rationals), so both engines agree to the last bit.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import _t, register

PPM = 1_000_000

# Two samples sharing the price axis: return flag 'R' (sample A) vs 'A'
# (sample B), whole cents.  Fixed predicate; sample sizes scale with sf but
# the output stays O(1).
_SAMPLES_SQL = """SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ia
      FROM lineitem WHERE l_returnflag IN ('R', 'A')"""


def _samples(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag").isin("R", "A"))
    return li.select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").alias("v"),
        (F.col("l_returnflag") == "R").cast("long").alias("ia"),
    )


def _ks_oracle() -> str:
    from ..operators.stats import ecdf_oracle_cte

    return f"""
    WITH {ecdf_oracle_cte(_SAMPLES_SQL)},
    tot AS (SELECT max(ca_cum) AS na, max(cb_cum) AS nb FROM ecdf),
    d AS (
      SELECT v, abs(ca_cum * nb - cb_cum * na) AS dn, na, nb
      FROM ecdf CROSS JOIN tot
    )
    SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
           CAST(max(dn) AS BIGINT) AS ks_num,
           CAST(max(na) * max(nb) AS BIGINT) AS ks_den,
           CAST(min(CASE WHEN dn = (SELECT max(dn) FROM d) THEN v END) AS BIGINT)
             AS ks_at_cents
    FROM d
    """


@register(
    "stat_ks_two_sample",
    sql=_ks_oracle(),
    doc="EXACT two-sample Kolmogorov-Smirnov statistic between the R and A "
    "return-flag price distributions: KS = max_v |F_A(v) - F_B(v)| emitted "
    "as the cross-multiplied integer rational (ks_num, ks_den=nA*nB) plus "
    "the smallest value attaining the max — no float ECDF, so both engines "
    "agree to the last bit.  Shape: the joint per-distinct-value ECDF frame "
    "built with the token_shards no-global-sort cumulative-sum pattern "
    "(bucket totals -> aggregated-frame prefix window -> bounded in-bucket "
    "windows), then one O(1)-output aggregate.  The distribution-shift "
    "hypothesis test next to profile_drift_tvd's effect size.",
)
def stat_ks_two_sample(spark, sf_dir):
    from ..operators.stats import two_sample_ecdf

    ecdf = two_sample_ecdf(_samples(spark, sf_dir), "ia", "v")
    tot = ecdf.agg(F.max("ca_cum").alias("na"), F.max("cb_cum").alias("nb"))
    d = ecdf.crossJoin(F.broadcast(tot)).select(
        "v",
        (F.abs(F.col("ca_cum") * F.col("nb") - F.col("cb_cum") * F.col("na"))).alias("dn"),
        "na",
        "nb",
    )
    return d.agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.max("dn").alias("ks_num"),
        (F.max("na") * F.max("nb")).alias("ks_den"),
        (-F.max(F.struct(F.col("dn"), (-F.col("v")).alias("nv"))).getField("nv")).alias("ks_at_cents"),
    )


def _mwu_oracle() -> str:
    from ..operators.stats import ecdf_oracle_cte

    return f"""
    WITH {ecdf_oracle_cte(_SAMPLES_SQL)},
    r AS (
      SELECT ca_v, cb_v,
             (ca_cum + cb_cum) - (ca_v + cb_v) AS c_before,
             ca_v + cb_v AS cnt
      FROM ecdf
    ),
    s AS (
      SELECT CAST(sum(ca_v * (2 * c_before + cnt + 1)) AS BIGINT) AS r2_a,
             CAST(sum(ca_v) AS BIGINT) AS na, CAST(sum(cb_v) AS BIGINT) AS nb
      FROM r
    )
    SELECT na AS n_a, nb AS n_b, r2_a,
           CAST(r2_a - na * (na + 1) AS BIGINT) AS u2_a
    FROM s
    """


@register(
    "stat_mann_whitney",
    sql=_mwu_oracle(),
    doc="EXACT Mann-Whitney rank-sum between the R and A price samples: "
    "doubled rank sum 2*R_A = sum_v ca_v * (2*c_before + cnt + 1) handles "
    "midranks for ties WITHOUT halves (everything stays int64), and "
    "2*U_A = 2*R_A - nA(nA+1).  Rides the same no-global-sort ECDF frame "
    "as stat_ks_two_sample; output is one row.  The location-shift "
    "companion of the KS shape test.",
)
def stat_mann_whitney(spark, sf_dir):
    from ..operators.stats import two_sample_ecdf

    ecdf = two_sample_ecdf(_samples(spark, sf_dir), "ia", "v")
    r = ecdf.select(
        "ca_v",
        "cb_v",
        ((F.col("ca_cum") + F.col("cb_cum")) - (F.col("ca_v") + F.col("cb_v"))).alias("c_before"),
        (F.col("ca_v") + F.col("cb_v")).alias("cnt"),
    )
    s = r.agg(
        F.sum(F.col("ca_v") * (2 * F.col("c_before") + F.col("cnt") + 1)).alias("r2_a"),
        F.sum("ca_v").alias("n_a"),
        F.sum("cb_v").alias("n_b"),
    )
    return s.select(
        "n_a",
        "n_b",
        "r2_a",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)).alias("u2_a"),
    )


# ---------------------------------------------------------------------------
# one-scan pairwise correlation matrix (exact power sums)
# ---------------------------------------------------------------------------

_CORR_COLS = {
    "qty": "CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)",
    "price": "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100",
    "disc": "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)",
    "tax": "CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)",
}


def _corr_oracle() -> str:
    cols = list(_CORR_COLS)
    exprs = ",\n             ".join(
        f"{sql.replace(' div ', ' // ')} AS {name}" for name, sql in _CORR_COLS.items()
    )
    sums = ",\n             ".join(
        [f"CAST(count(*) AS HUGEINT) AS n"]
        + [f"CAST(sum({c}) AS HUGEINT) AS s_{c}" for c in cols]
        + [
            f"sum(CAST({a} AS HUGEINT) * CAST({b} AS HUGEINT)) AS s_{a}_{b}"
            for i, a in enumerate(cols)
            for b in cols[i:]
        ]
    )
    pair_rows = "\n      UNION ALL\n      ".join(
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b, n,
             n * s_{a}_{b} - s_{a} * s_{b} AS dxy,
             n * s_{a}_{a} - s_{a} * s_{a} AS dxx,
             n * s_{b}_{b} - s_{b} * s_{b} AS dyy
      FROM s"""
        for i, a in enumerate(cols)
        for b in cols[i + 1 :]
    )
    return f"""
    WITH base AS (
      SELECT {exprs}
      FROM lineitem
    ),
    s AS (
      SELECT {sums}
      FROM base
    ),
    p AS (
      {pair_rows}
    )
    SELECT col_a, col_b, CAST(n AS BIGINT) AS n,
           CAST(CASE WHEN dxy > 0 THEN 1 WHEN dxy < 0 THEN -1 ELSE 0 END AS BIGINT) AS corr_sign,
           CAST((1000000 * ((abs(dxy) // n) * (abs(dxy) // n)))
                // nullif((dxx // n) * (dyy // n), 0) AS BIGINT) AS corr2_ppm
    FROM p
    """


@register(
    "stat_corr_matrix",
    sql=_corr_oracle(),
    doc="Pairwise CORRELATION MATRIX over four lineitem measures in ONE "
    "scan: all 4 sums, 4 sums-of-squares, and 6 cross products accumulate "
    "in a single decimal(38)/hugeint aggregate (no per-pair rescan), then "
    "the 6 pair rows emit sign + corr^2 in ppm via the g18 n-reduced "
    "integer division rule (float CORR never hash-matches across engines).  "
    "The multi-column screening step before any feature-selection or "
    "drift investigation; one reduce, O(k^2) output.",
)
def stat_corr_matrix(spark, sf_dir):
    cols = list(_CORR_COLS)
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(*[F.expr(sql).alias(name) for name, sql in _CORR_COLS.items()])
    d38 = "decimal(38,0)"
    aggs = (
        [F.count(F.lit(1)).cast(d38).alias("n")]
        + [F.sum(F.col(c).cast(d38)).alias(f"s_{c}") for c in cols]
        + [
            F.sum((F.col(a).cast(d38) * F.col(b).cast(d38))).alias(f"s_{a}_{b}")
            for i, a in enumerate(cols)
            for b in cols[i:]
        ]
    )
    s = base.agg(*aggs)
    pair_selects = [
        s.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col("n"),
            (F.col("n") * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")).alias("dxy"),
            (F.col("n") * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).alias("dxx"),
            (F.col("n") * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).alias("dyy"),
        )
        for i, a in enumerate(cols)
        for b in cols[i + 1 :]
    ]
    p = pair_selects[0]
    for q in pair_selects[1:]:
        p = p.unionByName(q)
    sign = F.when(F.col("dxy") > 0, 1).when(F.col("dxy") < 0, -1).otherwise(0)
    # n-reduce the second moments before squaring and RE-PROMOTE to
    # decimal(38) (the g18 rule): `div` on decimals yields an int64 quotient,
    # and rxy^2 * 1e6 overflows int64 for the price pairs
    mid = p.select(
        "col_a",
        "col_b",
        F.col("n").cast("long").alias("n"),
        sign.cast("long").alias("corr_sign"),
        F.expr("abs(dxy) div n").cast("decimal(38,0)").alias("_rxy"),
        F.expr("dxx div n").cast("decimal(38,0)").alias("_rxx"),
        F.expr("dyy div n").cast("decimal(38,0)").alias("_ryy"),
    )
    return mid.select(
        "col_a",
        "col_b",
        "n",
        "corr_sign",
        F.expr(
            "(CAST(1000000 AS DECIMAL(38,0)) * _rxy * _rxy)"
            " div nullif(_rxx * _ryy, CAST(0 AS DECIMAL(38,0)))"
        ).alias("corr2_ppm"),
    )


# ---------------------------------------------------------------------------
# chi-square test of independence (exact integer rationals)
# ---------------------------------------------------------------------------


@register(
    "stat_chi2_independence",
    sql="""
    WITH cell AS (
      SELECT o_orderpriority AS prio, o_orderstatus AS status,
             CAST(count(*) AS HUGEINT) AS o
      FROM orders GROUP BY 1, 2
    ),
    m AS (
      SELECT prio, status, o,
             sum(o) OVER (PARTITION BY prio) AS r,
             sum(o) OVER (PARTITION BY status) AS c,
             sum(o) OVER () AS n
      FROM cell
    )
    SELECT prio, status, CAST(o AS BIGINT) AS observed,
           CAST(r AS BIGINT) AS row_total,
           CAST(c AS BIGINT) AS col_total,
           CAST(r * c * 1000000 // n AS BIGINT) AS expected_x1e6,
           CAST((n * o - r * c) * (n * o - r * c) * 1000000
                // (n * r * c) AS BIGINT) AS chi2_term_x1e6
    FROM m
    """,
    doc="CHI-SQUARE TEST OF INDEPENDENCE between order priority and order "
    "status, EXACT: each cell's term (O-E)^2/E clears to the integer "
    "rational (n*O - R*C)^2 / (n*R*C) — no float expected counts, so "
    "sum(chi2_term_x1e6)/1e6 is the engine-exact X^2 statistic (df = "
    "(R-1)(C-1) = 8; the consumer compares against the critical value).  "
    "Completes the nonparametric family: stat_ks_exact compares "
    "continuous distributions, stat_mann_whitney compares ranks, this "
    "tests categorical association.  Shape: ONE partial-aggregable "
    "groupBy to the <=15-cell contingency frame; marginals are windows "
    "on that frame; HUGEINT/decimal(38) since (n*O)^2 passes int64 "
    "beyond ~50k rows.",
)
def stat_chi2_independence(spark, sf_dir):
    dec = "decimal(38,0)"
    cell = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("prio"), F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).cast(dec).alias("o"))
    )
    m = cell.select(
        "prio",
        "status",
        "o",
        F.sum("o").over(W.partitionBy("prio")).alias("r"),
        F.sum("o").over(W.partitionBy("status")).alias("c"),
        F.sum("o").over(W.partitionBy(F.lit(0))).alias("n"),
    )
    return m.select(
        "prio",
        "status",
        F.col("o").cast("long").alias("observed"),
        F.col("r").cast("long").alias("row_total"),
        F.col("c").cast("long").alias("col_total"),
        F.expr("CAST(r * c * 1000000 div n AS BIGINT)").alias("expected_x1e6"),
        F.expr(
            "CAST((n * o - r * c) * (n * o - r * c) * 1000000 div (n * r * c) AS BIGINT)"
        ).alias("chi2_term_x1e6"),
    )
