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
