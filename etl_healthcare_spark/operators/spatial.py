"""Spatial / metric-space joins on integer grids — distance-threshold
pairing via grid-cell blocking (the geohash-join shape, exact on integer
coordinates).

No reference analog (the reference has no spatial layer); this is the
north-star companion to the interval/grid blocking in operators/intervals.py:
the same "block into cells sized to the predicate, probe only adjacent
blocks" trick, lifted from 1-D ranges to 2-D points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chebyshev_pairs(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    dist: int = 2,
    cell: int = 4,
) -> DataFrame:
    """All point pairs within Chebyshev (L-infinity) distance ``dist`` —
    |xa-xb| <= d AND |ya-yb| <= d — found WITHOUT a quadratic self-join.

    Blocking: each point lands in grid cell (x div cell, y div cell) with
    ``cell >= dist``, so any qualifying partner lives in the point's own or
    one of its 8 adjacent cells.  The probe side expands each point to its
    3x3 cell neighborhood (a 9x map-side explode — rows multiply in-task,
    before the shuffle) and hash-joins against the home-cell side; the exact
    distance predicate then filters survivors.  Pair cost is bounded by
    points-per-cell density, never n^2 — the standard geohash/S2 join shape.

    No duplicates by construction: the probe (id_a) < home (id_b) filter
    keeps exactly one direction, and a's probe set covers b's home cell
    exactly once.  All-integer coordinates and distances — hash-exact on any
    engine.  Emits (id_a, id_b, dx, dy).
    """
    assert cell >= dist, "cell size must cover the distance threshold"
    p = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).withColumn("cx", F.expr(f"x div {cell}")).withColumn("cy", F.expr(f"y div {cell}"))
    off = F.explode(
        F.array(*[F.struct(F.lit(i).alias("dx"), F.lit(j).alias("dy")) for i in (-1, 0, 1) for j in (-1, 0, 1)])
    ).alias("o")
    probe = p.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        "cx",
        "cy",
        off,
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("cx") + F.col("o.dx")).alias("pcx"),
        (F.col("cy") + F.col("o.dy")).alias("pcy"),
    )
    home = p.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("pcx"),
        F.col("cy").alias("pcy"),
    )
    return (
        probe.join(home, ["pcx", "pcy"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("xa") - F.col("xb")) <= dist)
            & (F.abs(F.col("ya") - F.col("yb")) <= dist)
        )
        .select(
            "id_a",
            "id_b",
            (F.col("xb") - F.col("xa")).alias("dx"),
            (F.col("yb") - F.col("ya")).alias("dy"),
        )
    )


def chebyshev_oracle_sql(points_cte: str, dist: int = 2) -> str:
    """DuckDB twin: the naive quadratic predicate join the blocking must
    exactly reproduce.  ``points_cte`` must define pts(id, x, y)."""
    return f"""
    WITH {points_cte}
    SELECT a.id AS id_a, b.id AS id_b, b.x - a.x AS dx, b.y - a.y AS dy
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND abs(a.x - b.x) <= {dist}
     AND abs(a.y - b.y) <= {dist}
    """
