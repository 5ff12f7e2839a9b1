"""Interval-overlap self-join with grid-cell blocking — the non-equi join
Spark (and every shuffle engine) must block to survive (no reference analog;
the reference joins on exact keys only — north-star layer).

The problem: `a.start <= b.end AND b.start <= a.end` has no equi-key, so a
naive plan is a BroadcastNestedLoop/cartesian — O(n^2) at any scale.  The
standard fix is GRID BLOCKING: quantize time into fixed cells, explode each
interval to every cell it touches, equi-join on the cell id, then verify the
true overlap predicate.  A pair overlapping across k shared cells would be
emitted k times; instead of a distinct (a corpus-sized shuffle), each pair is
ASSIGNED to exactly one cell — the cell containing max(start_a, start_b),
which both sides of any overlapping pair always cover — so the join output is
duplicate-free by construction (the trick from Spark's own range-join
literature and DuckDB's IEJoin paper lineage).

Scale: cell width trades fan-out (long intervals touch many cells) against
per-cell density; shuffles are (1) the explode-equi-join keyed on cell id and
nothing else.  Cost is sum over cells of |cell|^2 — bounded by density, not
corpus size, and skew-visible (a hot cell is a data property, same as a hot
join key).  All arithmetic is integer day numbers: bit-identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_pairs(
    iv: DataFrame,
    id_col: str = "id",
    start_col: str = "start_day",
    end_col: str = "end_day",
    cell_days: int = 16,
) -> DataFrame:
    """All pairs (a < b) of overlapping [start_day, end_day] intervals with
    their overlap length in days (inclusive bounds).  Input columns are
    NON-NEGATIVE integer day numbers (cell assignment truncates toward zero,
    which equals floor only for non-negatives — shift a signed domain
    first); output one row per overlapping pair."""
    cells = iv.select(
        F.col(id_col).alias("id"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
        F.explode(
            F.sequence(
                (F.col(start_col) / cell_days).cast("long"),
                (F.col(end_col) / cell_days).cast("long"),
            )
        ).alias("cell"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    pairs = (
        a.join(b, F.col("a.cell") == F.col("b.cell"))  # equi-join on the grid cell
        .where(F.col("a.id") < F.col("b.id"))
        .where((F.col("a.s") <= F.col("b.e")) & (F.col("b.s") <= F.col("a.e")))
        # each overlapping pair covers max(s_a, s_b) on BOTH sides: count it
        # only in that cell -> no distinct needed
        .where(
            F.col("a.cell")
            == (F.greatest(F.col("a.s"), F.col("b.s")) / cell_days).cast("long")
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
                + 1
            ).alias("overlap_days"),
        )
    )
    return pairs


def interval_overlap_oracle_sql(iv_cte: str) -> str:
    """DuckDB twin: the plain non-equi predicate join (fine at oracle scale).
    `iv_cte` must define iv(id, s, e)."""
    return f"""
    WITH {iv_cte}
    SELECT a.id AS id_a, b.id AS id_b,
           least(a.e, b.e) - greatest(a.s, b.s) + 1 AS overlap_days
    FROM iv a JOIN iv b
      ON a.id < b.id AND a.s <= b.e AND b.s <= a.e
    """
