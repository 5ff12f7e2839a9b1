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


def asof_tolerance_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    left_id: str,
    right_id: str,
    tolerance_us: int,
    direction: str = "backward",
) -> DataFrame:
    """AS-OF join with a MATCH TOLERANCE and a direction — the full pandas
    merge_asof / kdb aj surface on top of j5b's basic backward as-of:
    ``backward`` pairs each left row with the LATEST right row at-or-before
    its timestamp, ``forward`` with the EARLIEST at-or-after, and a match
    farther than ``tolerance_us`` microseconds away is discarded (emitted
    with NULL right id — sensor fusion and trade/quote alignment need the
    miss row, not a dropped row).

    Shape (the j5b pattern, never a range self-join): union-tag both sides,
    ONE window partitioned by the join key ordered by (ts, side, right id) —
    the explicit right-id tiebreak makes equal-timestamp right rows a TOTAL
    order, so the carried match is deterministic (latest/earliest by (ts,
    id)) — then a map-only tolerance filter.  One shuffle on the key; the
    window carries two last()/first() ignoreNulls columns.

    Output (left id, right id | NULL, gap_us | NULL, matched)."""
    from pyspark.sql import Window as W

    backward = direction == "backward"
    assert direction in ("backward", "forward")
    tagged = left.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("ts"),
        F.col(left_id).alias("l_id"),
        F.lit(None).cast("long").alias("r_id"),
    ).unionByName(
        right.select(
            F.col(key_col).alias("k"),
            F.col(ts_col).alias("ts"),
            F.lit(None).cast("long").alias("l_id"),
            F.col(right_id).alias("r_id"),
        )
    )
    # backward: right rows sort BEFORE left at equal ts (>= is inclusive);
    # forward: right rows sort AFTER left (<= inclusive via first() lookahead)
    side = F.when(F.col("r_id").isNotNull(), F.lit(0) if backward else F.lit(1)).otherwise(
        F.lit(1) if backward else F.lit(0)
    )
    w = W.partitionBy("k").orderBy("ts", side.asc(), F.coalesce("r_id", F.lit(-1)))
    w = (
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
        if backward
        else w.rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    pick = (lambda c: F.last(c, ignorenulls=True)) if backward else (
        lambda c: F.first(c, ignorenulls=True)
    )
    m = tagged.withColumn("m_id", pick(F.col("r_id")).over(w)).withColumn(
        "m_ts", pick(F.when(F.col("r_id").isNotNull(), F.col("ts"))).over(w)
    )
    gap = F.abs(F.unix_micros("ts") - F.unix_micros("m_ts"))
    in_tol = F.col("m_id").isNotNull() & (gap <= tolerance_us)
    return m.where(F.col("l_id").isNotNull()).select(
        F.col("l_id").alias(left_id),
        F.when(in_tol, F.col("m_id")).alias(right_id),
        F.when(in_tol, gap).alias("gap_us"),
        in_tol.alias("matched"),
    )


def asof_tolerance_oracle_sql(
    left_sql: str,
    right_sql: str,
    key_col: str,
    ts_col: str,
    left_id: str,
    right_id: str,
    tolerance_us: int,
    direction: str = "backward",
) -> str:
    """DuckDB twin of asof_tolerance_join via a correlated LATERAL argmax —
    a per-left-row derivation instead of the union+window carry."""
    cmp_, ord_ = (" <= ", "DESC") if direction == "backward" else (" >= ", "ASC")
    return f"""
    WITH l AS ({left_sql}), r AS ({right_sql}),
    m AS (
      SELECT l.{left_id}, c.{right_id} AS m_id,
             abs(epoch_us(l.{ts_col}) - epoch_us(c.{ts_col})) AS gap_us
      FROM l LEFT JOIN LATERAL (
        SELECT r.{right_id}, r.{ts_col} FROM r
        WHERE r.{key_col} = l.{key_col} AND r.{ts_col}{cmp_}l.{ts_col}
        ORDER BY r.{ts_col} {ord_}, r.{right_id} {ord_} LIMIT 1
      ) c ON TRUE
    )
    SELECT {left_id},
           CASE WHEN m_id IS NOT NULL AND gap_us <= {tolerance_us} THEN m_id END AS {right_id},
           CASE WHEN m_id IS NOT NULL AND gap_us <= {tolerance_us} THEN gap_us END AS gap_us,
           coalesce(m_id IS NOT NULL AND gap_us <= {tolerance_us}, FALSE) AS matched
    FROM m
    """
