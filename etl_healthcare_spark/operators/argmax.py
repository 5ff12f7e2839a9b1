"""Scalable lexicographic argmax: latest-row-per-group without sorting the
corpus (reference semantics: latestObservation, services/api-query/src/
handler.ts:110-139, generalized per SURVEY §2.8 Q3 / §2.4 G6).

Why not ``max_by(struct(payload), struct(order, tie))``: MaxBy/MinBy are
declarative aggregates whose buffer holds the ordering AND the value
expression.  A struct buffer is not UnsafeRow-mutable, so
``HashAggregateExec.supportsAggregate`` rejects the plan and Spark falls
back to SortAggregate — a per-partition SORT of the full corpus on the
group keys, partial and final, with spill.  The sf3→sf9 probe campaign
measured this exact plan class at 4.70× wall per 3× data on the minhash
signature aggregation before its fixed-width rewrite (SCALE.md §48); the
latest-per-group family has the same shape and inherits the same fate at
100 TB.

The recipe here is a TWO-PHASE argmax per order column, all hash, no sort:

  phase k over order column ``o_k``:
    m  = cur.groupBy(g).agg(max(o_k))          -- HashAggregate: the buffer
                                                  is one fixed-width value,
                                                  partial map-side combine,
                                                  shuffle is groups-sized
    cur = cur ⋈ m on (g, o_k == max)           -- shuffled-hash equi-join
                                                  (hinted: never SortMerge,
                                                  AQE upgrades to broadcast
                                                  when m is small)

  After phase 1, ``cur`` holds only rows achieving their group's max order
  value — at most (ties) rows per group, i.e. groups-sized, so every later
  phase aggregates and joins bounded frames.  Iterating over
  ``[order, tie1, tie2, …]`` computes the exact lexicographic argmax.

Cost at scale — WHEN TO USE WHICH (measured, SCALE.md §49): the two-phase
argmax pays one corpus-wide hash exchange (the join probe side).  The
SortAggregate alternative pays a map-side sort per partition plus a shuffle
of the PARTIAL aggregates.  So the crossover is the partial-aggregation
collapse ratio:

* HIGH collapse (many rows per group — latest-observation shapes): the
  partial shuffle is tiny, and the map-side sort runs over size-BOUNDED
  scan partitions (maxPartitionBytes), i.e. linear with a log(partition)
  constant — SortAggregate beats this operator (measured 1.8–2.3× at sf9
  on q3/g6).  There, if every ordering column packs into one fixed-width
  atom (BIGINT or DECIMAL(38,0) — see q3/g6's us·10^19 + id packing),
  prefer the ONE-PASS max(packed)/max_by(value, packed) HashAggregate:
  it keeps the tiny partial shuffle AND drops the sort — strictly best.
* LOW collapse (≈1–2 rows per group — CDC batches, per-message picks,
  match candidates): partials barely shrink, the exchange carries the
  full stream either way, and the post-shuffle sort runs on FIXED-count
  shuffle partitions whose per-task size grows with the corpus — the
  super-linear spill class (minhash, 4.70× per 3× data).  THIS operator
  is the right shape there, and the only exact option when the ordering
  involves non-packable (string) columns or the payload must ride whole
  rows.

Determinism contract: the LAST order column must be unique within
(group, preceding order columns) for a single-row-per-group result — the
callers here use event/observation ids, unique by construction.  With
duplicates, all maximal rows are returned (the row_number-over-desc oracle
would pick one arbitrarily, so callers must supply a true tiebreak anyway).

NULL contract (round-9 ADVICE — a plain equality join-back silently DROPPED
rows): every phase's join uses null-safe equality (``<=>``), so

* a NULL group key forms its own group and is returned like any other
  (groupBy already buckets NULLs; ``<=>`` keeps the join-back from
  discarding them);
* NULL order values always LOSE to non-NULL ones (max/min ignore NULLs, and
  a NULL order value never null-safe-equals a non-NULL max) — i.e. NULL
  sorts first for argmax and last for argmin, matching SQL ``NULLS LAST``
  under ``ORDER BY ... DESC``;
* a group whose order values are ALL NULL keeps its rows (max = NULL and
  ``NULL <=> NULL`` is true) and tiebreaks on the remaining phases, rather
  than vanishing from the result.

``<=>`` is an equi-join predicate, so the join-back still plans as the
hinted shuffled-hash join — the null contract costs no plan shape.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _arg_rows(
    df: DataFrame, group_cols: list[str], order_cols: list[str], agg_fn
) -> DataFrame:
    _FIXED = ("int", "bigint", "smallint", "tinyint", "double", "float",
              "date", "boolean")
    dtypes = dict(df.dtypes)
    for oc in order_cols:
        t = dtypes[oc]
        if not (t in _FIXED or t.startswith("decimal") or t.startswith("timestamp")):
            raise ValueError(
                f"arg-extreme order column {oc!r} has non-fixed-width type {t};"
                " a hash-aggregable max/min needs a fixed-width buffer — encode"
                " it (order-isomorphic) first"
            )
    cur = df
    for i, oc in enumerate(order_cols):
        g_alias = [F.col(c).alias(f"__g{i}_{c}") for c in group_cols]
        m = (
            cur.groupBy(*group_cols)
            .agg(agg_fn(oc).alias(f"__m{i}"))
            .select(*g_alias, f"__m{i}")
        )
        # null-safe equality: NULL group keys keep their group, and all-NULL
        # order groups keep their rows (module docstring NULL contract)
        cond: Column = reduce(
            lambda a, b: a & b,
            [F.col(c).eqNullSafe(F.col(f"__g{i}_{c}")) for c in group_cols]
            + [F.col(oc).eqNullSafe(F.col(f"__m{i}"))],
        ) if group_cols else F.col(oc).eqNullSafe(F.col(f"__m{i}"))
        cur = cur.join(m.hint("shuffle_hash"), on=cond, how="inner").drop(
            f"__m{i}", *[f"__g{i}_{c}" for c in group_cols]
        )
    return cur


def argmax_rows(df: DataFrame, group_cols: list[str], order_cols: list[str]) -> DataFrame:
    """All columns of the row maximizing ``order_cols`` lexicographically,
    one row per group (see module docstring for the plan-shape argument).

    Every order column must be a fixed-width orderable type (numeric,
    timestamp, date, boolean) so each phase's ``max`` buffer is
    UnsafeRow-mutable; this is asserted eagerly rather than silently
    degrading to a sort-based plan.
    """
    return _arg_rows(df, group_cols, order_cols, F.max)


def argmin_rows(df: DataFrame, group_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Mirror of :func:`argmax_rows` for the lexicographic MINIMUM — the
    best-candidate-by-ascending-score pick (fuzzy match distance, first
    segment index, nearest neighbour)."""
    return _arg_rows(df, group_cols, order_cols, F.min)
