"""Bucketed (co-located) table layout — the shuffle-free join path
(SCALE.md §4; the scale generalization of the reference's precomputed GSI
access paths, SURVEY §4).

At 100 TB the dominant recurring cost of fact-to-fact joins is the shuffle.
Bucketing both sides into the same number of buckets on the join key writes
the shuffle once, at load time; every subsequent join on that key sort-merges
bucket-to-bucket with ZERO Exchange in the plan (asserted in
tests/test_bucketed_join.py).  The state store's tenant partitioning plus
in-file sort (operators/persist.py) is the same idea for point/range reads;
bucketing is the analog for repeated equi-joins — e.g. observations ⋈
patients, embeddings ⋈ dedup-verdicts in the LLM pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame bucketed (and in-bucket sorted) on the join key.

    Bucket count rule of thumb: total size / target task size (128-256 MB);
    both join sides MUST use the same count for co-located execution.
    """
    w = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.saveAsTable(table)
