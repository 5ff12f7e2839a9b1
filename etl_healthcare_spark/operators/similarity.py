"""Similarity search over embedding columns (north-star capability per
BASELINE.json / SURVEY §7.1 step 10 — no reference analog).

* brute-force cosine top-k — the exact baseline: broadcast the query vector,
  one scan, TakeOrderedAndProject.  Linear in corpus size but embarrassingly
  parallel; the right tool up to ~10^8 vectors per query batch.
* LSH-bucketed ANN — the scale path: random-hyperplane signatures partition
  the corpus; a query probes only its bucket (and optionally neighbors).
  Bucketing is a one-off layout cost (write bucketed/partitioned by bucket
  id); per-query work drops to corpus/2^bits.

Vector math is native `aggregate`/`zip_with` (functions/vectors.py) — JVM-side,
codegen'd, no Python round trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine, hyperplane_bucket


def topk_cosine(
    df: DataFrame, vec_col: str, id_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine; deterministic under score ties via id order."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(F.col(id_col).alias("id"), cosine(F.col(vec_col), q).alias("cos"))
    return scored.orderBy(F.col("cos").desc(), F.col("id")).limit(k)


def bucketed_vectors(df: DataFrame, vec_col: str, id_col: str, planes: list[list[float]]) -> DataFrame:
    """Attach the hyperplane-LSH bucket id.  At 100 TB this frame is written
    ``partitionBy("bucket")`` so queries prune to one partition."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )


def ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 5,
) -> DataFrame:
    """ANN: exact cosine, restricted to the query's LSH bucket."""
    import math

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    qbucket = "".join("1" if dot(query_vec, p) >= 0 else "0" for p in planes)
    b = bucketed_vectors(df, vec_col, id_col, planes).where(F.col("bucket") == qbucket)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        b.select("id", cosine(F.col("vec"), q).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("id"))
        .limit(k)
    )
