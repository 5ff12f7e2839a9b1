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


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Exact k-NN JOIN: for EVERY query vector, its top-k cosine neighbors in
    the corpus (the batch form of topk_cosine — one query vector there, a
    whole query table here).  Output: (query_id, neighbor_id, n_rank).

    Shape: the query side broadcasts (a query batch is small next to the
    corpus), the cross pairing is a BroadcastNestedLoopJoin evaluated in-task
    (never a shuffled CartesianProduct), and the per-query top-k is one
    window keyed on the query id — so corpus rows stream once, and the only
    shuffle is |queries| * |corpus| scored pairs hashed on query id.  At
    larger query batches, block both sides first (share an LSH bucket /
    IVF cell — see ann_topk / ivf_topk) and apply the same window.

    Cross-engine determinism: the score is dot/|corpus vec| (query norm is
    rank-invariant within a query) with the sum computed as a 0.0-init LEFT
    FOLD in array order == DuckDB list_reduce (bit-exact), so the (score
    DESC, neighbor id) tiebreak totally orders rows identically in both
    engines; only ids and ranks are emitted."""
    from pyspark.sql import Window

    xd = lambda x: x.cast("double")  # noqa: E731
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    sumsq = F.aggregate(
        F.transform(F.col(vec_col), lambda x: xd(x) * xd(x)), F.lit(0.0), lambda a, b: a + b
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(sumsq).alias("nrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: xd(x) * xd(y)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", (dot / F.col("nrm")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("n_rank", F.row_number().over(w))
        .where(F.col("n_rank") <= k)
        .select("query_id", "neighbor_id", "n_rank")
    )
