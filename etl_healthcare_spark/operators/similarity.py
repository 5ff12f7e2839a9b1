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


def _lit_vec(v: list[float]):
    return F.array(*[F.lit(float(x)) for x in v])


def assign_cells(df: DataFrame, vec_col: str, id_col: str, centroids: list[list[float]]) -> DataFrame:
    """(id, vec, cell): nearest-centroid assignment by cosine, ties to the
    lowest cell id.  The centroid set is a tiny literal (nlist x dim), so
    assignment is map-only — no shuffle, no join."""
    v = F.col(vec_col).cast("array<double>")
    scores = [cosine(v, _lit_vec(c)) for c in centroids]
    pick = F.array_max(
        F.array(*[F.struct(s.alias("s"), F.lit(-j).alias("nc")) for j, s in enumerate(scores)])
    )
    return df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), (-pick["nc"]).alias("cell")
    )


def ivf_cells(
    df: DataFrame, vec_col: str, id_col: str, nlist: int = 8, iters: int = 2
) -> list[list[float]]:
    """Deterministic k-means-lite coarse quantizer: seeds = the ``nlist``
    lowest-id vectors, then ``iters`` Lloyd rounds (map-only assignment, one
    (cell, pos) shuffle for the means).  Each round fetches nlist x dim
    doubles to the driver — O(small), like the hyperplane fetch.  At 100 TB
    the cell id becomes a partition column written once (index build); probes
    then prune to nprobe partitions."""
    seeds = df.orderBy(id_col).limit(nlist).select(F.col(vec_col).cast("array<double>")).collect()
    centroids = [list(r[0]) for r in seeds]
    for _ in range(iters):
        a = assign_cells(df, vec_col, id_col, centroids)
        rows = (
            a.select("cell", F.posexplode(F.col("vec").cast("array<double>")).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda s: s["m"]).alias("centroid"))
        ).collect()
        got = {r.cell: list(r.centroid) for r in rows}
        centroids = [got.get(j, centroids[j]) for j in range(nlist)]  # empty cell keeps its seed
    return centroids


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    nlist: int = 8,
    nprobe: int = 2,
    k: int = 10,
    iters: int = 2,
) -> DataFrame:
    """IVF ANN: k-means cells, probe the ``nprobe`` nearest cells to the
    query, exact cosine top-k inside the probed cells only — per-query work
    is ~corpus * nprobe/nlist.

    Exactness gate: with ``nprobe == nlist`` the probe set covers every cell,
    so the result MUST equal exact brute-force top-k for ANY data — that
    configuration verifies the assignment/probe/score/union machinery against
    the brute-force oracle (and is immune to float jitter in centroid means,
    since membership no longer matters).  Partial probe is the scale path;
    its recall depends on how clustered the corpus is (tested on planted
    clusters in test_llm_ops)."""
    import math

    centroids = ivf_cells(df, vec_col, id_col, nlist, iters)

    def cosp(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    order = sorted(range(len(centroids)), key=lambda j: (-cosp(query_vec, centroids[j]), j))
    probed = order[: max(1, min(nprobe, len(centroids)))]
    cand = assign_cells(df, vec_col, id_col, centroids).where(F.col("cell").isin(probed))
    q = _lit_vec(query_vec)
    return (
        cand.select("id", cosine(F.col("vec").cast("array<double>"), q).alias("cos"))
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
