"""Corpus clustering over embeddings — k-means in QUANTIZED integer space
(north-star LLM-pipeline layer; no reference analog).  Topic-bucketing a
100 TB corpus (for mixture balancing, dedup blocking, or IVF coarse cells)
does not need float centroids: cluster the int8 codes.

Why integer space: float k-means is not reproducible across engines (sum
order changes the centroid in the last bits, which can flip assignments of
boundary points), so it could only ever be a rows-only check.  In int8 space
every distance is an EXACT integer (sum of squared int differences — order-
free), every centroid component is an exact floor-mean integer, and argmin
ties break on centroid id: the whole algorithm is deterministic on any
engine, which is what makes `cluster_kmeans` hash-checkable against DuckDB.

Scale shape (the standard distributed k-means):
  * quantization: one ndims-group aggregate (broadcast back), map-only encode;
  * assignment: centroids (k rows) BROADCAST, distances computed per-row with
    zip_with folds — map-only, no shuffle, whatever the corpus size;
  * centroid update: posexplode + groupBy (cluster, pos) — ONE shuffle of
    n x ndims skinny rows with full partial aggregation (map-side combine
    reduces to k x ndims per partition);
  * rounds are a driver-side for-loop — each round is one broadcast + one
    shuffle, the same shape Spark MLlib uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot  # noqa: F401  (kept: float-space helpers live together)


def quantized_vectors(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, qv array<long>) — the int8 code of each embedding, as an array.

    Same per-dimension min/max affine map as operators/quantize.int8_quantize
    (bit-identical IEEE parse tree), kept in array form for distance math.
    """
    ex = df.select(F.col(id_col).alias("id"), F.posexplode(F.col(vec_col)).alias("pos", "xf"))
    ex = ex.withColumn("x", F.col("xf").cast("double"))
    stats = ex.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    q = ex.join(F.broadcast(stats), "pos").withColumn(
        "q",
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long")).otherwise(
            F.least(
                F.floor((F.col("x") - F.col("mn")) * F.lit(255.0) / (F.col("mx") - F.col("mn"))),
                F.lit(255).cast("long"),
            )
        ),
    )
    return q.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "q"))), lambda s: s["q"]
        ).alias("qv")
    )


def _dist2(a, b):
    """Exact integer squared L2 between two long arrays (order-free sum)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0).cast("long"), lambda acc, d: acc + d)


def _assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """argmin_c dist2(qv, cv), ties to the smallest centroid id — via an
    order-free exact MIN over (dist2, cid) structs, no window needed."""
    scored = vecs.crossJoin(F.broadcast(centroids)).select(
        "id", "qv", F.struct(_dist2(F.col("qv"), F.col("cv")).alias("d2"), F.col("cid").alias("cid")).alias("dc")
    )
    best = scored.groupBy("id").agg(F.min("dc").alias("dc"), F.first("qv").alias("qv"))
    return best.select("id", "qv", F.col("dc.cid").alias("cluster"), F.col("dc.d2").alias("dist2"))


def _update(assigned: DataFrame) -> DataFrame:
    """New centroids: element-wise floor-mean of members (exact integers)."""
    ex = assigned.select("cluster", F.posexplode("qv").alias("pos", "q"))
    means = ex.groupBy("cluster", "pos").agg(
        (F.sum("q") / F.count(F.lit(1))).cast("long").alias("c")  # floor: values >= 0
    )
    return means.groupBy("cluster").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]).alias("cv")
    ).select(F.col("cluster").alias("cid"), "cv")


def kmeans_int8(
    df: DataFrame, vec_col: str, id_col: str, k: int = 8, rounds: int = 1
) -> DataFrame:
    """Deterministic k-means over int8 codes.

    Seeds = the k smallest ids' codes; `rounds` Lloyd updates; returns the
    final (id, cluster, dist2) assignment.  Every quantity is an exact
    integer, so results are engine-independent.
    """
    vecs = quantized_vectors(df, vec_col, id_col)
    centroids = (
        vecs.orderBy("id").limit(k).select(F.col("id").alias("cid"), F.col("qv").alias("cv"))
    )
    assigned = _assign(vecs, centroids)
    for _ in range(rounds):
        centroids = _update(assigned)
        assigned = _assign(vecs, centroids)
    return assigned.select("id", "cluster", "dist2")


def kmeans_oracle_sql(k: int = 8, rounds: int = 1, src: str = "embeddings") -> str:
    """DuckDB twin of kmeans_int8 (same quantization, seeds, floor-means,
    integer distances, and (dist2, cid) tiebreak)."""
    assert rounds == 1, "oracle is written for the registered rounds=1 shape"
    return f"""
    WITH raw AS (
      SELECT vec_id AS id, unnest(embedding) AS xf,
             generate_subscripts(embedding, 1) AS pos
      FROM {src}
    ),
    ex AS (SELECT id, pos, CAST(xf AS DOUBLE) AS x FROM raw),
    stats AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM ex GROUP BY pos),
    q AS (
      SELECT e.id, e.pos,
        CASE WHEN s.mx = s.mn THEN 0
             ELSE least(CAST(floor((e.x - s.mn) * 255.0 / (s.mx - s.mn)) AS BIGINT), 255)
        END AS q
      FROM ex e JOIN stats s ON e.pos = s.pos
    ),
    seeds AS (SELECT DISTINCT id FROM q ORDER BY id LIMIT {k}),
    c0 AS (SELECT q.id AS cid, q.pos, q.q AS c FROM q JOIN seeds ON q.id = seeds.id),
    d1 AS (
      SELECT q.id, c0.cid, CAST(sum((q.q - c0.c) * (q.q - c0.c)) AS BIGINT) AS d2
      FROM q JOIN c0 ON q.pos = c0.pos
      GROUP BY q.id, c0.cid
    ),
    a1 AS (
      SELECT id, cid, d2,
             row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
      FROM d1
    ),
    c1 AS (
      SELECT a1.cid AS cluster, q.pos,
             CAST(floor(sum(q.q) * 1.0 / count(*)) AS BIGINT) AS c
      FROM a1 JOIN q ON a1.id = q.id AND a1.rn = 1
      GROUP BY a1.cid, q.pos
    ),
    d2s AS (
      SELECT q.id, c1.cluster, CAST(sum((q.q - c1.c) * (q.q - c1.c)) AS BIGINT) AS d2
      FROM q JOIN c1 ON q.pos = c1.pos
      GROUP BY q.id, c1.cluster
    ),
    a2 AS (
      SELECT id, cluster, d2,
             row_number() OVER (PARTITION BY id ORDER BY d2, cluster) AS rn
      FROM d2s
    )
    SELECT id, cluster, d2 AS dist2 FROM a2 WHERE rn = 1
    """
