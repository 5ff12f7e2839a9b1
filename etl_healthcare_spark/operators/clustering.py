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
from ..functions.materialize import materialize


def quantized_vectors(df: DataFrame, vec_col: str, id_col: str, center: int = 0) -> DataFrame:
    """(id, qv array<long>) — the int8 code of each embedding, as an array.

    Same per-dimension min/max affine map as operators/quantize.int8_quantize
    (bit-identical IEEE parse tree), kept in array form for distance math.

    ``center`` shifts every code by -center (e.g. 128 → codes in
    [-128, 127]).  A common integer shift changes NO pairwise L2 distance
    (so k-means clustering is identical), but it re-centers dot products:
    cosine over centered codes tracks true float cosine, where cosine over
    the raw non-negative [0, 255] codes is compressed into [0.85, 1.0]
    (measured on testdata) and cannot separate near-dups from the bulk.
    """
    # Round-10 shape: ONE stats pass + ONE map-only quantize pass.  The old
    # form broadcast the per-dim stats back onto the 64x-exploded stream and
    # re-assembled codes with a collect_list regroup — i.e. the whole
    # exploded corpus crossed an exchange once per run (and the regroup's
    # var-width buffer is the expensive aggregate class).  The stats frame
    # is DIM-bounded (one row per dimension), so it is collected to the
    # driver (same bounded-collect discipline as the IVF centroid loads) and
    # re-enters as literal arrays; quantization is then a per-row
    # ``transform`` with zero shuffles.  Per-element arithmetic is the
    # identical IEEE parse tree ((x - mn) * 255.0 / (mx - mn)), so codes are
    # bit-identical to the old form.
    ex = df.select(F.posexplode(F.col(vec_col)).alias("pos", "xf")).select(
        "pos", F.col("xf").cast("double").alias("x")
    )
    stats = {
        r["pos"]: (r["mn"], r["mx"])
        for r in ex.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx")).collect()
    }
    mns = F.array(*[F.lit(stats[p][0]) for p in sorted(stats)])
    mxs = F.array(*[F.lit(stats[p][1]) for p in sorted(stats)])

    def _code(x, i):
        mn = F.element_at(mns, i + 1)
        mx = F.element_at(mxs, i + 1)
        q = F.when(mx == mn, F.lit(0).cast("long")).otherwise(
            F.least(
                F.floor((x.cast("double") - mn) * F.lit(255.0) / (mx - mn)),
                F.lit(255).cast("long"),
            )
        )
        return q - F.lit(int(center)) if center else q

    return df.select(
        F.col(id_col).alias("id"), F.transform(F.col(vec_col), _code).alias("qv")
    )


def _dist2(a, b):
    """Exact integer squared L2 between two long arrays (order-free sum)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0).cast("long"), lambda acc, d: acc + d)


def _assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """argmin_c dist2(qv, cv), ties to the smallest centroid id.

    Plan shape (round-9 fix): the (d2, cid) pick is a single ``min`` over a
    PACKED BIGINT ``d2 * 2^32 + cid`` — order-isomorphic with the (d2, cid)
    struct because both components are non-negative and cid < 2^32 (guarded
    below on the k-row centroid side; d2 over 64-dim centered int8 codes is
    ≤ 64·256² = 2^22, so the product stays < 2^54).  The struct form's
    buffer is not UnsafeRow-mutable and silently planned SORTAGGREGATE — a
    per-partition sort of the n×k scored stream, the plan class the sf3→sf9
    probe measured at 4.70× wall per 3× data (SCALE.md §48).  ``qv`` rides
    as a grouping key (grouping keys may be any type; only aggregation
    BUFFERS must be fixed-width — the previous ``first(qv)`` array buffer
    also broke hash aggregation), so the whole reduce is one HashAggregate
    with map-side combine."""
    guarded = centroids.withColumn(
        "cid",
        F.when(
            (F.col("cid") < 0) | (F.col("cid") > F.lit((1 << 32) - 1)),
            F.raise_error(F.lit("_assign: cid outside [0, 2^32) breaks the d2*2^32+cid packing")),
        ).otherwise(F.col("cid")),
    )
    d2 = _dist2(F.col("qv"), F.col("cv"))
    scored = vecs.crossJoin(F.broadcast(guarded)).select(
        "id",
        "qv",
        (
            F.when(
                d2 > F.lit((1 << 31) - 1),
                F.raise_error(F.lit("_assign: d2 ≥ 2^31 overflows the d2*2^32+cid packing")),
            ).otherwise(d2)
            * F.lit(1 << 32).cast("long")
            + F.col("cid")
        ).alias("packed"),
    )
    best = scored.groupBy("id", "qv").agg(F.min("packed").alias("packed"))
    return best.select(
        "id",
        "qv",
        (F.col("packed") % F.lit(1 << 32).cast("long")).alias("cluster"),
        F.expr(f"packed div {1 << 32}").alias("dist2"),  # integer div: exact past 2^53
    )


def _assign_arrow(vecs: DataFrame, centroid_rows, id_t: str, block: int = 8192) -> DataFrame:
    """Vectorized twin of _assign for corpus-scale k: argmin over the
    centroid matrix via int64 numpy GEMM inside an Arrow mapInPandas task.

    _assign's crossJoin(broadcast(centroids)) materializes n x k ROWS each
    carrying two 64-long arrays through an interpreted zip_with fold; with
    the SemDeDup contract k = ceil(n/2500) that row volume is QUADRATIC in
    the corpus — the round-7 sf1->sf3 probe measured dedup_semantic at 6.1x
    wall on 3x data with assignment dominating (SCALE.md §46).  Here the
    bounded centroid table (k x 64 longs — k grows only as n/2500, ~123 KB
    at sf3) is collected once and rides the task closure; each Arrow batch
    computes d2 = |v|^2 - 2 v.C + |C|^2 exactly in int64 and argmins.
    BIT-IDENTICAL to _assign: same integers (centered codes <= 128 keep
    every term far inside int64), same tie rule (centroids sorted by cid
    ascending, np.argmin returns the FIRST minimum = smallest cid —
    matching min(struct(d2, cid))); agreement pytest-asserted."""
    schema = f"id {id_t}, qv array<bigint>, cluster bigint, dist2 bigint"
    rows = sorted(centroid_rows, key=lambda r: r["cid"])
    if not rows:
        # empty corpus -> empty centroid table; without this guard the task
        # kernel would np.AxisError on the 1-D C=np.array([]) as soon as a
        # batch iterates (reachable only when the caller's n>0 switch is
        # bypassed, but the helper must stand alone)
        return vecs.sparkSession.createDataFrame([], schema)
    cids = [int(r["cid"]) for r in rows]
    cvs = [[int(x) for x in r["cv"]] for r in rows]

    def assign(batches):
        import numpy as np
        import pandas as pd

        C = np.array(cvs, dtype=np.int64)
        c2 = (C * C).sum(axis=1)
        cid_arr = np.array(cids, dtype=np.int64)
        for pdf in batches:
            n = len(pdf)
            out_c = np.empty(n, dtype=np.int64)
            out_d = np.empty(n, dtype=np.int64)
            if n:
                m = np.array(pdf["qv"].tolist(), dtype=np.int64)
                for lo in range(0, n, block):
                    hi = min(lo + block, n)
                    mb = m[lo:hi]
                    d2 = (mb * mb).sum(axis=1)[:, None] - 2 * (mb @ C.T) + c2[None, :]
                    j = d2.argmin(axis=1)
                    out_c[lo:hi] = cid_arr[j]
                    out_d[lo:hi] = d2[np.arange(hi - lo), j]
            yield pd.DataFrame(
                {"id": pdf["id"], "qv": pdf["qv"], "cluster": out_c, "dist2": out_d}
            )

    return vecs.mapInPandas(assign, schema=schema)


def _update(assigned: DataFrame) -> DataFrame:
    """New centroids: element-wise floor-mean of members (exact integers)."""
    ex = assigned.select("cluster", F.posexplode("qv").alias("pos", "q"))
    means = ex.groupBy("cluster", "pos").agg(
        # true floor (not cast-truncation) so centered codes (negatives,
        # quantized_vectors center=128) floor-mean identically to DuckDB;
        # for the non-negative raw codes floor == truncation, so
        # cluster_kmeans results are unchanged.
        F.floor(F.sum("q") / F.count(F.lit(1))).alias("c")
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


def _idot(a, b):
    """Exact integer dot product of two long arrays (order-free sum)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, d: acc + d)


# SemDeDup pair cost is n^2/k spread over k cluster tasks; holding the MEAN
# CLUSTER SIZE constant (k = ceil(n/target)) makes total pair work LINEAR in
# the corpus (n x target/2 candidate pairs) and parallelism grow with it —
# the "k grows with the corpus" scale contract, caught as a real blocker by
# the round-6 full-registry sf1.0 sweep (k=8 over 200k vectors = 2.5e9 pairs
# on 8-way parallelism).  8 is the floor so small corpora keep the historic
# shape (every sf <= 0.1 has n <= 20000 -> k = 8, results unchanged).
SEMANTIC_TARGET_CLUSTER_SIZE = 2500


def auto_cluster_count(n_rows: int, target: int = SEMANTIC_TARGET_CLUSTER_SIZE) -> int:
    """Blocking-cluster count for a corpus of ``n_rows`` embeddings."""
    return max(8, -(-int(n_rows) // target))


# The arrow assignment kernel collects the k-row centroid table to the driver
# each round (k x 64 longs ~ 0.5 KB/row).  That is the deliberate bounded
# collect of the SemDeDup design — but "bounded" stops being true somewhere:
# at k = ceil(n/2500), 250M vectors -> k = 100k (~50 MB, fine); 1B -> k = 400k
# (~200 MB closure shipped to EVERY task each round, not fine).  Past this
# threshold the flat centroid table must become a distributed IVF coarse
# quantizer: train ~sqrt(k) super-centroids, partition centroids by
# super-cell, and assign via two-level lookup (probe the super-cell, then
# argmin inside it) — the same index shape operators/similarity.py already
# builds for sim_ivf_topk.  Guarded here so the failure mode is this error,
# not a driver OOM mid-job (round-7 verdict item 5).
SEMANTIC_MAX_COLLECT_K = 131_072


def _guard_collect_k(k: int) -> None:
    if k > SEMANTIC_MAX_COLLECT_K:
        raise ValueError(
            f"semantic-dedup centroid count k={k} exceeds the driver-collect "
            f"ceiling ({SEMANTIC_MAX_COLLECT_K}): ~{k * 520 // 2**20} MB of "
            "centroids would ship in every task closure each round. At this "
            "corpus size (k = ceil(n/2500) -> n > ~327M vectors) migrate the "
            "flat centroid table to the IVF coarse-quantizer layout: train "
            "~sqrt(k) super-centroids, partitionBy(super_cell) the centroid "
            "table, and assign via two-level probe+argmin (see "
            "operators/similarity.py ivf_index/ivf_topk for the index shape)."
        )


def _cluster_assignments(
    df: DataFrame, vec_col: str, id_col: str, k: int, rounds: int, kernel: str = "expr"
) -> DataFrame:
    """The SemDeDup blocking assignment (id, qv, cluster), computed ONCE and
    localCheckpoint-ed: the pair stage consumes it as BOTH self-join sides
    and the keep stage anti-joins against it — without the checkpoint Spark
    re-runs the whole iterative k-means lineage (quantize shuffle + per-round
    broadcast assign + centroid shuffle) once per consumer, ~4x the work at
    any scale.  Size is n x (64-long array) — distributed, never collected.

    ``kernel="arrow"`` (the oversized-corpus path, same switch as the pair
    kernel) assigns via _assign_arrow: per round the k-row centroid table is
    collected (bounded — k = ceil(n/2500)) and distances vectorize in-task,
    replacing _assign's quadratic n x k crossJoin row stream.  Bit-identical
    results either way."""
    vecs = quantized_vectors(df, vec_col, id_col, center=128)
    if kernel == "arrow":
        _guard_collect_k(k)
        # pin the quantized codes ONCE: the arrow path drives 2+rounds driver
        # collects (seed, per-round centroids) plus the final checkpoint off
        # this frame, and each would otherwise re-run the quantize shuffles
        # from scratch (round-7 advice: 3+ recomputes at rounds=1)
        vecs = vecs.transform(materialize)
        id_t = dict(vecs.dtypes)["id"]
        seed = (
            vecs.orderBy("id").limit(k).select(F.col("id").alias("cid"), F.col("qv").alias("cv"))
        )
        assigned = _assign_arrow(vecs, seed.collect(), id_t)
        for _ in range(rounds):
            assigned = _assign_arrow(vecs, _update(assigned).collect(), id_t)
        return assigned.select("id", "qv", "cluster").transform(materialize)
    centroids = (
        vecs.orderBy("id").limit(k).select(F.col("id").alias("cid"), F.col("qv").alias("cv"))
    )
    assigned = _assign(vecs, centroids)
    for _ in range(rounds):
        centroids = _update(assigned)
        assigned = _assign(vecs, centroids)
    return assigned.select("id", "qv", "cluster").transform(materialize)


def semantic_dedup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    rounds: int = 1,
    tau_num: int = 45,
    tau_den: int = 100,
    kernel: str = "expr",
    gemm_block: int = 4096,
    _assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: k-means topic clusters as the
    blocking key, pairwise cosine ONLY within a cluster (Abbas et al.,
    "SemDeDup", arXiv:2303.09540 — cluster embeddings, then prune
    within-cluster ε-balls).  No reference analog; north-star LLM-pipeline
    layer like operators/dedup.py.

    Everything is integer-exact, so the result is engine-independent and
    hash-checkable: codes are CENTERED int8 (quantized_vectors center=128 —
    same clusters as the raw codes, truer cosines), the near-dup test
    ``cos(a,b) >= tau_num/tau_den`` is decided by cross-multiplied int64
    squares (dot>0 AND dot^2*tau_den^2 >= tau_num^2*|a|^2*|b|^2) — no sqrt,
    no float boundary.  Bounds: dim 64 x 128^2 -> dot <= 2^20, dot^2*den^2
    <= 2^54 — comfortably inside int64 on both engines.

    Scale shape: the cluster id is the blocking key, so pair cost is
    n^2/k spread over k independent tasks — at 100 TB, k grows with the
    corpus (SemDeDup uses ~100k clusters for billions of docs) and the
    cluster id becomes a written partition column, exactly like the LSH
    bucket in operators/dedup.embedding_lsh_dedup_pairs.  ``kernel="expr"``
    (default, registered) is the pure-Catalyst self-join — zero Python;
    ``kernel="arrow"`` is the per-cluster int64 GEMM
    (groupBy(cluster).applyInPandas) for oversized clusters — and because
    the math is INTEGER, the two kernels agree bit-for-bit (asserted in
    tests), unlike the float GEMM where only gap-separated thresholds are
    safe.

    Returns (id_a, id_b, cluster) with id_a < id_b.
    """
    assigned = (
        _assigned
        if _assigned is not None
        else _cluster_assignments(df, vec_col, id_col, k, rounds, kernel=kernel)
    )
    # one cluster-keyed shuffle for the self-pairing; the fold/GEMM below is
    # the only per-pair work
    if kernel == "expr":
        a = assigned.select(F.col("id").alias("id_a"), F.col("qv").alias("qa"), "cluster")
        b = assigned.select(F.col("id").alias("id_b"), F.col("qv").alias("qb"), "cluster")
        dot = _idot(F.col("qa"), F.col("qb"))
        naa = _idot(F.col("qa"), F.col("qa"))
        nbb = _idot(F.col("qb"), F.col("qb"))
        return (
            a.join(b, "cluster")
            .where(F.col("id_a") < F.col("id_b"))
            .where(
                (dot > 0)
                & (dot * dot * F.lit(tau_den * tau_den) >= F.lit(tau_num * tau_num) * naa * nbb)
            )
            .select("id_a", "id_b", "cluster")
        )
    if kernel != "arrow":
        raise ValueError(f"unknown kernel {kernel!r}: 'expr' or 'arrow'")
    import numpy as np
    import pandas as pd

    t2n, t2d = tau_num * tau_num, tau_den * tau_den

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["id"].to_numpy()
        m = np.array(pdf["qv"].tolist(), dtype=np.int64)
        n2 = (m * m).sum(axis=1)
        out_a, out_b = [], []
        for lo in range(0, len(ids), gemm_block):
            hi = min(lo + gemm_block, len(ids))
            d = m[lo:hi] @ m.T  # exact int64 GEMM
            ok = (d > 0) & (d * d * t2d >= t2n * np.outer(n2[lo:hi], n2))
            ia, ib = np.where(ok)
            keep = ids[lo + ia] < ids[ib]
            out_a.append(ids[lo + ia][keep])
            out_b.append(ids[ib][keep])
        empty = np.array([], dtype=np.int64)
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else empty,
                "id_b": np.concatenate(out_b) if out_b else empty,
                "cluster": pdf["cluster"].iloc[0],
            }
        )

    return (
        assigned.select("id", "qv", "cluster")
        .groupBy("cluster")
        .applyInPandas(score, "id_a long, id_b long, cluster long")
    )


def semantic_keep(df: DataFrame, vec_col: str, id_col: str, **kw) -> DataFrame:
    """SemDeDup keep-list: survivors after dropping the LARGER id of every
    within-cluster near-dup pair (deterministic tie-free rule; the kept doc
    is each ε-group's minimum id).  Returns (id, cluster).

    The clustering assignment is computed once (checkpointed) and shared by
    the pair stage and the final anti-join — see _cluster_assignments."""
    assigned = _cluster_assignments(
        df, vec_col, id_col, kw.get("k", 8), kw.get("rounds", 1), kernel=kw.get("kernel", "expr")
    )
    pairs = semantic_dedup_pairs(df, vec_col, id_col, _assigned=assigned, **kw)
    drop = pairs.select(F.col("id_b").alias("id")).distinct()
    return assigned.select("id", "cluster").join(drop, "id", "left_anti")


_SEMANTIC_BASE = """
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
        END - 128 AS q
      FROM ex e JOIN stats s ON e.pos = s.pos
    ),
    seeds AS (SELECT DISTINCT id FROM q ORDER BY id LIMIT {k}),
    c0 AS (SELECT q.id AS cid, q.pos, q.q AS c FROM q JOIN seeds ON q.id = seeds.id),
    d1 AS (
      SELECT q.id, c0.cid, CAST(sum((q.q - c0.c) * (q.q - c0.c)) AS BIGINT) AS d2
      FROM q JOIN c0 ON q.pos = c0.pos GROUP BY q.id, c0.cid
    ),
    a1 AS (SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d1),
    c1 AS (
      SELECT a1.cid AS cl, q.pos, CAST(floor(sum(q.q) * 1.0 / count(*)) AS BIGINT) AS c
      FROM a1 JOIN q ON a1.id = q.id AND a1.rn = 1 GROUP BY a1.cid, q.pos
    ),
    d2s AS (
      SELECT q.id, c1.cl, CAST(sum((q.q - c1.c) * (q.q - c1.c)) AS BIGINT) AS d2
      FROM q JOIN c1 ON q.pos = c1.pos GROUP BY q.id, c1.cl
    ),
    a2 AS (SELECT id, cl, row_number() OVER (PARTITION BY id ORDER BY d2, cl) AS rn FROM d2s),
    asg AS (SELECT id, cl FROM a2 WHERE rn = 1),
    codes AS (SELECT id, list(q ORDER BY pos) AS qv FROM q GROUP BY id),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, aa.cl AS cluster
      FROM asg aa JOIN asg bb ON aa.cl = bb.cl AND aa.id < bb.id
      JOIN codes a ON a.id = aa.id JOIN codes b ON b.id = bb.id
      WHERE CAST(list_inner_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT) > 0
        AND CAST(list_inner_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT)
          * CAST(list_inner_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT)
          * {t2d}
          >= {t2n}
          * CAST(list_inner_product(CAST(a.qv AS DOUBLE[]), CAST(a.qv AS DOUBLE[])) AS BIGINT)
          * CAST(list_inner_product(CAST(b.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT)
    )
"""


def semantic_oracle_sql(
    k: int | str = 8,
    rounds: int = 1,
    tau_num: int = 45,
    tau_den: int = 100,
    src: str = "embeddings",
) -> str:
    """DuckDB twin of semantic_keep (same quantization/centering, seeds,
    floor-means, integer distances and cross-multiplied cosine test).  Every
    list_inner_product here is EXACT: centered-code products <= 2^14, sums
    <= 2^20 — double arithmetic on integers far below 2^53, cast back to
    BIGINT before the (potentially > 2^53) cross-multiplies.

    ``k="auto"`` mirrors auto_cluster_count: the seed LIMIT becomes a scalar
    subquery ceil(n/SEMANTIC_TARGET_CLUSTER_SIZE) floored at 8, so the twin
    stays valid at every scale factor without a baked-in literal."""
    assert rounds == 1, "oracle is written for the registered rounds=1 shape"
    if k == "auto":
        k = (
            "(SELECT greatest(8, CAST(ceil(count(DISTINCT id) / "
            f"{SEMANTIC_TARGET_CLUSTER_SIZE}.0) AS BIGINT)) FROM q)"
        )
    base = _SEMANTIC_BASE.format(src=src, k=k, t2n=tau_num * tau_num, t2d=tau_den * tau_den)
    return (
        base
        + """
    SELECT asg.id, asg.cl AS cluster
    FROM asg
    WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.id_b = asg.id)
    """
    )


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


def kcenter_assign(df: DataFrame, vec_col: str, id_col: str, k: int = 8) -> DataFrame:
    """Greedy K-CENTER (farthest-point traversal, Gonzalez 1985) over int8
    codes — the DIVERSITY coreset selector: each round adds the point
    farthest from every center chosen so far, giving the classic
    2-approximation to the k-center cover.  Training-data use: pick k
    maximally-spread exemplars (dedup-aware seed set, eval-panel
    selection), the opposite selection pressure from
    prototype_prune's density-seeking prototypes.

    Determinism: codes are the exact int8 grid (quantized_vectors), every
    distance is exact integer squared L2, the seed is the lowest id, each
    round's pick maximizes (min-distance-to-centers, then LOWEST id) — a
    total order both engines replay bit-for-bit; the oracle unrolls the k
    rounds as CTEs.

    Scale: the code frame is checkpointed once; each of the k rounds is one
    map-only least() update against a BROADCAST-LITERAL center plus one
    1-row argmax aggregate (k tiny driver fetches, like the IVF centroid
    loads); the final assignment is one broadcast cross join + exact
    struct-min.  Output (id, center_id, d2) for every point."""
    vecs = quantized_vectors(df, vec_col, id_col).transform(materialize)

    def lit_qv(xs):
        return F.array(*[F.lit(int(x)) for x in xs])

    seed = vecs.orderBy("id").limit(1).select("id", "qv").collect()[0]
    centers = [(int(seed["id"]), [int(x) for x in seed["qv"]])]
    cur = vecs.select("id", "qv", _dist2(F.col("qv"), lit_qv(centers[0][1])).alias("mind2"))
    for _ in range(k - 1):
        pick = cur.agg(
            F.max(
                F.struct(
                    F.col("mind2"), (-F.col("id")).alias("nid"), F.col("qv").alias("qv")
                )
            ).alias("p")
        ).collect()[0]["p"]
        cid, cqv = -int(pick["nid"]), [int(x) for x in pick["qv"]]
        centers.append((cid, cqv))
        cur = cur.select(
            "id",
            "qv",
            F.least(F.col("mind2"), _dist2(F.col("qv"), lit_qv(cqv))).alias("mind2"),
        )
    if not all(0 <= cid < (1 << 32) for cid, _ in centers):  # packing domain
        raise ValueError("kcenter_assign: center id outside [0, 2^32) breaks d2*2^32+cid packing")
    cdf = df.sparkSession.createDataFrame(
        [(cid, cqv) for cid, cqv in centers], "cid long, cv array<long>"
    )
    # (d2, cid) pick as a packed-BIGINT min (same order-isomorphism argument
    # as _assign: d2 ≤ 64·256² = 2^22, cid here is a vec id < 2^32 at any
    # realistic corpus since k centers were just collected) — the struct-min
    # form planned SortAggregate over the n×k scored stream (SCALE.md §48).
    scored = vecs.crossJoin(F.broadcast(cdf)).select(
        "id",
        (
            _dist2(F.col("qv"), F.col("cv")) * F.lit(1 << 32).cast("long") + F.col("cid")
        ).alias("packed"),
    )
    return (
        scored.groupBy("id")
        .agg(F.min("packed").alias("packed"))
        .select(
            F.col("id").alias(id_col),
            (F.col("packed") % F.lit(1 << 32).cast("long")).alias("center_id"),
            F.expr(f"packed div {1 << 32}").alias("d2"),
        )
    )


def kcenter_oracle_sql(k: int = 8, src: str = "embeddings") -> str:
    """DuckDB twin of kcenter_assign: the k greedy rounds unrolled as CTEs
    over the identical int8 code grid (same codes as _int8_kmeans_ctes)."""
    parts = [
        f"""raw AS (
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
    cen1 AS (SELECT pos, q AS c FROM q WHERE id = (SELECT min(id) FROM q)),
    ids1 AS (SELECT (SELECT min(id) FROM q) AS cid),
    md1 AS (
      SELECT q.id, CAST(sum((q.q - cen1.c) * (q.q - cen1.c)) AS BIGINT) AS mind2
      FROM q JOIN cen1 USING (pos) GROUP BY q.id
    )"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f"""pick{i} AS (SELECT id FROM md{i - 1} ORDER BY mind2 DESC, id ASC LIMIT 1),
    cen{i} AS (SELECT pos, q AS c FROM q WHERE id = (SELECT id FROM pick{i})),
    nd{i} AS (
      SELECT q.id, CAST(sum((q.q - cen{i}.c) * (q.q - cen{i}.c)) AS BIGINT) AS d2
      FROM q JOIN cen{i} USING (pos) GROUP BY q.id
    ),
    md{i} AS (
      SELECT m.id, least(m.mind2, n.d2) AS mind2
      FROM md{i - 1} m JOIN nd{i} n USING (id)
    )"""
        )
    centers_union = " UNION ALL ".join(
        ["SELECT cid FROM ids1"] + [f"SELECT id AS cid FROM pick{i}" for i in range(2, k + 1)]
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    centers AS ({centers_union}),
    cend AS (SELECT c.cid, q2.pos, q2.q AS c FROM centers c JOIN q q2 ON q2.id = c.cid),
    alld AS (
      SELECT q.id, cend.cid, CAST(sum((q.q - cend.c) * (q.q - cend.c)) AS BIGINT) AS d2
      FROM q JOIN cend ON q.pos = cend.pos
      GROUP BY q.id, cend.cid
    )
    SELECT id AS vec_id, cid AS center_id, d2
    FROM (SELECT id, cid, d2,
                 row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
          FROM alld)
    WHERE rn = 1
    """
    )
