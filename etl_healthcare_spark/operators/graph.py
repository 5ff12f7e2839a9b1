"""Iterative graph analytics over candidate-pair edge lists — PageRank in
EXACT integer (ppm) arithmetic (north-star LLM-pipeline layer; companion to
operators/dedup.connected_components, which covers reachability).

Use case: centrality over the near-duplicate graph ranks boilerplate hubs —
documents whose templates echo across the corpus — a curation signal exact
dedup cannot see (a hub may never be byte-identical to its echoes).

Why integer: float PageRank depends on the order per-node contributions are
summed, which differs run-to-run under Spark's shuffle — results would be
engine- AND partitioning-dependent.  With ranks in parts-per-million and the
damping update  rank' = 150000 + (850000 * incoming) // 1000000  every
quantity is an exact int64 and the fixed iteration count makes the result a
pure function of the graph: bit-identical on any engine, any parallelism.

Scale shape: per iteration ONE shuffle — contributions grouped by dst with
map-side combine — plus a broadcast-ready degree table computed once.  The
same loop Spark GraphX/Pregel runs, expressed in DataFrame ops; lineage stays
bounded because the iteration count is a small constant (deep chains would
localCheckpoint per round like connected_components does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000
DAMP_PPM = 850_000  # d = 0.85
BASE_PPM = PPM - DAMP_PPM  # (1 - d)


def pagerank_ppm(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", iters: int = 2) -> DataFrame:
    """(node, rank_ppm) after `iters` damped iterations from a uniform start,
    over the symmetrized edge list.  Every node in >=1 pair participates; the
    degree-normalized contribution uses floor division (exact)."""
    # checkpoint before the symmetrizing union (both branches read the
    # materialized pairs, not the upstream LSH plan) and again after the
    # distinct: every iteration joins edges twice, and without the barrier
    # each round would re-run the whole candidate-pair pipeline
    p = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(eager=True)
    edges = (
        p.union(p.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select(F.col("a").alias("node"), F.lit(PPM).cast("long").alias("rank_ppm"))
    for _ in range(iters):
        contrib = (
            edges.join(deg, "a")
            .join(ranks, edges["a"] == ranks["node"])
            .select(F.col("b"), F.expr("rank_ppm div deg").alias("c"))  # integral div: exact
        )
        incoming = contrib.groupBy("b").agg(F.sum("c").alias("inc"))
        ranks = incoming.select(
            F.col("b").alias("node"),
            (F.lit(BASE_PPM) + F.expr(f"({DAMP_PPM} * inc) div {PPM}")).alias("rank_ppm"),
        )
    return ranks


def pagerank_oracle_sql(pairs_cte: str, iters: int = 2) -> str:
    """DuckDB twin with the iterations unrolled.  `pairs_cte` must define
    pairs(doc_a, doc_b)."""
    assert iters == 2, "oracle is written for the registered iters=2 shape"
    return f"""
    WITH {pairs_cte},
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    deg AS (SELECT a, count(*) AS deg FROM edges GROUP BY a),
    r0 AS (SELECT a AS node, CAST({PPM} AS BIGINT) AS rank_ppm FROM deg),
    c1 AS (
      SELECT e.b, CAST(r0.rank_ppm // deg.deg AS BIGINT) AS c
      FROM edges e JOIN deg ON e.a = deg.a JOIN r0 ON e.a = r0.node
    ),
    r1 AS (
      SELECT b AS node,
             CAST({BASE_PPM} + ({DAMP_PPM} * sum(c)) // {PPM} AS BIGINT) AS rank_ppm
      FROM c1 GROUP BY b
    ),
    c2 AS (
      SELECT e.b, CAST(r1.rank_ppm // deg.deg AS BIGINT) AS c
      FROM edges e JOIN deg ON e.a = deg.a JOIN r1 ON e.a = r1.node
    ),
    r2 AS (
      SELECT b AS node,
             CAST({BASE_PPM} + ({DAMP_PPM} * sum(c)) // {PPM} AS BIGINT) AS rank_ppm
      FROM c2 GROUP BY b
    )
    SELECT node, rank_ppm FROM r2
    """
