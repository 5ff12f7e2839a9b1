"""Round-4 table-maintenance & layout-analytics batch: a small-file
compaction planner (the OPTIMIZE/bin-packing pass), a dictionary/RLE
encoding advisor, a partition-skew Gini audit, and a power-of-two degree
histogram of the customer-order graph.

At 100 TB the table itself becomes the workload: ingest leaves small files
that must be bin-packed into target sizes, column encodings decide the
scan's byte budget, and one skewed partition stalls every shuffle that
keys on it.  The reference delegates all of this to its managed storage
layer (libs/storage wraps puts/gets; nothing plans compaction or audits
skew) — here they are first-class queries over metadata-sized frames, so
every report is a few-KB result no matter the corpus size.  All integer-
exact: byte counts, floor-division bucketing, cross-multiplied ppm ratios,
and floor(log2) taken as length(bin(x))-1 — identical in both engines, no
float ever crosses the boundary.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import _t, register

PPM = 1_000_000

# ---------------------------------------------------------------------------
# small-file compaction planner (bin-packing by cumulative-sum bucketing)
# ---------------------------------------------------------------------------

_ROW_BYTES = 100  # size proxy: bytes per row of the simulated file inventory
_TARGET = 256_000  # compaction target bytes per output file


@register(
    "maint_compaction_plan",
    sql=f"""
    WITH inv AS (
      SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS part,
             l_orderkey % 16 AS file_id,
             count(*) * {_ROW_BYTES} AS size_bytes
      FROM lineitem GROUP BY 1, 2
    ),
    planned AS (
      SELECT part, file_id, size_bytes,
             CAST(coalesce(sum(size_bytes) OVER (
               PARTITION BY part ORDER BY size_bytes DESC, file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
      FROM inv
    ),
    grouped AS (
      SELECT part, file_id, size_bytes,
             cum_before // {_TARGET} AS out_group
      FROM planned
    )
    SELECT part, file_id, CAST(size_bytes AS BIGINT) AS size_bytes,
           CAST(out_group AS BIGINT) AS out_group,
           CAST(sum(size_bytes) OVER (PARTITION BY part, out_group) AS BIGINT)
             AS group_bytes,
           CAST(count(*) OVER (PARTITION BY part, out_group) AS BIGINT)
             AS group_files,
           CASE WHEN count(*) OVER (PARTITION BY part, out_group) > 1
                THEN 'compact' ELSE 'keep' END AS action
    FROM grouped
    """,
    doc="SMALL-FILE COMPACTION PLANNER (the OPTIMIZE pass a 100 TB table "
    "runs nightly): the file inventory is simulated as one file per "
    "(ship-month, orderkey mod 16) with a bytes-per-row size proxy, then "
    "within each partition files are bin-packed into ~256 KB output "
    f"groups by cumulative-sum bucketing (cum_before div {_TARGET} — the "
    "greedy first-fit that needs ONE window, not an iterative packer), "
    "and each file ships with its group totals and a compact/keep "
    "verdict.  Shape: one partial-aggregable groupBy collapses the scan "
    "to the metadata-sized inventory (~1.3k rows at any SF); every window "
    "runs per-partition on that frame.  At a real 100 TB table the "
    "inventory comes from the transaction log, and the plan is the same "
    "O(files) report.  Sibling of layout_compaction (registry_mining), "
    "which packs in TIME order because its hourly micro-files are "
    "unpartitioned and footer min/max must keep pruning timestamps; "
    "here the table IS partitioned by ship-month — the partition column "
    "carries the time pruning, so within a partition the packer is free "
    "to size-balance (tighter output-file variance) instead.",
)
def maint_compaction_plan(spark, sf_dir):
    inv = (
        _t(spark, sf_dir, "lineitem")
        .select(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("long").alias("part"),
            (F.col("l_orderkey") % 16).alias("file_id"),
        )
        .groupBy("part", "file_id")
        .agg((F.count(F.lit(1)) * _ROW_BYTES).alias("size_bytes"))
    )
    wp = (
        W.partitionBy("part")
        .orderBy(F.col("size_bytes").desc(), F.col("file_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    planned = inv.select(
        "part",
        "file_id",
        "size_bytes",
        F.coalesce(F.sum("size_bytes").over(wp), F.lit(0)).cast("long").alias("cum_before"),
    )
    grouped = planned.select(
        "part",
        "file_id",
        "size_bytes",
        F.expr(f"cum_before div {_TARGET}").alias("out_group"),
    )
    wg = W.partitionBy("part", "out_group")
    return grouped.select(
        "part",
        "file_id",
        F.col("size_bytes").cast("long").alias("size_bytes"),
        F.col("out_group").cast("long").alias("out_group"),
        F.sum("size_bytes").over(wg).cast("long").alias("group_bytes"),
        F.count(F.lit(1)).over(wg).cast("long").alias("group_files"),
        F.when(F.count(F.lit(1)).over(wg) > 1, F.lit("compact"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )


# ---------------------------------------------------------------------------
# dictionary / RLE encoding advisor
# ---------------------------------------------------------------------------


@register(
    "maint_encoding_advisor",
    sql=f"""
    WITH stacked AS (
      SELECT 'p_brand' AS col, p_brand AS v FROM part
      UNION ALL SELECT 'p_type', p_type FROM part
      UNION ALL SELECT 'p_name', p_name FROM part
    ),
    vals AS (
      SELECT col, v, count(*) AS c, length(v) AS len
      FROM stacked GROUP BY 1, 2
    ),
    per_col AS (
      SELECT col, sum(c) AS n, count(*) AS ndv,
             sum(c * len) AS plain_bytes, sum(len) AS dict_bytes
      FROM vals GROUP BY 1
    )
    SELECT col, CAST(n AS BIGINT) AS n, CAST(ndv AS BIGINT) AS ndv,
           CAST(length(bin(ndv - 1)) AS BIGINT) AS code_bits,
           CAST(plain_bytes AS BIGINT) AS plain_bytes,
           CAST((n * length(bin(ndv - 1)) + 7) // 8 + dict_bytes AS BIGINT)
             AS dict_bytes_est,
           CAST(plain_bytes * {PPM}
                // ((n * length(bin(ndv - 1)) + 7) // 8 + dict_bytes) AS BIGINT)
             AS ratio_ppm,
           CASE WHEN ndv * 50 <= n THEN 'dictionary' ELSE 'plain' END AS advice
    FROM per_col
    """,
    doc="COLUMN ENCODING ADVISOR (what parquet's writer decides per "
    "rowgroup, surfaced as a table-level report): for three part columns "
    "of very different cardinality profiles, compute exact plain bytes, "
    "the dictionary estimate n*ceil(log2 ndv) bits + dictionary payload, "
    "the compression ratio in exact ppm, and a dictionary/plain verdict.  "
    "ceil(log2 ndv) is taken integer-exactly as length(bin(ndv-1)) — the "
    "binary-string trick both engines evaluate identically, no float "
    "log2.  Shape: the 3-column stack is scanned once, one partial-"
    "aggregable groupBy per (col, value) collapses to vocabulary size, "
    "a second tiny groupBy emits 3 rows.  The report that says which "
    "columns pay for their bytes at 100 TB scan time.",
)
def maint_encoding_advisor(spark, sf_dir):
    stacked = _t(spark, sf_dir, "part").select(
        F.expr("stack(3, 'p_brand', p_brand, 'p_type', p_type, 'p_name', p_name) AS (col, v)")
    )
    vals = (
        stacked.groupBy("col", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("len", F.length("v"))
    )
    per_col = vals.groupBy("col").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("ndv"),
        F.sum(F.col("c") * F.col("len")).alias("plain_bytes"),
        F.sum("len").alias("dict_bytes"),
    )
    bits = "length(bin(ndv - 1))"
    dict_est = f"((n * {bits} + 7) div 8 + dict_bytes)"
    return per_col.select(
        "col",
        F.col("n").cast("long").alias("n"),
        F.col("ndv").cast("long").alias("ndv"),
        F.expr(bits).cast("long").alias("code_bits"),
        F.col("plain_bytes").cast("long").alias("plain_bytes"),
        F.expr(dict_est).cast("long").alias("dict_bytes_est"),
        F.expr(f"plain_bytes * {PPM} div {dict_est}").cast("long").alias("ratio_ppm"),
        F.when(F.col("ndv") * 50 <= F.col("n"), F.lit("dictionary"))
        .otherwise(F.lit("plain"))
        .alias("advice"),
    )


# ---------------------------------------------------------------------------
# partition-skew Gini audit
# ---------------------------------------------------------------------------


@register(
    "maint_partition_gini",
    sql=f"""
    WITH sizes AS (
      SELECT l_suppkey AS key, count(*) AS rows_in_part
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT rows_in_part,
             row_number() OVER (ORDER BY rows_in_part, key) AS i,
             count(*) OVER () AS n,
             sum(rows_in_part) OVER () AS total
      FROM sizes
    ),
    g AS (
      SELECT max(n) AS n, max(total) AS total,
             sum(CAST(i AS HUGEINT) * rows_in_part) AS iws,
             max(rows_in_part) AS max_part,
             min(rows_in_part) AS min_part
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_partitions,
           CAST(total AS BIGINT) AS total_rows,
           CAST(max_part AS BIGINT) AS max_part_rows,
           CAST(min_part AS BIGINT) AS min_part_rows,
           CAST(max_part * n * {PPM} // total AS BIGINT) AS peak_ratio_ppm,
           CAST((2 * iws - CAST(n + 1 AS HUGEINT) * total) * {PPM}
                // (CAST(n AS HUGEINT) * total) AS BIGINT) AS gini_ppm
    FROM g
    """,
    doc="PARTITION-SKEW GINI AUDIT over supplier-keyed row counts: the "
    "exact Gini coefficient of the partition-size distribution — "
    "G = (2*SUM(i*x_i) - (n+1)*SUM(x_i)) / (n*SUM(x_i)) with sizes rank-"
    "ordered — plus the peak-to-mean ratio that directly predicts the "
    "straggler factor of any shuffle keyed on this column (ppm; 1e6 = "
    "perfectly balanced).  Shape: one partial-aggregable groupBy "
    "collapses the scan to the key-cardinality frame; ranking and the "
    "final reduction run on that metadata-sized frame (the same #16 rule "
    "the histogram queries use), HUGEINT/decimal(38) products since "
    "i*x_i sums pass int64 around 10M partitions.  The audit that says "
    "'salt this key' (j9_salted_skew_join is the fix it prescribes).",
)
def maint_partition_gini(spark, sf_dir):
    sizes = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("rows_in_part"))
    )
    wr = W.partitionBy(F.lit(0)).orderBy("rows_in_part", "key")
    wall = W.partitionBy(F.lit(0))
    ranked = sizes.select(
        "rows_in_part",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("rows_in_part").over(wall).alias("total"),
    )
    dec = "decimal(38,0)"
    g = ranked.agg(
        F.max("n").alias("n"),
        F.max("total").alias("total"),
        F.sum(F.col("i").cast(dec) * F.col("rows_in_part")).alias("iws"),
        F.max("rows_in_part").alias("max_part"),
        F.min("rows_in_part").alias("min_part"),
    )
    return g.select(
        F.col("n").cast("long").alias("n_partitions"),
        F.col("total").cast("long").alias("total_rows"),
        F.col("max_part").cast("long").alias("max_part_rows"),
        F.col("min_part").cast("long").alias("min_part_rows"),
        F.expr(f"max_part * n * {PPM} div total").cast("long").alias("peak_ratio_ppm"),
        F.expr(
            f"(2 * iws - CAST(n + 1 AS DECIMAL(38,0)) * total) * {PPM}"
            f" div (CAST(n AS DECIMAL(38,0)) * total)"
        )
        .cast("long")
        .alias("gini_ppm"),
    )


# ---------------------------------------------------------------------------
# power-of-two degree histogram of the customer-order graph
# ---------------------------------------------------------------------------


@register(
    "graph_degree_hist",
    sql="""
    WITH deg AS (
      SELECT o_custkey, count(*) AS degree FROM orders GROUP BY 1
    ),
    b AS (
      SELECT length(bin(degree)) - 1 AS bucket, degree FROM deg
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(1 << bucket AS BIGINT) AS lo_degree,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(degree) AS BIGINT) AS sum_degree,
           CAST(min(degree) AS BIGINT) AS min_degree,
           CAST(max(degree) AS BIGINT) AS max_degree
    FROM b GROUP BY bucket
    """,
    doc="DEGREE DISTRIBUTION of the customer-order bipartite graph in "
    "power-of-two buckets — the first plot anyone makes of a graph, and "
    "the input to every 'is this power-law' question.  floor(log2 degree) "
    "is computed integer-exactly as length(bin(degree))-1 (identical "
    "binary-string semantics in both engines; no float log2 to drift).  "
    "Shape: TWO chained partial-aggregable groupBys — degrees, then "
    "buckets — both map-side combinable; nothing but the final "
    "O(log max_degree) rows leaves the last stage.  Companion to "
    "graph_pagerank/graph_triangles, which read the same shape question "
    "from the similarity graph.",
)
def graph_degree_hist(spark, sf_dir):
    deg = _t(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count(F.lit(1)).alias("degree"))
    b = deg.select(
        (F.length(F.bin("degree")) - 1).cast("long").alias("bucket"), "degree"
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("degree").cast("long").alias("sum_degree"),
            F.min("degree").cast("long").alias("min_degree"),
            F.max("degree").cast("long").alias("max_degree"),
        )
        .select(
            "bucket",
            F.expr("CAST(shiftleft(1L, CAST(bucket AS INT)) AS BIGINT)").alias("lo_degree"),
            "n_nodes",
            "sum_degree",
            "min_degree",
            "max_degree",
        )
    )


# ---------------------------------------------------------------------------
# Pareto skyline (non-dominated frontier)
# ---------------------------------------------------------------------------


@register(
    "g34_pareto_skyline",
    sql="""
    WITH best AS (
      SELECT p_size AS size,
             min(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS best_price_cents,
             count(*) AS n_parts
      FROM part GROUP BY 1
    ),
    r AS (
      SELECT size, best_price_cents, n_parts,
             min(best_price_cents) OVER (
               ORDER BY size DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_above
      FROM best
    )
    SELECT CAST(size AS BIGINT) AS size,
           best_price_cents,
           CAST(n_parts AS BIGINT) AS n_parts
    FROM r
    WHERE best_above IS NULL OR best_price_cents < best_above
    """,
    doc="PARETO SKYLINE (the non-dominated frontier query, Borzsony et al. "
    "ICDE 2001): over parts trading off size (maximize) against retail "
    "price (minimize), a size tier is on the skyline iff no larger tier "
    "is as cheap — the 'show me only offers nothing else beats on both "
    "axes' operator every marketplace/benchmark UI needs.  For a 2-D "
    "skyline the frontier is computable WITHOUT pair domination tests: "
    "collapse to the per-tier best price (one partial-aggregable "
    "groupBy, ~50 rows), then one descending running-min window — a tier "
    "survives iff strictly cheaper than every larger tier (ties lose to "
    "the bigger size, handled by the strict <).  The quadratic dominance "
    "join the textbook shape implies never happens at any scale.",
)
def g34_pareto_skyline(spark, sf_dir):
    best = (
        _t(spark, sf_dir, "part")
        .groupBy(F.col("p_size").alias("size"))
        .agg(
            F.min((F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")).alias(
                "best_price_cents"
            ),
            F.count(F.lit(1)).alias("n_parts"),
        )
    )
    w = (
        W.partitionBy(F.lit(0))
        .orderBy(F.col("size").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    r = best.select(
        "size",
        "best_price_cents",
        "n_parts",
        F.min("best_price_cents").over(w).alias("best_above"),
    )
    return r.where(
        F.col("best_above").isNull() | (F.col("best_price_cents") < F.col("best_above"))
    ).select(F.col("size").cast("long").alias("size"), "best_price_cents", "n_parts")


# ---------------------------------------------------------------------------
# U11: order-insensitive table fingerprint (replica verification)
# ---------------------------------------------------------------------------

_FP_ROW_SQL = (
    "l_orderkey || '|' || l_linenumber || '|' || l_partkey || '|' || l_suppkey"
    " || '|' || CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"
    " || '|' || CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    " || '|' || l_returnflag || '|' || l_linestatus"
    " || '|' || CAST(l_shipdate AS VARCHAR)"
)


@register(
    "u11_table_fingerprint",
    sql=f"""
    WITH h AS (
      SELECT ('0x' || substr(sha256({_FP_ROW_SQL}), 1, 15))::BIGINT AS rh
      FROM lineitem
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(rh AS HUGEINT)) % 2305843009213693951 AS BIGINT)
             AS sum_hash,
           CAST(bit_xor(rh) AS BIGINT) AS xor_hash,
           CAST(min(rh) AS BIGINT) AS min_hash,
           CAST(max(rh) AS BIGINT) AS max_hash
    FROM h
    """,
    doc="U11 ORDER-INSENSITIVE TABLE FINGERPRINT (replica/migration "
    "verification): each row canonicalizes to a '|'-joined string of "
    "normalized columns (cents-cast numerics, ISO date string — never a "
    "raw float, whose formatting is engine-specific), hashes to a 60-bit "
    "sha256 prefix, and the table's identity is the (count, SUM, XOR, "
    "min, max) of those hashes — all order-insensitive and partial-"
    "aggregable, so two 100 TB replicas compare by exchanging ONE row "
    "each, no sort, no row shipping (the rsync-style content check for "
    "tables).  SUM (mod the Mersenne prime 2^61-1, so it stays a BIGINT at any row count) catches what XOR misses (an even number of identical "
    "corruptions XORs away) and vice versa; min/max localize which "
    "extreme changed.  Shape: map-only hash fused into the scan, one "
    "partial aggregate out.",
)
def u11_table_fingerprint(spark, sf_dir):
    row = (
        "CAST(l_orderkey AS STRING) || '|' || CAST(l_linenumber AS STRING)"
        " || '|' || CAST(l_partkey AS STRING) || '|' || CAST(l_suppkey AS STRING)"
        " || '|' || CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS STRING)"
        " || '|' || CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS STRING)"
        " || '|' || l_returnflag || '|' || l_linestatus"
        " || '|' || CAST(l_shipdate AS STRING)"
    )
    h = _t(spark, sf_dir, "lineitem").select(
        F.expr(f"CAST(conv(substring(sha2({row}, 256), 1, 15), 16, 10) AS BIGINT)").alias("rh")
    )
    return h.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(F.col("rh").cast("decimal(38,0)")) % F.lit(2305843009213693951))
        .cast("long")
        .alias("sum_hash"),
        F.expr("bit_xor(rh)").cast("long").alias("xor_hash"),
        F.min("rh").alias("min_hash"),
        F.max("rh").alias("max_hash"),
    )


# ---------------------------------------------------------------------------
# G35: hierarchical share-of-parent rollup (region > nation)
# ---------------------------------------------------------------------------


@register(
    "g35_share_of_parent",
    sql="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS cents,
             count(*) AS n_orders
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(cents AS BIGINT) AS revenue_cents,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(CAST(cents AS HUGEINT) * 1000000
                // CAST(sum(cents) OVER (PARTITION BY region) AS HUGEINT)
                AS BIGINT) AS share_of_region_ppm,
           CAST(CAST(sum(cents) OVER (PARTITION BY region) AS HUGEINT) * 1000000
                // CAST(sum(cents) OVER () AS HUGEINT)
                AS BIGINT) AS region_share_of_total_ppm
    FROM rev
    """,
    doc="G35 HIERARCHICAL SHARE-OF-PARENT rollup (the BI drill-down view "
    "g8_rollup's subtotal grid does not give you): revenue per (region, "
    "nation) with each nation's exact ppm share of its region and each "
    "region's share of the world — the two ratios every revenue dashboard "
    "draws as nested bars.  Shape: orders joins three BROADCAST dims "
    "(customer at TPC-H scale rides the star-join machinery j6 "
    "plan-tests), ONE partial-aggregable groupBy collapses to the <=50-"
    "row (region, nation) frame, and both share windows run on that "
    "frame with HUGEINT cross-multiplication.  At 100 TB the fact scan "
    "dominates and the hierarchy arithmetic stays metadata-sized.",
)
def g35_share_of_parent(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(cents).alias("cents"), F.count(F.lit(1)).alias("n_orders"))
    )
    wreg = W.partitionBy("region")
    wall = W.partitionBy(F.lit(0))
    dec = "decimal(38,0)"
    w = rev.select(
        "region",
        "nation",
        "cents",
        "n_orders",
        F.sum("cents").over(wreg).cast(dec).alias("reg_total"),
        F.sum("cents").over(wall).cast(dec).alias("all_total"),
    )
    return w.select(
        "region",
        "nation",
        F.col("cents").cast("long").alias("revenue_cents"),
        "n_orders",
        F.expr("CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 div reg_total AS BIGINT)").alias(
            "share_of_region_ppm"
        ),
        F.expr("CAST(reg_total * 1000000 div all_total AS BIGINT)").alias(
            "region_share_of_total_ppm"
        ),
    )
