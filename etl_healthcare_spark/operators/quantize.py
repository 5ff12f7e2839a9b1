"""Embedding quantization for similarity search at scale (north-star
capability per BASELINE.json — no reference analog).

Scalar int8 quantization: per-dimension corpus min/max → each float32
component maps to floor((x - mn) * 255 / (mx - mn)) in [0, 255].  This is
the standard memory-4x-reduction step in front of an IVF/LSH index (see
operators/similarity.py): 100 TB of float32 embeddings become 25 TB of
codes plus a 2-row stats table.

Cross-engine determinism: float32 → float64 casts are exact, min/max are
order-independent, and the quantize expression is a fixed parse tree of
IEEE-754 double ops — bit-identical in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dimension_stats(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Per-dimension (pos, mn, mx) over the corpus — one partial-aggregated
    shuffle of ndims groups, independent of corpus size."""
    ex = df.select(F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "x")).withColumn(
        "x", F.col("x").cast("double")
    )
    return ex.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))


def int8_quantize(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, code) with code = comma-joined int8 components in dimension
    order.  The ndims-row stats table is broadcast — the corpus-side pass is
    embarrassingly parallel after one tiny aggregation."""
    ex = df.select(F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "x")).withColumn(
        "x", F.col("x").cast("double")
    )
    stats = dimension_stats(df, vec_col, id_col)
    q = (
        ex.join(F.broadcast(stats), "pos")
        .withColumn(
            "q",
            F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long")).otherwise(
                F.least(
                    F.floor((F.col("x") - F.col("mn")) * F.lit(255.0) / (F.col("mx") - F.col("mn"))),
                    F.lit(255).cast("long"),
                )
            ),
        )
    )
    return q.groupBy(id_col).agg(
        F.count("*").alias("n_dims"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "q"))), lambda s: s["q"].cast("string")
            ),
        ).alias("code"),
    )


def l2_normalize(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Unit-normalize embeddings (cosine becomes plain dot product
    downstream).  Map-only array expressions, no shuffle, no Python.

    Cross-engine bit-exactness: the sum of squares is a LEFT FOLD in array
    order (``F.aggregate`` with 0.0 init == DuckDB ``list_reduce``; 0.0 + x
    is exact), sqrt and each division are single correctly-rounded IEEE ops,
    and the emitted check column quantizes to ppm ints so the oracle
    hash-compares integers, not float formatting."""
    xd = lambda x: x.cast("double")  # noqa: E731
    sumsq = F.aggregate(
        F.transform(F.col(vec_col), lambda x: xd(x) * xd(x)), F.lit(0.0), lambda a, b: a + b
    )
    norm = F.sqrt(sumsq)
    code = F.concat_ws(
        ",",
        F.transform(F.col(vec_col), lambda x: F.floor(xd(x) / norm * F.lit(1000000.0)).cast("string")),
    )
    return df.select(
        F.col(id_col),
        F.size(F.col(vec_col)).alias("n_dims"),
        code.alias("unit_ppm_code"),
    )
