"""Vector math over ArrayType(FloatType) embedding columns (north-star
LLM-pipeline layer, SURVEY §7.1 step 10; no reference analog).

Native `aggregate`/`zip_with` expressions — JVM-side, no Python UDFs — so
similarity scans parallelize across executors and stay inside whole-stage
codegen.  Accumulation is in index order with double precision, matching
DuckDB's list_* functions closely enough that rounded scores agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one bit per plane = sign(dot(vec, p)).

    `planes` are plain Python lists (deterministic, data-derived or seeded by
    the caller) compiled into literal arrays — the comparison stays columnar.
    """
    bits = []
    for p in planes:
        lit_plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot(vec, lit_plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)
