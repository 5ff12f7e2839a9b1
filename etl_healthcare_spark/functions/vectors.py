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


def quantize_vec(vec: Column, scale: int = 1_000_000) -> Column:
    """``floor(x * scale)`` per element, as BIGINT — the integer grid both
    engines compute bit-identically: float32 -> double is exact, the double
    multiply of a <=24-bit-mantissa value by ``scale`` is exact (needs <=44
    mantissa bits), and ``floor`` is exact.  The basis for sign decisions that
    must agree across engines (see hyperplane_bucket_exact)."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two BIGINT arrays (overflow-free for
    quantize_vec output at dim<=64: |products| <= (scale*|x|)^2 ~ 4e11,
    summed <= ~3e13 << 2^63)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def hyperplane_bucket_exact(vec: Column, planes: list[list[float]], scale: int = 1_000_000) -> Column:
    """Integer-exact random-hyperplane LSH bucket id: one bit per plane =
    sign of the INT64 dot of the quantized vector and quantized plane.

    Unlike ``hyperplane_bucket`` (float sign), the decision here is exact
    integer arithmetic, so a DuckDB oracle and Spark agree on every bucket by
    construction — a float32-vs-float64 inner product can flip the sign of a
    near-orthogonal pair (observed |dot| ~ 4e-7 on testdata), which would
    silently move a vector between buckets in one engine only.  Quantizing to
    a 1e-6 grid perturbs the hyperplane by < 1e-5 relative — irrelevant to
    LSH quality — and buys bit-identical blocking."""
    import math

    qv = quantize_vec(vec, scale)
    bits = []
    for p in planes:
        qp = F.array(*[F.lit(int(math.floor(x * float(scale)))) for x in p])
        bits.append(F.when(int_dot(qv, qp) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


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
