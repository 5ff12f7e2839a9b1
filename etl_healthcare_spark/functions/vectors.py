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


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """Fixed-dimension dot product as an UNROLLED sum of indexed products.

    ``zip_with``/``aggregate`` are CodegenFallback expressions — Spark
    evaluates them INTERPRETED, ~20x slower than generated code, which is
    fatal when the dot sits in a join condition evaluated per candidate pair
    (10^8 pairs at corpus scale — measured as multi-minute stragglers at
    sf1.0).  Indexed element_at products compile through whole-stage codegen.
    The sum associates left-to-right exactly like the 0.0-seeded fold
    ((0+x0)+x1)+... == (x0+x1)+... since 0.0+x0 is exact — bit-identical
    results, so oracle hashes are unchanged."""
    terms = [
        F.element_at(a, i + 1).cast("double") * F.element_at(b, i + 1).cast("double")
        for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


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


def int_dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """int_dot UNROLLED for a known dimension: sum of ``a[i] * b[i]`` over
    explicit getItem terms.  Arithmetically identical to int_dot (integer
    addition is associative; a short row yields NULL on both paths), but the
    expression is plain codegen-able arithmetic instead of an INTERPRETED
    higher-order fold — on 64-dim pair scans the fold was ~the entire task
    time (zip_with/aggregate run expression-interpreted per element).  Use
    whenever the dimension is known at plan time; int_dot remains the
    dimension-agnostic fallback."""
    from functools import reduce

    terms = [a.getItem(i) * b.getItem(i) for i in range(dim)]
    return reduce(lambda x, y: x + y, terms, F.lit(0).cast("long"))
