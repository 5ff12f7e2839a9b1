"""Order-isomorphic (timestamp, payload) packing into one DECIMAL(38,0) atom.

The latest/first/last family (q3/g6 latest-per-group, M4 first/last, G19
OHLC open/close) runs as ONE HashAggregate by packing the ordering pair
into ``us * K + payload`` with ``payload`` guarded into ``[0, K)`` — a
fixed-width, UnsafeRow-mutable buffer, so min/max partial-aggregate with
map-side combine instead of falling back to SortAggregate (SCALE.md §48).

The packing itself is order-isomorphic for ANY int64 ``us`` — including
negative (pre-1970) microsecond timestamps — because the payload term is
non-negative and strictly below the multiplier.  The DECODE however must
use floor-division / positive-modulus: Spark's ``div``/``%`` (and DuckDB's
``//``/``%`` — verified to share truncate-toward-zero semantics) truncate,
so a negative packed value decodes to an off-by-one timestamp and a
garbage payload (round-9 ADVICE).  ``unpack_hi``/``unpack_lo`` below decode
with ``pmod`` + exact division, which round-trips negative timestamps:

    packed = -10^19 + 5   (us = -1, id = 5)
    truncating:  hi = 0,  lo = -9999999999999999995   (WRONG)
    pmod/exact:  hi = -1, lo = 5                      (right)

Callers' oracle twins either derive the same result via row_number windows
(no packing to decode) or — g19 — decode with the same positive-modulus
arithmetic ``((x % K) + K) % K`` so both engines agree on all inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def unpack_lo(packed_col: str, k: int) -> Column:
    """The payload term of ``us*K + payload`` as BIGINT — exact for negative
    timestamps (positive modulus, unlike the sign-of-dividend ``%``).
    Callers that offset the payload (M4/G19's ``value + OFF``) subtract the
    offset afterwards."""
    return F.expr(f"CAST(pmod({packed_col}, {k}) AS BIGINT)")


def unpack_hi(packed_col: str, k: int) -> Column:
    """The timestamp term of ``us*K + payload`` as BIGINT — floor semantics
    via (packed - pmod) / K, an exact decimal division, so pre-1970
    (negative) timestamps decode to their true value instead of the
    truncating ``div``'s off-by-one."""
    return F.expr(
        f"CAST(({packed_col} - pmod({packed_col}, {k})) / {k} AS BIGINT)"
    )
