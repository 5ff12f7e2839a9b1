"""O3/O4: limit clamping + keyset pagination.

Reference: opaque ``nextToken`` = base64(LastEvaluatedKey), resume via
ExclusiveStartKey (services/api-query/src/handler.ts:85,106); limit clamp
1..100 default 25 (handler.ts:65,84).

Keyset (NOT offset) semantics preserved: the token encodes the last row's sort
key and the next page filters ``(sortcols) > token`` — stable under concurrent
writes and O(page) per fetch, which offset pagination is not at 100 TB.  A
stable tiebreaker column is required (SURVEY §7.3); callers pass e.g. obsId.
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clamp_limit(limit: int | None, default: int = 25, lo: int = 1, hi: int = 100) -> int:
    if limit is None:
        limit = default
    return max(lo, min(hi, int(limit)))


def encode_token(values: list) -> str:
    return base64.b64encode(json.dumps(values, default=str).encode()).decode()


def decode_token(token: str) -> list:
    return json.loads(base64.b64decode(token.encode()).decode())


def keyset_page(df: DataFrame, sort_cols: list[str], limit: int, token: str | None = None) -> DataFrame:
    """One page, ascending by sort_cols, resuming strictly after `token`.

    Row-value comparison done as a nested boolean expansion (works on any
    Spark version, pushes down as ordinary predicates).
    """
    if token is not None:
        vals = decode_token(token)
        pred = F.lit(False)
        # (a,b,c) > (x,y,z)  expanded lexicographically
        for i in range(len(sort_cols)):
            eq = F.lit(True)
            for j in range(i):
                eq = eq & (F.col(sort_cols[j]) == F.lit(vals[j]))
            pred = pred | (eq & (F.col(sort_cols[i]) > F.lit(vals[i])))
        df = df.where(pred)
    return df.orderBy(*[F.col(c).asc() for c in sort_cols]).limit(limit)


def next_token_from_rows(rows: list, sort_cols: list[str], limit: int) -> str | None:
    """Token for the next page, or None when the page was short (end)."""
    if len(rows) < limit:
        return None
    last = rows[-1]
    return encode_token([last[c] for c in sort_cols])
