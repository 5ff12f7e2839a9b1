"""HL7v2 field/component access as native column expressions.

Semantics mirror the reference parser ``libs/adapters/hl7/v2.ts``:

* segments separated by CR/LF (v2.ts:15-16), fields by ``|`` (v2.ts:22),
  components by ``^`` (v2.ts:41), repetitions by ``~`` (v2.ts:40).
* HL7 TS -> timestamp (v2.ts:23-31): ``YYYY[MM[DD[HH[MM[SS]]]]]`` with missing
  month/day defaulting to 01 and hour/min/sec to 00.

All helpers are 1-indexed like HL7 field numbering: for a segment line
``OBX|1|NM|...``, field(1) == "OBX"? No — HL7 convention counts the segment id
as field 0 of the split; we expose ``seg_id`` and ``field(n)`` where
``field(n)`` is the n-th pipe-delimited field *after* the segment id, matching
``parts[n]`` in v2.ts (v2.ts:34: ``f[3]`` is PID-3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FIELD_SEP = r"\|"
COMP_SEP = r"\^"
REP_SEP = "~"


def split_segments(message: Column) -> Column:
    """Message text -> array of segment lines (v2.ts:15-16 normalizes CR/LF)."""
    normalized = F.regexp_replace(F.regexp_replace(message, "\r\n", "\n"), "\r", "\n")
    segs = F.split(normalized, "\n")
    return F.filter(segs, lambda s: F.length(F.trim(s)) > 0)


def fields(segment: Column) -> Column:
    """Segment line -> array of fields; element 1 is the segment id (MSH/PID/OBX)."""
    return F.split(segment, FIELD_SEP)


def seg_id(segment: Column) -> Column:
    return F.try_element_at(fields(segment), F.lit(1))


def field(segment: Column, n: int) -> Column:
    """n-th field after the segment id (HL7 numbering, v2.ts ``f[n]``)."""
    return F.try_element_at(fields(segment), F.lit(n + 1))


def component(fld: Column, n: int) -> Column:
    """n-th caret component of a field (1-indexed); null-safe."""
    return F.try_element_at(F.split(fld, COMP_SEP), F.lit(n))


def first_repetition(fld: Column) -> Column:
    return F.try_element_at(F.split(fld, REP_SEP), F.lit(1))


def nonempty(col: Column) -> Column:
    """'' -> NULL so coalesce fallback chains work like `a || b` in TS."""
    return F.nullif(F.trim(col), F.lit(""))


def pid3_patient_id(pid3: Column) -> Column:
    """PID-3 (first repetition): component 1, fallback component 2, fallback
    'unknown' (v2.ts:34-46,74)."""
    rep1 = first_repetition(pid3)
    return F.coalesce(nonempty(component(rep1, 1)), nonempty(component(rep1, 2)), F.lit("unknown"))


def hl7_ts_to_timestamp(ts: Column) -> Column:
    """HL7 TS -> timestamp (v2.ts:23-31).

    Takes the leading digits; pads YYYY->YYYY0101000000 (month/day default 01,
    time parts default 00).  Non-parseable / absent -> NULL (caller decides the
    now() fallback — kept separate for oracle determinism, SURVEY §7.3).
    """
    digits = F.regexp_extract(ts, r"^(\d{4,14})", 1)
    y = F.substring(digits, 1, 4)
    # year 0000 is valid in Spark's proleptic calendar but not representable
    # in Python datetime (or real HL7) — reject it like any other bad date
    ok = (F.length(digits) >= 4) & (y != "0000")
    mo = F.when(F.length(digits) >= 6, F.substring(digits, 5, 2)).otherwise(F.lit("01"))
    d = F.when(F.length(digits) >= 8, F.substring(digits, 7, 2)).otherwise(F.lit("01"))
    hh = F.when(F.length(digits) >= 10, F.substring(digits, 9, 2)).otherwise(F.lit("00"))
    mi = F.when(F.length(digits) >= 12, F.substring(digits, 11, 2)).otherwise(F.lit("00"))
    ss = F.when(F.length(digits) >= 14, F.substring(digits, 13, 2)).otherwise(F.lit("00"))
    stamp = F.concat(y, mo, d, hh, mi, ss)
    return F.when(ok, F.try_to_timestamp(stamp, F.lit("yyyyMMddHHmmss"))).otherwise(F.lit(None).cast("timestamp"))
