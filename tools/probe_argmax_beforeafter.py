"""Three-way scale probe for the round-9 latest-per-group rewrites.

Times, at two scale factors, the r8 plan (max_by over struct ordering keys
→ SortAggregate), the first r9 attempt (two-phase hash argmax — max +
join-back; measured SLOWER: the join-back is a full corpus shuffle while
the sort it avoids runs map-side over size-bounded scan partitions), and
the shipped r9 plan (DECIMAL(38,0) lexicographic packing → one
HashAggregate, registry HEAD) for q3_latest_observation and
g6_max_by_latest, so SCALE.md §49 records the whole decision on data
(VERDICT r8 item 1's "done" condition).

Usage: python tools/probe_argmax_beforeafter.py <small_sf_dir> <big_sf_dir>
Prints one JSON line per (query, variant, sf) plus ratio summaries.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from etl_healthcare_spark.datasets import load_table, observations  # noqa: E402
from etl_healthcare_spark.plans.registry import REGISTRY  # noqa: E402
from etl_healthcare_spark.session import get_spark  # noqa: E402


def q3_old(spark, sf_dir):
    """Round-8 q3: max_by(struct(payload), struct(ts, obsId)) — SortAggregate."""
    o = observations(spark, sf_dir).where(F.col("tenantId") == "t1")
    cols = ["tenantId", "patientId", "code", "value", "effectiveDateTime", "obsId"]
    return (
        o.groupBy("tenantId", "patientId", "code")
        .agg(F.max_by(F.struct(*cols), F.struct(F.col("effectiveDateTime"), F.col("obsId"))).alias("r"))
        .select(
            "r.tenantId", "r.patientId", "r.code", "r.value",
            F.unix_micros("r.effectiveDateTime").alias("eff_us"), "r.obsId",
        )
    )


def g6_old(spark, sf_dir):
    """Round-8 g6: max_by with struct ordering — SortAggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", F.struct("ts", "event_id")).alias("last_event_id"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
    )


def q3_joins(spark, sf_dir):
    """Round-9 first attempt: two-phase hash argmax (max + join-back).
    Measured SLOWER than the SortAggregate it replaced (the join-back is a
    full corpus shuffle; the sort it avoids runs map-side over size-bounded
    scan partitions) — kept here as the probe's cautionary variant."""
    from etl_healthcare_spark.operators.argmax import argmax_rows

    o = observations(spark, sf_dir).where(F.col("tenantId") == "t1")
    win = argmax_rows(
        o.select("tenantId", "patientId", "code", "value", "effectiveDateTime", "obsId"),
        ["tenantId", "patientId", "code"],
        ["effectiveDateTime", "obsId"],
    )
    return win.select(
        "tenantId", "patientId", "code", "value",
        F.unix_micros("effectiveDateTime").alias("eff_us"), "obsId",
    )


def g6_joins(spark, sf_dir):
    from etl_healthcare_spark.operators.argmax import argmax_rows

    ev = load_table(spark, sf_dir, "events")
    win = argmax_rows(ev.select("user_id", "ts", "event_id"), ["user_id"], ["ts", "event_id"])
    return win.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.unix_micros("ts").alias("last_ts_us"),
    )


VARIANTS = {
    "q3_latest_observation": {
        "old_sortagg": q3_old,
        "argmax_joins": q3_joins,
        "packed_hash": REGISTRY["q3_latest_observation"].fn,
    },
    "g6_max_by_latest": {
        "old_sortagg": g6_old,
        "argmax_joins": g6_joins,
        "packed_hash": REGISTRY["g6_max_by_latest"].fn,
    },
}


def time_fn(spark, fn, sf_dir: str, measured: int = 2) -> float:
    best = float("inf")
    for is_measured in (False,) + (True,) * measured:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        el = time.perf_counter() - t0
        if is_measured:
            best = min(best, el)
        spark.catalog.clearCache()
    return best


def main() -> None:
    small, big = sys.argv[1], sys.argv[2]
    spark = get_spark()
    out = {}
    for qname, variants in VARIANTS.items():
        for vname, fn in variants.items():
            s = time_fn(spark, fn, small)
            b = time_fn(spark, fn, big)
            out[(qname, vname)] = (s, b)
            print(json.dumps({
                "query": qname, "variant": vname,
                "small_sec": round(s, 2), "big_sec": round(b, 2),
                "ratio": round(b / s, 2),
            }), flush=True)
    for qname in VARIANTS:
        so, bo = out[(qname, "old_sortagg")]
        sn, bn = out[(qname, "packed_hash")]
        print(json.dumps({
            "query": qname,
            "old_ratio": round(bo / so, 2), "packed_ratio": round(bn / sn, 2),
            "big_speedup_packed_over_old": round(bo / bn, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
