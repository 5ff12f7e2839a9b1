"""Repeated-min timing probe for individual registry queries.

The round-10 box shows 0.5-2.5x per-query noise between identical full-bench
runs, so single-shot timings cannot support before/after claims.  This probe
times one query at a time with the bench's exact methodology (same session,
noop sink, clearCache between runs) but takes N warm repeats and reports
min / median — min-of-N damps same-box noise an order of magnitude better
than the bench's min-of-2.

Usage: python tools/probe_time.py [--sf DIR] [--n N] <query ...>
Prints one line per query: name, cold, then min/median of N warm repeats.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_healthcare_spark.plans.registry import REGISTRY  # noqa: E402
from etl_healthcare_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("probe_time")
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py's warmup: codegen + exchange/broadcast machinery + footers
    spark.range(1000).selectExpr("sum(id)").collect()
    a = spark.range(0, 100_000).selectExpr("id", "id % 97 AS k")
    b = spark.range(0, 97).selectExpr("id AS k", "id * 2 AS v")
    a.join(b, "k").groupBy("k").count().write.mode("overwrite").format("noop").save()
    for p in sorted(Path(args.sf).glob("*.parquet")):
        spark.read.parquet(str(p)).count()

    for name in args.queries:
        fn = REGISTRY[name].fn
        times = []
        for i in range(args.n + 1):
            spark.sparkContext.setJobDescription(f"probe:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                jrdd.unpersist(False)
        warm = times[1:]
        print(
            f"{name:32s} cold={times[0]:6.2f}  min={min(warm):6.2f}  "
            f"med={statistics.median(warm):6.2f}  n={len(warm)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
