"""Physical-plan sweep over the whole query registry: find every query that
plans a SortAggregate (and whether a Sort node exists anywhere in its plan).

Context (SCALE.md §48, round-8/9): a SortAggregate over a corpus-scale
stream sorts every partition of the stream on the group keys — the plan
class the sf3→sf9 probe measured at 4.70× wall per 3× data before the
minhash fixed-width fix.  A SortAggregate with NO grouping keys (a global
aggregate) requires no child ordering and inserts no sort — benign.  This
tool separates the two: it reports, per query, the SortAggregate count and
the plain-Sort count, so the triage ledger (tests/test_plan_sweep.py
SORT_AGG_ALLOWLIST) can hold "fixed or annotated-bounded" as an assertion.

Usage: python tools/plan_sweep.py [sf_dir] [query ...]   # default sf0.001, all
Prints one JSON line per query with a nonzero finding, then a summary.
"""

from __future__ import annotations

import contextlib
import io
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_healthcare_spark.plans.registry import REGISTRY  # noqa: E402
from etl_healthcare_spark.session import get_spark  # noqa: E402


def plan_counts(spark, name: str, sf_dir: str) -> dict:
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # formatted explain prints each node twice (tree + detail); count the
    # tree occurrences only ("Name (id)"), and note "Sort (" never matches
    # SortAggregate/SortMergeJoin ("Sort" there is not followed by " (").
    return {
        "query": name,
        "sort_agg": len(re.findall(r"SortAggregate \(\d+\)", plan)),
        "sort": len(re.findall(r"(?<![A-Za-z])Sort \(\d+\)", plan)),
        "smj": len(re.findall(r"SortMergeJoin[^(]*\(\d+\)", plan)),
        "cartesian": len(re.findall(r"CartesianProduct[^(]*\(\d+\)", plan)),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]
    names = args or sorted(REGISTRY)
    spark = get_spark()
    findings, errors = [], []
    for name in names:
        try:
            c = plan_counts(spark, name, sf_dir)
        except Exception as e:  # registry fns may eagerly execute; report, move on
            errors.append({"query": name, "err": str(e)[:200]})
            continue
        if c["sort_agg"] or c["cartesian"]:
            findings.append(c)
            print(json.dumps(c), flush=True)
    print(
        json.dumps(
            {
                "swept": len(names),
                "sort_agg_queries": sorted(f["query"] for f in findings if f["sort_agg"]),
                "sorting_sort_agg_queries": sorted(
                    f["query"] for f in findings if f["sort_agg"] and f["sort"]
                ),
                "errors": errors,
            }
        )
    )


if __name__ == "__main__":
    main()
