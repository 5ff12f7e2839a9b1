"""Run any registry query by name: show its doc, physical plan, and a result
sample.  The switch-over convenience for reference users:

    python tools/run_query.py q3_latest_observation
    python tools/run_query.py g7c_tpch_q3 --sf /root/testdata/sf0.1 --explain
    python tools/run_query.py --list dedup
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="registry query name")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="scale-factor dir")
    ap.add_argument("--rows", type=int, default=20, help="result rows to show")
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    ap.add_argument("--list", dest="list_filter", metavar="SUBSTR", nargs="?", const="",
                    help="list query names (optionally filtered)")
    args = ap.parse_args()

    from etl_healthcare_spark.plans.registry import REGISTRY

    if args.list_filter is not None:
        for name, qd in REGISTRY.items():
            if args.list_filter in name:
                oracle = "oracle" if qd.sql else "rows-only"
                print(f"{name:32s} [{oracle}] {qd.doc.splitlines()[0][:80]}")
        return 0
    if not args.name:
        ap.error("query name required (or --list)")
    if args.name not in REGISTRY:
        close = [n for n in REGISTRY if args.name in n]
        hint = f"; close matches: {', '.join(close[:5])}" if close else ""
        ap.error(f"unknown query {args.name!r}{hint}")

    from etl_healthcare_spark.session import get_spark

    spark = get_spark("run_query")
    spark.sparkContext.setLogLevel("ERROR")
    qd = REGISTRY[args.name]
    print(f"# {args.name}\n# {qd.doc}\n")
    df = qd.fn(spark, args.sf)
    if args.explain:
        df.explain("formatted")
    df.show(args.rows, truncate=80)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
