"""Regenerate QUERIES.md — the full registry index (name, check kind, doc).

    python tools/gen_query_index.py
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    from etl_healthcare_spark.plans.registry import DRIVER_WINDOW, REGISTRY

    window = set(DRIVER_WINDOW)
    lines = [
        "# Query index",
        "",
        "Auto-generated from `plans/registry.py` (`python tools/gen_query_index.py`).",
        "Every query is a `(spark, sf_dir) -> DataFrame` callable exposed through",
        "`__spark_entry__.queries()`; *oracle* entries carry a DuckDB SQL twin",
        "hash-compared by `tools/check.py`, *rows-only* entries are",
        "side-effecting or approximate by construction.  The first "
        f"{len(DRIVER_WINDOW)} entries form the curated driver window "
        "(one oracle-backed representative per operator family).",
        "",
        "| # | Query | Check | Description |",
        "|---|---|---|---|",
    ]
    for i, (name, qd) in enumerate(REGISTRY.items(), 1):
        kind = "oracle" if qd.sql else "rows-only"
        if name in window:
            kind += " · window"
        doc = " ".join(qd.doc.split())
        lines.append(f"| {i} | `{name}` | {kind} | {doc} |")
    lines.append("")
    (ROOT / "QUERIES.md").write_text("\n".join(lines))
    print(f"wrote QUERIES.md: {len(REGISTRY)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
