"""Compare two per-round bench maps: per-query ratios + geomean.

Usage: python tools/bench_compare.py BENCH_local_sf0.1_r08.json BENCH_local_sf0.1_r09.json [--top N]

Prints the geomean ratio (file2/file1) over common queries, the headline
core-12 totals, and the N biggest movers both ways — the round-over-round
drift diagnosis the r8 verdict asked to mechanize (item 6)."""

from __future__ import annotations

import json
import math
import sys


def load(path: str) -> dict[str, float]:
    d = json.load(open(path))
    q = d.get("queries", d)
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float)) and v > 0}


def main() -> None:
    # parse --top BEFORE collecting positionals so `--top 5 a.json b.json`
    # doesn't load '5' as a bench file (round-9 ADVICE)
    argv = list(sys.argv[1:])
    top = 8
    args: list[str] = []
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok.startswith("--top"):
            if "=" in tok:
                top = int(tok.split("=", 1)[1])
            else:
                top = int(argv[i + 1])
                i += 1
        elif not tok.startswith("--"):
            args.append(tok)
        i += 1
    a, b = load(args[0]), load(args[1])
    common = sorted(set(a) & set(b))
    if not common:
        print("no common queries")
        return
    ratios = {q: b[q] / a[q] for q in common}
    geo = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    print(f"common queries: {len(common)}")
    print(f"geomean ratio (new/old): {geo:.3f}")
    print(f"sum old: {sum(a[q] for q in common):.1f}s  sum new: {sum(b[q] for q in common):.1f}s")
    movers = sorted(ratios.items(), key=lambda kv: kv[1])
    print(f"\nbiggest improvements:")
    for q, r in movers[:top]:
        print(f"  {q:<32} {a[q]:>7.2f}s -> {b[q]:>7.2f}s  ({r:.2f}x)")
    print(f"biggest regressions:")
    for q, r in movers[-top:][::-1]:
        print(f"  {q:<32} {a[q]:>7.2f}s -> {b[q]:>7.2f}s  ({r:.2f}x)")


if __name__ == "__main__":
    main()
