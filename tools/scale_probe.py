"""Super-linear-scaling probe: time named queries at two scale factors.

The sublinear-cost claims for the heaviest composite queries rest on
sf0.1→sf1.0 wall-time ratios (SCALE.md).  This tool extends the evidence one
decade further: run each query to a noop sink (full computation, no
driver-side collect — same discipline as bench.py) at a small and a large
sf dir and report the wall-time ratio next to the data-size ratio.  A query
whose cost is ~linear in input shows ratio ≈ size ratio; a quadratic
blocker shows ratio ≈ size ratio squared.

Usage:
  python tools/scale_probe.py <small_sf_dir> <big_sf_dir> <query ...>

Prints one JSON line per query: {"query", "small_sec", "big_sec", "ratio"},
then a summary table.  Timings are best-of-2 after a compile pass, matching
bench.py's steady-state methodology.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_healthcare_spark.plans.registry import REGISTRY  # noqa: E402
from etl_healthcare_spark.session import get_spark  # noqa: E402


def time_query(spark, name: str, sf_dir: str, measured: int = 2) -> float:
    """Best of ``measured`` steady-state runs after one compile pass.
    SCALE_PROBE_MEASURED=1 halves probe wall time when the RATIO (not the
    absolute best) is the quantity of interest."""
    fn = REGISTRY[name].fn
    best = float("inf")
    for is_measured in (False,) + (True,) * measured:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        elapsed = time.perf_counter() - t0
        if is_measured:
            best = min(best, elapsed)
        spark.catalog.clearCache()
        _release_lingering_blocks(spark)
    return best


def _release_lingering_blocks(spark) -> None:
    """Unpersist RDD-level cached blocks (localCheckpoints) left by the query
    just timed.  catalog.clearCache() only clears CATALOG-cached relations;
    a query's internal localCheckpoint blocks linger until the ContextCleaner
    notices the Python refs died — and at sf9 one query's checkpointed blocks
    (GBs, half pinned by spark.memory.storageFraction) starved the NEXT
    query's unmanaged read-ahead/shuffle buffers into a JVM heap OOM, failing
    a probe at a scale the same query passes in a fresh session.  Production
    pipelines release checkpoints between jobs; so does the probe.

    ALSO force a JVM GC: shuffle files are deleted only when ContextCleaner
    processes the ShuffleDependency's weak reference, which needs a JVM GC
    cycle — Python-side gc.collect() never triggers one, so a multi-query
    sf9 session accumulated 33 GB of dead shuffle files in blockmgr and the
    probe died on disk, twice (round 8).  One System.gc() per timed run
    bounds blockmgr at ~one query's working set."""
    import gc

    gc.collect()  # drop Python-side refs so unpersist is safe and complete
    jmap = spark.sparkContext._jsc.getPersistentRDDs()  # py4j map view
    for jrdd in list(jmap.values()):
        jrdd.unpersist(True)
    spark._jvm.System.gc()  # let ContextCleaner reap dead shuffle files
    time.sleep(1.0)  # cleaner runs async; give it a beat before the next run


# Families whose probe workload is the documents corpus: probe them on the
# HEAPS-LAW vocabulary variant by default (gen_testdata GEN_HEAPS_VOCAB=1,
# conventionally written next to the base dir with an "hv" suffix).  The
# bounded 28-word default vocabulary manufactures super-linear candidate
# density (4.17× LSH pairs at 3× docs, SCALE.md §48) and twice mis-attributed
# workload shape to the engine (dedup_longest_run 2.49×→1.44×, round 7–8);
# oracle FIXTURES keep the bounded vocab for byte-compatibility — only the
# probe harness redirects.  Disable with SCALE_PROBE_HEAPS=0.
HEAPS_FAMILIES = (
    "dedup_", "text_", "link_", "search_", "decontam_", "graph_",
    "mine_", "corpus_", "sketch_source", "curation_", "training_prep",
)


def _heaps_dir(sf_dir: str) -> str:
    """Return the Heaps-vocab sibling of ``sf_dir`` if one exists, completed
    with symlinks for any table the variant doesn't carry (the hv generator
    only rewrites documents.parquet)."""
    hv = sf_dir.rstrip("/") + "hv"
    if not os.path.isdir(hv):
        return sf_dir
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet") and not os.path.exists(os.path.join(hv, f)):
            os.symlink(os.path.join(os.path.abspath(sf_dir), f), os.path.join(hv, f))
    return hv


def main() -> None:
    small_dir, big_dir, *names = sys.argv[1:]
    unknown = [n for n in names if n not in REGISTRY]
    assert not unknown, f"unknown queries: {unknown}"
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen/shuffle machinery once (mirrors bench.py)
    spark.range(1000).selectExpr("sum(id)").collect()

    measured = int(os.environ.get("SCALE_PROBE_MEASURED", "2"))
    assert measured >= 1, "SCALE_PROBE_MEASURED must be >= 1 (0 yields inf ratios)"
    use_heaps = os.environ.get("SCALE_PROBE_HEAPS", "1") != "0"
    rows = []
    for name in names:
        sd, bd = small_dir, big_dir
        if use_heaps and name.startswith(HEAPS_FAMILIES):
            sd, bd = _heaps_dir(small_dir), _heaps_dir(big_dir)
            if sd != small_dir:
                print(f"# {name}: probing Heaps-law corpus ({sd} -> {bd})", flush=True)
        small = time_query(spark, name, sd, measured)
        big = time_query(spark, name, bd, measured)
        row = {
            "query": name,
            "small_sec": round(small, 2),
            "big_sec": round(big, 2),
            "ratio": round(big / small, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(f"\n{'query':<28}{'small':>9}{'big':>9}{'ratio':>7}")
    for r in rows:
        print(f"{r['query']:<28}{r['small_sec']:>9}{r['big_sec']:>9}{r['ratio']:>7}")


if __name__ == "__main__":
    main()
