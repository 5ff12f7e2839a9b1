"""SortAggregate triage ledger (round-9; SCALE.md §48, VERDICT r8 items 1–2).

A SortAggregate over a corpus-scale stream sorts every partition of that
stream on the group keys — the plan class the sf3→sf9 probe measured at
4.70× wall per 3× data before the minhash fixed-width fix.  The round-8
engine-wide plan sweep (tools/plan_sweep.py) found 17 queries planning one;
round 9 fixed every corpus-stream case (two-phase hash argmax, packed-BIGINT
/ DECIMAL(38,0) order-isomorphic encodings, long hash slices, distinct-first
string picks) and this test holds the end state: a query may plan a
SortAggregate ONLY if it appears below with a reason proving the aggregated
stream is bounded (or the node provably inserts no sort).  Any regression —
a fixed query re-degrading, or an allowlisted reason becoming stale — fails
here, not on the cluster.
"""

import io
import contextlib
import re

from etl_healthcare_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"

# every query the round-8 sweep flagged (SCALE.md §48)
SWEPT = [
    "q3_latest_observation",
    "g6_max_by_latest",
    "g19_ohlc_bars",
    "p4_hl7_obx_dto",
    "o5_newest_partition",
    "profile_table",
    "j7_fuzzy_match_join",
    "sketch_source_similarity",
    "g25_weighted_median",
    "link_survivorship",
    "sample_kcenter",
    "ts_m4_downsample",
    "cluster_kmeans",
    "sim_knn_blocked",
    "sim_pq_topk",
    "stat_ks_two_sample",
    "u7_cdc_apply",
]

# name -> reason the remaining SortAggregate is NOT a corpus sort
SORT_AGG_ALLOWLIST = {
    "profile_table": (
        "global string-min/max fold: no grouping keys, so SortAggregate's "
        "required child ordering is empty and NO Sort node exists "
        "(asserted in test_plans.test_profile_table_never_sorts); input is "
        "a 2-column pruned scan folded per partition"
    ),
    "o5_newest_partition": (
        "aggregates the partition-prefix LISTING (one row per audit "
        "partition directory, registry_gates.py) — bounded by partition "
        "count, never event volume"
    ),
    "stat_ks_two_sample": (
        "global D-statistic fold with no grouping keys (no Sort child) "
        "over the two cohorts' DISTINCT-value frames, already collapsed by "
        "hash aggregates upstream"
    ),
    "link_survivorship": (
        "two bounded residuals by construction (operators/linkage.py): the "
        "longest-text pick sorts only the argmax-tied frame (≈1 row per "
        "cluster after the hash max-length join-back) and the lang min "
        "sorts the DISTINCT (cluster, lang) frame — the corpus-stream "
        "aggregate itself is the hash branch"
    ),
}


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_sort_aggregate_triage_ledger(spark):
    still_flagged = {}
    for name in SWEPT:
        plan = _plan(spark, name)
        n = len(re.findall(r"SortAggregate \(\d+\)", plan))
        if n:
            still_flagged[name] = n
    assert set(still_flagged) == set(SORT_AGG_ALLOWLIST), (
        "SortAggregate ledger drift: "
        f"unexpected={sorted(set(still_flagged) - set(SORT_AGG_ALLOWLIST))} "
        f"fixed-but-still-listed={sorted(set(SORT_AGG_ALLOWLIST) - set(still_flagged))} — "
        "a corpus-stream SortAggregate is the measured 4.7×-per-3×-data plan "
        "class; fix it (argmax/packing recipes) or prove the stream bounded "
        "and extend SORT_AGG_ALLOWLIST"
    )


def test_allowlisted_global_folds_insert_no_sort(spark):
    """The two global-fold entries must stay sort-free: a grouping key added
    to either would silently reintroduce the corpus sort."""
    for name in ("profile_table", "stat_ks_two_sample"):
        plan = _plan(spark, name)
        # profile_table additionally pins zero Sort nodes anywhere in
        # test_plans; for stat_ks the windows legitimately sort bounded
        # distinct-value frames, so the invariant here is that no
        # SortAggregate is fed directly by a Sort in the tree rendering
        tree = plan.split("\n\n")[0].splitlines()
        for i, line in enumerate(tree):
            if "SortAggregate" in line and i + 1 < len(tree):
                nxt = tree[i + 1]
                assert not re.search(r"(?<![A-Za-z])Sort \(", nxt), (
                    f"{name}: SortAggregate is fed by a Sort — the global "
                    "fold gained grouping keys"
                )
