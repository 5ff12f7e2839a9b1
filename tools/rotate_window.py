"""Propose the next DRIVER_WINDOW rotation.

The external harness confirms only the first 50 registry entries per round
(CORRECTNESS_r{N}.json), so external evidence accumulates one window at a
time.  Policy (SCALE.md §38 era):

* 14 slots are PINNED — each is the sole oracle-backed representative of a
  family `tests/test_plans.py::test_driver_window_spans_every_family…`
  requires inside the window.
* the remaining 36 slots rotate, preferring queries that have NEVER appeared
  in any round's CORRECTNESS file, while keeping every probed family
  represented.

Usage: python tools/rotate_window.py
Prints the proposed 50-name window (pinned first) plus the remaining
never-confirmed backlog, so the next round's edit to
`plans/registry.py:DRIVER_WINDOW` is a paste, not archaeology.
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_healthcare_spark.plans.registry import DRIVER_WINDOW, REGISTRY  # noqa: E402

REPO_ROOT = Path(__file__).resolve().parents[1]

# sole oracle-backed member of a family the plan suite requires in-window
PINNED = [
    "q2_observations_by_patient",
    "g1_minute_counters",
    "g7_tpch_q1",
    "j6_star_join",
    "w3_moving_avg",
    "set_ops",
    "o2_topk",
    "p1_csv_to_dto",
    "v2_dto_validation",
    "u1_idempotent_merge",
    "g10_pivot",
    "sq_subqueries",
    "scalar_functions",
    "cluster_kmeans",
]

# family probes the plan test asserts (beyond those satisfied by PINNED)
ROTATING_FAMILY_PROBES = [
    "curation_",
    "anomaly_",
    "sketch_",
    "search_",
    "stream_",
    "mm_",
    "dedup_",
    "sim_",
    "text_",
    "sample_",
    "eval_",
    "maint_",
    "privacy_",
]

# prefixes whose never-confirmed members jump the registration-order queue
# (round-5 verdict: TPC-H tail, stateful streams, io round trips, profilers
# and layout advisors carry the most un-evidenced semantic surface)
PRIORITY_PREFIXES = [
    "g7",
    "stream_",
    "io_",
    "profile_",
    "layout_",
]


def _priority_rank(name: str) -> int:
    for i, p in enumerate(PRIORITY_PREFIXES):
        if name.startswith(p):
            return i
    return len(PRIORITY_PREFIXES)


# Names the JUDGE independently oracle-audited (tools/check.py runs listed in
# each round's VERDICT.md, recovered from git history: r4 da60eb5, r5 f864697,
# r6 8ed883a — 20+25+32, all green).  They carry external confirmation the
# CORRECTNESS files don't record, so the rotation treats them as seen; without
# this the window wastes slots re-proving what the judge already proved
# (round-6 window proposal re-picked anomaly_seasonal/io_csv_roundtrip/
# profile_benford etc.).
JUDGE_AUDITED = {
    # round 4
    "g7u_tpch_q21", "graph_pagerank", "stream_sessionize", "text_bpe_train",
    "sample_kcenter", "j12_pit_scd2", "privacy_l_diversity", "u11_time_travel",
    "mm_zip_central_dir", "sql_running_total", "graph_label_propagation",
    "w7_interpolate", "g16_retention_cohorts", "io_schema_evolution",
    "u6_scd2_intervals", "link_survivorship", "text_pii_redact",
    "seq_markov_stationary", "g25_weighted_median", "stat_mann_whitney",
    # round 5
    "g7j_tpch_q2", "g7s_tpch_q17", "g7v_tpch_q22", "g8b_cube",
    "j7_fuzzy_match_join", "j11_bucketed_join", "layout_dpp_join",
    "graph_kcore", "ml_winsorize_agg", "ml_target_encoding",
    "stat_ks_two_sample", "stat_bootstrap_ci", "eval_threshold_f1",
    "eval_pinball_loss", "profile_candidate_keys", "profile_json_types",
    "seq_attribution_linear", "text_vocab_growth", "text_pmi_bigrams",
    "sample_neyman_alloc", "sketch_source_similarity", "u10_delete_propagation",
    "u11_table_fingerprint", "mm_avi_info", "stream_m4_windowed",
    # round 6
    "u7_cdc_apply", "io_csv_roundtrip", "dedup_semantic", "dedup_containment",
    "dedup_longest_run", "decontam_bloom", "sim_pq_topk", "mm_mp4_boxes",
    "g31_heavy_hitters", "layout_zonemap_prune", "profile_benford",
    "eval_cohens_kappa", "graph_bfs_hops", "text_bpe_apply",
    "text_classifier_score", "sim_multiprobe", "g34_pareto_skyline",
    "ts_delta_attribution", "g13_sliding_window", "u5_incremental_agg",
    "sample_weighted", "g20_sliding_distinct", "anomaly_seasonal",
    "j10_spatial_pairs", "w8_ewma", "g15_funnel", "v1_envelope_gate",
    "v3_fhir_gate", "p8_format_routing", "u3_commit_log",
    "o5_newest_partition", "sketch_join_size",
}


def confirmed_names(repo_root: Path) -> set[str]:
    """Names with at least one GREEN external confirmation.

    A name only counts as confirmed when its harness entry passed outright
    (rows/schema/hash all true, no error).  A name whose only entries are
    red stays in the fresh backlog so it rotates back into the window and
    gets re-checked externally after the fix — counting it as "seen" would
    bury the failure and overstate the COVERAGE ledger.
    """
    seen: set[str] = set()
    for f in glob.glob(str(repo_root / "CORRECTNESS_r*.json")):
        for name, entry in json.load(open(f)).items():
            if (
                entry.get("rows_match")
                and entry.get("schema_match")
                and entry.get("hash_match")
                and entry.get("err") is None
            ):
                seen.add(name)
    return seen


def propose(repo_root: Path | None = None) -> tuple[list[str], list[str]]:
    """Return (window, backlog): a 50-name window satisfying the plan-suite
    invariants, and the never-confirmed names that did not fit this round."""
    root = repo_root or REPO_ROOT
    seen = confirmed_names(root) | JUDGE_AUDITED
    # treat the current window as about-to-be-confirmed: a rotation proposal
    # is for NEXT round, after the harness has run on today's window
    seen |= set(DRIVER_WINDOW)
    fresh = [n for n in REGISTRY if n not in seen and REGISTRY[n].sql is not None]
    # stable sort: priority families first, registration order within a tier
    fresh.sort(key=_priority_rank)

    window = list(PINNED)
    # first, cover every rotating family probe with a fresh name if one
    # exists, else fall back to the youngest already-confirmed member
    for probe in ROTATING_FAMILY_PROBES:
        if any(n.startswith(probe) for n in window):
            continue
        pool = [n for n in fresh if n.startswith(probe)] or [
            n for n in REGISTRY if n.startswith(probe) and REGISTRY[n].sql is not None
        ]
        if pool:
            window.append(pool[0])
    # then fill remaining slots with fresh names (priority tiers first)
    for n in fresh:
        if len(window) >= 50:
            break
        if n not in window:
            window.append(n)
    # if the backlog ran dry, pad with the oldest-confirmed names (re-verify)
    if len(window) < 50:
        for n in REGISTRY:
            if len(window) >= 50:
                break
            if n not in window and REGISTRY[n].sql is not None:
                window.append(n)
    backlog = [n for n in fresh if n not in window]
    return window, backlog


def main() -> None:
    window, backlog = propose()
    print(f"# proposed next DRIVER_WINDOW ({len(window)} names, pinned first)")
    for n in window:
        print(f'    "{n}",')
    print(f"# never-confirmed backlog after this rotation: {len(backlog)}")
    for n in backlog:
        print(f"#   {n}")


if __name__ == "__main__":
    main()
