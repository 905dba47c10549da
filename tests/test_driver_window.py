"""Pin the driver-correctness window (first 50 ``queries()`` entries).

The driver's per-round gate checks only the first 50 entries of
``__spark_entry__.queries()``.  Round 4 lost nine intended probes to an
off-by-9 miscount (VERDICT r4, "What's wrong" #1); this test makes the
window membership executable: every windowed query must (a) never have
been driver-checked in a recorded ``CORRECTNESS_r0*.json`` prior to this
round, and (b) have an ``oracle_sql()`` entry so the driver runs the full
rows+schema+hash comparison, and the window must contain the exact
priority set from VERDICT r4 items 1 and 4.
"""

import glob
import json
import os
import re

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.abspath(entry.__file__))

# Rounds whose correctness files existed when the round-5 window was laid
# down.  Round 5's own CORRECTNESS file (and any later round's) will list
# exactly the windowed queries, so it must not disqualify them here.
PRIOR_ROUNDS = ("r01", "r02", "r03", "r04")

ORPHANED_SOLE_PROBES = {
    # VERDICT r4 item 1: sole driver probes of nine distinct families
    "grid_kmeans", "knn_pagerank", "pq_topk", "contamination_scan_ac",
    "pack_sequences", "mixture_plan", "traj_simplify", "doc_repetition",
    "source_caps",
}
PUSHED_OUT_R4 = {
    # r4 "new this round" entries at positions 50-58, never checked
    "adaptive_assign", "local_moran", "partition_bounds", "knn_graph",
    "zonal_overlay", "caption_pairs", "keyword_extents",
    "road_coverage_gaps", "hotspot_regions",
}
JUDGE_NAMED = {
    # VERDICT r4 item 4: least-evidenced, named explicitly
    "events_stream_sliding", "events_stream_interval_join",
    "events_stream_stays", "heavy_hitters_stream", "pip_rings",
    "media_dedup", "span_chunks", "span_chunks_inline",
    "span_chunks_stream",
}


def _prior_checked() -> set[str]:
    checked: set[str] = set()
    for r in PRIOR_ROUNDS:
        path = os.path.join(REPO, f"CORRECTNESS_{r}.json")
        if os.path.exists(path):
            with open(path) as f:
                checked |= set(json.load(f))
    return checked


def test_window_is_never_driver_checked():
    window = list(entry.queries())[:50]
    assert len(set(window)) == 50
    stale = set(window) & _prior_checked()
    assert not stale, f"windowed queries already driver-checked: {sorted(stale)}"


def test_window_contains_priority_sets():
    window = set(list(entry.queries())[:50])
    for group in (ORPHANED_SOLE_PROBES, PUSHED_OUT_R4, JUDGE_NAMED):
        missing = group - window
        assert not missing, f"priority queries outside the window: {sorted(missing)}"


def test_window_queries_all_have_full_oracles():
    window = list(entry.queries())[:50]
    oracles = entry.oracle_sql()
    missing = [q for q in window if q not in oracles]
    assert not missing, f"windowed queries without oracle_sql: {missing}"


def test_all_queries_have_oracles():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(oracles)


def test_coverage_md_window_table_current():
    """COVERAGE.md's driver-window table (VERDICT r4 item 8) must list every
    query with its driver-green round ('r5w' marks the current window)."""
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        text = f.read()
    m = re.search(r"## Driver-window history\n(.*?)(?:\n## |\Z)", text, re.S)
    assert m, "COVERAGE.md lacks a '## Driver-window history' section"
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", m.group(1), re.M))
    qs = set(entry.queries())
    assert listed == qs, (
        f"missing: {sorted(qs - listed)[:10]} extra: {sorted(listed - qs)[:10]}"
    )
