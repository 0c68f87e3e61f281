"""Guards for the driver's 50-query correctness window.

Round-4 policy: the window is a ROTATION. CORRECTNESS_r01..r03 give
cumulative driver-green rows; the invariants are (1) every query
WITHOUT a driver-green row sits inside the first 50, and (2) every
remaining slot is spent deliberately — on a flagship keeper, a
re-proof of a query whose implementation changed this round, or an
aging r1-only-green row being refreshed (oldest greens first).
"""

from __future__ import annotations

import json
import os

from hops_spark.registry import (DRIVER_WINDOW_PRIORITY, NEXT_WINDOW_QUEUE,
                                 load_all)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Flagship queries that stay in-window every round regardless of history.
KEEPER_CORE = {"minhash_dedup_pairs"}

# Queries whose implementation materially changed this round — their
# old green rows no longer certify the current code (registry.py ledger).
# Round 13 (VERDICT r12 "Next round #1"): the 13 r12-optimized queries
# whose code changed after their last driver-green row, plus the 5
# r13 optimization targets (VERDICT items 3-7) whose plans may change
# this round. Add here anything changed AFTER the r13 window freezes
# (the r8 lesson: the final commit is the danger window).
REPROVE: set[str] = {
    "hybrid_rrf_retrieval", "classifier_prf", "nb_lang_classifier",
    "domain_mixture_doremi", "mixture_schedule_sample",
    "linear_probe_eval", "linear_probe_train", "semantic_dedup",
    "knn_recall", "knn_multiprobe", "knn_gemm", "pq_encode",
    "pq_adc_topk",
    "soft_dedup_weights", "maxsim_retrieval", "top_ngram_filters",
    "exact_substring_spans", "span_excised_corpus",
}


def _green_rounds() -> dict[str, set[int]]:
    out: dict[str, set[int]] = {}
    for rnd in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12):  # r14 rotation:
        # extend to 13 with the new window (update range + REPROVE)
        path = os.path.join(_REPO, f"CORRECTNESS_r{rnd:02d}.json")
        if os.path.exists(path):
            with open(path) as f:
                rows = json.load(f)
            for k, v in rows.items():
                if v.get("hash_match"):
                    out.setdefault(k, set()).add(rnd)
    return out


def test_every_never_green_query_is_in_window_or_queued():
    """A never-driver-green query is either in the current window or
    explicitly queued (NEXT_WINDOW_QUEUE) for the next rotation —
    nothing unverified may fall through the cracks silently."""
    names = list(load_all())
    window = set(names[:50])
    green = set(_green_rounds())
    missing = [n for n in names
               if n not in green and n not in window
               and n not in NEXT_WINDOW_QUEUE]
    assert not missing, f"never-green queries neither in window nor queued: {missing}"
    unknown = [n for n in NEXT_WINDOW_QUEUE if n not in names]
    assert not unknown, f"queue names unregistered queries: {unknown}"


def test_no_window_slot_wasted():
    """Every slot holds a never-green query, a keeper, a changed-code
    re-proof, or an aging green row being refreshed (oldest greens
    first: last-green round <= 7 as of the r13 rotation — the final 19
    r6-tier rows plus the first 3 of the 47-row r7 tier,
    alphabetically)."""
    green = _green_rounds()
    wasted = [n for n in list(load_all())[:50]
              if n in green
              and n not in KEEPER_CORE
              and n not in REPROVE
              and max(green[n]) > 7]
    assert not wasted, f"window slots wasted: {wasted}"


def test_keeper_core_inside_window():
    window = set(list(load_all())[:50])
    missing = KEEPER_CORE - window
    assert not missing, f"flagship keepers outside window: {missing}"


def test_priority_names_all_registered():
    specs = load_all()
    unknown = [n for n in DRIVER_WINDOW_PRIORITY if n not in specs]
    assert not unknown, f"priority list names unregistered queries: {unknown}"


def test_priority_list_is_exactly_the_window():
    assert len(DRIVER_WINDOW_PRIORITY) == 50
    assert len(set(DRIVER_WINDOW_PRIORITY)) == 50


def test_every_query_has_oracle():
    # r2 invariant: zero rows-only entries (approx ops are self-verifying).
    null_sql = [n for n, s in load_all().items() if s.sql is None]
    assert null_sql == []
