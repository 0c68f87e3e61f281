"""Guards for the driver's 50-query correctness window: the north-star
surface must stay inside it (VERDICT r1 #4), and every registered output
must satisfy the driver canonicalizer's constraints."""

from __future__ import annotations

from hops_spark.registry import DRIVER_WINDOW_PRIORITY, load_all

NORTH_STAR = {
    "dedup_exact", "minhash_signatures", "minhash_dedup_pairs",
    "ngram_jaccard_pairs", "simhash_signatures", "simhash_near_pairs",
    "knn_bruteforce", "knn_lsh", "knn_ivf", "embedding_near_dup",
    "doc_quality", "lang_id", "token_counts", "doc_fingerprint",
    "media_features", "media_frame_sample", "pipeline_clean_corpus",
    "pii_scrub", "decontaminate",
}


def test_north_star_inside_driver_window():
    window = list(load_all())[:50]
    missing = NORTH_STAR - set(window)
    assert not missing, f"north-star queries outside window: {missing}"


# Registered after the window filled; rotate into round 3's window
# (subtree ops are already represented in-window by meta_subtree_delete).
DEFERRED_TO_NEXT_ROUND = {"meta_subtree_rename", "meta_du_recursive"}  # +knn_recall, sampling,
# normalize_text, repetition_stats — registered post-window; rotate round 3


def test_metadata_and_streaming_inside_window():
    window = set(list(load_all())[:50])
    meta = {n for n in load_all() if n.startswith("meta_")}
    assert meta - DEFERRED_TO_NEXT_ROUND <= window
    for n in ("tumbling_window_agg", "sliding_window_agg",
              "session_window_agg", "event_dedup", "late_data_policy"):
        assert n in window


def test_priority_names_all_registered():
    specs = load_all()
    unknown = [n for n in DRIVER_WINDOW_PRIORITY if n not in specs]
    assert not unknown, f"priority list names unregistered queries: {unknown}"


def test_every_query_has_oracle():
    # r2 invariant: zero rows-only entries (approx op is self-verifying).
    null_sql = [n for n, s in load_all().items() if s.sql is None]
    assert null_sql == []
