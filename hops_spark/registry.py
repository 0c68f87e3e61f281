"""Inventory-query registry.

Every operator from SURVEY.md §2 that we claim as implemented gets a
``QuerySpec``: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) a DuckDB oracle SQL string computing the same
result on the same parquet tables. The driver's correctness gate runs
both sides and hash-compares; column names/aliases MUST match.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None = None          # DuckDB oracle; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None = None, doc: str = "",
             tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register an inventory query."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""),
                                  tags=tuple(tags))
        return fn
    return deco


# Explicit registry order. The driver's correctness gate hash-checks the
# FIRST 50 ``load_all()`` entries per round, so ordering is a coverage
# decision: the north-star surface (dedup, similarity, multimodal, text,
# pipeline, metadata, streaming-window) plus any query lacking a green
# driver row goes first; the TPC-H/join/sort families that already earned
# green rows in round 1 rotate behind. Names not listed keep their
# registration order after the listed ones; listed-but-unregistered names
# are ignored (lets the list name queries added later in the round).
DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    "q1_pricing_summary",                                   # flagship
    # dedup family (north-star)
    "dedup_exact", "minhash_signatures", "minhash_dedup_pairs",
    "ngram_jaccard_pairs", "simhash_signatures", "simhash_near_pairs",
    # similarity / ANN family (north-star)
    "knn_bruteforce", "knn_lsh", "knn_ivf", "embedding_near_dup",
    # text analysis (north-star)
    "doc_quality", "lang_id", "token_counts", "doc_fingerprint",
    # multimodal plumbing (north-star)
    "media_features", "media_frame_sample",
    # composed pipeline + hygiene ops (north-star)
    "pipeline_clean_corpus", "pii_scrub", "decontaminate",
    # metadata engine (§2.11)
    "meta_get_listing", "meta_content_summary", "meta_glob_status",
    "meta_point_lookup", "meta_batched_lookup", "meta_quota_rollup",
    "meta_path_resolve", "meta_block_report", "meta_under_replicated",
    "meta_expired_leases", "meta_subtree_delete",
    # streaming-window batch twins (§2.8)
    "tumbling_window_agg", "sliding_window_agg", "session_window_agg",
    "event_dedup", "late_data_policy", "join_range_events",
    # aggregator family (r1 driver rows: 2 FAIL, 1 crash, 1 no-oracle)
    "value_aggregator_job", "uniq_value_count", "value_histogram",
    "word_stats", "rollup_revenue", "approx_distinct_parts",
    # projection / scan representatives (incl. r1 hash-FAIL json extract)
    "wordcount", "grep", "field_selection", "inverse_map",
    "scan_percent_filter", "json_extract_events",
    # r1 hash-FAIL TPC-H row
    "q12_priority_by_status",
)
# Round-3 rotation candidates (displaced from the 50-window this round):
# set_intersect, set_except, distinct_rows, scan_* tail, chain_map_reduce,
# teragen_sorted, dictionary_encode, hash_surface — all locally green.


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so registrations run; return the registry
    with ``DRIVER_WINDOW_PRIORITY`` names first (driver checks first 50)."""
    import hops_spark.queries  # noqa: F401  (package __init__ imports submodules)
    ordered = {n: QUERIES[n] for n in DRIVER_WINDOW_PRIORITY if n in QUERIES}
    ordered.update({n: s for n, s in QUERIES.items() if n not in ordered})
    return ordered
