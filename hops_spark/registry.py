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
    # --- never driver-checked (24): the full r9 NEXT_WINDOW_QUEUE —
    # every row judge-verified green in the round-9 288/288 gate
    # replica (VERDICT r9) and green in the local oracle replica at
    # sf0.001 + sf0.01. Driving these re-closes the registry:
    # every ever-registered query driver-green when it lands ---
    "decontaminate_exact_spans", "pi_bbp", "soft_dedup_weights",
    "cluster_safe_split", "decontaminate_attribution",
    "wordpiece_tokenize", "kn_doc_perplexity", "word_pmi",
    "attribution_credit", "label_propagation", "dau_wau_stickiness",
    "tokenizer_fertility", "scan_xml_stream", "corpus_delta",
    "hard_negatives", "padding_waste", "interval_overlap_events",
    "maxsim_retrieval", "neyman_allocation", "cross_source_dup_matrix",
    "ab_test_welch", "neyman_sample", "minhash_bbit", "mp_recall_curve",
    # --- RE-PROOF (r8 lesson): decontaminate's contamination_flags was
    # factored through contamination_flags_from_shingles in r9 (pure
    # refactor for the streaming twin); its r6 driver row predates the
    # change, so it takes a slot this rotation ---
    "decontaminate",
    # --- aging refresh, last-green-r4 (the remaining 24 of the 48-row
    # r4 tier, alphabetically — this rotation EXHAUSTS the r4 tier) ---
    "meta_time_travel", "numeric_corr_matrix", "numeric_histogram",
    "pack_sequences", "pagerank_words", "pi_qmc",
    "pivot_status_by_flag", "q2_min_cost_supplier",
    "q3_shipping_priority", "ranking_windows", "resample_gap_fill",
    "revenue_by_nation", "salted_join_skew", "scd2_history",
    "secondary_sort", "sentence_split", "set_union_distinct",
    "shard_shuffle", "table_profile", "top_customers",
    "top_k_per_group", "total_order_sort", "triangle_count",
    "zorder_layout",
    # --- flagship keeper (green r2..r9; stays in-window) ---
    "minhash_dedup_pairs",
)
# Cumulative hard-verification ledger (driver CORRECTNESS files):
#  r1 green: TPC-H q1..q22, join/sort/setop/scan core
#  r2 green: dedup/similarity/text/multimodal/pipeline/metadata/streaming
#  r3..r7 green: 50/50 each round except r7's avro_evolution hash-red
#  (decimal representation, value-correct — fixed r8).
#  r8 green: 50/50 — full closure of the 240 pre-r8 queries.
#  r9 green: 50/50 — full closure of the 264 pre-r9 queries (every
#  ever-registered query driver-green at least once).
#  r10 window (above): the 24 r9 additions (never driver-checked) +
#  the decontaminate re-proof + 24 last-green-r4 refreshes (exhausting
#  the r4 tier) + keeper = 50.


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so registrations run; return the registry
    with ``DRIVER_WINDOW_PRIORITY`` names first (driver checks first 50)."""
    import hops_spark.queries  # noqa: F401  (package __init__ imports submodules)
    ordered = {n: QUERIES[n] for n in DRIVER_WINDOW_PRIORITY if n in QUERIES}
    ordered.update({n: s for n, s in QUERIES.items() if n not in ordered})
    return ordered
# Queries registered AFTER this round's rotation was fixed — they pass
# the local oracle replica and take window slots FIRST next rotation
# (the window guard test enforces that overflow never-green queries are
# exactly this queue).
NEXT_WINDOW_QUEUE: tuple[str, ...] = (
    # round-10 registrations land here as they are verified
    "rerank_maxsim",          # BM25-shortlist → MaxSim rerank cascade
    "probe_calibration",      # reliability bins for the linear probe
    "domain_mixture_doremi",  # excess-loss multiplicative reweighting
    "mixture_schedule_sample",  # executes the DoReMi design per domain
    "top_ngram_filters",      # Gopher top-n-gram char concentration
    "lsh_recall_eval",        # sampled exact-truth recall of the LSH path
    "event_path_mining",      # top event-type 3-gram behavioral paths
    "classifier_prf",         # per-class P/R/F1 ppm of the NB gate
    "word_graph_bfs",         # BFS hop distances on the co-occur graph
    "negative_sampling_table",  # unigram^(3/4) word2vec neg-sample dist
    "kn_bigram_table",        # exportable KN bigram model (ARPA role)
    "corpus_data_card",       # Datasheets-style corpus summary block
    # RE-PROOF (the r8 lesson — changed code after its last green row):
    # repetition_stats gained the short-doc size guard in r10
    # (sequence(1,0)-descending fix; value-identical on >= 2-word docs,
    # crash -> defined on shorter) — its green row predates the change,
    # so it takes a slot next rotation.
    "repetition_stats",
    # RE-PROOF: doc_perplexity's scorer was factored through
    # ops/lm.addone_scored_counts in r10 (pure refactor shared with the
    # frozen-scorer face; local gate green) — its green row predates
    # the change. kn_doc_perplexity (same-session kn_scored_counts
    # refactor) sits IN the r10 window, so its row certifies directly.
    "doc_perplexity",
)
# Round-11 rotation plan: fill freed slots FIRST with this queue, THEN
# any round-10 REPROVE set (queries whose implementation changed after
# the r10 window froze), THEN the next aging tier — last-green-r5 —
# alphabetically, as slots allow; keep the keeper.
