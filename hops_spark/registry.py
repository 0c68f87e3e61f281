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
    # --- never driver-checked (12): the full r10 NEXT_WINDOW_QUEUE
    # additions — every row judge-verified green in the round-10
    # 300/300 gate replica (VERDICT r10) + determinism-checked, green
    # in the local oracle replica at sf0.001 + sf0.01. Driving these
    # re-closes the registry: every ever-registered query driver-green
    # when it lands ---
    "rerank_maxsim", "probe_calibration", "domain_mixture_doremi",
    "mixture_schedule_sample", "top_ngram_filters", "lsh_recall_eval",
    "event_path_mining", "classifier_prf", "word_graph_bfs",
    "negative_sampling_table", "kn_bigram_table", "corpus_data_card",
    # --- RE-PROOFS (r8 lesson — code changed after the last green
    # row): repetition_stats gained the short-doc size guard in r10;
    # doc_perplexity's scorer was factored through
    # ops/lm.addone_scored_counts in r10. Both last green r8. ---
    "repetition_stats", "doc_perplexity",
    # --- aging refresh, last-green-r5 (first 35 of the 47-row r5
    # tier, alphabetically; the remaining 12 head the r12 tier) ---
    "bpe_tokenize_docs", "cdc_chunks", "counting_bloom", "dq_audit",
    "dsir_doc_weights", "dynamic_bloom", "embedding_quantize",
    "fuzzy_match_parts", "grouped_deciles", "grouped_mode",
    "meta_snapshot_diff", "meta_xattr_search", "ngram_novelty",
    "order_lead_times", "q10_returned_items", "q11_important_stock",
    "q12_priority_by_status", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_cnt",
    "q17_small_qty_revenue", "q18_large_orders",
    "q19_disjunctive_filter", "q1_pricing_summary",
    "q20_part_suppliers", "q21_sole_returner", "q22_dormant_customers",
    "q4_order_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "rfm_segments",
    # --- flagship keeper (green r2..r10; stays in-window) ---
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
#  r10 green: 50/50 — full closure of the 288 pre-r10 queries (the 24
#  r9 additions + decontaminate re-proof + 24 last-green-r4 refreshes,
#  exhausting the r4 tier, + keeper).
#  r11 window (above): the 12 r10 additions (never driver-checked) +
#  the repetition_stats/doc_perplexity re-proofs + 35 last-green-r5
#  refreshes (first 35 of the 47-row r5 tier, alphabetically) +
#  keeper = 50.


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
    # round-11 registrations land here as they are verified
    "kn_trigram_arpa",         # interpolated-KN trigram ARPA export
    "response_length_bias",    # RLHF length-bias audit per source
    "preference_pair_overlap",  # within-pair near-dup gate (Jaccard ppm)
    "prompt_group_stats",      # per-prompt response-group reward stats
    "mixture_anneal_schedule",  # DoReMi -> uniform per-step Hamilton
    "kn_trigram_perplexity",   # ARPA-consumer backoff scoring
    "kn_heldout_perplexity",   # CCNet-shaped held-out gating
    "anneal_step_sample",      # executes the annealing curriculum
    "arpa_model_card",         # per-order model summary (ARPA header)
    "preference_margin_deciles",  # reward-margin difficulty curve
)
# Round-12 rotation plan: fill freed slots FIRST with this queue, THEN
# any round-11 REPROVE set (queries whose implementation changed after
# the r11 window froze), THEN the next aging tier — the remaining 12
# last-green-r5 rows (robust_scale_stats, rolling_window_agg,
# sentence_dedup, skew_profile, sls_fifo_replay, supplier_hhi,
# value_histogram, vocab_coverage, weekly_anomaly, winsorized_stats,
# wordcount, zorder_skipping) then last-green-r6 alphabetically, as
# slots allow; keep the keeper.
