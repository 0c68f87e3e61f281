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
    # --- never driver-checked (9): the full r12 NEXT_WINDOW_QUEUE —
    # every row green in the local 319/319 oracle replica at
    # sf0.001 + sf0.01 (OPTIMIZATION_r12.md end-of-round gate).
    # Driving these re-closes the registry ---
    "pairwise_winrate", "bradley_terry_strengths", "annotator_agreement",
    "tokenizer_compression", "best_of_n_curve", "bt_calibration",
    "matryoshka_recall", "adaptive_prefix_rerank", "pass_at_k",
    # --- RE-PROOF (VERDICT r12 "Next round #1"): the 13
    # optimized-in-r12 queries whose code changed AFTER their last
    # driver-green row (the r12 window rotation missed them) ---
    "hybrid_rrf_retrieval", "classifier_prf", "nb_lang_classifier",
    "domain_mixture_doremi", "mixture_schedule_sample",
    "linear_probe_eval", "linear_probe_train", "semantic_dedup",
    "knn_recall", "knn_multiprobe", "knn_gemm", "pq_encode",
    "pq_adc_topk",
    # --- RE-PROOF (r13 optimization targets — VERDICT r12 items 3-7;
    # in-window so any accepted plan change this round is
    # driver-verified immediately) ---
    "soft_dedup_weights", "maxsim_retrieval", "top_ngram_filters",
    "exact_substring_spans", "span_excised_corpus",
    # --- aging refresh, last-green-r6 (the final 19 rows of the r6
    # tier, alphabetically; nb_lang_classifier is above) ---
    "meta_content_summary", "meta_expired_leases", "meta_get_listing",
    "meta_glob_status", "meta_path_resolve", "meta_point_lookup",
    "meta_quota_rollup", "meta_subtree_delete", "meta_under_replicated",
    "minhash_signatures", "ngram_jaccard_pairs", "pii_scrub",
    "pipeline_clean_corpus", "retouched_bloom", "simhash_near_pairs",
    "simhash_signatures", "sliding_window_agg", "token_counts",
    "tumbling_window_agg",
    # --- aging refresh, last-green-r7 (first 3 of the 47-row r7
    # tier, alphabetically; the rest head the r14 tier) ---
    "approx_quantiles_check", "audience_jaccard_matrix",
    "bloom_semi_join",
    # --- flagship keeper (green r2..r12; stays in-window) ---
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
#  r11 green: 50/50 — full closure of the 300 pre-r11 queries (the 12
#  r10 additions + repetition_stats/doc_perplexity re-proofs + 35
#  last-green-r5 refreshes + keeper).
#  r12 green: 50/50 — the 10 r11 additions (never driver-checked) +
#  the probe_calibration re-proof (bin-formula change) + the final 12
#  last-green-r5 rows (r5 tier exhausted) + 26 last-green-r6 rows
#  (first 26 of 46, alphabetically) + keeper.
#  r13 window (above): the 9 r12 additions (never driver-checked) +
#  the 13 r12-optimized re-proofs (VERDICT r12 gate item) + 5 r13
#  optimization-target re-proofs + the final 19 last-green-r6 rows
#  (r6 tier exhausted) + first 3 last-green-r7 rows + keeper = 50.


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
    # round 13 is an optimization round: no new registrations.
)
# Round-14 rotation plan: fill freed slots FIRST with this queue, THEN
# any round-13 REPROVE set (queries whose implementation changed after
# the r13 window froze), THEN the next aging tier — the remaining 44
# last-green-r7 rows (bm25_topk onward, alphabetically) then
# last-green-r8 alphabetically, as slots allow; keep the keeper.
