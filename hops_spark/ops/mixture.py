"""Training-mixture arithmetic shared by the batch DoReMi query and the
online (streaming) mixture controller.

The DoReMi update (Xie et al. 2023; linearized multiplicative-weights
step, see queries/textops.domain_mixture_doremi) is a pure function of
the per-domain sufficient statistics (n_tokens, nll_sum). Keeping that
function HERE — one derivation consumed by both the batch query and
the foreachBatch stream — is the incremental_dedup/attribution lesson
(round 8/9): stream-equals-batch contracts must be structurally
unbreakable, not re-implemented twice.

Scoring modes:
- the batch query self-scores (its LM is built from the corpus it
  scores — the registered, oracle-replayed face);
- the ONLINE controller scores against a FROZEN reference LM
  (``frozen_scorer``), which is what makes per-domain stats ADDITIVE
  across batches: a frozen scorer assigns every (w1, w2) a fixed
  micro-nat cost, so Σ over batches == one pass over the union.
  Bigrams outside the frozen vocabulary are excluded from BOTH
  n_tokens and nll_sum by contract (DoReMi's proxy model is likewise
  fixed while the mixture updates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hops_spark.ops.litfast import df_from_rows
from hops_spark.ops.lm import (_count_table, addone_scored_counts,
                               doc_bigram_counts)

DRM_MILLI = 1000   # update-factor milli-scaling (keeps 1e6*s in int64)

DOMAIN_STATS_SCHEMA = "source string, n_tokens long, nll_sum long"


def frozen_scorer(ref_docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(w1, w2, nlp_micro): the add-one bigram scorer of a REFERENCE
    corpus snapshot — the SAME ops/lm.addone_scored_counts expression
    the batch scorer uses (shared derivation, never re-implemented) —
    built once, persisted, then held fixed while batches stream in.
    Vocabulary-bounded output (one row per distinct bigram)."""
    per = doc_bigram_counts(ref_docs, id_col, text_col)
    return addone_scored_counts(_count_table(per, id_col))


def self_scored_domain_stats(docs: DataFrame, id_col: str = "doc_id",
                             source_col: str = "source",
                             text_col: str = "text") -> DataFrame:
    """(source, n_tokens, nll_sum) SELF-scored (the LM is the add-one
    bigram scorer of the corpus itself — ops/lm.addone_scored_counts,
    the same shared expression as doc_nll_scores): the batch DoReMi
    face's sufficient statistics.

    Optimization (r12, guide §2.4): the domain label rides THROUGH the
    per-doc bigram count table (functionally dependent on the doc id,
    so the aggregate's cell count is unchanged) and the stats aggregate
    directly by source — the former per-doc aggregate + doc_id→source
    join (one extra shuffle + one extra scan of the doc table) are
    gone. Integer sums regrouped, values identical."""
    per = doc_bigram_counts(docs.select(id_col, source_col, text_col),
                            id_col, text_col,
                            carry=(source_col,)).cache()
    cnt = _count_table(per.drop(source_col), id_col)
    return (per.join(addone_scored_counts(cnt), ["w1", "w2"])
               .groupBy(F.col(source_col).alias("source"))
               .agg(F.sum("n_local").cast("long").alias("n_tokens"),
                    F.sum(F.col("nlp_micro") * F.col("n_local"))
                     .cast("long").alias("nll_sum")))


def frozen_domain_stats(docs: DataFrame, scorer: DataFrame,
                        id_col: str = "doc_id",
                        source_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """(source, n_tokens, nll_sum) under the frozen scorer — the
    ADDITIVE per-domain sufficient statistics (inner join on the frozen
    vocabulary; out-of-vocabulary bigrams excluded from both columns,
    the fixed-proxy contract). One keyed join + one domain-bounded
    aggregate per call."""
    per = doc_bigram_counts(docs.select(id_col, text_col),
                            id_col, text_col)
    scored = per.join(scorer, ["w1", "w2"])
    return (scored.join(docs.select(id_col, source_col), id_col)
                  .groupBy(F.col(source_col).alias("source"))
                  .agg(F.sum("n_local").cast("long").alias("n_tokens"),
                       F.sum(F.col("nlp_micro") * F.col("n_local"))
                        .cast("long").alias("nll_sum")))


def anneal_schedule(mix: DataFrame, steps: int = 4) -> DataFrame:
    """Step-indexed mixture ANNEALING schedule: linear interpolation
    from the optimized mixture (step 0) to uniform (step ``steps``) —
    the curriculum/annealing execution plan between a DoReMi solution
    and the uniform end-state (the 'anneal to uniform late in
    training' recipe, e.g. MiniCPM's WSD data schedule / Blakeney et
    al. 2024 'Does your data spark joy?' end-of-training reweighting).

    Exact integer arithmetic throughout: the step-t raw weight is
        rw(t, d) = (steps - t) · weight_ppm(d) · n_domains
                   + t · 1_000_000
    (multiplying through by n_domains avoids a uniform-share division;
    at t=0 this is ∝ weight_ppm, at t=steps it is constant = uniform),
    then Hamilton largest-remainder normalization PER STEP to exactly
    1e6 ppm — the same apportionment the base mixture uses, partitioned
    by step via one broadcast self-join. (steps+1)·n_domains rows
    total; every frame is domain-bounded, every join broadcasts.

    Input ``mix``: (source, weight_ppm) — collected to the driver (the
    frame is ≤ #domains rows BY CONSTRUCTION, the codebook idiom) and
    the per-step Hamilton apportionment computed in exact Python
    integer arithmetic; the (steps+1)·n_domains schedule returns as
    ONE literal frame. Optimization r12: the former broadcast-join
    chain spent ~15 tiny exchanges on frames that never exceed a few
    dozen rows — pure per-stage overhead locally and at scale alike.
    Every quantity is a non-negative int, so Python ``//``/``%`` agree
    with SQL ``div``/``%`` exactly; the DuckDB oracle CTEs replay the
    identical arithmetic."""
    spark = mix.sparkSession
    rows = mix.select("source", "weight_ppm").collect()
    out: list[dict] = []
    for step in range(steps + 1):
        raw = [(r["source"],
                (steps - step) * int(r["weight_ppm"]) * len(rows)
                + step * 1_000_000) for r in rows]
        out.extend(_hamilton_ppm(raw, extra={"step": step}))
    out.sort(key=lambda r: (r["step"], r["source"]))
    return df_from_rows(spark, out,
                        [("step", "int"), ("source", "string"),
                         ("weight_ppm", "long")])


def _hamilton_ppm(raw: list[tuple[str, int]], extra: dict | None = None
                  ) -> list[dict]:
    """Largest-remainder apportionment of 1e6 ppm over (source, rw)
    pairs — the shared exact-integer rule: base = (1e6·rw) div t,
    leftover k = 1e6 - Σ base goes +1 each to the k largest
    remainders (ties to the lexicographically smaller source). All
    inputs non-negative ints, so // and % match SQL div/% exactly."""
    t = sum(rw for _, rw in raw)
    base = {s: (1_000_000 * rw) // t for s, rw in raw}
    rem = {s: (1_000_000 * rw) % t for s, rw in raw}
    k = 1_000_000 - sum(base.values())
    ahead = {s: sum(1 for s2, _ in raw
                    if rem[s2] > rem[s] or (rem[s2] == rem[s] and s2 < s))
             for s, _ in raw}
    return [dict(**(extra or {}), source=s,
                 weight_ppm=base[s] + (1 if ahead[s] < k else 0))
            for s, _ in raw]


def mixture_from_domain_stats(per: DataFrame) -> DataFrame:
    """(source, n_tokens, nll_tok_micro, excess_micro, w0_ppm,
    weight_ppm): the DoReMi-shaped mixture table from per-domain
    sufficient statistics — clipped excess mean NLL over the corpus
    reference, linearized multiplicative-weights factor, Hamilton
    largest-remainder normalization to EXACTLY 1e6 ppm. Pure integer
    arithmetic; ≤ #domains rows throughout (every join broadcasts).

    The stats frame is collected to the driver (≤ #domains rows BY
    CONSTRUCTION — the codebook idiom; one collect executes the
    corpus-scale lineage exactly once, replacing the former eager
    localCheckpoint) and the clipping / multiplicative-weights /
    Hamilton arithmetic runs in exact Python integers — optimization
    r12: the broadcast-join chain spent ~10 tiny exchanges on
    domain-bounded frames, pure per-stage overhead at every scale.
    All quantities are non-negative ints, so Python ``//``/``%``
    match SQL ``div``/``%`` exactly; the DuckDB CTEs replay the
    identical arithmetic and the oracle hash-verifies every value."""
    spark = per.sparkSession
    stats = [(r["source"], int(r["n_tokens"]), int(r["nll_sum"]))
             for r in per.collect()]
    total_tokens = sum(n for _, n, _ in stats)
    ref_micro = (sum(nll for _, _, nll in stats)
                 // total_tokens) if total_tokens else 0
    rows = []
    for src, n, nll in stats:
        nll_tok = nll // n
        excess = max(nll_tok - ref_micro, 0)
        w0 = (n * 1_000_000) // total_tokens
        sw = w0 * ((1_000_000 + excess) // DRM_MILLI)
        rows.append({"source": src, "n_tokens": n,
                     "nll_tok_micro": nll_tok, "excess_micro": excess,
                     "w0_ppm": w0, "_sw": sw})
    wt = {r["source"]: r["weight_ppm"]
          for r in _hamilton_ppm([(r["source"], r["_sw"]) for r in rows])}
    for r in rows:
        r["weight_ppm"] = wt[r["source"]]
        del r["_sw"]
    rows.sort(key=lambda r: r["source"])
    return df_from_rows(spark, rows,
                        [("source", "string"), ("n_tokens", "long"),
                         ("nll_tok_micro", "long"),
                         ("excess_micro", "long"), ("w0_ppm", "long"),
                         ("weight_ppm", "long")])
