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

    Input ``mix``: (source, weight_ppm) — localCheckpointed on entry
    (domain-bounded, multi-consumer lineage: the note-109 rule)."""
    mix = mix.select("source", "weight_ppm").localCheckpoint(eager=True)
    nd = mix.agg(F.count("*").cast("long").alias("n_dom"))
    raw = (mix.crossJoin(F.broadcast(nd))
              .select("source",
                      F.explode(F.sequence(F.lit(0), F.lit(steps)))
                       .alias("step"),
                      "weight_ppm", "n_dom")
              .select("step", "source",
                      ((F.lit(steps) - F.col("step"))
                       * F.col("weight_ppm") * F.col("n_dom")
                       + F.col("step") * F.lit(1_000_000))
                      .cast("long").alias("rw")))
    tt = raw.groupBy("step").agg(F.sum("rw").cast("long").alias("t"))
    base = (raw.join(F.broadcast(tt), "step")
               .select("step", "source",
                       F.expr("(1000000 * rw) div t").alias("base_n"),
                       F.expr("(1000000 * rw) % t").alias("rem")))
    lo = base.groupBy("step").agg(
        (F.lit(1_000_000) - F.sum("base_n")).cast("long").alias("k"))
    other = base.select(F.col("step").alias("o_step"),
                        F.col("source").alias("o_source"),
                        F.col("rem").alias("o_rem"))
    ranked = (base.join(F.broadcast(other),
                        (F.col("o_step") == F.col("step"))
                        & ((F.col("o_rem") > F.col("rem"))
                           | ((F.col("o_rem") == F.col("rem"))
                              & (F.col("o_source") < F.col("source")))),
                        "left")
                  .groupBy("step", "source", "base_n")
                  .agg(F.count("o_source").alias("r")))
    return (ranked.join(F.broadcast(lo), "step")
                  .select(F.col("step").cast("int").alias("step"),
                          "source",
                          (F.col("base_n")
                           + F.when(F.col("r") < F.col("k"), 1)
                              .otherwise(0))
                          .cast("long").alias("weight_ppm"))
                  .orderBy("step", "source"))


def mixture_from_domain_stats(per: DataFrame) -> DataFrame:
    """(source, n_tokens, nll_tok_micro, excess_micro, w0_ppm,
    weight_ppm): the DoReMi-shaped mixture table from per-domain
    sufficient statistics — clipped excess mean NLL over the corpus
    reference, linearized multiplicative-weights factor, Hamilton
    largest-remainder normalization to EXACTLY 1e6 ppm. Pure integer
    arithmetic; ≤ #domains rows throughout (every join broadcasts).

    The input frame is materialized once (eager localCheckpoint): it
    is domain-bounded but six downstream consumers re-derive its
    lineage otherwise (measured 47 s -> 3 s at sf0.1, SCALE.md 109)."""
    per = per.localCheckpoint(eager=True)
    ref = per.agg(
        F.expr("CAST(sum(nll_sum) div sum(n_tokens) AS BIGINT)")
         .alias("ref_micro"),
        F.sum("n_tokens").cast("long").alias("total_tokens"))
    m = (per.crossJoin(F.broadcast(ref))
            .select("source", "n_tokens",
                    F.expr("nll_sum div n_tokens").alias("nll_tok_micro"),
                    F.expr("greatest(nll_sum div n_tokens - ref_micro, 0)")
                     .alias("excess_micro"),
                    F.expr("(n_tokens * 1000000) div total_tokens")
                     .alias("w0_ppm")))
    s = m.withColumn(
        "sw", F.expr(f"w0_ppm * ((1000000 + excess_micro) div {DRM_MILLI})"))
    ts = s.agg(F.sum("sw").cast("long").alias("t"))
    base = (s.crossJoin(F.broadcast(ts))
             .select("source", "n_tokens", "nll_tok_micro", "excess_micro",
                     "w0_ppm",
                     F.expr("(1000000 * sw) div t").alias("base_n"),
                     F.expr("(1000000 * sw) % t").alias("rem")))
    leftover = base.agg((F.lit(1_000_000) - F.sum("base_n"))
                        .cast("long").alias("k"))
    other = base.select(F.col("source").alias("o_source"),
                        F.col("rem").alias("o_rem"))
    ranked = (base.join(F.broadcast(other),
                        (F.col("o_rem") > F.col("rem"))
                        | ((F.col("o_rem") == F.col("rem"))
                           & (F.col("o_source") < F.col("source"))),
                        "left")
                  .groupBy("source", "n_tokens", "nll_tok_micro",
                           "excess_micro", "w0_ppm", "base_n")
                  .agg(F.count("o_source").alias("r")))
    return (ranked.crossJoin(F.broadcast(leftover))
                  .select("source", "n_tokens",
                          F.col("nll_tok_micro").cast("long")
                           .alias("nll_tok_micro"),
                          F.col("excess_micro").cast("long")
                           .alias("excess_micro"),
                          F.col("w0_ppm").cast("long").alias("w0_ppm"),
                          (F.col("base_n")
                           + F.when(F.col("r") < F.col("k"), 1).otherwise(0))
                          .cast("long").alias("weight_ppm"))
                  .orderBy("source"))
