"""Preference/instruction-data operators — the RLHF-era data card.

A preference dataset is rows of (prompt, chosen response, rejected
response) plus a per-response reward. The reference has no such table;
the public shape comes from Stiennon et al. 2020 (learning to
summarize from human feedback), Bai et al. 2022 (HH-RLHF), and
Touvron et al. 2023 (Llama 2 §3.1, which documents both the
response-length bias audit and preference-set deduplication). The
testdata carries only ``documents``, so the pair view is DERIVED
deterministically: adjacent documents (2k, 2k+1) form pair k, the
higher quality-score response is "chosen" (tie -> lower doc_id), and
the reward is the exact-integer ``quality_score_ppm`` the corpus
pipeline already computes (ops/text.quality_score — one shared
derivation, the same discipline as the decontamination split views).

Scale posture (100 TB): the pair assembly is ONE self-join keyed on
doc_id (a real preference table skips it entirely — these operators
take any frame with the pair columns); every audit below it is a keyed
aggregate bounded by #sources or #pairs. The within-pair overlap is a
per-row array expression — no join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hops_spark.ops.text import PPM, quality_score, words

NEAR_DUP_PPM = 600_000   # within-pair Jaccard flag threshold


def scored_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, source, text, n_words, quality_score_ppm) — the reward
    column every preference operator reads (shared with doc_quality)."""
    return quality_score(docs).select(
        "doc_id", "source", "text",
        F.col("n_words").cast("long").alias("n_words"),
        "quality_score_ppm")


def preference_pairs(scored: DataFrame) -> DataFrame:
    """Pair view over a scored corpus: docs (2k, 2k+1) form pair k;
    chosen = higher quality_score_ppm, tie -> lower doc_id (the even
    doc). One keyed self-join on doc_id; pair source = the even doc's.

    Output: (pair_id, source, chosen_id, rejected_id, chosen_score,
    rejected_score, chosen_words, rejected_words, chosen_text,
    rejected_text)."""
    a = scored.filter(F.col("doc_id") % 2 == 0).select(
        # integer div, not float /: float division is only exact below
        # 2^53 and the DuckDB oracle's // is integer throughout
        F.expr("doc_id div 2").cast("long").alias("pair_id"),
        "source",
        F.col("doc_id").alias("a_id"), F.col("text").alias("a_text"),
        F.col("n_words").alias("a_words"),
        F.col("quality_score_ppm").alias("a_score"))
    b = scored.filter(F.col("doc_id") % 2 == 1).select(
        F.expr("(doc_id - 1) div 2").cast("long").alias("pair_id"),
        F.col("doc_id").alias("b_id"), F.col("text").alias("b_text"),
        F.col("n_words").alias("b_words"),
        F.col("quality_score_ppm").alias("b_score"))
    j = a.join(b, "pair_id")
    a_wins = F.col("a_score") >= F.col("b_score")   # tie -> even doc
    pick = (lambda ac, bc: F.when(a_wins, F.col(ac))
            .otherwise(F.col(bc)))
    anti = (lambda ac, bc: F.when(a_wins, F.col(bc))
            .otherwise(F.col(ac)))
    return j.select(
        "pair_id", "source",
        pick("a_id", "b_id").alias("chosen_id"),
        anti("a_id", "b_id").alias("rejected_id"),
        pick("a_score", "b_score").alias("chosen_score"),
        anti("a_score", "b_score").alias("rejected_score"),
        pick("a_words", "b_words").alias("chosen_words"),
        anti("a_words", "b_words").alias("rejected_words"),
        pick("a_text", "b_text").alias("chosen_text"),
        anti("a_text", "b_text").alias("rejected_text"))


def length_bias_audit(pairs: DataFrame) -> DataFrame:
    """Per-source response-length-bias audit (the Llama 2 §3.1 /
    Singhal et al. 2023 'length correlations in RLHF' check): does
    "chosen" systematically mean "longer"? Emits per source:

        n_pairs, n_chosen_longer, n_ties, chosen_longer_ppm
        (longer-rate over strict-length pairs), the raw word-delta sum
        (kept UNDIVIDED: it can be negative, and trunc-div (Spark)
        vs floor-div (DuckDB) diverge on negatives — the one ratio
        family this module never emits) and mean reward margin
        (margin >= 0 by construction, so its div is engine-safe).

    One #sources-bounded keyed aggregate."""
    g = pairs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum((F.col("chosen_words") > F.col("rejected_words"))
              .cast("long")).cast("long").alias("n_chosen_longer"),
        F.sum((F.col("chosen_words") == F.col("rejected_words"))
              .cast("long")).cast("long").alias("n_len_ties"),
        F.sum(F.col("chosen_words") - F.col("rejected_words"))
         .cast("long").alias("word_delta_sum"),
        F.sum(F.col("chosen_score") - F.col("rejected_score"))
         .cast("long").alias("margin_sum"))
    return g.select(
        "source", "n_pairs", "n_chosen_longer", "n_len_ties",
        # longer-rate over pairs with a strict length difference
        F.expr(f"CASE WHEN n_pairs = n_len_ties THEN 0 ELSE "
               f"(n_chosen_longer * {PPM}) div (n_pairs - n_len_ties) "
               f"END").cast("long").alias("chosen_longer_ppm"),
        F.col("word_delta_sum").cast("long").alias("word_delta_sum"),
        F.expr("margin_sum div n_pairs").cast("long")
         .alias("mean_margin_ppm"))


def pair_overlap(pairs: DataFrame) -> DataFrame:
    """Within-pair chosen/rejected distinct-word Jaccard in ppm plus a
    near-duplicate flag — the preference-set dedup gate (a pair whose
    two responses are near-identical carries no preference signal;
    Llama 2 §3.1 dedups exactly these). Pure per-row array arithmetic
    (array_intersect/array_union of the two word sets) — no join, no
    shuffle beyond the pair view itself."""
    cw = F.array_distinct(words("chosen_text"))
    rw = F.array_distinct(words("rejected_text"))
    sized = pairs.select(
        "pair_id", "source", "chosen_id", "rejected_id",
        F.size(F.array_intersect(cw, rw)).cast("long").alias("_i"),
        F.size(F.array_union(cw, rw)).cast("long").alias("_u"))
    return (sized.select(
                "pair_id", "source", "chosen_id", "rejected_id",
                F.expr(f"CASE WHEN _u > 0 THEN (_i * {PPM}) div _u "
                       "ELSE 0 END").cast("long").alias("jaccard_ppm"))
            .withColumn("near_dup",
                        (F.col("jaccard_ppm") >= NEAR_DUP_PPM)
                        .cast("int")))


def prompt_group_stats(scored: DataFrame, group_size: int = 4) -> DataFrame:
    """Per-prompt response-group statistics (the K-responses-per-prompt
    shape reward-model training data ships in — Stiennon et al. 2020
    collect 4-64 summaries per post): docs (Gk .. Gk+G-1) form group k;
    emits n_responses, best/worst reward, margin, best_doc_id (argmax,
    tie -> lower doc_id) and total words per group. One keyed aggregate,
    #groups rows; the argmax is a max over (score, -doc_id) structs —
    no window, no second pass."""
    g = scored.withColumn(
        "group_id",
        F.expr(f"doc_id div {int(group_size)}").cast("long"))
    best = F.max(F.struct(F.col("quality_score_ppm").alias("s"),
                          (-F.col("doc_id")).alias("nid")))
    return (g.groupBy("group_id")
             .agg(F.count("*").cast("long").alias("n_responses"),
                  F.max("quality_score_ppm").cast("long")
                   .alias("best_score"),
                  F.min("quality_score_ppm").cast("long")
                   .alias("worst_score"),
                  best.alias("_b"),
                  F.sum("n_words").cast("long").alias("total_words"))
             .select("group_id", "n_responses", "best_score",
                     "worst_score",
                     (F.col("best_score") - F.col("worst_score"))
                     .cast("long").alias("score_margin"),
                     (-F.col("_b.nid")).cast("long").alias("best_doc_id"),
                     "total_words"))
