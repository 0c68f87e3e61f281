"""End-to-end corpus-cleaning job: the composition a training-data user
actually runs, wired from the registered operators.

    python tools/clean_corpus.py SF_DIR OUT_DIR [--bench-source src0]

Stages (each map-only or cap-bounded — see SCALE.md):
 -1. boilerplate    — optional (--strip-boilerplate): drop every
                      sentence present in > 10% of its source's docs
                      (CCNet; ops/dedup.boilerplate_strip) before any
                      other gate sees the text
  0. span excision  — optional (--cut-spans): cut every >= 8-token range
                      duplicated corpus-wide and rebuild the text
                      (ops/dedup.suffix_dup_spans + excise_spans)
  1. quality gate   — integer-ppm score threshold (ops/text.quality_score)
 1b. gopher gate    — optional (--gopher-gate): drop docs whose most
                      frequent 2/3/4-gram covers > 20/18/16% of the
                      characters (Rae et al. 2021; ops/text.top_ngram_chars)
  2. language gate  — stopword-hit lang-id == 'en' (ops/text.lang_id_expr)
  3. exact dedup    — content-hash keep-min-id (ops/dedup.exact_dedup)
  4. near dedup     — MinHash+LSH pair graph -> connected components ->
                      keep cluster representative (ops/graph)
  5. decontaminate  — optional (--excise-bench): first CUT every
                      verbatim >= 12-token benchmark passage out of the
                      training text (ops/dedup.contamination_spans +
                      excise_spans — a doc leaking one quote loses the
                      quote, not its corpus slot); then drop docs still
                      sharing >= 3 shingles with the benchmark source
                      (ops/dedup.contamination_flags)
  6. perplexity gate — drop the worst LM outliers: docs whose bigram-LM
                      avg NLL exceeds the corpus p90 threshold computed
                      from a 1-row aggregate (ops/lm.doc_nll_scores);
                      --kn3-gate swaps the scorer for the trigram-KN
                      ARPA consumer (ops/lm.kn3_doc_scores — the
                      stored-model backoff evaluation, CCNet-grade
                      smoothing instead of add-one)
  7. token budget   — optional (--budget-ppm N): keep only the
                      quality-ranked head within N ppm of surviving
                      corpus tokens (ops/sampling.quality_budget_head)
  8. split          — hash-stable train/val/test assignment written as a
                      partition column (ops/sampling.split_assign)

Writes the kept documents as parquet to OUT_DIR/clean (partitioned by
split) and prints ONE JSON accounting line (counts per stage) — the
job's contract with a scheduler. Deterministic end to end: re-running
yields byte-identical keep decisions (hash sampling, md5 minhash,
min-id winners, integer-micro-nat LM scores).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hops_spark.io.readers import load_table
from hops_spark.ops.dedup import (contamination_flags, exact_dedup,
                                  minhash_dedup_pairs)
from hops_spark.ops.graph import dedup_cluster_labels
from hops_spark.ops.lm import doc_nll_scores
from hops_spark.ops.sampling import split_assign
from hops_spark.ops.text import lang_id_expr, quality_score
from hops_spark.session import get_spark

QUALITY_MIN_PPM = 1_200_000
SHINGLE_N = 3
THRESHOLD = 0.8


def clean_corpus(spark, sf_dir: str, out_dir: str,
                 bench_source: str = "src0", nb_lang: bool = False,
                 out_format: str = "parquet",
                 survivor: str = "min_id",
                 weighted_dedup: bool = False,
                 mixture: bool = False,
                 cut_spans: bool = False,
                 excise_bench: bool = False,
                 strip_boilerplate: bool = False,
                 gopher_gate: bool = False,
                 kn3_gate: bool = False,
                 budget_ppm: int | None = None) -> dict:
    d = load_table(spark, sf_dir, "documents")
    counts = {"input": d.count()}

    if strip_boilerplate:
        # CCNet per-source boilerplate removal FIRST (before even span
        # excision): a sentence present in > 10% of a source's docs is
        # chrome, and dropping it early keeps boilerplate mass out of
        # the quality score, the LM threshold, and the dedup shingle
        # sets (ops/dedup.boilerplate_strip; split device shared with
        # the registered query).
        from hops_spark.ops.dedup import (FIXTURE_SENTENCE_SPLIT,
                                          boilerplate_strip)
        # materialize once: the sentence explode + df aggregate feeds
        # BOTH the counter collect and the corpus rewrite (lazy plans
        # would re-run the stage per action)
        bp = boilerplate_strip(d.select("doc_id", "source", "text"),
                               split_re=FIXTURE_SENTENCE_SPLIT) \
            .localCheckpoint(eager=True)
        counts["boiler_sents_cut"] = bp.agg(
            F.sum(F.col("n_sents") - F.col("n_kept")).cast("long")
        ).collect()[0][0] or 0
        # LEFT join + coalesce: a doc that yields zero sentences has no
        # boilerplate_strip row (nothing to strip) — an inner join
        # would silently delete it from the corpus uncounted
        d = (d.join(bp.select("doc_id", "clean_text"), "doc_id", "left")
              .withColumn("text", F.coalesce("clean_text", "text"))
              .withColumn("n_chars", F.length("text").cast("long"))
              .drop("clean_text"))

    if cut_spans:
        # sub-document excision FIRST (Lee et al. 2022 ExactSubstr):
        # cut every maximal >= 8-token range duplicated corpus-wide
        # (ops/dedup.suffix_dup_spans — suffix-sort exact method, no
        # hashing) and rebuild the text from surviving tokens BEFORE
        # the doc-level gates, so boilerplate mass can neither carry a
        # doc through the quality gate nor glue near-dup clusters.
        from hops_spark.ops.dedup import excise_spans, suffix_dup_spans
        spans = suffix_dup_spans(d, "doc_id", "text",
                                 min_tokens=8, prefix_cap=12)
        # materialize once: the suffix-sort pipeline is the heaviest
        # stage in the CLI and feeds both the counter and the rewrite
        ex = excise_spans(d, spans, "doc_id", "text") \
            .localCheckpoint(eager=True)
        d = (d.join(ex.select("doc_id", "n_cut", "clean_text"), "doc_id")
              .withColumn("text", F.col("clean_text"))
              .withColumn("n_chars", F.length("text").cast("long"))
              .drop("clean_text"))
        counts["tokens_cut"] = ex.agg(
            F.sum("n_cut").cast("long")).collect()[0][0] or 0
        d = d.drop("n_cut")

    # Each gate below is materialized once (eager localCheckpoint)
    # before its accounting count: the job takes 7-10 actions (stage
    # counts + final write), and without a cut after stage k the whole
    # k-stage prefix re-executes for EVERY later action — O(N²) stage
    # executions per run (guide §2.4: a multi-consumer intermediate is
    # written once, read N times). The checkpoint also truncates the
    # growing plan tree, so Catalyst re-analysis stops compounding.
    # Counts are deterministic either way; only execution count changes.
    q = (quality_score(d.select("doc_id", "text"))
         .select("doc_id", "quality_score_ppm"))
    d = (d.join(q, "doc_id")
          .filter(F.col("quality_score_ppm") >= QUALITY_MIN_PPM)
          .localCheckpoint(eager=True))
    counts["after_quality"] = d.count()

    if gopher_gate:
        # Gopher repetition gate (Rae et al. 2021 table A1): drop docs
        # whose most frequent 2/3/4-gram covers > 20/18/16% of the
        # characters (ops/text.top_ngram_chars) — the CONCENTRATION
        # signal the ppm quality score (length/punct/stopword) and the
        # dup-fraction stats don't see. Map-heavy + one keyed count
        # aggregate per n; placed after the quality gate so it only
        # scans survivors.
        from hops_spark.ops.text import top_ngram_chars
        keep = (top_ngram_chars(d.select("doc_id", "text"))
                .filter("keep").select("doc_id"))
        d = d.join(keep, "doc_id", "left_semi").localCheckpoint(eager=True)
        counts["after_gopher_gate"] = d.count()

    d = d.withColumn("_lang", lang_id_expr("text")) \
         .filter(F.col("_lang") == "en").drop("_lang")
    counts["after_lang"] = d.count()

    if nb_lang:
        # Second-opinion language gate: the trained NB classifier must
        # AGREE with the doc's declared lang label (the fastText-recipe
        # cross-check; disagreement marks mislabeled/ambiguous docs).
        from hops_spark.ops.classify import nb_predict
        agree = (nb_predict(d, class_col="lang")
                 .filter(F.col("predicted") == F.col("actual"))
                 .select("doc_id"))
        d = d.join(agree, "doc_id", "left_semi").localCheckpoint(eager=True)
        counts["after_nb_lang"] = d.count()

    d = exact_dedup(d, ["text"], "doc_id").localCheckpoint(eager=True)
    counts["after_exact_dedup"] = d.count()

    pairs = minhash_dedup_pairs(d, "doc_id", "text",
                                shingle_n=SHINGLE_N, threshold=THRESHOLD)
    if weighted_dedup:
        # widen the pair graph with tf-WEIGHTED Jaccard twins
        # (ops/dedup.weighted_jaccard_pairs): catches repetitive-
        # boilerplate near-dups whose term-frequency MASS matches even
        # where the distinct-shingle sets diverge; union of the two
        # graphs only ever merges clusters (strictly more dedup).
        from hops_spark.ops.dedup import weighted_jaccard_pairs
        wpairs = (weighted_jaccard_pairs(d, "doc_id", "text")
                  .select("id_a", "id_b"))
        pairs = pairs.select("id_a", "id_b").unionByName(wpairs).distinct()
    labels = dedup_cluster_labels(d.select("doc_id"), pairs)
    if survivor == "quality":
        # quality-aware survivor (queries/dedup.cluster_representatives
        # semantics): keep each cluster's HIGHEST-scoring member (ties
        # to the smaller doc_id) instead of the arbitrary min-id —
        # the quality column is already on d from the first gate.
        from pyspark.sql.window import Window
        members = labels.select("doc_id", "cluster_id") \
            .join(d.select("doc_id", "quality_score_ppm"), "doc_id")
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("quality_score_ppm").desc(), F.col("doc_id"))
        keep_ids = (members.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1).select("doc_id"))
    else:
        keep_ids = labels.filter("is_kept").select("doc_id")
    d = d.join(keep_ids, "doc_id", "left_semi").localCheckpoint(eager=True)
    counts["after_near_dedup"] = d.count()

    bench = d.filter(F.col("source") == bench_source)
    corpus = d.filter(F.col("source") != bench_source)
    if excise_bench:
        # strict substring decontamination BEFORE the doc-level drop:
        # cut every verbatim >= 12-token benchmark passage out of the
        # training docs (ops/dedup.contamination_spans + excise_spans)
        # so a doc leaking one quote loses the quote, not its place in
        # the corpus; docs still heavy in shingle overlap AFTER the
        # cut fall to the flag gate below.
        from hops_spark.ops.dedup import contamination_spans, excise_spans
        bspans = contamination_spans(corpus, bench, "doc_id", "text",
                                     k=8, min_tokens=12)
        bex = excise_spans(corpus, bspans, "doc_id", "text") \
            .localCheckpoint(eager=True)
        counts["bench_tokens_cut"] = bex.agg(
            F.sum("n_cut").cast("long")).collect()[0][0] or 0
        corpus = (corpus.join(bex.select("doc_id", "clean_text"), "doc_id")
                        .withColumn("text", F.col("clean_text"))
                        .withColumn("n_chars", F.length("text").cast("long"))
                        .drop("clean_text"))
    flags = contamination_flags(corpus, bench, "doc_id", "text",
                                shingle_n=SHINGLE_N, min_overlap=3)
    contaminated = flags.filter("contaminated").select("doc_id")
    d = (corpus.join(contaminated, "doc_id", "left_anti")
               .localCheckpoint(eager=True))
    counts["after_decontaminate"] = d.count()

    # LM-perplexity gate: threshold = p90 of avg_nll_micro over the
    # SURVIVING corpus (1-row percentile aggregate, broadcast back) —
    # CCNet keeps the low-perplexity head; the integer micro-nat scores
    # make the cut deterministic.
    if kn3_gate:
        # trigram-KN smoothing via the exported-model consumer path —
        # same gate shape, better-calibrated tail (KN vs add-one)
        from hops_spark.ops.lm import kn3_doc_scores
        scores = kn3_doc_scores(d.select("doc_id", "text")).select(
            "doc_id", F.col("avg_nll3_micro").alias("avg_nll_micro"))
    else:
        scores = doc_nll_scores(d.select("doc_id", "text"))
    # three consumers (threshold aggregate, keep semi-join, unscored
    # anti-join) — materialize the LM pass once
    scores = scores.localCheckpoint(eager=True)
    thr = scores.agg(F.expr(
        "CAST(percentile_approx(avg_nll_micro, 0.9, 10000) AS BIGINT)")
        .alias("thr"))
    keep = (scores.crossJoin(F.broadcast(thr))
                  .filter(F.col("avg_nll_micro") <= F.col("thr"))
                  .select("doc_id"))
    # docs too short to have a bigram never scored — keep them (the
    # length gates upstream own that decision).
    d = d.join(keep, "doc_id", "left_semi").unionByName(
        d.join(scores.select("doc_id"), "doc_id", "left_anti")) \
         .localCheckpoint(eager=True)
    counts["after_perplexity"] = d.count()

    if mixture:
        # temperature-scaled mixing (the queries/layout.mixture_schedule
        # rule, tau=2): per-source keep-rate = the sqrt-scaled share
        # over the raw share, capped at 1 (downsample-only in a
        # single-epoch job; upsampling is the trainer's repeat knob).
        # Rate applied as deterministic md5-hash sampling per doc —
        # rerun-stable like every gate here.
        src = (d.groupBy("source")
                .agg(F.sum("n_chars").cast("long").alias("nc"))
                .withColumn("w", F.expr(
                    "CAST(floor(sqrt(CAST(nc AS DOUBLE))) AS BIGINT)")))
        tot = src.agg(F.sum("nc").alias("ct"), F.sum("w").alias("wt"))
        rates = (src.crossJoin(F.broadcast(tot))
                    .select("source", F.expr(
                        "least(1000000, (w * 1000000 div wt) * 1000000 "
                        "div greatest(nc * 1000000 div ct, 1))")
                        .alias("keep_ppm")))
        hv = F.pmod(F.conv(F.substring(F.md5(F.concat(
            F.lit("mix|"), F.col("doc_id").cast("string"))), 1, 7),
            16, 10).cast("long"), F.lit(1_000_000))
        d = (d.join(F.broadcast(rates), "source")
              .filter(hv < F.col("keep_ppm")).drop("keep_ppm")
              .localCheckpoint(eager=True))
        counts["after_mixture"] = d.count()

    if budget_ppm is not None:
        # final data-selection step: spend the token budget on the
        # highest-quality survivors corpus-wide (ops/sampling.
        # quality_budget_head — two-phase prefix sum, integer budget
        # test; the straddling doc is dropped).
        from hops_spark.ops.sampling import quality_budget_head
        head = quality_budget_head(d.select("doc_id", "text"), budget_ppm)
        d = (d.join(head.select("doc_id"), "doc_id", "left_semi")
              .localCheckpoint(eager=True))
        counts["after_budget"] = d.count()

    d = split_assign(d, "doc_id", salt="split")
    out = os.path.join(out_dir, "clean")
    if out_format == "avro":
        from hops_spark.io.avro import read_avro, write_avro
        write_avro(d.orderBy("doc_id"), out, codec="deflate")
        counts["written"] = read_avro(spark, out).count()
    else:
        d.orderBy("doc_id").write.mode("overwrite") \
         .partitionBy("split").parquet(out)
        counts["written"] = spark.read.parquet(out).count()
    return counts


def main() -> None:
    args = sys.argv[1:]
    nb_lang = "--nb-lang" in args
    weighted_dedup = "--weighted-dedup" in args
    mixture = "--mixture" in args
    cut_spans = "--cut-spans" in args
    excise_bench = "--excise-bench" in args
    strip_boilerplate = "--strip-boilerplate" in args
    gopher_gate = "--gopher-gate" in args
    kn3_gate = "--kn3-gate" in args
    budget_ppm = None
    if "--budget-ppm" in args:
        i = args.index("--budget-ppm")
        budget_ppm = int(args[i + 1])
        del args[i:i + 2]
    out_format = "avro" if "--avro" in args else "parquet"
    survivor = "quality" if "--survivor-quality" in args else "min_id"
    args = [a for a in args
            if a not in ("--nb-lang", "--avro", "--survivor-quality",
                         "--weighted-dedup", "--mixture", "--cut-spans",
                         "--excise-bench", "--strip-boilerplate",
                         "--gopher-gate", "--kn3-gate")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    out_dir = args[1] if len(args) > 1 else "/tmp/clean_corpus_out"
    bench_source = "src0"
    if "--bench-source" in args:
        bench_source = args[args.index("--bench-source") + 1]
    spark = get_spark("clean-corpus")
    counts = clean_corpus(spark, sf_dir, out_dir, bench_source,
                          nb_lang=nb_lang, out_format=out_format,
                          survivor=survivor, weighted_dedup=weighted_dedup,
                          mixture=mixture, cut_spans=cut_spans,
                          excise_bench=excise_bench,
                          strip_boilerplate=strip_boilerplate,
                          gopher_gate=gopher_gate, kn3_gate=kn3_gate,
                          budget_ppm=budget_ppm)
    print(json.dumps({"job": "clean_corpus", "sf_dir": sf_dir,
                      "out": os.path.join(out_dir, "clean"), **counts}))


if __name__ == "__main__":
    main()
