"""End-to-end training-data pipeline (north-star composition): the
clean-corpus job a 100 TB pretraining pipeline runs — quality scoring,
language filtering, exact + near-duplicate removal, corpus accounting —
composed entirely from this engine's operators, verified end-to-end
against one DuckDB oracle.

Stages (all one Catalyst plan, no intermediate materialization):
1. near-dup pairs over the full corpus (minhash-LSH, threshold 0.8);
   the lower doc_id of each pair survives
2. keep docs with lang = 'en' and quality_score_ppm ≥ 2.3M
   (C4/Gopher-style integer-ppm heuristics, ops/text.py)
3. anti-join the dropped near-dup ids
4. per-source accounting: docs, chars, whitespace tokens
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hops_spark.io.readers import load_table
from hops_spark.ops import dedup as D
from hops_spark.ops.text import quality_score, token_count
from hops_spark.queries.dedup import (BANDS, DUCK_MINHASH_VERIFIED_CTE, N_HASHES,
                                      SHINGLE_N, THRESHOLD, _DUCK_SIGS_CTE)
from hops_spark.queries.textops import _DUCK_WORDS
from hops_spark.registry import register

QMIN = 2_300_000  # quality_score_ppm floor (range 0..4M; keeps ~top 3/4)


@register(
    "pipeline_clean_corpus",
    sql=_DUCK_SIGS_CTE + DUCK_MINHASH_VERIFIED_CTE + f"""
    , dropped AS (
        SELECT DISTINCT id_b AS doc_id FROM verified
    ), feats AS (
        SELECT doc_id,
               {_DUCK_WORDS} AS w,
               length(text) AS nc,
               CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS BIGINT) AS n_punct
        FROM documents
    ), scored AS (
        SELECT doc_id, len(w) AS n_words,
               (least(len(w)::BIGINT * 20000, 1000000)
                + (1000000 - least(((n_punct * 1000000) // greatest(nc, 1)::BIGINT) * 5,
                                   1000000))
                + least(((CAST(len(list_filter(w, x -> list_contains(
                              ['the','and','of','to','in','is','that','it','was','for'], x)))
                          AS BIGINT) * 1000000) // greatest(len(w), 1)::BIGINT) * 4, 1000000)
                + ((CAST(len(list_distinct(w)) AS BIGINT) * 1000000)
                   // greatest(len(w), 1)::BIGINT)) AS score
        FROM feats
    ), keep AS (
        SELECT d.doc_id, d.source, d.n_chars, s.n_words
        FROM documents d
        JOIN scored s USING (doc_id)
        WHERE d.lang = 'en' AND s.score >= {QMIN}
          AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_words) AS BIGINT) AS total_tokens
    FROM keep
    GROUP BY source
    ORDER BY source
    """,
    doc="Clean-corpus pipeline: minhash-LSH near-dup removal (keep "
        "lowest id) ∘ quality floor ∘ language filter ∘ per-source "
        "accounting — the composed north-star job, one declarative "
        "plan end-to-end.",
    tags=("dedup", "text", "north-star", "flagship", "pipeline"),
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(d, "doc_id", "text", N_HASHES, BANDS,
                                  SHINGLE_N, THRESHOLD)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    scored = quality_score(d.select("doc_id", "source", "n_chars", "lang", "text"))
    keep = (scored.filter((F.col("lang") == "en")
                          & (F.col("quality_score_ppm") >= QMIN))
                  .join(dropped, "doc_id", "left_anti")
                  .withColumn("n_words_ws", token_count("text")))
    return (keep.groupBy("source")
                .agg(F.count("*").alias("n_docs"),
                     F.sum("n_chars").alias("total_chars"),
                     F.sum("n_words_ws").cast("long").alias("total_tokens"))
                .orderBy("source"))


@register(
    "corpus_delta",
    sql="""
    WITH snew AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 1 THEN text || ' refreshed'
                    ELSE text END AS text
        FROM documents WHERE doc_id % 10 <> 0
        UNION ALL
        SELECT -doc_id - 1 AS doc_id, text
        FROM documents WHERE doc_id % 10 = 2
    ), old_sig AS (
        SELECT doc_id,
               ('0x' || substring(md5(text), 1, 15))::BIGINT AS sig
        FROM documents
    ), new_sig AS (
        SELECT doc_id,
               ('0x' || substring(md5(text), 1, 15))::BIGINT AS sig
        FROM snew
    ), d AS (
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               o.sig AS old_sig, n.sig AS new_sig,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.sig <> n.sig THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM old_sig o FULL OUTER JOIN new_sig n USING (doc_id)
    )
    SELECT doc_id, status, old_sig, new_sig
    FROM d WHERE status <> 'unchanged'
    ORDER BY doc_id
    """,
    doc="Corpus snapshot delta (the incremental-crawl diff job a "
        "training pipeline runs between ingests): added / removed / "
        "changed docs by CONTENT signature (64-bit md5 prefix), via "
        "one full-outer join on doc id — identity rename vs content "
        "change distinguished without shipping text. The 'new' "
        "snapshot is derived deterministically from the corpus "
        "(10% removed, 10% edited, 10% re-added under NEGATED ids — "
        "a namespace disjoint from any non-negative id at any corpus "
        "size, unlike a fixed offset) so "
        "both engines construct identical inputs. At 100 TB both "
        "sides reduce to (id, 8-byte sig) before the join — the diff "
        "moves signatures, never documents; downstream, 'added'+"
        "'changed' is exactly the incremental-dedup ingest set.",
    tags=("pipeline", "scan", "north-star"),
)
def corpus_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    old = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    snew = (old.filter(F.col("doc_id") % 10 != 0)
               .select("doc_id",
                       F.when(F.col("doc_id") % 10 == 1,
                              F.concat(F.col("text"), F.lit(" refreshed")))
                        .otherwise(F.col("text")).alias("text"))
               .unionByName(
                   old.filter(F.col("doc_id") % 10 == 2)
                      .select((-F.col("doc_id") - 1).alias("doc_id"),
                              "text")))

    def sig(df: DataFrame) -> DataFrame:
        return df.select("doc_id",
                         F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
                          .cast("long").alias("sig"))

    o = sig(old).withColumnRenamed("sig", "old_sig")
    n = sig(snew).withColumnRenamed("sig", "new_sig")
    d = (o.join(n, "doc_id", "full_outer")
          .withColumn("status",
                      F.when(F.col("old_sig").isNull(), "added")
                       .when(F.col("new_sig").isNull(), "removed")
                       .when(F.col("old_sig") != F.col("new_sig"),
                             "changed")
                       .otherwise("unchanged")))
    return (d.filter(F.col("status") != "unchanged")
             .select("doc_id", "status", "old_sig", "new_sig")
             .orderBy("doc_id"))
