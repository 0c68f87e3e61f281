"""Full-text retrieval over the corpus: inverted-index statistics and
BM25 ranking as pure DataFrame aggregations.

The classic MapReduce demo family (word count → inverted index → ranked
search) re-expressed Spark-first: postings are a (term, doc) aggregate,
document frequency is a second aggregate over it, and scoring a query is
a broadcast join against the handful of query terms — no index structure
is materialized because Catalyst's hash aggregates ARE the index build.

Scale notes (100 TB):
- The only corpus-wide shuffles are the two aggregates (doc lengths,
  term postings). Both have map-side partial aggregation.
- Query-term filtering happens BEFORE the postings aggregate, so the
  shuffle for scoring moves only rows whose term is in the query —
  a tiny fraction of the token stream.
- Per-term totals (df, idf) are broadcast; corpus-level scalars
  (N, avgdl) ride a 1-row crossJoin broadcast.
- Determinism: per-term contributions are summed in the fixed order of
  the query-term list (a left-to-right column sum, not a float SUM
  aggregate whose partition order varies), so an independent engine
  reproduces the score bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hops_spark.ops.text import words

K1 = 1.2
B = 0.75


def doc_lengths(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc, dl): token count per document (whitespace tokenizer —
    map-only, no explode shuffle)."""
    return docs.select(F.col(id_col),
                       F.size(words(text_col)).cast("long").alias("dl"))


def term_freqs(docs: DataFrame, terms: list[str], id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc, term, tf) restricted to ``terms`` — the filter runs before
    the aggregate, so only query-term tokens shuffle."""
    toks = docs.select(F.col(id_col),
                       F.explode(words(text_col)).alias("term"))
    return (toks.filter(F.col("term").isin(list(terms)))
                .groupBy(id_col, "term")
                .agg(F.count("*").cast("long").alias("tf")))


def bm25_scores(docs: DataFrame, query_terms: list[str],
                k1: float = K1, b: float = B,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """BM25 (Robertson/Okapi, the (k1+1) variant) of every matching doc
    against the fixed query. Returns (doc, n_terms_matched, score)."""
    dl = doc_lengths(docs, id_col, text_col)
    stats = dl.agg(F.count("*").cast("double").alias("n_docs"),
                   F.avg("dl").alias("avgdl"))
    tf = term_freqs(docs, query_terms, id_col, text_col)
    df_ = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    per_term = (tf.join(F.broadcast(df_), "term")
                  .join(dl, id_col)
                  .crossJoin(F.broadcast(stats))
                  .withColumn("idf", F.log(
                      (F.col("n_docs") - F.col("df") + 0.5)
                      / (F.col("df") + 0.5) + 1.0))
                  .withColumn("contrib",
                              F.col("idf") * F.col("tf") * (k1 + 1)
                              / (F.col("tf")
                                 + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))))
    # Fixed-order sum: pivot each term's contribution to its own column,
    # then add left-to-right (query-term list order). A float sum()
    # aggregate would fold in partition order and drift in the last ulp.
    pivoted = (per_term.groupBy(id_col)
                       .pivot("term", list(query_terms))
                       .agg(F.first("contrib")))
    score = F.lit(0.0)
    n_matched = F.lit(0)
    for t in query_terms:
        score = score + F.coalesce(F.col(f"`{t}`"), F.lit(0.0))
        n_matched = n_matched + F.when(F.col(f"`{t}`").isNotNull(), 1).otherwise(0)
    return pivoted.select(F.col(id_col),
                          n_matched.cast("long").alias("n_terms_matched"),
                          F.round(score, 6).alias("bm25"))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = K1, b: float = B,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k docs by BM25, ties broken by doc id (deterministic)."""
    scored = bm25_scores(docs, query_terms, k1, b, id_col, text_col)
    return (scored.orderBy(F.col("bm25").desc(), F.col(id_col))
                  .limit(k))
