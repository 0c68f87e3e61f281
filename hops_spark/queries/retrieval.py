"""Retrieval inventory queries: inverted-index/BM25 ranking over the
``documents`` table (the classic MapReduce indexing demo family,
re-expressed as DataFrame aggregates — see ops/retrieval.py).

Oracle-determinism notes: every float literal is interpolated from the
SAME Python value Spark embeds (repr round-trips the double; ``::DOUBLE``
stops DuckDB parsing it as DECIMAL), the arithmetic mirrors Spark's
left-to-right association, and per-term contributions are added in fixed
query order on both sides — no partition-order float folding anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hops_spark.io.readers import load_table
from hops_spark.ops import retrieval as R
from hops_spark.queries.textops import _DUCK_WORDS
from hops_spark.registry import register

QUERY_TERMS = ["spark", "merge", "vector"]
TOP_K = 15


def _duck_bm25_sql(terms: list[str], k: int) -> str:
    in_list = ", ".join(f"'{t}'" for t in terms)
    k1p1 = f"{R.K1 + 1!r}::DOUBLE"
    k1 = f"{R.K1!r}::DOUBLE"
    one_minus_b = f"{1 - R.B!r}::DOUBLE"
    b = f"{R.B!r}::DOUBLE"
    piv = ",\n           ".join(
        f"max(CASE WHEN term = '{t}' THEN c END) AS c{i}"
        for i, t in enumerate(terms))
    n_matched = " + ".join(
        f"(CASE WHEN c{i} IS NOT NULL THEN 1 ELSE 0 END)"
        for i in range(len(terms)))
    score = " + ".join(f"coalesce(c{i}, 0.0)" for i in range(len(terms)))
    return f"""
    WITH w AS (
        SELECT doc_id, {_DUCK_WORDS} AS w FROM documents
    ), dl AS (
        -- non-empty docs only: the engine's one-pass aggregate sees a
        -- doc iff it has >= 1 token (empty docs can't match a query;
        -- they are excluded from n_docs/avgdl by definition here)
        SELECT doc_id, len(w)::BIGINT AS dl FROM w WHERE len(w) > 0
    ), stats AS (
        SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl
    ), tf AS (
        SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM (SELECT doc_id, unnest(w) AS term FROM w)
        WHERE term IN ({in_list})
        GROUP BY doc_id, term
    ), dfreq AS (
        SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
    ), contrib AS (
        SELECT t.doc_id, t.term,
               ((ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) * t.tf)
                * {k1p1})
               / (t.tf + {k1} * ({one_minus_b} + {b} * l.dl / s.avgdl)) AS c
        FROM tf t
        JOIN dfreq d USING (term)
        JOIN dl l USING (doc_id), stats s
    ), piv AS (
        SELECT doc_id,
           {piv}
        FROM contrib GROUP BY doc_id
    )
    SELECT doc_id,
           ({n_matched})::BIGINT AS n_terms_matched,
           round({score}, 6) AS bm25
    FROM piv
    ORDER BY bm25 DESC, doc_id
    LIMIT {k}
    """


@register(
    "bm25_topk",
    sql=_duck_bm25_sql(QUERY_TERMS, TOP_K),
    doc="BM25 ranked retrieval (inverted-index family): doc lengths + "
        "query-term postings as two map-side-combined aggregates, df/idf "
        "broadcast, fixed-order per-term score sum (float-deterministic "
        "across engines). Query-term filter runs BEFORE the postings "
        "shuffle — only matching tokens move.",
    tags=("retrieval", "text", "north-star"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (R.bm25_topk(d, QUERY_TERMS, TOP_K)
             .orderBy(F.col("bm25").desc(), F.col("doc_id")))


@register(
    "word_cooccurrence",
    sql=f"""
    WITH wt AS (
        SELECT doc_id, {{DW}} AS w FROM documents
    ), prs AS (
        SELECT least(w[i.i], w[i.i + d.d]) AS word_a,
               greatest(w[i.i], w[i.i + d.d]) AS word_b
        FROM wt,
             LATERAL (SELECT unnest(range(1, len(w))) AS i) i,
             LATERAL (SELECT unnest(range(1, least(2, len(w) - i.i) + 1)) AS d) d
        WHERE len(w) >= 2
    ), cnt AS (
        SELECT word_a, word_b, count(*) AS n_cooc FROM prs GROUP BY word_a, word_b
    ), uni AS (
        SELECT word, count(*) AS c
        FROM (SELECT unnest(w) AS word FROM wt) GROUP BY word
    )
    SELECT c.word_a, c.word_b, c.n_cooc,
           (c.n_cooc * 1000000) // least(ua.c, ub.c) AS affinity_ppm
    FROM cnt c
    JOIN uni ua ON ua.word = c.word_a
    JOIN uni ub ON ub.word = c.word_b
    ORDER BY n_cooc DESC, word_a, word_b
    LIMIT 20
    """.replace("{DW}", _DUCK_WORDS),
    doc="Word co-occurrence top-k (the canonical MapReduce 'pairs' "
        "design pattern, Lin & Dyer ch.3): array-side pair generation "
        "(map-only), one pair-count aggregate + broadcast unigram "
        "counts; overlap-coefficient affinity in exact integer ppm.",
    tags=("retrieval", "text"),
)
def word_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return R.cooccurrence_topk(d, window=2, k=20)
