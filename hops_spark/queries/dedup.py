"""Deduplication inventory queries (north-star; `documents` table).

The MinHash/SimHash hashes are md5-based so DuckDB recomputes identical
signatures — the oracle mirrors the full LSH pipeline, not just counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hops_spark.io.readers import load_table
from hops_spark.ops import dedup as D
from hops_spark.queries.textops import _DUCK_WORDS, DUCK_SHINGLES_OF_W
from hops_spark.registry import register

N_HASHES = 16
BANDS = 4
SHINGLE_N = 3
THRESHOLD = 0.8


@register(
    "dedup_exact",
    sql="""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY text
    ORDER BY doc_id
    """,
    doc="Exact dedup: keep smallest doc_id per identical text "
        "(hash-aggregate; reference idiom sort+emit-once).",
    tags=("dedup", "north-star"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (d.groupBy("text")
             .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
             .select("doc_id", "n_copies")
             .orderBy("doc_id"))


def _duck_sig_exprs(n_hashes: int) -> str:
    mins = ", ".join(
        f"list_min(list_transform(sh, s -> md5('{i}|' || s)))"
        for i in range(n_hashes))
    return f"[{mins}]"


def _duck_sigs_cte(where: str = "") -> str:
    return f"""
    WITH wt AS (
        SELECT doc_id, {_DUCK_WORDS} AS w FROM documents {where}
    ), sht AS (
        SELECT doc_id, list_distinct({DUCK_SHINGLES_OF_W}) AS sh FROM wt
    ), sigs AS (
        SELECT doc_id, {_duck_sig_exprs(N_HASHES)} AS signature, sh
        FROM sht WHERE len(sh) > 0
    )
"""


_DUCK_SIGS_CTE = _duck_sigs_cte()


@register(
    "minhash_signatures",
    sql=_DUCK_SIGS_CTE + """
    SELECT doc_id, signature FROM sigs ORDER BY doc_id
    """,
    doc="MinHash signatures (16 md5-permutations over 3-word shingles) — "
        "the dedup primitive; identical in DuckDB.",
    tags=("dedup", "north-star"),
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (D.minhash_signatures(d, "doc_id", "text", N_HASHES, SHINGLE_N)
             .select("doc_id", "signature").orderBy("doc_id"))


def _duck_band_structs() -> str:
    r = N_HASHES // BANDS
    bands = []
    for b in range(BANDS):
        cols = " || '|' || ".join(f"signature[{i + 1}]" for i in range(b * r, (b + 1) * r))
        bands.append(f"{{'band': {b}, 'bhash': md5({cols})}}")
    return "[" + ", ".join(bands) + "]"


@register(
    "minhash_dedup_pairs",
    sql=_DUCK_SIGS_CTE + f"""
    , bands AS (
        SELECT doc_id, b.band AS band, b.bhash AS bhash
        FROM (SELECT doc_id, unnest({_duck_band_structs()}) AS b FROM sigs)
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING (band, bhash)
        WHERE a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(sa.sh, sb.sh))
                 / len(list_distinct(sa.sh || sb.sh)), 6) AS jaccard
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.id_a
    JOIN sigs sb ON sb.doc_id = c.id_b
    WHERE len(list_intersect(sa.sh, sb.sh))
          / len(list_distinct(sa.sh || sb.sh)) >= {THRESHOLD}
    ORDER BY id_a, id_b
    """,
    doc="MinHash+LSH near-dup pipeline: signatures → banded buckets → "
        "candidate pairs → exact-Jaccard verify ≥ 0.8. No all-pairs "
        "product; bucket-join only (scale path).",
    tags=("dedup", "north-star", "flagship"),
)
def minhash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (D.minhash_dedup_pairs(d, "doc_id", "text", N_HASHES, BANDS,
                                  SHINGLE_N, THRESHOLD)
             .orderBy("id_a", "id_b"))


def _duck_simhash_sql(bits: int = 32) -> str:
    votes = []
    for j in range(bits):
        nib = f"(strpos('0123456789abcdef', substring(h, {j // 4 + 1}, 1)) - 1)"
        bit = f"((({nib}) // {2 ** (3 - (j % 4))}) % 2)"
        votes.append(f"sum({bit} * 2 - 1) AS v{j}")
    total = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(bits))
    return f"""
    WITH wt AS (
        SELECT doc_id, {_DUCK_WORDS} AS w FROM documents
    ), toks AS (
        SELECT doc_id, md5(unnest(list_distinct(w))) AS h FROM wt
    ), votes AS (
        SELECT doc_id, {", ".join(votes)} FROM toks GROUP BY doc_id
    )
    SELECT doc_id, CAST({total} AS BIGINT) AS simhash
    FROM votes ORDER BY doc_id
    """


@register(
    "simhash_signatures",
    sql=_duck_simhash_sql(32),
    doc="32-bit SimHash per document (md5-nibble bit votes over distinct "
        "word unigrams) — identical arithmetic in DuckDB.",
    tags=("dedup", "north-star"),
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_table(d, "doc_id", "text", 32).orderBy("doc_id")


@register(
    "simhash_near_pairs",
    sql=None,  # bit_count + chunk blocking is checked rows-only; the exact
               # signature math is already oracle-verified above
    doc="SimHash near-dup pairs: chunk-blocked candidates, exact hamming "
        "verify ≤ 3 (pigeonhole: d<4 pairs share one of 4 chunks).",
    tags=("dedup", "north-star"),
)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (D.simhash_near_pairs(d, "doc_id", "text", bits=32, max_hamming=3,
                                 n_tables=4)
             .orderBy("id_a", "id_b"))


@register(
    "ngram_jaccard_pairs",
    sql=_duck_sigs_cte("WHERE doc_id % 5 = 0") + f"""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh))
                 / len(list_distinct(a.sh || b.sh)), 6) AS jaccard
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))
          / len(list_distinct(a.sh || b.sh)) >= {THRESHOLD}
    ORDER BY id_a, id_b
    """,
    doc="Exact n-gram Jaccard all-pairs ≥ 0.8 on a 1/5 doc sample — "
        "brute-force ground truth for the minhash pipeline (quadratic; "
        "sampled so the oracle gate stays fast — the LSH path is the "
        "scale answer).",
    tags=("dedup", "north-star"),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return (D.ngram_jaccard_pairs(d, "doc_id", "text", SHINGLE_N, THRESHOLD)
             .orderBy("id_a", "id_b"))
