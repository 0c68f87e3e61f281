"""BPE tokenizer training as a distributed job (public algorithm:
Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"; the count-merge loop every LLM tokenizer trainer runs).

Where the scale actually is: the CORPUS pass — word frequencies — is
the one token-stream aggregate; everything after runs on the
vocab-with-counts table (bounded by vocabulary size, not corpus size),
exactly like single-machine trainers operate on the word-frequency
dict. This module distributes both: the corpus count is a Catalyst
aggregate, and each merge iteration is one pair-count aggregate over
the cached vocab table plus a 1-row argmax collect (contractual driver
decision, k rows total — the same contract as the IVF codebook).

Merge semantics (engine-exact by construction): symbols are kept as a
space-joined string; merging pair (x, y) is a LITERAL left-to-right
non-overlapping ``replace(' '||sym||' ', ' x y ', ' xy ')`` — Java
``String.replace`` and DuckDB ``replace`` scan identically, so the
oracle reproduces every merge bit-for-bit. This differs from canonical
BPE only when the same pair occurs ≥2 times ADJACENTLY within one word
in one pass (the consumed-boundary-space case); the leftover pair melts
in a later iteration if still top-ranked. Ties in the argmax break on
(count desc, left, right).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hops_spark.ops.text import words


def vocab_symbols(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, n, sym): word frequencies (the one corpus aggregate) with
    each word exploded to space-joined characters."""
    wc = (docs.select(F.explode(words(text_col)).alias("term"))
              .groupBy("term").agg(F.count("*").alias("n")))
    return wc.withColumn(
        "sym",
        F.array_join(F.regexp_extract_all("term", F.lit("."), 0), " "))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    s = F.split("sym", " ")
    pairs = F.when(F.size(s) >= 2, F.transform(
        F.sequence(F.lit(1), F.size(s) - 1),
        lambda i: F.struct(F.element_at(s, i).alias("w1"),
                           F.element_at(s, i + 1).alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (vocab.select(F.col("n"), F.explode(pairs).alias("p"))
                 .groupBy("p.w1", "p.w2")
                 .agg(F.sum("n").alias("pair_count")))


def bpe_train(spark: SparkSession, docs: DataFrame, k: int = 8,
              text_col: str = "text") -> DataFrame:
    """Learn ``k`` BPE merges; returns (merge_rank, left_sym,
    right_sym, pair_count) in merge order. The loop's per-iteration
    cost is one aggregate over the vocab table; the corpus is scanned
    exactly once."""
    vocab = vocab_symbols(docs, text_col).select("n", "sym").cache()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(k):
        best = (_pair_counts(vocab)
                .orderBy(F.col("pair_count").desc(), "w1", "w2")
                .limit(1).collect())
        if not best:
            break
        b = best[0]
        merges.append((rank, b["w1"], b["w2"], b["pair_count"]))
        vocab = vocab.withColumn(
            "sym",
            F.expr("trim(replace(' ' || sym || ' ', "
                   f"' {b['w1']} {b['w2']} ', ' {b['w1']}{b['w2']} '))"))
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, pair_count bigint")


def bpe_apply(docs: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text",
              out_col: str = "bpe_tokens") -> DataFrame:
    """Apply a learned merge list to a corpus — map-only: each doc's
    words become space-joined chars, then every merge replays in rank
    order (k chained whole-stage-codegen replaces, no shuffle)."""
    expr = ("transform(filter(split(lower({t}), '\\\\s+'), x -> x != ''), "
            "w -> array_join(regexp_extract_all(w, '.', 0), ' '))"
            ).format(t=text_col)
    for left, right in merges:
        expr = (f"transform({expr}, s -> trim(replace(' ' || s || ' ', "
                f"' {left} {right} ', ' {left}{right} ')))")
    return docs.withColumn(out_col, F.expr(expr))
