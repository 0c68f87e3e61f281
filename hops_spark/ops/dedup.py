"""Deduplication operators (north-star, BASELINE.json extensions).

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a document
DataFrame. Everything is built from Column expressions (no Python in
the hot path) and is *cross-engine deterministic*: hashes are md5-based
(identical hex output in Spark and DuckDB) so the correctness oracle
can recompute signatures bit-for-bit.

Scale design (100 TB):
- MinHash/LSH is the scale path: cost is O(docs × shingles) for
  signatures + a band-bucket shuffle; candidate verification joins only
  within buckets. No all-pairs product anywhere.
- Band buckets are the classic skew risk (a boilerplate shingle set →
  one huge bucket). ``minhash_candidate_pairs`` caps bucket size
  (drop buckets > max_bucket) — standard practice; AQE skew-join
  handles moderate skew.
- Exact dedup is a single hash-aggregate on the fingerprint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hops_spark.ops.text import shingles


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the row with the smallest id per key group
    (deterministic winner). One shuffle on the dedup key."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(id_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))


def _minhash_one(sh: Column, seed: int) -> Column:
    """One minhash permutation: lexicographic min of md5(seed|shingle).
    md5 hex is uniform → min over it is a valid minwise hash; identical
    in DuckDB (md5 returns the same lowercase hex)."""
    return F.array_min(F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s))))


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       n_hashes: int = 16, shingle_n: int = 3) -> DataFrame:
    """Per-doc MinHash signature: array of n_hashes md5-min values over
    word-shingles. Docs with no shingles (< n words) get null minhashes
    and are excluded (can't be near-duplicates by shingle measure)."""
    sh = F.array_distinct(shingles(text_col, shingle_n))
    sig = F.array(*[_minhash_one(sh, i) for i in range(n_hashes)])
    return (df.select(F.col(id_col), sig.alias("signature"), sh.alias("_shingles"))
              .filter(F.size("_shingles") > 0))


def minhash_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                            n_hashes: int = 16, bands: int = 4,
                            max_bucket: int = 1000) -> DataFrame:
    """LSH banding: split the signature into `bands` rows of r = n/bands,
    hash each band, bucket-join docs sharing any band hash. Emits
    distinct candidate (a, b) pairs with a < b."""
    r = n_hashes // bands
    band_cols = []
    for b in range(bands):
        band_cols.append(
            F.struct(F.lit(b).alias("band"),
                     F.md5(F.concat_ws("|", *[F.col("signature")[i]
                                              for i in range(b * r, (b + 1) * r)]))
                      .alias("bhash")))
    exploded = (sigs.select(id_col, F.explode(F.array(*band_cols)).alias("bb"))
                    .select(id_col, "bb.band", "bb.bhash"))
    # cap pathological buckets (boilerplate shingle sets)
    wcnt = Window.partitionBy("band", "bhash")
    exploded = (exploded.withColumn("_bn", F.count("*").over(wcnt))
                        .filter(F.col("_bn") <= max_bucket).drop("_bn"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (a.join(b, ["band", "bhash"])
              .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
              .select(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"))
              .distinct())
    return pairs


def jaccard_verify(pairs: DataFrame, sigs: DataFrame, id_col: str = "doc_id",
                   threshold: float = 0.8) -> DataFrame:
    """Verify candidates with EXACT Jaccard over the shingle sets (the
    reference-grade check; estimated-from-signature is an option but the
    exact set intersection on candidates only is cheap)."""
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("_shingles").alias("sh_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("_shingles").alias("sh_b"))
    j = (pairs.join(sa, "id_a").join(sb, "id_b")
              .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
              .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
              .withColumn("jaccard", F.round(F.col("inter") / F.col("uni"), 6))
              .filter(F.col("jaccard") >= threshold)
              .select("id_a", "id_b", "jaccard"))
    return j


def minhash_dedup_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        n_hashes: int = 16, bands: int = 4, shingle_n: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """End-to-end near-dup pipeline: signatures → LSH candidates →
    exact-Jaccard verify. Returns (id_a, id_b, jaccard)."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n).cache()
    cands = minhash_candidate_pairs(sigs, id_col, n_hashes, bands)
    return jaccard_verify(cands, sigs, id_col, threshold)


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        shingle_n: int = 3, threshold: float = 0.8,
                        group_col: Column | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity join — the brute-force oracle for
    minhash. All-pairs within a blocking group (default: same shingle
    count bucket would still be quadratic; callers at scale MUST block).
    Used at test scale for ground truth."""
    sh = df.select(F.col(id_col),
                   F.array_distinct(shingles(text_col, shingle_n)).alias("sh"))
    sh = sh.filter(F.size("sh") > 0)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
             .withColumn("jaccard", F.round(
                 F.size(F.array_intersect("sh_a", "sh_b"))
                 / F.size(F.array_union("sh_a", "sh_b")), 6))
             .filter(F.col("jaccard") >= threshold)
             .select("id_a", "id_b", "jaccard"))


def simhash_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  bits: int = 32) -> DataFrame:
    """SimHash over distinct word unigrams, cross-engine deterministic.

    Per token t: h(t) = first bits/4 hex nibbles of md5(t). Bit j of the
    simhash = 1 iff sum over tokens of (2*bit_j(h(t)) - 1) > 0. Nibbles
    are decoded with conv(hex,16,10) (Spark) / strpos on the hex alphabet
    (DuckDB oracle) — identical values.

    Shape: explode distinct tokens → 32 bit-vote partial aggregates in
    ONE groupBy (single shuffle; md5 computed once per token row).
    Docs with zero tokens are excluded."""
    from hops_spark.ops.text import words
    toks = (df.select(F.col(id_col),
                      F.explode(F.array_distinct(words(F.col(text_col)))).alias("_tok"))
              .withColumn("_h", F.md5("_tok")))
    votes = []
    for j in range(bits):
        nib = F.conv(F.substring("_h", j // 4 + 1, 1), 16, 10).cast("int")
        bit = F.shiftright(nib, 3 - (j % 4)).bitwiseAND(F.lit(1))
        votes.append(F.sum(bit * 2 - 1).alias(f"_v{j}"))
    agg = toks.groupBy(id_col).agg(*votes)
    total = None
    for j in range(bits):
        term = F.when(F.col(f"_v{j}") > 0, F.lit(2 ** j).cast("long")) \
                .otherwise(F.lit(0).cast("long"))
        total = term if total is None else total + term
    return agg.select(F.col(id_col), total.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       bits: int = 32, max_hamming: int = 3, n_tables: int = 4) -> DataFrame:
    """SimHash near-dup: block on bit-chunks (a pair within hamming d
    must agree on at least one of n_tables chunks when d < n_tables),
    then verify hamming distance exactly via bit_count(xor)."""
    st = simhash_table(df, id_col, text_col, bits).cache()
    chunk = bits // n_tables
    mask = (1 << chunk) - 1
    blocks = []
    for t in range(n_tables):
        blocks.append(F.struct(F.lit(t).alias("tbl"),
                               F.shiftright(F.col("simhash"), t * chunk)
                                .bitwiseAND(F.lit(mask)).alias("chunk")))
    ex = (st.select(id_col, "simhash", F.explode(F.array(*blocks)).alias("b"))
            .select(id_col, "simhash", "b.tbl", "b.chunk"))
    a, b = ex.alias("a"), ex.alias("b")
    return (a.join(b, ["tbl", "chunk"])
             .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
                      .alias("hamming"))
             .distinct()
             .filter(F.col("hamming") <= max_hamming))
