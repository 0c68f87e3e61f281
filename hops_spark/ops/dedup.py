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


# MinHash permutation constants: p_i(h) = (A_i·h + B_i) mod MERSENNE31,
# h = 28-bit int from md5(shingle). Deterministic (md5-seeded), identical
# in any engine with 64-bit integer arithmetic (A·h + B < 2^59).
MERSENNE31 = 2_147_483_647


def minhash_coeffs(n_hashes: int) -> list[tuple[int, int]]:
    import hashlib
    out = []
    for i in range(n_hashes):
        h = hashlib.md5(f"minhash|{i}".encode()).hexdigest()
        a = (int(h[:8], 16) | 1) % MERSENNE31
        b = int(h[8:16], 16) % MERSENNE31
        out.append((a or 1, b))
    return out


def shingle_rows(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 shingle_n: int = 3) -> DataFrame:
    """(id, shingle, h) rows: one row per DISTINCT shingle per doc, with
    its 28-bit md5-derived hash. The relational (no giant arrays) dedup
    substrate — partial aggregation and joins stay map-side combinable
    at any scale."""
    sh = F.array_distinct(shingles(text_col, shingle_n))
    return (df.select(F.col(id_col), F.explode(sh).alias("shingle"))
              .withColumn("h", F.conv(F.substring(F.md5("shingle"), 1, 7), 16, 10)
                               .cast("long")))


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       n_hashes: int = 16, shingle_n: int = 3) -> DataFrame:
    """Per-doc MinHash signature as columns s0..s{n-1} plus set_size.

    One md5 per shingle (not per shingle×hash), n integer affine
    permutations, ONE groupBy with map-side partial min — the 100 TB
    shape: cost O(shingles), single shuffle keyed by doc id. Docs with
    no shingles (< n words) are absent (can't be near-duplicates)."""
    rows = shingle_rows(df, id_col, text_col, shingle_n)
    aggs = [F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE31)))
             .alias(f"s{i}")
            for i, (a, b) in enumerate(minhash_coeffs(n_hashes))]
    aggs.append(F.count("*").alias("set_size"))
    return rows.groupBy(id_col).agg(*aggs)


def signature_array(sigs: DataFrame, id_col: str = "doc_id",
                    n_hashes: int = 16) -> DataFrame:
    """Signature columns packed into array<bigint> (presentation form)."""
    return sigs.select(F.col(id_col),
                       F.array(*[F.col(f"s{i}") for i in range(n_hashes)])
                        .alias("signature"))


def minhash_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                            n_hashes: int = 16, bands: int = 4,
                            max_bucket: int = 1000) -> DataFrame:
    """LSH banding: hash each r-row band of the signature, bucket-join
    docs sharing any band hash. Emits distinct candidate (a, b) pairs,
    a < b. Buckets larger than max_bucket (boilerplate signatures) are
    dropped — the standard skew guard; AQE handles moderate skew."""
    r = n_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"s{i}").cast("string") for i in range(b * r, (b + 1) * r)]
        band_cols.append(F.struct(F.lit(b).alias("band"),
                                  F.md5(F.concat_ws("|", *cols)).alias("bhash")))
    exploded = (sigs.select(id_col, F.explode(F.array(*band_cols)).alias("bb"))
                    .select(id_col, "bb.band", "bb.bhash"))
    wcnt = Window.partitionBy("band", "bhash")
    exploded = (exploded.withColumn("_bn", F.count("*").over(wcnt))
                        .filter(F.col("_bn") <= max_bucket).drop("_bn"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (a.join(b, ["band", "bhash"])
             .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
             .distinct())


def jaccard_verify(pairs: DataFrame, rows: DataFrame, sizes: DataFrame,
                   id_col: str = "doc_id", threshold: float = 0.8) -> DataFrame:
    """Exact Jaccard on candidates, fully relational: intersection size =
    count of shared shingle rows per pair (join on shingle), union =
    |A| + |B| − inter. No per-row arrays → no group-size memory cliff."""
    ra = rows.select(F.col(id_col).alias("id_a"), "shingle")
    rb = rows.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (pairs.join(ra, "id_a").join(rb, ["id_b", "shingle"])
                  .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (pairs.join(inter, ["id_a", "id_b"], "left")
                 .withColumn("inter", F.coalesce("inter", F.lit(0)))
                 .join(za, "id_a").join(zb, "id_b")
                 .withColumn("uni", F.col("size_a") + F.col("size_b") - F.col("inter"))
                 .withColumn("jaccard", F.round(F.col("inter") / F.col("uni"), 6))
                 .filter(F.col("jaccard") >= threshold)
                 .select("id_a", "id_b", "jaccard"))


def minhash_dedup_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        n_hashes: int = 16, bands: int = 4, shingle_n: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """End-to-end near-dup pipeline: shingle rows → signatures → LSH
    candidates → exact-Jaccard verify. Returns (id_a, id_b, jaccard)."""
    rows = shingle_rows(df, id_col, text_col, shingle_n).cache()
    # signature agg over the cached rows (same shape as minhash_signatures)
    aggs = [F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE31)))
             .alias(f"s{i}")
            for i, (a, b) in enumerate(minhash_coeffs(n_hashes))]
    aggs.append(F.count("*").alias("set_size"))
    sigs = rows.groupBy(id_col).agg(*aggs).cache()
    cands = minhash_candidate_pairs(sigs, id_col, n_hashes, bands)
    return jaccard_verify(cands, rows, sigs, id_col, threshold)


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
