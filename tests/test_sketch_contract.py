"""The mergeable-grid contract, asserted over EVERY sketch family:
build(A ∪ B) == merge(build(A), build(B)) — the property that makes
each sketch a per-batch summary whose history never needs re-scanning
(ops/sketch.grid_merge and the per-family wrappers)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 97).cast("string"),
                 F.lit(" word"), (F.col("id") % 31).cast("string"),
                 F.lit(" x"), (F.col("id") % 7).cast("string"))
         .alias("text"))


def _keys(spark, lo, hi, grp="g"):
    return spark.range(lo, hi).select(
        F.lit(grp).alias("g"), F.col("id").alias("k"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cms_grid_merge_equals_union_build(spark):
    from hops_spark.ops.sketch import cms_cells, merge_cells
    a = _docs(spark, 0, 400).select(F.explode(F.split("text", " ")).alias("term"))
    b = _docs(spark, 300, 700).select(F.explode(F.split("text", " ")).alias("term"))
    assert _rows(merge_cells(cms_cells(a), cms_cells(b))) \
        == _rows(cms_cells(a.unionAll(b)))


def test_counting_bloom_grid_merge_equals_union_build(spark):
    from hops_spark.ops.bloom import counting_grid, merge_grids
    a = _keys(spark, 0, 500).select(F.col("k").cast("string").alias("k"))
    b = _keys(spark, 400, 900).select(F.col("k").cast("string").alias("k"))
    m, k = 512, 3
    assert _rows(merge_grids(counting_grid(a, "k", m, k),
                             counting_grid(b, "k", m, k))) \
        == _rows(counting_grid(a.unionAll(b), "k", m, k))


def test_dynamic_bloom_bits_merge_is_cellwise_or(spark):
    """Bit grids merge with how='max' (set OR): the union of two epochs'
    bit sets equals the distinct union of their (epoch, pos) rows."""
    from hops_spark.ops.bloom import dynamic_bloom_bits
    from hops_spark.ops.sketch import grid_merge
    ins = spark.range(0, 600).select(F.col("id").cast("string").alias("k"),
                                     F.col("id").alias("ord"))
    bits = dynamic_bloom_bits(ins, "k", "ord", nr=200, m=256, k=3) \
        .withColumn("bit", F.lit(1))
    half_a = bits.filter(F.col("pos") % 2 == 0)
    half_b = bits.filter(F.col("pos") % 2 >= 0)   # overlapping halves
    merged = grid_merge([half_a, half_b], ["epoch", "pos"], "bit", how="max")
    assert _rows(merged.select("epoch", "pos")) == _rows(bits.select("epoch", "pos"))
    assert merged.filter(F.col("bit") != 1).count() == 0


def test_minhash_signature_merge_is_cellwise_min(spark):
    """sig(shingles(A) ∪ shingles(B)) == cellwise-min of sigs — the
    MinHash mergeability that makes signatures per-shard computable.
    Exercised through the grid contract on exploded (i, sig) rows."""
    from hops_spark.ops.dedup import minhash_signatures, shingle_arrays
    from hops_spark.ops.sketch import grid_merge

    full = _docs(spark, 0, 30)
    # split each doc's TEXT into two halves (disjoint shingle subsets
    # is not required — overlap is fine for min-merge)
    words = F.split("text", " ")
    n = F.size(words)
    a = full.select("doc_id", F.array_join(F.slice(words, 1, 2), " ").alias("text"))
    b = full.select("doc_id", F.array_join(F.slice(words, 2, 10), " ").alias("text"))

    def grid(df):
        sigs = minhash_signatures(df, shingle_n=2, n_hashes=16)
        sig_arr = F.array(*[F.col(f"s{i}") for i in range(16)])
        return sigs.select("doc_id",
                           F.posexplode(sig_arr).alias("i", "h"))

    merged = grid_merge([grid(a), grid(b)], ["doc_id", "i"], "h", how="min")
    assert _rows(merged) == _rows(grid(full))


def test_kmv_merge_equals_union_build(spark):
    from hops_spark.ops.sketch import kmv_merge, kmv_sketch
    k = 64
    a = _keys(spark, 0, 3000)
    b = _keys(spark, 2000, 6000)
    direct = kmv_sketch(a.unionAll(b), "g", "k", k)
    merged = kmv_merge(kmv_sketch(a, "g", "k", k),
                       kmv_sketch(b, "g", "k", k), k)
    assert _rows(merged.select("grp", "hv")) == _rows(direct.select("grp", "hv"))


def test_hll_grid_merge_equals_union_build_and_estimates(spark):
    from hops_spark.ops.sketch import (grid_merge, hll_census, hll_estimate,
                                       hll_registers)
    p = 8
    a = _keys(spark, 0, 4000)
    b = _keys(spark, 3000, 9000)
    direct = hll_registers(a.unionAll(b), "g", "k", p)
    merged = grid_merge([hll_registers(a, "g", "k", p),
                         hll_registers(b, "g", "k", p)],
                        ["grp", "reg"], "rho", how="max")
    assert _rows(merged) == _rows(direct)
    # estimator accuracy: within 3 * 1.04/sqrt(m) of the true 9000
    est = hll_estimate(hll_census(direct, p).collect()[0], p)
    m = 1 << p
    assert abs(est - 9000) / 9000 < 3 * 1.04 / (m ** 0.5), est
    # small-range exactness of the grid itself: < m distinct keys all
    # land in distinct-or-shared registers, n_regs <= n_keys
    small = hll_registers(_keys(spark, 0, 50), "g", "k", p)
    assert small.count() <= 50


def test_bottomk_sample_merge_equals_union_build(spark):
    """Bottom-k row sampling obeys the same merge law as KMV: the
    bottom-k of A ∪ B equals the k-smallest-priority truncation of the
    two per-shard bottom-k samples — per-shard sampling then merge
    loses nothing."""
    from hops_spark.ops.sampling import bottomk_sample

    k = 32
    a = _keys(spark, 0, 2000).select("g", F.col("k").alias("event_id"),
                                     (F.col("k") % 997).alias("v"))
    b = _keys(spark, 2000, 5000).select("g", F.col("k").alias("event_id"),
                                        (F.col("k") % 997).alias("v"))
    direct = bottomk_sample(a.unionAll(b), "g", "event_id", k)
    sa = bottomk_sample(a, "g", "event_id", k)
    sb = bottomk_sample(b, "g", "event_id", k)
    merged = bottomk_sample(sa.unionAll(sb), "g", "event_id", k)
    assert _rows(direct) == _rows(merged)
    assert direct.count() == k


def test_dyadic_cms_merge_equals_union_build_and_rank_bounds(spark):
    """The quantile family on the grid contract: per-level cells merge
    by SUM exactly (unlike GK/KLL whose compaction is order-dependent),
    and rank estimates (a) never underestimate, (b) stay within
    levels · eN of truth — the C&M range-query guarantee."""
    from hops_spark.ops.sketch import (dyadic_cms_cells, dyadic_cms_merge,
                                       dyadic_rank_estimates)
    bits, min_level, width = 12, 4, 256
    a = spark.range(0, 3000).select((F.col("id") * 7 % 4096).alias("v"))
    b = spark.range(0, 2000).select((F.col("id") * 13 % 4096).alias("v"))
    direct = dyadic_cms_cells(a.unionAll(b), "v", bits, min_level)
    merged = dyadic_cms_merge(dyadic_cms_cells(a, "v", bits, min_level),
                              dyadic_cms_cells(b, "v", bits, min_level))
    assert _rows(merged) == _rows(direct)

    panel = spark.range(1, 256).select((F.col("id") * 16).alias("t"))
    ranks = dyadic_rank_estimates(direct, panel, bits, min_level)
    union_vals = a.unionAll(b)
    exact = (union_vals.crossJoin(panel)
             .groupBy("t")
             .agg(F.sum(F.when(F.col("v") < F.col("t"), 1).otherwise(0))
                   .alias("exact_rank")))
    j = ranks.join(exact, "t").collect()
    n = union_vals.count()
    levels = bits - min_level
    bound = levels * 3 * n // width
    assert len(j) == 255
    for r in j:
        assert r.est_rank >= r.exact_rank, (r.t, r.est_rank, r.exact_rank)
        assert r.est_rank - r.exact_rank <= bound, (r.t, r.est_rank,
                                                    r.exact_rank, bound)


def _mg_stream(spark, lo, hi):
    """Skewed stream: ids % 16 == 0 spread over a long tail, the rest
    concentrated on four hot keys — the mg_heavy_hitters shape."""
    return spark.range(lo, hi).select(
        F.when(F.col("id") % 16 == 0,
               F.concat(F.lit("p"), (F.col("id") % 499).cast("string")))
         .otherwise(F.concat(F.lit("h"), (F.col("id") % 4).cast("string")))
         .alias("term"),
        F.expr("CAST(conv(substring(md5(CAST(id AS STRING)), 1, 7), 16, 10)"
               " AS BIGINT) % 4").alias("shard"))


def test_mg_summary_guarantee_and_merge_validity(spark):
    """MG is NOT exactly mergeable (unlike the grid families) — the
    contract is the Agarwal et al. 2012 bound instead: after any merge
    tree, est <= exact, exact - est <= n/(k+1), and every item heavier
    than n/(k+1) survives."""
    from hops_spark.ops.sketch import mg_sharded_summary
    k = 8
    s = _mg_stream(spark, 0, 4000)
    summ = {r["term"]: r["c"]
            for r in mg_sharded_summary(s, n_shards=4, k=k).collect()}
    exact = {r["term"]: r["n"]
             for r in s.groupBy("term").agg(F.count("*").alias("n")).collect()}
    n = sum(exact.values())
    bound = n // (k + 1)
    assert summ, "summary must be non-empty on a skewed stream"
    assert len(summ) <= k
    for t, est in summ.items():
        assert 0 < est <= exact[t]
    for t, c in exact.items():
        assert c - summ.get(t, 0) <= bound
        if c > bound:
            assert t in summ, f"heavy item {t} must survive"


def test_mg_merge_of_summaries_stays_valid(spark):
    """mg_merge over two disjoint half-streams obeys the combined-n
    bound (the §3.1 telescoping argument, asserted empirically)."""
    from hops_spark.ops.sketch import mg_merge, mg_sharded_summary
    k = 8
    a, b = _mg_stream(spark, 0, 2000), _mg_stream(spark, 2000, 4500)
    m = (mg_merge(mg_sharded_summary(a, n_shards=4, k=k),
                  mg_sharded_summary(b, n_shards=4, k=k), k=k))
    summ = {r["term"]: r["c"] for r in m.collect()}
    u = a.unionAll(b)
    exact = {r["term"]: r["n"]
             for r in u.groupBy("term").agg(F.count("*").alias("n")).collect()}
    n = sum(exact.values())
    assert len(summ) <= k
    for t, est in summ.items():
        assert 0 < est <= exact[t]
    for t, c in exact.items():
        assert c - summ.get(t, 0) <= n // (k + 1)


def test_mg_summary_deterministic(spark):
    from hops_spark.ops.sketch import mg_sharded_summary
    s = _mg_stream(spark, 0, 3000)
    r1 = _rows(mg_sharded_summary(s, n_shards=4, k=6))
    r2 = _rows(mg_sharded_summary(s, n_shards=4, k=6))
    assert r1 == r2
