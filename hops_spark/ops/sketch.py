"""Count–min sketch heavy hitters (public: Cormode & Muthukrishnan
2005). The 100 TB story: exact per-term counts require a full-vocab
shuffle; the sketch collapses the corpus to a depth × width cell grid
(here 4 × 256 = 1024 longs) with map-side partial aggregation, so the
shuffle moves at most depth × width rows PER PARTITION regardless of
vocabulary size. Heavy-hitter candidates then probe the broadcast grid.

Determinism: row hashes are md5-based (same first-7-nibbles fold the
whole repo uses), so an independent engine rebuilds the identical grid
and identical estimates — the driver oracle hash-matches the SKETCH
itself, not just the exact counts. The CMS guarantee (estimate ≥ true;
estimate ≤ true + εN with ε = e/width at the usual depth) is emitted as
checked boolean columns, making the approximation self-verifying the
same way approx_distinct_parts is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hops_spark.ops.text import words

DEPTH = 4
WIDTH = 256


def _bucket(term, r: int, width: int):
    """Deterministic row-r bucket: first 7 md5 nibbles of 'r|term' mod
    width — identical arithmetic in DuckDB."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(str(r)), term)), 1, 7),
               16, 10).cast("long"),
        F.lit(width))


def cms_cells(toks: DataFrame, term_col: str = "term",
              depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """(r, bucket, c): the sketch grid from a token stream — one
    map-only ×depth emit + one aggregate (map-side combine collapses
    each partition to ≤ depth × width rows pre-shuffle)."""
    cells = F.array(*[
        F.struct(F.lit(r).alias("r"),
                 _bucket(F.col(term_col), r, width).alias("bucket"))
        for r in range(depth)])
    return (toks.select(F.explode(cells).alias("c"))
                .select("c.r", "c.bucket")
                .groupBy("r", "bucket").agg(F.count("*").alias("c")))


def merge_cells(*grids: DataFrame) -> DataFrame:
    """Merge sketch grids cell-wise — the property that makes CMS a
    100 TB tool: per-batch (or per-stream-window) grids are tiny
    mergeable summaries, so incremental corpus monitoring never
    re-scans history. union + one aggregate over ≤ depth × width rows
    per grid; ``cells(A) ⊕ cells(B) ≡ cells(A ∪ B)`` exactly (counts
    are additive and the hash is deterministic) — asserted in
    tests/test_round4_ops.py. Delegates to the shared grid contract."""
    return grid_merge(list(grids), ["r", "bucket"], "c", how="sum")


def cms_estimates(terms: DataFrame, cells: DataFrame,
                  term_col: str = "term",
                  depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """min-over-rows point estimate for each candidate term. The grid
    is ≤ depth × width rows — broadcast; candidates never shuffle."""
    probes = F.array(*[
        F.struct(F.lit(r).alias("r"),
                 _bucket(F.col(term_col), r, width).alias("bucket"))
        for r in range(depth)])
    probed = (terms.withColumn("p", F.explode(probes))
                   .select(terms.columns + [F.col("p.r").alias("r"),
                                            F.col("p.bucket").alias("bucket")]))
    return (probed.join(F.broadcast(cells), ["r", "bucket"])
                  .groupBy(terms.columns)
                  .agg(F.min("c").alias("n_cms")))


def heavy_hitters(docs: DataFrame, k: int = 20, id_col: str = "doc_id",
                  text_col: str = "text", depth: int = DEPTH,
                  width: int = WIDTH) -> DataFrame:
    """Top-k terms with exact count, sketch estimate, and the two CMS
    bounds as checked booleans. The exact count is the ground truth this
    fixture affords; at corpus scale the candidate set would come from
    per-partition top-k over the same stream and only the sketch side
    survives — the grid build is the scale path being certified here."""
    toks = docs.select(F.explode(words(text_col)).alias("term"))
    cells = cms_cells(toks, "term", depth, width)
    exact = (toks.groupBy("term").agg(F.count("*").alias("n_exact")))
    total = exact.agg(F.sum("n_exact").alias("n_total"))
    top = (exact.orderBy(F.col("n_exact").desc(), "term").limit(k))
    est = cms_estimates(top, cells, "term", depth, width)
    return (est.crossJoin(F.broadcast(total))
               .withColumn("never_underestimates", F.col("n_cms") >= F.col("n_exact"))
               .withColumn("within_eps",
                           F.col("n_cms") - F.col("n_exact")
                           <= F.expr(f"(3 * n_total) div {width}"))
               .select("term", "n_exact", "n_cms",
                       "never_underestimates", "within_eps")
               .orderBy(F.col("n_exact").desc(), "term"))


# --- KMV (k-minimum-values / theta) distinct sketch ----------------------


def kmv_sketch(df: DataFrame, group_col: str, key_col: str,
               k: int = 256) -> DataFrame:
    """KMV distinct-count sketch per group (public: Beyer et al. 2007;
    the DataSketches theta family): keep the k SMALLEST md5 values of
    the group's distinct keys. Mergeable exactly (union sketch = k
    smallest of the concatenation), deterministic (md5 — an oracle
    recomputes every retained hash), and O(k) state per group forever.

    Build: one distinct on (group, h), then a rank<=k filter over a
    GROUP-PARTITIONED window — bounded memory per partition; never a
    per-group collect. Output: (group, hv) rows, <= k per group; hv is
    a 52-BIT integer hash (13 md5 nibbles): the domain is sized so the
    estimator's (k-1)*DOMAIN product stays inside int64 for k <= 2048
    — no overflow, no float fallback, oracle-exact."""
    from pyspark.sql.window import Window
    hv = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 13),
                16, 10).cast("long")
    d = df.select(F.col(group_col).alias("grp"), hv.alias("hv")).distinct()
    w = Window.partitionBy("grp").orderBy("hv")
    return (d.withColumn("_rk", F.row_number().over(w))
             .filter(F.col("_rk") <= k)
             .select("grp", "hv", "_rk"))


KMV_DOMAIN = 16 ** 13   # 52-bit hash domain: (k-1)*DOMAIN fits int64


def kmv_estimate_ppm(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Per-group distinct estimate from a KMV sketch, integer-exact for
    the oracle: if the group has < k hashes the sketch IS the distinct
    set (estimate = count, exact); else est = (k-1) * DOMAIN / kth_min
    (floor). Output: (grp, n_kept, est_distinct)."""
    agg = sketch.groupBy("grp").agg(
        F.count("*").alias("n_kept"),
        F.max(F.when(F.col("_rk") == k, F.col("hv"))).alias("kth"))
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("long")) \
           .otherwise(F.expr(f"CAST(({k} - 1) * {KMV_DOMAIN} div kth AS BIGINT)"))
    return agg.select("grp", F.col("n_kept").cast("long").alias("n_kept"),
                      est.cast("long").alias("est_distinct"))


def kmv_overlap_ppm(sketch_a: DataFrame, sketch_b: DataFrame,
                    k: int = 256) -> DataFrame:
    """Set-operation estimates from two KMV sketches (the theta-sketch
    intersection trick): merge = k smallest of A ∪ B hashes; with
    theta = the merged kth min, |U| ~ (k-1)*DOMAIN/theta and
    |A ∩ B| ~ |U| * (merged hashes present in BOTH) / k. All floor
    arithmetic over the deterministic hash sets, so an oracle
    reproduces the estimates bit-for-bit. One row out."""
    from pyspark.sql.window import Window
    a = sketch_a.select("hv").withColumn("_in_a", F.lit(1))
    b = sketch_b.select("hv").withColumn("_in_b", F.lit(1))
    u = (a.join(b, "hv", "full")
          .select("hv",
                  F.coalesce("_in_a", F.lit(0)).alias("ina"),
                  F.coalesce("_in_b", F.lit(0)).alias("inb")))
    w = Window.orderBy("hv")   # <= 2k rows by construction (two sketches)
    m = (u.withColumn("_rk", F.row_number().over(w))
          .filter(F.col("_rk") <= k))
    return (m.agg(F.count("*").alias("n_kept"),
                  F.max(F.when(F.col("_rk") == k, F.col("hv"))).alias("kth"),
                  F.sum(F.expr("CASE WHEN ina = 1 AND inb = 1 "
                               "THEN 1 ELSE 0 END")).alias("n_both"))
             .select(
                 F.col("n_kept").cast("long").alias("n_kept"),
                 F.col("n_both").cast("long").alias("n_both"),
                 F.when(F.col("n_kept") < k, F.col("n_kept"))
                  .otherwise(F.expr(
                      f"CAST(({k} - 1) * {KMV_DOMAIN} div kth AS BIGINT)"))
                  .cast("long").alias("est_union"),
                 F.when(F.col("n_kept") < k, F.col("n_both"))
                  .otherwise(F.expr(
                      # overflow-safe: split est_union into div/mod
                      # parts before multiplying by n_both (<= k)
                      f"CAST(((({k} - 1) * {KMV_DOMAIN} div kth) div {k})"
                      f" * n_both + ((({k} - 1) * {KMV_DOMAIN} div kth)"
                      f" % {k}) * n_both div {k} AS BIGINT)"))
                  .cast("long").alias("est_intersection")))


# --- the shared mergeable-grid contract ----------------------------------
#
# Every bounded-state sketch in this repo is a KEYED GRID — a DataFrame
# of (coords..., value) with at most `state_bound` rows — whose merge is
# union + ONE aggregate applying an associative+commutative combiner:
#
#   CMS cells            (r, bucket) -> count      combine = sum
#   counting bloom       (pos)       -> counter    combine = sum (drop 0)
#   dynamic bloom bits   (epoch,pos) -> bit        combine = max (OR)
#   MinHash signatures   (id, i)     -> min-hash   combine = min
#   HLL registers        (grp, reg)  -> max-rho    combine = max
#   KMV hash set         (grp)       -> hv rows    combine = k-min truncate
#
# grid_merge is that one aggregate; the per-family wrappers delegate to
# it (KMV adds the rank<=k truncation after). The shared property —
# build(A union B) == merge(build(A), build(B)) — is asserted over ALL
# families by tests/test_sketch_contract.py, which is what makes the
# next sketch a ~50-line addition.


def grid_merge(grids: list[DataFrame], coords: list[str],
               value_col: str, how: str = "sum",
               drop_zero: bool = False) -> DataFrame:
    """Merge sketch grids cell-wise: union + groupBy(coords) + the
    family's associative combiner. Shuffle is bounded by the grid size
    (sum of state bounds), never the data size."""
    agg = {"sum": F.sum, "min": F.min, "max": F.max}[how]
    u = grids[0]
    for g in grids[1:]:
        u = u.unionByName(g)
    out = (u.groupBy(*coords)
            .agg(agg(value_col).cast("long").alias(value_col)))
    if drop_zero:
        out = out.filter(F.col(value_col) != 0)
    return out


def kmv_merge(sketch_a: DataFrame, sketch_b: DataFrame,
              k: int = 256) -> DataFrame:
    """Exact KMV merge: per group, the k smallest of the two sketches'
    hash union (Beyer et al. 2007 mergeability) — the grid union plus
    the family's k-min truncation. <= 2k rows per group pre-truncate."""
    from pyspark.sql.window import Window
    u = (sketch_a.select("grp", "hv")
                 .unionByName(sketch_b.select("grp", "hv"))
                 .distinct())
    w = Window.partitionBy("grp").orderBy("hv")
    return (u.withColumn("_rk", F.row_number().over(w))
             .filter(F.col("_rk") <= k)
             .select("grp", "hv", "_rk"))


# --- HyperLogLog-style register grid (the merge contract's 50-line test) --

HLL_HASH_BITS = 52   # 13 md5 nibbles — the same domain as KMV


def hll_registers(df: DataFrame, group_col: str, key_col: str,
                  p: int = 8) -> DataFrame:
    """HLL-style register grid per group (public: Flajolet et al. 2007):
    m = 2^p registers; each distinct key hashes to register h mod m and
    contributes rho = (trailing zeros of the remaining 52-p bits) + 1;
    the register stores the MAX rho seen. O(m) state per group forever,
    merge = cell-wise max (grid_merge how='max').

    Engine-portable integer arithmetic only: the trailing-zero rank is
    bit_count((w & -w) - 1) + 1 — DuckDB evaluates the identical
    expression, so the driver oracle hash-proves the GRID itself (the
    float alpha*m^2/S estimate is a driver-side final step; its
    accuracy envelope is asserted in pytest, the integer harmonic
    denominator S is exposed by hll_census for oracles)."""
    m = 1 << p
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 13),
               16, 10).cast("long")
    w = F.shiftright(h, p)      # remaining 52-p bits (integer-pure)
    rho = (F.when(w == 0, F.lit(HLL_HASH_BITS - p + 1))
            .otherwise(F.bit_count((w.bitwiseAND(-w)) - 1) + 1))
    return (df.select(F.col(group_col).alias("grp"),
                      F.pmod(h, F.lit(m)).alias("reg"),
                      rho.alias("rho"))
              .groupBy("grp", "reg")
              .agg(F.max("rho").cast("long").alias("rho")))


def hll_census(grid: DataFrame, p: int = 8) -> DataFrame:
    """Integer digest of an HLL grid per group: registers used, sum of
    ranks, and the harmonic denominator S = sum over PRESENT registers
    of 2^(53-p-rho) — the true 2^-rho harmonic terms scaled by a COMMON
    2^(53-p), so even the saturated register (rho = 53-p, from w == 0)
    lands exactly on 2^0 and every term is integer-representable: no
    clamp, no bias (a round-6 draft clamped the saturated exponent at 0,
    overstating S; scaling the grid by 2 made the clamp unnecessary).
    Exact int64: each term <= 2^(52-p), <= 2^p terms. An estimate is
    alpha_m * m^2 / (S + n_absent * 2^(53-p)) scaled by 2^(53-p) —
    driver-side floats, deliberately outside the grid."""
    # 2^shift via pow: exact in double for shift <= 52, then BIGINT
    # (shiftleft needs a literal bit count; the exponent is a column).
    # rho ranges 1 .. 53-p so the exponent is always >= 0.
    term = F.expr(f"CAST(pow(2.0, {HLL_HASH_BITS + 1 - p} - rho) "
                  f"AS BIGINT)")
    return (grid.groupBy("grp")
                .agg(F.count("*").alias("n_regs"),
                     F.sum("rho").cast("long").alias("sum_rho"),
                     F.sum(term).cast("long").alias("harmonic_s"))
                .orderBy("grp"))


def hll_estimate(census_row, p: int = 8) -> float:
    """Driver-side HLL estimate from a census row (floats allowed here
    — this never enters an oracle-hashed column)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    n_absent = m - census_row["n_regs"]
    scale = 1 << (HLL_HASH_BITS + 1 - p)    # grid terms are 2^(53-p-rho)
    s = census_row["harmonic_s"] + n_absent * scale
    return alpha * m * m * scale / s


def cms_inner_product(cells_a: DataFrame, cells_b: DataFrame,
                      depth: int = DEPTH) -> DataFrame:
    """JOIN-SIZE ESTIMATION from two CMS grids (the AMS/CMS inner-
    product estimator, Cormode & Muthukrishnan 2005 §4.2): for each
    hash row r, S_r = sum over buckets of a_cell * b_cell; the
    estimate is min over rows. Always an UPPER BOUND on the true join
    cardinality sum_v f_A(v) * f_B(v) (all counts are non-negative, so
    collisions only add) — the query-optimizer primitive that sizes
    |A join B| from two O(depth*width) summaries without touching
    either table again. Integer-exact: both engines reproduce the
    estimate bit-for-bit. One row out: (est_join_size)."""
    a = cells_a.select("r", "bucket", F.col("c").alias("a"))
    b = cells_b.select("r", "bucket", F.col("c").alias("b"))
    per_row = (a.join(b, ["r", "bucket"])            # missing cells = 0 term
                .groupBy("r")
                .agg(F.sum(F.col("a") * F.col("b")).alias("s")))
    return per_row.agg(F.min("s").cast("long").alias("est_join_size"))


def kmv_difference_ppm(sketch_a: DataFrame, sketch_b: DataFrame,
                       k: int = 256) -> DataFrame:
    """Set-DIFFERENCE estimate |A \\ B| from two KMV sketches — the
    third theta-sketch set operation (union and intersection live in
    kmv_overlap_ppm): over the merged k smallest hashes,
    |A \\ B| ~ |U| * (hashes present in A only) / k. Same overflow-safe
    split-div arithmetic, same exact path below k. One row out:
    (n_kept, n_a_only, est_union, est_difference)."""
    from pyspark.sql.window import Window
    a = sketch_a.select("hv").withColumn("_in_a", F.lit(1))
    b = sketch_b.select("hv").withColumn("_in_b", F.lit(1))
    u = (a.join(b, "hv", "full")
          .select("hv",
                  F.coalesce("_in_a", F.lit(0)).alias("ina"),
                  F.coalesce("_in_b", F.lit(0)).alias("inb")))
    w = Window.orderBy("hv")   # <= 2k rows by construction (two sketches)
    m = (u.withColumn("_rk", F.row_number().over(w))
          .filter(F.col("_rk") <= k))
    return (m.agg(F.count("*").alias("n_kept"),
                  F.max(F.when(F.col("_rk") == k, F.col("hv"))).alias("kth"),
                  F.sum(F.expr("CASE WHEN ina = 1 AND inb = 0 "
                               "THEN 1 ELSE 0 END")).alias("n_a_only"))
             .select(
                 F.col("n_kept").cast("long").alias("n_kept"),
                 F.col("n_a_only").cast("long").alias("n_a_only"),
                 F.when(F.col("n_kept") < k, F.col("n_kept"))
                  .otherwise(F.expr(
                      f"CAST(({k} - 1) * {KMV_DOMAIN} div kth AS BIGINT)"))
                  .cast("long").alias("est_union"),
                 F.when(F.col("n_kept") < k, F.col("n_a_only"))
                  .otherwise(F.expr(
                      f"CAST(((({k} - 1) * {KMV_DOMAIN} div kth) div {k})"
                      f" * n_a_only + ((({k} - 1) * {KMV_DOMAIN} div kth)"
                      f" % {k}) * n_a_only div {k} AS BIGINT)"))
                  .cast("long").alias("est_difference")))


# --- dyadic-CMS quantile sketch (range-query CMS, C&M 2005 §4.3) ---------
#
# The missing quantile family on the grid contract: one CMS per dyadic
# LEVEL of an integer value domain [0, 2^bits). Cell coords are
# (level, r, bucket) with combine = SUM, so — unlike GK/KLL whose
# compaction is order-dependent — the merge law
# build(A ∪ B) == grid_merge(build(A), build(B)) holds EXACTLY
# (tests/test_sketch_contract.py). rank(t) = Σ over the ≤(bits-min_level)
# dyadic intervals of [0, t) of the CMS point estimate; a quantile is a
# rank crossing over a boundary panel (the equidepth_histogram shape).
# Estimates never underestimate (sums of CMS overestimates) and exceed
# the true rank by at most levels · εN with ε = e/width — both emitted
# as checked booleans by the cms_quantiles query, not asserted.


def _dyadic_row_buckets(level_col, key_col, depth: int, width: int):
    """Array of (r, bucket) for one dyadic key: the depth row-hashes
    are the DISJOINT 7-nibble slices of ONE md5 of 'level:key' — one
    hash per key instead of depth (md5 output bits are independent,
    the same justification as the repo's 52-bit KMV slice; needs
    7·depth ≤ 32 nibbles, i.e. depth ≤ 4)."""
    assert depth * 7 <= 32
    hx = F.md5(F.concat_ws(":", level_col.cast("string"),
                           key_col.cast("string")))
    return F.array(*[
        F.struct(F.lit(r).alias("r"),
                 F.pmod(F.conv(F.substring(hx, 7 * r + 1, 7), 16, 10)
                         .cast("long"), F.lit(width)).alias("bucket"))
        for r in range(depth)])


def _dyadic_level_keys(value_col: str, bits: int, min_level: int):
    """Array of (level, key = value >> level) structs for one row — the
    SHARED level-key derivation (batch build and the streaming twin
    must stay in lockstep for the stream ≡ batch grid equality)."""
    return F.array(*[
        F.struct(F.lit(lv).alias("level"),
                 F.expr(f"{value_col} div CAST(pow(2.0, {lv}) AS BIGINT)")
                  .alias("key"))
        for lv in range(min_level, bits)])


def dyadic_cms_cells(df: DataFrame, value_col: str, bits: int,
                     min_level: int = 0, depth: int = DEPTH,
                     width: int = WIDTH) -> DataFrame:
    """(level, r, bucket, c): a CMS grid per dyadic level l in
    [min_level, bits) over integer values in [0, 2^bits). The level-l
    key of value v is v >> l. Build order matters at scale: rows first
    collapse to the per-level KEY histogram (one integer-only keyed
    count — level l has at most 2^(bits-l) ≤ distinct(v) keys, so this
    shuffle is bounded by the value histogram, the equidepth_histogram
    discipline), and only the ≤ Σ 2^(bits-l) distinct keys are md5'd
    (via _dyadic_row_buckets — one md5 per key, nibble-split into the
    depth row-buckets). The first draft hashed every (row, level, r)
    triple: 192M md5 calls at sf1 vs ~2k here, 45 s → ~2 s. Final
    state ≤ (bits-min_level) × depth × width rows regardless of data.
    min_level > 0 trades rank resolution (queries must align to
    2^min_level) for proportionally less pre-aggregate state."""
    keys = _dyadic_level_keys(value_col, bits, min_level)
    kh = (df.select(F.explode(keys).alias("k"))
            .select("k.level", "k.key")
            .groupBy("level", "key").agg(F.count("*").alias("cnt")))
    rb = _dyadic_row_buckets(F.col("level"), F.col("key"), depth, width)
    return (kh.select("level", "cnt", F.explode(rb).alias("b"))
              .select("level", "b.r", "b.bucket", "cnt")
              .groupBy("level", "r", "bucket")
              .agg(F.sum("cnt").cast("long").alias("c")))


def dyadic_cms_merge(*grids: DataFrame) -> DataFrame:
    """Merge dyadic-CMS quantile sketches — plain cell-wise sum on the
    shared grid contract (counts are additive per level exactly as for
    the flat CMS)."""
    return grid_merge(list(grids), ["level", "r", "bucket"], "c",
                      how="sum")


def dyadic_rank_estimates(cells: DataFrame, thresholds: DataFrame,
                          bits: int, min_level: int = 0,
                          depth: int = DEPTH,
                          width: int = WIDTH) -> DataFrame:
    """Estimated rank (# values < t) for every threshold row
    (column ``t``, a multiple of 2^min_level in (0, 2^bits)): decompose
    [0, t) into its dyadic intervals — one per SET BIT of t at level
    l ≥ min_level, interval id (t >> l) - 1 — probe each through the
    level's CMS (min over depth rows, absent cell = 0), sum the
    estimates. Relational end-to-end: the grid is broadcast, the panel
    never shuffles. Output: (t, est_rank)."""
    probes = F.array(*[
        F.struct(F.lit(lv).alias("level"),
                 F.expr(f"t div CAST(pow(2.0, {lv}) AS BIGINT)")
                  .alias("shifted"))
        for lv in range(min_level, bits)])
    p = (thresholds.select("t", F.explode(probes).alias("p"))
                   .select("t", "p.level", "p.shifted")
                   .filter(F.col("shifted") % 2 == 1)
                   .withColumn("key", F.col("shifted") - 1))
    rb = _dyadic_row_buckets(F.col("level"), F.col("key"), depth, width)
    p = (p.select("t", "level", F.explode(rb).alias("b"))
          .select("t", "level", "b.r", "b.bucket"))
    est = (p.join(F.broadcast(cells), ["level", "r", "bucket"], "left")
            .withColumn("cc", F.coalesce("c", F.lit(0)))
            .groupBy("t", "level").agg(F.min("cc").alias("e"))
            .groupBy("t").agg(F.sum("e").cast("long").alias("est_rank")))
    return est


# --- Misra–Gries mergeable heavy-hitter summary ---------------------------


def mg_truncate(counts: DataFrame, shard_col: str = "shard",
                term_col: str = "term", cnt_col: str = "c",
                k: int = 16) -> DataFrame:
    """One Misra–Gries reduction per shard: subtract the (k+1)-th
    largest counter value c' from every counter and keep the strictly
    positive remainders. At most k counters survive (only ranks 1..k
    can exceed c'), and the step is deterministic on VALUES alone —
    survivors are exactly {cnt > c'}, so rank-ties need no tie-break
    (the value at rank k+1 is the same under any tie order). The
    window partitions by shard and every input shard holds at most a
    per-shard key histogram (round 0) or ≤ 2k merged counters (later
    rounds) — never a global single-partition sort."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(shard_col).orderBy(F.col(cnt_col).desc(),
                                              term_col)
    # c' rides a second window over the SAME partitioning — one sorted
    # exchange, no aggregate + join back (4 fewer stages per round; the
    # merge tree has log2(shards)+1 rounds of this).
    wp = Window.partitionBy(shard_col)
    cp = F.max(F.when(F.row_number().over(w) == k + 1, F.col(cnt_col))
                .otherwise(F.lit(0))).over(wp)
    return (counts.withColumn("_cp", cp)
                  .select(shard_col, term_col,
                          (F.col(cnt_col) - F.col("_cp")).alias(cnt_col))
                  .filter(F.col(cnt_col) > 0))


def mg_merge(a: DataFrame, b: DataFrame, term_col: str = "term",
             cnt_col: str = "c", k: int = 16) -> DataFrame:
    """Merge two MG(k) summaries (single-shard frames): pointwise sum,
    then one truncation — the mergeable-summaries MERGE (Agarwal,
    Cormode, Huang, Phillips, Wei, Yi 2012 §3.1: the combined error
    telescopes to ≤ n/(k+1) under ANY merge tree). Bounded: inputs are
    ≤ k rows each, output ≤ k rows."""
    both = (a.select(term_col, cnt_col)
             .unionByName(b.select(term_col, cnt_col))
             .groupBy(term_col).agg(F.sum(cnt_col).cast("long")
                                     .alias(cnt_col))
             .withColumn("_shard", F.lit(0)))
    return (mg_truncate(both, "_shard", term_col, cnt_col, k)
            .drop("_shard"))


def mg_hashed_summary(toks: DataFrame, term_col: str = "term",
                      n_shards: int = 8, k: int = 16,
                      cnt_col: str = "c") -> DataFrame:
    """MG(k) summary of an UNSHARDED token frame: hash-shard the terms
    (pmod(hash(term), n_shards) — every term lands in exactly one
    shard, so per-shard histograms are exact partials) and run the
    ``mg_sharded_summary`` truncate-and-merge tree. This is the entry
    point callers without a natural shard column use — in particular
    the streaming twin's per-batch summary, which previously truncated
    the whole batch vocabulary under one window partition (a global
    single-partition sort per micro-batch, contradicting mg_truncate's
    own contract; round-8 ADVICE)."""
    sharded = toks.withColumn(
        "_shard", F.pmod(F.hash(F.col(term_col)), F.lit(n_shards))
                   .cast("int"))
    return mg_sharded_summary(sharded, term_col, "_shard", n_shards, k,
                              cnt_col)


def mg_sharded_summary(toks: DataFrame, term_col: str = "term",
                       shard_col: str = "shard", n_shards: int = 8,
                       k: int = 16, cnt_col: str = "c") -> DataFrame:
    """MG(k) heavy-hitter summary of a sharded stream, fully
    relational: per-shard exact key histogram (ONE keyed aggregate with
    map-side combine — the only data-proportional pass; an exact
    histogram is an MG summary with zero error), per-shard truncation
    to ≤ k counters, then log2(n_shards) unrolled binary-tree merge
    rounds (shard ← shard div 2; sum + truncate). Every round after the
    first histogram touches ≤ n_shards × k rows, so the whole merge
    tree is metadata-sized regardless of data volume; at 1000 executors
    n_shards is the partition count and the tree is log-depth. Final
    guarantee (undercount ≤ n/(k+1); every item with true count >
    n/(k+1) survives) rides as checked booleans in the registered
    query. Returns (term, c) with shard eliminated."""
    if n_shards & (n_shards - 1):
        raise ValueError("n_shards must be a power of two")
    h = (toks.groupBy(shard_col, term_col)
             .agg(F.count("*").cast("long").alias(cnt_col)))
    s = mg_truncate(h, shard_col, term_col, cnt_col, k)
    n = n_shards
    while n > 1:
        n //= 2
        m = (s.withColumn(shard_col, F.expr(f"{shard_col} div 2"))
              .groupBy(shard_col, term_col)
              .agg(F.sum(cnt_col).cast("long").alias(cnt_col)))
        s = mg_truncate(m, shard_col, term_col, cnt_col, k)
    return s.drop(shard_col)
