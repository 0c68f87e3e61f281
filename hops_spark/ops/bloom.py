"""Counting / Dynamic bloom filters as mergeable integer grids.

Reference semantics (public Hadoop util.bloom family):
- ``CountingBloomFilter`` (hadoop-common-project/hadoop-common/src/main/
  java/org/apache/hadoop/util/bloom/CountingBloomFilter.java): k hashed
  cells per key hold COUNTERS — add increments, delete decrements,
  membership = all k counters nonzero, and ``approximateCount`` is the
  min over the key's cells (the CBF estimate).
- ``DynamicBloomFilter`` (.../bloom/DynamicBloomFilter.java): a growing
  LIST of bloom filters — each holds ``nr`` keys, a full filter is
  frozen and a fresh one appended, membership ORs across the list. The
  error rate stays bounded as the key stream grows.

DataFrame model (the ops/sketch.py CMS pattern): a filter is a sparse
grid of (pos, cnt) rows — at most ``m`` rows regardless of how many
keys were inserted (``m * n_epochs`` for the dynamic variant), so the
grid is always broadcastable driver-free state. Grids MERGE EXACTLY by
summing counters cell-wise (union of filters = grid union + sum), which
is what makes them distributable: build per-partition / per-day grids
independently, merge by aggregation — no sequential filter object.

Cell hashing is md5-derived (engine-portable: the DuckDB oracle
recomputes every cell), mirroring the reference's hash-family-by-index
contract (``Key`` hashed k times with distinct function indices).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_positions(key: Column, m: int, k: int,
                    seed: str = "bloom") -> Column:
    """array<long> of the key's k cell positions: pos_i =
    md5(seed|key|i) mod m — 60 bits of the digest, engine-portable
    (DuckDB: ('0x'||substring(md5(...),1,15))::BIGINT % m)."""
    return F.array(*[
        F.pmod(
            F.conv(F.substring(
                F.md5(F.concat_ws("|", F.lit(seed), key, F.lit(str(i)))),
                1, 15), 16, 10).cast("long"),
            F.lit(m))
        for i in range(k)])


def counting_grid(updates: DataFrame, key_col: str, m: int, k: int,
                  weight_col: str | None = None,
                  seed: str = "bloom") -> DataFrame:
    """Build a counting-bloom grid from (key [, weight]) rows: weight
    +1 per add, -1 per delete (CountingBloomFilter.add/delete). One
    explode (k rows/key, map-side) + ONE keyed aggregate whose output
    is <= m rows — the shuffle is bounded by the grid size, not the
    key count. Zero-net cells are dropped (sparse form)."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = (updates.select(F.explode(bloom_positions(
                 F.col(key_col), m, k, seed)).alias("pos"),
                 w.alias("_w")))
    return (cells.groupBy("pos")
                 .agg(F.sum("_w").cast("long").alias("cnt"))
                 .filter(F.col("cnt") != 0))


def merge_grids(*grids: DataFrame) -> DataFrame:
    """Exact cell-wise merge (filter union): sum counters per pos.
    Delegates to the shared mergeable-grid contract (ops/sketch)."""
    from hops_spark.ops.sketch import grid_merge
    return grid_merge(list(grids), ["pos"], "cnt", how="sum",
                      drop_zero=True)


def counting_membership(grid: DataFrame, probes: DataFrame,
                        probe_col: str, m: int, k: int,
                        seed: str = "bloom") -> DataFrame:
    """Probe a counting grid: member = every one of the key's k cells
    has cnt >= 1; approx_cnt = min over the cells (the CBF
    approximateCount estimate — an upper bound on insert count). The
    grid (<= m rows) broadcasts; probes never shuffle."""
    pc = (probes.select(F.col(probe_col).alias("probe_key"))
                .withColumn("pos", F.explode(bloom_positions(
                    F.col("probe_key"), m, k, seed))))
    j = (pc.join(F.broadcast(grid), "pos", "left")
           .select("probe_key",
                   F.coalesce(F.col("cnt"), F.lit(0)).alias("c")))
    return (j.groupBy("probe_key")
             .agg((F.min("c") >= 1).cast("long").alias("member"),
                  F.min("c").cast("long").alias("approx_cnt")))


def dynamic_bloom_bits(inserts: DataFrame, key_col: str, order_col: str,
                       nr: int, m: int, k: int,
                       seed: str = "dyn") -> DataFrame:
    """DynamicBloomFilter build: keys in ``order_col`` order fill
    epochs of ``nr`` keys; epoch e's filter is the DISTINCT (epoch,
    pos) bit set. The global insertion rank uses the two-phase
    total-order rank (no single-partition window — DynamicBloomFilter's
    'append a new filter every nr keys' is a sequential contract made
    scale-safe). Output <= n_epochs * m rows."""
    from hops_spark.ops.sort import total_order_rank
    ranked = total_order_rank(
        inserts.select(F.col(key_col).alias("_key"), order_col),
        order_col, rank_col="_rn")
    epoch = ((F.col("_rn") - 1) / nr).cast("long")
    return (ranked.select(epoch.alias("epoch"), F.col("_key"))
                  .withColumn("pos", F.explode(bloom_positions(
                      F.col("_key"), m, k, seed)))
                  .select("epoch", "pos")
                  .distinct())


def dynamic_membership(bits: DataFrame, probes: DataFrame,
                       probe_col: str, m: int, k: int,
                       seed: str = "dyn") -> DataFrame:
    """Probe a dynamic filter list: a key is a member iff SOME epoch's
    filter has all k of its bits set (DynamicBloomFilter.membershipTest
    ORs the row of filters); epochs_hit counts how many do. Distinct
    hash indices are counted per (key, epoch) so two hash functions
    colliding on one cell don't fake a full match."""
    pc = (probes.select(F.col(probe_col).alias("probe_key"))
                .withColumn("_i", F.explode(F.array(
                    *[F.lit(i) for i in range(k)])))
                .withColumn("pos", F.element_at(bloom_positions(
                    F.col("probe_key"), m, k, seed), F.col("_i") + 1)))
    hits = (pc.join(F.broadcast(bits), "pos")
              .groupBy("probe_key", "epoch")
              .agg(F.countDistinct("_i").alias("_k_hit"))
              .filter(F.col("_k_hit") == k)
              .groupBy("probe_key")
              .agg(F.count("*").cast("long").alias("epochs_hit")))
    return (probes.select(F.col(probe_col).alias("probe_key"))
                  .join(hits, "probe_key", "left")
                  .select("probe_key",
                          F.when(F.col("epochs_hit").isNull(), F.lit(0))
                           .otherwise(F.lit(1)).cast("long").alias("member"),
                          F.coalesce("epochs_hit", F.lit(0)).cast("long")
                           .alias("epochs_hit")))


def retouch_grid(grid: DataFrame, inserts: DataFrame, fp_keys: DataFrame,
                 key_col: str, m: int, k: int,
                 seed: str = "bloom") -> DataFrame:
    """RetouchedBloomFilter semantics (util/bloom/RetouchedBloomFilter
    .java: selectively CLEAR bits to remove known false positives,
    trading bounded false negatives for them — the 'minimum ratio'
    selection clears, per FP key, the bit that damages the fewest
    inserted keys). Grid model: per FP key pick its cell with the
    LOWEST insert count (ties: lowest pos) and zero it.

    Cost shape: cell usage counts come from one bounded aggregate over
    the insert log (<= m rows, broadcast); the FP argmin is a
    per-FP-key min over k cells. Output: the retouched grid."""
    usage = counting_grid(inserts, key_col, m, k, seed=seed)
    fp = (fp_keys.select(F.col(key_col).alias("_fk"))
                 .withColumn("pos", F.explode(bloom_positions(
                     F.col("_fk"), m, k, seed))))
    ranked = (fp.join(F.broadcast(usage), "pos", "left")
                .select("_fk", "pos",
                        F.coalesce("cnt", F.lit(0)).alias("_use")))
    w_min = (ranked.groupBy("_fk")
                   .agg(F.min(F.struct("_use", "pos")).alias("_pick"))
                   .select(F.col("_pick.pos").alias("pos"))
                   .distinct())
    return (grid.join(F.broadcast(w_min), "pos", "left_anti"))


def bloom_bitmask(dim_keys: DataFrame, key_col: str, m: int, k: int,
                  seed: str = "bjoin") -> list[int]:
    """Driver-side bloom bitmask from the DIM side's keys: m bits
    packed into m/32 int words (codebook-sized metadata, like an IVF
    centroid table — the build aggregate emits <= m distinct positions
    before the collect)."""
    poss = (dim_keys.select(F.explode(bloom_positions(
                F.col(key_col), m, k, seed)).alias("pos"))
                    .distinct().collect())
    words = [0] * ((m + 31) // 32)
    for r in poss:
        p = int(r["pos"])
        words[p // 32] |= 1 << (p % 32)
    return words


def bloom_join_filter(fact_key, mask_words: list[int], m: int, k: int,
                      seed: str = "bjoin"):
    """Boolean Column: does ``fact_key`` pass the bloom bitmask? The
    BLOOM-JOIN pre-filter (the runtime-filter pattern Spark's AQE
    InjectRuntimeFilter applies automatically, here explicit and
    engine-portable): the mask rides as ONE literal int-array, the
    probe is k md5 cell tests evaluated MAP-SIDE in the fact scan —
    non-matching fact rows die before any shuffle. At 100 TB this is
    the difference between shuffling the full fact table and shuffling
    ~selectivity of it; false positives (the bloom FP rate) are
    eliminated by the real join afterwards, so the compose is exact.

    Bit test in portable integer arithmetic: word div 2^(pos%32) % 2
    (pow(2, <=31) is exact in double; shiftright needs a literal bit
    count, the position is a column)."""
    mask = F.lit(mask_words)
    pos = bloom_positions(fact_key, m, k, seed)

    def bit_set(p):
        word = F.element_at(mask, (p / 32).cast("int") + 1).cast("long")
        # word / 2^j is EXACT in double (pure exponent shift), so the
        # floor is the true shifted word; % 2 extracts the bit.
        power = F.pow(F.lit(2.0), F.pmod(p, F.lit(32)).cast("double")) \
                 .cast("long")
        return F.pmod(F.floor(word / power).cast("long"), F.lit(2)) == 1

    return F.forall(pos, bit_set)
