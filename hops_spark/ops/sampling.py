"""Deterministic sampling / data-mixing operators (training-data
pipeline; superset of the reference's sampling surface — InputSampler's
RandomSampler and SequenceFileInputFilter.PercentFilter are the §2.5 /
§2.1 ancestors, io/readers.filter_percent is the direct parity op).

Everything here samples by HASH, not by rand(): md5(id + salt) folded to
an integer in [0, 1e6) and compared against a ppm threshold. That makes
sampling (a) reproducible run-to-run and engine-to-engine (the DuckDB
oracle recomputes the identical decision), (b) stable under retries and
partition reshuffles — a rand() sample re-rolls per task attempt, which
at 100 TB means a re-executed task yields a DIFFERENT corpus slice, and
(c) map-only: no shuffle, no driver coordination, cost is one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def hash_bucket_ppm(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform bucket in [0, 1e6): first 7 md5 nibbles of
    'salt|id' mod 1e6 — identical arithmetic in DuckDB."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(salt),
                                             col.cast("string"))), 1, 7),
               16, 10).cast("long"),
        F.lit(PPM))


def hash_sample(df: DataFrame, id_col: str, fraction_ppm: int,
                salt: str = "") -> DataFrame:
    """Keep rows whose hash bucket < fraction_ppm (≈ fraction_ppm/1e6 of
    the data, exactly reproducible)."""
    return df.filter(hash_bucket_ppm(id_col, salt) < fraction_ppm)


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      fractions_ppm: dict[str, int],
                      default_ppm: int = 0, salt: str = "") -> DataFrame:
    """Per-stratum hash sampling — the data-mixing primitive: strata not
    named in ``fractions_ppm`` keep ``default_ppm``. One scan, map-only;
    the when-chain is a broadcast-free JVM expression (strata counts are
    small by contract — sources/domains, not keys)."""
    thr = F.lit(default_ppm)
    for stratum, ppm in sorted(fractions_ppm.items()):
        thr = F.when(F.col(strata_col) == stratum, F.lit(ppm)).otherwise(thr)
    return df.filter(hash_bucket_ppm(id_col, salt) < thr)


def mixture_plan(df: DataFrame, strata_col: str, weight_col: str,
                 target_ppm: dict[str, int],
                 default_ppm: int = 0) -> DataFrame:
    """Data-mixing plan: given target mixture proportions (ppm of the
    OUTPUT weight, e.g. token budget shares), compute each stratum's
    keep-fraction so the sampled corpus hits the target ratios without
    upsampling (the largest-surplus stratum caps at 1e6 and the others
    scale to it). Returns per-stratum accounting:
    (stratum, weight, weight_share_ppm, target_ppm, keep_ppm).

    Pure INTEGER-division ppm arithmetic end-to-end (Spark `div` ≡
    DuckDB `//`), so the oracle matches bit-for-bit. The global windows
    run over the per-stratum AGGREGATE (one row per source/domain —
    tiny), never over the corpus, so the single-partition window is
    contractually fine."""
    per = (df.groupBy(F.col(strata_col).alias("stratum"))
             .agg(F.sum(F.col(weight_col).cast("long")).alias("weight")))
    tgt = F.lit(default_ppm)
    for stratum, ppm in sorted(target_ppm.items()):
        tgt = F.when(F.col("stratum") == stratum, F.lit(ppm)).otherwise(tgt)
    from pyspark.sql.window import Window
    w = Window.partitionBy()
    # keep_i ∝ target_i / share_i, scaled so max_i keep_i == 1e6
    per = (per.withColumn("_total", F.sum("weight").over(w))
              .withColumn("weight_share_ppm",
                          F.expr(f"weight * {PPM} div _total"))
              .withColumn("target_ppm", tgt.cast("long"))
              .withColumn("_ratio",
                          F.expr(f"target_ppm * {PPM} div "
                                 f"greatest(weight_share_ppm, 1)"))
              .withColumn("_maxr", F.max("_ratio").over(w))
              .withColumn("keep_ppm",
                          F.expr(f"_ratio * {PPM} div greatest(_maxr, 1)")))
    return per.drop("_total", "_ratio", "_maxr")


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    id_col: str, salt: str = "") -> DataFrame:
    """k-item weighted-without-replacement sample by sequential-Poisson
    priorities (public: Ohlsson 1998; Duffield et al.'s priority
    sampling is the same family): priority = uniform-int-hash div
    weight; the k SMALLEST priorities form an (approximately)
    probability-proportional-to-size sample, ties broken by id.

    Pure BIGINT arithmetic (`div`), so any engine reproduces the exact
    sample — no float pow/ln anywhere (the classic u^(1/w) key is not
    bit-stable across math libraries). Spark executes orderBy().limit(k)
    as TakeOrdered — per-partition top-k heaps, no global sort shuffle;
    cost is one scan + a k-row driver merge."""
    return (df.withColumn("_h", hash_bucket_ppm(id_col, salt))
              .withColumn("priority",
                          F.expr(f"(_h * {PPM}) div "
                                 f"greatest(CAST({weight_col} AS BIGINT), 1)"))
              .drop("_h")
              .orderBy("priority", id_col)
              .limit(k))


def split_assign(df: DataFrame, id_col: str, salt: str = "split",
                 train_ppm: int = 900_000, val_ppm: int = 50_000) -> DataFrame:
    """Deterministic train/val/test assignment — the dataset-split
    primitive every training pipeline needs. The hash bucket decides the
    split, so membership is (a) stable across runs/engines/retries,
    (b) disjoint and exhaustive by construction, (c) map-only (adding a
    column to a scan; no shuffle, no global coordination). An id landing
    in `test` can never migrate to `train` when the corpus grows — the
    property rand()-splits lack and the reason leakage audits demand
    hash splits."""
    b = hash_bucket_ppm(id_col, salt)
    return df.withColumn(
        "split",
        F.when(b < train_ppm, F.lit("train"))
         .when(b < train_ppm + val_ppm, F.lit("val"))
         .otherwise(F.lit("test")))


def source_token_budget(df: DataFrame, strata_col: str, weight_col: str,
                        budget: int, id_col: str, salt: str = "cap") -> DataFrame:
    """Per-source token-budget capping: within each source/domain, keep
    documents in deterministic hash-priority order until the cumulative
    token count reaches ``budget`` (a doc that STARTS under budget is
    kept whole — the C4/RefinedWeb-style per-domain downsampling rule
    that stops a single giant domain from dominating the mixture).
    Returns the kept rows plus their priority rank and running total.

    Scale: the cumulative sum is a per-source window — a sort within
    each source's partition. Sources are domains (many, so partitions
    balance); for a pathological mega-source the two-phase
    percentile-threshold shape (quality_filter_by_source) or
    total_order_prefix_sum per source is the escape hatch — the
    sequential budget scan is inherent to the "keep whole docs in
    priority order" semantics, not to this implementation."""
    from pyspark.sql.window import Window
    w = (Window.partitionBy(strata_col)
               .orderBy("_pri", id_col)
               .rowsBetween(Window.unboundedPreceding, 0))
    return (df.withColumn("_pri", hash_bucket_ppm(id_col, salt))
              .withColumn("cum_weight",
                          F.sum(F.col(weight_col).cast("long")).over(w))
              .filter(F.col("cum_weight") - F.col(weight_col) < budget)
              .drop("_pri"))


DSIR_BUCKETS = 1024


def dsir_weights(docs: DataFrame, target_pred: Column,
                 id_col: str = "doc_id", text_col: str = "text",
                 buckets: int = DSIR_BUCKETS) -> DataFrame:
    """DSIR-style importance weights for data selection (public: Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): score every document by how target-like its hashed
    n-gram feature distribution is — weight(d) = Σ_tokens
    [ln p_target(bucket) - ln p_raw(bucket)] — then resample by
    weight. Here features are md5-hashed unigrams into ``buckets``
    bins, p's are add-one-smoothed bucket frequencies from the
    target/raw corpus splits, and each per-bucket log-ratio is snapped
    to integer micro-nats BEFORE the per-doc sum (the ops/lm.py
    determinism contract: order-free integer aggregation).

    Shuffles: one token aggregate per side for the bucket tables
    (bounded by ``buckets`` rows — broadcast back), one per-doc sum.
    Output: (id, is_target, n_tokens, weight_micro). The raw sum is
    length-dominated (longer docs accumulate more log-ratio mass) —
    selection in practice ranks on weight_micro/n_tokens, which this
    fixture confirms directionally (target docs score higher per
    token)."""
    from hops_spark.ops.text import words
    toks = (docs.select(F.col(id_col), target_pred.alias("is_target"),
                        F.explode(words(text_col)).alias("term"))
                .withColumn("b", F.pmod(
                    F.conv(F.substring(F.md5("term"), 1, 8), 16, 10)
                     .cast("long"), F.lit(buckets))))
    counts = (toks.groupBy("b")
                  .agg(F.sum(F.col("is_target").cast("long")).alias("ct"),
                       F.sum((~F.col("is_target")).cast("long")).alias("cr")))
    totals = counts.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr")) \
                   .collect()[0]
    nt, nr = totals["nt"], totals["nr"]
    lr = counts.select(
        "b",
        F.expr(f"CAST(round((ln((ct + 1) / CAST({nt} + {buckets} AS DOUBLE))"
               f" - ln((cr + 1) / CAST({nr} + {buckets} AS DOUBLE)))"
               f" * 1000000, 0) AS BIGINT)").alias("lr_micro"))
    return (toks.join(F.broadcast(lr), "b")
                .groupBy(id_col, "is_target")
                .agg(F.count("*").cast("long").alias("n_tokens"),
                     F.sum("lr_micro").cast("long").alias("weight_micro")))


def bottomk_sample(df: DataFrame, group_col: str, key_col: str,
                   k: int = 128) -> DataFrame:
    """Deterministic bottom-k row sample per group (public min-wise /
    bottom-k sampling, Cohen & Kaplan 2007): keep the k rows with the
    SMALLEST md5(key) — a uniform-without-replacement sample that is
    MERGEABLE exactly like a KMV sketch (bottom-k of a union = k-min
    truncation of per-shard bottom-k samples: the ops/sketch grid
    contract with row payloads), deterministic (any engine recomputes
    the same sample), and O(k) rows per group forever. The quantile
    application: exact quantiles OF THE SAMPLE estimate the group's
    quantiles with ~1/sqrt(k) rank error — a mergeable quantile
    summary with none of the float/fold-order hazards of digest
    sketches. One group-partitioned window over the hash rank."""
    from pyspark.sql.window import Window
    pr = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 13),
                16, 10).cast("long")
    w = Window.partitionBy(group_col).orderBy("_pr", key_col)
    return (df.withColumn("_pr", pr)
              .withColumn("_prk", F.row_number().over(w))
              .filter(F.col("_prk") <= k)
              .drop("_pr", "_prk"))


def quality_budget_head(docs: DataFrame, budget_ppm: int = 300_000,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Global quality-ranked token-budget selection — the data-
    selection step after cleaning (RefinedWeb/DCLM shape: spend a
    fixed token budget on the BEST documents corpus-wide, not a
    uniform sample): rank every document by quality_score_ppm
    descending (doc id tie-break), take the longest prefix whose
    cumulative token count stays within ``budget_ppm`` ppm of the
    corpus's total tokens. A document straddling the boundary is
    dropped (conservative head).

    Distributed shape: one feature pass (quality_score — map-only),
    one 1-row total-tokens aggregate broadcast back, and the TeraSort-
    style two-phase prefix sum over (neg quality, id) — range
    partition + within-partition running sums + <= #partitions offset
    rows to the driver; no single-partition data window, no budget-
    sized collect. The budget comparison is integer cross-
    multiplication (cum * 1e6 <= ppm * total), division-free on both
    engines. Returns (id, quality_score_ppm, n_tokens, cum_tokens)
    for the SELECTED head."""
    from hops_spark.ops.sort import total_order_prefix_sum
    from hops_spark.ops.text import quality_score

    q = quality_score(docs).select(
        F.col(id_col),
        F.col("n_words").cast("long").alias("n_tokens"),
        F.col("quality_score_ppm"))
    tot = q.agg(F.sum("n_tokens").cast("long").alias("_tot"))
    qq = q.withColumn("_neg_q", -F.col("quality_score_ppm"))
    ps = total_order_prefix_sum(qq, "n_tokens", "_neg_q", id_col,
                                out_col="cum_tokens")
    return (ps.crossJoin(F.broadcast(tot))
              .filter(F.col("cum_tokens") * 1_000_000
                      <= F.lit(budget_ppm) * F.col("_tot"))
              .select(id_col, "quality_score_ppm", "n_tokens",
                      "cum_tokens"))
