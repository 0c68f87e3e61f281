"""Engine-utility inventory queries: table profiling (ANALYZE-style
statistics), equi-depth binning, and an integer-exact correlation
matrix.

These are the "statistics jobs" an engine runs over its own tables
(the reference's counters/sampling surface — reference
MR/mapreduce/lib/partition/InputSampler.java:59 samples for the
TotalOrderPartitioner; a warehouse's ANALYZE TABLE does the same scan
with more aggregates). Everything is a single map-side-combined
aggregate or the existing two-phase global rank — no new shuffle
shapes.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hops_spark.io.readers import load_table
from hops_spark.ops.sort import total_order_rank
from hops_spark.registry import register

_N_BINS = 8


@register(
    "equi_depth_bins",
    sql=f"""
    WITH r AS (
        SELECT l_extendedprice AS v,
               row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                                  l_linenumber) AS rk,
               count(*) OVER () AS n
        FROM lineitem
    )
    SELECT ((rk - 1) * {_N_BINS}) // n AS bin,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(v) AS min_price, max(v) AS max_price
    FROM r GROUP BY bin ORDER BY bin
    """,
    doc="Equi-depth (quantile) binning of l_extendedprice into 8 "
        "buckets via the two-phase distributed global rank (TeraSort "
        "shape — range partition + per-partition offsets; NO "
        "single-partition window). bucket = (rank-1)*k div n is exact "
        "integer arithmetic, so bucket boundaries are deterministic "
        "and the oracle reproduces them.",
    tags=("sort", "profiling", "scale"),
)
def equi_depth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth feature binning (the quantile-bucketizer every
    feature pipeline needs): rank comes from ops/sort.total_order_rank
    — the scalable global-rank primitive — and the bucket id is pure
    integer math on (rank, n). The oracle's single window is the
    semantic spec; the Spark plan never materializes a 1-partition
    sort."""
    li = load_table(spark, sf_dir, "lineitem") \
        .select(F.col("l_extendedprice").alias("v"),
                "l_orderkey", "l_linenumber")
    n = li.count()
    ranked = total_order_rank(li, "v", "l_orderkey", "l_linenumber",
                              rank_col="rk")
    return (ranked.withColumn(
                "bin", F.expr(f"(rk - 1) * {_N_BINS} div {n}").cast("bigint"))
            .groupBy("bin")
            .agg(F.count("*").alias("n_rows"),
                 F.min("v").alias("min_price"),
                 F.max("v").alias("max_price"))
            .orderBy("bin"))


# Values are exact cents (bigint per element: worst per-row product is
# price² = (1.1e7)² ≈ 1.2e14 < 2^63), but the SUMS of squares overflow
# int64 beyond ~sf0.01 — so every sum is accumulated in DECIMAL(38,0)
# on the Spark side and HUGEINT (int128, DuckDB's native integer-sum
# widening) on the oracle side; both are exact, and both cast to the
# identical double right before the one sqrt+divide.
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_sql() -> str:
    pairs = list(combinations(_CORR_COLS, 2))
    ints = ",\n               ".join(
        f"CAST(round({c} * 100, 0) AS BIGINT) AS i{k}"
        for k, c in enumerate(_CORR_COLS))
    sums = ",\n               ".join(
        [f"count(*) AS n"]
        + [f"sum(i{k}) AS s{k}" for k in range(len(_CORR_COLS))]
        + [f"sum(i{k} * i{k}) AS q{k}" for k in range(len(_CORR_COLS))]
        + [f"sum(i{_CORR_COLS.index(a)} * i{_CORR_COLS.index(b)})"
           f" AS p{_CORR_COLS.index(a)}_{_CORR_COLS.index(b)}"
           for a, b in pairs])

    def _cell(a: str, b: str) -> str:
        i, j = _CORR_COLS.index(a), _CORR_COLS.index(b)
        return (f"    SELECT '{a}' AS col_a, '{b}' AS col_b, "
                f"round(CAST(n * p{i}_{j} - s{i} * s{j} AS DOUBLE) / "
                f"(sqrt(CAST(n * q{i} - s{i} * s{i} AS DOUBLE)) * "
                f"sqrt(CAST(n * q{j} - s{j} * s{j} AS DOUBLE))), 6)"
                f" AS corr FROM s")

    rows = "\n    UNION ALL\n".join(_cell(a, b) for a, b in pairs)
    return f"""
    WITH ints AS (
        SELECT {ints}
        FROM lineitem
    ), s AS (
        SELECT {sums}
        FROM ints
    )
{rows}
    ORDER BY col_a, col_b
    """


@register(
    "numeric_corr_matrix",
    sql=_corr_sql(),
    doc="Pairwise Pearson correlation of the 4 lineitem numerics from "
        "ONE aggregate of integer sufficient statistics (values are "
        "exact cents, so n/Σx/Σx²/Σxy are bigint-exact and engine-"
        "identical; the final corr is one sqrt+divide on identical "
        "integers — bit-identical IEEE, rounded to 6dp). The ANALYZE-"
        "style column-statistics job without corr()'s float fold-order "
        "nondeterminism.",
    tags=("agg", "profiling", "ml"),
)
def numeric_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    k = len(_CORR_COLS)
    ints = li.select(*[
        F.round(F.col(c) * 100, 0).cast("bigint").alias(f"i{i}")
        for i, c in enumerate(_CORR_COLS)])

    def dec(col):
        return col.cast("decimal(38,0)")

    aggs = ([F.count("*").cast("decimal(38,0)").alias("n")]
            + [F.sum(dec(F.col(f"i{i}"))).alias(f"s{i}") for i in range(k)]
            + [F.sum(dec(F.col(f"i{i}") * F.col(f"i{i}"))).alias(f"q{i}")
               for i in range(k)]
            + [F.sum(dec(F.col(f"i{i}") * F.col(f"i{j}"))).alias(f"p{i}_{j}")
               for i, j in combinations(range(k), 2)])
    s = ints.agg(*aggs)
    # single 1-row aggregate job: all 6 pair correlations materialize
    # from one explode over the sufficient-statistics row (NOT a union
    # of per-pair selects, which would re-run the scan per pair).
    cells = []
    for i, j in combinations(range(k), 2):
        num = (F.col("n") * F.col(f"p{i}_{j}")
               - F.col(f"s{i}") * F.col(f"s{j}")).cast("double")
        den_i = (F.col("n") * F.col(f"q{i}")
                 - F.col(f"s{i}") * F.col(f"s{i}")).cast("double")
        den_j = (F.col("n") * F.col(f"q{j}")
                 - F.col(f"s{j}") * F.col(f"s{j}")).cast("double")
        corr = F.round(num / (F.sqrt(den_i) * F.sqrt(den_j)), 6)
        cells.append(F.struct(F.lit(_CORR_COLS[i]).alias("col_a"),
                              F.lit(_CORR_COLS[j]).alias("col_b"),
                              corr.alias("corr")))
    return (s.select(F.explode(F.array(*cells)).alias("c"))
             .select("c.col_a", "c.col_b", "c.corr")
             .orderBy("col_a", "col_b"))


@register(
    "table_profile",
    sql="""
    SELECT 'l_quantity' AS col, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(l_quantity) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           round(min(l_quantity), 2) AS min_v, round(max(l_quantity), 2) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', CAST(count(*) AS BIGINT),
           CAST(count(l_extendedprice) AS BIGINT),
           CAST(count(DISTINCT l_extendedprice) AS BIGINT),
           round(min(l_extendedprice), 2), round(max(l_extendedprice), 2)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', CAST(count(*) AS BIGINT),
           CAST(count(l_discount) AS BIGINT),
           CAST(count(DISTINCT l_discount) AS BIGINT),
           round(min(l_discount), 2), round(max(l_discount), 2)
    FROM lineitem
    ORDER BY col
    """,
    doc="ANALYZE TABLE-style column profile (row/non-null/distinct "
        "counts, min/max) for three lineitem numerics — one scan, one "
        "multi-distinct aggregate (Spark expands it to an expand+agg, "
        "still a single pass over the scan).",
    tags=("agg", "profiling"),
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE scan, one aggregate: Spark plans the three countDistincts as
    a single Expand(×3)+aggregate; the per-column result rows come from
    an explode over the 1-row stats (never a union of per-column
    subqueries, which would re-scan the table per column)."""
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [F.count(c).alias(f"nn_{c}"),
                 F.countDistinct(c).alias(f"nd_{c}"),
                 F.round(F.min(c), 2).alias(f"mn_{c}"),
                 F.round(F.max(c), 2).alias(f"mx_{c}")]
    s = li.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias("col"), F.col("n_rows"),
                 F.col(f"nn_{c}").alias("n_nonnull"),
                 F.col(f"nd_{c}").alias("n_distinct"),
                 F.col(f"mn_{c}").alias("min_v"),
                 F.col(f"mx_{c}").alias("max_v"))
        for c in cols])
    return (s.select(F.explode(rows).alias("r")).select("r.*")
             .orderBy("col"))


@register(
    "robust_scale_stats",
    sql="""
    WITH e AS (
        SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ), med AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM e
    ), m AS (
        SELECT event_type, CAST(max(n) AS BIGINT) AS n,
               CAST(max(CASE WHEN rn = (n + 1) // 2 THEN cents END)
                    AS BIGINT) AS med_cents
        FROM med GROUP BY event_type
    ), dev AS (
        SELECT e.event_type, abs(e.cents - m.med_cents) AS d
        FROM e JOIN m USING (event_type)
    ), devr AS (
        SELECT event_type, d,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM dev
    )
    SELECT m.event_type, m.n, m.med_cents,
           CAST(max(CASE WHEN devr.rn = (devr.n + 1) // 2 THEN devr.d END)
                AS BIGINT) AS mad_cents
    FROM devr JOIN m USING (event_type)
    GROUP BY m.event_type, m.n, m.med_cents
    ORDER BY m.event_type
    """,
    doc="Robust scaling statistics per group: nearest-rank median and "
        "MAD (median absolute deviation) in exact integer cents — the "
        "outlier-proof alternative to mean/std for feature "
        "normalization (one extreme value moves a mean arbitrarily, "
        "the median not at all). Two keyed window passes on the same "
        "event_type Exchange; lower-median convention at even n on "
        "both engines.",
    tags=("events", "profiling", "analytics"),
)
def robust_scale_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    w = Window.partitionBy("event_type").orderBy("cents")
    wn = Window.partitionBy("event_type")
    med = (e.withColumn("rn", F.row_number().over(w))
            .withColumn("n", F.count("*").over(wn))
            .groupBy("event_type")
            .agg(F.max("n").cast("long").alias("n"),
                 F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"),
                              F.col("cents")))
                  .cast("long").alias("med_cents")))
    dev = (e.join(med, "event_type")
            .select("event_type",
                    F.abs(F.col("cents") - F.col("med_cents")).alias("d")))
    wd = Window.partitionBy("event_type").orderBy("d")
    mad = (dev.withColumn("rn", F.row_number().over(wd))
              .withColumn("dn", F.count("*").over(wn))
              .groupBy("event_type")
              .agg(F.max(F.when(F.col("rn") == F.expr("(dn + 1) div 2"),
                                F.col("d")))
                    .cast("long").alias("mad_cents")))
    return (med.join(mad, "event_type")
               .select("event_type", "n", "med_cents", "mad_cents")
               .orderBy("event_type"))


@register(
    "grouped_deciles",
    sql="""
    WITH e AS (
        SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ), r AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM e
    )
    SELECT event_type, CAST(k.k AS BIGINT) AS decile,
           CAST(cents AS BIGINT) AS cut_cents
    FROM r, LATERAL (SELECT unnest(range(1, 10)) AS k) k
    WHERE rn = (k.k * n + 9) // 10
    ORDER BY event_type, decile
    """,
    doc="Per-group decile cut values by nearest-rank (rank = "
        "ceil(k*n/10)) — exact and engine-identical, no interpolation; "
        "the per-group generalization of equi_depth_bins. One "
        "event_type Exchange; the 9 cuts ride a sequence-explode over "
        "the ranked rows (a row matches at most a few cuts).",
    tags=("events", "profiling"),
)
def grouped_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    w = Window.partitionBy("event_type").orderBy("cents")
    wn = Window.partitionBy("event_type")
    r = (e.withColumn("rn", F.row_number().over(w))
          .withColumn("n", F.count("*").over(wn)))
    return (r.select("event_type", "cents", "rn", "n",
                     F.explode(F.sequence(F.lit(1), F.lit(9))).alias("decile"))
             .where(F.col("rn") == F.expr("(decile * n + 9) div 10"))
             .select("event_type", F.col("decile").cast("long"),
                     F.col("cents").alias("cut_cents"))
             .orderBy("event_type", "decile"))


@register(
    "dq_audit",
    sql="""
    SELECT 'orphan_lineitem' AS rule, 'error' AS severity,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'duplicate_order_pk', 'error',
           CAST((SELECT COALESCE(sum(c - 1), 0) FROM
                 (SELECT count(*) AS c FROM orders GROUP BY o_orderkey
                  HAVING count(*) > 1)) AS BIGINT)
    UNION ALL
    SELECT 'null_custkey', 'error',
           CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL)
                AS BIGINT)
    UNION ALL
    SELECT 'discount_out_of_range', 'error',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    UNION ALL
    SELECT 'nonpositive_price', 'error',
           CAST((SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0)
                AS BIGINT)
    UNION ALL
    SELECT 'high_discount', 'warn',
           CAST((SELECT count(*) FROM lineitem WHERE l_discount > 0.08)
                AS BIGINT)
    ORDER BY rule
    """,
    doc="Data-quality audit (the dbt-test/Great-Expectations surface as "
        "one engine job): referential integrity (orphan FK rows via "
        "anti join), PK uniqueness, null rate, range constraints, and "
        "a warn-level distribution rule that fires on the fixture so "
        "the report is non-vacuous. Each rule is one aggregate or one "
        "anti join; a 100 TB audit runs them from a single pass per "
        "table scan group.",
    tags=("profiling", "maintenance"),
)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def one(rule: str, severity: str, df_count: DataFrame) -> DataFrame:
        return df_count.select(
            F.lit(rule).alias("rule"), F.lit(severity).alias("severity"),
            F.col("n").cast("long").alias("n_violations"))

    orphans = (li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
                 .agg(F.count("*").alias("n")))
    dup_pk = (o.groupBy("o_orderkey").agg(F.count("*").alias("c"))
               .where(F.col("c") > 1)
               .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("n")))
    nullck = o.agg(F.sum(F.col("o_custkey").isNull().cast("long")).alias("n"))
    rng = li.agg(F.sum(((F.col("l_discount") < 0)
                        | (F.col("l_discount") > 1)).cast("long")).alias("n"))
    nonpos = li.agg(F.sum((F.col("l_extendedprice") <= 0).cast("long"))
                    .alias("n"))
    highd = li.agg(F.sum((F.col("l_discount") > 0.08).cast("long")).alias("n"))
    out = (one("orphan_lineitem", "error", orphans)
           .unionByName(one("duplicate_order_pk", "error", dup_pk))
           .unionByName(one("null_custkey", "error", nullck))
           .unionByName(one("discount_out_of_range", "error", rng))
           .unionByName(one("nonpositive_price", "error", nonpos))
           .unionByName(one("high_discount", "warn", highd)))
    return out.orderBy("rule")


_BKQ_K = 128


@register(
    "bottomk_quantiles",
    sql=f"""
    WITH e AS (
        SELECT event_type AS grp, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ), pri AS (
        SELECT grp, event_id, cents,
               row_number() OVER (PARTITION BY grp ORDER BY
                   ('0x' || substring(md5(CAST(event_id AS VARCHAR)),
                                      1, 13))::BIGINT, event_id) AS prk
        FROM e
    ), samp AS (
        SELECT grp, cents FROM pri WHERE prk <= {_BKQ_K}
    ), sr AS (
        SELECT grp, cents,
               row_number() OVER (PARTITION BY grp ORDER BY cents,
                                  grp) AS rn,
               count(*) OVER (PARTITION BY grp) AS n
        FROM samp
    ), est AS (
        SELECT grp, d.d AS decile, max(cents) AS est_cents
        FROM sr, LATERAL (SELECT unnest(range(1, 10)) AS d) d
        WHERE (d.d * n + 9) // 10 = rn
        GROUP BY grp, d.d
    ), fr AS (
        SELECT grp, cents,
               row_number() OVER (PARTITION BY grp ORDER BY cents,
                                  grp) AS rn,
               count(*) OVER (PARTITION BY grp) AS n
        FROM e
    ), ex AS (
        SELECT grp, d.d AS decile, max(cents) AS exact_cents
        FROM fr, LATERAL (SELECT unnest(range(1, 10)) AS d) d
        WHERE (d.d * n + 9) // 10 = rn
        GROUP BY grp, d.d
    )
    SELECT est.grp, CAST(est.decile AS BIGINT) AS decile,
           CAST(est.est_cents AS BIGINT) AS est_cents,
           CAST(ex.exact_cents AS BIGINT) AS exact_cents
    FROM est JOIN ex USING (grp, decile)
    ORDER BY grp, decile
    """,
    doc="Quantile estimation from a DETERMINISTIC BOTTOM-K sample "
        "(min-wise sampling, Cohen & Kaplan 2007 — the mergeable "
        "quantile summary with none of the float/fold-order hazards of "
        "digest sketches): per event_type, the 128 rows with smallest "
        "md5(event_id) form a uniform mergeable sample (KMV with row "
        "payloads — the ops/sketch grid contract); sample deciles at "
        "ceiling rank (d*n+9) div 10 estimate the group deciles with "
        "~1/sqrt(k) rank error. Exact deciles ride along; every value "
        "is integer cents, every rank integer arithmetic, so the "
        "oracle reproduces both sides bit-for-bit. "
        "ops/sampling.bottomk_sample.",
    tags=("sampling", "sketch", "agg", "north-star"),
)
def bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.sampling import bottomk_sample

    e = (load_table(spark, sf_dir, "events")
         .select(F.col("event_type").alias("grp"), "event_id",
                 F.round(F.col("value") * 100, 0).cast("long")
                  .alias("cents")))

    def deciles(df, out_col):
        w = Window.partitionBy("grp").orderBy("cents", "grp")
        ranked = (df.withColumn("rn", F.row_number().over(w))
                    .withColumn("n", F.count("*").over(
                        Window.partitionBy("grp"))))
        hit = F.filter(F.sequence(F.lit(1), F.lit(9)),
                       lambda d: ((d * F.col("n") + 9) / 10).cast("long")
                       == F.col("rn"))
        return (ranked.select("grp", "cents",
                              F.explode(hit).alias("decile"))
                      .groupBy("grp", "decile")
                      .agg(F.max("cents").alias(out_col)))

    est = deciles(bottomk_sample(e, "grp", "event_id", _BKQ_K), "est_cents")
    ex = deciles(e, "exact_cents")
    return (est.join(ex, ["grp", "decile"])
               .select("grp", F.col("decile").cast("long").alias("decile"),
                       "est_cents", "exact_cents")
               .orderBy("grp", "decile"))


from hops_spark.queries.textops import _DUCK_WORDS as _DC_WORDS  # noqa: E402


@register(
    "corpus_data_card",
    sql=f"""
    WITH base AS (
        SELECT doc_id, source, lang, text,
               CAST(len({_DC_WORDS}) AS BIGINT) AS n_tok,
               CAST(length(text) AS BIGINT) AS n_chr
        FROM documents
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               CAST(sum(n_chr) AS BIGINT) AS n_chars,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
               CAST(max(n_tok) AS BIGINT) AS max_doc_tokens,
               CAST(sum(CASE WHEN n_tok = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_empty
        FROM base
    ), voc AS (
        SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab FROM (
            SELECT unnest({_DC_WORDS}) AS w FROM documents)
    ), tops AS (
        SELECT
            (SELECT max(c) FROM (SELECT count(*) AS c FROM base
                                 GROUP BY source)) AS top_src,
            (SELECT max(c) FROM (SELECT count(*) AS c FROM base
                                 GROUP BY lang)) AS top_lang
    )
    SELECT metric, CAST(value AS BIGINT) AS value FROM (
        SELECT 'n_docs' AS metric, n_docs AS value FROM agg
        UNION ALL SELECT 'n_tokens', n_tokens FROM agg
        UNION ALL SELECT 'n_chars', n_chars FROM agg
        UNION ALL SELECT 'vocab_size', vocab FROM voc
        UNION ALL SELECT 'n_sources', n_sources FROM agg
        UNION ALL SELECT 'n_langs', n_langs FROM agg
        UNION ALL SELECT 'max_doc_tokens', max_doc_tokens FROM agg
        -- empty-table guard on every n_docs division: DuckDB raises
        -- division-by-zero where Spark divs to NULL (engine-divergent)
        UNION ALL SELECT 'mean_doc_tokens',
            CASE WHEN n_docs = 0 THEN 0
                 ELSE n_tokens // n_docs END FROM agg
        UNION ALL SELECT 'exact_dup_ppm',
            CASE WHEN n_docs = 0 THEN 0
                 ELSE ((n_docs - n_distinct_texts) * 1000000) // n_docs
            END FROM agg
        UNION ALL SELECT 'empty_doc_ppm',
            CASE WHEN n_docs = 0 THEN 0
                 ELSE (n_empty * 1000000) // n_docs END FROM agg
        UNION ALL SELECT 'top_source_share_ppm',
            CASE WHEN a.n_docs = 0 THEN 0
                 ELSE (t.top_src * 1000000) // a.n_docs END
            FROM tops t, agg a
        UNION ALL SELECT 'top_lang_share_ppm',
            CASE WHEN a.n_docs = 0 THEN 0
                 ELSE (t.top_lang * 1000000) // a.n_docs END
            FROM tops t, agg a
    ) ORDER BY metric
    """,
    doc="The corpus DATA CARD (Datasheets for Datasets, Gebru et al. "
        "2021; the summary block every published dataset ships): "
        "size, vocabulary, source/language spread, exact-duplicate "
        "and empty-document rates in ppm, concentration of the top "
        "source/language — twelve (metric, value) rows, every one an "
        "exact integer off two corpus aggregates (one doc-level, one "
        "token-level) and two tiny group-bys. The at-a-glance "
        "artifact the per-family reports (domain_mixture_report, "
        "table_profile, repetition_stats) drill into.",
    tags=("text", "profiling", "north-star"),
)
def corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.text import words
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "source", "lang", "text",
                    F.size(words("text")).cast("long").alias("n_tok"),
                    F.length("text").cast("long").alias("n_chr"))
    agg = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_chr").cast("long").alias("n_chars"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("text").cast("long").alias("n_distinct_texts"),
        F.max("n_tok").cast("long").alias("max_doc_tokens"),
        F.sum((F.col("n_tok") == 0).cast("long")).cast("long")
         .alias("n_empty")).localCheckpoint(eager=True)
    voc = (d.select(F.explode(words("text")).alias("w"))
            .agg(F.countDistinct("w").cast("long").alias("vocab")))
    top_src = (base.groupBy("source").count()
                   .agg(F.max("count").cast("long").alias("top_src")))
    top_lang = (base.groupBy("lang").count()
                    .agg(F.max("count").cast("long").alias("top_lang")))
    one = (agg.crossJoin(F.broadcast(voc))
              .crossJoin(F.broadcast(top_src))
              .crossJoin(F.broadcast(top_lang)))
    rows = [
        ("n_docs", F.col("n_docs")),
        ("n_tokens", F.col("n_tokens")),
        ("n_chars", F.col("n_chars")),
        ("vocab_size", F.col("vocab")),
        ("n_sources", F.col("n_sources")),
        ("n_langs", F.col("n_langs")),
        ("max_doc_tokens", F.col("max_doc_tokens")),
        # empty-table guard mirrored from the oracle: DuckDB raises on
        # n_docs = 0 where Spark divs to NULL (engine-divergent)
        ("mean_doc_tokens",
         F.expr("CASE WHEN n_docs = 0 THEN 0 "
                "ELSE n_tokens div n_docs END")),
        ("exact_dup_ppm",
         F.expr("CASE WHEN n_docs = 0 THEN 0 ELSE "
                "((n_docs - n_distinct_texts) * 1000000) div n_docs END")),
        ("empty_doc_ppm",
         F.expr("CASE WHEN n_docs = 0 THEN 0 "
                "ELSE (n_empty * 1000000) div n_docs END")),
        ("top_source_share_ppm",
         F.expr("CASE WHEN n_docs = 0 THEN 0 "
                "ELSE (top_src * 1000000) div n_docs END")),
        ("top_lang_share_ppm",
         F.expr("CASE WHEN n_docs = 0 THEN 0 "
                "ELSE (top_lang * 1000000) div n_docs END")),
    ]
    card = one.select(F.explode(F.array(*[
        F.struct(F.lit(m).alias("metric"), v.cast("long").alias("value"))
        for m, v in rows])).alias("r")).select("r.metric", "r.value")
    return card.orderBy("metric")
