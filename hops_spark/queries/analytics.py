"""Event-analytics inventory queries: funnel, cohort retention, SCD2
history, time-series gap fill.

These are the classic event-log analyses a user of the reference runs as
MapReduce secondary-sort jobs (reference
hadoop-mapreduce-examples/SecondarySort.java:45 is the canonical
"per-key ordered scan" shape); here each is a single Catalyst plan whose
only shuffle is the hash exchange on ``user_id`` — every window/agg in a
query reuses that one Exchange, so at 100 TB the cost is one partitioned
scan of the event log per query regardless of how many derived columns
ride on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hops_spark.io.readers import load_table
from hops_spark.registry import register


@register(
    "funnel_conversion",
    sql="""
    WITH peru AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM events GROUP BY user_id
    ), c AS (
        SELECT p.user_id, p.t_view, min(e.ts) AS t_click
        FROM peru p JOIN events e USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > p.t_view
        GROUP BY p.user_id, p.t_view
    ), pu AS (
        SELECT c.user_id, c.t_click, min(e.ts) AS t_purchase
        FROM c JOIN events e USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY c.user_id, c.t_click
    )
    SELECT CAST((SELECT count(*) FROM peru WHERE t_view IS NOT NULL) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT count(*) FROM pu) AS BIGINT) AS n_view_click_purchase
    """,
    doc="Three-stage ordered funnel (view -> click -> purchase): a user "
        "converts a stage only with an event strictly after their first "
        "event of the previous stage. One Exchange on user_id; the three "
        "stage times are windows over the same partitioning, so Catalyst "
        "plans a single shuffle + one final 1-row aggregate.",
    tags=("events", "analytics"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel semantics: t_view = first 'view'; t_click = first 'click'
    AFTER t_view; t_purchase = first 'purchase' AFTER t_click.  All three
    are min-over-user windows on one hash partitioning — Spark reuses the
    Exchange (plan-asserted in tests/test_plans.py), so the 100 TB cost
    is one shuffle of (user_id, ts, event_type) triples, with the map
    side projecting only those three columns out of the scan."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    e = e.withColumn("t_view", t_view)
    t_click = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
               F.col("ts"))).over(w)
    e = e.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
               F.col("ts"))).over(w)
    e = e.withColumn("t_purchase", t_purchase)
    per_user = e.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"))
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_view_click_purchase"))


@register(
    "cohort_retention",
    sql="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                              date_trunc('week', e.ts)) / 7 AS BIGINT) AS week_offset
        FROM events e JOIN firsts f USING (user_id)
    )
    SELECT CAST(cohort_week AS DATE) AS cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    doc="Weekly cohort retention: users bucketed by the week of their "
        "first event; a cohort cell counts users active in week "
        "cohort+offset. Two shuffles (user agg, cohort-cell agg) — the "
        "user agg's Exchange is reused by the distinct.",
    tags=("events", "analytics"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort week = date_trunc('week', first event) — computed as a
    min-window over the user_id Exchange, then (user, cohort, offset)
    dedup + cell count ride the same partitioning until the final small
    (cohort, offset) aggregate.  No join: the window form avoids
    materializing a firsts table and re-joining it (the SQL oracle uses
    the join form; results agree)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    e = (e.withColumn("cohort_week", F.date_trunc("week", F.min("ts").over(w)))
          .withColumn("week_offset",
                      (F.datediff(F.date_trunc("week", F.col("ts")),
                                  F.col("cohort_week")) / 7).cast("bigint")))
    return (e.select("user_id", "cohort_week", "week_offset").distinct()
             .groupBy(F.col("cohort_week").cast("date").alias("cohort_week"),
                      "week_offset")
             .agg(F.count("*").alias("n_active_users"))
             .orderBy("cohort_week", "week_offset"))


@register(
    "scd2_history",
    sql="""
    WITH changes AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ), starts AS (
        SELECT user_id, ts AS valid_from, event_type,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM changes
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, valid_from, valid_to, event_type,
           CAST(valid_to IS NULL AS BOOLEAN) AS is_current
    FROM starts
    ORDER BY user_id, valid_from
    """,
    doc="SCD type-2 dimension history from a change log: collapse runs "
        "of the same attribute value, emit [valid_from, valid_to) "
        "intervals with an is_current flag. One Exchange on user_id; "
        "both windows reuse it.",
    tags=("events", "analytics", "scd"),
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands SCD2 build (the warehouse-maintenance job a
    reference user writes as a secondary-sort reducer): runs collapse
    via lag(), interval close via lead().  Both windows share the
    user_id hash partitioning — one shuffle total."""
    e = load_table(spark, sf_dir, "events") \
        .select("user_id", "ts", "event_id", "event_type")
    # both windows order by (ts, event_id): with ts alone, two retained
    # change rows at the same ts would make interval assignment
    # nondeterministic between engines (ADVICE r3).
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (e.withColumn("prev_type", F.lag("event_type").over(wo))
             .where(F.col("prev_type").isNull()
                    | (F.col("prev_type") != F.col("event_type")))
             .withColumn("valid_from", F.col("ts"))
             .withColumn("valid_to", F.lead("ts").over(wo))
             .select("user_id", "valid_from", "valid_to", "event_type",
                     F.col("valid_to").isNull().alias("is_current"))
             .orderBy("user_id", "valid_from"))


@register(
    "resample_gap_fill",
    sql="""
    WITH bounds AS (
        SELECT user_id, date_trunc('day', min(ts)) AS d0,
               date_trunc('day', max(ts)) AS d1
        FROM events GROUP BY user_id
    ), grid AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
        FROM bounds
    ), daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               round(sum(value), 2) AS day_value
        FROM events GROUP BY user_id, day
    ), joined AS (
        SELECT g.user_id, CAST(g.day AS DATE) AS day, d.day_value,
               CAST(d.day_value IS NULL AS BOOLEAN) AS filled
        FROM grid g LEFT JOIN daily d
          ON g.user_id = d.user_id AND g.day = d.day
    )
    SELECT user_id, day,
           coalesce(day_value,
                    last_value(day_value IGNORE NULLS)
                        OVER (PARTITION BY user_id ORDER BY day)) AS day_value,
           filled
    FROM joined
    ORDER BY user_id, day
    """,
    doc="Per-user daily resample with forward fill: build the dense day "
        "grid per user (sequence()), left-join the sparse daily sums, "
        "forward-fill gaps with last_value(ignorenulls). All on the "
        "user_id Exchange; the grid explode is map-side.",
    tags=("events", "analytics", "timeseries"),
)
def resample_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (gap fill + LOCF): the dense grid is
    generated per user with sequence() — a map-side Generate off the
    1-row-per-user bounds aggregate, never a driver loop — and the join
    back to the sparse daily aggregate is on (user_id, day), the same
    key the daily agg already hashed on."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    daily = (e.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
              .agg(F.round(F.sum("value"), 2).alias("day_value")))
    bounds = (e.groupBy("user_id")
               .agg(F.date_trunc("day", F.min("ts")).alias("d0"),
                    F.date_trunc("day", F.max("ts")).alias("d1")))
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1",
                             F.expr("INTERVAL 1 DAY"))).alias("day"))
    w = Window.partitionBy("user_id").orderBy("day")
    return (grid.join(daily, ["user_id", "day"], "left")
                .select("user_id", F.col("day").cast("date").alias("day"),
                        F.col("day_value"),
                        F.col("day_value").isNull().alias("filled"))
                .withColumn("day_value",
                            F.coalesce(
                                F.col("day_value"),
                                F.last("day_value", ignorenulls=True).over(w)))
                .select("user_id", "day", "day_value", "filled")
                .orderBy("user_id", "day"))


@register(
    "grouped_trend_ols",
    sql="""
    WITH base AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) - floor(epoch(min(ts) OVER (PARTITION BY user_id)))
                    AS BIGINT) // 3600 AS x,
               CAST(round(value * 100, 0) AS BIGINT) AS y
        FROM events
    ), s AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM base GROUP BY user_id
    )
    SELECT user_id, n,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
           END AS slope_ppm,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE (sy * 1000000
                      - ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx) * sx)
                     // (n * 1000000)
           END AS intercept_cents
    FROM s ORDER BY user_id
    """,
    doc="Per-group OLS trend fit (value vs hours-since-first-event), "
        "closed form from one aggregate of integer sums — slope in "
        "ppm-cents/hour, intercept in cents, ALL arithmetic 64-bit "
        "integer so the fit is bit-for-bit reproducible. The "
        "distributed per-entity trend-fitting job (anomaly/drift "
        "detection over millions of entities) with zero float "
        "fold-order noise.",
    tags=("events", "analytics", "ml"),
)
def grouped_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key closed-form linear regression: the five sufficient
    statistics (n, Σx, Σy, Σxy, Σx²) come from ONE map-side-combined
    aggregate over the user_id Exchange (the recentring min rides the
    same Exchange as a window), then slope/intercept are pure scalar
    integer expressions. Determinism: y is exact cents (values are 2dp
    by fixture contract; round() guards representation noise), x is
    whole hours — every sum is a bigint. 64-bit headroom contract:
    n_per_key * x_max * y_max must stay < 2^63 (here 67 * 720 * 49k ~
    2.4e9 per key); corpora beyond that switch the sums to
    DECIMAL(38,0)/HUGEINT, same plan shape."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    w = Window.partitionBy("user_id")
    base = (e.withColumn(
                "x", ((F.unix_timestamp("ts") - F.unix_timestamp(F.min("ts").over(w)))
                      .cast("bigint") / F.lit(3600)).cast("bigint"))
             .withColumn("y", F.round(F.col("value") * 100, 0).cast("bigint")))
    # NB: bigint/3600 then cast floors toward -inf for non-negative x —
    # identical to the oracle's integer // since x >= 0.
    s = base.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))
    den = F.expr("n * sxx - sx * sx")
    slope = F.expr("((n * sxy - sx * sy) * 1000000) div (n * sxx - sx * sx)")
    intercept = F.expr(
        "(sy * 1000000 - ((n * sxy - sx * sy) * 1000000) div (n * sxx - sx * sx) * sx)"
        " div (n * 1000000)")
    return (s.select("user_id", "n",
                     F.when(den == 0, F.lit(None).cast("bigint"))
                      .otherwise(slope).alias("slope_ppm"),
                     F.when(den == 0, F.lit(None).cast("bigint"))
                      .otherwise(intercept).alias("intercept_cents"))
             .orderBy("user_id"))


@register(
    "numeric_histogram",
    sql="""
    WITH c AS (
        SELECT CAST(round(value * 100, 0) AS BIGINT) AS y FROM events
    )
    SELECT y // 1000 AS bin_10,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(y) AS BIGINT) AS min_cents,
           CAST(max(y) AS BIGINT) AS max_cents,
           CAST(sum(y) AS BIGINT) AS sum_cents
    FROM c GROUP BY bin_10 ORDER BY bin_10
    """,
    doc="Fixed-width numeric histogram (10.00-unit bins) of event "
        "values in exact integer cents — the deterministic alternative "
        "to histogram_numeric()'s nondeterministic adaptive bins. One "
        "map-side-combined aggregate; bin count is value-range-bounded, "
        "independent of row count.",
    tags=("events", "aggregation", "histogram"),
)
def numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    y = F.round(F.col("value") * 100, 0).cast("bigint")
    return (e.select(y.alias("y"))
             .groupBy(F.expr("y div 1000").alias("bin_10"))
             .agg(F.count("*").alias("n"),
                  F.min("y").alias("min_cents"),
                  F.max("y").alias("max_cents"),
                  F.sum("y").alias("sum_cents"))
             .orderBy("bin_10"))


@register(
    "grouped_outliers",
    sql="""
    WITH base AS (
        SELECT user_id, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS y
        FROM events
    ), s AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               sum(y) AS sy, sum(y * y) AS qy
        FROM base GROUP BY user_id
    )
    SELECT b.user_id, b.event_id, b.y AS value_cents,
           CAST((CAST(b.y AS HUGEINT) * s.n - s.sy)
                * (CAST(b.y AS HUGEINT) * s.n - s.sy)
                > 9 * s.n * (s.n * s.qy - s.sy * s.sy) AS BOOLEAN)
               AS is_outlier
    FROM base b JOIN s USING (user_id)
    ORDER BY b.user_id, b.event_id
    """,
    doc="Per-group z-score outlier flags (|z| > 3) with ZERO floating "
        "point: |y - mean| > 3*sigma squared into (y*n - s)^2 > "
        "9*n*(n*q - s^2) — exact DECIMAL(38)/HUGEINT integer "
        "comparison, so the flag set is engine-identical (a float "
        "z-score at the 3.0 boundary is not). Group stats ride one "
        "user_id aggregate joined back on the same key.",
    tags=("events", "analytics", "profiling"),
)
def grouped_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-entity anomaly gate (fraud/monitoring shape): sufficient
    stats per user from one map-side-combined aggregate, flags from a
    co-partitioned join back. The squared-inequality trick keeps the
    3-sigma test in exact integers — same discipline as
    grouped_trend_ols/numeric_corr_matrix.

    Headroom bound: with allowPrecisionLoss, dev*dev and 9*n*(n*qy -
    sy*sy) are capped at DECIMAL(38,0) — exactness holds while
    9 * n^2 * qy < 10^38, i.e. |y| ≲ 10^9 cents at n ≲ 10^8 rows per
    group. Beyond that Spark yields NULL where DuckDB's HUGEINT stays
    exact; widen y's scaling or pre-aggregate before trusting flags at
    that extreme."""
    e = load_table(spark, sf_dir, "events")
    base = e.select("user_id", "event_id",
                    F.round(F.col("value") * 100, 0).cast("bigint").alias("y"))
    s = base.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("qy"))
    dev = (F.col("y").cast("decimal(38,0)") * F.col("n") - F.col("sy"))
    thresh = (F.lit(9).cast("decimal(38,0)") * F.col("n")
              * (F.col("n") * F.col("qy") - F.col("sy") * F.col("sy")))
    return (base.join(s, "user_id")
                .select("user_id", "event_id",
                        F.col("y").alias("value_cents"),
                        (dev * dev > thresh).alias("is_outlier"))
                .orderBy("user_id", "event_id"))


@register(
    "winsorized_stats",
    sql="""
    WITH e AS (
        SELECT user_id, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ), ranked AS (
        SELECT user_id, cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY cents, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM e
    ), bounds AS (
        SELECT user_id, CAST(max(n) AS BIGINT) AS n,
               CAST(max(CASE WHEN rn = greatest(1, (n + 9) // 10)
                             THEN cents END) AS BIGINT) AS p10_cents,
               CAST(max(CASE WHEN rn = greatest(1, (9 * n + 9) // 10)
                             THEN cents END) AS BIGINT) AS p90_cents
        FROM ranked GROUP BY user_id
    )
    SELECT r.user_id, b.n, b.p10_cents, b.p90_cents,
           CAST(sum(least(greatest(r.cents, b.p10_cents), b.p90_cents))
                AS BIGINT) AS winsorized_sum_cents
    FROM ranked r JOIN bounds b USING (user_id)
    GROUP BY r.user_id, b.n, b.p10_cents, b.p90_cents
    ORDER BY r.user_id
    """,
    doc="Per-group winsorization with ZERO floating point: nearest-rank "
        "p10/p90 (rank = ceil(q*n), engine-identical — no interpolation "
        "ambiguity) clip each value before the sum, the robust-stats "
        "gate a feature pipeline applies before training. One user_id "
        "Exchange; the rank window, bounds aggregate and clip join all "
        "reuse it.",
    tags=("events", "analytics", "profiling"),
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    w = Window.partitionBy("user_id").orderBy("cents", "event_id")
    wn = Window.partitionBy("user_id")
    ranked = (e.withColumn("rn", F.row_number().over(w))
               .withColumn("n", F.count("*").over(wn)))
    p10_rn = F.greatest(F.lit(1), F.expr("(n + 9) div 10"))
    p90_rn = F.greatest(F.lit(1), F.expr("(9 * n + 9) div 10"))
    bounds = (ranked.groupBy("user_id")
                    .agg(F.max("n").cast("long").alias("n"),
                         F.max(F.when(F.col("rn") == p10_rn, F.col("cents")))
                          .cast("long").alias("p10_cents"),
                         F.max(F.when(F.col("rn") == p90_rn, F.col("cents")))
                          .cast("long").alias("p90_cents")))
    clipped = F.least(F.greatest(F.col("cents"), F.col("p10_cents")),
                      F.col("p90_cents"))
    return (ranked.select("user_id", "cents").join(bounds, "user_id")
                  .groupBy("user_id", "n", "p10_cents", "p90_cents")
                  .agg(F.sum(clipped).cast("long")
                        .alias("winsorized_sum_cents"))
                  .orderBy("user_id"))


@register(
    "grouped_mode",
    sql="""
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    ), r AS (
        SELECT user_id, event_type, n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rnk
        FROM c
    )
    SELECT user_id, event_type AS mode_type, n AS mode_n
    FROM r WHERE rnk = 1
    ORDER BY user_id
    """,
    doc="Deterministic per-group mode (most frequent value, ties broken "
        "lexicographically — DuckDB/Spark built-in mode() breaks ties "
        "arbitrarily, so the rank form is the engine-portable contract). "
        "Two shuffles: the (user, type) count and the per-user ranking "
        "window over the already-small count table.",
    tags=("events", "analytics"),
)
def grouped_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (c.withColumn("rnk", F.row_number().over(w))
             .where(F.col("rnk") == 1)
             .select("user_id", F.col("event_type").alias("mode_type"),
                     F.col("n").alias("mode_n"))
             .orderBy("user_id"))


@register(
    "rfm_segments",
    sql="""
    WITH c AS (
        SELECT o_custkey AS custkey,
               max(o_orderdate) AS last_d,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ), r AS (
        SELECT custkey, freq, cents,
               row_number() OVER (ORDER BY last_d, custkey) AS r_rk,
               row_number() OVER (ORDER BY freq, custkey) AS f_rk,
               row_number() OVER (ORDER BY cents, custkey) AS m_rk,
               count(*) OVER () AS n
        FROM c
    )
    SELECT CAST(((r_rk - 1) * 5 // n) * 100
                + ((f_rk - 1) * 5 // n) * 10
                + ((m_rk - 1) * 5 // n) AS BIGINT) AS rfm_code,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS segment_cents
    FROM r GROUP BY rfm_code ORDER BY rfm_code
    """,
    doc="RFM customer segmentation (recency/frequency/monetary "
        "quintiles): each metric buckets by the scalable equi-depth "
        "rule bucket = (rank-1)*5 div n over the two-phase distributed "
        "rank — NO single-partition window even at a billion customers "
        "(ntile would need one). Deterministic tie-break by custkey; "
        "segment census + revenue per RFM code.",
    tags=("analytics", "profiling"),
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.sort import total_order_rank
    o = load_table(spark, sf_dir, "orders")
    c = (o.groupBy(F.col("o_custkey").alias("custkey"))
          .agg(F.max("o_orderdate").alias("last_d"),
               F.count("*").alias("freq"),
               F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                .alias("cents")))
    n = c.count()
    ranked = c
    for metric, rk in (("last_d", "r_rk"), ("freq", "f_rk"),
                       ("cents", "m_rk")):
        ranked = total_order_rank(ranked, metric, "custkey", rank_col=rk)
    code = (F.expr(f"((r_rk - 1) * 5 div {n}) * 100 "
                   f"+ ((f_rk - 1) * 5 div {n}) * 10 "
                   f"+ ((m_rk - 1) * 5 div {n})").cast("long"))
    return (ranked.select(code.alias("rfm_code"), "cents")
                  .groupBy("rfm_code")
                  .agg(F.count("*").alias("n_customers"),
                       F.sum("cents").cast("long").alias("segment_cents"))
                  .orderBy("rfm_code"))


@register(
    "order_lead_times",
    sql="""
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(date_diff('day', o.o_orderdate, l.l_shipdate))
                * 1000000 // count(*) AS BIGINT) AS avg_ship_days_ppm,
           CAST(max(date_diff('day', o.o_orderdate, l.l_shipdate))
                AS BIGINT) AS max_ship_days,
           CAST(sum(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                          <= 30 THEN 1 ELSE 0 END) * 1000000 // count(*)
                AS BIGINT) AS fast_ship_ppm
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY priority
    ORDER BY priority
    """,
    doc="Order-to-ship lead-time profile per order priority: average "
        "ship delay (integer-ppm days), worst case, and the share "
        "shipped within 30 days — the "
        "operational-SLA twin of TPC-H q4/q12. One FK join (broadcast "
        "orders side at fixture scale, co-partitioned SMJ at 100 TB) + "
        "one small aggregate.",
    tags=("tpch", "analytics"),
)
def order_lead_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return (j.groupBy(F.col("o_orderpriority").alias("priority"))
             .agg(F.count("*").alias("n_lines"),
                  F.expr("sum(datediff(l_shipdate, o_orderdate)) "
                         "* 1000000 div count(*)").cast("long")
                   .alias("avg_ship_days_ppm"),
                  F.max(F.datediff("l_shipdate", "o_orderdate"))
                   .cast("long").alias("max_ship_days"),
                  F.expr("sum(CASE WHEN datediff(l_shipdate, o_orderdate) "
                         "<= 30 THEN 1 ELSE 0 END) * 1000000 div count(*)")
                   .cast("long").alias("fast_ship_ppm"))
             .orderBy("priority"))


STATS_COLS = ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
              "l_returnflag", "l_linestatus", "l_shipdate")
STATS_K = 256


def _table_stats_oracle_sql() -> str:
    """Per-column ANALYZE stats with the KMV estimate replayed
    relationally — both estimator branches (exact n_kept < k, kth-min
    formula at n_kept == k) exercised by the column mix."""
    from hops_spark.ops.sketch import KMV_DOMAIN
    basic = "\n        UNION ALL\n".join(
        f"""        SELECT '{c}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS ndv_exact,
               CAST(min({c}) AS VARCHAR) AS min_val,
               CAST(max({c}) AS VARCHAR) AS max_val
        FROM lineitem""" for c in STATS_COLS)
    longf = "\n        UNION ALL\n".join(
        f"        SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS s "
        f"FROM lineitem WHERE {c} IS NOT NULL" for c in STATS_COLS)
    return f"""
    WITH basic AS (
{basic}
    ), longf AS (
{longf}
    ), hashes AS (
        SELECT DISTINCT col_name,
               ('0x' || substring(md5(s), 1, 13))::BIGINT AS hv
        FROM longf
    ), ranked AS (
        SELECT col_name, hv,
               row_number() OVER (PARTITION BY col_name ORDER BY hv) AS rk
        FROM hashes
    ), kmv AS (
        SELECT col_name, CAST(count(*) AS BIGINT) AS n_kept,
               max(CASE WHEN rk = {STATS_K} THEN hv END) AS kth
        FROM ranked WHERE rk <= {STATS_K} GROUP BY col_name
    ), est AS (
        SELECT col_name,
               CASE WHEN n_kept < {STATS_K} THEN n_kept
                    ELSE CAST(({STATS_K} - 1) * {KMV_DOMAIN} // kth AS BIGINT)
               END AS ndv_est
        FROM kmv
    )
    SELECT b.col_name, b.n_rows, b.n_nulls, b.ndv_exact,
           CAST(coalesce(e.ndv_est, 0) AS BIGINT) AS ndv_est,
           b.min_val, b.max_val
    FROM basic b LEFT JOIN est e USING (col_name)
    ORDER BY col_name
    """


@register(
    "table_stats",
    sql=_table_stats_oracle_sql(),
    doc="SKETCH-estimate per-column statistics over lineitem — the "
        "scale companion to table_profile (which is the exact "
        "single-scan Expand+agg profile of 3 numerics): 7 columns "
        "incl. strings/dates, row count, null count, EXACT distinct, "
        "and the KMV k=256 distinct ESTIMATE for when exact NDV becomes "
        "too expensive at web scale (self-verifying: exact rides "
        "alongside; the column mix exercises both the n_kept<k exact "
        "branch and the kth-min estimator branch), typed min/max as "
        "strings. Per-column aggregates each scan ONLY their column "
        "(parquet pruning: 7 single-column scans = about one "
        "full-width scan in bytes); the KMV build is one distinct + "
        "one group-partitioned rank window, shared with the "
        "audience-overlap machinery (ops/sketch.kmv_sketch).",
    tags=("metadata", "aggregation"),
)
def table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.sketch import kmv_estimate_ppm, kmv_sketch

    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for c in STATS_COLS:
        parts.append(li.agg(
            F.lit(c).alias("col_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_nulls"),
            F.countDistinct(c).cast("long").alias("ndv_exact"),
            F.min(c).cast("string").alias("min_val"),
            F.max(c).cast("string").alias("max_val")))
    basic = parts[0]
    for p in parts[1:]:
        basic = basic.unionByName(p)
    longf = None
    for c in STATS_COLS:
        part = (li.filter(F.col(c).isNotNull())
                  .select(F.lit(c).alias("grp"),
                          F.col(c).cast("string").alias("v")))
        longf = part if longf is None else longf.unionByName(part)
    est = (kmv_estimate_ppm(kmv_sketch(longf, "grp", "v", STATS_K), STATS_K)
           .select(F.col("grp").alias("col_name"),
                   F.col("est_distinct").alias("ndv_est")))
    # LEFT join: an all-null column yields no tf rows and hence no KMV
    # sketch row — it must still appear in the report (ndv_est 0), not
    # silently vanish from the stats table
    return (basic.join(est, "col_name", "left")
                 .select("col_name", "n_rows", "n_nulls", "ndv_exact",
                         F.coalesce("ndv_est", F.lit(0)).cast("long")
                          .alias("ndv_est"), "min_val", "max_val")
                 .orderBy("col_name"))


@register(
    "attribution_credit",
    sql="""
    WITH conv AS (
        SELECT event_id AS conv_id, user_id, ts AS conv_ts
        FROM events WHERE event_type = 'purchase'
    ), touch AS (
        SELECT event_id AS touch_id, user_id, ts AS touch_ts,
               event_type AS channel
        FROM events WHERE event_type IN ('click', 'view', 'signup')
    ), j AS (
        SELECT c.conv_id, t.touch_id, t.channel, t.touch_ts
        FROM conv c JOIN touch t ON t.user_id = c.user_id
        AND t.touch_ts < c.conv_ts
        AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY
    ), r AS (
        SELECT conv_id, touch_id, channel,
               CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT)
                 AS n_touch,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY touch_ts DESC, touch_id DESC)
                 AS rn
        FROM j
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(1000000 // n_touch) AS BIGINT) AS linear_credit_ppm,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch_convs
    FROM r GROUP BY channel ORDER BY channel
    """,
    doc="Multi-touch attribution over the event log: each purchase "
        "distributes 1,000,000 ppm of credit equally (integer div — "
        "order-free) across the user's click/view/signup touchpoints "
        "in the trailing 7 days; last-touch conversions ride along "
        "via a per-conversion row_number (touch_ts desc, touch_id "
        "desc — the id tiebreak makes same-microsecond touches "
        "deterministic). The user-equi + time-range join is the "
        "join_range_events shape: SMJ on user_id with the range as "
        "residual; both windows partition by conv_id (bounded per "
        "key, never single-partition).",
    tags=("events", "analytics"),
)
def attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.attribution import attribution_credit as attr

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type")
    return attr(e)


@register(
    "dau_wau_stickiness",
    sql="""
    WITH d AS (
        SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
               CAST(ts AS DATE) AS day, user_id
        FROM events
    ), daily AS (
        SELECT week, day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM d GROUP BY week, day
    ), weekly AS (
        SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM d GROUP BY week
    ), agg AS (
        SELECT week, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(dau) AS BIGINT) AS dau_sum
        FROM daily GROUP BY week
    )
    SELECT a.week, a.n_days, a.dau_sum, w.wau,
           CAST(a.dau_sum * 1000000 // (a.n_days * w.wau) AS BIGINT)
             AS stickiness_ppm
    FROM agg a JOIN weekly w USING (week)
    ORDER BY week
    """,
    doc="DAU/WAU stickiness per ISO week (the product-analytics "
        "engagement ratio): average daily active users over weekly "
        "active users as one division-free integer ppm — stickiness = "
        "Σ daily distinct · 1e6 div (n_days · weekly distinct). Both "
        "engines truncate to the ISO Monday week. Two count-distinct "
        "aggregates sharing one scan; at the 100 TB event log both "
        "are map-side partial on (week, day) / (week) keys and the "
        "output is weeks-bounded.",
    tags=("events", "analytics"),
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    d = e.select(F.date_format(F.date_trunc("week", F.col("ts")),
                               "yyyy-MM-dd").alias("week"),
                 F.to_date("ts").alias("day"), "user_id")
    daily = (d.groupBy("week", "day")
              .agg(F.countDistinct("user_id").cast("long").alias("dau")))
    weekly = (d.groupBy("week")
               .agg(F.countDistinct("user_id").cast("long").alias("wau")))
    agg = (daily.groupBy("week")
                .agg(F.count("*").cast("long").alias("n_days"),
                     F.sum("dau").cast("long").alias("dau_sum")))
    return (agg.join(weekly, "week")
               .select("week", "n_days", "dau_sum", "wau",
                       F.expr("CAST(dau_sum * 1000000 div (n_days * wau) "
                              "AS BIGINT)").alias("stickiness_ppm"))
               .orderBy("week"))


@register(
    "interval_overlap_events",
    sql="""
    WITH clicks AS (
        SELECT event_id AS click_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS l_start,
               CAST(floor(epoch(ts)) AS BIGINT)
               + CAST(round(value * 60, 0) AS BIGINT) AS l_end
        FROM events WHERE event_type = 'click'
    ), errors AS (
        SELECT event_id AS error_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS r_start,
               CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS r_end
        FROM events WHERE event_type = 'error'
    )
    SELECT e.error_id, CAST(count(*) AS BIGINT) AS n_concurrent
    FROM errors e JOIN clicks c
      ON c.l_start <= e.r_end AND e.r_start <= c.l_end
    GROUP BY e.error_id
    ORDER BY error_id
    """,
    doc="Interval×interval overlap join (click SESSIONS [ts, ts+value "
        "min] against 30-min error windows — 'what was running when "
        "the incident window was open'): Spark plans the raw overlap "
        "predicate as a nested-loop cross, so the op rewrites it as "
        "bucket replication + equi-join + exactly-once REPORTING-"
        "bucket rule (no distinct pass) — "
        "ops/join.interval_overlap_join, the Flink-style interval "
        "join brought to the DataFrame layer. The oracle runs the "
        "naive quadratic join; the Spark plan must contain NO "
        "CartesianProduct (plan-lint enforced). Replication factor "
        "~2 at the chosen 1h bucket vs ≤ 100-min spans.",
    tags=("events", "analytics", "join"),
)
def interval_overlap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.join import interval_overlap_join

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value")
    clicks = (e.filter(F.col("event_type") == "click")
               .select(F.col("event_id").alias("click_id"),
                       F.unix_timestamp("ts").alias("l_start"),
                       (F.unix_timestamp("ts")
                        + F.round(F.col("value") * 60, 0).cast("long"))
                       .alias("l_end")))
    errors = (e.filter(F.col("event_type") == "error")
               .select(F.col("event_id").alias("error_id"),
                       F.unix_timestamp("ts").alias("r_start"),
                       (F.unix_timestamp("ts") + 1800).alias("r_end")))
    pairs = interval_overlap_join(clicks, errors, bucket_width=3600)
    return (pairs.groupBy("error_id")
                 .agg(F.count("*").cast("long").alias("n_concurrent"))
                 .orderBy("error_id"))


NEYMAN_N = 1000


@register(
    "neyman_allocation",
    sql=f"""
    WITH s AS (
        SELECT o_orderpriority AS stratum,
               CAST(count(*) AS BIGINT) AS n_h,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS sum_c,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS HUGEINT)
                        * CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS HUGEINT) AS sumsq_c
        FROM orders GROUP BY o_orderpriority
    ), w AS (
        SELECT stratum, n_h,
               CAST(round(sqrt(CAST(CAST(n_h AS HUGEINT) * sumsq_c
                                    - CAST(sum_c AS HUGEINT) * sum_c
                                    AS DOUBLE)) / 1000, 0) AS BIGINT)
                 AS w_milli
        FROM s
    ), tot AS (
        SELECT CAST(sum(w_milli) AS BIGINT) AS tw FROM w
    ), base AS (
        SELECT stratum, n_h, w_milli,
               ({NEYMAN_N} * w_milli) // tw AS base_n,
               ({NEYMAN_N} * w_milli) % tw AS rem
        FROM w, tot
    ), leftover AS (
        SELECT {NEYMAN_N} - CAST(sum(base_n) AS BIGINT) AS k FROM base
    ), ranked AS (
        SELECT b.stratum, b.n_h, b.w_milli, b.base_n,
               (SELECT count(*) FROM base o
                WHERE o.rem > b.rem
                   OR (o.rem = b.rem AND o.stratum < b.stratum)) AS r
        FROM base b
    )
    SELECT stratum, n_h, w_milli,
           CAST(base_n + (CASE WHEN r < k THEN 1 ELSE 0 END) AS BIGINT)
             AS alloc_n
    FROM ranked, leftover
    ORDER BY stratum
    """,
    doc="Neyman-optimal stratified sample allocation (Neyman 1934; "
        "Cochran ch.5): allocate a fixed budget across strata "
        "proportional to N_h·σ_h, using the integer identity "
        "N·σ = sqrt(N·Σx² − (Σx)²) over exact cents so the weight is "
        "ONE sqrt per stratum (same IEEE double both engines, snapped "
        "to milli units); apportionment is largest-remainder "
        "(Hamilton) in pure integer arithmetic with join-count ranks "
        "over the strata-bounded frame — no window, no float "
        "comparison, Σ alloc_n = budget exactly. The sampling-design "
        "front end for stratified_sample/pps_sample.",
    tags=("analytics", "sampling"),
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = NEYMAN_N
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("stratum"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"))
    s = o.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n_h"),
        F.sum("c").cast("long").alias("sum_c"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
         .cast("decimal(38,0)").alias("sumsq_c"))
    w = s.select(
        "stratum", "n_h",
        F.expr("CAST(round(sqrt(CAST(CAST(n_h AS DECIMAL(38,0)) * sumsq_c "
               "- CAST(sum_c AS DECIMAL(38,0)) * sum_c "
               "AS DOUBLE)) / 1000, 0) AS BIGINT)").alias("w_milli"))
    # Degenerate-input guard: all-constant strata give tw = 0, where
    # DuckDB raises division-by-zero but Spark's `div` yields NULL rows
    # — an engine-divergent silent failure. Fail loud on the Spark side
    # too (raise_error evaluates on the 1-row aggregate only).
    tot = (w.agg(F.sum("w_milli").cast("long").alias("tw"))
            .select(F.expr(
                "CASE WHEN tw > 0 THEN tw ELSE CAST(raise_error("
                "'neyman_allocation: zero total stratum weight "
                "(all strata constant-valued)') AS BIGINT) END"
            ).alias("tw")))
    base = (w.crossJoin(F.broadcast(tot))
             .select("stratum", "n_h", "w_milli",
                     F.expr(f"({n} * w_milli) div tw").alias("base_n"),
                     F.expr(f"({n} * w_milli) % tw").alias("rem")))
    leftover = base.agg((F.lit(n) - F.sum("base_n")).cast("long").alias("k"))
    other = base.select(F.col("stratum").alias("o_stratum"),
                        F.col("rem").alias("o_rem"))
    ranked = (base.join(F.broadcast(other),
                        (F.col("o_rem") > F.col("rem"))
                        | ((F.col("o_rem") == F.col("rem"))
                           & (F.col("o_stratum") < F.col("stratum"))),
                        "left")
                  .groupBy("stratum", "n_h", "w_milli", "base_n")
                  .agg(F.count("o_stratum").alias("r")))
    return (ranked.crossJoin(F.broadcast(leftover))
                  .select("stratum", "n_h", "w_milli",
                          (F.col("base_n")
                           + F.when(F.col("r") < F.col("k"), 1).otherwise(0))
                          .cast("long").alias("alloc_n"))
                  .orderBy("stratum"))


@register(
    "ab_test_welch",
    sql="""
    WITH assigned AS (
        SELECT CASE WHEN ('0x' || substring(md5('ab|' ||
                    CAST(user_id AS VARCHAR)), 1, 7))::BIGINT % 2 = 0
                    THEN 'A' ELSE 'B' END AS variant,
               CAST(round(value * 100, 0) AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase'
    ), s AS (
        SELECT variant,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS sum_c,
               CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sumsq_c
        FROM assigned GROUP BY variant
    ), piv AS (
        SELECT max(CASE WHEN variant = 'A' THEN n END) AS na,
               max(CASE WHEN variant = 'A' THEN sum_c END) AS sa,
               max(CASE WHEN variant = 'A' THEN sumsq_c END) AS qa,
               max(CASE WHEN variant = 'B' THEN n END) AS nb,
               max(CASE WHEN variant = 'B' THEN sum_c END) AS sb,
               max(CASE WHEN variant = 'B' THEN sumsq_c END) AS qb
        FROM s
    )
    SELECT na, nb,
           CAST(sa * 1000000 // na AS BIGINT) AS mean_a_micro,
           CAST(sb * 1000000 // nb AS BIGINT) AS mean_b_micro,
           CAST(round((CAST(sb AS DOUBLE) / nb - CAST(sa AS DOUBLE) / na)
                / sqrt( (CAST(qa AS DOUBLE) / na
                         - (CAST(sa AS DOUBLE) / na)
                           * (CAST(sa AS DOUBLE) / na)) / (na - 1)
                      + (CAST(qb AS DOUBLE) / nb
                         - (CAST(sb AS DOUBLE) / nb)
                           * (CAST(sb AS DOUBLE) / nb)) / (nb - 1) )
                * 1000000, 0) AS BIGINT) AS welch_z_micro
    FROM piv
    """,
    doc="Two-sample A/B analysis with the Welch z statistic (Welch "
        "1947 — UNBIASED sample variances s²=n/(n−1)·(E[x²]−mean²), "
        "unpooled, the default for unequal groups): "
        "variant assignment is a deterministic md5 hash of user_id "
        "(the engine-portable randomization every experimentation "
        "platform uses), purchase values in exact cents, and the z "
        "score is ONE fixed-shape double expression over five int64/"
        "int128 inputs snapped to integer micro-units — the neyman "
        "discipline. One keyed aggregate + a 2-row pivot; at the "
        "100 TB event log the aggregate is map-side partial and "
        "everything after is O(1).",
    tags=("events", "analytics"),
)
def ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events") \
        .filter(F.col("event_type") == "purchase")
    assigned = e.select(
        F.when(F.conv(F.substring(F.md5(F.concat(
            F.lit("ab|"), F.col("user_id").cast("string"))), 1, 7),
            16, 10).cast("long") % 2 == 0, "A").otherwise("B")
         .alias("variant"),
        F.round(F.col("value") * 100, 0).cast("long").alias("c"))
    s = assigned.groupBy("variant").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("sum_c"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
         .cast("decimal(38,0)").alias("sumsq_c"))
    piv = s.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("sum_c"))).alias("sa"),
        F.max(F.when(F.col("variant") == "A", F.col("sumsq_c"))).alias("qa"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("sum_c"))).alias("sb"),
        F.max(F.when(F.col("variant") == "B", F.col("sumsq_c"))).alias("qb"))
    return piv.select(
        "na", "nb",
        F.expr("CAST(sa * 1000000 div na AS BIGINT)").alias("mean_a_micro"),
        F.expr("CAST(sb * 1000000 div nb AS BIGINT)").alias("mean_b_micro"),
        F.expr("CAST(round((CAST(sb AS DOUBLE) / nb - CAST(sa AS DOUBLE) / na)"
               " / sqrt( (CAST(qa AS DOUBLE) / na"
               " - (CAST(sa AS DOUBLE) / na) * (CAST(sa AS DOUBLE) / na))"
               " / (na - 1)"
               " + (CAST(qb AS DOUBLE) / nb"
               " - (CAST(sb AS DOUBLE) / nb) * (CAST(sb AS DOUBLE) / nb))"
               " / (nb - 1) )"
               " * 1000000, 0) AS BIGINT)").alias("welch_z_micro"))


@register(
    "neyman_sample",
    sql=f"""
    WITH s AS (
        SELECT o_orderpriority AS stratum,
               CAST(count(*) AS BIGINT) AS n_h,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS sum_c,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS HUGEINT)
                        * CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS HUGEINT) AS sumsq_c
        FROM orders GROUP BY o_orderpriority
    ), w AS (
        SELECT stratum, n_h,
               CAST(round(sqrt(CAST(CAST(n_h AS HUGEINT) * sumsq_c
                                    - CAST(sum_c AS HUGEINT) * sum_c
                                    AS DOUBLE)) / 1000, 0) AS BIGINT)
                 AS w_milli
        FROM s
    ), tot AS (
        SELECT CAST(sum(w_milli) AS BIGINT) AS tw FROM w
    ), base AS (
        SELECT stratum, w_milli,
               ({NEYMAN_N} * w_milli) // tw AS base_n,
               ({NEYMAN_N} * w_milli) % tw AS rem
        FROM w, tot
    ), leftover AS (
        SELECT {NEYMAN_N} - CAST(sum(base_n) AS BIGINT) AS k FROM base
    ), alloc AS (
        SELECT b.stratum,
               CAST(b.base_n + (CASE WHEN (SELECT count(*) FROM base o
                    WHERE o.rem > b.rem
                       OR (o.rem = b.rem AND o.stratum < b.stratum))
                    < (SELECT k FROM leftover) THEN 1 ELSE 0 END)
                    AS BIGINT) AS alloc_n
        FROM base b
    ), ranked AS (
        SELECT o_orderkey, o_orderpriority AS stratum,
               CAST(row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY md5('ney|' || CAST(o_orderkey AS VARCHAR)),
                            o_orderkey) AS BIGINT) AS rk
        FROM orders
    )
    SELECT r.o_orderkey, r.stratum, r.rk
    FROM ranked r JOIN alloc a USING (stratum)
    WHERE r.rk <= a.alloc_n
    ORDER BY r.stratum, r.rk
    """,
    doc="EXECUTE the Neyman design (the pair to neyman_allocation — "
        "design there, selection here, same CTE chain): within each "
        "stratum take the alloc_n lowest md5-ranked order keys — a "
        "deterministic uniform draw both engines replay (the "
        "stratified_sample hash discipline), via a PARTITIONED "
        "row_number per stratum. Exactly Σ alloc_n = 1000 rows out; "
        "the per-stratum rank certifies the draw order itself.",
    tags=("analytics", "sampling"),
)
def neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    alloc = neyman_allocation(spark, sf_dir).select("stratum", "alloc_n")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("stratum"))
    wr = Window.partitionBy("stratum").orderBy(
        F.md5(F.concat(F.lit("ney|"), F.col("o_orderkey").cast("string"))),
        F.col("o_orderkey"))
    ranked = o.withColumn("rk", F.row_number().over(wr).cast("long"))
    return (ranked.join(F.broadcast(alloc), "stratum")
                  .filter(F.col("rk") <= F.col("alloc_n"))
                  .select("o_orderkey", "stratum", "rk")
                  .orderBy("stratum", "rk"))
