"""Join operators (SURVEY.md §2.3) — the CompositeInputFormat join
language re-expressed on DataFrames.

Reference semantics (mapreduce/lib/join/):
- ``inner(a,b,...)``  — N-ary equi inner join, cross-product per key
  (InnerJoinRecordReader.java:34).
- ``outer(a,b,...)``  — N-ary full outer; missing slots null
  (OuterJoinRecordReader.java:34).
- ``override(a,b,...)`` — per key, the value from the RIGHTMOST source
  that has it wins (OverrideRecordReader.java:42).

The reference requires identically sorted+partitioned inputs and does a
map-side merge; on Spark the same physical plan falls out of bucketed
tables + SortMergeJoin, and Catalyst auto-broadcasts small sides (the
DistributedCache map-side hash-join idiom). We therefore only implement
the *semantics*; physical strategy is the optimizer's job.

Also: semi/anti (datajoin idiom made first-class), and the as-of join —
the DataFrame realization of ``MapFile.getClosest`` (io/MapFile.java:699),
which Spark lacks natively.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _prefixed(df: DataFrame, key: str, tag: str) -> DataFrame:
    """Rename non-key columns to tag.col so N-way joins don't collide."""
    cols = [F.col(key)] + [F.col(c).alias(f"{tag}_{c}") for c in df.columns if c != key]
    return df.select(*cols)


def inner_join(key: str, *dfs: DataFrame, tags: list[str] | None = None) -> DataFrame:
    """inner(a,b,...): emit combined row iff ALL sources have the key;
    duplicate keys produce the per-key cross product (reference
    InnerJoinRecordReader semantics)."""
    tags = tags or [f"s{i}" for i in range(len(dfs))]
    parts = [_prefixed(d, key, t) for d, t in zip(dfs, tags)]
    return reduce(lambda a, b: a.join(b, key, "inner"), parts)


def outer_join(key: str, *dfs: DataFrame, tags: list[str] | None = None) -> DataFrame:
    """outer(a,b,...): emit a row if ANY source has the key; absent slots
    are null (reference OuterJoinRecordReader semantics)."""
    tags = tags or [f"s{i}" for i in range(len(dfs))]
    parts = [_prefixed(d, key, t) for d, t in zip(dfs, tags)]
    return reduce(lambda a, b: a.join(b, key, "full"), parts)


def override_join(key: str, value_cols: list[str], *dfs: DataFrame) -> DataFrame:
    """override(a,b,...): per key, values come from the RIGHTMOST source
    containing the key (reference OverrideRecordReader.java:42-117).

    Realized as full outer over per-source rows + coalesce(right..left)
    per value column. With duplicate keys the reference emits the
    rightmost source's rows only — we pin that semantic by pre-grouping
    is not done here; callers needing dup-key handling should dedup or
    accept the cross-product of the winning source via ``override_rows``.
    """
    tags = [f"s{i}" for i in range(len(dfs))]
    parts = [_prefixed(d, key, t) for d, t in zip(dfs, tags)]
    joined = reduce(lambda a, b: a.join(b, key, "full"), parts)
    out_cols: list[Column] = [F.col(key)]
    for v in value_cols:
        # rightmost wins → coalesce in reverse source order
        out_cols.append(F.coalesce(*[F.col(f"{t}_{v}") for t in reversed(tags)]).alias(v))
    return joined.select(*out_cols)


def override_rows(key: str, *dfs: DataFrame) -> DataFrame:
    """Row-level override: emit ALL rows of the rightmost source that has
    each key (exact OverrideRecordReader dup-key semantics). One union +
    one window — no N-way join."""
    tagged = [d.withColumn("_src", F.lit(i)) for i, d in enumerate(dfs)]
    u = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), tagged)
    w = Window.partitionBy(key)
    return (u.withColumn("_max_src", F.max("_src").over(w))
             .filter(F.col("_src") == F.col("_max_src"))
             .drop("_src", "_max_src"))


def semi_join(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """EXISTS — the datajoin tagged-reduce idiom made first-class."""
    return left.join(right, key, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """NOT EXISTS."""
    return left.join(right, key, "left_anti")


def broadcast_join(left: DataFrame, small_right: DataFrame, on, how: str = "inner") -> DataFrame:
    """DistributedCache map-side hash-join parity: force broadcast of the
    small side (reference mapreduce/filecache/DistributedCache.java)."""
    return left.join(F.broadcast(small_right), on, how)


def asof_join(left: DataFrame, right: DataFrame, on: str, left_ts: str, right_ts: str,
              direction: str = "backward", tolerance_expr: Column | None = None) -> DataFrame:
    """As-of join — MapFile.getClosest (io/MapFile.java:699) generalized:
    for each left row, the latest right row with right_ts <= left_ts
    (direction='backward'; 'forward' = earliest >=).

    Implementation: union-sort trick — one shuffle on (on), one
    sort-within-partitions, one window; no range cross-join blowup.
    Right rows carry their values forward via last(ignorenulls) over the
    interleaved ordering. Scales: partitioned by join key, so a
    1000-executor cluster spreads keys; skewed keys fall to AQE.
    """
    lcols = [c for c in left.columns]
    rvals = [c for c in right.columns if c not in (on, right_ts)]
    asc = direction == "backward"

    lt = left.select(*lcols).withColumn("_ts", F.col(left_ts)).withColumn("_is_l", F.lit(1))
    rt = right.select(
        F.col(on), F.col(right_ts).alias("_ts"), F.lit(0).alias("_is_l"),
        *[F.col(c) for c in rvals])
    u = lt.unionByName(rt, allowMissingColumns=True)

    order = [F.col("_ts").asc() if asc else F.col("_ts").desc(), F.col("_is_l").asc()]
    w = Window.partitionBy(on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    for c in rvals:
        u = u.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    out = u.filter(F.col("_is_l") == 1).drop("_is_l", "_ts")
    if tolerance_expr is not None:
        out = out.filter(tolerance_expr)
    return out


def salted_join(big: DataFrame, small: DataFrame, on: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-proof shuffle join: replicate-and-salt (the manual
    counterpart of AQE's skewJoin, for when the skew is known up front
    or AQE is unavailable — e.g. inside a cached/checkpointed subplan).

    The big side gets a deterministic salt (partition-id mod n_salts —
    RNG-free, same discipline as ops/agg.salted_agg: a hot key's rows
    arrive spread over many input partitions, so they fan out across
    n_salts reduce partitions instead of melting one); the small side is
    replicated n_salts× via a map-side explode. Join on (key, salt) is
    then uniform by construction; the result set is EXACTLY the plain
    join's for inner/left (result is salt-invariant), which is what the
    registered oracle checks.

    Scale math: replication costs n_salts × |small| rows — choose
    n_salts ≈ (hot-key rows / target-partition rows); the small side
    must be dimension-sized (if it broadcasts, just broadcast — salting
    is for the mid-size dim that exceeds the broadcast threshold but
    not memory × n_salts).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (salt-invariant sides)")
    b = big.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return b.join(s, [on, "_salt"], how).drop("_salt")


def _floor_bucket(name: str, w: int):
    """Exact integer floor division on longs: a - pmod(a, w) is the
    largest multiple of w <= a, so truncating `div` equals floor. No
    double anywhere; valid for values in [-2^63 + w, 2^63 - 1]. ONE
    definition — the join's bucket explode and the replication audit
    must count the same buckets."""
    return F.expr(f"(({name}) - pmod({name}, {w})) div {w}")


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          bucket_width: int,
                          l_start: str = "l_start", l_end: str = "l_end",
                          r_start: str = "r_start", r_end: str = "r_end",
                          ) -> DataFrame:
    """Interval×interval OVERLAP join — the join Spark has no native
    operator for (a raw `l_start <= r_end AND r_start <= l_end`
    predicate plans as a CartesianProduct / BroadcastNestedLoop). The
    standard distributed rewrite (the binning technique of the
    interval-join literature, e.g. Flink's interval join and
    Chawda et al. 2014 for the MapReduce form): replicate each
    interval to every ``bucket_width`` bucket it spans, equi-join on
    the bucket key, then keep a pair only in its REPORTING bucket —
    ``max(floor(l_start/W), floor(r_start/W))`` — so every
    overlapping pair is emitted EXACTLY ONCE with no distinct pass
    (the later interval's first bucket is always a bucket both
    intervals span at the moment they first overlap).

    Inputs carry integer [start, end] columns (closed intervals,
    epoch-seconds or any integer axis) plus any payload columns;
    returns the joined rows (all left + right payload columns).

    Scale: replication factor is ceil(span/W)+1 per row — pick W near
    the TYPICAL span so it stays ~2; the shuffle is one hash exchange
    per side on the bucket key, skew only where one bucket holds many
    LONG intervals (then raise W, or use
    ``interval_overlap_join_two_tier`` below — the long tail gets its
    own coarse-width pass with bounded replication).

    Bucket indices use EXACT integer floor division (a − pmod(a, W))
    div W — all-bigint, floor semantics on negative axes, and exact
    for |values| up to 2^63 − W (a double roundtrip would misbucket
    past 2^53, e.g. nanosecond timestamps, and make bucket 0
    double-width on negative axes)."""
    w = bucket_width

    def _fdiv(name: str):
        return _floor_bucket(name, w)

    lb = left.withColumn(
        "_b", F.explode(F.sequence(_fdiv(l_start), _fdiv(l_end))))
    rb = right.withColumn(
        "_b", F.explode(F.sequence(_fdiv(r_start), _fdiv(r_end))))
    joined = (lb.join(rb, "_b")
                .filter((F.col(l_start) <= F.col(r_end))
                        & (F.col(r_start) <= F.col(l_end)))
                .filter(F.col("_b") == F.greatest(_fdiv(l_start),
                                                  _fdiv(r_start))))
    return joined.drop("_b")


def interval_replication(df: DataFrame, bucket_width: int,
                         start: str, end: str) -> int:
    """Audit helper: total replicated rows ``interval_overlap_join``
    would emit for this side at this width — Σ(floor(e/W) − floor(s/W)
    + 1), over the SAME ``_floor_bucket`` expression the join
    explodes. The number the two-tier split is bounding."""
    w = bucket_width
    return df.select(
        (_floor_bucket(end, w) - _floor_bucket(start, w)
         + F.lit(1)).alias("_rep")).agg(F.sum("_rep")).collect()[0][0] or 0


def interval_overlap_join_two_tier(left: DataFrame, right: DataFrame,
                                   bucket_width: int,
                                   long_factor: int = 32,
                                   l_start: str = "l_start",
                                   l_end: str = "l_end",
                                   r_start: str = "r_start",
                                   r_end: str = "r_end") -> DataFrame:
    """``interval_overlap_join`` with the long-tail second tier (the
    documented hazard of the single-width form: one bucket holding
    many LONG intervals replicates span/W+1 copies of each — a
    day-long session in 1-minute buckets is 1441 copies). Intervals
    with span ≥ ``long_factor·bucket_width`` are routed through a
    COARSE pass at width ``long_factor·bucket_width``, capping their
    replication at span/(long_factor·W)+1 — a ``long_factor``×
    reduction — while short intervals keep the fine width.

    Pair classes partition exactly (no dedup pass): short×short joins
    at the fine width; long×(anything) and short×long join at the
    coarse width, where a short interval spans ≤ 2 coarse buckets.
    Each class reuses ``interval_overlap_join``'s exactly-once
    reporting-bucket rule at its own width, and the three classes are
    disjoint by construction, so the union is exactly-once overall.

    Choose ``long_factor`` ≈ (p99 span)/(typical span): the coarse
    pass then catches only the tail, and its extra candidate pairs
    (coarse buckets admit more non-overlapping candidates before the
    exact filter) stay proportional to the tail row count."""
    w2 = bucket_width * long_factor
    l_long = (F.col(l_end) - F.col(l_start)) >= F.lit(w2)
    r_long = (F.col(r_end) - F.col(r_start)) >= F.lit(w2)
    ls, ll = left.filter(~l_long), left.filter(l_long)
    rs, rl = right.filter(~r_long), right.filter(r_long)
    args = (l_start, l_end, r_start, r_end)
    ss = interval_overlap_join(ls, rs, bucket_width, *args)
    l_any = interval_overlap_join(ll, right, w2, *args)
    s_l = interval_overlap_join(ls, rl, w2, *args)
    return ss.unionByName(l_any).unionByName(s_l)
