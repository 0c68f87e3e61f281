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
    tests/test_round4_ops.py."""
    out = grids[0]
    for g in grids[1:]:
        out = out.unionByName(g)
    return out.groupBy("r", "bucket").agg(F.sum("c").alias("c"))


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
