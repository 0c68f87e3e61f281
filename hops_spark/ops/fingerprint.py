"""Shared 64-bit fingerprint near-dup machinery (image dHash, audio
energy hash — io/codecs): band decomposition + banded candidate join +
exact-hamming verify. One derivation for the batch queries AND the
streaming ingest twin (the shared-derivation rule: batch and stream
must not be able to diverge).

Fingerprints are (id, hi, lo) with each half an exact 32-bit integer
in a long. Bands are the four 16-bit quarters — the simhash/LSH
discipline: any near pair (hamming <= t for small t) almost surely
agrees on a whole quarter, so candidates come from four keyed
equi-joins, never an all-pairs product. At corpus scale add a bucket
cap exactly as minhash_dedup_pairs does for boilerplate frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint_bands(hashes: DataFrame,
                      id_col: str = "media_id") -> DataFrame:
    """(id, bi, bv): the four 16-bit bands of a (id, hi, lo)
    fingerprint frame — map-only explode."""
    return (hashes.select(
        id_col,
        F.explode(F.array(
            F.struct(F.lit(0).alias("bi"),
                     F.expr("hi div 65536").alias("bv")),
            F.struct(F.lit(1).alias("bi"),
                     F.pmod("hi", F.lit(65536)).alias("bv")),
            F.struct(F.lit(2).alias("bi"),
                     F.expr("lo div 65536").alias("bv")),
            F.struct(F.lit(3).alias("bi"),
                     F.pmod("lo", F.lit(65536)).alias("bv")),
        )).alias("b")).select(id_col, "b.bi", "b.bv"))


def fingerprint_pairs(hashes: DataFrame, other: DataFrame | None = None,
                      threshold: int = 8,
                      id_col: str = "media_id") -> DataFrame:
    """Near-dup pairs by banded LSH + exact hamming verify.

    ``other is None``: symmetric self-join, pairs with id_a < id_b.
    ``other`` given: ASYMMETRIC — id_a from ``hashes`` (the new batch),
    id_b from ``other`` (the existing store); never store x store (the
    incremental_dedup_flags discipline — each item is verified against
    the corpus once, over its whole lifetime).

    Returns (id_a, id_b, hamming) with hamming <= threshold."""
    ba = fingerprint_bands(hashes, id_col).alias("a")
    bb = fingerprint_bands(other if other is not None else hashes,
                           id_col).alias("b")
    cond = (F.col("b.bi") == F.col("a.bi")) & (F.col("b.bv") == F.col("a.bv"))
    if other is None:
        cond = cond & (F.col(f"b.{id_col}") > F.col(f"a.{id_col}"))
    cand = (ba.join(bb, cond)
              .select(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"))
              .distinct())
    ha = hashes.select(F.col(id_col).alias("id_a"),
                       F.col("hi").alias("hi_a"), F.col("lo").alias("lo_a"))
    hsrc = other if other is not None else hashes
    hb = hsrc.select(F.col(id_col).alias("id_b"),
                     F.col("hi").alias("hi_b"), F.col("lo").alias("lo_b"))
    return (cand.join(ha, "id_a").join(hb, "id_b")
                .select("id_a", "id_b",
                        (F.bit_count(F.expr("hi_a ^ hi_b"))
                         + F.bit_count(F.expr("lo_a ^ lo_b")))
                        .cast("long").alias("hamming"))
                .filter(F.col("hamming") <= threshold))
