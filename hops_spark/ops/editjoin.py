"""Exact edit-distance similarity join via pigeonhole segment blocking
(the PassJoin family — Li, Deng, Wang, Feng 2011, public): to find all
pairs with levenshtein <= tau, split every string into tau+1 segments;
<= tau edits cannot touch every segment, so some segment of ``a``
appears VERBATIM in ``b``, shifted by at most tau positions. Candidate
generation is therefore an EQUI-JOIN on (segment index, probe length,
segment text) — selective string keys instead of all-pairs within a
block — followed by an exact levenshtein verify (zero false positives
survive; the pigeonhole guarantees zero false negatives).

Cost shape: the indexed side emits tau+1 rows per string; the probe
side emits (tau+1) x (2 tau+1 lengths) x (<= 2 tau+1 positions) rows
(~45 at tau=2) — linear in the corpus, with join fan-out governed by
segment-text selectivity. This is the scale answer for
HIGH-CARDINALITY string spaces (urls, titles, addresses) where
block-size^2 enumeration melts. On DUPLICATE-HEAVY data the right
move is dedupe-first — pair distinct strings, then explode id pools
(fuzzy_match_parts does exactly that; SCALE.md note 44) — and run
THIS join over the distinct strings when their count is itself large.

Everything is Column expressions (substring/sequence/transform —
JVM-side, no Python); segment boundaries are a deterministic function
of length so both join sides and any oracle agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seg_len(l: Column, i: int, k: int) -> Column:
    """Length of segment i (0-based) of a length-l string split into k
    near-equal parts: the first k - (l % k) segments get floor(l/k),
    the rest get one extra (deterministic, order-preserving)."""
    base, extra = (l / k).cast("int"), l % k
    return base + F.when(F.lit(i) >= k - extra, 1).otherwise(0)


def _seg_start(l: Column, i: int, k: int) -> Column:
    """0-based start of segment i under the _seg_len scheme."""
    base, extra = (l / k).cast("int"), l % k
    n_long = F.greatest(F.lit(0), F.lit(i) - (F.lit(k) - extra))
    return F.lit(i) * base + n_long


def edit_distance_pairs(df: DataFrame, id_col: str, str_col: str,
                        tau: int = 2,
                        block_col: str | None = None) -> DataFrame:
    """All pairs (id_a < id_b) with levenshtein(str_a, str_b) <= tau
    (within ``block_col`` groups when given — composes with coarse
    blocking and its caps). Output: (id_a, id_b, dist).

    Short-string soundness: the pigeonhole needs tau+1 NON-EMPTY
    segments, so every string is segmented with a tau+1-char NUL
    sentinel suffix appended — a common suffix never changes
    levenshtein (the standard trim lemma), and the verify step runs on
    the ORIGINAL strings. Inputs containing NUL bytes would alias the
    sentinel; substitute such bytes upstream (never present in the
    name/url/title corpora this targets)."""
    k = tau + 1
    blk = [block_col] if block_col else []
    base = df.select(*blk, F.col(id_col).alias("_id"),
                     F.col(str_col).alias("_s"),
                     F.concat(F.col(str_col), F.lit("\x00" * k))
                      .alias("_sp"))
    l = F.length("_sp")

    # indexed side: one row per segment — key (i, own length, segment)
    idx_parts = []
    for i in range(k):
        st, ln = _seg_start(l, i, k), _seg_len(l, i, k)
        idx_parts.append(F.struct(
            F.lit(i).alias("i"), l.cast("int").alias("la"),
            F.col("_sp").substr(st + 1, ln).alias("seg")))
    a = (base.withColumn("_e", F.explode(F.array(*idx_parts)))
             .select(*blk, F.col("_id").alias("id_a"),
                     F.col("_s").alias("sa"),
                     "_e.i", "_e.la", "_e.seg")
             .filter(F.length("seg") > 0))

    # probe side: for every candidate partner length la in
    # [len-tau, len+tau] and segment i, emit the substring at every
    # start within tau of the segment's home position.
    lb = F.length("_sp")
    la_seq = F.sequence((lb - tau).cast("int"), (lb + tau).cast("int"))
    # NB: a two-parameter transform lambda receives (element, INDEX) in
    # pyspark — capturing the segment id via a default arg would silently
    # bind the array index instead; use a closure factory.
    def _probe_for(i: int):
        def build(la):
            return F.struct(
                F.lit(i).alias("i"), la.alias("la"),
                _seg_start(la.cast("long"), i, k).cast("int").alias("st"),
                _seg_len(la.cast("long"), i, k).cast("int").alias("ln"))
        return build

    probe_structs = [F.transform(la_seq, _probe_for(i)) for i in range(k)]
    probes = F.flatten(F.array(*probe_structs))
    shifts = F.sequence(F.lit(-tau), F.lit(tau))
    expanded = F.flatten(F.transform(
        probes,
        lambda pr: F.transform(
            shifts,
            lambda d: F.struct(
                pr["i"].alias("i"), pr["la"].alias("la"),
                (pr["st"] + d).alias("p"), pr["ln"].alias("ln")))))
    b = (base.withColumn("_e", F.explode(expanded))
             .filter((F.col("_e.p") >= 0) & (F.col("_e.ln") > 0)
                     & (F.col("_e.p") + F.col("_e.ln") <= F.length("_sp")))
             .select(*blk, F.col("_id").alias("id_b"),
                     F.col("_s").alias("sb"),
                     F.col("_e.i").alias("i"), F.col("_e.la").alias("la"),
                     F.col("_sp").substr(F.col("_e.p") + 1, F.col("_e.ln"))
                      .alias("seg")))

    on = blk + ["i", "la", "seg"]
    cand = (a.join(b, on)
             .filter((F.col("la") == F.length("sa") + k)  # key = a's padded len
                     & (F.col("id_a") < F.col("id_b")))
             .select("id_a", "id_b", "sa", "sb")
             .distinct())
    return (cand.withColumn("dist", F.levenshtein("sa", "sb").cast("bigint"))
                .filter(F.col("dist") <= tau)
                .select("id_a", "id_b", "dist"))
