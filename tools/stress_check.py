"""Scale-mechanics stress check for the distributed order primitives.

The oracle fixtures top out at sf0.1 (~600k rows); this CLI exercises
the two-phase rank / prefix-sum machinery (ops/sort.py) at a row count
and partition count two orders of magnitude beyond that, where the
failure modes the design defends against would actually fire:
sample-based range-boundary instability (SCALE.md note 26), offsets
misalignment across partitions, and 33-bit local-index overflow
assumptions. Self-validating (SortValidator style): no oracle needed —
the rank of n distinct keys must be exactly the permutation 1..n and
the prefix sum must hit the closed-form total.

Usage:
    python tools/stress_check.py [n_rows] [n_partitions]   # default 50M, 256
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hops_spark.ops.sort import total_order_prefix_sum, total_order_rank
from hops_spark.session import get_spark


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    # 18 tiers share one JVM and several pin bounded caches /
    # checkpoints; at the default 24g heap the suffix tiers' pinned
    # shuffle-hash builds can tip GC over under concurrent load
    # (observed once, round 9) — the stress battery declares the heap
    # it needs instead of inheriting the query-scale default.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("stress-check")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))

    # rows arrive range-partitioned by id but get re-range-partitioned
    # by the primitive's own sampler; k = 0..n-1 distinct keys give a
    # closed-form expectation for every check below
    base = spark.range(0, n, 1, parts).select(F.col("id").alias("k"))

    t0 = time.time()
    ranked = total_order_rank(base.select("k"), "k", rank_col="r")
    stats = ranked.agg(
        F.count("*").alias("cnt"),
        F.min("r").alias("rmin"), F.max("r").alias("rmax"),
        F.sum("r").alias("rsum"),
        F.sum((F.col("r") - F.col("k") - 1 != 0).cast("long"))
         .alias("mismatches")).collect()[0]
    rank_ok = (stats["cnt"] == n and stats["rmin"] == 1
               and stats["rmax"] == n
               and stats["rsum"] == n * (n + 1) // 2
               and stats["mismatches"] == 0)
    t_rank = time.time() - t0

    t0 = time.time()
    ps = total_order_prefix_sum(
        base.select("k").withColumn("v", F.lit(1)), "v", "k",
        out_col="cum")
    pstats = ps.agg(
        F.max("cum").alias("cmax"),
        F.sum((F.col("cum") - F.col("k") - 1 != 0).cast("long"))
         .alias("mismatches")).collect()[0]
    ps_ok = pstats["cmax"] == n and pstats["mismatches"] == 0
    t_ps = time.time() - t0

    # skewed aggregation: 90% of rows land on key 0 (the celebrity-key
    # regime AQE/salting defends against); the salted two-phase result
    # must equal the closed-form direct answer. n must be a multiple of
    # 1000 so the closed forms below are exact: key 0 holds 9n/10 rows,
    # the other 100 keys (id%1000 for id≡9 mod 10) hold n/1000 each.
    assert n % 1000 == 0, "n_rows must be a multiple of 1000"
    t0 = time.time()
    from hops_spark.ops.agg import salted_agg
    skewed = spark.range(0, n, 1, parts).select(
        F.when(F.col("id") % 10 < 9, F.lit(0).cast("long"))
         .otherwise(F.col("id") % 1000).alias("k"),
        F.lit(1).alias("v"))
    salted = {r["k"]: r["total"] for r in
              salted_agg(skewed, ["k"], [F.sum("v").alias("total")],
                         salt_buckets=64).collect()}
    skew_ok = (salted[0] == 9 * n // 10
               and sum(salted.values()) == n
               and len(salted) == 101
               and salted[999] == n // 1000)
    t_skew = time.time() - t0

    # flagship dedup path at 1M docs with PLANTED duplicates: docs i and
    # i + n_docs/2 for i < n_pairs are byte-identical (distinct word
    # sets otherwise, md5-derived), so LSH + exact-Jaccard verify must
    # return EXACTLY the planted pairs at threshold 1.0 — identical
    # docs agree on every band, and no two distinct docs share a full
    # shingle set. Self-validating at any scale.
    from hops_spark.ops.dedup import minhash_dedup_pairs
    n_docs, n_pairs = 1_000_000, 1_000
    half = n_docs // 2
    t0 = time.time()
    seed = F.when(F.col("id") < half + n_pairs,
                  F.when(F.col("id") >= half, F.col("id") - half)
                   .otherwise(F.col("id"))).otherwise(F.col("id"))
    docs = spark.range(0, n_docs, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.md5(F.concat_ws("|", F.lit(str(w)), seed.cast("string")))
            for w in range(8)]).alias("text"))
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_dedup_pairs(docs, threshold=1.0).collect()}
    dedup_ok = pairs == {(i, i + half) for i in range(n_pairs)}
    t_dedup = time.time() - t0

    # incremental dedup (the production ingest shape): a 10k-doc new
    # batch against the 1M-doc existing corpus. Planted tiers — 1000
    # byte-identical copies (exact), 1000 one-word mutations of 16-word
    # docs (J = 13/15 ≈ 0.867 ≥ 0.8, near-only), 8000 fresh. Exact
    # flags and false-positive-freedom are deterministic contracts
    # (content hash; exact-Jaccard verify); LSH banding recall is
    # probabilistic BY DESIGN (bands=8, rows=2: per-pair miss ≈ 1.5e-5
    # at 0.867), so the near tier asserts recall ≥ 99% rather than
    # exact set equality.
    from hops_spark.ops.dedup import incremental_dedup_flags
    t0 = time.time()
    n_new = 10_000

    def _words(seed_col, n_words=16):
        return [F.md5(F.concat_ws("|", F.lit(str(w)), seed_col.cast("string")))
                for w in range(n_words)]

    exist = spark.range(0, n_docs, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *_words(F.col("id"))).alias("text"))
    base_id = F.when(F.col("id") < 2000, F.col("id")) \
               .otherwise(-F.col("id") - 1)          # fresh: disjoint seeds
    w16 = _words(base_id)
    w_near = w16[:15] + [F.md5(F.concat_ws("|", F.lit("mut"),
                                           F.col("id").cast("string")))]
    text_new = (F.when(F.col("id") < 1000, F.concat_ws(" ", *w16))
                 .when(F.col("id") < 2000, F.concat_ws(" ", *w_near))
                 .otherwise(F.concat_ws(" ", *w16)))
    new = spark.range(0, n_new, 1, 32).select(
        (F.col("id") + 10_000_000).alias("doc_id"), text_new.alias("text"))
    flags = {r["doc_id"]: (r["exact_dup"], r["near_dup"], r["is_kept"])
             for r in incremental_dedup_flags(
                 new, exist, n_hashes=16, bands=8, threshold=0.8).collect()}
    exact_ids = {d for d, f in flags.items() if f[0]}
    near_only = {d for d, f in flags.items() if f[1] and not f[0]}
    kept = {d for d, f in flags.items() if f[2]}
    inc_ok = (len(flags) == n_new
              and exact_ids == {10_000_000 + i for i in range(1000)}
              and near_only <= {10_001_000 + i for i in range(1000)}
              and len(near_only) >= 990
              and {10_002_000 + i for i in range(8000)} <= kept
              and kept.isdisjoint(exact_ids | near_only))
    t_inc = time.time() - t0

    # ANN serving path at 1M vectors (dim 32): 10 query vectors each
    # have one PLANTED EXACT-DUPLICATE vector in the corpus; after the
    # cell-partitioned SQ8 index build + nprobe=1 probe, the duplicate
    # MUST rank 1 for its query (dequantized cosine ~0.9999 vs a random
    # max around 0.7 at dim 32 — a wide deterministic margin), proving
    # assign + quantize + pruned probe end-to-end at index scale.
    from hops_spark.ops.similarity import (build_cell_index, ivf_centroids,
                                           probe_cell_index)
    from hops_spark.session import scratch_dir
    t0 = time.time()
    n_vec, dim, half_v = 1_000_000, 32, 500_000
    vseed = F.when((F.col("id") >= half_v) & (F.col("id") < half_v + 10),
                   F.col("id") - half_v).otherwise(F.col("id"))
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: ((F.conv(F.substring(F.md5(F.concat_ws(
            "|", vseed.cast("string"), j.cast("string"))), 1, 4), 16, 10)
            .cast("long") % 2001 - 1000) / 1000.0).cast("float"))
    vecs = spark.range(0, n_vec, 1, parts).select(
        F.col("id").alias("vec_id"), comp.alias("embedding"))
    cents = ivf_centroids(vecs, 64)
    idx_dir = os.path.join(scratch_dir("stress_ann"), "vectors")
    build_cell_index(vecs, cents, idx_dir)
    queries = (vecs.filter(F.col("vec_id") < 10)
                   .select(F.col("vec_id").alias("q_id"),
                           F.col("embedding").alias("q_vec")))
    top, probed = probe_cell_index(spark, idx_dir, cents, queries,
                                   k=1, nprobe=1)
    top1 = {r["q_id"]: r["neighbor_id"] for r in top.collect()}
    ann_ok = (top1 == {i: half_v + i for i in range(10)}
              and 1 <= len(probed) <= 10)
    t_ann = time.time() - t0

    # metadata engine at 10M inodes: parent = id div 1000 -> every dir
    # holds exactly 1000 files of size (id % 97); closed-form du per
    # sampled dirs and exact listing counts
    t0 = time.time()
    n_ino = 10_000_000
    ino = spark.range(0, n_ino, 1, parts).select(
        F.col("id").alias("inode_id"),
        (F.col("id") / 1000).cast("long").alias("parent"),
        F.pmod("id", F.lit(97)).alias("size"))
    du = {r["parent"]: (r["n"], r["b"]) for r in
          ino.groupBy("parent")
             .agg(F.count("*").alias("n"), F.sum("size").alias("b"))
             .where(F.col("parent").isin(0, 4321, 9999)).collect()}

    def _du(p):
        return (1000, sum((p * 1000 + j) % 97 for j in range(1000)))
    meta_ok = du == {p: _du(p) for p in (0, 4321, 9999)}
    t_meta = time.time() - t0

    # Two-level IVF assignment at high cell count (SCALE.md note 45 as
    # a repeatable tier): (a) correctness — full-probe two-level must
    # equal flat argmax EXACTLY (the reduction law) at 256 cells on 5k
    # vectors; (b) the cost drop — partial-probe two-level vs flat at
    # 2048 cells on 50k vectors, self-reported speedup.
    from hops_spark.ops.similarity import _cell_sims, two_level_cell
    t0 = time.time()
    dim2 = 16
    comp2 = F.transform(
        F.sequence(F.lit(0), F.lit(dim2 - 1)),
        lambda j: ((F.conv(F.substring(F.md5(F.concat_ws(
            "|", F.col("id").cast("string"), j.cast("string"))), 1, 4),
            16, 10).cast("long") % 2001 - 1000) / 1000.0))
    small = spark.range(0, 5_000).select(
        F.col("id").alias("vec_id"), comp2.alias("embedding")) \
        .localCheckpoint(eager=True)
    c256 = ivf_centroids(small, 256)
    flat_cell = F.array_max(_cell_sims(F.col("embedding"), c256)) \
        .getField("cell")
    full_two = two_level_cell(F.col("embedding"), c256,
                              n_coarse=16, coarse_probes=16)
    tl_exact_ok = (small.select(flat_cell.alias("f"),
                                full_two.alias("t"))
                   .filter(F.col("f") != F.col("t")).count() == 0)
    big = spark.range(0, 50_000, 1, parts).select(
        F.col("id").alias("vec_id"), comp2.alias("embedding")) \
        .localCheckpoint(eager=True)
    c2048 = ivf_centroids(big, 2048)
    def _measure_pair():
        t1 = time.time()
        big.select(F.array_max(_cell_sims(F.col("embedding"), c2048))
                   .getField("cell").alias("c")).groupBy("c").count().count()
        t_f = time.time() - t1
        t1 = time.time()
        big.select(two_level_cell(F.col("embedding"), c2048,
                                  coarse_probes=4)
                   .alias("c")).groupBy("c").count().count()
        return t_f, time.time() - t1

    t_flat_assign, t_two_assign = _measure_pair()
    if t_two_assign >= t_flat_assign:
        # timing tiers retry once: a single GC/JIT hiccup after the
        # heavy ANN tier once inverted this pair (idle rerun in
        # isolation showed the normal 2x immediately) — correctness
        # (tl_exact_ok) never retries
        t_flat_assign, t_two_assign = _measure_pair()
    tl_ok = tl_exact_ok and t_two_assign < t_flat_assign
    t_tl = time.time() - t0

    # tf-WEIGHTED near-dup at 200k docs: 500 planted tf-twin pairs
    # (doc B = doc A's 16-word multiset with one word's tf raised 1->3:
    # weighted J = sum min / sum max = 16/18 = 888888 ppm exactly, and
    # the capped-expansion signature similarity is 16/18 too), all
    # other docs on DISJOINT md5 vocabularies (weighted J = 0 — zero
    # false positives is a deterministic contract). bands=8 (rows=2)
    # puts per-pair banding miss at ~4e-6, so the planted set must be
    # recovered >= 99% with EXACT 888888 ppm values on every hit.
    from hops_spark.ops.dedup import weighted_jaccard_pairs
    t0 = time.time()
    n_wdocs = 200_000
    whalf = n_wdocs // 2
    n_wpairs = 500
    wbase = F.when((F.col("id") >= whalf)
                   & (F.col("id") < whalf + n_wpairs),
                   F.col("id") - whalf).otherwise(F.col("id"))
    wwords = [F.md5(F.concat_ws("|", F.lit(f"w{w}"), wbase.cast("string")))
              for w in range(16)]
    twin_tail = [wwords[15], wwords[15]]          # tf 1 -> 3 on word 15
    wtext = F.when((F.col("id") >= whalf) & (F.col("id") < whalf + n_wpairs),
                   F.concat_ws(" ", *(wwords + twin_tail)))              .otherwise(F.concat_ws(" ", *wwords))
    wdocs = spark.range(0, n_wdocs, 1, parts).select(
        F.col("id").alias("doc_id"), wtext.alias("text"))
    wgot = {(r["id_a"], r["id_b"]): r["wjac_ppm"]
            for r in weighted_jaccard_pairs(
                wdocs, bands=8, threshold_ppm=700_000).collect()}
    wwant = {(i, i + whalf) for i in range(n_wpairs)}
    wj_ok = (set(wgot) <= wwant
             and len(wgot) >= int(n_wpairs * 0.99)
             and all(v == 888_888 for v in wgot.values()))
    t_wj = time.time() - t0

    # degree-oriented triangle counting on the adversarial hub shape:
    # one hub ("aaa" — sorts FIRST, so the lexicographic orientation
    # used by naive wedge joins would give it out-degree 100k and
    # enumerate C(100k, 2) ~ 5e9 wedges) connected to 100k leaves,
    # plus a (leaf_i, leaf_{i+1}) chain edge for the first 2000 leaves
    # -> EXACTLY 2000 triangles {hub, i, i+1}. Degree orientation
    # points every leaf edge INTO the hub (out-degree 0 there), so
    # wedge volume collapses to the chain neighborhoods and the exact
    # count must come back in seconds, not core-hours.
    from hops_spark.ops.graph import triangle_rows
    t0 = time.time()
    n_leaves, n_tri = 100_000, 2_000
    leaves = spark.range(0, n_leaves, 1, 32).select(
        F.concat(F.lit("leaf"), F.lpad(F.col("id").cast("string"), 7, "0"))
         .alias("dst")).withColumn("src", F.lit("aaa"))
    chain = spark.range(0, n_tri, 1, 32).select(
        F.concat(F.lit("leaf"), F.lpad(F.col("id").cast("string"), 7, "0"))
         .alias("src"),
        F.concat(F.lit("leaf"), F.lpad((F.col("id") + 1).cast("string"),
                                       7, "0")).alias("dst"))
    hub_edges = leaves.select("src", "dst").unionByName(chain)
    got_tri = triangle_rows(hub_edges).count()
    tri_ok = got_tri == n_tri
    t_tri = time.time() - t0

    # EXACT-substring spans (suffix-sort path) at 100k docs / 4M suffix
    # rows: all docs on disjoint md5 vocabularies (zero duplicated
    # windows — false positives are a deterministic contract, the
    # method hashes nothing), except 500 planted pairs where doc
    # (half+i) embeds a verbatim 20-token passage of doc i at a
    # different offset. With min_tokens=12, cap=16 the expected output
    # is CLOSED-FORM: exactly (i, 10, 29, 20) and (half+i, 5, 24, 20)
    # per pair — maximal spans, exact boundaries, nothing else.
    from hops_spark.ops.dedup import suffix_dup_spans
    t0 = time.time()
    n_sdocs, n_span_pairs = 100_000, 500
    shalf = n_sdocs // 2
    s_planted = (F.col("id") >= shalf) & (F.col("id") < shalf + n_span_pairs)

    def _sword(w):
        own = F.md5(F.concat_ws("|", F.lit(f"sw{w}"),
                                F.col("id").cast("string")))
        if 5 <= w <= 24:   # copy holds source positions 10..29
            src = F.md5(F.concat_ws("|", F.lit(f"sw{w + 5}"),
                                    (F.col("id") - shalf).cast("string")))
            return F.when(s_planted, src).otherwise(own)
        return own

    sdocs = spark.range(0, n_sdocs, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[_sword(w) for w in range(40)]).alias("text"))
    got_spans = {tuple(r) for r in suffix_dup_spans(
        sdocs, min_tokens=12, prefix_cap=16, dict_encode=False).collect()}
    want_spans = ({(i, 10, 29, 20) for i in range(n_span_pairs)}
                  | {(shalf + i, 5, 24, 20) for i in range(n_span_pairs)})
    spans_ok = got_spans == want_spans
    t_spans = time.time() - t0
    # dictionary-encoded payload (round-9, SCALE.md note 88): the
    # order-isomorphic int-code path must return the IDENTICAL span
    # set at the 4M-suffix scale; its wall time rides along as the
    # measured payoff of shipping 8-byte codes instead of 33-char
    # md5 tokens through the range exchange + adjacency join.
    t0 = time.time()
    got_spans_int = {tuple(r) for r in suffix_dup_spans(
        sdocs, min_tokens=12, prefix_cap=16, dict_encode=True).collect()}
    spans_int_ok = got_spans_int == want_spans
    t_spans_int = time.time() - t0

    # --- PQ encode + ADC at 1M vectors (map-only machinery): vectors
    # are EXACTLY representable — subvector s of vector i is planted
    # pattern (i >> 3s) % 8, so with the planted codebook the encode
    # must produce exactly 4096 distinct packed codes with a uniform
    # 256 members each (n = 2^20) and ZERO total quantization error
    # (every subvector reconstructs bit-exactly). Self-validating
    # closed form; exercises the literal-codebook assign expression,
    # the packed-code path, and the unpack joins at corpus scale.
    from hops_spark.ops.pq import PQ_MICRO, pq_encode, pq_subvectors
    from hops_spark.ops.pq import _assign_code

    t0 = time.time()
    pq_n, pq_m, pq_k, pq_d = 1 << 20, 4, 8, 16
    pq_ds = pq_d // pq_m
    dims = []
    for s in range(pq_m):
        p = (F.shiftright(F.col("id"), 3 * s) % pq_k).cast("double")
        for j in range(pq_ds):
            dims.append((p + s * 10 + j) / 8.0)
    vecs = spark.range(0, pq_n, 1, parts).select(
        F.col("id").alias("vec_id"),
        F.array(*dims).cast("array<float>").alias("embedding"))
    import math
    pq_cb = {}
    for s in range(pq_m):
        for c in range(pq_k):
            pq_cb[(s, c)] = [
                math.floor(float(
                    __import__("numpy").float32((c + s * 10 + j) / 8.0))
                    * PQ_MICRO)
                for j in range(pq_ds)]
    enc = pq_encode(vecs, pq_cb, m=pq_m, k=pq_k, d=pq_d)
    code_stats = (enc.groupBy("pq_code").agg(F.count("*").alias("nn"))
                     .agg(F.count("*").alias("n_codes"),
                          F.min("nn").alias("cmin"),
                          F.max("nn").alias("cmax"),
                          F.sum("nn").alias("ctot")).collect()[0])
    cb_rows = [(s, c, v) for (s, c), v in sorted(pq_cb.items())]
    cb_df = spark.createDataFrame(cb_rows,
                                  "sub int, code int, cv array<bigint>")
    subs = pq_subvectors(vecs, pq_m, pq_d)
    coded = subs.withColumn("code", _assign_code(pq_cb, pq_m, pq_k))
    distortion = (coded.join(F.broadcast(cb_df), ["sub", "code"])
                       .select(F.aggregate(
                           F.zip_with("sv", "cv",
                                      lambda x, c: (x - c) * (x - c)),
                           F.lit(0).cast("long"),
                           lambda acc, x: acc + x).alias("dd"))
                       .agg(F.sum("dd")).collect()[0][0])
    pq_ok = (code_stats["n_codes"] == pq_k ** pq_m
             and code_stats["cmin"] == code_stats["cmax"] == pq_n // pq_k ** pq_m
             and code_stats["ctot"] == pq_n
             and distortion == 0)
    t_pq = time.time() - t0

    # --- media fingerprint dedup at 133k items with a 100k
    # boilerplate mass (tier 13, round 9 — the cap fix's honest-scale
    # proof): 100k IDENTICAL black-frame fingerprints (one distinct
    # fingerprint after the collapse — the pre-fix band join would
    # have built 10^10 candidate rows from this alone), 30k distinct
    # items whose four 16-bit bands all equal their 1-based index
    # (any two items share NO band and sit >= 4 bits apart — zero
    # candidates by construction), 500 planted near-dup copies
    # (bands 0/3 get bit 15 flipped -> hamming 2, found via untouched
    # bands 1/2; idx <= 30000 < 0x8000 keeps the flipped values out
    # of the item set), and a 2000-member HOT BAND group (constant
    # band-0 value, unique other bands, adjacent members within
    # hamming 8) discoverable ONLY through the hot band — the
    # max_bucket=1000 cap must drop that band entirely, so the
    # closed-form flag set is EXACTLY boilerplate-minus-min +
    # planted copies: 100,499 rows. Uses the LINEAR flag form
    # (fingerprint_dup_ids, the streaming path); output equality is
    # exact, runtime bounds the candidate volume.
    from hops_spark.ops.fingerprint import fingerprint_dup_ids
    t0 = time.time()
    n_boiler, n_items, n_copies, n_hot = 100_000, 30_000, 500, 2_000
    c0 = n_boiler + n_items            # first copy id
    h0 = c0 + n_copies                 # first hot id
    n_media = h0 + n_hot
    mid = F.col("id")
    idx = (mid - n_boiler + 1)                      # items: 1..30000
    s_ = (mid - c0 + 1)                             # copies: source idx
    u_ = (mid - h0 + 40_000)                        # hot: unique bands
    hi = (F.when(mid < n_boiler, F.lit(0))
           .when(mid < c0, idx * 65536 + idx)
           .when(mid < h0, s_.bitwiseOR(F.lit(0x8000)) * 65536 + s_)
           .otherwise(F.lit(0x7FFF) * 65536 + u_)).cast("long")
    lo = (F.when(mid < n_boiler, F.lit(0))
           .when(mid < c0, idx * 65536 + idx)
           .when(mid < h0, s_ * 65536 + s_.bitwiseOR(F.lit(0x8000)))
           .otherwise(u_ * 65536 + u_)).cast("long")
    media_fp = spark.range(0, n_media, 1, parts).select(
        mid.alias("media_id"), hi.alias("hi"), lo.alias("lo"))
    got_flags = {r["media_id"] for r in
                 fingerprint_dup_ids(media_fp, threshold=8,
                                     max_bucket=1000).collect()}
    want_flags = (set(range(1, n_boiler))
                  | set(range(c0, c0 + n_copies)))
    media_ok = got_flags == want_flags
    t_media = time.time() - t0

    # --- cross-corpus EXACT-span decontamination at 100k corpus docs
    # vs a 1k-doc benchmark (tier 16, round 9): every doc on an
    # id-salted md5 vocabulary (unplanted overlap impossible — the
    # exact method hashes nothing), except 500 corpus docs that embed
    # a verbatim 15-token passage of benchmark doc i at offset 7.
    # With min_tokens=12 the expected output is CLOSED-FORM: exactly
    # (c0+i, 7, 21, 15) per planted doc — maximal interval union of
    # the four flagged 12-gram windows, exact boundaries, nothing
    # else. Self-validating at any scale.
    from hops_spark.ops.dedup import contamination_exact_spans
    t0 = time.time()
    n_cdocs, n_bdocs, n_leaks = 100_000, 1_000, 500
    leak = F.col("id") < n_leaks

    def _cword(w):
        own = F.md5(F.concat_ws("|", F.lit(f"cw{w}"),
                                F.col("id").cast("string")))
        if 7 <= w <= 21:    # bench positions 3..17 of bench doc id
            src = F.md5(F.concat_ws("|", F.lit(f"bw{w - 4}"),
                                    F.col("id").cast("string")))
            return F.when(leak, src).otherwise(own)
        return own

    cdocs = spark.range(0, n_cdocs, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[_cword(w) for w in range(40)]).alias("text"))
    bdocs = spark.range(0, n_bdocs, 1, 32).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat_ws(" ", *[
            F.md5(F.concat_ws("|", F.lit(f"bw{w}"),
                              F.col("id").cast("string")))
            for w in range(30)]).alias("text"))
    got_decon = {tuple(r) for r in contamination_exact_spans(
        cdocs, bdocs, min_tokens=12).collect()}
    decon_ok = got_decon == {(i, 7, 21, 15) for i in range(n_leaks)}
    t_decon = time.time() - t0

    # label propagation at 1M nodes: 200k planted 5-node STARS
    # (center g*5, members g*5+1..g*5+4) resolve to the center label in
    # ROUND 1 under the self-vote (every vote count ties at 1, min
    # label = center) and stay fixed — expected label(v) = 5*(v div 5)
    # for every node, a closed form over the whole graph. A planted
    # 6-node PATH (ids B..B+5) additionally certifies the propagation
    # depth: with ties-to-min, round k gives node i label
    # max(B, B+i-k), so after 3 rounds label(B+i) = B + max(0, i-3) —
    # the fixed-round contract stated in the op docstring, asserted
    # not assumed.
    from hops_spark.ops.graph import label_propagation_sync
    t0 = time.time()
    n_lpa = 1_000_000
    star_base = spark.range(0, n_lpa, 1, parts).filter(
        F.col("id") % 5 != 0)
    star_edges = star_base.select(
        ((F.col("id") / 5).cast("long") * 5).alias("src"),
        F.col("id").alias("dst"))
    pb = 10_000_000
    path_edges = spark.range(0, 5).select(
        (F.col("id") + pb).alias("src"), (F.col("id") + pb + 1).alias("dst"))
    lpa = label_propagation_sync(
        star_edges.unionByName(path_edges), iters=3)
    bad_stars = (lpa.filter(F.col("node") < n_lpa)
                    .filter(F.col("label")
                            != (F.col("node") / 5).cast("long") * 5)
                    .count())
    path_lbl = {r["node"] - pb: r["label"] - pb for r in
                lpa.filter(F.col("node") >= pb).collect()}
    lpa_ok = (bad_stars == 0
              and lpa.count() == n_lpa + 6
              and path_lbl == {i: max(0, i - 3) for i in range(6)})
    t_lpa = time.time() - t0

    # two-tier interval join under planted LONG-span skew: 100k long
    # sessions of 2000·W each against 1M short point-events. The fine
    # width would replicate each long row ~2001× (2·10^8 exploded
    # rows); the coarse tier caps it at span/(64·W)+1 ≈ 32 — the audit
    # counter asserts the arithmetic BEFORE the join runs, then the
    # join itself is verified by a closed form: long session g covers
    # [g·20000, g·20000+20000], events at e·1000 (exactly the session
    # boundary multiples), so event e overlaps session g iff
    # g = (e·1000 - 20000)/20000 .. e·1000/20000 intersected with the
    # id ranges — total pairs = a computable constant.
    from hops_spark.ops.join import (interval_overlap_join_two_tier,
                                     interval_replication)
    t0 = time.time()
    w_iv, lf_iv = 10, 64
    n_long, n_ev = 100_000, 1_000_000
    span = 2000 * w_iv                                   # 20000
    longs = spark.range(0, n_long, 1, parts).select(
        F.col("id").alias("l_id"),
        (F.col("id") * span).alias("l_start"),
        (F.col("id") * span + span).alias("l_end"))
    events = spark.range(0, n_ev, 1, parts).select(
        F.col("id").alias("r_id"),
        (F.col("id") * 1000).alias("r_start"),
        (F.col("id") * 1000).alias("r_end"))
    rep_fine = interval_replication(longs, w_iv, "l_start", "l_end")
    rep_coarse = interval_replication(longs, w_iv * lf_iv,
                                      "l_start", "l_end")
    rep_ok = (rep_fine == n_long * (span // w_iv + 1)
              and rep_coarse <= n_long * (span // (w_iv * lf_iv) + 2))
    # closed form over the FULL join: event at t=e·1000 overlaps
    # session g iff g·span <= t <= g·span+span, i.e. g in
    # [ceil((t-span)/span), floor(t/span)] ∩ [0, n_long) — every t
    # here is inside coverage, so each event pairs with exactly 2
    # sessions when t is a positive multiple of span (e divisible by
    # span/1000 = 20, e >= 20) and 1 otherwise.
    expect_pairs = n_ev + (n_ev - 1) // (span // 1000)
    got_pairs = interval_overlap_join_two_tier(
        longs, events, w_iv, long_factor=lf_iv).count()
    iv_ok = bool(rep_ok and got_pairs == expect_pairs)
    t_iv = time.time() - t0

    # tier 19 — trigram-KN ARPA export + ARPA-consumer scoring at 500k
    # docs / ~1M model rows, fully closed-form (round 11). Corpus:
    # 1000 groups x 500 docs, doc d in group g is
    # "a_g b_g c_g a_g b_g c_g x_d" — per group the trigram counts are
    # abc=2m, bca=m, cab=m plus one singleton bcx_d per doc, so the
    # section sizes are exact (ord3 = 3g kept at prune>=2, ord2 =
    # 3g + n pairs, ord1 = 3g + n words) and EVERY doc scores
    # identically: 5 trigram tokens, exactly 1 through the backoff
    # branch (the pruned singleton). The consumer total is
    # cross-checked against the exported table's own stored integers
    # (only the -ln(bow) term is recomputed, +-1 micro tolerance for
    # the last-ulp ln difference between python and the engines).
    import math

    from hops_spark.ops.lm import kn3_arpa, kn3_doc_scores, trigram_count_table
    t0 = time.time()
    kg, km = 1000, 500
    n_kn = kg * km
    kdocs = spark.range(0, n_kn, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.format_string("a%d b%d c%d a%d b%d c%d x%d",
                        F.col("id") % kg, F.col("id") % kg,
                        F.col("id") % kg, F.col("id") % kg,
                        F.col("id") % kg, F.col("id") % kg,
                        F.col("id")).alias("text"))
    arpa = kn3_arpa(trigram_count_table(kdocs), prune3=2)
    sec = {r["ord"]: (r["cnt"], r["dn"]) for r in
           arpa.groupBy("ord").agg(
               F.count("*").alias("cnt"),
               F.countDistinct("nlp_micro").alias("dn")).collect()}
    # ord3: 3 per group, each role (abc/bca/cab) one distinct nlp value
    # corpus-wide; ord2: 3g + n rows; ord1: 3g + n rows
    arpa_ok = (sec[3] == (3 * kg, 3)
               and sec[2][0] == 3 * kg + n_kn
               and sec[1][0] == 3 * kg + n_kn)
    scored = kn3_doc_scores(kdocs, prune3=2)
    st = scored.agg(
        F.count("*").alias("docs"),
        F.sum("n_trigrams").alias("tt"),
        F.sum("n_backoff").alias("tb"),
        F.countDistinct("nll3_micro").alias("dnll"),
        F.max("nll3_micro").alias("nll")).collect()[0]
    # stored-integer replay of the identical per-doc cost: group-0
    # rows stand for all (dnll == 1 certifies corpus-wide identity)
    rows = {(r["ord"], r["w1"], r["w2"], r["w3"]): r
            for r in arpa.filter(
                F.col("w1").isin("a0", "b0", "c0")
                | F.col("w2").isin("a0", "b0", "c0")).collect()}
    bow_bc = rows[(2, "b0", "c0", "")]["bow_micro"]
    nlp2_cx = rows[(2, "c0", "x0", "")]["nlp_micro"]
    expect_doc = (2 * rows[(3, "a0", "b0", "c0")]["nlp_micro"]
                  + rows[(3, "b0", "c0", "a0")]["nlp_micro"]
                  + rows[(3, "c0", "a0", "b0")]["nlp_micro"]
                  + int(round(-math.log(bow_bc / 1e6) * 1e6)) + nlp2_cx)
    kn_ok = bool(arpa_ok and st["docs"] == n_kn
                 and st["tt"] == 5 * n_kn and st["tb"] == n_kn
                 and st["dnll"] == 1
                 and abs(st["nll"] - expect_doc) <= 1)
    t_kn = time.time() - t0

    # tier 20 — preference/reward-model-eval family at 2M docs / 1M
    # pairs, fully closed-form (round 12). Scored sides are synthesized
    # directly (the ops take any frame with the pair columns): pair k
    # pits source m{k%10} against m{(k%10+1+k%9)%10} (offset 1..9, so
    # never self), with scores 1000+k%7 vs 1000+(k+3)%7 — every
    # outcome is a pure function of k mod lcm(10,9,7)=630, so the
    # exact #models² win matrix is a 630-cycle count replicated in
    # python and compared row-for-row against the distributed
    # single-aggregation pair assembly. Fleiss kappa runs over 1M
    # constructed votes (votes_a = k%4, per-source cycle 20) against
    # exact-Fraction per-source truth.
    from fractions import Fraction as _Fr

    from hops_spark.ops.preference import (bradley_terry_fit,
                                           cross_model_outcomes,
                                           fleiss_agreement,
                                           pairwise_win_matrix)
    t0 = time.time()
    n_pref = 2_000_000
    n_pp = n_pref // 2
    sides = spark.range(0, n_pref, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.lit("").alias("text"),
        F.expr("concat('m', CASE WHEN id % 2 = 0 "
               "THEN (id div 2) % 10 "
               "ELSE ((id div 2) % 10 + 1 + (id div 2) % 9) % 10 END)"
               ).alias("source"),
        F.expr("CASE WHEN id % 2 = 0 THEN 1000 + (id div 2) % 7 "
               "ELSE 1000 + ((id div 2) + 3) % 7 END").cast("long")
         .alias("quality_score_ppm"),
        F.lit(1).cast("long").alias("n_words"))
    got_wm = {(r["model_a"], r["model_b"]): (r["n_pairs"], r["wins_a"])
              for r in pairwise_win_matrix(
                  cross_model_outcomes(sides)).collect()}

    def _pref_truth(n_pairs):
        acc = {}
        cyc = 630
        base = {}
        for k in range(cyc):
            a, b = k % 10, (k % 10 + 1 + k % 9) % 10
            sa, sb = 1000 + k % 7, 1000 + (k + 3) % 7
            ma, mb = f"m{min(a, b)}", f"m{max(a, b)}"
            win_a = ((sa >= sb) == (a <= b))  # canonical side's win
            np_, wa_ = base.get((ma, mb), (0, 0))
            base[(ma, mb)] = (np_ + 1, wa_ + (1 if win_a else 0))
        full, rem = divmod(n_pairs, cyc)
        for key, (np_, wa_) in base.items():
            acc[key] = (np_ * full, wa_ * full)
        for k in range(rem):
            a, b = k % 10, (k % 10 + 1 + k % 9) % 10
            sa, sb = 1000 + k % 7, 1000 + (k + 3) % 7
            ma, mb = f"m{min(a, b)}", f"m{max(a, b)}"
            win_a = ((sa >= sb) == (a <= b))
            np_, wa_ = acc.get((ma, mb), (0, 0))
            acc[(ma, mb)] = (np_ + 1, wa_ + (1 if win_a else 0))
        return {k: v for k, v in acc.items() if v[0] > 0}

    wm_ok = got_wm == _pref_truth(n_pp)
    st_bt = bradley_terry_fit(
        [(a, b, wa_, np_ - wa_)
         for (a, b), (np_, wa_) in sorted(got_wm.items())])
    bt_ok = (len(st_bt) == 10 and min(st_bt.values()) > 0
             and abs(sum(st_bt.values()) - 10 * 1_000_000) <= 10)
    votes = spark.range(0, n_pp, 1, parts).select(
        F.col("id").alias("pair_id"),
        F.expr("concat('m', id % 10)").alias("source"),
        (F.col("id") % 4).cast("long").alias("votes_a"))
    got_fl = {r["source"]: (r["n_pairs"], r["kappa_ppm"])
              for r in fleiss_agreement(votes, n_judges=3).collect()}

    def _fl_truth(src_i, n_pairs):
        vs = [k % 4 for k in range(src_i, n_pairs, 10)]
        n = len(vs)
        s = sum(v * (v - 1) + (3 - v) * (2 - v) for v in vs)
        a = sum(vs)
        pe = _Fr(a * a + (3 * n - a) ** 2, (3 * n) ** 2)
        if pe == 1:
            return (n, 1_000_000)
        kap = (_Fr(s, 6 * n) - pe) / (1 - pe)
        return (n, (kap.numerator * 1_000_000) // kap.denominator)

    fl_ok = all(got_fl[f"m{i}"] == _fl_truth(i, n_pp) for i in range(10))
    pref_ok = bool(wm_ok and bt_ok and fl_ok)
    t_pref = time.time() - t0

    out = {"job": "stress_check", "n_rows": n, "n_partitions": parts,
           "rank_ok": bool(rank_ok), "rank_sec": round(t_rank, 1),
           "prefix_sum_ok": bool(ps_ok), "prefix_sum_sec": round(t_ps, 1),
           "skew_agg_ok": bool(skew_ok), "skew_agg_sec": round(t_skew, 1),
           "dedup_1m_ok": bool(dedup_ok), "dedup_1m_sec": round(t_dedup, 1),
           "incremental_dedup_ok": bool(inc_ok),
           "incremental_dedup_sec": round(t_inc, 1),
           "ann_1m_ok": bool(ann_ok), "ann_1m_sec": round(t_ann, 1),
           "meta_10m_ok": bool(meta_ok), "meta_10m_sec": round(t_meta, 1),
           "two_level_ok": bool(tl_ok), "two_level_sec": round(t_tl, 1),
           "two_level_flat_assign_sec": round(t_flat_assign, 1),
           "two_level_two_assign_sec": round(t_two_assign, 1),
           "weighted_dedup_ok": bool(wj_ok),
           "weighted_dedup_sec": round(t_wj, 1),
           "triangle_hub_ok": bool(tri_ok),
           "triangle_hub_sec": round(t_tri, 1),
           "substring_spans_ok": bool(spans_ok),
           "substring_spans_sec": round(t_spans, 1),
           "substring_spans_int_ok": bool(spans_int_ok),
           "substring_spans_int_sec": round(t_spans_int, 1),
           "pq_1m_ok": bool(pq_ok), "pq_1m_sec": round(t_pq, 1),
           "media_fp_ok": bool(media_ok),
           "media_fp_sec": round(t_media, 1),
           "decon_spans_ok": bool(decon_ok),
           "decon_spans_sec": round(t_decon, 1),
           "lpa_1m_ok": bool(lpa_ok), "lpa_1m_sec": round(t_lpa, 1),
           "interval_two_tier_ok": bool(iv_ok),
           "interval_two_tier_sec": round(t_iv, 1),
           "interval_rep_fine": int(rep_fine),
           "interval_rep_coarse": int(rep_coarse),
           "kn_trigram_ok": bool(kn_ok),
           "kn_trigram_sec": round(t_kn, 1),
           "preference_2m_ok": bool(pref_ok),
           "preference_2m_sec": round(t_pref, 1)}
    print(json.dumps(out))
    return 0 if all((rank_ok, ps_ok, skew_ok, dedup_ok, inc_ok,
                     ann_ok, meta_ok, tl_ok, wj_ok, tri_ok,
                     spans_ok, spans_int_ok, pq_ok, media_ok, decon_ok,
                     lpa_ok, iv_ok, kn_ok, pref_ok)) else 1


if __name__ == "__main__":
    raise SystemExit(main())
