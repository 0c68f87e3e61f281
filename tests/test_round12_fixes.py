"""Round-12 regression tests for the three ADVICE.md r11 findings:
the KN3 pass-through backoff encoding (stored 0 mis-decoded as
bow=1e-6, a ~13.8-nat penalty per hop on out-of-training text), the
float pair/group ids in the preference operators (inexact past 2^53),
and the calibration bin width (misallocated top bins whenever ``bins``
does not divide LP_MICRO evenly)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bo(arpa, key):
    """Decode a stored backoff weight exactly as KN3_BO does."""
    r = arpa.get(key)
    b = r["bow_micro"] if r is not None else 1_000_000
    return int(round(-math.log(max(b, 1) / 1e6) * 1e6))


def test_kn3_passthrough_context_costs_zero(spark):
    """The ADVICE.md reproduction: train on 'a b c d', score 'b c d e'.
    The trigram (c, d, e) double-backs-off through bow2(c, d) — a
    suffix-only pair, never a prefix — and bow1(d) — never a middle.
    Both are pass-through contexts (weight 1, cost 0), so the trigram
    must cost exactly the <unk> floor ln(t2 + 1), NOT two extra
    13.8-nat penalties from decoding a stored-0 sentinel as 1e-6."""
    from hops_spark.ops.lm import (BOW_PASSTHROUGH, kn3_arpa,
                                   kn3_heldout_scores,
                                   trigram_count_table)

    train = _docs(spark, [(0, "a b c d")])
    arpa = {(r["ord"], r["w1"], r["w2"], r["w3"]): r
            for r in kn3_arpa(trigram_count_table(train),
                              prune3=2).collect()}
    # (c, d) is a suffix pair of (b, c, d) but never a prefix context;
    # d is a continuation word but never a middle: both pass-through
    assert arpa[(2, "c", "d", "")]["bow_micro"] == BOW_PASSTHROUGH
    assert arpa[(1, "d", "", "")]["bow_micro"] == BOW_PASSTHROUGH
    assert _bo(arpa, (2, "c", "d", "")) == 0
    assert _bo(arpa, (1, "d", "", "")) == 0
    # genuine weights are unaffected: (b, c) IS a prefix (of b c d)
    assert 0 < arpa[(2, "b", "c", "")]["bow_micro"] <= 750_000

    got = kn3_heldout_scores(train, _docs(spark, [(1, "b c d e")]),
                             prune3=2).collect()[0]
    t2 = sum(1 for k, r in arpa.items()
             if k[0] == 2 and r["nlp_micro"] is not None)
    unk = int(round(math.log(t2 + 1) * 1e6))
    # trigram 1, (b, c, d): pruned (count 1) -> bow2(b, c) + nlp2(c, d)
    c1 = _bo(arpa, (2, "b", "c", "")) + arpa[(2, "c", "d", "")]["nlp_micro"]
    # trigram 2, (c, d, e): pass-through chain + <unk> floor ONLY
    c2 = unk
    assert got["n_trigrams"] == 2
    assert got["n_oov"] == 1
    assert abs(got["nll3_micro"] - (c1 + c2)) <= 2
    # the decisive bound: under the pre-fix decoding this doc scored
    # ~28.7 nats for (c, d, e) alone (two 13.8-nat phantom penalties)
    assert got["nll3_micro"] < c1 + unk + 10


def test_arpa_model_card_counts_passthrough_not_zero(spark):
    """n_bow_passthrough counts stored BOW_PASSTHROUGH (weight-1)
    rows; ord-3 rows (which store 0 = no backoff slot at the highest
    order) contribute none."""
    from hops_spark.ops.lm import (BOW_PASSTHROUGH, kn3_arpa,
                                   trigram_count_table)

    arpa = kn3_arpa(trigram_count_table(
        _docs(spark, [(1, "x y z w"), (2, "x y z q")])), prune3=2)
    card = {r["ord"]: r for r in
            arpa.groupBy("ord").agg(
                F.sum((F.col("bow_micro") == BOW_PASSTHROUGH)
                      .cast("long")).alias("pt"),
                F.count("*").alias("n")).collect()}
    assert card[3]["pt"] == 0                      # no ord-3 backoff slot
    # (z, w) and (z, q) are doc-final suffix-only pairs: pass-through
    assert card[2]["pt"] == 2
    # w and q never appear as middles
    assert card[1]["pt"] == 2


def test_preference_ids_exact_past_double_precision(spark):
    """pair_id / group_id are integer div, exact for any int64 doc_id —
    the float path rounds doc_ids past 2^54 (double spacing 4) before
    dividing."""
    from hops_spark.ops.preference import (preference_pairs,
                                           prompt_group_stats,
                                           scored_docs)

    base = 2 ** 54
    docs = spark.createDataFrame(
        [(base + 2, "s", "plain words here"),
         (base + 3, "s", "zz zz zz")],
        "doc_id long, source string, text string")
    pairs = preference_pairs(scored_docs(docs)).collect()
    assert len(pairs) == 1
    assert pairs[0]["pair_id"] == (base + 2) // 2
    assert {pairs[0]["chosen_id"], pairs[0]["rejected_id"]} == {
        base + 2, base + 3}

    groups = prompt_group_stats(scored_docs(docs), group_size=4).collect()
    assert len(groups) == 1
    assert groups[0]["group_id"] == (base + 2) // 4


def test_calibration_bins_exact_for_nondivisible_bin_count(spark):
    """bins=7: LP_MICRO // 7 = 142857 truncates, so the old width-based
    binning shifted every boundary from bin 5 upward. The exact form
    (p * bins) div LP_MICRO allocates each p to floor(p * bins / 1e6)
    with only the p == 1e6 edge folded into the top bin."""
    from hops_spark.ops.classify import calibration_bin_stats

    ps = [0, 142_856, 142_858, 857_142, 857_143, 999_996, 1_000_000]
    scored = spark.createDataFrame(
        [(p, 0) for p in ps], "p_micro long, _y int")
    got = {}
    for r in calibration_bin_stats(scored, bins=7).collect():
        got[r["bin"]] = got.get(r["bin"], 0) + r["n"]
    want = {}
    for p in ps:
        b = min(p * 7 // 1_000_000, 6)
        want[b] = want.get(b, 0) + 1
    assert got == want
    # the specific misallocations the old width formula produced:
    # 857142 -> floor(5.999994) = 5 (old: 6), 999996 -> 6 (old also 6
    # only via clamp), 142856 -> 0, 142858 -> 1
    assert want[5] == 1 and want[0] == 2 and want[1] == 1

    # bins=10 (the registered probe_calibration face) is unchanged:
    # both formulas agree when bins divides LP_MICRO
    s10 = spark.createDataFrame(
        [(899_999, 0), (900_000, 1), (1_000_000, 1)],
        "p_micro long, _y int")
    got10 = {r["bin"]: r["n"]
             for r in calibration_bin_stats(s10, bins=10).collect()}
    assert got10 == {8: 1, 9: 2}


def test_hybrid_candidate_lists_match_separate_routes(spark):
    """Optimization r12: hybrid_candidate_lists derives the BM25 and
    hashed-dot top-k lists from one exploded-token aggregate. Both
    lists must be row-identical to the separate bm25_topk /
    hashed_dot_topk routes, including the membership rule (a doc
    whose matching tokens cancel to dot 0 stays IN; a doc with no
    matching token stays OUT)."""
    from hops_spark.ops import retrieval as R

    # doc 5 constructs the edge the membership rule leans on: 'spark'
    # and 'green' both hash to bucket 15 at dim=16 with OPPOSITE signs
    # (hashed_sign_bucket: +1 / -1), so with 'spark' in the query both
    # tokens match (n_dot_match = 2) yet the signed contributions
    # cancel to dot == 0 — the doc must remain IN the dense list
    # (ADVICE r12 low #3: `dot == 0` is not `no match`)
    docs = _docs(spark, [
        (0, "spark shuffle join spark"),
        (1, "quick brown fox"),
        (2, "spark spark spark shuffle shuffle"),
        (3, "join the queue"),
        (4, "unrelated words only here"),
        (5, "spark green"),
    ])
    terms = ["spark", "shuffle", "join"]
    lex_f, dense_f = R.hybrid_candidate_lists(docs, terms, k=6, dim=16)
    lex_s = R.bm25_topk(docs, terms, k=6)
    dense_s = R.hashed_dot_topk(docs, terms, k=6, dim=16)
    assert [r.asDict() for r in lex_f.collect()] == \
           [r.asDict() for r in lex_s.collect()]
    dense_f_rows = [(r["doc_id"], r["dot"]) for r in dense_f.collect()]
    dense_s_rows = [(r["doc_id"], r["dot"]) for r in dense_s.collect()]
    assert dense_f_rows == dense_s_rows
    assert (5, 0) in dense_f_rows and (5, 0) in dense_s_rows
