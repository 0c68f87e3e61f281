"""Exact-substring duplicate spans (ops/dedup.suffix_dup_spans):
suffix-array-grade ExactSubstr dedup (Lee et al. 2022 §4.2), verified
against a brute-force quadratic reference and on planted duplicates."""

from __future__ import annotations

from hops_spark.ops.dedup import duplicate_spans, suffix_dup_spans


def _brute_spans(docs: dict[int, str], L: int, C: int):
    """Quadratic reference: dup_len(pos) = max token-LCP of the
    C-truncated suffix at pos against every OTHER eligible position's
    suffix; spans = per-doc union of [pos, pos+dup_len-1] where
    dup_len >= L."""
    toks = {d: [w for w in t.lower().split() if w] for d, t in docs.items()}
    sufs = [(d, p, tuple(toks[d][p:p + C]))
            for d in toks for p in range(max(len(toks[d]) - L + 1, 0))]

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    spans: dict[int, list[tuple[int, int]]] = {}
    for i, (d, p, k) in enumerate(sufs):
        best = max((lcp(k, k2) for j, (_, _, k2) in enumerate(sufs)
                    if j != i), default=0)
        if best >= L:
            spans.setdefault(d, []).append((p, p + best - 1))
    out = []
    for d, ivs in spans.items():
        ivs.sort()
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s <= cur_e + 1:
                cur_e = max(cur_e, e)
            else:
                out.append((d, cur_s, cur_e, cur_e - cur_s + 1))
                cur_s, cur_e = s, e
        out.append((d, cur_s, cur_e, cur_e - cur_s + 1))
    return sorted(out)


def _run(spark, docs, L, C):
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    return sorted(tuple(r) for r in
                  suffix_dup_spans(df, "doc_id", "text", L, C).collect())


def test_suffix_spans_match_bruteforce_planted(spark):
    """Mixed corpus: unique docs, an exact pair, a shared passage, and
    an overlapping-windows case — operator == quadratic reference."""
    passage = "the quick brown fox jumps over the lazy dog again"
    docs = {
        0: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        1: f"intro words here {passage} closing remark",
        2: f"{passage} and a different tail entirely follows here",
        3: "totally unique tokens qqq www eee rrr ttt yyy uuu",
        4: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    }
    got = _run(spark, docs, 5, 8)
    want = _brute_spans(docs, 5, 8)
    assert got == want and len(got) >= 3


def test_suffix_spans_match_bruteforce_random(spark):
    """Deterministic pseudo-random small-vocab corpus (heavy natural
    duplication, many boundary ties) — operator == reference."""
    import random
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(6)]
    docs = {d: " ".join(rng.choice(vocab) for _ in range(30))
            for d in range(20)}
    L, C = 4, 6
    assert _run(spark, docs, L, C) == _brute_spans(docs, L, C)


def test_interval_union_merges_what_stride_runs_split(spark):
    """The semantic difference vs duplicate_spans' k-gram stride-1
    runs: window starts at pos 0 and pos 2 are duplicated but pos 1 is
    not — the windows OVERLAP, so ExactSubstr union emits ONE span
    while the fingerprint-run path emits two."""
    L = 3
    docs = {
        0: "a b c d e x1 x2 x3 x4",
        1: "a b c y1 y2 y3 y4 y5",      # duplicates window [0..2] of doc 0
        2: "c d e z1 z2 z3 z4 z5",      # duplicates window [2..4] of doc 0
    }
    got = _run(spark, docs, L, L)
    doc0 = [g for g in got if g[0] == 0]
    assert doc0 == [(0, 0, 4, 5)]        # one merged span
    assert got == _brute_spans(docs, L, L)
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    runs = sorted(tuple(r) for r in
                  duplicate_spans(df, "doc_id", "text", L, 2).collect()
                  if r[0] == 0)
    assert runs == [(0, 0, 2, 3), (0, 2, 4, 3)]   # split by the run path


def test_prefix_cap_extends_to_maximal_match(spark):
    """With prefix_cap > min_tokens the span reflects the true match
    length up to the cap, not just the L-window union: a 7-token
    shared passage at L=3, C=7 yields the full 7-token span from a
    single position's LCP."""
    docs = {
        0: "p1 p2 p3 p4 p5 p6 p7 u1 u2",
        1: "v1 v2 p1 p2 p3 p4 p5 p6 p7",
    }
    got = _run(spark, docs, 3, 7)
    assert (0, 0, 6, 7) in got
    assert got == _brute_spans(docs, 3, 7)


def test_excise_spans_cuts_exactly_the_flagged_ranges(spark):
    """excise_spans removes precisely the span token ranges: planted
    shared passage -> both docs lose it; untouched docs pass through
    verbatim; a fully-duplicated doc excises to empty text."""
    from hops_spark.ops.dedup import excise_spans

    passage = "p1 p2 p3 p4 p5"
    docs = {
        0: f"head0 {passage} tail0a tail0b",
        1: f"{passage} t1 t2 t3 t4",
        2: "solo tokens only here never repeated",
        3: passage,                      # fully duplicated doc
        4: passage,
    }
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    spans = suffix_dup_spans(df, "doc_id", "text", 5, 5)
    got = {r["doc_id"]: (r["n_tokens"], r["n_cut"], r["clean_text"])
           for r in excise_spans(df, spans).collect()}
    assert got[0] == (8, 5, "head0 tail0a tail0b")
    assert got[1] == (9, 5, "t1 t2 t3 t4")
    assert got[2] == (6, 0, docs[2])
    assert got[3] == (5, 5, "")
    assert got[4] == (5, 5, "")
    assert len(got) == 5


def test_short_docs_and_no_duplicates(spark):
    """Docs shorter than min_tokens emit nothing; a corpus with no
    duplicated window emits no spans at all."""
    docs = {0: "a b", 1: "c d e f g h", 2: "i j k l m n o"}
    assert _run(spark, docs, 6, 6) == []


def test_contamination_exact_spans_planted(spark):
    """Cross-corpus exact-gram decontamination: a verbatim benchmark
    passage >= L tokens comes back with EXACT boundaries (interval
    union of its L-gram windows); a passage one token short of L is
    invisible; overlapping leaked windows merge into one span."""
    from hops_spark.ops.dedup import contamination_exact_spans

    bench_words = [f"b{i}" for i in range(30)]
    # doc 1: tokens 7..21 verbatim = bench positions 3..17 (15 >= 12)
    d1 = [f"x1{i}" for i in range(7)] + bench_words[3:18] \
        + [f"y1{i}" for i in range(5)]
    # doc 2: an 11-token leak (below L=12) -> no span
    d2 = [f"x2{i}" for i in range(4)] + bench_words[0:11] \
        + [f"y2{i}" for i in range(8)]
    # doc 3: a 19-token verbatim leak (bench 0..18 at positions 2..20)
    # -> its eight 12-gram windows (pos 2..9) interval-union into ONE
    # maximal span 2..20
    d3 = [f"x3{i}" for i in range(2)] + bench_words[0:19] \
        + [f"y3{i}" for i in range(3)]
    corpus = spark.createDataFrame(
        [(1, " ".join(d1)), (2, " ".join(d2)), (3, " ".join(d3))],
        "doc_id long, text string")
    bench = spark.createDataFrame([(100, " ".join(bench_words))],
                                  "doc_id long, text string")
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens)
           for r in contamination_exact_spans(corpus, bench,
                                              min_tokens=12).collect()}
    assert (1, 7, 21, 15) in got
    assert not any(r[0] == 2 for r in got)
    assert [r for r in got if r[0] == 3] == [(3, 2, 20, 19)]


def test_contamination_exact_spans_bloom_value_equal(spark, sf_dir):
    """The bloom-prefiltered exact-gram form is VALUE-EQUAL to the
    plain form (no false negatives by bloom construction; the semi
    join kills bloom false positives) — the contamination_flags_bloom
    law applied to the span variant."""
    from pyspark.sql import functions as F

    from hops_spark.io.readers import load_table
    from hops_spark.ops.dedup import contamination_exact_spans

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("source") != "src0")
    bench = d.filter(F.col("source") == "src0")
    plain = sorted(tuple(r) for r in contamination_exact_spans(
        corpus, bench, min_tokens=12).collect())
    bloomed = sorted(tuple(r) for r in contamination_exact_spans(
        corpus, bench, min_tokens=12, bloom_m=1 << 14).collect())
    assert plain == bloomed
