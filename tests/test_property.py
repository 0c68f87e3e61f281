"""Property-based semantics tests (hypothesis): the operators with the
subtlest contracts, each checked against a pure-Python reference model
on arbitrary small inputs. The reference repo has no property testing
(SURVEY §5) — this is the extra hardening layer SURVEY §7.4 calls for
on exactly these operators (as-of lookup, override dup-keys, spec
parsers)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hops_spark.ops.join import asof_join, override_rows
from hops_spark.ops.project import field_select
from hops_spark.ops.sort import key_field_sort

SET = settings(max_examples=12, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture,
                                      HealthCheck.too_slow])

keys = st.integers(min_value=0, max_value=3)
ts = st.integers(min_value=0, max_value=50)


@SET
@given(left=st.lists(st.tuples(keys, ts), min_size=1, max_size=12),
       right=st.lists(st.tuples(keys, ts, st.integers(0, 99)),
                      min_size=0, max_size=12))
def test_asof_join_matches_bruteforce(spark, left, right):
    """asof(backward): each left row picks the latest right row with
    right_ts <= left_ts for the same key (ties: that max right_ts row).
    Python model = brute-force scan."""
    # unique (key, ts) on the right so the expected value is unambiguous
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())
    ldf = spark.createDataFrame([(k, t) for k, t in left], "k int, lts int")
    rdf = spark.createDataFrame(right or [(99, 99, 0)], "k int, rts int, rv int")
    if not right:
        rdf = rdf.filter("k < 0")  # empty right side
    got = asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts")
    got_rows = sorted((r.k, r.lts, r.rv) for r in got.collect())

    def model(k, lt):
        cand = [(t, v) for (rk, t, v) in right if rk == k and t <= lt]
        return max(cand)[1] if cand else None

    want = sorted((k, lt, model(k, lt)) for k, lt in left)
    assert got_rows == want


@SET
@given(data=st.lists(st.tuples(keys, st.integers(0, 9)), min_size=0, max_size=10),
       n_sources=st.integers(min_value=2, max_value=3))
def test_override_rows_rightmost_wins(spark, data, n_sources):
    """override(a,b,...): ALL rows of the rightmost source holding each
    key; earlier sources contribute only keys no later source has."""
    import random
    rng = random.Random(42)
    sources = [[] for _ in range(n_sources)]
    for row in data:
        sources[rng.randrange(n_sources)].append(row)
    dfs = [spark.createDataFrame(s or [(99, 0)], "k int, v int")
           for s in sources]
    dfs = [d if s else d.filter("k < 0") for d, s in zip(dfs, sources)]
    got = sorted((r.k, r.v) for r in override_rows("k", *dfs).collect())

    want = []
    all_keys = {k for s in sources for k, _ in s}
    for k in all_keys:
        winner = max(i for i, s in enumerate(sources) if any(rk == k for rk, _ in s))
        want.extend((k, v) for rk, v in sources[winner] if rk == k)
    assert got == sorted(want)


@SET
@given(rows=st.lists(st.tuples(st.integers(-9, 9), st.text("abc", max_size=2)),
                     min_size=0, max_size=10),
       reverse=st.booleans())
def test_key_field_sort_matches_python(spark, rows, reverse):
    """-k1[,1][nr] over (num, str) fields ≡ python sorted()."""
    df = spark.createDataFrame(rows or [(0, "")], "f1 int, f2 string")
    if not rows:
        df = df.filter("f1 > 99")
    spec = "-k1,1n" + ("r" in "r" and "r" if reverse else "")
    got = [(r.f1, r.f2) for r in key_field_sort(df, [spec, "-k2,2"]).collect()]
    want = sorted(rows, key=lambda r: ((-r[0] if reverse else r[0]), r[1]))
    # python can't mix per-key directions in one tuple; emulate:
    want = sorted(rows, key=lambda r: r[1])
    want = sorted(want, key=lambda r: r[0], reverse=reverse)
    assert got == want


@SET
@given(fields=st.lists(st.text("xyz", min_size=0, max_size=3),
                       min_size=1, max_size=8),
       lo=st.integers(0, 4), hi=st.integers(0, 7))
def test_field_select_matches_python_slices(spark, fields, lo, hi):
    """FieldSelection '<lo>-<hi>,0' key spec + '<lo>-' value spec ≡
    python list slicing (0-based, closed ranges, open tail)."""
    line = "\t".join(fields)
    df = spark.createDataFrame([(line,)], "line string")
    key_spec = f"{lo}-{hi},0"
    val_spec = f"{lo}-"
    out = field_select(df, "line", key_spec, val_spec).collect()[0]
    want_key = "\t".join(fields[lo:hi + 1] + [fields[0]])
    want_val = "\t".join(fields[lo:])
    assert (out.key, out.value) == (want_key, want_val)


def test_scrub_pii_redacts_crafted_rows(spark):
    from hops_spark.ops.text import pii_counts, scrub_pii

    rows = [
        (1, "mail me at a.b+c@example.co.uk today"),
        (2, "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.255"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in
           df.select("id", scrub_pii("text").alias("s"),
                     *pii_counts("text")).collect()}
    assert out[1]["s"] == "mail me at <EMAIL> today"
    assert out[1]["n_email"] == 1
    assert out[2]["s"] == "ssn <SSN> phone <PHONE> ip <IP>"
    assert (out[2]["n_ssn"], out[2]["n_phone"], out[2]["n_ipv4"]) == (1, 1, 1)
    assert out[3]["s"] == "nothing sensitive here"
    assert out[3]["n_email"] == 0


def test_contamination_flags_basic(spark):
    from hops_spark.ops.dedup import contamination_flags

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated text with different words entirely"),
         (3, "the quick brown cat jumps over the lazy dog")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_overlap"], r["contaminated"])
           for r in contamination_flags(corpus, bench, min_overlap=3).collect()}
    assert got[1] == (7, True)      # identical: all 7 3-gram shingles
    assert 2 not in got             # zero overlap -> not emitted
    assert got[3][0] > 0            # partial overlap counted


def test_contamination_bloom_equals_exact(spark):
    """The bloom-prefiltered variant is EXACT: bloom has no false
    negatives and the verification join removes every false positive,
    so its output equals contamination_flags for any mask size — even
    a pathologically tiny mask (m=64: near-every probe passes, the
    prefilter degrades to a no-op and the exact join does all the
    work)."""
    from hops_spark.ops.dedup import (contamination_flags,
                                      contamination_flags_bloom)

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated text with different words entirely"),
         (3, "the quick brown cat jumps over the lazy dog"),
         (4, "over the lazy dog and then some more filler words here")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "some more filler words for the second benchmark row")],
        "doc_id long, text string")

    def as_map(df):
        return {r["doc_id"]: (r["n_overlap"], r["contaminated"])
                for r in df.collect()}

    exact = as_map(contamination_flags(corpus, bench, min_overlap=2))
    for m in (64, 1 << 16):
        got = as_map(contamination_flags_bloom(corpus, bench,
                                               min_overlap=2, m=m, k=4))
        assert got == exact, f"bloom variant diverged at m={m}"


def test_contamination_spans_planted_passage(spark):
    """A verbatim benchmark passage planted inside a training doc must
    come back with EXACT token boundaries, and excise_spans must cut
    precisely it; clean docs and sub-threshold overlaps stay silent."""
    from hops_spark.ops.dedup import contamination_spans, excise_spans

    bench_passage = " ".join(f"b{i}" for i in range(20))   # 20 tokens
    corpus = spark.createDataFrame(
        [(1, "x0 x1 x2 " + bench_passage + " y0 y1"),      # planted at 3..22
         (2, "clean words only nothing shared at all here"),
         (3, "b0 b1 b2 z9 z8 z7 z6 z5 z4 z3 z2 z1")],      # 3-token overlap
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, bench_passage + " tail0 tail1")],
        "doc_id long, text string")

    spans = contamination_spans(corpus, bench, k=4, min_tokens=10)
    got = [(r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
           for r in spans.collect()]
    assert got == [(1, 3, 22, 20)]

    cut = {r["doc_id"]: r for r in
           excise_spans(corpus, spans, "doc_id", "text").collect()}
    assert cut[1]["clean_text"] == "x0 x1 x2 y0 y1"
    assert cut[1]["n_cut"] == 20
    assert cut[2]["n_cut"] == 0 and cut[3]["n_cut"] == 0


def test_hash_sample_deterministic_and_proportional(spark):
    from hops_spark.ops.sampling import hash_sample

    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    a = hash_sample(df, "k", 250_000, salt="s").count()
    b = hash_sample(df, "k", 250_000, salt="s").count()
    assert a == b                      # reproducible, not rand()
    assert abs(a / 20000 - 0.25) < 0.02
    # disjoint thresholds nest: sample(10%) is a subset of sample(25%)
    small = hash_sample(df, "k", 100_000, salt="s")
    assert small.join(hash_sample(df, "k", 250_000, salt="s"),
                      "k", "left_anti").count() == 0


def test_mixture_plan_hits_targets(spark):
    from hops_spark.ops.sampling import PPM, mixture_plan

    rows = [("a", 100), ("a", 100), ("b", 100), ("c", 600)]
    df = spark.createDataFrame(rows, "src string, w long")
    got = {r["stratum"]: r for r in
           mixture_plan(df, "src", "w", {"a": 500_000, "b": 500_000}).collect()}
    # a and b both target 50%; b is scarcer (10% of weight vs a's 20%),
    # so b saturates at 1e6 and a keeps half as much; c keeps nothing.
    assert got["b"]["keep_ppm"] == PPM
    assert abs(got["a"]["keep_ppm"] - PPM // 2) <= 1
    assert got["c"]["keep_ppm"] == 0
    # post-sample weights hit the 1:1 target ratio
    wa = got["a"]["weight"] * got["a"]["keep_ppm"]
    wb = got["b"]["weight"] * got["b"]["keep_ppm"]
    assert abs(wa - wb) <= max(wa, wb) * 0.01


def test_minhash_pairs_subset_of_exact_ngram(spark, sf_dir):
    """Both paths exact-verify Jaccard >= t, and LSH only REDUCES the
    candidate set — so minhash pairs must be a subset of the exact
    ground-truth join, with identical jaccard values on the overlap."""
    from hops_spark.io.readers import load_table
    from hops_spark.ops.dedup import minhash_dedup_pairs, ngram_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    mh = {(r["id_a"], r["id_b"]): r["jaccard"]
          for r in minhash_dedup_pairs(d).collect()}
    ex = {(r["id_a"], r["id_b"]): r["jaccard"]
          for r in ngram_jaccard_pairs(d).collect()}
    assert set(mh) <= set(ex)
    assert all(mh[k] == ex[k] for k in mh)
    assert mh, "fixture should contain near-duplicates"


def test_dedup_ops_tolerate_empty_and_tiny_input(spark):
    """Edge-of-domain robustness: empty corpus and single-word docs must
    produce empty (not crashing) results across the dedup family."""
    from hops_spark.ops.dedup import (minhash_dedup_pairs, ngram_jaccard_pairs,
                                      simhash_near_pairs, simhash_table)

    empty = spark.createDataFrame([], "doc_id long, text string")
    tiny = spark.createDataFrame([(1, "word"), (2, "")],
                                 "doc_id long, text string")
    for df in (empty, tiny):
        assert minhash_dedup_pairs(df).count() == 0
        assert ngram_jaccard_pairs(df).count() == 0
        assert simhash_near_pairs(df).count() == 0
    # single-word docs still get a simhash (unigram votes exist)
    assert simhash_table(tiny).count() == 1


def test_sampling_edge_fractions(spark):
    from hops_spark.ops.sampling import PPM, hash_sample

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    assert hash_sample(df, "k", 0).count() == 0
    assert hash_sample(df, "k", PPM).count() == 1000


def test_normalize_text_crafted(spark):
    from hops_spark.ops.text import normalize_text

    rows = [(1, "a\r\nb\rc"), (2, "x\t \ty"), (3, "p\n\n\n\n\nq"),
            (4, "  lead \n trail  "), (5, "ctl\x07char")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["n"] for r in
           df.select("id", normalize_text("text").alias("n")).collect()}
    assert got[1] == "a\nb\nc"
    assert got[2] == "x y"
    assert got[3] == "p\n\nq"
    assert got[4] == "lead\ntrail"
    assert got[5] == "ctlchar"


def test_repetition_stats_crafted(spark):
    from hops_spark.ops.text import repetition_stats

    rows = [(1, "same line\nsame line\nother"),
            (2, "a b a b a b")]  # bigrams: ab,ba,ab,ba,ab -> 5 total 2 distinct
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["n_lines"] == 3
    assert got[1]["dup_line_ppm"] == 333333          # 1 dup of 3
    assert got[2]["dup_bigram_ppm"] == 600000        # 3 dups of 5


def test_ivf_refine_deterministic_and_improves_fit(spark, sf_dir):
    from hops_spark.ops.similarity import (_cell_sims, ivf_centroids,
                                           ivf_kmeans_refine)
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
             .select("vec_id", "embedding")
    base = ivf_centroids(e, 8)
    r1 = ivf_kmeans_refine(e, base, iters=1)
    r2 = ivf_kmeans_refine(e, base, iters=1)
    assert r1 == r2  # deterministic

    def mean_best_sim(cents):
        best = F.array_max(_cell_sims(F.col("embedding"), cents)) \
                .getField("sim")
        return e.agg(F.avg(best)).collect()[0][0]

    # Lloyd step must not worsen the mean best-centroid similarity
    assert mean_best_sim(r1) >= mean_best_sim(base) - 1e-9


def test_chunk_documents_overlap_and_coverage(spark):
    from hops_spark.ops.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text), (2, "only three words"),
                                (3, "")], "doc_id long, text string")
    got = chunk_documents(df, chunk_tokens=32, overlap=8)
    rows = {(r["doc_id"], r["chunk_id"]): r["chunk_text"].split(" ")
            for r in got.collect()}
    # doc 1: 100 words, stride 24 -> ceil((100-8)/24)=4 chunks
    d1 = sorted(k[1] for k in rows if k[0] == 1)
    assert d1 == [0, 1, 2, 3]
    # consecutive chunks overlap by exactly 8 tokens
    assert rows[(1, 0)][-8:] == rows[(1, 1)][:8]
    assert rows[(1, 0)] == [f"w{i}" for i in range(32)]
    # every token is covered
    covered = set()
    for k, toks in rows.items():
        if k[0] == 1:
            covered.update(toks)
    assert covered == {f"w{i}" for i in range(100)}
    # short doc -> one partial chunk; empty doc -> no chunks
    assert rows[(2, 0)] == ["only", "three", "words"]
    assert not any(k[0] == 3 for k in rows)


# --- typedbytes wire protocol -------------------------------------------

_tb_scalar = st.one_of(
    st.booleans(),
    st.integers(min_value=-(1 << 62), max_value=(1 << 62)),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=6),
    st.binary(max_size=6),
)
_tb_value = st.recursive(
    _tb_scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.lists(children, max_size=4).map(tuple),
        st.dictionaries(st.text(max_size=4), children, max_size=3),
    ),
    max_leaves=12)


@SET
@given(values=st.lists(_tb_value, max_size=6))
def test_typedbytes_roundtrip_arbitrary_nested(values):
    """encode→decode is the identity over the whole value lattice
    (ints pick INT/LONG by range; tuples↔VECTOR, lists↔LIST,
    dicts↔MAP; no Spark needed — pure wire-protocol property)."""
    import io

    from hops_spark.io import typedbytes as tb
    buf = bytearray()
    for v in values:
        tb.encode(v, buf)
    f = io.BytesIO(bytes(buf))
    got = []
    while True:
        try:
            got.append(tb.decode(f))
        except StopIteration:
            break
    assert got == list(values)
    assert f.read() == b""          # no trailing bytes


@SET
@given(value=_tb_value)
def test_typedbytes_truncation_never_reports_clean_eof(value):
    """Every strict prefix of an encoded value must raise EOFError or
    ValueError from decode() — never StopIteration (clean EOF) and never
    a leaked RuntimeError from a nested generator. Containers truncated
    at an ELEMENT boundary are the regression case (a bare nested
    decode() leaks StopIteration through dict/genexp comprehensions)."""
    import io

    import pytest

    from hops_spark.io import typedbytes as tb
    full = tb.encode_bytes(value)
    for cut in range(1, len(full)):
        f = io.BytesIO(full[:cut])
        with pytest.raises((EOFError, ValueError)):
            tb.decode(f)


def test_typedbytes_pair_stream_dangling_key_is_eoferror():
    """decode_pairs: a stream ending after a key (no value) is a
    truncated record — EOFError, not clean EOF, not PEP-479 RuntimeError."""
    import io

    import pytest

    from hops_spark.io import typedbytes as tb
    buf = tb.encode_bytes("k1") + tb.encode_bytes(1) + tb.encode_bytes("dangling")
    with pytest.raises(EOFError):
        list(tb.decode_pairs(io.BytesIO(buf)))


def test_typedbytes_map_with_list_key_decodes_as_tuple():
    """LIST keys are legal typedbytes map keys on the wire; the decoder
    must surface them as (hashable) tuples instead of crashing."""
    import io

    from hops_spark.io import typedbytes as tb
    buf = bytearray()
    buf.append(tb.MAP)
    import struct as _s
    buf += _s.pack(">I", 1)
    tb.encode([1, 2], buf)          # list key -> LIST framing
    tb.encode("v", buf)
    got = tb.decode(io.BytesIO(bytes(buf)))
    assert got == {(1, 2): "v"}


_iv = st.tuples(st.integers(-60, 60), st.integers(0, 45))  # (start, span)


@SET
@given(left=st.lists(_iv, min_size=1, max_size=10),
       right=st.lists(_iv, min_size=1, max_size=10),
       w=st.integers(2, 12), lf=st.integers(2, 5))
def test_interval_two_tier_matches_bruteforce(spark, left, right, w, lf):
    """Two-tier interval overlap == exactly-once brute force for any
    bucket width / long-factor split point, including negative axes
    and spans straddling the long threshold."""
    from hops_spark.ops.join import interval_overlap_join_two_tier

    ldf = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(left)],
        "lid int, l_start long, l_end long")
    rdf = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(right)],
        "rid int, r_start long, r_end long")
    got = sorted((r.lid, r.rid) for r in interval_overlap_join_two_tier(
        ldf, rdf, w, long_factor=lf).collect())
    want = sorted(
        (i, j)
        for i, (ls, ld) in enumerate(left)
        for j, (rs, rd) in enumerate(right)
        if ls <= rs + rd and rs <= ls + ld)
    assert got == want
    assert len(got) == len(set(got))


@SET
@given(stats=st.lists(
    st.tuples(st.integers(1, 4_000_000),      # n_tokens
              st.integers(0, 20_000_000)),    # nll per token, micro-nats
    min_size=1, max_size=6, unique_by=lambda t: t))
def test_mixture_weights_model(spark, stats):
    """mixture_from_domain_stats == a pure-python replay of the
    linearized multiplicative-weights update + Hamilton apportionment,
    for arbitrary domain stats; weights always sum to exactly 1e6."""
    from hops_spark.ops.mixture import DRM_MILLI, mixture_from_domain_stats

    rows = [(f"s{i}", n, n * nll_tok)
            for i, (n, nll_tok) in enumerate(stats)]
    per = spark.createDataFrame(
        rows, "source string, n_tokens long, nll_sum long")
    got = {r["source"]: r for r in mixture_from_domain_stats(per).collect()}

    total = sum(n for _, n, _ in rows)
    ref = sum(s for _, _, s in rows) // total
    m = {}
    for src, n, sm in rows:
        nll_tok = sm // n
        excess = max(nll_tok - ref, 0)
        w0 = n * 1_000_000 // total
        sw = w0 * ((1_000_000 + excess) // DRM_MILLI)
        m[src] = (n, nll_tok, excess, w0, sw)
    t = sum(v[4] for v in m.values())
    base = {s: (1_000_000 * v[4]) // t for s, v in m.items()}
    rem = {s: (1_000_000 * v[4]) % t for s, v in m.items()}
    k = 1_000_000 - sum(base.values())
    order = sorted(m, key=lambda s: (-rem[s], s))
    want_w = {s: base[s] + (1 if order.index(s) < k else 0) for s in m}

    assert sum(r["weight_ppm"] for r in got.values()) == 1_000_000
    for s, (n, nll_tok, excess, w0, _) in m.items():
        r = got[s]
        assert (r["n_tokens"], r["nll_tok_micro"], r["excess_micro"],
                r["w0_ppm"], r["weight_ppm"]) \
            == (n, nll_tok, excess, w0, want_w[s])


@SET
@given(w=st.lists(st.integers(min_value=0, max_value=1_000_000),
                  min_size=2, max_size=6).filter(lambda v: sum(v) > 0),
       steps=st.integers(min_value=1, max_value=5))
def test_anneal_schedule_partition_law(spark, w, steps):
    """For ANY weight vector and step count: every step's weights sum
    to exactly 1e6 (Hamilton partition law), step 0 reproduces the
    input when it is already a 1e6 partition, and all weights are
    nonnegative."""
    from hops_spark.ops.mixture import anneal_schedule

    # normalize the random vector to an exact 1e6 partition first
    # (largest-remainder by index), so the step-0 identity is testable;
    # sum(w) > 0 by the strategy filter (leftover <= len(w) - 1 holds)
    tot = sum(w)
    base = [x * 1_000_000 // tot for x in w]
    rem = sorted(range(len(w)),
                 key=lambda i: (-(w[i] * 1_000_000 % tot), i))
    for i in rem[:1_000_000 - sum(base)]:
        base[i] += 1
    mix = spark.createDataFrame(
        [(f"s{i:02d}", b) for i, b in enumerate(base)],
        "source string, weight_ppm long")
    out = anneal_schedule(mix, steps=steps).collect()
    per = {}
    for r in out:
        per.setdefault(r["step"], {})[r["source"]] = r["weight_ppm"]
    assert set(per) == set(range(steps + 1))
    for s, m in per.items():
        assert sum(m.values()) == 1_000_000, s
        assert all(v >= 0 for v in m.values())
    assert per[0] == {f"s{i:02d}": b for i, b in enumerate(base)}
