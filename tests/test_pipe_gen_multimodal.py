"""Pipe bridge (Hadoop Streaming parity), generators, multimodal
plumbing, maintenance jobs."""

from __future__ import annotations

from pyspark.sql import functions as F

from hops_spark.io.multimodal import extract_features, frame_sample, synthetic_media
from hops_spark.maintenance import rs_encode, xor_parity
from hops_spark.ops.gen import random_text_writer, random_writer, teragen
from hops_spark.ops.pipe import aggregate_reducer, pipe_df


def test_pipe_wordcount_via_shell(spark):
    """The canonical streaming job: external `tr|grep` as the mapper."""
    df = spark.createDataFrame([("a b", ), ("b c b", )], "text string") \
              .coalesce(1)
    out = pipe_df(df, "tr ' ' '\\n' | grep -v '^$'")
    counts = (out.groupBy("line").count().orderBy("line").collect())
    assert [(r.line, r["count"]) for r in counts] == [("a", 1), ("b", 3), ("c", 1)]


def test_pipe_multi_column_output(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string").coalesce(1)
    out = pipe_df(df, "awk -F'\\t' '{print $2\"\\t\"$1}'", out_cols=["v", "k"])
    assert {(r.v, r.k) for r in out.collect()} == {("x", "1"), ("y", "2")}


def test_aggregate_reducer_shorthand(spark):
    lines = spark.createDataFrame(
        [("LongValueSum:a\t2",), ("LongValueSum:a\t3",), ("LongValueSum:b\t1",),
         ("StringValueMax:s\tzz",), ("StringValueMax:s\taa",)], "line string")
    got = {(r.agg_type, r.id, r.out) for r in aggregate_reducer(lines).collect()}
    assert got == {("LongValueSum", "a", "5"), ("LongValueSum", "b", "1"),
                   ("StringValueMax", "s", "zz")}


def test_generators_deterministic(spark):
    a = teragen(spark, 100, seed=1).collect()
    b = teragen(spark, 100, seed=1, n_partitions=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    rw = random_writer(spark, 50).collect()
    assert all(10 <= len(r.value) <= 100 for r in rw)
    rt = random_text_writer(spark, 10, words_per_row=5).collect()
    assert all(len(r.text.split()) == 5 for r in rt)


def test_multimodal_features(spark):
    media = synthetic_media(spark, 24)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 24
    assert all(len(r.features) == 8 for r in rows)
    assert "payload" not in feats.columns
    # deterministic: same payload → same features
    again = {r.media_id: r.features for r in extract_features(media).collect()}
    assert all(again[r.media_id] == r.features for r in rows)


def test_frame_sample(spark):
    media = synthetic_media(spark, 12)
    frames = frame_sample(media, every_ms=300)
    vids = media.filter(F.col("kind") == "video").collect()
    got = frames.groupBy("media_id").count().collect()
    expect = {v.media_id: max(1, (max(v.duration_ms - 1, 0) // 300) + 1) for v in vids}
    assert {r.media_id: r["count"] for r in got} == expect


def test_xor_and_rs_parity(spark):
    import numpy as np
    blocks = [(s, i, bytes(np.frombuffer(bytes([s * 16 + i]) * 64, dtype=np.uint8)))
              for s in range(3) for i in range(4)]
    df = spark.createDataFrame(blocks, "stripe long, block_idx int, data binary")

    xp = {r.stripe: np.frombuffer(bytes(r.parity), dtype=np.uint8)
          for r in xor_parity(df).collect()}
    for s in range(3):
        exp = np.zeros(64, dtype=np.uint8)
        for i in range(4):
            exp ^= np.frombuffer(bytes([s * 16 + i]) * 64, dtype=np.uint8)
        assert (xp[s] == exp).all()

    rs = rs_encode(df, n_parity=2)
    assert rs.count() == 6  # 3 stripes × 2 parity
    # parity blocks differ from data and from each other (non-degenerate)
    got = {(r.stripe, r.parity_idx): bytes(r.parity) for r in rs.collect()}
    assert got[(0, 0)] != got[(0, 1)]


def test_rs_lose_and_reconstruct(spark):
    """Full repair round-trip: encode stripes, delete a data block,
    rebuild it from survivors + parity, byte-compare to the original."""
    import numpy as np

    from hops_spark.maintenance import rs_encode, rs_reconstruct

    rng = np.random.RandomState(7)
    blocks = [(s, i, rng.randint(0, 256, 64, dtype=np.uint8).tobytes())
              for s in range(3) for i in range(4)]
    df = spark.createDataFrame(blocks, "stripe long, block_idx int, data binary")
    parities = rs_encode(df, n_parity=2)

    LOST = 2
    survivors = df.filter("block_idx != 2")
    rebuilt = {r.stripe: bytes(r.data)
               for r in rs_reconstruct(survivors, parities, LOST).collect()}
    want = {s: d for (s, i, d) in blocks if i == LOST}
    assert rebuilt == want


def test_rs_lose_two_and_reconstruct(spark):
    """Double-erasure repair: encode with 2 parity rows, delete TWO data
    blocks, solve the 2x2 GF system, byte-compare both to the original
    — the full strength of the RS(n, 2) code."""
    import numpy as np
    import pytest as _pytest

    from hops_spark.maintenance import rs_encode, rs_reconstruct2

    rng = np.random.RandomState(11)
    blocks = [(s, i, rng.randint(0, 256, 64, dtype=np.uint8).tobytes())
              for s in range(3) for i in range(5)]
    df = spark.createDataFrame(blocks, "stripe long, block_idx int, data binary")
    parities = rs_encode(df, n_parity=2)

    A, B = 1, 3
    survivors = df.filter(f"block_idx NOT IN ({A}, {B})")
    got = {(r.stripe, r.block_idx): bytes(r.data)
           for r in rs_reconstruct2(survivors, parities, A, B).collect()}
    want = {(s, i): d for (s, i, d) in blocks if i in (A, B)}
    assert got == want

    with _pytest.raises(ValueError):
        rs_reconstruct2(survivors, parities, A, A)


def test_pipe_binary_cpp_worker(spark, tmp_path):
    """Hadoop Pipes parity: a compiled C++ worker speaking the framed
    binary kv protocol — uppercases values, passes keys through
    (binary-safe: embedded NUL and 0xFF bytes survive)."""
    import shutil
    import subprocess

    import pytest

    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("no C++ toolchain")

    src = tmp_path / "worker.cpp"
    src.write_text(r'''
#include <cstdio>
#include <cstdint>
#include <vector>
static bool rd(std::vector<unsigned char>& b) {
    unsigned char h[4];
    if (fread(h, 1, 4, stdin) != 4) return false;
    uint32_t n = (h[0]<<24)|(h[1]<<16)|(h[2]<<8)|h[3];
    b.resize(n);
    if (n && fread(b.data(), 1, n, stdin) != n) return false;
    return true;
}
static void wr(const std::vector<unsigned char>& b) {
    uint32_t n = b.size();
    unsigned char h[4] = {(unsigned char)(n>>24),(unsigned char)(n>>16),
                          (unsigned char)(n>>8),(unsigned char)n};
    fwrite(h, 1, 4, stdout);
    if (n) fwrite(b.data(), 1, n, stdout);
}
int main() {
    std::vector<unsigned char> k, v;
    while (rd(k) && rd(v)) {
        for (auto& c : v) if (c >= 'a' && c <= 'z') c -= 32;
        wr(k); wr(v);
    }
    return 0;
}
''')
    binpath = str(tmp_path / "worker")
    subprocess.run([gxx, "-O2", "-o", binpath, str(src)], check=True)

    from hops_spark.ops.pipe import pipe_binary

    rows = [(b"k1", b"hello\x00world"), (b"k2", b"\xffabc\xff"), (b"", b"")]
    df = spark.createDataFrame(rows, "key binary, value binary")
    got = {bytes(r["key"]): bytes(r["value"])
           for r in pipe_binary(df, [binpath]).collect()}
    assert got == {b"k1": b"HELLO\x00WORLD", b"k2": b"\xffABC\xff", b"": b""}


def test_sentences_udtf_matches_fast_path(spark, sf_dir):
    """Python UDTF (§2.9 table-function API) returns exactly the
    codegen fast path's rows — the UDTF is API parity, not the hot
    path."""
    from pyspark.sql import functions as F

    from hops_spark.io.readers import load_table
    from hops_spark.ops.pipe import sentence_rows, sentences_udtf

    d = load_table(spark, sf_dir, "documents").limit(50) \
        .select("doc_id", F.regexp_replace(
            "text", r"\s+table\s+", ". ").alias("text"))
    fast = sentence_rows(d).collect()
    S = sentences_udtf()
    slow = (d.lateralJoin(S(F.col("text").outer()))
             .select("doc_id", "sentence_id", "sentence").collect())
    assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))


# --- real codecs (io/codecs.py) ----------------------------------------

def test_ppm_roundtrip_and_comment_header():
    from hops_spark.io import codecs
    px = bytes(range(36))                       # 4x3 RGB
    p = codecs.ppm_encode(4, 3, px)
    assert codecs.ppm_decode(p) == (4, 3, 255, px)
    # comment lines in the header are legal PPM
    commented = b"P6\n# made by a test\n4 3\n255\n" + px
    assert codecs.ppm_decode(commented) == (4, 3, 255, px)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        codecs.ppm_decode(b"P6\n4 3\n255\n" + px[:-1])   # truncated raster
    with _pytest.raises(ValueError):
        codecs.ppm_decode(b"JFIF....")


def test_ppm_resize_nn_exact_floor_mapping():
    from hops_spark.io import codecs
    # 4x2 image whose pixel (x,y) is (10x+y, 0, 0)
    px = bytes(b for y in range(2) for x in range(4)
               for b in (10 * x + y, 0, 0))
    out = codecs.ppm_resize_nn(codecs.ppm_encode(4, 2, px), 2, 1)
    w, h, _, rs = codecs.ppm_decode(out)
    assert (w, h) == (2, 1)
    # out (0,0) <- src (0,0); out (1,0) <- src (1*4//2, 0) = (2,0)
    assert rs == bytes((0, 0, 0, 20, 0, 0))


def test_bmp_decode_undoes_bottom_up_bgr_and_padding():
    import struct

    from hops_spark.io import codecs
    # hand-build a 2x2 24-bit BMP: rows bottom-up, BGR, stride padded to 8
    top = [(255, 0, 0), (0, 255, 0)]        # red, green
    bot = [(0, 0, 255), (7, 8, 9)]          # blue, misc
    rows = b""
    for r in (bot, top):                    # bottom-up storage
        line = b"".join(bytes((b, g, rr)) for (rr, g, b) in r)
        rows += line + b"\x00\x00"          # pad 6 -> 8
    header = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                            len(rows), 2835, 2835, 0, 0))
    w, h, px = codecs.bmp_decode(header + rows)
    assert (w, h) == (2, 2)
    assert px == b"".join(bytes(p) for p in top + bot)
    # the shared feature adapter handles BMP too
    f = codecs.image_features(header + rows, "image")
    assert f[:2] == [2.0, 2.0] and f[2:5] == [255.0, 0.0, 0.0]


def test_wav_roundtrip_and_audio_features():
    import struct

    from hops_spark.io import codecs
    samples = [0, 1000, -1000, 32767, -32768, 5]
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    payload = codecs.wav_encode(pcm, n_channels=1, sample_width=2,
                                framerate=8000)
    meta = codecs.wav_decode(payload)
    assert meta["n_frames"] == len(samples)
    assert meta["pcm"] == pcm
    f = codecs.audio_features(payload, "audio")
    assert f == [1.0, 8000.0, 6.0, 0.0,
                 float(sum(abs(s) for s in samples))]


def test_real_decoder_through_arrow_stage(spark):
    """extract_features with the REAL decoder (not the stub) over the
    synthetic PPM table: width/height parsed from the actual header."""
    from hops_spark.io.codecs import image_features
    from hops_spark.io.multimodal import extract_features, synthetic_ppm_media
    media = synthetic_ppm_media(spark, n=10, seed=7)
    rows = {r["media_id"]: r["features"]
            for r in extract_features(media, decoder=image_features).collect()}
    for mid, f in rows.items():
        assert f[0] == 4 + mid % 5 and f[1] == 3 + mid % 7


# --- typedbytes framing (io/typedbytes.py) -----------------------------

def test_typedbytes_roundtrip_all_ten_types():
    import io

    from hops_spark.io import typedbytes as tb
    values = [
        b"\x00\xffraw",                      # 0 BYTES
        tb.TBByte(-7),                       # 1 BYTE
        True, False,                         # 2 BOOL
        123456,                              # 3 INT
        -(1 << 40),                          # 4 LONG
        tb.TBFloat(0.5),                     # 5 FLOAT (exact in f32)
        3.14159,                             # 6 DOUBLE
        "héllo wörld",                       # 7 STRING (multi-byte UTF-8)
        ("vec", 1, 2.0),                     # 8 VECTOR
        ["list", [True, (None if False else 9)], {"k": 1}],  # 9 nested LIST
        {"a": [1, 2], "b": ("x", b"y")},     # 10 MAP w/ nested values
    ]
    buf = bytearray()
    for v in values:
        tb.encode(v, buf)
    # spot-check wire bytes: type codes in order
    assert buf[0] == tb.BYTES and buf[5 + 5] == tb.BYTE
    f = io.BytesIO(bytes(buf))
    got = []
    while True:
        try:
            got.append(tb.decode(f))
        except StopIteration:
            break
    expect = [b"\x00\xffraw", -7, True, False, 123456, -(1 << 40), 0.5,
              3.14159, "héllo wörld", ("vec", 1, 2.0),
              ["list", [True, 9], {"k": 1}],
              {"a": [1, 2], "b": ("x", b"y")}]
    assert got == expect


def test_typedbytes_malformed_streams():
    import io

    import pytest as _pytest

    from hops_spark.io import typedbytes as tb
    with _pytest.raises(EOFError):
        tb.decode(io.BytesIO(bytes([tb.INT, 0, 0])))        # truncated i32
    with _pytest.raises(ValueError):
        tb.decode(io.BytesIO(bytes([tb.MARKER])))           # stray marker
    with _pytest.raises(ValueError):
        tb.decode(io.BytesIO(bytes([42])))                  # unknown code


def test_pipe_typedbytes_worker_runs_unmodified(spark, tmp_path):
    """A typedbytes-speaking streaming job (reads tb pairs on stdin,
    writes tb pairs on stdout) runs against the bridge as-is — the
    TypedBytesInput.java contract."""
    import sys
    import textwrap

    from hops_spark.ops.pipe import pipe_typedbytes

    import hops_spark.io.typedbytes as _tbmod

    # load the codec module FILE directly — the worker is a plain
    # executable that must not drag pyspark (package __init__) into
    # every forked child
    worker = tmp_path / "tb_worker.py"
    worker.write_text(textwrap.dedent("""\
        import importlib.util
        import sys
        spec = importlib.util.spec_from_file_location("tb", %r)
        tb = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(tb)
        out = sys.stdout.buffer
        for k, v in tb.decode_pairs(sys.stdin.buffer):
            buf = bytearray()
            tb.encode(k.upper(), buf)
            tb.encode({"n": v + 1, "tag": [k, True]}, buf)
            out.write(bytes(buf))
        out.flush()
        """) % _tbmod.__file__)

    df = spark.createDataFrame(
        [("alpha", 1), ("beta", 41)], "key string, value int") \
        .repartition(2)
    got = {r["key"]: (r["n"], r["tag"])
           for r in pipe_typedbytes(
               df, [sys.executable, str(worker)],
               out_schema="key string, "
                          "value struct<n: int, tag: array<string>>")
           .select("key", "value.n", "value.tag").collect()}
    assert got == {"ALPHA": (2, ["alpha", "true"]),
                   "BETA": (42, ["beta", "true"])}


def test_bmp_decode_top_down_negative_height():
    import struct

    from hops_spark.io import codecs
    # height = -2 means rows are stored TOP-DOWN (no flip)
    top = [(1, 2, 3), (4, 5, 6)]
    bot = [(7, 8, 9), (10, 11, 12)]
    rows = b""
    for r in (top, bot):                    # stored in display order
        line = b"".join(bytes((b, g, rr)) for (rr, g, b) in r)
        rows += line + b"\x00\x00"
    header = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0,
                            len(rows), 2835, 2835, 0, 0))
    w, h, px = codecs.bmp_decode(header + rows)
    assert (w, h) == (2, 2)
    assert px == b"".join(bytes(p) for p in top + bot)


def test_quantize_int8_zero_vector_and_bounds(spark):
    from pyspark.sql import functions as F

    from hops_spark.ops.similarity import quantize_int8
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, -1.0]), (2, [0.5, -0.25])],
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: (r["scale"], list(r["q"]))
           for r in quantize_int8(df).collect()}
    assert got[0] == (0.0, [0, 0])
    assert got[1] == (1.0, [127, -127])
    # 0.5*127/0.5 = 127; -0.25*127/0.5 = -63.5 -> floor -64
    assert got[2] == (0.5, [127, -64])
    # q always within int8 range
    q = quantize_int8(df)
    bad = q.select(F.explode("q").alias("x")) \
           .where((F.col("x") > 127) | (F.col("x") < -128)).count()
    assert bad == 0


def test_pipe_typedbytes_none_value_fails_loudly(spark):
    """ADVICE r4: a feeder-thread encode failure (None has no typedbytes
    code) must fail the JOB — not close stdin as clean EOF and return
    silently truncated output."""
    import sys

    import pytest

    from hops_spark.ops.pipe import pipe_typedbytes

    df = spark.createDataFrame([("a", 1), (None, 2)], "key string, value int") \
              .coalesce(1)
    cat = [sys.executable, "-c",
           "import sys, shutil; shutil.copyfileobj(sys.stdin.buffer, sys.stdout.buffer)"]
    with pytest.raises(Exception, match="null type code|ValueError"):
        pipe_typedbytes(df, cat, out_schema="key string, value int").collect()


def test_codecs_malformed_payloads_raise_valueerror_only():
    """Module contract (ADVICE r4): malformed payloads raise ValueError
    — never struct.error / wave.Error / EOFError — so quarantine routing
    keyed on ValueError holds for every codec."""
    import pytest

    from hops_spark.io import codecs

    for fn, payloads in [
        (codecs.bmp_decode, [b"BM", b"BM" + b"\x00" * 20, b"nope"]),
        (codecs.ppm_decode, [b"P6 junk", b"P6\n2 2\n255\nxx", b"BM"]),
        (codecs.wav_decode, [b"RIFF", b"RIFF\x00\x00\x00\x00WAVE", b"x"]),
    ]:
        for p in payloads:
            with pytest.raises(ValueError):
                fn(p)


def test_src_local_repair_reads_only_the_local_group(spark):
    """SimpleRegeneratingCode contract: a single lost block rebuilds
    byte-exactly from its LOCAL group alone — proven by deleting every
    other group's blocks before the repair; and the RS globals still
    cover multi-loss on the same encode."""
    import hashlib

    from hops_spark.maintenance import (rs_reconstruct, src_encode,
                                        src_repair_local)

    blk = 256
    # deterministic payloads (RNG-free like the rest of the repo)
    rows = [(s, i, hashlib.md5(f"{s}|{i}".encode()).digest() * (blk // 16))
            for s in range(2) for i in range(10)]
    blocks = spark.createDataFrame(
        rows, "stripe long, block_idx int, data binary")
    local, gl = src_encode(blocks, group_size=5, n_global_parity=2)
    assert local.count() == 4            # 2 stripes x 2 local groups

    lost = 7                             # group 1 (blocks 5..9)
    want = {s: d for s, i, d in rows if i == lost}

    # locality: drop group 0 entirely — repair must still succeed
    only_g1 = blocks.filter("block_idx >= 5")
    got = {r["stripe"]: bytes(r["data"])
           for r in src_repair_local(only_g1, local, lost,
                                     group_size=5).collect()}
    assert got == want

    # the same encode still supports global RS repair (fallback path)
    got_rs = {r["stripe"]: bytes(r["data"])
              for r in rs_reconstruct(blocks, gl, lost).collect()}
    assert got_rs == want


def test_batched_coding_kernels_byte_equal_grouped(spark):
    """The many-tiny-stripes kernels (mapInPandas whole-partition fold)
    are byte-equal to the per-group applyInPandas kernels for both XOR
    and RS — including ragged stripes (last stripe short) and multiple
    partitions."""
    from pyspark.sql import functions as F

    from hops_spark.maintenance import rs_encode, xor_parity

    blocks = (spark.range(0, 1003, 1, 7)
              .select(F.expr("id div 4").alias("stripe"),
                      F.pmod("id", F.lit(4)).cast("int").alias("block_idx"),
                      F.unhex(F.substring(F.md5(F.col("id").cast("string")),
                                          1, 16)).alias("data")))
    xa = {r["stripe"]: bytes(r["parity"])
          for r in xor_parity(blocks).collect()}
    xb = {r["stripe"]: bytes(r["parity"])
          for r in xor_parity(blocks, batched=True).collect()}
    assert xa == xb
    ra = {(r["stripe"], r["parity_idx"]): bytes(r["parity"])
          for r in rs_encode(blocks, n_parity=3).collect()}
    rb = {(r["stripe"], r["parity_idx"]): bytes(r["parity"])
          for r in rs_encode(blocks, n_parity=3, batched=True).collect()}
    assert ra == rb


def test_batched_src_repair_byte_equal_grouped(spark):
    """The batched SRC paths (src_encode/src_repair_local delegating to
    the batched XOR kernel) are byte-equal to the grouped originals."""
    from pyspark.sql import functions as F

    from hops_spark.maintenance import src_encode, src_repair_local

    blocks = (spark.range(0, 403, 1, 5)
              .select(F.expr("id div 8").alias("stripe"),
                      F.pmod("id", F.lit(8)).cast("int").alias("block_idx"),
                      F.unhex(F.substring(F.md5(F.col("id").cast("string")),
                                          1, 16)).alias("data")))
    la, _ = src_encode(blocks, group_size=4, n_global_parity=1)
    lb, _ = src_encode(blocks, group_size=4, n_global_parity=1,
                       batched=True)
    ka = {(r["stripe"], r["local_group"]): bytes(r["parity"])
          for r in la.collect()}
    kb = {(r["stripe"], r["local_group"]): bytes(r["parity"])
          for r in lb.collect()}
    assert ka == kb
    ra = {r["stripe"]: bytes(r["data"])
          for r in src_repair_local(blocks, la, 2, group_size=4).collect()}
    rb = {r["stripe"]: bytes(r["data"])
          for r in src_repair_local(blocks, lb, 2, group_size=4,
                                    batched=True).collect()}
    assert ra == rb


def test_image_dhash_planted_recall_and_separation(spark):
    """Every planted intra-group pair must be found (hamming <= 8);
    nothing cross-group sneaks in on this construction; the UDF hash
    equals the pure-Python reference bit-for-bit."""
    import hashlib

    from pyspark.sql import functions as F

    from hops_spark.io.codecs import image_dhash, ppm_decode
    from hops_spark.io.multimodal import (extract_features,
                                          synthetic_ppm_neardups)

    n_groups, copies = 8, 3
    media = synthetic_ppm_neardups(spark, n_groups, copies, seed=7)
    rows = media.collect()
    # reference hashes from raw payloads
    ref = {r["media_id"]: image_dhash(bytes(r["payload"]), "image")
           for r in rows}
    feats = {r["media_id"]: r["features"] for r in
             extract_features(media, decoder=image_dhash).collect()}
    assert feats == ref
    def ham(a, b):
        return (bin(int(a[0]) ^ int(b[0])).count("1")
                + bin(int(a[1]) ^ int(b[1])).count("1"))
    for g in range(n_groups):
        ids = [g * copies + j for j in range(copies)]
        for i in range(copies):
            for k in range(i + 1, copies):
                assert ham(ref[ids[i]], ref[ids[k]]) <= 8, (g, i, k)
    # decode sanity: payloads are real P6 the parser accepts
    w, h, mx, px = ppm_decode(bytes(rows[0]["payload"]))
    assert mx == 255 and len(px) == 3 * w * h


def test_audio_energy_hash_planted_recall(spark):
    """All planted WAV near-dup pairs within hamming 8; UDF hash equals
    the pure-Python reference; payloads decode as real RIFF/WAVE."""
    from hops_spark.io.codecs import audio_energy_hash, wav_decode
    from hops_spark.io.multimodal import (extract_features,
                                          synthetic_wav_neardups)

    n_groups, copies = 6, 3
    media = synthetic_wav_neardups(spark, n_groups, copies, seed=9)
    rows = media.collect()
    ref = {r["media_id"]: audio_energy_hash(bytes(r["payload"]), "audio")
           for r in rows}
    feats = {r["media_id"]: r["features"] for r in
             extract_features(media, decoder=audio_energy_hash).collect()}
    assert feats == ref

    def ham(a, b):
        return (bin(int(a[0]) ^ int(b[0])).count("1")
                + bin(int(a[1]) ^ int(b[1])).count("1"))
    import itertools
    for g in range(n_groups):
        for i, k in itertools.combinations(range(copies), 2):
            assert ham(ref[g * copies + i], ref[g * copies + k]) <= 8
    meta = wav_decode(bytes(rows[0]["payload"]))
    assert meta["framerate"] == 16000 and meta["n_frames"] == 264


def test_video_frame_dhash_parser_and_planted_overlap(spark):
    """The sequential P6-stream parser recovers every frame; per-frame
    bits equal image_dhash on the extracted frame; planted copies share
    >= 6 of 8 frames and distinct groups share none."""
    import itertools

    from hops_spark.io.codecs import (image_dhash, ppm_decode,
                                      video_frame_dhashes)
    from hops_spark.io.multimodal import synthetic_video_neardups

    rows = synthetic_video_neardups(spark, 4, 3, seed=13).collect()
    H = {}
    for r in rows:
        payload = bytes(r["payload"])
        fs = video_frame_dhashes(payload, "video")
        assert len(fs) == 16
        # frame 0 extracted by hand must hash identically via image_dhash
        w, h, mx, px = ppm_decode(payload)
        stride = len(f"P6\n{w} {h}\n{mx}\n".encode()) + 3 * w * h
        assert image_dhash(payload[:stride], "image") == fs[:2]
        H[r["media_id"]] = [(int(fs[2 * i]), int(fs[2 * i + 1]))
                            for i in range(8)]
    for g in range(4):
        for i, k in itertools.combinations(range(3), 2):
            a, b = H[g * 3 + i], H[g * 3 + k]
            assert sum(x == y for x, y in zip(a, b)) >= 6
    assert not any(H[0][f] == H[9][f2] for f in range(8) for f2 in range(8))


def test_audio_energy_hash_drops_trailing_partial_window():
    """Clips whose sample count is not a multiple of 4 must hash over
    FULL windows only (the oracle's HAVING count(*) = 4 guard mirrors
    this) — a 10-sample clip hashes identically to its 8-sample
    truncation."""
    from hops_spark.io.codecs import audio_energy_hash, wav_encode
    import struct

    samples = [100, -200, 300, -50, 7, 7, 7, 7, 999, -999]   # 10 samples
    pcm10 = struct.pack("<10h", *samples)
    pcm8 = struct.pack("<8h", *samples[:8])
    assert audio_energy_hash(wav_encode(pcm10, 1, 2, 16000), "audio") == \
        audio_energy_hash(wav_encode(pcm8, 1, 2, 16000), "audio")
