"""Multimodal (image/audio/video) column handling — north-star extension.

Pattern (mirrors the reference's inline small-file storage,
INodeFile.storeFileDataInDB, INodeFile.java:204: payload bytes live IN
the table): media are opaque `binary` columns + a typed metadata
struct. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema, batching, partition
sizing) is real. Codecs: io/codecs.py ships REAL stdlib decoders
(binary-P6 PPM, 24-bit BMP, PCM WAV + nearest-neighbor resize) used
by the media_decode_ppm/media_resize_nn oracle queries; formats whose
libraries aren't in this container (JPEG/MP3/...) stay behind the
``set_decoder`` plug with a deterministic fake as the default, so
those pipelines remain testable end-to-end.

Scale notes: binary payloads inflate row size — keep
`spark.sql.files.maxPartitionBytes` moderate and NEVER collect; the
decode stage is per-partition streaming (constant memory per batch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = md5-stream bytes)."""
    rows = spark.range(n)
    payload = F.unhex(F.repeat(F.md5(F.concat_ws("|", F.lit(str(seed)),
                                                 F.col("id").cast("string"))), 8))
    return rows.select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.lit(64).alias("width"), F.lit(64).alias("height"),
        (F.col("id") * 100).alias("duration_ms"))


def synthetic_ppm_media(spark: SparkSession, n: int = 64,
                        seed: int = 42) -> DataFrame:
    """Deterministic table of REAL binary-P6 PPM images: width 4..8,
    height 3..9, pixel raster = the row's md5 digest bytes repeated.
    Both sides of the oracle can recompute every pixel byte from
    (seed, media_id) relationally, while the payload itself is a
    well-formed image a real parser must decode (header tokens,
    raster offsets)."""
    rows = spark.range(n)
    return (rows
            .withColumn("w", (F.lit(4) + F.pmod("id", F.lit(5))).cast("int"))
            .withColumn("h", (F.lit(3) + F.pmod("id", F.lit(7))).cast("int"))
            .withColumn("hx", F.md5(F.concat_ws(
                "|", F.lit("ppm"), F.lit(str(seed)),
                F.col("id").cast("string"))))
            # 14 × 16-byte digests = 224 bytes ≥ max raster 3*8*9 = 216
            .withColumn("pix_all", F.unhex(F.repeat("hx", 14)))
            .select(
                F.col("id").alias("media_id"),
                F.lit("image").alias("kind"),
                F.lit("image/x-portable-pixmap").alias("mime"),
                F.concat(
                    F.concat_ws("", F.lit("P6\n"), F.col("w").cast("string"),
                                F.lit(" "), F.col("h").cast("string"),
                                F.lit("\n255\n")).cast("binary"),
                    F.expr("substring(pix_all, 1, 3 * w * h)"),
                ).alias("payload")))


# --- decoder plug point ------------------------------------------------------

def _fake_decode(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 pseudo-features from
    the digest of the payload's hex representation (hex, not raw bytes,
    so a SQL oracle can recompute it: md5(lower(hex(payload))) —
    DuckDB's md5 only accepts VARCHAR). Replace via set_decoder() when
    PIL/librosa/etc. are available."""
    if payload is None:
        return [0.0] * 8
    h = hashlib.md5(payload.hex().encode()).digest()
    return [b / 255.0 for b in h[:8]]


_DECODER: Callable[[bytes, str], list[float]] = _fake_decode


def set_decoder(fn: Callable[[bytes, str], list[float]]) -> None:
    """Install a real decoder (e.g. PIL-based image feature extractor).
    Raise NotImplementedError inside it for unsupported kinds."""
    global _DECODER
    _DECODER = fn


FEATURES_FIELD = "features array<double>"


def extract_features(df: DataFrame, batch_cols: list[str] | None = None,
                     decoder: Callable[[bytes, str], list[float]] | None = None,
                     ) -> DataFrame:
    """Decode/featurize media rows via mapInPandas (Arrow batches).
    Output: input columns (minus payload) + `features` array<double>.
    ``decoder`` overrides the installed global (io/codecs.py ships real
    stdlib PPM/BMP/WAV decoders); default is the set_decoder() plug."""
    keep = [c for c in df.columns if c != "payload"]
    out_schema = ", ".join(f"{c} {_spark_sql_type(df, c)}" for c in keep) \
        + ", " + FEATURES_FIELD

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = decoder or _DECODER
        for pdf in batches:
            feats = [
                dec(p if p is None or isinstance(p, bytes) else bytes(p), k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pdf[keep].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    offset (the decode of each frame is the stubbed decoder's job).
    Pure relational explode — no Python until the decode stage."""
    offsets = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                         F.lit(every_ms))
    return (df.filter(F.col("kind") == "video")
              .withColumn("frame_ms", F.explode(offsets)))


def _spark_sql_type(df: DataFrame, col: str) -> str:
    return dict(df.dtypes)[col]


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real image resize (PIL not in this
    container): output bytes = md5-stream keyed on (payload hex, w, h),
    length scaled to the target pixel count — so the Spark-side plumbing
    (binary in/out, Arrow batching, schema) is real and the SQL oracle
    can recompute the result. Replace via set_resizer()."""
    if payload is None:
        return b""
    n_bytes = max((width * height) // 512, 16)
    seed = f"{payload.hex()}|{width}|{height}"
    out = bytearray()
    block = seed
    while len(out) < n_bytes:
        block = hashlib.md5(block.encode()).hexdigest()
        out.extend(bytes.fromhex(block))
    return bytes(out[:n_bytes])


_RESIZER: Callable[[bytes, int, int], bytes] = _fake_resize


def set_resizer(fn: Callable[[bytes, int, int], bytes]) -> None:
    """Install a real resizer (e.g. PIL Image.resize + re-encode)."""
    global _RESIZER
    _RESIZER = fn


def resize_media(df: DataFrame, width: int, height: int,
                 resizer: Callable[[bytes, int, int], bytes] | None = None,
                 ) -> DataFrame:
    """Image/video-frame resize plumbing via mapInPandas: binary payload
    in, resized binary payload out, dims recorded. Arrow-batched,
    map-only — the 100 TB cost is one scan through the decode workers;
    partitioning and batch shape identical to extract_features.
    ``resizer`` overrides the installed global (io/codecs.image_resize
    is the real nearest-neighbor PPM path)."""
    keep = [c for c in df.columns if c != "payload"]
    out_schema = ", ".join(f"{c} {_spark_sql_type(df, c)}" for c in keep) \
        + ", out_w int, out_h int, resized binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rsz = resizer or _RESIZER
        for pdf in batches:
            resized = [
                rsz(p if p is None or isinstance(p, bytes) else bytes(p),
                    width, height)
                for p in pdf["payload"]
            ]
            out = pdf[keep].copy()
            out["out_w"] = width
            out["out_h"] = height
            out["resized"] = resized
            yield out

    return df.mapInPandas(run, schema=out_schema)


def synthetic_wav_media(spark: SparkSession, n: int = 64,
                        seed: int = 42) -> DataFrame:
    """Deterministic table of REAL PCM WAV payloads: mono 16 kHz,
    8..16 int16 frames whose little-endian byte pairs come from the
    row's md5 digest repeated — both oracle sides recompute every
    sample from (seed, media_id) relationally, while the payload is a
    well-formed RIFF/WAVE file a real parser (stdlib ``wave``) must
    decode. Built in an Arrow mapInPandas stage with the real encoder
    (io/codecs.wav_encode); payload bytes never touch the driver."""
    import hashlib

    import pandas as pd

    from hops_spark.io.codecs import wav_encode

    def gen(batches):
        for pdf in batches:
            out = []
            for mid in pdf["id"]:
                n_frames = 8 + int(mid) % 9
                dg = hashlib.md5(f"wav|{seed}|{mid}".encode()).digest() * 2
                pcm = dg[:2 * n_frames]
                out.append((int(mid), "audio", "audio/wav",
                            wav_encode(pcm, 1, 2, 16000)))
            yield pd.DataFrame(out, columns=["media_id", "kind", "mime",
                                             "payload"])

    return spark.range(n).mapInPandas(
        gen, schema="media_id long, kind string, mime string, payload binary")


def synthetic_ppm_neardups(spark: SparkSession, n_groups: int = 20,
                           copies: int = 3, seed: int = 42) -> DataFrame:
    """Groups of planted NEAR-duplicate P6 images: copy 0 of group g is
    the synthetic_ppm_media raster (md5-stream bytes, w,h keyed on g);
    copies j > 0 replace the 7th 16-byte digest block (raster bytes
    96..111) with md5('pert|seed|g|j'). Images with 3wh <= 96 never
    reach the block — byte-identical copies (exact dups); larger ones
    differ in <= 16 raster bytes (near dups: measured dHash hamming
    <= 5 intra-group vs >= 10 inter-group on this construction). Both
    engines can recompute every raster byte relationally from
    (seed, g, j)."""
    rows = spark.range(n_groups * copies)
    gexp = f"id div {copies}"
    return (rows
            .withColumn("g", F.expr(gexp).cast("long"))
            .withColumn("j", F.pmod("id", F.lit(copies)).cast("long"))
            .withColumn("w", (F.lit(4) + F.pmod("g", F.lit(5))).cast("int"))
            .withColumn("h", (F.lit(3) + F.pmod("g", F.lit(7))).cast("int"))
            .withColumn("hx", F.md5(F.concat_ws(
                "|", F.lit("ppmnd"), F.lit(str(seed)),
                F.col("g").cast("string"))))
            .withColumn("hxj", F.when(F.col("j") == 0, F.col("hx"))
                         .otherwise(F.md5(F.concat_ws(
                             "|", F.lit("pert"), F.lit(str(seed)),
                             F.col("g").cast("string"),
                             F.col("j").cast("string")))))
            .withColumn("pix_all", F.unhex(F.concat(
                F.repeat("hx", 6), F.col("hxj"), F.repeat("hx", 7))))
            .select(
                F.col("id").alias("media_id"),
                F.lit("image").alias("kind"),
                F.lit("image/x-portable-pixmap").alias("mime"),
                F.concat(
                    F.concat_ws("", F.lit("P6\n"), F.col("w").cast("string"),
                                F.lit(" "), F.col("h").cast("string"),
                                F.lit("\n255\n")).cast("binary"),
                    F.expr("substring(pix_all, 1, 3 * w * h)"),
                ).alias("payload")))


def synthetic_wav_neardups(spark: SparkSession, n_groups: int = 20,
                           copies: int = 3, seed: int = 42) -> DataFrame:
    """Groups of planted NEAR-duplicate PCM WAV clips: 33 16-byte
    digest blocks = 264 int16 frames per clip; copy 0 of group g uses
    md5('wavnd|seed|g|b') for every block b, copies j > 0 replace
    block 3 with md5('wpert|seed|g|j') — 8 perturbed samples touching
    <= 3 energy windows (measured energy-hash hamming <= 3 intra-group
    vs >= 20 inter-group). Per-block digests, NOT one repeated digest:
    repetition would make window energies periodic and every clip's
    gradient bits near-identical. Both engines recompute every sample
    relationally from (seed, g, j, b)."""
    import hashlib

    import pandas as pd

    from hops_spark.io.codecs import wav_encode

    def gen(batches):
        for pdf in batches:
            out = []
            for mid in pdf["id"]:
                mid = int(mid)
                g, j = divmod(mid, copies)
                pcm = b""
                for b in range(33):
                    if b == 3 and j > 0:
                        pcm += hashlib.md5(
                            f"wpert|{seed}|{g}|{j}".encode()).digest()
                    else:
                        pcm += hashlib.md5(
                            f"wavnd|{seed}|{g}|{b}".encode()).digest()
                out.append((mid, "audio", "audio/wav",
                            wav_encode(pcm, 1, 2, 16000)))
            yield pd.DataFrame(out, columns=["media_id", "kind", "mime",
                                             "payload"])

    return spark.range(n_groups * copies).mapInPandas(
        gen, schema="media_id long, kind string, mime string, payload binary")


def synthetic_video_neardups(spark: SparkSession, n_groups: int = 20,
                             copies: int = 3, seed: int = 42,
                             n_frames: int = 8) -> DataFrame:
    """Groups of planted NEAR-duplicate videos: each payload is a
    concatenation of ``n_frames`` canonical P6 files (w,h keyed on the
    group, frame f's raster = repeat(md5('vfr|seed|g|f'), 14)
    truncated to 3wh). Copies j > 0 REPLACE frames 2 and 5 wholesale
    (raster from md5('vpert|seed|g|j|f')) — an edited clip: 6 of 8
    frames byte-identical, 2 arbitrary. Both engines recompute every
    frame byte relationally from (seed, g, j, f)."""
    rows = spark.range(n_groups * copies)
    g = F.expr(f"id div {copies}")
    j = F.pmod("id", F.lit(copies))
    w = (F.lit(4) + F.pmod(g, F.lit(5))).cast("int")
    h = (F.lit(3) + F.pmod(g, F.lit(7))).cast("int")
    header = F.concat_ws("", F.lit("P6\n"), w.cast("string"), F.lit(" "),
                         h.cast("string"), F.lit("\n255\n")).cast("binary")
    out = rows.withColumn("_w", w).withColumn("_h", h)
    for f in range(n_frames):
        base = F.md5(F.concat_ws("|", F.lit("vfr"), F.lit(str(seed)),
                                 g.cast("string"), F.lit(str(f))))
        pert = F.md5(F.concat_ws("|", F.lit("vpert"), F.lit(str(seed)),
                                 g.cast("string"), j.cast("string"),
                                 F.lit(str(f))))
        hx = F.when(j > 0, pert).otherwise(base) if f in (2, 5) else base
        out = out.withColumn(f"_hx{f}", hx)
    payload = F.concat(*[
        F.concat(header,
                 F.expr(f"substring(unhex(repeat(_hx{f}, 14)), "
                        f"1, 3 * _w * _h)"))
        for f in range(n_frames)])
    return out.select(
        F.col("id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("video/x-ppm-stream").alias("mime"),
        payload.alias("payload"))
