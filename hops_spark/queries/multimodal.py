"""Multimodal-column inventory queries (north-star; SURVEY §1.4's
inline small-file storage maps binary payloads into table columns —
INodeFile.storeFileDataInDB, namenode/INodeFile.java:204).

The media table is generated deterministically (io/multimodal.py).
Two decode paths are exercised: the deterministic stub (media_features
/ media_resize — plumbing-shaped, for formats whose libs aren't in the
container) and the REAL stdlib codecs (media_decode_ppm /
media_resize_nn — io/codecs.py parses actual binary-P6 images and
nearest-neighbor-resamples them). Spark-side plumbing — binary
columns, typed metadata, Arrow-batched mapInPandas, frame-sampling
explode — is shared by both and benchmarked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hops_spark.io.multimodal import (extract_features, frame_sample,
                                      resize_media, synthetic_media,
                                      synthetic_ppm_media)
from hops_spark.ops.fingerprint import fingerprint_pairs
from hops_spark.registry import register


@register(
    "media_features",
    # Full value-hash oracle: the stub decoder hashes the payload's HEX
    # form, so DuckDB recomputes features exactly — payload =
    # unhex(repeat(md5('42|'||id), 8)), hence lower(hex(payload)) is the
    # repeated md5 hex itself; byte j of the digest decodes via strpos
    # on the hex alphabet.
    sql="""
    WITH media AS (
        SELECT id AS media_id,
               ['image', 'audio', 'video'][(id % 3) + 1] AS kind,
               id * 100 AS duration_ms,
               md5(repeat(md5('42|' || id), 8)) AS digest
        FROM generate_series(0, 255) AS t(id)
    ), bytes AS (
        SELECT media_id, kind, duration_ms,
               (strpos('0123456789abcdef', digest[1:1]) - 1) * 16
               + (strpos('0123456789abcdef', digest[2:2]) - 1) AS b0,
               (strpos('0123456789abcdef', digest[15:15]) - 1) * 16
               + (strpos('0123456789abcdef', digest[16:16]) - 1) AS b7
        FROM media
    )
    SELECT media_id, kind, duration_ms,
           round(b0 / 255.0, 6) AS f0,
           round(b7 / 255.0, 6) AS f7
    FROM bytes
    ORDER BY media_id
    """,
    doc="Multimodal feature extraction: binary payload column → "
        "mapInPandas (Arrow batches) → features array<double>. The "
        "decoder is the deterministic stub (set_decoder() installs a "
        "real one); schema/batching/partitioning are production-shaped, "
        "and the stub's features are value-hash verified by a DuckDB "
        "oracle that recomputes the digest relationally.",
    tags=("multimodal", "north-star", "pandas-udf"),
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media(spark, n=256, seed=42)
    feats = extract_features(media)
    return (feats.select("media_id", "kind", "duration_ms",
                         F.round(F.element_at("features", 1), 6).alias("f0"),
                         F.round(F.element_at("features", 8), 6).alias("f7"))
                 .orderBy("media_id"))


@register(
    "media_frame_sample",
    sql="""
    WITH media AS (
        SELECT id AS media_id, id * 100 AS duration_ms
        FROM generate_series(0, 255) AS t(id)
        WHERE id % 3 = 2
    )
    SELECT media_id, duration_ms, unnest(
               generate_series(0, greatest(duration_ms - 1, 0), 1000)
           ) AS frame_ms
    FROM media
    ORDER BY media_id, frame_ms
    """,
    doc="Video frame sampling: one row per sampled frame offset via a "
        "relational sequence-explode — no Python until the per-frame "
        "decode stage (which is the stubbed decoder's job).",
    tags=("multimodal", "north-star"),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media(spark, n=256, seed=42)
    return (frame_sample(media, every_ms=1000)
            .select("media_id", "duration_ms", "frame_ms")
            .orderBy("media_id", "frame_ms"))


@register(
    "media_resize",
    # Stub resize at 32x32 emits exactly one md5 block (16 bytes) keyed
    # on (payload hex, w, h), so the oracle is md5(md5(seed)) — the hex
    # of the resized bytes IS the inner digest string.
    sql="""
    WITH media AS (
        SELECT id AS media_id,
               ['image', 'audio', 'video'][(id % 3) + 1] AS kind,
               repeat(md5('42|' || id), 8) AS payload_hex
        FROM generate_series(0, 255) AS t(id)
    )
    SELECT media_id, kind,
           32 AS out_w, 32 AS out_h,
           CAST(16 AS BIGINT) AS n_bytes,
           md5(md5(payload_hex || '|32|32')) AS resize_hash
    FROM media
    ORDER BY media_id
    """,
    doc="Multimodal resize plumbing: binary payload → mapInPandas "
        "(Arrow) → resized binary + dims. Deterministic stub resizer "
        "(set_resizer() installs PIL); the oracle recomputes the stub's "
        "md5-stream output byte-for-byte via its hex form.",
    tags=("multimodal", "north-star"),
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media(spark, n=256, seed=42)
    rs = resize_media(media, 32, 32)
    return (rs.select("media_id", "kind", "out_w", "out_h",
                      F.length("resized").cast("long").alias("n_bytes"),
                      F.md5(F.lower(F.hex("resized"))).alias("resize_hash"))
              .orderBy("media_id"))


@register(
    "media_dedup",
    # Payload seed cycles mod 100 -> every payload has ~2-3 byte-identical
    # copies; dedup hashes the binary column (md5 over bytes), keeps the
    # smallest media_id. The oracle regenerates the same digests
    # relationally (payload = unhex(repeat(md5('42|'||(id%100)), 8)), so
    # md5(payload) = md5(unhex(...)) -- recomputed from the hex stream).
    sql="""
    WITH media AS (
        SELECT id AS media_id,
               md5(repeat(md5('42|' || (id % 100)), 8)) AS payload_md5,
               octet_length(unhex(repeat(md5('42|' || (id % 100)), 8))) AS n_bytes
        FROM generate_series(0, 255) AS t(id)
    )
    SELECT min(media_id) AS media_id, payload_md5,
           CAST(min(n_bytes) AS BIGINT) AS n_bytes,
           count(*) AS n_copies
    FROM media
    GROUP BY payload_md5
    ORDER BY media_id
    """,
    doc="Multimodal exact dedup: binary payload columns grouped by "
        "content hash (md5 over bytes, JVM-side), smallest id wins — "
        "the opaque-blob twin of dedup_exact; one hash-aggregate "
        "shuffle on the 16-byte digest, payloads never move.",
    tags=("multimodal", "dedup", "north-star"),
)
def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # duplicate-payload variant of the synthetic table: seed cycles mod 100
    base = spark.range(256)
    payload = F.unhex(F.repeat(F.md5(F.concat_ws(
        "|", F.lit("42"), F.pmod(F.col("id"), F.lit(100)).cast("string"))), 8))
    media = base.select(F.col("id").alias("media_id"),
                        payload.alias("payload"))
    # content key = md5 of the lowercase hex form (DuckDB's md5 has no
    # BLOB overload; hex is a bijection, so the key is equivalent)
    return (media.select("media_id",
                         F.md5(F.lower(F.hex("payload"))).alias("payload_md5"),
                         F.length("payload").cast("long").alias("n_bytes"))
                 .groupBy("payload_md5")
                 .agg(F.min("media_id").alias("media_id"),
                      F.min("n_bytes").alias("n_bytes"),
                      F.count("*").alias("n_copies"))
                 .select("media_id", "payload_md5", "n_bytes", "n_copies")
                 .orderBy("media_id"))


# Shared oracle CTE: regenerate the PPM table's digest byte list
# relationally — bl[i] = i-th byte of md5('ppm|42|'||id); the raster is
# that 16-byte digest repeated, so pixel byte at 0-based offset q is
# bl[(q % 16) + 1].
_PPM_BYTES_CTE = """
    WITH m AS (
        SELECT id AS media_id,
               4 + id % 5 AS w, 3 + id % 7 AS h,
               md5('ppm|42|' || id) AS hx
        FROM generate_series(0, 63) AS t(id)
    ), d AS (
        SELECT media_id,
               s.i AS i,
               (strpos('0123456789abcdef', substr(hx, CAST(2 * s.i - 1 AS INT), 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(hx, CAST(2 * s.i AS INT), 1)) - 1) AS b
        FROM m, LATERAL (SELECT unnest(range(1, 17)) AS i) s
    ), agg AS (
        SELECT media_id, list(b ORDER BY i) AS bl, sum(b) AS dsum
        FROM d GROUP BY media_id
    )
"""


@register(
    "media_decode_ppm",
    sql=_PPM_BYTES_CTE + """
    SELECT m.media_id,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(bl[1] AS BIGINT) AS r0, CAST(bl[2] AS BIGINT) AS g0,
           CAST(bl[3] AS BIGINT) AS b0,
           CAST((3 * w * h // 16) * dsum
                + COALESCE(list_sum(bl[1:(3 * w * h % 16)]), 0)
                AS BIGINT) AS byte_sum
    FROM m JOIN agg USING (media_id)
    ORDER BY m.media_id
    """,
    doc="REAL image decode (not the stub): well-formed binary-P6 PPM "
        "payloads parsed by io/codecs.ppm_decode inside the Arrow "
        "mapInPandas stage — header tokenization, raster offset "
        "arithmetic, full-pixel byte sum. The oracle recomputes "
        "width/height/corner pixel/byte-sum relationally from the "
        "generating digest. Closes the 'codec parity unproven' gap.",
    tags=("multimodal", "north-star", "pandas-udf"),
)
def media_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.io.codecs import image_features
    media = synthetic_ppm_media(spark, n=64, seed=42)
    feats = extract_features(media, decoder=image_features)
    f = F.col("features")
    return (feats.select(
                "media_id",
                F.element_at(f, 1).cast("long").alias("width"),
                F.element_at(f, 2).cast("long").alias("height"),
                F.element_at(f, 3).cast("long").alias("r0"),
                F.element_at(f, 4).cast("long").alias("g0"),
                F.element_at(f, 5).cast("long").alias("b0"),
                F.element_at(f, 6).cast("long").alias("byte_sum"))
            .orderBy("media_id"))


@register(
    "media_resize_nn",
    # Output raster is 3x2 nearest-neighbor: out pixel (x,y) <- src
    # pixel (x*w//3, y*h//2); src pixel byte at 0-based offset q is
    # bl[(q % 16) + 1]. Output payload = 11-byte "P6\n3 2\n255\n"
    # header + 18 raster bytes = 29.
    sql=_PPM_BYTES_CTE + """
    SELECT m.media_id,
           CAST(3 AS INT) AS out_w, CAST(2 AS INT) AS out_h,
           CAST(29 AS BIGINT) AS n_bytes,
           CAST(bl[1] AS BIGINT) AS first_r,
           CAST(bl[(3 * ((h // 2) * w + (2 * w // 3)) % 16) + 1] AS BIGINT) AS last_r,
           CAST(bl[((3 * ((h // 2) * w + (2 * w // 3)) + 2) % 16) + 1] AS BIGINT) AS last_b
    FROM m JOIN agg USING (media_id)
    ORDER BY m.media_id
    """,
    doc="REAL nearest-neighbor image resize (not the stub): P6 in, P6 "
        "out via io/codecs.ppm_resize_nn in the Arrow resize stage; "
        "the oracle recomputes the exact output corner pixels from the "
        "floor source-pixel mapping over the generating digest.",
    tags=("multimodal", "north-star", "pandas-udf"),
)
def media_resize_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.io.codecs import image_resize
    media = synthetic_ppm_media(spark, n=64, seed=42)
    rs = resize_media(media, 3, 2, resizer=image_resize)

    def byte_at(pos: int):          # 1-based position in resized payload
        return F.expr(f"CAST(conv(hex(substring(resized, {pos}, 1)), 16, 10) AS BIGINT)")

    return (rs.select(
                "media_id", "out_w", "out_h",
                F.length("resized").cast("long").alias("n_bytes"),
                byte_at(12).alias("first_r"),      # after 11-byte header
                byte_at(12 + 15).alias("last_r"),  # last pixel R (idx 5 of 6)
                byte_at(12 + 17).alias("last_b"))
            .orderBy("media_id"))


# Shared oracle CTE for the WAV table: bl[i] = i-th byte of
# md5('wav|42|'||id); the PCM is that digest repeated, frame j's
# little-endian int16 uses bytes at 0-based offsets 2j and 2j+1.
_WAV_BYTES_CTE = """
    WITH m AS (
        SELECT id AS media_id, 8 + id % 9 AS n_frames,
               md5('wav|42|' || id) AS hx
        FROM generate_series(0, 63) AS t(id)
    ), d AS (
        SELECT media_id,
               s.i AS i,
               (strpos('0123456789abcdef', substr(hx, CAST(2 * s.i - 1 AS INT), 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(hx, CAST(2 * s.i AS INT), 1)) - 1) AS b
        FROM m, LATERAL (SELECT unnest(range(1, 17)) AS i) s
    ), bl AS (
        SELECT media_id, list(b ORDER BY i) AS bl FROM d GROUP BY media_id
    ), samp AS (
        SELECT m.media_id, m.n_frames, j.j,
               bl[(2 * j.j) % 16 + 1] + 256 * bl[(2 * j.j + 1) % 16 + 1] AS u
        FROM m JOIN bl USING (media_id),
             LATERAL (SELECT unnest(range(0, m.n_frames)) AS j) j
    ), sgn AS (
        SELECT media_id, n_frames, j,
               CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
        FROM samp
    )
"""


@register(
    "media_decode_wav",
    sql=_WAV_BYTES_CTE + """
    SELECT media_id,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(16000 AS BIGINT) AS framerate,
           CAST(max(n_frames) AS BIGINT) AS n_frames,
           CAST(max(CASE WHEN j = 0 THEN s END) AS BIGINT) AS first_sample,
           CAST(sum(abs(s)) AS BIGINT) AS sum_abs
    FROM sgn GROUP BY media_id ORDER BY media_id
    """,
    doc="REAL audio decode (the WAV twin of media_decode_ppm): "
        "well-formed PCM RIFF/WAVE payloads parsed by io/codecs."
        "audio_features inside the Arrow mapInPandas stage — RIFF "
        "header, frame count, int16 LE sample access, full |sample| "
        "sum. The oracle recomputes every sample relationally from "
        "the generating digest.",
    tags=("multimodal", "north-star", "pandas-udf"),
)
def media_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.io.codecs import audio_features
    from hops_spark.io.multimodal import synthetic_wav_media
    media = synthetic_wav_media(spark, n=64, seed=42)
    feats = extract_features(media, decoder=audio_features)
    f = F.col("features")
    return (feats.select(
                "media_id",
                F.element_at(f, 1).cast("long").alias("n_channels"),
                F.element_at(f, 2).cast("long").alias("framerate"),
                F.element_at(f, 3).cast("long").alias("n_frames"),
                F.element_at(f, 4).cast("long").alias("first_sample"),
                F.element_at(f, 5).cast("long").alias("sum_abs"))
            .orderBy("media_id"))


_WAV_WIN = 4


@register(
    "wav_window_energy",
    sql=_WAV_BYTES_CTE + f"""
    , led AS (
        SELECT media_id, j, s,
               j // {_WAV_WIN} AS win_id,
               lead(s) OVER (PARTITION BY media_id ORDER BY j) AS s_next,
               (j + 1) // {_WAV_WIN} AS win_next
        FROM sgn
    )
    SELECT media_id, CAST(win_id AS BIGINT) AS win_id,
           CAST(count(*) AS BIGINT) AS n_in_win,
           CAST(sum(s * s) AS BIGINT) AS energy,
           CAST(sum(CASE WHEN s_next IS NOT NULL AND win_next = win_id
                          AND s * s_next < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS zero_crossings
    FROM led
    GROUP BY media_id, win_id
    ORDER BY media_id, win_id
    """,
    doc="WINDOWED audio feature extraction over REAL PCM WAV decode "
        "(io/codecs.audio_samples inside the Arrow mapInPandas stage): "
        "per 4-frame window, integer energy (sum of squared int16 "
        "samples) and zero-crossing count — the waveform-level "
        "features a speech/music filter runs before transcription, "
        "computed ARRAY-SIDE after decode (map-only until the final "
        "ordering). The oracle reconstructs every sample relationally "
        "from the generating digest and replays the windowing with a "
        "lead() scan — all integers, bit-exact.",
    tags=("multimodal", "north-star", "pandas-udf"),
)
def wav_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.io.codecs import audio_samples
    from hops_spark.io.multimodal import synthetic_wav_media
    media = synthetic_wav_media(spark, n=64, seed=42)
    feats = extract_features(media, decoder=audio_samples)
    s = F.transform(F.col("features"), lambda x: x.cast("long"))
    n = F.size(s)
    win_stats = F.transform(
        F.sequence(F.lit(0), ((n - 1) / _WAV_WIN).cast("int")),
        lambda w: F.struct(
            w.cast("long").alias("win_id"),
            F.size(F.slice(s, w * _WAV_WIN + 1, _WAV_WIN))
             .cast("long").alias("n_in_win"),
            F.aggregate(F.slice(s, w * _WAV_WIN + 1, _WAV_WIN),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x * x).alias("energy"),
            F.aggregate(
                # fixed ascending candidate ranks, then clamp j+1 <= n
                # (F.sequence(a, b) DESCENDS when a > b — never let the
                # bound arithmetic produce that)
                F.filter(F.sequence(w * _WAV_WIN + 1,
                                    w * _WAV_WIN + F.lit(_WAV_WIN - 1)),
                         lambda j: j < n),
                F.lit(0).cast("long"),
                lambda acc, j: acc + F.when(
                    F.element_at(s, j.cast("int"))
                    * F.element_at(s, (j + 1).cast("int")) < 0,
                    F.lit(1)).otherwise(F.lit(0))).alias("zero_crossings")))
    return (feats.select("media_id", F.explode(win_stats).alias("w"))
                 .select("media_id", "w.win_id", "w.n_in_win",
                         "w.energy", "w.zero_crossings")
                 .orderBy("media_id", "win_id"))


@register(
    "ppm_channel_histogram",
    sql=_PPM_BYTES_CTE + """
    , px AS (
        SELECT m.media_id,
               q.q % 3 AS channel,
               bl[(q.q % 16) + 1] // 16 AS bin
        FROM m JOIN agg USING (media_id),
             LATERAL (SELECT unnest(range(0, 3 * w * h)) AS q) q
    )
    SELECT CAST(channel AS BIGINT) AS channel,
           CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_pixels
    FROM px GROUP BY channel, bin
    ORDER BY channel, bin
    """,
    doc="Corpus-wide per-CHANNEL pixel-value histogram (16 bins) over "
        "REAL P6 PPM decode (io/codecs.image_pixels inside the Arrow "
        "mapInPandas stage) — the brightness/color-distribution audit "
        "an image-corpus pipeline runs before training: decode is "
        "map-only, the histogram is ONE bounded aggregate (<= 48 "
        "rows). The oracle reconstructs every raster byte relationally "
        "from the generating digest.",
    tags=("multimodal", "north-star", "pandas-udf"),
)
def ppm_channel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.io.codecs import image_pixels
    media = synthetic_ppm_media(spark, n=64, seed=42)
    feats = extract_features(media, decoder=image_pixels)
    return (feats.select(F.posexplode("features").alias("q", "v"))
                 .select(F.pmod("q", F.lit(3)).cast("long").alias("channel"),
                         (F.col("v").cast("long") / 16).cast("long")
                          .alias("bin"))
                 .groupBy("channel", "bin")
                 .agg(F.count("*").alias("n_pixels"))
                 .orderBy("channel", "bin"))


# --- perceptual near-dup: dHash over real decode --------------------------

DH_GROUPS = 20
DH_COPIES = 3
DH_SEED = 42
DH_THRESHOLD = 8     # measured: intra-group hamming <= 5, inter >= 10


def _duck_dhash_sql() -> str:
    g, c, s = DH_GROUPS, DH_COPIES, DH_SEED
    byte = ("('0x' || substr(pix_hex, 2*(3*((y.y*h//8)*w + (x.x*w//9))"
            "+{ch})+1, 2))::BIGINT")
    gray = "(" + " + ".join(byte.format(ch=ch) for ch in range(3)) + ") // 3"
    return f"""
    WITH img AS (
        SELECT gg.g * {c} + jj.j AS media_id, gg.g, jj.j,
               4 + gg.g % 5 AS w, 3 + gg.g % 7 AS h,
               md5('ppmnd|{s}|' || gg.g) AS hx,
               CASE WHEN jj.j = 0 THEN md5('ppmnd|{s}|' || gg.g)
                    ELSE md5('pert|{s}|' || gg.g || '|' || jj.j) END AS hxj
        FROM (SELECT unnest(range(0, {g})) AS g) gg,
             (SELECT unnest(range(0, {c})) AS j) jj
    ), ph AS (
        SELECT media_id, w, h,
               repeat(hx, 6) || hxj || repeat(hx, 7) AS pix_hex
        FROM img
    ), cell AS (
        SELECT media_id, y.y, x.x, {gray} AS gray
        FROM ph, (SELECT unnest(range(0, 8)) AS y) y,
                 (SELECT unnest(range(0, 9)) AS x) x
    ), bits AS (
        SELECT c1.media_id, c1.y * 8 + c1.x AS i,
               CASE WHEN c2.gray > c1.gray THEN 1 ELSE 0 END AS bit
        FROM cell c1 JOIN cell c2 ON c2.media_id = c1.media_id
                                 AND c2.y = c1.y AND c2.x = c1.x + 1
        WHERE c1.x < 8
    ), hashes AS (
        SELECT media_id,
               CAST(sum(CASE WHEN i < 32 THEN
                   bit * CAST(pow(2.0, 31 - i) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS hi,
               CAST(sum(CASE WHEN i >= 32 THEN
                   bit * CAST(pow(2.0, 63 - i) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS lo
        FROM bits GROUP BY media_id
    ), bands AS (
        SELECT media_id, b.bi,
               CASE b.bi WHEN 0 THEN hi // 65536 WHEN 1 THEN hi % 65536
                         WHEN 2 THEN lo // 65536 ELSE lo % 65536 END AS bv
        FROM hashes, (SELECT unnest(range(0, 4)) AS bi) b
    ), cand AS (
        SELECT DISTINCT a.media_id AS id_a, b2.media_id AS id_b
        FROM bands a JOIN bands b2 ON b2.bi = a.bi AND b2.bv = a.bv
                                  AND b2.media_id > a.media_id
    ), ham AS (
        SELECT id_a, id_b,
               CAST(bit_count(xor(ha.hi, hb.hi))
                    + bit_count(xor(ha.lo, hb.lo)) AS BIGINT) AS hamming
        FROM cand JOIN hashes ha ON ha.media_id = id_a
                  JOIN hashes hb ON hb.media_id = id_b
    )
    SELECT id_a, id_b, hamming,
           (id_a // {c} = id_b // {c}) AS same_group
    FROM ham WHERE hamming <= {DH_THRESHOLD}
    ORDER BY id_a, id_b
    """


@register(
    "image_dhash_neardup",
    sql=_duck_dhash_sql(),
    doc="Perceptual image near-dup via dHash (the public 8x8 gradient "
        "hash) over REAL binary-P6 decode inside Arrow mapInPandas "
        "(io/codecs.image_dhash): NN-resample to 9x8 with the exact "
        "ppm_resize_nn floor mapping, integer grayscale, 64 gradient "
        "bits packed as two exact 32-bit halves. Candidates via the "
        "simhash discipline — four 16-bit bands, bucket equi-join — "
        "then verified by exact hamming (bit_count of xor) <= 8 "
        "(measured on the planted construction: intra-group <= 5, "
        "inter-group >= 10). The oracle recomputes every raster byte, "
        "resample cell, and hash bit relationally from the generating "
        "digests. At corpus scale the per-image hash is one map-only "
        "decode and the band join is the capped-bucket LSH shape of "
        "minhash_dedup_pairs.",
    tags=("multimodal", "dedup", "north-star", "pandas-udf"),
)
def image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.io.codecs import image_dhash
    from hops_spark.io.multimodal import synthetic_ppm_neardups

    media = synthetic_ppm_neardups(spark, DH_GROUPS, DH_COPIES, DH_SEED)
    feats = extract_features(media, decoder=image_dhash)
    hashes = feats.select(
        "media_id",
        F.col("features")[0].cast("long").alias("hi"),
        F.col("features")[1].cast("long").alias("lo"))
    return (fingerprint_pairs(hashes, threshold=DH_THRESHOLD)
            .select("id_a", "id_b", "hamming",
                    F.expr(f"(id_a div {DH_COPIES}) = "
                           f"(id_b div {DH_COPIES})").alias("same_group"))
            .orderBy("id_a", "id_b"))


AH_GROUPS = 20
AH_COPIES = 3
AH_SEED = 42
AH_THRESHOLD = 8     # measured: intra-group hamming <= 3, inter >= 20


def _duck_audio_hash_sql() -> str:
    g, c, s = AH_GROUPS, AH_COPIES, AH_SEED
    return f"""
    WITH img AS (
        SELECT gg.g * {c} + jj.j AS media_id, gg.g, jj.j
        FROM (SELECT unnest(range(0, {g})) AS g) gg,
             (SELECT unnest(range(0, {c})) AS j) jj
    ), blk AS (
        SELECT media_id,
               b.b,
               CASE WHEN b.b = 3 AND j > 0
                    THEN md5('wpert|{s}|' || g || '|' || j)
                    ELSE md5('wavnd|{s}|' || g || '|' || b.b) END AS hx
        FROM img, (SELECT unnest(range(0, 33)) AS b) b
    ), samp AS (
        SELECT media_id, 8 * b + q.q AS sj,
               ('0x' || substr(hx, 2 * (2 * q.q) + 1, 2))::BIGINT
               + 256 * ('0x' || substr(hx, 2 * (2 * q.q + 1) + 1, 2))::BIGINT
                   AS u
        FROM blk, (SELECT unnest(range(0, 8)) AS q) q
    ), sgn AS (
        SELECT media_id, sj,
               CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS smp
        FROM samp
    ), win AS (
        -- FULL 4-sample windows only (HAVING): the Python side builds
        -- wins over range(n // 4) and drops the trailing partial
        -- window — without this guard a clip whose sample count is
        -- not a multiple of 4 would give the replay one extra
        -- gradient bit and split the value hash
        SELECT media_id, sj // 4 AS wid, CAST(sum(smp * smp) AS BIGINT) AS e
        FROM sgn GROUP BY 1, 2 HAVING count(*) = 4
    ), bits AS (
        SELECT w1.media_id, w1.wid AS i,
               CASE WHEN w2.e > w1.e THEN 1 ELSE 0 END AS bit
        FROM win w1 JOIN win w2 ON w2.media_id = w1.media_id
                               AND w2.wid = w1.wid + 1
        WHERE w1.wid < 64
    ), hashes AS (
        SELECT media_id,
               CAST(sum(CASE WHEN i < 32 THEN
                   bit * CAST(pow(2.0, 31 - i) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS hi,
               CAST(sum(CASE WHEN i >= 32 THEN
                   bit * CAST(pow(2.0, 63 - i) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS lo
        FROM bits GROUP BY media_id
    ), bands AS (
        SELECT media_id, b.bi,
               CASE b.bi WHEN 0 THEN hi // 65536 WHEN 1 THEN hi % 65536
                         WHEN 2 THEN lo // 65536 ELSE lo % 65536 END AS bv
        FROM hashes, (SELECT unnest(range(0, 4)) AS bi) b
    ), cand AS (
        SELECT DISTINCT a.media_id AS id_a, b2.media_id AS id_b
        FROM bands a JOIN bands b2 ON b2.bi = a.bi AND b2.bv = a.bv
                                  AND b2.media_id > a.media_id
    ), ham AS (
        SELECT id_a, id_b,
               CAST(bit_count(xor(ha.hi, hb.hi))
                    + bit_count(xor(ha.lo, hb.lo)) AS BIGINT) AS hamming
        FROM cand JOIN hashes ha ON ha.media_id = id_a
                  JOIN hashes hb ON hb.media_id = id_b
    )
    SELECT id_a, id_b, hamming,
           (id_a // {c} = id_b // {c}) AS same_group
    FROM ham WHERE hamming <= {AH_THRESHOLD}
    ORDER BY id_a, id_b
    """


@register(
    "audio_fingerprint_neardup",
    sql=_duck_audio_hash_sql(),
    doc="Acoustic near-dup via the energy-gradient fingerprint over "
        "REAL RIFF/WAVE decode (io/codecs.audio_energy_hash inside "
        "Arrow mapInPandas): 64 bits of 4-frame window-energy "
        "gradients (the dHash idea on the time axis — the quantized "
        "shape Chromaprint-class fingerprinters use), two exact 32-bit "
        "halves, four 16-bit LSH bands, exact-hamming verify <= 8 "
        "(measured on the planted construction: intra-group <= 3, "
        "inter >= 20). Completes the multimodal dedup story: exact "
        "bytes (media_dedup), image perceptual (image_dhash_neardup), "
        "audio acoustic (this). Oracle recomputes every sample, window "
        "energy, and hash bit relationally.",
    tags=("multimodal", "dedup", "north-star", "pandas-udf"),
)
def audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.io.codecs import audio_energy_hash
    from hops_spark.io.multimodal import synthetic_wav_neardups

    media = synthetic_wav_neardups(spark, AH_GROUPS, AH_COPIES, AH_SEED)
    feats = extract_features(media, decoder=audio_energy_hash)
    hashes = feats.select(
        "media_id",
        F.col("features")[0].cast("long").alias("hi"),
        F.col("features")[1].cast("long").alias("lo"))
    return (fingerprint_pairs(hashes, threshold=AH_THRESHOLD)
            .select("id_a", "id_b", "hamming",
                    F.expr(f"(id_a div {AH_COPIES}) = "
                           f"(id_b div {AH_COPIES})").alias("same_group"))
            .orderBy("id_a", "id_b"))


VH_GROUPS = 20
VH_COPIES = 3
VH_SEED = 42
VH_FRAMES = 8
VH_THRESHOLD = 8     # per-frame hamming (matched frames are byte-equal here)
VH_MIN_FRAMES = 5    # videos sharing >= 5 of 8 frames are near-dups
# frame-id packing stride: fid = media_id * FID_STRIDE + f. Derived, not
# hardcoded, and asserted > VH_FRAMES so raising the frame sample count
# can never silently collide frame ids across videos (round-8 ADVICE):
# both the Spark derivation and the generated oracle SQL read THIS.
FID_STRIDE = 1 << (VH_FRAMES).bit_length()
assert FID_STRIDE > VH_FRAMES


def _duck_video_hash_sql() -> str:
    g, c, s, nf, st = VH_GROUPS, VH_COPIES, VH_SEED, VH_FRAMES, FID_STRIDE
    byte = ("('0x' || substr(pix_hex, 2*(3*((y.y*h//8)*w + (x.x*w//9))"
            "+{ch})+1, 2))::BIGINT")
    gray = "(" + " + ".join(byte.format(ch=ch) for ch in range(3)) + ") // 3"
    return f"""
    WITH vid AS (
        SELECT gg.g * {c} + jj.j AS media_id, gg.g, jj.j,
               4 + gg.g % 5 AS w, 3 + gg.g % 7 AS h
        FROM (SELECT unnest(range(0, {g})) AS g) gg,
             (SELECT unnest(range(0, {c})) AS j) jj
    ), frm AS (
        SELECT media_id * {st} + f.f AS fid, media_id, w, h,
               repeat(CASE WHEN f.f IN (2, 5) AND j > 0
                           THEN md5('vpert|{s}|' || g || '|' || j
                                    || '|' || f.f)
                           ELSE md5('vfr|{s}|' || g || '|' || f.f) END,
                      14) AS pix_hex
        FROM vid, (SELECT unnest(range(0, {nf})) AS f) f
    ), cell AS (
        SELECT fid, y.y, x.x, {gray} AS gray
        FROM frm, (SELECT unnest(range(0, 8)) AS y) y,
                  (SELECT unnest(range(0, 9)) AS x) x
    ), bits AS (
        SELECT c1.fid, c1.y * 8 + c1.x AS i,
               CASE WHEN c2.gray > c1.gray THEN 1 ELSE 0 END AS bit
        FROM cell c1 JOIN cell c2 ON c2.fid = c1.fid
                                 AND c2.y = c1.y AND c2.x = c1.x + 1
        WHERE c1.x < 8
    ), hashes AS (
        SELECT fid,
               CAST(sum(CASE WHEN i < 32 THEN
                   bit * CAST(pow(2.0, 31 - i) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS hi,
               CAST(sum(CASE WHEN i >= 32 THEN
                   bit * CAST(pow(2.0, 63 - i) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS lo
        FROM bits GROUP BY fid
    ), bands AS (
        SELECT fid, b.bi,
               CASE b.bi WHEN 0 THEN hi // 65536 WHEN 1 THEN hi % 65536
                         WHEN 2 THEN lo // 65536 ELSE lo % 65536 END AS bv
        FROM hashes, (SELECT unnest(range(0, 4)) AS bi) b
    ), cand AS (
        SELECT DISTINCT a.fid AS id_a, b2.fid AS id_b
        FROM bands a JOIN bands b2 ON b2.bi = a.bi AND b2.bv = a.bv
                                  AND b2.fid > a.fid
                                  AND b2.fid // {st} <> a.fid // {st}
    ), ham AS (
        SELECT id_a, id_b
        FROM cand JOIN hashes ha ON ha.fid = id_a
                  JOIN hashes hb ON hb.fid = id_b
        WHERE bit_count(xor(ha.hi, hb.hi))
              + bit_count(xor(ha.lo, hb.lo)) <= {VH_THRESHOLD}
    )
    SELECT id_a // {st} AS vid_a, id_b // {st} AS vid_b,
           CAST(count(DISTINCT id_a) AS BIGINT) AS n_frames_matched,
           ((id_a // {st}) // {c} = (id_b // {st}) // {c}) AS same_group
    FROM ham
    GROUP BY 1, 2, 4
    HAVING count(DISTINCT id_a) >= {VH_MIN_FRAMES}
    ORDER BY vid_a, vid_b
    """


@register(
    "video_frame_neardup",
    sql=_duck_video_hash_sql(),
    doc="Video near-dup via frame-sampled perceptual hashing — the "
        "edited-clip detector: payloads are concatenations of "
        "canonical P6 frames walked by a REAL sequential parser "
        "(io/codecs.video_frame_dhashes: each frame's canonical "
        "header + 3wh raster gives the exact stride), one dHash per "
        "frame (bit-identical to image_dhash via the shared "
        "_dhash_raster core), frame-level banded LSH + hamming <= 8, "
        "then videos sharing >= 5 of 8 near-dup frames pair up. The "
        "planted construction replaces 2 of 8 frames in each copy "
        "(an edit), so groups match on the 6 untouched frames. "
        "Completes the modality triple: image (dHash), audio (energy "
        "gradient), video (frame-set overlap). Frame volume is "
        "n_videos x n_frames map-only decode; everything downstream "
        "is the bounded band-join shape.",
    tags=("multimodal", "dedup", "north-star", "pandas-udf"),
)
def video_frame_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.io.codecs import video_frame_dhashes
    from hops_spark.io.multimodal import synthetic_video_neardups

    media = synthetic_video_neardups(spark, VH_GROUPS, VH_COPIES,
                                     VH_SEED, VH_FRAMES)
    feats = extract_features(media, decoder=video_frame_dhashes)
    frames = (feats.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.lit(VH_FRAMES - 1))).alias("f"),
        "features")
        .select((F.col("media_id") * FID_STRIDE + F.col("f")).alias("fid"),
                F.element_at("features", F.col("f") * 2 + 1)
                 .cast("long").alias("hi"),
                F.element_at("features", F.col("f") * 2 + 2)
                 .cast("long").alias("lo")))
    pairs = (fingerprint_pairs(frames, threshold=VH_THRESHOLD,
                               id_col="fid")
             .filter(F.expr(f"id_a div {FID_STRIDE} != id_b div {FID_STRIDE}")))
    return (pairs
            .select(F.expr(f"id_a div {FID_STRIDE}").alias("vid_a"),
                    F.expr(f"id_b div {FID_STRIDE}").alias("vid_b"),
                    "id_a")
            .groupBy("vid_a", "vid_b")
            .agg(F.countDistinct("id_a").cast("long")
                  .alias("n_frames_matched"))
            .filter(F.col("n_frames_matched") >= VH_MIN_FRAMES)
            .select("vid_a", "vid_b", "n_frames_matched",
                    F.expr(f"(vid_a div {VH_COPIES}) = "
                           f"(vid_b div {VH_COPIES})").alias("same_group"))
            .orderBy("vid_a", "vid_b"))
