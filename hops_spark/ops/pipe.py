"""Subprocess pipe bridge — Hadoop Streaming parity (SURVEY.md §2.9).

The reference runs arbitrary executables as mapper/reducer over
stdin/stdout with tab-separated text framing (PipeMapper.java:38,
PipeReducer.java:40, StreamJob.java:80). Spark-native equivalents:

- ``pipe_df``: exact streaming parity — each partition's rows are
  written tab-separated to the command's stdin, its stdout lines come
  back as rows (``RDD.pipe`` underneath, the documented public API).
- ``map_in_pandas_udf``: the modern path — Arrow-batched Python
  callable via ``mapInPandas`` (what a new pipeline should use).
- ``aggregate_reducer``: the `-reducer aggregate` shorthand
  (StreamJob.java:860) — spec-driven ValueAggregator over piped
  (aggType:id, value) lines, reusing ops/agg.py.

Scale note: pipe forks ONE child per partition (not per row) and
streams through it — the reference's model exactly. Python UDF paths
are Arrow-vectorized. Neither belongs in a relational hot path; they
exist for external-binary parity.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pipe_df(df: DataFrame, command: str, sep: str = "\t",
            out_cols: list[str] | None = None) -> DataFrame:
    """Run `command` (shell pipeline) once per partition, feeding rows as
    sep-joined text lines on stdin, reading stdout lines back.

    Output schema: out_cols string columns split on `sep` (default: one
    `line` column). Mirrors PipeMapper text framing: input framing is
    key<TAB>value...; for `-io typedbytes` jobs use pipe_typedbytes."""
    import shlex
    sc = df.sparkSession
    as_lines = df.select(
        F.concat_ws(sep, *[F.col(c).cast("string") for c in df.columns]).alias("l"))
    # rdd.pipe tokenizes the command itself (no shell) — wrap in sh -c so
    # pipelines/redirection work like Hadoop Streaming's -mapper strings.
    piped = as_lines.rdd.map(lambda r: r.l).pipe(f"/bin/sh -c {shlex.quote(command)}")
    if not out_cols:
        schema = T.StructType([T.StructField("line", T.StringType())])
        return sc.createDataFrame(piped.map(lambda l: (l,)), schema)
    schema = T.StructType([T.StructField(c, T.StringType()) for c in out_cols])
    n = len(out_cols)
    return sc.createDataFrame(
        piped.map(lambda l: tuple((l.split(sep) + [None] * n)[:n])), schema)


def map_in_pandas_udf(df: DataFrame, fn: Callable[[Iterator], Iterator],
                      schema: str) -> DataFrame:
    """Arrow-batched per-partition transform (modern PipeMapper)."""
    return df.mapInPandas(fn, schema=schema)


def aggregate_reducer(df: DataFrame, sep: str = "\t") -> DataFrame:
    """`-reducer aggregate` shorthand: input rows are
    '<aggType>:<id><sep><value>' lines; runs the matching ValueAggregator
    per id in one groupBy (ValueAggregatorReducer parity)."""
    from hops_spark.ops.agg import AGGREGATORS
    parts = F.split(F.col(df.columns[0]), sep, 2)
    tagged = df.select(
        F.split(parts.getItem(0), ":", 2).getItem(0).alias("agg_type"),
        F.split(parts.getItem(0), ":", 2).getItem(1).alias("id"),
        parts.getItem(1).alias("value"))
    outs = []
    for agg_type in [r.agg_type for r in
                     tagged.select("agg_type").distinct().collect()]:
        if agg_type not in AGGREGATORS:
            raise ValueError(f"unknown aggregator {agg_type}")
        sub = (tagged.filter(F.col("agg_type") == agg_type)
               .groupBy("id")
               .agg(AGGREGATORS[agg_type]("value").cast("string").alias("out"))
               .select(F.lit(agg_type).alias("agg_type"), "id", "out"))
        outs.append(sub)
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def pipe_binary(df: DataFrame, argv: list[str],
                key_col: str = "key", value_col: str = "value") -> DataFrame:
    """Hadoop Pipes parity (hadoop-tools/hadoop-pipes; Submitter.java,
    C++ API Pipes::Mapper): run a NATIVE worker per partition speaking a
    FRAMED BINARY protocol — uint32-BE length-prefixed (key, value) byte
    pairs on stdin, same framing back on stdout — instead of Streaming's
    line-text framing (which corrupts binary payloads). This is the
    semantic core of Pipes: arbitrary-bytes kv records to a compiled
    worker; the socket transport and C++ SDK glue are deployment detail.

    One child per PARTITION, a writer thread feeds stdin while the task
    thread drains stdout (no pipe-buffer deadlock); cost model identical
    to the reference (fork once, stream through). Input/output columns
    are binary; cast strings upstream/downstream as needed."""
    import struct
    import subprocess
    import threading

    out_schema = T.StructType([
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
    ])

    def run_partition(rows):
        proc = subprocess.Popen(argv, stdin=subprocess.PIPE,
                                stdout=subprocess.PIPE)
        feed_err: list[BaseException] = []

        def feed():
            # A feeder failure must fail the TASK, not silently close
            # stdin (the child would see clean EOF and exit 0 with
            # truncated output) — capture and re-raise after join().
            try:
                for r in rows:
                    k = bytes(r[0]) if r[0] is not None else b""
                    v = bytes(r[1]) if r[1] is not None else b""
                    proc.stdin.write(struct.pack(">I", len(k)) + k)
                    proc.stdin.write(struct.pack(">I", len(v)) + v)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                feed_err.append(e)
            finally:
                proc.stdin.close()

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        while True:
            hdr = proc.stdout.read(4)
            if len(hdr) < 4:
                break
            klen = struct.unpack(">I", hdr)[0]
            k = proc.stdout.read(klen)
            vlen = struct.unpack(">I", proc.stdout.read(4))[0]
            v = proc.stdout.read(vlen)
            yield (bytearray(k), bytearray(v))
        t.join()
        if feed_err:
            raise feed_err[0]
        proc.wait()
        if proc.returncode != 0:
            raise RuntimeError(f"pipes worker exited {proc.returncode}")

    src = df.select(F.col(key_col).cast("binary"),
                    F.col(value_col).cast("binary"))
    return df.sparkSession.createDataFrame(
        src.rdd.mapPartitions(run_partition), out_schema)


def pipe_typedbytes(df: DataFrame, argv: list[str],
                    out_schema: str = "key string, value string") -> DataFrame:
    """Hadoop Streaming `-io typedbytes` parity: run one child per
    partition speaking the typedbytes wire protocol (io/typedbytes.py;
    reference framing hadoop-tools/hadoop-streaming/.../typedbytes/
    TypedBytesInput.java:34) — each input row's first two columns are
    encoded as a (key, value) typedbytes pair on stdin; the child's
    stdout is decoded as typedbytes pairs and returned under
    ``out_schema``. An existing typedbytes streaming mapper/reducer
    binary runs unmodified.

    Same cost model as pipe_binary: fork once per partition, stream
    through, writer thread feeds stdin while the task thread drains
    stdout (no pipe-buffer deadlock)."""
    import subprocess
    import threading

    from pyspark.sql.types import StructType

    from hops_spark.io import typedbytes as tb

    def run_partition(rows):
        proc = subprocess.Popen(argv, stdin=subprocess.PIPE,
                                stdout=subprocess.PIPE)
        feed_err: list[BaseException] = []

        def feed():
            # Same contract as pipe_binary: an encode failure (e.g. a
            # None value — typedbytes has no null code) must fail the
            # task, not close stdin as if the input ended cleanly.
            try:
                for r in rows:
                    buf = bytearray()
                    tb.encode(_to_plain(r[0]), buf)
                    tb.encode(_to_plain(r[1]), buf)
                    proc.stdin.write(bytes(buf))
            except BaseException as e:  # noqa: BLE001 — re-raised below
                feed_err.append(e)
            finally:
                proc.stdin.close()

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        yield from tb.decode_pairs(proc.stdout)
        t.join()
        if feed_err:
            raise feed_err[0]
        proc.wait()
        if proc.returncode != 0:
            raise RuntimeError(f"typedbytes worker exited {proc.returncode}")

    def _to_plain(v):
        if v is None:
            raise ValueError(
                "typedbytes has no null type code; coalesce/filter None "
                "values before pipe_typedbytes (e.g. F.coalesce(col, lit('')))")
        if isinstance(v, bytearray):
            return bytes(v)
        if hasattr(v, "asDict"):                # Row → dict (MAP framing)
            return {k: _to_plain(x) for k, x in v.asDict().items()}
        return v

    schema = StructType.fromDDL(out_schema)
    return df.sparkSession.createDataFrame(
        df.rdd.mapPartitions(run_partition), schema)


def sentences_udtf():
    """Python UDTF (Spark 4 table-function API — the §2.9 UDTF
    mechanism, modernized): text → (sentence_id, sentence) rows.

    Row-at-a-time Python is the SLOW path by design; the production
    twin is ``sentence_rows`` below (pure split+posexplode, codegen'd,
    zero Python). The UDTF exists for API parity and is pinned to the
    fast path by tests/test_pipe_gen_multimodal.py equivalence."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_id: long, sentence: string")
    class Sentences:
        def eval(self, text: str):
            import re
            if text is None:
                return
            parts = [p.strip() for p in re.split(r"[.!?]+", text)]
            for i, p in enumerate(parts):
                if p:
                    yield (i, p)

    return Sentences


def sentence_rows(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Fast-path twin of sentences_udtf: JVM-side regexp split +
    posexplode (whole-stage codegen, no Python workers). Sentence ids
    count only non-empty trimmed parts, matching the UDTF's contract."""
    parts = F.filter(
        F.transform(F.split(F.col(text_col), r"[.!?]+"),
                    lambda s: F.trim(s)),
        lambda s: s != "")
    return (df.select(F.col(id_col), F.posexplode(parts)
                      .alias("sentence_id", "sentence"))
              .withColumn("sentence_id", F.col("sentence_id").cast("long")))
