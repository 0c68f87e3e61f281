"""Avro path: schema mapping, binary encoding, container roundtrip,
distributed Spark read/write, and INTEROP against the real Apache Avro
Java library (on the Spark classpath) via the JVM gateway — files
written by the pure-Python writer are read by GenericDatumReader and
vice versa, so the wire format is proven, not assumed."""

from __future__ import annotations

import json
from datetime import date, datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hops_spark.io import avro as A

SET = settings(max_examples=25, deadline=None,
               suppress_health_check=[HealthCheck.too_slow])

_ALL_TYPES_SCHEMA = {
    "type": "record", "name": "r", "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "by", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "e", "type": {"type": "enum", "name": "col",
                               "symbols": ["RED", "GREEN", "BLUE"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "f4", "size": 4}},
        {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "nested", "type": {"type": "record", "name": "inner",
                                    "fields": [{"name": "x", "type": "long"}]}},
    ]}

_ALL_TYPES_ROW = {
    "b": True, "i": -42, "l": 1 << 40, "f": 1.5, "d": -2.25,
    "s": "héllo ✓", "by": b"\x00\xff\x01", "opt": None,
    "arr": [1, -2, 3], "m": {"k1": "v1", "k2": "v2"},
    "e": "GREEN", "fx": b"ABCD",
    "dt": date(2024, 2, 29),
    "ts": datetime(2024, 2, 29, 12, 34, 56, 789012, tzinfo=timezone.utc),
    "nested": {"x": 7},
}


def test_encode_decode_all_types():
    buf = bytearray()
    A.encode_datum(buf, _ALL_TYPES_SCHEMA, _ALL_TYPES_ROW)
    got = A.Decoder(bytes(buf)).read_datum(_ALL_TYPES_SCHEMA)
    assert got == _ALL_TYPES_ROW


@SET
@given(vals=st.lists(
    st.tuples(st.integers(-(1 << 62), 1 << 62),
              st.text(max_size=8),
              st.one_of(st.none(), st.floats(allow_nan=False,
                                             allow_infinity=False)),
              st.lists(st.integers(-1000, 1000), max_size=5),
              st.dictionaries(st.text(max_size=3),
                              st.binary(max_size=4), max_size=3)),
    max_size=10))
def test_container_roundtrip_property(vals, tmp_path_factory):
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "string"},
        {"name": "c", "type": ["null", "double"]},
        {"name": "d", "type": {"type": "array", "items": "int"}},
        {"name": "e", "type": {"type": "map", "values": "bytes"}}]}
    rows = [dict(zip("abcde", v)) for v in vals]
    for codec in ("null", "deflate"):
        p = str(tmp_path_factory.mktemp("avro") / f"t_{codec}.avro")
        assert A.write_container(p, sch, rows, codec=codec,
                                 block_rows=3) == len(rows)
        assert list(A.read_container(open(p, "rb").read())) == rows


def test_varint_zigzag_against_spec_vectors():
    """Spec examples: 0->00, -1->01, 1->02, -2->03, 2->04, -64->7f,
    64->80 01."""
    for v, hexed in [(0, "00"), (-1, "01"), (1, "02"), (-2, "03"),
                     (2, "04"), (-64, "7f"), (64, "8001")]:
        out = bytearray()
        A._write_long(out, v)
        assert bytes(out).hex() == hexed, v
        assert A.Decoder(bytes(out)).read_long() == v


def test_schema_mapping_roundtrip():
    from pyspark.sql import types as T
    spark_schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("tags", T.ArrayType(T.StringType(), True), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.LongType()), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("d", T.DateType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("inner", T.StructType([
            T.StructField("x", T.IntegerType(), True)]), True),
    ])
    avro = A.spark_to_avro(spark_schema)
    back = A.avro_to_spark(avro)
    assert back == spark_schema


def test_truncated_container_raises_eof_or_value_error():
    sch = {"type": "record", "name": "r",
           "fields": [{"name": "a", "type": "long"}]}
    import io as _io
    buf = _io.BytesIO()
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".avro", delete=False) as f:
        pass
    A.write_container(f.name, sch, [{"a": i} for i in range(10)])
    full = open(f.name, "rb").read()
    for cut in (5, len(full) // 2, len(full) - 3):
        with pytest.raises((EOFError, ValueError, KeyError)):
            list(A.read_container(full[:cut]))


def test_spark_write_read_roundtrip(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from hops_spark.io.readers import load_table
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate") \
        .limit(500)
    path = str(tmp_path / "orders_avro")
    n = A.write_avro(orders.repartition(4), path, codec="deflate")
    assert n == orders.count()
    back = A.read_avro(spark, path)
    assert back.schema == orders.schema or \
        [f.name for f in back.schema.fields] == \
        [f.name for f in orders.schema.fields]
    a = {tuple(r) for r in orders.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def _jvm_read_rows(spark, path: str):
    """Read an avro container with the REAL Java library."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), reader)
    rows = []
    while dfr.hasNext():
        rows.append(dfr.next())
    schema_json = dfr.getSchema().toString()
    dfr.close()
    return rows, json.loads(schema_json)


def test_java_library_reads_python_written_file(spark, tmp_path):
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "opt", "type": ["null", "long"]}]}
    rows = [{"k": i, "s": f"row-{i}", "d": i / 4.0,
             "opt": None if i % 3 == 0 else i * 10}
            for i in range(100)]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"py_{codec}.avro")
        A.write_container(p, sch, rows, codec=codec, block_rows=7)
        jrows, jschema = _jvm_read_rows(spark, p)
        assert jschema["fields"][0]["name"] == "k"
        assert len(jrows) == 100
        for i in (0, 3, 99):
            r = jrows[i]
            assert r.get("k") == rows[i]["k"]
            assert str(r.get("s")) == rows[i]["s"]
            assert r.get("d") == rows[i]["d"]
            assert r.get("opt") == rows[i]["opt"]


def test_python_reads_java_written_file(spark, tmp_path):
    jvm = spark._jvm
    sch_json = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"}]})
    schema = jvm.org.apache.avro.Schema.Parser().parse(sch_json)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    p = str(tmp_path / "java.avro")
    dfw.create(schema, jvm.java.io.File(p))
    for i in range(50):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("k", jvm.java.lang.Long(i))
        rec.put("s", f"java-{i}")
        dfw.append(rec)
    dfw.close()
    got = list(A.read_container(open(p, "rb").read()))
    assert got == [{"k": i, "s": f"java-{i}"} for i in range(50)]


def test_read_avro_is_distributed_not_collected(spark, tmp_path):
    """The read path is a binaryFile scan + mapInPandas — the plan must
    contain the Arrow eval operator, no driver-side row materialization."""
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(a=i, b=f"x{i}") for i in range(100)])
    path = str(tmp_path / "d")
    A.write_avro(df.repartition(3), path)
    back = A.read_avro(spark, path)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan or "ArrowEval" in plan
    assert back.count() == 100


@SET
@given(n_rows=st.integers(1, 120), block_rows=st.integers(1, 7),
       split_bytes=st.integers(8, 200))
def test_sync_split_partitions_blocks_exactly(tmp_path_factory, n_rows,
                                              block_rows, split_bytes):
    """For ANY split granularity, concatenating the split reads in
    offset order must reproduce the full-file row sequence exactly —
    the dovetail rule (a block starting at offset s belongs to the
    split beginning at s) leaves no block dropped or doubled."""
    import os
    sch = {"type": "record", "name": "r",
           "fields": [{"name": "a", "type": "long"}]}
    p = str(tmp_path_factory.mktemp("avsplit") / "t.avro")
    rows = [{"a": i} for i in range(n_rows)]
    A.write_container(p, sch, rows, codec="deflate", block_rows=block_rows)
    schema, codec, sync, off = A.read_header(open(p, "rb").read())
    size = os.path.getsize(p)
    got = []
    for s in range(0, size, split_bytes):
        got.extend(A.read_container_split(
            p, s, min(s + split_bytes, size), schema, codec, sync, off))
    assert got == rows


def test_read_avro_sync_split_equals_file_read(spark, tmp_path):
    """One big container file read with split_bytes must equal the
    whole-file read and actually fan out over multiple tasks."""
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(k=i, s=f"v{i}") for i in range(5000)])
    path = str(tmp_path / "one")
    A.write_avro(df.coalesce(1), path, codec="deflate")
    whole = {tuple(r) for r in A.read_avro(spark, path).collect()}
    split = A.read_avro(spark, path, split_bytes=4096)
    assert {tuple(r) for r in split.collect()} == whole
    assert split.rdd.getNumPartitions() > 1


# --- round 6: schema resolution + decimal (spec "Schema Resolution") -----

_V1_WRITER = {
    "type": "record", "name": "evt", "fields": [
        {"name": "k", "type": "long"},
        {"name": "status", "type": "string"},
        {"name": "cents", "type": "int"},
        {"name": "price", "type": {"type": "bytes", "logicalType": "decimal",
                                   "precision": 12, "scale": 2}},
        {"name": "legacy", "type": ["null", "string"]},
    ]}
# v2 reader: renames status->ostatus via alias, promotes cents int->long,
# drops `legacy`, adds default-filled `channel`.
_V2_READER = {
    "type": "record", "name": "evt", "fields": [
        {"name": "k", "type": "long"},
        {"name": "ostatus", "type": "string", "aliases": ["status"]},
        {"name": "cents", "type": "long"},
        {"name": "price", "type": {"type": "bytes", "logicalType": "decimal",
                                   "precision": 12, "scale": 2}},
        {"name": "channel", "type": "string", "default": "web"},
    ]}


def _v1_rows(n=60):
    from decimal import Decimal
    return [{"k": i, "status": f"S{i % 3}", "cents": i * 37 - 500,
             "price": Decimal(i * 37 - 500).scaleb(-2),
             "legacy": None if i % 2 else f"old-{i}"} for i in range(n)]


def test_schema_resolution_defaults_aliases_promotions(tmp_path):
    p = str(tmp_path / "v1.avro")
    A.write_container(p, _V1_WRITER, _v1_rows(), codec="deflate")
    got = list(A.read_container(open(p, "rb").read(),
                                reader_schema=_V2_READER))
    from decimal import Decimal
    assert len(got) == 60
    for i, r in enumerate(got):
        assert set(r) == {"k", "ostatus", "cents", "price", "channel"}
        assert r["ostatus"] == f"S{i % 3}"          # alias rename
        assert r["cents"] == i * 37 - 500           # int->long promotion
        assert isinstance(r["cents"], int)
        assert r["price"] == Decimal(i * 37 - 500).scaleb(-2)
        assert r["channel"] == "web"                # default fill


def test_schema_resolution_matches_java_resolving_reader(spark, tmp_path):
    """The SAME (writer v1, reader v2) resolution through the real Java
    library: DataFileReader + GenericDatumReader(null, readerSchema)
    applies the spec resolution; its rows must equal ours."""
    p = str(tmp_path / "v1j.avro")
    A.write_container(p, _V1_WRITER, _v1_rows(), codec="deflate")
    ours = list(A.read_container(open(p, "rb").read(),
                                 reader_schema=_V2_READER))

    jvm = spark._jvm
    rsch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(_V2_READER))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(None, rsch)
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p), reader)
    jrows = []
    while dfr.hasNext():
        jrows.append(dfr.next())
    dfr.close()
    assert len(jrows) == len(ours)
    conv = jvm.org.apache.avro.Conversions.DecimalConversion()
    psch = rsch.getField("price").schema()
    lt = jvm.org.apache.avro.LogicalTypes.fromSchema(psch)
    for jr, mine in zip(jrows, ours):
        assert jr.get("k") == mine["k"]
        assert str(jr.get("ostatus")) == mine["ostatus"]
        assert jr.get("cents") == mine["cents"]
        assert str(jr.get("channel")) == mine["channel"]
        # py4j auto-converts java.math.BigDecimal -> decimal.Decimal
        assert conv.fromBytes(jr.get("price"), psch, lt) == mine["price"]


def test_java_reads_python_decimal_file(spark, tmp_path):
    """Decimal logical type interop: Python-written bytes-decimal values
    decode to the same BigDecimal through the Java DecimalConversion."""
    from decimal import Decimal
    sch = {"type": "record", "name": "d", "fields": [
        {"name": "v", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 14, "scale": 3}}]}
    vals = [Decimal("0.000"), Decimal("-0.001"), Decimal("12345678901.234"),
            Decimal("-99999999999.999"), Decimal("1.100")]
    p = str(tmp_path / "dec.avro")
    A.write_container(p, sch, [{"v": v} for v in vals], codec="null")

    jvm = spark._jvm
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p), reader)
    jsch = dfr.getSchema().getField("v").schema()
    lt = jvm.org.apache.avro.LogicalTypes.fromSchema(jsch)
    conv = jvm.org.apache.avro.Conversions.DecimalConversion()
    out = []
    while dfr.hasNext():
        # py4j auto-converts java.math.BigDecimal -> decimal.Decimal
        out.append(conv.fromBytes(dfr.next().get("v"), jsch, lt))
    dfr.close()
    assert out == vals


def test_python_reads_java_decimal_file(spark, tmp_path):
    """Reverse direction: Java DecimalConversion.toBytes -> our decoder."""
    from decimal import Decimal
    jvm = spark._jvm
    sch_json = json.dumps({"type": "record", "name": "d", "fields": [
        {"name": "v", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 10, "scale": 2}}]})
    schema = jvm.org.apache.avro.Schema.Parser().parse(sch_json)
    vsch = schema.getField("v").schema()
    lt = jvm.org.apache.avro.LogicalTypes.fromSchema(vsch)
    conv = jvm.org.apache.avro.Conversions.DecimalConversion()
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    p = str(tmp_path / "jdec.avro")
    dfw.create(schema, jvm.java.io.File(p))
    vals = ["-12345678.90", "0.00", "0.01", "99999999.99"]
    for s in vals:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("v", conv.toBytes(jvm.java.math.BigDecimal(s), vsch, lt))
        dfw.append(rec)
    dfw.close()
    got = list(A.read_container(open(p, "rb").read()))
    assert [r["v"] for r in got] == [Decimal(s) for s in vals]


def test_read_avro_with_reader_schema_distributed(spark, tmp_path):
    """read_avro(reader_schema=...): the DataFrame schema derives from
    the READER schema (bigint cents, no legacy, default channel), on
    both the per-file and the sync-split path."""
    import os
    d = str(tmp_path / "evt")
    os.makedirs(d)
    rows = _v1_rows(200)
    A.write_container(os.path.join(d, "part-0.avro"), _V1_WRITER,
                      rows[:100], codec="deflate", block_rows=9)
    A.write_container(os.path.join(d, "part-1.avro"), _V1_WRITER,
                      rows[100:], codec="deflate", block_rows=9)
    for split in (None, 4096):
        df = A.read_avro(spark, d, split_bytes=split,
                         reader_schema=_V2_READER)
        assert dict(df.dtypes) == {"k": "bigint", "ostatus": "string",
                                   "cents": "bigint",
                                   "price": "decimal(12,2)",
                                   "channel": "string"}
        got = {r["k"]: r for r in df.collect()}
        assert len(got) == 200
        assert got[7]["ostatus"] == "S1" and got[7]["channel"] == "web"
        assert got[7]["cents"] == 7 * 37 - 500


def test_resolution_error_contracts():
    """No silent misreads: incompatible primitive, missing default, and
    record-name mismatch all raise ValueError."""
    p = _V1_WRITER
    buf = bytearray()
    A.encode_datum(buf, p, _v1_rows(1)[0])
    d = A.Decoder(bytes(buf))
    bad_prim = {"type": "record", "name": "evt", "fields": [
        {"name": "k", "type": "string"}]}          # long -> string: illegal
    with pytest.raises(ValueError, match="cannot resolve"):
        A.read_resolved(d, p, bad_prim)
    d = A.Decoder(bytes(buf))
    bad_name = {"type": "record", "name": "other", "fields": []}
    with pytest.raises(ValueError, match="name mismatch"):
        A.read_resolved(d, p, bad_name)


def test_complex_union_roundtrip_and_spark_read(spark, tmp_path):
    """Complex (multi-branch) unions map to the spark-avro member
    struct: struct<member0, member1> with exactly one non-null member;
    encode picks the branch from the set member, decode wraps it."""
    import os
    sch = {"type": "record", "name": "cu", "fields": [
        {"name": "k", "type": "long"},
        {"name": "v", "type": ["null", "long", "string"]}]}
    rows = [{"k": i,
             "v": (None if i % 3 == 0 else
                   {"member0": i * 10, "member1": None} if i % 3 == 1 else
                   {"member0": None, "member1": f"s{i}"})}
            for i in range(30)]
    d = str(tmp_path / "cu")
    os.makedirs(d)
    p = os.path.join(d, "part-0.avro")
    A.write_container(p, sch, rows, codec="deflate")
    got = list(A.read_container(open(p, "rb").read()))
    assert got == rows
    # Spark read: member-struct schema, values round-trip
    df = A.read_avro(spark, d)
    assert dict(df.dtypes)["v"] == "struct<member0:bigint,member1:string>"
    by_k = {r["k"]: r["v"] for r in df.collect()}
    assert by_k[0] is None
    assert by_k[1]["member0"] == 10 and by_k[1]["member1"] is None
    assert by_k[2]["member1"] == "s2" and by_k[2]["member0"] is None


def test_schema_resolution_with_complex_union(spark, tmp_path):
    """Composition regression (round-6 ADVICE medium): read_resolved over
    a complex (multi-branch non-null) reader union must wrap the branch
    value into the spark-avro memberN struct exactly like read_datum —
    both when the writer union is already complex and when a simple
    writer union is WIDENED to a complex reader union. The distributed
    read_avro(reader_schema=...) path must produce a well-shaped
    DataFrame, not an Arrow misconversion."""
    import os
    w_sch = {"type": "record", "name": "cu", "fields": [
        {"name": "k", "type": "long"},
        {"name": "v", "type": ["null", "long", "string"]},
        {"name": "w", "type": ["null", "long"]}]}
    # reader: same complex union for v; w widened null|long -> null|long|string;
    # plus a default-filled new field to force the resolution path.
    r_sch = {"type": "record", "name": "cu", "fields": [
        {"name": "k", "type": "long"},
        {"name": "v", "type": ["null", "long", "string"]},
        {"name": "w", "type": ["null", "long", "string"]},
        {"name": "tag", "type": "string", "default": "t"}]}
    rows = [{"k": i,
             "v": (None if i % 3 == 0 else
                   {"member0": i * 10, "member1": None} if i % 3 == 1 else
                   {"member0": None, "member1": f"s{i}"}),
             "w": None if i % 2 == 0 else i * 7}
            for i in range(30)]
    d = str(tmp_path / "cures")
    os.makedirs(d)
    p = os.path.join(d, "part-0.avro")
    A.write_container(p, w_sch, rows, codec="deflate")
    got = list(A.read_container(open(p, "rb").read(), reader_schema=r_sch))
    assert len(got) == 30
    for i, r in enumerate(got):
        assert r["tag"] == "t"
        if i % 3 == 0:
            assert r["v"] is None
        elif i % 3 == 1:
            assert r["v"] == {"member0": i * 10, "member1": None}
        else:
            assert r["v"] == {"member0": None, "member1": f"s{i}"}
        # widened simple->complex union: bare long wraps into member0
        if i % 2 == 0:
            assert r["w"] is None
        else:
            assert r["w"] == {"member0": i * 7, "member1": None}
    # distributed path: DataFrame schema from the READER schema
    df = A.read_avro(spark, d, reader_schema=r_sch)
    dt = dict(df.dtypes)
    assert dt["v"] == "struct<member0:bigint,member1:string>"
    assert dt["w"] == "struct<member0:bigint,member1:string>"
    by_k = {r["k"]: r for r in df.collect()}
    assert by_k[1]["v"]["member0"] == 10 and by_k[1]["w"]["member0"] == 7
    assert by_k[2]["v"]["member1"] == "s2" and by_k[2]["tag"] == "t"
    assert by_k[0]["v"] is None and by_k[0]["w"] is None


def test_complex_union_java_interop(spark, tmp_path):
    """Java writes an ['int','string'] union; our decoder yields the
    member struct with the right branch set — and a Python-written
    complex-union file reads back through the Java library."""
    jvm = spark._jvm
    sch_json = json.dumps({"type": "record", "name": "cu", "fields": [
        {"name": "v", "type": ["int", "string"]}]})
    schema = jvm.org.apache.avro.Schema.Parser().parse(sch_json)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    p = str(tmp_path / "ju.avro")
    dfw.create(schema, jvm.java.io.File(p))
    for i in range(10):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        if i % 2 == 0:
            rec.put("v", jvm.java.lang.Integer(i))
        else:
            rec.put("v", f"str{i}")
        dfw.append(rec)
    dfw.close()
    got = list(A.read_container(open(p, "rb").read()))
    for i, r in enumerate(got):
        if i % 2 == 0:
            assert r["v"] == {"member0": i, "member1": None}
        else:
            assert r["v"] == {"member0": None, "member1": f"str{i}"}
    # reverse: Python writes, Java reads
    sch = {"type": "record", "name": "cu", "fields": [
        {"name": "v", "type": ["int", "string"]}]}
    rows = [{"v": {"member0": 7, "member1": None}},
            {"v": {"member0": None, "member1": "hey"}}]
    p2 = str(tmp_path / "pu.avro")
    A.write_container(p2, sch, rows, codec="null")
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p2),
                                                  reader)
    jrows = []
    while dfr.hasNext():
        jrows.append(dfr.next())
    dfr.close()
    assert jrows[0].get("v") == 7
    assert str(jrows[1].get("v")) == "hey"


# --- spec-optional codecs: bzip2 / xz (stdlib bz2 / lzma) ----------------


def test_optional_codec_roundtrip_pure_python(tmp_path):
    """Every registered codec round-trips through the pure-Python
    writer/reader, and the unavailable third-party codecs raise a
    clear environment-gap error instead of writing garbage."""
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"}, {"name": "s", "type": "string"}]}
    rows = [{"k": i, "s": f"v{i}" * (i % 5)} for i in range(200)]
    for codec in ("null", "deflate", "bzip2", "xz"):
        p = str(tmp_path / f"c_{codec}.avro")
        A.write_container(p, sch, rows, codec=codec, block_rows=17)
        assert list(A.read_container(open(p, "rb").read())) == rows
    for maybe in ("snappy", "zstandard"):
        try:
            __import__(maybe)
        except ImportError:
            # absent here: requesting it must raise the env-gap error
            with pytest.raises(ValueError, match="needs the python-"):
                A.write_container(str(tmp_path / "x.avro"), sch, rows,
                                  codec=maybe)
        else:
            # present (e.g. pulled in later): it must just round-trip
            p = str(tmp_path / f"c_{maybe}.avro")
            A.write_container(p, sch, rows, codec=maybe, block_rows=17)
            assert list(A.read_container(open(p, "rb").read())) == rows


def test_java_library_reads_python_bzip2_xz(spark, tmp_path):
    """Forward interop for the spec-optional codecs: the REAL Java
    library (DataFileReader auto-detects avro.codec) reads files our
    bz2/lzma-backed writer produced."""
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"}, {"name": "s", "type": "string"}]}
    rows = [{"k": i, "s": f"row-{i}"} for i in range(120)]
    for codec in ("bzip2", "xz"):
        p = str(tmp_path / f"py_{codec}.avro")
        A.write_container(p, sch, rows, codec=codec, block_rows=11)
        jrows, jschema = _jvm_read_rows(spark, p)
        assert len(jrows) == 120
        for i in (0, 59, 119):
            assert jrows[i].get("k") == i
            assert str(jrows[i].get("s")) == f"row-{i}"


def test_python_reads_java_bzip2_xz(spark, tmp_path):
    """Reverse interop: files written by the Java library with
    CodecFactory.bzip2Codec()/xzCodec(6) decode with our reader."""
    jvm = spark._jvm
    sch_json = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"}, {"name": "s", "type": "string"}]})
    for codec, mk in (("bzip2",
                       lambda: jvm.org.apache.avro.file.CodecFactory.bzip2Codec()),
                      ("xz",
                       lambda: jvm.org.apache.avro.file.CodecFactory.xzCodec(6))):
        schema = jvm.org.apache.avro.Schema.Parser().parse(sch_json)
        writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
        dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
        dfw.setCodec(mk())
        p = str(tmp_path / f"java_{codec}.avro")
        dfw.create(schema, jvm.java.io.File(p))
        for i in range(80):
            rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
            rec.put("k", jvm.java.lang.Long(i))
            rec.put("s", f"java-{i}")
            dfw.append(rec)
        dfw.close()
        got = list(A.read_container(open(p, "rb").read()))
        assert got == [{"k": i, "s": f"java-{i}"} for i in range(80)]


def test_split_reads_work_on_optional_codecs(spark, tmp_path):
    """The distributed read path (write_avro/read_avro) carries the new
    codecs end-to-end — per-partition container files compressed with
    bzip2/xz read back identically."""
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(a=i, b=f"x{i}") for i in range(300)])
    for codec in ("bzip2", "xz"):
        path = str(tmp_path / f"d_{codec}")
        A.write_avro(df.repartition(3), path, codec=codec)
        back = A.read_avro(spark, path)
        assert sorted((r.a, r.b) for r in back.collect()) == \
            [(i, f"x{i}") for i in range(300)]


def test_reader_default_complex_union_is_member_struct(tmp_path):
    """A reader-only field of COMPLEX-union type filled from its default
    must be memberN-struct-shaped, exactly like present values (the
    round-7 review finding: default_value returned the bare branch
    while avro_to_spark maps the union to struct<member0,member1>)."""
    w = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"}]}
    r = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"},
        {"name": "u", "type": ["long", "string"], "default": 7},
        {"name": "nu", "type": ["null", "long", "string"],
         "default": None}]}
    p = str(tmp_path / "w.avro")
    A.write_container(p, w, [{"k": 1}, {"k": 2}])
    got = list(A.read_container(open(p, "rb").read(), reader_schema=r))
    assert got == [
        {"k": 1, "u": {"member0": 7, "member1": None}, "nu": None},
        {"k": 2, "u": {"member0": 7, "member1": None}, "nu": None}]
