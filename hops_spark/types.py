"""Writable / typedbytes ↔ Spark SQL type mapping (SURVEY.md §1.2).

The reference's record types are the Hadoop Writable kernel
(hadoop-common-project/hadoop-common/src/main/java/org/apache/hadoop/io/)
and the typedbytes dynamic lattice used by Hadoop Streaming
(hadoop-tools/hadoop-streaming/src/main/java/org/apache/hadoop/typedbytes/
Type.java:24-43). This module is the declared schema bridge: given the
type surface a reference job declares (``Job.setOutputKeyClass`` etc.),
produce the equivalent Spark ``DataType`` so reads/writes/pipe bridges
carry a real schema instead of opaque bytes.

Deliberate divergences (SURVEY.md §1.2 notes):

- VInt/VLong zig-zag varints are a storage encoding, not a logical type —
  they map to plain Integer/Long (Parquet picks its own encodings).
- Raw-byte sort order (WritableComparator / BinaryComparable) is NOT
  reproduced; the engine's ordering semantics are Spark's typed ordering.
- ObjectWritable/GenericWritable tagged-dynamic values have no sound
  static mapping and are rejected (callers should model a typed column).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Writable kernel → Spark SQL -------------------------------------------
# One entry per reference class (io/*.java, join/TupleWritable.java,
# streaming typedbytes handled separately below).

WRITABLE_TO_SPARK: dict[str, T.DataType] = {
    "BooleanWritable": T.BooleanType(),
    "ByteWritable": T.ByteType(),
    "ShortWritable": T.ShortType(),
    "IntWritable": T.IntegerType(),
    "VIntWritable": T.IntegerType(),      # varint = encoding detail
    "LongWritable": T.LongType(),
    "VLongWritable": T.LongType(),
    "FloatWritable": T.FloatType(),
    "DoubleWritable": T.DoubleType(),
    "Text": T.StringType(),
    "BytesWritable": T.BinaryType(),
    "MD5Hash": T.BinaryType(),            # 16-byte digest
    "NullWritable": T.NullType(),
}

# DBWritable-bridged JDBC types (mapreduce/lib/db/*Splitter.java) — the only
# route decimals/dates/timestamps enter the reference type surface.
DB_TYPE_TO_SPARK: dict[str, T.DataType] = {
    "BigDecimal": T.DecimalType(38, 18),
    "Date": T.DateType(),
    "Timestamp": T.TimestampType(),
}

_REJECTED = {"ObjectWritable", "GenericWritable"}


def spark_type_for_writable(name: str,
                            element: T.DataType | None = None) -> T.DataType:
    """Resolve a reference Writable class name to a Spark DataType.

    Container Writables (ArrayWritable, TwoDArrayWritable, MapWritable,
    SortedMapWritable, EnumSetWritable) need their element type passed as
    ``element`` (Maps use string keys — MapWritable keys are themselves
    Writables but the observable usage in the reference is string-keyed).
    """
    if name in _REJECTED:
        raise TypeError(
            f"{name} is a tagged-dynamic carrier with no static Spark "
            "mapping; declare a typed column instead (SURVEY.md §1.2)")
    if name in WRITABLE_TO_SPARK:
        return WRITABLE_TO_SPARK[name]
    if name in DB_TYPE_TO_SPARK:
        return DB_TYPE_TO_SPARK[name]
    if name == "ArrayWritable":
        return T.ArrayType(element or T.StringType())
    if name == "TwoDArrayWritable":
        return T.ArrayType(T.ArrayType(element or T.StringType()))
    if name in ("MapWritable", "SortedMapWritable"):
        return T.MapType(T.StringType(), element or T.StringType())
    if name == "EnumSetWritable":
        return T.ArrayType(T.StringType())
    if name == "ArrayPrimitiveWritable":
        return T.ArrayType(element or T.DoubleType())
    raise KeyError(f"unknown Writable type: {name}")


def tuple_writable_schema(field_types: list[T.DataType],
                          prefix: str = "f") -> T.StructType:
    """TupleWritable → StructType with all-nullable fields.

    The reference join row (mapreduce/lib/join/TupleWritable.java:1-298)
    is a positional tuple with a presence bitmask; absent slots map to
    SQL NULL, so every field is nullable.
    """
    return T.StructType([
        T.StructField(f"{prefix}{i}", t, nullable=True)
        for i, t in enumerate(field_types)
    ])


# --- typedbytes lattice ------------------------------------------------------
# Type.java:24-43 codes. VECTOR is a fixed-arity heterogeneous tuple
# (→ Struct); LIST is homogeneous/stream-shaped (→ Array); MAP → Map.

TYPEDBYTES_SCALARS: dict[str, T.DataType] = {
    "BYTES": T.BinaryType(),
    "BYTE": T.ByteType(),
    "BOOL": T.BooleanType(),
    "INT": T.IntegerType(),
    "LONG": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "STRING": T.StringType(),
}

TypedBytesSpec = "str | tuple"  # for docs; specs are str or nested tuples


def typedbytes_to_spark(spec) -> T.DataType:
    """Convert a typedbytes type spec to a Spark DataType.

    Spec grammar (mirrors Type.java's lattice):
      "INT" | "STRING" | ...                       scalar
      ("VECTOR", spec, spec, ...)                  fixed tuple → Struct
      ("LIST", spec)                                homogeneous → Array
      ("MAP", key_spec, value_spec)                 → Map
    """
    if isinstance(spec, str):
        try:
            return TYPEDBYTES_SCALARS[spec]
        except KeyError:
            raise KeyError(f"unknown typedbytes scalar: {spec}") from None
    tag, *rest = spec
    if tag == "VECTOR":
        return tuple_writable_schema([typedbytes_to_spark(s) for s in rest])
    if tag == "LIST":
        (elem,) = rest
        return T.ArrayType(typedbytes_to_spark(elem))
    if tag == "MAP":
        k, v = rest
        key_t = typedbytes_to_spark(k)
        if not isinstance(key_t, T.AtomicType):
            raise TypeError("typedbytes MAP keys must be scalar")
        return T.MapType(key_t, typedbytes_to_spark(v))
    raise KeyError(f"unknown typedbytes container: {tag}")


def kv_schema(key_writable: str, value_writable: str) -> T.StructType:
    """The universal MR record shape: Job.setOutputKeyClass/ValueClass →
    a two-column (key, value) StructType."""
    return T.StructType([
        T.StructField("key", spark_type_for_writable(key_writable), True),
        T.StructField("value", spark_type_for_writable(value_writable), True),
    ])
