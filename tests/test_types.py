"""Writable/typedbytes → Spark type mapping (SURVEY.md §1.2)."""

import pytest
from pyspark.sql import types as T

from hops_spark.types import (
    kv_schema,
    spark_type_for_writable,
    tuple_writable_schema,
    typedbytes_to_spark,
)


def test_scalar_writables():
    assert spark_type_for_writable("IntWritable") == T.IntegerType()
    assert spark_type_for_writable("VLongWritable") == T.LongType()
    assert spark_type_for_writable("Text") == T.StringType()
    assert spark_type_for_writable("MD5Hash") == T.BinaryType()
    assert spark_type_for_writable("BigDecimal") == T.DecimalType(38, 18)


def test_container_writables():
    assert spark_type_for_writable("ArrayWritable", T.LongType()) == \
        T.ArrayType(T.LongType())
    assert spark_type_for_writable("TwoDArrayWritable", T.IntegerType()) == \
        T.ArrayType(T.ArrayType(T.IntegerType()))
    assert spark_type_for_writable("MapWritable", T.DoubleType()) == \
        T.MapType(T.StringType(), T.DoubleType())
    assert spark_type_for_writable("EnumSetWritable") == T.ArrayType(T.StringType())


def test_dynamic_writables_rejected():
    with pytest.raises(TypeError):
        spark_type_for_writable("ObjectWritable")
    with pytest.raises(KeyError):
        spark_type_for_writable("NoSuchWritable")


def test_tuple_writable_all_nullable():
    st = tuple_writable_schema([T.IntegerType(), T.StringType()])
    assert [f.name for f in st.fields] == ["f0", "f1"]
    assert all(f.nullable for f in st.fields)


def test_typedbytes_lattice():
    assert typedbytes_to_spark("DOUBLE") == T.DoubleType()
    assert typedbytes_to_spark(("LIST", "STRING")) == T.ArrayType(T.StringType())
    assert typedbytes_to_spark(("MAP", "STRING", ("LIST", "INT"))) == \
        T.MapType(T.StringType(), T.ArrayType(T.IntegerType()))
    vec = typedbytes_to_spark(("VECTOR", "INT", "STRING", ("LIST", "BOOL")))
    assert isinstance(vec, T.StructType) and len(vec.fields) == 3
    with pytest.raises(TypeError):
        typedbytes_to_spark(("MAP", ("LIST", "INT"), "STRING"))
    with pytest.raises(KeyError):
        typedbytes_to_spark("VARCHAR")


def test_kv_schema():
    st = kv_schema("LongWritable", "Text")
    assert st["key"].dataType == T.LongType()
    assert st["value"].dataType == T.StringType()
