"""JDBC splitter parity tests — expectations mirror the reference's
TestIntegerSplitter.java / TestTextSplitter.java / TestSplitters.java
(hadoop-mapreduce-client-jobclient + client-core test trees). Pure
logic; no database or Spark session needed."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from hops_spark.io import jdbc as J


# --- integer boundaries (TestIntegerSplitter.java) ----------------------

def test_even_splits():
    assert J.integer_split_points(10, 0, 100) == \
        [0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100]


def test_odd_splits():
    assert J.integer_split_points(10, 0, 95) == \
        [0, 9, 18, 27, 36, 45, 54, 63, 72, 81, 90, 95]


def test_singleton_split():
    assert J.integer_split_points(1, 5, 5) == [5, 5]


def test_singleton_split_overasked():
    assert J.integer_split_points(5, 5, 5) == [5, 5]


def test_too_many_splits():
    assert J.integer_split_points(5, 3, 5) == [3, 4, 5]


def test_integer_splits_clauses():
    s = J.integer_splits("id", 0, 100, 2)
    assert [x.predicate for x in s] == [
        "id >= 0 AND id < 50",
        "id >= 50 AND id <= 100",       # last interval closed
    ]


def test_integer_splits_null_range():
    assert J.integer_splits("id", None, None, 4) == \
        [J.Split("id IS NULL", "id IS NULL")]


def test_integer_splits_one_null_extremum_adds_null_split():
    s = J.integer_splits("id", None, 10, 2)
    assert s[-1].predicate == "id IS NULL"


# --- text (TestTextSplitter.java) ---------------------------------------

def test_string_convert_empty():
    assert J.string_to_decimal("") == Decimal(0)
    assert J.decimal_to_string(Decimal(0)) == ""


def test_convert_a():
    assert J.decimal_to_string(J.string_to_decimal("A")) == "A"


def test_convert_z():
    assert J.decimal_to_string(J.string_to_decimal("Z")) == "Z"


def test_convert_three_chars():
    assert J.decimal_to_string(J.string_to_decimal("abc")) == "abc"


def test_convert_str_with_space():
    assert J.decimal_to_string(J.string_to_decimal("big str")) == "big str"


def test_convert_chomped_at_8_chars():
    assert J.decimal_to_string(
        J.string_to_decimal("AVeryLongStringIndeed")) == "AVeryLon"


def test_alphabet_split():
    pts = J.text_split_points(25, "A", "Z", "")
    assert pts == [chr(c) for c in range(ord("A"), ord("Z") + 1)]


def test_common_prefix():
    # Splits between 'Hand' and 'Hardy' — middles are interpolated
    # unicode, but endpoints and count are pinned.
    pts = J.text_split_points(5, "nd", "rdy", "Ha")
    assert pts[0] == "Hand"
    assert pts[-1] == "Hardy"
    assert len(pts) == 6


def test_text_splits_quote_and_close():
    s = J.text_splits("name", "A", "Z", 2)
    assert s[0].lower == "name >= 'A'"
    assert s[-1].upper == "name <= 'Z'"
    assert all("<" in x.upper for x in s)


def test_text_splits_null_min_adds_null_split():
    s = J.text_splits("name", None, "M", 2)
    assert s[-1].predicate == "name IS NULL"


# --- decimal ------------------------------------------------------------

def test_decimal_even():
    pts = J.decimal_split_points(4, Decimal(0), Decimal(100))
    assert pts[0] == 0 and pts[-1] == 100
    assert len(pts) == 5
    assert pts[2] == Decimal(50)


def test_decimal_one_null_raises():
    import pytest
    with pytest.raises(ValueError):
        J.decimal_splits("d", None, Decimal(5), 2)


# --- float (TestSplitters.java floatSplitter) ---------------------------

def test_float_splits_shape():
    s = J.float_splits("x", 0.0, 10.0, 4)
    assert len(s) == 4
    assert s[0].predicate == "x >= 0.0 AND x < 2.5"
    assert s[-1].predicate == "x >= 7.5 AND x <= 10.0"


def test_float_null_range():
    assert J.float_splits("x", None, None, 3) == \
        [J.Split("x IS NULL", "x IS NULL")]


# --- boolean (TestSplitters.java booleanSplitter) -----------------------

def test_boolean_both_values():
    s = J.boolean_splits("b", False, True)
    assert [x.predicate for x in s] == ["b = FALSE", "b = TRUE"]


def test_boolean_single_value():
    assert [x.predicate for x in J.boolean_splits("b", True, True)] == \
        ["b = TRUE"]
    assert [x.predicate for x in J.boolean_splits("b", False, False)] == \
        ["b = FALSE"]


def test_boolean_null():
    assert J.boolean_splits("b", None, None) == \
        [J.Split("b IS NULL", "b IS NULL")]


# --- date ---------------------------------------------------------------

def test_date_splits_render_quoted():
    s = J.date_splits("d", dt.date(2020, 1, 1), dt.date(2020, 1, 5), 2)
    assert s[0].lower == "d >= '2020-01-01'"
    assert s[-1].upper == "d <= '2020-01-05'"


def test_timestamp_splits_closed_last():
    lo = dt.datetime(2020, 1, 1, 0, 0, 0)
    hi = dt.datetime(2020, 1, 1, 12, 0, 0)
    s = J.date_splits("ts", lo, hi, 3)
    assert len(s) == 3
    assert s[-1].upper == f"ts <= '{hi}'"
    assert all(x.lower.startswith("ts >= '2020-01-01") for x in s)


def test_date_null_range():
    assert J.date_splits("d", None, None, 2) == \
        [J.Split("d IS NULL", "d IS NULL")]


# --- every split is a usable spark.read.jdbc predicate ------------------

def test_predicates_cover_range_without_overlap_integers():
    # Predicate semantics sanity: evaluate the generated clauses in
    # Python over a dense integer range — each value matches exactly one.
    s = J.integer_splits("v", 0, 95, 10)
    import re
    def matches(v, sp):
        def ok(cl):
            m = re.match(r"v (>=|<=|<|>) (-?\d+)", cl)
            op, b = m.group(1), int(m.group(2))
            return {" >=": v >= b, "<=": v <= b, "<": v < b, ">": v > b}[
                op if op != ">=" else " >="]
        return ok(sp.lower) and ok(sp.upper)
    for v in range(0, 96):
        assert sum(1 for sp in s if matches(v, sp)) == 1


# --- DBOutputFormat.constructQuery (TestDBOutputFormat.java) ------------

def test_construct_query():
    assert J.construct_insert_query("hadoop_output", ["id", "name", "value"]) \
        == "INSERT INTO hadoop_output (id,name,value) VALUES (?,?,?);"


def test_construct_query_null_fields():
    assert J.construct_insert_query("hadoop_output", [None, None, None]) \
        == "INSERT INTO hadoop_output VALUES (?,?,?);"


def test_construct_query_db2_oracle_no_semicolon():
    for prod in ("DB2", "ORACLE", "Oracle XE"):
        q = J.construct_insert_query("t", ["a", "b"], db_product=prod)
        assert q == "INSERT INTO t (a,b) VALUES (?,?)"


def test_construct_query_none_raises():
    import pytest
    with pytest.raises(ValueError):
        J.construct_insert_query("t", None)


def test_oracle_date_splits_render_to_timestamp():
    lo = dt.datetime(2020, 1, 1, 0, 0, 0)
    hi = dt.datetime(2020, 1, 2, 0, 0, 0)
    s = J.oracle_date_splits("d", lo, hi, 2)
    assert s[0].lower == \
        "d >= TO_TIMESTAMP('2020-01-01 00:00:00', 'YYYY-MM-DD HH24:MI:SS.FF')"
    assert s[-1].upper == \
        "d <= TO_TIMESTAMP('2020-01-02 00:00:00', 'YYYY-MM-DD HH24:MI:SS.FF')"


def test_oracle_date_null_split_untouched():
    assert J.oracle_date_splits("d", None, None, 2) == \
        [J.Split("d IS NULL", "d IS NULL")]


# --- property tests (hypothesis) ----------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 50),
       st.integers(-10**9, 10**9), st.integers(0, 10**6))
def test_integer_points_invariants(n, lo, span):
    hi = lo + span
    pts = J.integer_split_points(n, lo, hi)
    assert pts[0] == lo and pts[-1] == hi
    assert all(a <= b for a, b in zip(pts, pts[1:]))
    assert len(pts) >= 2


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=0xFFFF),
               max_size=8))
def test_text_roundtrip_within_8_chars(s):
    # NUL can't survive (position value 0 terminates decoding) and a
    # trailing NUL-like zero place is unrepresentable; restrict to >=1.
    assert J.decimal_to_string(J.string_to_decimal(s)) == s


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 20), st.integers(0, 1000), st.integers(1, 1000))
def test_integer_splits_partition_range(n, lo, span):
    hi = lo + span
    pts = J.integer_split_points(n, lo, hi)
    # consecutive boundary pairs tile [lo, hi] without gaps
    assert all(pts[i] <= pts[i + 1] for i in range(len(pts) - 1))
    assert pts[-2] <= hi
