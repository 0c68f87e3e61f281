"""JDBC range-partitioned ingest (DBInputFormat / DataDrivenDBInputFormat).

Reference: mapreduce/lib/db/DataDrivenDBInputFormat.java:61 computes
min/max of a split column, then a type-specific DBSplitter turns the
range into per-task WHERE clauses; reference splitters:
IntegerSplitter.java, BigDecimalSplitter.java, TextSplitter.java,
DateSplitter.java, FloatSplitter.java, BooleanSplitter.java (tests:
jobclient/.../db/TestIntegerSplitter.java, TestTextSplitter.java).

Spark realization: the splitters are PURE functions emitting
``Split(lower, upper)`` predicate pairs; feed ``predicates(splits)``
straight into ``spark.read.jdbc(url, table, predicates=...)`` — Spark
runs one partition per predicate, which is exactly the reference's
one-map-per-split contract. Numeric/date columns can use Spark's
built-in (column, lowerBound, upperBound, numPartitions) fast path;
these splitters add what Spark lacks: text and boolean split columns,
NULL-split handling, and the reference's exact boundary semantics
(closed last interval, split-size floor of 1, common-prefix text
interpolation in base 65536).

No database ships in this container, so everything here is unit-tested
against the reference's split semantics without a live endpoint
(the reference tests the same logic the same way).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from decimal import ROUND_HALF_UP, Decimal, localcontext

__all__ = [
    "Split", "predicates", "integer_split_points", "integer_splits",
    "decimal_split_points", "decimal_splits", "float_splits",
    "boolean_splits", "date_splits", "oracle_date_splits",
    "text_split_points", "text_splits",
    "string_to_decimal", "decimal_to_string", "construct_insert_query",
    "read_jdbc_partitioned",
]

# BigDecimalSplitter.MIN_INCREMENT = 10000 * Double.MIN_VALUE
_MIN_INCREMENT = Decimal(10000) * Decimal(5e-324)
_ONE_PLACE = Decimal(65536)   # TextSplitter: one base-65536 "digit"
_MAX_CHARS = 8                # TextSplitter.MAX_CHARS
# 1/65536^8 = 2^-128 is a finite decimal with 128 fractional digits, so
# 250 significant digits keep every base-65536 digit-place division
# EXACT (Java BigDecimal divides these exactly too — powers of two).
_PREC = 250


@dataclass(frozen=True)
class Split:
    """One per-task range: a (lower, upper) WHERE-clause pair."""
    lower: str
    upper: str

    @property
    def predicate(self) -> str:
        """Full WHERE string for spark.read.jdbc(predicates=[...])."""
        if self.lower == self.upper:
            return self.lower          # IS NULL / = TRUE style singleton
        return f"{self.lower} AND {self.upper}"


def predicates(splits: list[Split]) -> list[str]:
    return [s.predicate for s in splits]


def _null_split(col: str) -> Split:
    return Split(f"{col} IS NULL", f"{col} IS NULL")


def _intervals(col: str, points: list[str]) -> list[Split]:
    """Boundary list → half-open intervals, closed on the last one."""
    out = []
    for i in range(1, len(points)):
        lo, hi = points[i - 1], points[i]
        if i == len(points) - 1:
            out.append(Split(f"{col} >= {lo}", f"{col} <= {hi}"))
        else:
            out.append(Split(f"{col} >= {lo}", f"{col} < {hi}"))
    return out


# --- integer ------------------------------------------------------------

def integer_split_points(num_splits: int, min_val: int, max_val: int) -> list[int]:
    """Boundaries, one element longer than the split count; e.g.
    [0, 5, 8, 12, 18] → [0,5) [5,8) [8,12) [12,18]. Split size floors at
    1 so over-asked ranges degrade to one-value-per-split."""
    num_splits = max(num_splits, 1)
    size = max((max_val - min_val) // num_splits, 1)
    points = []
    cur = min_val
    while cur <= max_val:
        points.append(cur)
        cur += size
    if points[-1] != max_val or len(points) == 1:
        points.append(max_val)
    return points


def integer_splits(col: str, min_val: int | None, max_val: int | None,
                   num_splits: int) -> list[Split]:
    if min_val is None and max_val is None:
        return [_null_split(col)]
    lo = 0 if min_val is None else min_val      # JDBC getLong(NULL) == 0
    hi = 0 if max_val is None else max_val
    pts = integer_split_points(num_splits, lo, hi)
    out = _intervals(col, [str(p) for p in pts])
    if min_val is None or max_val is None:
        out.append(_null_split(col))
    return out


# --- decimal ------------------------------------------------------------

def decimal_split_points(num_splits: int, min_val: Decimal,
                         max_val: Decimal) -> list[Decimal]:
    with localcontext() as ctx:
        ctx.prec = _PREC
        ctx.rounding = ROUND_HALF_UP
        size = (max_val - min_val) / Decimal(max(num_splits, 1))
        if size < _MIN_INCREMENT:
            size = _MIN_INCREMENT
        points = []
        cur = min_val
        while cur <= max_val:
            points.append(cur)
            cur = cur + size
        if points[-1] != max_val or len(points) == 1:
            points.append(max_val)
        return points


def decimal_splits(col: str, min_val: Decimal | None, max_val: Decimal | None,
                   num_splits: int) -> list[Split]:
    if min_val is None and max_val is None:
        return [_null_split(col)]
    if min_val is None or max_val is None:
        # Reference refuses to interpolate from a single extremum.
        raise ValueError("NUMERIC/DECIMAL range with one end NULL")
    pts = decimal_split_points(num_splits, min_val, max_val)
    return _intervals(col, [str(p.normalize()) for p in pts])


# --- float --------------------------------------------------------------

def float_splits(col: str, min_val: float | None, max_val: float | None,
                 num_splits: int) -> list[Split]:
    if min_val is None and max_val is None:
        return [_null_split(col)]
    lo = 0.0 if min_val is None else min_val
    hi = 0.0 if max_val is None else max_val
    size = max((hi - lo) / max(num_splits, 1), float(_MIN_INCREMENT))
    out: list[Split] = []
    cur_lo, cur_hi = lo, lo + size
    while cur_hi < hi:
        out.append(Split(f"{col} >= {cur_lo}", f"{col} < {cur_hi}"))
        cur_lo, cur_hi = cur_hi, cur_hi + size
    if cur_lo <= hi or len(out) == 1:
        out.append(Split(f"{col} >= {cur_lo}", f"{col} <= {hi}"))
    if min_val is None or max_val is None:
        out.append(_null_split(col))
    return out


# --- boolean ------------------------------------------------------------

def boolean_splits(col: str, min_val: bool | None,
                   max_val: bool | None) -> list[Split]:
    if min_val is None and max_val is None:
        return [_null_split(col)]
    out = []
    if not (min_val or False):
        out.append(Split(f"{col} = FALSE", f"{col} = FALSE"))
    if max_val or False:
        out.append(Split(f"{col} = TRUE", f"{col} = TRUE"))
    if min_val is None or max_val is None:
        out.append(_null_split(col))
    return out


# --- date / timestamp ---------------------------------------------------

def _to_epoch_ms(v: _dt.date | _dt.datetime) -> int:
    if isinstance(v, _dt.datetime):
        return int(v.timestamp() * 1000)
    return int(_dt.datetime.combine(v, _dt.time()).timestamp() * 1000)


def _from_epoch_ms(ms: int, as_date: bool) -> str:
    dt = _dt.datetime.fromtimestamp(ms / 1000.0)
    return f"'{dt.date()}'" if as_date else f"'{dt}'"


def date_splits(col: str, min_val: _dt.date | _dt.datetime | None,
                max_val: _dt.date | _dt.datetime | None,
                num_splits: int) -> list[Split]:
    """Date/time ranges reuse the integer boundary walk over epoch
    millis (DateSplitter extends IntegerSplitter), rendered back as
    quoted SQL literals."""
    if min_val is None and max_val is None:
        return [_null_split(col)]
    if min_val is None or max_val is None:
        raise ValueError("date range with one end NULL")
    as_date = not isinstance(min_val, _dt.datetime)
    pts = integer_split_points(num_splits, _to_epoch_ms(min_val),
                               _to_epoch_ms(max_val))
    return _intervals(col, [_from_epoch_ms(p, as_date) for p in pts])


def oracle_date_splits(col: str, min_val: _dt.date | _dt.datetime | None,
                       max_val: _dt.date | _dt.datetime | None,
                       num_splits: int) -> list[Split]:
    """Oracle dialect (OracleDateSplitter.java:38): same boundary walk,
    literals rendered as TO_TIMESTAMP('…', 'YYYY-MM-DD HH24:MI:SS.FF')."""
    base = date_splits(col, min_val, max_val, num_splits)

    def wrap(clause: str) -> str:
        if "'" not in clause:
            return clause                      # IS NULL split
        head, lit = clause.split("'", 1)
        return (head + "TO_TIMESTAMP('" + lit.rstrip("'")
                + "', 'YYYY-MM-DD HH24:MI:SS.FF')")

    return [Split(wrap(s.lower), wrap(s.upper)) for s in base]


# --- text ---------------------------------------------------------------

def string_to_decimal(s: str) -> Decimal:
    """Interpret the first 8 chars as base-65536 digits of a fraction in
    [0, 1): 'abc' → a/65536 + b/65536² + c/65536³."""
    with localcontext() as ctx:
        ctx.prec = _PREC
        result = Decimal(0)
        place = _ONE_PLACE
        for ch in s[:_MAX_CHARS]:
            result += Decimal(ord(ch)) / place
            place *= _ONE_PLACE
        return result


def decimal_to_string(d: Decimal) -> str:
    """Inverse of string_to_decimal: peel base-65536 digits back off."""
    with localcontext() as ctx:
        ctx.prec = _PREC
        cur = d
        out = []
        for _ in range(_MAX_CHARS):
            cur = cur * _ONE_PLACE
            code = int(cur)
            if code == 0:
                break
            cur -= Decimal(code)
            out.append(chr(code))
        return "".join(out)


def text_split_points(num_splits: int, min_str: str, max_str: str,
                      common_prefix: str = "") -> list[str]:
    """Split-point strings between min_str and max_str (exclusive of the
    shared prefix, which the caller factored out): map to base-65536
    fractions, interpolate with the decimal splitter, map back. The
    user-provided endpoints are pinned first/last."""
    pts = decimal_split_points(num_splits, string_to_decimal(min_str),
                               string_to_decimal(max_str))
    out = [common_prefix + decimal_to_string(p) for p in pts]
    if not out or out[0] != common_prefix + min_str:
        out.insert(0, common_prefix + min_str)
    if len(out) == 1 or out[-1] != common_prefix + max_str:
        out.append(common_prefix + max_str)
    return out


def text_splits(col: str, min_str: str | None, max_str: str | None,
                num_splits: int) -> list[Split]:
    min_is_null = min_str is None
    if min_is_null:
        min_str = ""
    if max_str is None:
        return [_null_split(col)]
    # Factor out the common prefix so interpolation spends its 8-char
    # precision budget on the part that differs.
    shared = 0
    while (shared < min(len(min_str), len(max_str))
           and min_str[shared] == max_str[shared]):
        shared += 1
    pts = text_split_points(num_splits, min_str[shared:], max_str[shared:],
                            min_str[:shared])
    quoted = [f"'{p}'" for p in pts]
    out = []
    for i in range(1, len(quoted)):
        lo, hi = quoted[i - 1], quoted[i]
        if i == len(quoted) - 1:
            out.append(Split(f"{col} >= {lo}", f"{col} <= {hi}"))
        else:
            out.append(Split(f"{col} >= {lo}", f"{col} < {hi}"))
    if min_is_null:
        out.append(_null_split(col))
    return out


# --- output (DBOutputFormat) --------------------------------------------

def construct_insert_query(table: str, field_names: list[str | None],
                           db_product: str = "MYSQL") -> str:
    """DBOutputFormat.constructQuery parity (DBOutputFormat.java:139,
    tested by jobclient TestDBOutputFormat.java): parameterized INSERT;
    the column list is omitted when field names are unknown (all-None),
    and DB2/Oracle drop the trailing semicolon.

    Spark mapping note: ``df.write.jdbc(url, table, mode="append")`` is
    the engine-native sink (batched parameterized INSERTs per
    partition); this builder exists for parity and for callers driving
    their own connection pool."""
    if field_names is None:
        raise ValueError("field names may not be None")
    cols = ""
    if field_names and field_names[0] is not None:
        cols = " (" + ",".join(field_names) + ")"
    marks = ",".join("?" for _ in field_names)
    tail = ")" if db_product.upper().startswith(("DB2", "ORACLE")) else ");"
    return f"INSERT INTO {table}{cols} VALUES ({marks}{tail}"


# --- Spark wiring -------------------------------------------------------

def read_jdbc_partitioned(spark, url: str, table: str, splits: list[Split],
                          **options):
    """One Spark partition per Split — the DataDrivenDBInputFormat
    contract on spark.read.jdbc. (No JDBC endpoint ships in this
    container; covered by the pure-splitter unit tests.)"""
    return spark.read.jdbc(url, table, predicates=predicates(splits),
                           properties=options)
