"""Fast construction of large literal arrays (codebooks, weight
vectors, centroid matrices).

``F.lit(nested_python_list)`` converts element-by-element through
py4j: a 16x64 double codebook costs ~0.5-1.0 s of driver time PER
CALL, and the IVF/PQ family builds several such literals per query —
measured as the dominant *plan-construction* cost of every
codebook-shaped query at sf0.1 (optimization r12, guide §1: the time
was going to neither scan nor shuffle but to building the plan).

``lit_array`` renders the same literal as ONE SQL expression string
(`array(array(1.5D, ...), ...)`) parsed JVM-side in ~3 ms — 200x
faster, and value-identical:

- doubles are rendered with ``repr(float(x))``, the shortest
  round-trip decimal form; Spark's SQL parser converts decimal
  strings to doubles with correct rounding, so the parsed IEEE double
  equals the Python float bit-for-bit (asserted in
  tests/test_round12_fixes.py). Non-finite values are rejected —
  codebooks are data-derived and finite by construction.
- longs render exactly as ``<n>L``.
- empty arrays at any depth carry an explicit element-type CAST so
  the literal's type matches what ``F.lit`` would have produced.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _render(v, dtype: str) -> str:
    if isinstance(v, (list, tuple)):
        if not v:
            return None  # handled by caller (needs a typed cast)
        parts = [_render(x, dtype) for x in v]
        if any(p is None for p in parts):
            # empty sub-array inside: rebuild with per-element casts
            depth = _depth(v[0]) if v else 0
            typed = [p if p is not None
                     else f"CAST(array() AS {_sql_type(dtype, depth)})"
                     for p in parts]
            return f"array({','.join(typed)})"
        return f"array({','.join(parts)})"
    if dtype == "double":
        f = float(v)
        if not math.isfinite(f):
            raise ValueError(f"non-finite literal: {v!r}")
        return f"{f!r}D"
    if dtype == "long":
        return f"{int(v)}L"
    if dtype == "int":
        return str(int(v))
    raise ValueError(f"unsupported dtype: {dtype}")


def _depth(v) -> int:
    d = 0
    while isinstance(v, (list, tuple)):
        d += 1
        v = v[0] if v else None
    return d


def _sql_type(dtype: str, depth: int) -> str:
    base = {"double": "DOUBLE", "long": "BIGINT", "int": "INT"}[dtype]
    t = base
    for _ in range(depth):
        t = f"ARRAY<{t}>"
    return t


def lit_array(values, dtype: str = "double") -> Column:
    """One literal Column for a (possibly nested) list of numbers,
    built as a single SQL expression instead of per-element py4j
    calls. ``dtype``: 'double' | 'long' | 'int' (the leaf type)."""
    if not isinstance(values, (list, tuple)):
        raise TypeError("lit_array expects a list/tuple")
    if not values:
        return F.expr(f"CAST(array() AS {_sql_type(dtype, 1)})")
    rendered = _render(list(values), dtype)
    if rendered is None:
        return F.expr(f"CAST(array() AS {_sql_type(dtype, 1)})")
    return F.expr(rendered)


def lit_struct_rows(rows, fields) -> Column:
    """Literal array<struct<...>> for a SMALL row list (bounded by
    construction — domain tables, schedules; the codebook idiom).
    ``fields``: [(name, 'long'|'int'|'string'), ...]. Rendered as one
    SQL named_struct array — same exactness contract as lit_array;
    strings are single-quote-escaped."""
    def fmt(v, t):
        if t == "long":
            return f"{int(v)}L"
        if t == "int":
            return str(int(v))
        if t == "string":
            s = str(v).replace("\\", "\\\\").replace("'", "\\'")
            return f"'{s}'"
        raise ValueError(f"unsupported field type: {t}")

    structs = ",".join(
        "named_struct(" + ",".join(f"'{n}',{fmt(r[n], t)}"
                                   for n, t in fields) + ")"
        for r in rows)
    return F.expr(f"array({structs})")


def df_from_rows(spark, rows, fields):
    """Small literal DataFrame from ``rows`` via one parsed expression
    (a local createDataFrame costs seconds of driver round-trips — the
    pi_bbp finding; range+explode of a literal array is ~ms)."""
    sql_types = {"long": "bigint", "int": "int", "string": "string"}
    schema = ", ".join(f"{n} {sql_types[t]}" for n, t in fields)
    if not rows:
        return spark.createDataFrame([], schema)
    return (spark.range(1)
                 .select(F.explode(lit_struct_rows(rows, fields))
                          .alias("_r"))
                 .select("_r.*"))
