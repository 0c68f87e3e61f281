"""CompositeInputFormat join expression language (SURVEY.md §2.3).

The reference wires N-ary map-side joins from a string expression
(mapreduce/lib/join/CompositeInputFormat.java:56,93-96; grammar parser
Parser.java:75):

    inner(tbl(seqfile, "/a"), tbl(seqfile, "/b"))
    outer(override(tbl(...), tbl(...)), tbl(...))

with user-definable operations registered under
``mapreduce.join.define.<ident>``. This module re-expresses the same
language over DataFrames:

    expr    := ident '(' expr (',' expr)* ')' | tbl
    tbl     := 'tbl' '(' format ',' path ')'
    ident   := 'inner' | 'outer' | 'override' | user-defined

Each expression evaluates to a DataFrame keyed on ``key``; composite
results feed parent composites exactly like the reference's
TupleWritable streams. Physical strategy (sort-merge vs broadcast) is
Catalyst's choice — the reference's "identically sorted+partitioned
inputs" precondition maps to bucketed tables, not a parser concern.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hops_spark.ops.join import inner_join, outer_join, override_rows

JoinOp = Callable[[str, "list[DataFrame]"], DataFrame]

_OPS: dict[str, JoinOp] = {
    "inner": lambda key, dfs: inner_join(key, *dfs),
    "outer": lambda key, dfs: outer_join(key, *dfs),
    "override": lambda key, dfs: override_rows(key, *dfs),
}


def define(ident: str, fn: JoinOp) -> None:
    """User-defined composite op — the ``mapreduce.join.define.<ident>``
    analog (CompositeInputFormat.java:93-96). ``fn(key, dfs) -> DataFrame``."""
    if ident == "tbl":
        raise ValueError("'tbl' is reserved")
    _OPS[ident] = fn


_TOKEN = re.compile(r"""\s*(?:(?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
                            |(?P<str>"[^"]*"|'[^']*')
                            |(?P<punct>[(),]))""", re.X)


def _tokenize(expr: str) -> list[str]:
    out, pos = [], 0
    while pos < len(expr):
        m = _TOKEN.match(expr, pos)
        if not m:
            if expr[pos:].strip():
                raise ValueError(f"bad token at: {expr[pos:pos + 20]!r}")
            break
        out.append(m.group("ident") or m.group("str") or m.group("punct"))
        pos = m.end()
    return out


class _Parser:
    def __init__(self, spark: SparkSession, tokens: list[str], key: str):
        self.spark, self.toks, self.key, self.i = spark, tokens, key, 0

    def _peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> str:
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of expression")
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expect(self, t: str) -> None:
        got = self._next()
        if got != t:
            raise ValueError(f"expected {t!r}, got {got!r}")

    def parse(self) -> DataFrame:
        df = self._expr()
        if self._peek() is not None:
            raise ValueError(f"trailing input: {self.toks[self.i:]}")
        return df

    def _expr(self) -> DataFrame:
        ident = self._next()
        self._expect("(")
        if ident == "tbl":
            fmt = self._next().strip("\"'")
            self._expect(",")
            path = self._next().strip("\"'")
            self._expect(")")
            return self.spark.read.format(fmt).load(path)
        if ident not in _OPS:
            raise ValueError(f"unknown join op {ident!r} "
                             f"(built-ins: {sorted(_OPS)}; add with define())")
        args = [self._expr()]
        while self._peek() == ",":
            self._next()
            args.append(self._expr())
        self._expect(")")
        return _OPS[ident](self.key, args)


def join_expr(spark: SparkSession, expr: str, key: str = "key") -> DataFrame:
    """Evaluate a composite-join expression to a DataFrame plan.

    >>> join_expr(spark, 'outer(inner(tbl(parquet,"/a"), tbl(parquet,"/b")), '
    ...                  'tbl(parquet,"/c"))', key='k')
    """
    return _Parser(spark, _tokenize(expr), key).parse()
