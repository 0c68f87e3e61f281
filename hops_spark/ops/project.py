"""Projection / row-transform operators (SURVEY.md §2.2, §2.7).

Reference mappers re-expressed as Column expressions (all JVM-side,
whole-stage-codegen'd — no Python in the hot path):

- InverseMapper.java:30       → ``inverse``
- RegexMapper.java:36         → ``regex_extract_rows`` (grep)
- TokenCounterMapper.java:35  → ``tokenize`` (wordcount's map side)
- FieldSelectionMapper.java:61 + FieldSelectionHelper (unix-cut spec
  language like ``3-5,7:0-``) → ``parse_field_spec`` / ``field_select``
- ChainMapper/ChainReducer (Chain.java) → plain function composition;
  Catalyst fuses narrow chains into one codegen stage, which is the
  whole point of the reference's operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def inverse(df: DataFrame, key: str = "key", value: str = "value") -> DataFrame:
    """(k,v) → (v,k)."""
    return df.select(F.col(value).alias(key), F.col(key).alias(value))


def tokenize(df: DataFrame, text_col: str, out: str = "token",
             pattern: str = r"\s+") -> DataFrame:
    """TokenCounterMapper's map side: one output row per token."""
    return (df.select(F.explode(F.split(F.col(text_col), pattern)).alias(out))
              .filter(F.col(out) != ""))


def regex_extract_rows(df: DataFrame, text_col: str, pattern: str, group: int = 0,
                       out: str = "match") -> DataFrame:
    """RegexMapper: emit every match of `pattern` (capture `group`) as a
    row — the map side of the Grep example (examples/Grep.java:55-57)."""
    return (df.select(F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(group)))
              .alias(out))
              .filter(F.col(out) != ""))


# --- FieldSelection spec language -------------------------------------------
# Reference doc (FieldSelectionMapper.java:34-52): spec is a comma list of
# ranges over 0-based fields: "N" one field, "N-M" closed range, "N-" open
# range to end. A key spec and value spec are separated by ":".

def parse_field_spec(spec: str) -> list[tuple[int, int | None]]:
    """Parse "2,3-5,7-" → [(2,2),(3,5),(7,None)] (None = to end)."""
    out: list[tuple[int, int | None]] = []
    if not spec:
        return out
    for piece in spec.split(","):
        piece = piece.strip()
        if not piece:
            continue
        if "-" in piece:
            lo, hi = piece.split("-", 1)
            out.append((int(lo), int(hi) if hi else None))
        else:
            out.append((int(piece), int(piece)))
    return out


def _spec_cols(fields: Column, spec: str) -> Column:
    """Build an array Column of the selected fields (0-based spec over a
    split-array), concatenated later with the separator."""
    parts: list[Column] = []
    for lo, hi in parse_field_spec(spec):
        if hi is None:
            # slice to end: slice(arr, lo+1, size-lo)
            parts.append(F.slice(fields, lo + 1, F.greatest(F.size(fields) - lo, F.lit(0))))
        elif hi >= lo:
            parts.append(F.slice(fields, lo + 1, hi - lo + 1))
        # inverted range ("4-2") selects nothing — python-slice semantics;
        # a negative slice length would throw at runtime
    if not parts:
        return F.array()
    return F.concat(*parts)


def field_select(df: DataFrame, text_col: str, key_spec: str, value_spec: str = "",
                 sep: str = "\t") -> DataFrame:
    """FieldSelectionMapper: split each line on `sep`, project key fields
    and value fields per spec, re-join with `sep`. Output columns
    (key, value) like the reference's (Text, Text)."""
    fields = F.split(F.col(text_col), sep)
    return df.select(
        F.concat_ws(sep, _spec_cols(fields, key_spec)).alias("key"),
        F.concat_ws(sep, _spec_cols(fields, value_spec)).alias("value"),
    )
