"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle at a given SF, compare row count,
column names, and order-insensitive value hash.

Usage:
    python tools/check_oracle.py [sf_dir] [query ...]

Comparison: columns sorted by name; rows sorted; floats rounded to 9
significant-ish decimals before hashing (the queries themselves round
their outputs, so this only absorbs 1-ulp engine noise).

Type-strict: the driver's value hasher distinguishes column types, so a
DuckDB integer ``sum()`` (HUGEINT/int128) hash-mismatches a Spark bigint
even when the values are equal. We therefore compare the DuckDB result
column types against the Spark schema and fail on any numeric drift —
the oracle SQL must ``CAST(sum(...) AS BIGINT)`` explicitly.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from hops_spark.io.readers import TABLES
from hops_spark.registry import load_all
from hops_spark.session import get_spark


# Spark simpleString dtype -> acceptable DuckDB type strings, mirroring
# the driver's pandas canonicalization: all <=64-bit integers coerce to
# equal-printing values, so they form one class — but DuckDB HUGEINT
# (integer sum()) leaves the class (pandas object/float) and hash-fails
# even when values match (r1: q12, value_aggregator_job, json_extract).
# Cross-class (int vs float) also fails: "1" != "1.0".
_INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
         "UTINYINT", "USMALLINT", "UINTEGER"}
_TYPE_MAP = {
    "bigint": _INTS,
    "int": _INTS,
    "smallint": _INTS,
    "tinyint": _INTS,
    "double": {"DOUBLE"},
    "float": {"FLOAT", "DOUBLE"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP", "TIMESTAMP_NS"},
    "binary": {"BLOB"},
}


def type_problems(sdf, d_cols, d_types):
    """Compare Spark schema with DuckDB result types; return mismatch strings."""
    spark_types = dict(sdf.dtypes)
    probs = []
    for col, dt in zip(d_cols, d_types):
        st = spark_types.get(col)
        if st is None:
            continue  # column-set mismatch reported separately
        duck = str(dt).upper()
        allowed = _TYPE_MAP.get(st)
        if allowed is None:
            # decimal(p,s) must match exactly; nested types are lenient
            if st.startswith("decimal"):
                if duck != st.upper():
                    probs.append(f"{col}: spark {st} vs duck {duck}")
            continue
        if duck not in allowed:
            probs.append(f"{col}: spark {st} vs duck {duck}")
    return probs


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        try:
            return v.isoformat(sep=" ")   # datetime
        except TypeError:
            return v.isoformat()          # date
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("--window", "--queue")]
    window_only = "--window" in sys.argv
    queue_only = "--queue" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    specs = load_all()
    if window_only:
        # replicate the driver's scope: first 50 registry entries only
        specs = dict(list(specs.items())[:50])
    elif queue_only:
        # the post-rotation additions queued for the NEXT driver window
        from hops_spark.registry import NEXT_WINDOW_QUEUE
        specs = {n: specs[n] for n in NEXT_WINDOW_QUEUE if n in specs}
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_skip = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        nested = [c for c, t in sdf.dtypes
                  if t.startswith(("array<", "map<", "struct<", "decimal"))]
        if nested:
            # The driver's pandas canonicalizer crashes on unhashable
            # list/dict cells — registered outputs must be scalar — and
            # coerces DuckDB DECIMAL to float64 while Spark keeps
            # decimal.Decimal, splitting the hash on every
            # scale-trailing-zero value (r7 avro_evolution). Emit
            # BIGINT cents/ppm or round(x, 2) doubles instead.
            print(f"FAIL {name}: banned output column types {nested} "
                  f"(driver canonicalizer breaks on these)")
            n_fail += 1
            continue
        if spec.sql is None:
            print(f"SKIP {name}: rows-only ({len(s_rows)} rows, "
                  f"{time.time() - t0:.1f}s)")
            n_skip += 1
            continue
        try:
            d = con.sql(spec.sql)
            d_cols = [c[0] for c in d.description]
            d_types = list(d.types)
            d_rows = d.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        problems += ["type " + p for p in type_problems(sdf, d_cols, d_types)]
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            cs = canon([tuple(r) for r in s_rows], s_cols)
            cd = canon(d_rows, d_cols)
            if cs != cd:
                diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows, {time.time() - t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
