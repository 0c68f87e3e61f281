"""Scale-up fixture generator: synthesize an sfN directory as a
deterministic k-fold replication of an existing testdata directory.

/root/testdata is read-only and tops out at sf0.1; the bench needs a
10x datapoint to turn the "plans scale near-linearly" argument into a
measured curve (SCALE.md). Replication preserves every distribution and
FK relationship exactly (TPC-H-style: facts and their referenced
dimension keys scale together; region/nation stay fixed) while
DECORRELATING the similarity surfaces so pair-producing operators see k
times the data, not k-fold planted duplicates:

- documents: every word of copy i>0 is salted with the copy index
  (disjoint shingle sets per copy; length distribution preserved
  modulo the 2-char suffix, n_chars recomputed).
- embeddings: copy i's vector is rotated by i positions (same norm and
  component distribution, decorrelated directions).
- events keep their timestamps: a 10x cluster sees 10x the events per
  window, which is exactly the scale-up being modeled.

Usage:
    python tools/make_sf.py SRC_DIR DST_DIR [k]      # default k=10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from hops_spark.io.readers import load_table
from hops_spark.session import get_spark


def _stride(df: DataFrame, key: str) -> int:
    return int(df.agg(F.max(key)).collect()[0][0]) + 1


def _replicate(df: DataFrame, k: int, shifts: dict[str, int],
               mutate=None) -> DataFrame:
    """Union of k copies; copy i shifts each key column by i*stride and
    applies mutate(df, i) for the decorrelation columns."""
    parts = []
    for i in range(k):
        c = df
        for col, stride in shifts.items():
            c = c.withColumn(col, (F.col(col) + i * stride)
                             .cast(df.schema[col].dataType))
        if mutate is not None:
            c = mutate(c, i)
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    spark = get_spark("make-sf")
    t0 = time.time()

    tbl = {n: load_table(spark, src, n) for n in
           ("region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings")}
    ck = _stride(tbl["customer"], "c_custkey")
    sk = _stride(tbl["supplier"], "s_suppkey")
    pk = _stride(tbl["part"], "p_partkey")
    ok = _stride(tbl["orders"], "o_orderkey")
    ek = _stride(tbl["events"], "event_id")
    uk = _stride(tbl["events"], "user_id")
    dk = _stride(tbl["documents"], "doc_id")
    vk = _stride(tbl["embeddings"], "vec_id")

    def mut_docs(df, i):
        if i == 0:
            return df
        salted = F.array_join(
            F.transform(F.split("text", " "),
                        lambda w: F.concat(w, F.lit(f"{i}"))), " ")
        return (df.withColumn("text", salted)
                  .withColumn("n_chars", F.length("text").cast("long")))

    def mut_emb(df, i):
        if i == 0:
            return df
        # derive the rotation length from the actual vector size —
        # a hardcoded 64 silently truncates if the fixture dim changes
        dim = F.size("embedding")
        rot = F.concat(F.slice("embedding", i + 1, dim - F.lit(i)),
                       F.slice("embedding", 1, i))
        return df.withColumn("embedding", rot)

    plans = {
        "region": tbl["region"],
        "nation": tbl["nation"],
        "customer": _replicate(tbl["customer"], k, {"c_custkey": ck}),
        "supplier": _replicate(tbl["supplier"], k, {"s_suppkey": sk}),
        "part": _replicate(tbl["part"], k, {"p_partkey": pk}),
        "orders": _replicate(tbl["orders"], k,
                             {"o_orderkey": ok, "o_custkey": ck}),
        "lineitem": _replicate(tbl["lineitem"], k,
                               {"l_orderkey": ok, "l_partkey": pk,
                                "l_suppkey": sk}),
        "events": _replicate(tbl["events"], k,
                             {"event_id": ek, "user_id": uk}),
        "documents": _replicate(tbl["documents"], k, {"doc_id": dk},
                                mutate=mut_docs),
        "embeddings": _replicate(tbl["embeddings"], k, {"vec_id": vk},
                                 mutate=mut_emb),
    }
    report = {}
    for name, df in plans.items():
        out = os.path.join(dst, f"{name}.parquet")
        df.write.mode("overwrite").parquet(out)
        report[name] = spark.read.parquet(out).count()
    print(json.dumps({"job": "make_sf", "src": src, "dst": dst, "k": k,
                      "rows": report, "sec": round(time.time() - t0, 1)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
