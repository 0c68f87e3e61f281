"""ANN index CLI: build writes a cell-partitioned index + manifest; a
probe reads only the probed cells (partition pruning) and returns the
same neighbors as the direct IVF operator with the same codebook."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from ann_index import build, query  # noqa: E402


def test_ann_index_build_and_probe(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "index")
    b = build(spark, sf_dir, idx, n_cells=8)
    assert b["n_vectors"] == spark.read.parquet(
        f"{sf_dir}/embeddings.parquet").count()
    # layout: one subdir per non-empty cell, plus the manifest
    cells = [d for d in os.listdir(os.path.join(idx, "vectors"))
             if d.startswith("cell=")]
    assert 1 <= len(cells) <= 8
    manifest = json.load(open(os.path.join(idx, "manifest.json")))
    assert len(manifest["centroids"]) == 8

    q = query(spark, idx, k=3, nprobe=2, n_queries=4)
    assert q["cells_probed"] and len(q["cells_probed"]) <= 8
    per_query = {}
    for r in q["results"]:
        per_query.setdefault(r["q_id"], []).append(r)
    assert set(per_query) == {r["q_id"] for r in q["results"]}
    for rows in per_query.values():
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        sims = [r["cos_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)

    # parity with the direct operator on the SAME saved codebook
    from pyspark.sql import functions as F

    from hops_spark.ops.similarity import knn_ivf
    cents = [(int(c), [float(x) for x in v])
             for c, v in manifest["centroids"]]
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    panel = (emb.orderBy("vec_id").limit(4)
                .select(F.col("vec_id").alias("q_id"),
                        F.col("embedding").alias("q_vec")))
    direct = knn_ivf(emb, panel, k=3, n_cells=8, nprobe=2, centroids=cents)
    want = {(r["q_id"], r["rnk"]): r["neighbor_id"]
            for r in direct.collect()}
    got = {(r["q_id"], r["rnk"]): r["neighbor_id"] for r in q["results"]}
    assert got == want
