#!/usr/bin/env python
"""NNThroughputBenchmark parity: metadata ops/sec over the catalog.

The reference ships a metadata-ops microbenchmark without stored results
(hadoop-hdfs-project/hadoop-hdfs/src/test/java/.../NNThroughputBenchmark.java:
112,557-881 — ops `create mkdirs open delete fileStatus rename blockReport`).
This tool is the engine-side analog: it times the §2.11 metadata queries
(listing / fileStatus point lookup / batched lookup / glob / du /
blockReport) against the inode catalog derived from the documents fixture
and prints one JSON line of ops/sec per op.

Usage: python tools/nn_throughput.py [sf_dir] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hops_spark.catalog import metastore as ms
from hops_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    reps = 20
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1]) if "=" in a else reps

    spark = get_spark()
    inodes = ms.inodes_from_documents(spark, sf_dir).cache()
    inodes.count()  # materialize once; NN state is resident in the reference too
    blocks = ms.blocks_from_inodes(inodes)
    parents = [r[0] for r in
               inodes.select("parent").distinct().orderBy("parent").collect()]
    keys = inodes.select("parent", "name").limit(64)

    ops = {
        "fileStatus": lambda i: ms.file_info(
            inodes, parents[i % len(parents)], f"doc_{i}").count(),
        "listing": lambda i: ms.listing(inodes, parents[i % len(parents)]).count(),
        "batchedLookup": lambda i: ms.batched_lookup(inodes, keys).count(),
        "glob": lambda i: ms.glob_status(inodes, "doc_1*").count(),
        "contentSummary": lambda i: ms.content_summary(inodes).count(),
        "blockReport": lambda i: blocks.groupBy("inode_id").count().count(),
        # mutation ops (reference `delete` / `rename` rows): plan + count
        # the post-state, matching the read-op methodology
        "subtreeDelete": lambda i: ms.subtree_delete(
            inodes, parents[i % len(parents)], batch=100)[0].count(),
        "subtreeRename": lambda i: ms.subtree_rename(
            inodes, parents[i % len(parents)],
            f"archive/p{i}", batch=100)[0].count(),
    }
    result = {}
    for name, fn in ops.items():
        fn(0)  # warm (plan + codegen)
        t0 = time.perf_counter()
        for i in range(reps):
            fn(i)
        dt = time.perf_counter() - t0
        result[name] = round(reps / dt, 2)

    print(json.dumps({"metric": "metadata_ops_per_sec", "sf_dir": sf_dir,
                      "reps": reps, "ops": result}))
    spark.stop()


if __name__ == "__main__":
    main()
