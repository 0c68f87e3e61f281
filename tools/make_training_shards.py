"""Corpus → training shards: the serving end of the pipeline, composed
from the registered operators. Consumes `tools/clean_corpus.py` output
(or any parquet with doc_id/text/split) and writes packed, sharded
training sequences.

    python tools/make_training_shards.py CLEAN_DIR OUT_DIR \
        [--merges 16] [--chunk 128] [--overlap 16] [--budget 512]

Stages (scale shape in parens):
  1. BPE train    — learn merges ON THE TRAIN SPLIT ONLY (no tokenizer
                    leakage from val/test; one corpus aggregate +
                    vocab-bounded merge loop, ops/bpe.bpe_train)
  2. tokenize     — replay merges over every split (map-only chained
                    replaces, ops/bpe.bpe_apply); token count per doc
  3. chunk        — context windows with overlap (map-only explode,
                    ops/text.chunk_documents over the BPE token string)
  4. pack         — ~budget-token bins via the two-phase distributed
                    prefix sum (ops/text.pack_sequences — no
                    single-partition window), per split
  5. shard        — parquet partitioned by (split, shard) where shard =
                    bin_id div bins_per_shard; writing is the only
                    corpus-wide shuffle-free sink pass

Prints ONE JSON accounting line. Deterministic end to end: same input
-> byte-identical shards (hash splits, deterministic merges, prefix-sum
packing).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hops_spark.ops.bpe import bpe_apply, bpe_train
from hops_spark.ops.text import chunk_documents, pack_sequences
from hops_spark.session import get_spark

BINS_PER_SHARD = 64


def make_training_shards(spark, clean_dir: str, out_dir: str,
                         n_merges: int = 16, chunk_tokens: int = 128,
                         overlap: int = 16, budget: int = 512) -> dict:
    d = spark.read.parquet(clean_dir)
    if "split" not in d.columns:
        from hops_spark.ops.sampling import split_assign
        d = split_assign(d, "doc_id", salt="split")
    counts: dict = {"input_docs": d.count()}

    train = d.filter(F.col("split") == "train")
    merges_df = bpe_train(spark, train.select("doc_id", "text"), k=n_merges)
    merges = [(r["left_sym"], r["right_sym"])
              for r in merges_df.orderBy("merge_rank").collect()]
    counts["bpe_merges"] = len(merges)

    # tokenize: BPE symbol stream per doc, space-joined so the chunker
    # (whitespace-token windows) operates directly on BPE tokens.
    # materialized once (guide §2.4): the chained-replace BPE replay is
    # the job's heaviest map and tok feeds BOTH the token-count
    # accounting aggregate and the chunker; without the cut it re-runs
    # per downstream action
    tok = (bpe_apply(d, merges).select(
        "doc_id", "split",
        F.array_join(F.flatten(F.transform(
            F.col("bpe_tokens"), lambda s: F.split(s, " "))), " ")
        .alias("bpe_text"))
        .localCheckpoint(eager=True))
    counts["tokens"] = (tok.select(
        F.sum(F.size(F.split("bpe_text", " "))).alias("n"))
        .collect()[0]["n"])

    chunks = chunk_documents(tok.withColumnRenamed("bpe_text", "text"),
                             chunk_tokens=chunk_tokens, overlap=overlap)
    # chunks feeds the accounting count plus, per split, an isEmpty
    # probe and the pack+write pass (~7 actions) — one cut stops the
    # explode+join prefix re-running for each
    chunks = (chunks.join(d.select("doc_id", "split"), "doc_id")
                    .localCheckpoint(eager=True))
    counts["chunks"] = chunks.count()

    shard_counts = {}
    for split in ("train", "val", "test"):
        part = chunks.filter(F.col("split") == split).drop("split")
        if part.isEmpty():
            shard_counts[split] = {"bins": 0, "rows": 0}
            continue
        # Deterministic pre-pack shuffle (the RNG-free global permutation
        # of queries/layout.shard_shuffle): pack in md5(doc) order so
        # bins/shards mix documents and sources instead of preserving
        # corpus order — a doc's own chunks stay adjacent (the hash is
        # per-doc), which keeps intra-doc curriculum intact. Re-running
        # on any cluster shape yields byte-identical shards.
        part = part.withColumn(
            "_shuf", F.md5(F.concat(F.lit("shard|"),
                                    F.col("doc_id").cast("string"))))
        packed = pack_sequences(part, budget=budget,
                                id_cols=["_shuf", "doc_id", "chunk_id"])
        packed = packed.drop("_shuf")
        packed = packed.withColumn(
            "shard", F.expr(f"bin_id div {BINS_PER_SHARD}").cast("long"))
        out = os.path.join(out_dir, split)
        (packed.orderBy("bin_id", "doc_id", "chunk_id")
               .write.mode("overwrite").partitionBy("shard").parquet(out))
        back = spark.read.parquet(out)
        shard_counts[split] = {
            "bins": back.select("bin_id").distinct().count(),
            "rows": back.count(),
        }
    counts["shards"] = shard_counts
    return counts


def main() -> None:
    clean_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clean_corpus_out/clean"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_shards"

    def _arg(flag: str, default: int) -> int:
        return int(sys.argv[sys.argv.index(flag) + 1]) \
            if flag in sys.argv else default

    spark = get_spark("make-training-shards")
    counts = make_training_shards(
        spark, clean_dir, out_dir,
        n_merges=_arg("--merges", 16), chunk_tokens=_arg("--chunk", 128),
        overlap=_arg("--overlap", 16), budget=_arg("--budget", 512))
    print(json.dumps({"job": "make_training_shards", "in": clean_dir,
                      "out": out_dir, **counts}))


if __name__ == "__main__":
    main()
