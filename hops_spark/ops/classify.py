"""Multinomial Naive Bayes text classifier — the training-data-pipeline
quality/language classifier shape (the public fastText-recipe role: a
cheap linear classifier gating a 100 TB corpus; CCNet/ccnet-style
pipelines pair exactly this with the LM-perplexity gate in ops/lm.py).

Everything is counts + one broadcast join — NB is the one classical
classifier whose training IS a groupBy, so it distributes perfectly:

- train: token counts per class (bounded by vocab x n_classes), class
  token totals, doc priors — three aggregates, no iteration.
- score: token rows x n_classes (n_classes is small), left-join the
  broadcast count table, integer micro-nat log-likelihoods
  (ops/lm.py's idiom: CAST(round(-ln(p)*1e6, 0) AS BIGINT) per token
  BEFORE summing, so fold order cannot perturb the result and a SQL
  oracle reproduces every score bit-for-bit), add-one smoothing.
- predict: per-doc argmin NLL, ties to the lexicographically smaller
  class label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hops_spark.ops.text import words


def nb_predict(docs: DataFrame, id_col: str = "doc_id",
               class_col: str = "lang", text_col: str = "text",
               hash_features: int | None = None) -> DataFrame:
    """Train-and-self-classify (the fixture evaluation shape): returns
    (id, actual, predicted, nll_micro). Driver state is bounded by the
    class list + two scalars (vocab size, doc total).

    Scale contract: the (class, token) count table is vocab x C rows —
    at fixture scale AQE broadcasts it into the scoring join on its
    own; at web-corpus scale (vocab 10^7+) it shuffle-joins on (c, w)
    instead, which is still one bounded keyed join. To FORCE a bounded
    table regardless of corpus (the fastText recipe), pass
    ``hash_features=N``: tokens fold into N md5 buckets before
    counting, so the model is <= N x C rows by construction."""
    d = docs.filter(F.length(text_col) > 0)
    term = F.explode(words(text_col)).alias("w")
    tok = d.select(F.col(id_col), F.col(class_col).alias("actual"), term)
    if hash_features is not None:
        tok = tok.withColumn("w", F.pmod(
            F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long"),
            F.lit(hash_features)).cast("string"))
    cls_rows = (d.groupBy(F.col(class_col).alias("c"))
                 .agg(F.count("*").alias("n_docs")).collect())
    classes = sorted(r["c"] for r in cls_rows)
    n_docs_of = {r["c"]: r["n_docs"] for r in cls_rows}
    n_total = sum(n_docs_of.values())
    v = tok.select("w").distinct().count()

    cnt = (tok.groupBy(F.col("actual").alias("c"), "w")
              .agg(F.count("*").alias("n")))
    ctok = (tok.groupBy(F.col("actual").alias("c"))
               .agg(F.count("*").alias("n_tok")))

    import math
    prior_micro = {c: int(round(-math.log(n_docs_of[c] / n_total) * 1e6))
                   for c in classes}
    prior_col = F.create_map(*[x for c in classes
                               for x in (F.lit(c),
                                         F.lit(prior_micro[c]))])

    # cnt is vocab x C rows: let AQE pick broadcast-vs-shuffle (tiny at
    # fixture scale, a keyed shuffle join on a web-scale vocab); ctok
    # is C rows — always broadcast.
    per_class = (tok.withColumn("c", F.explode(F.array(
                     *[F.lit(c) for c in classes])))
                    .join(cnt, ["c", "w"], "left")
                    .join(F.broadcast(ctok), "c")
                    .withColumn("nlp_micro", F.expr(
                        f"CAST(round(-ln((coalesce(n, 0) + 1) / "
                        f"CAST(n_tok + {v} AS DOUBLE)) * 1000000, 0) "
                        f"AS BIGINT)")))
    scored = (per_class.groupBy(id_col, "actual", "c")
                       .agg(F.sum("nlp_micro").alias("_tok_nll"))
                       .withColumn("nll_micro",
                                   F.col("_tok_nll")
                                   + prior_col[F.col("c")].cast("long")))
    w = Window.partitionBy(id_col).orderBy("nll_micro", "c")
    return (scored.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1)
                  .select(id_col, "actual", F.col("c").alias("predicted"),
                          "nll_micro"))
