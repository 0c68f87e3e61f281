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

from hops_spark.ops.litfast import lit_array
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
    # ONE corpus explode: the per-(doc, word) count table feeds the
    # vocab size, the (class, word) model counts, the class totals AND
    # the scoring join (optimization r12, guide §2.3/§2.4 — the
    # explode formerly ran once per consumer, and scoring shipped every
    # token occurrence instead of distinct (doc, word) cells weighted
    # by their local count; the integer sums regroup identically).
    tw = (tok.groupBy(F.col(id_col), "actual", "w")
             .agg(F.count("*").cast("long").alias("n_local"))
             .localCheckpoint(eager=True))
    cls_rows = (d.groupBy(F.col(class_col).alias("c"))
                 .agg(F.count("*").alias("n_docs")).collect())
    classes = sorted(r["c"] for r in cls_rows)
    n_docs_of = {r["c"]: r["n_docs"] for r in cls_rows}
    n_total = sum(n_docs_of.values())
    v = tw.select("w").distinct().count()

    cnt = (tw.groupBy(F.col("actual").alias("c"), "w")
             .agg(F.sum("n_local").alias("n")))
    ctok = (tw.groupBy(F.col("actual").alias("c"))
              .agg(F.sum("n_local").alias("n_tok")))

    import math
    prior_micro = {c: int(round(-math.log(n_docs_of[c] / n_total) * 1e6))
                   for c in classes}
    prior_col = F.create_map(*[x for c in classes
                               for x in (F.lit(c),
                                         F.lit(prior_micro[c]))])

    # cnt is vocab x C rows: let AQE pick broadcast-vs-shuffle (tiny at
    # fixture scale, a keyed shuffle join on a web-scale vocab); ctok
    # is C rows — always broadcast.
    per_class = (tw.withColumn("c", F.explode(F.array(
                     *[F.lit(c) for c in classes])))
                   .join(cnt, ["c", "w"], "left")
                   .join(F.broadcast(ctok), "c")
                   .withColumn("nlp_micro", F.expr(
                       f"CAST(round(-ln((coalesce(n, 0) + 1) / "
                       f"CAST(n_tok + {v} AS DOUBLE)) * 1000000, 0) "
                       f"AS BIGINT)")))
    scored = (per_class.groupBy(id_col, "actual", "c")
                       .agg(F.sum(F.col("nlp_micro") * F.col("n_local"))
                             .alias("_tok_nll"))
                       .withColumn("nll_micro",
                                   F.col("_tok_nll")
                                   + prior_col[F.col("c")].cast("long")))
    w = Window.partitionBy(id_col).orderBy("nll_micro", "c")
    return (scored.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1)
                  .select(id_col, "actual", F.col("c").alias("predicted"),
                          "nll_micro"))


# ---------------------------------------------------------------------------
# Discriminative linear probe: hashed bag-of-words + batch gradient
# descent in FIXED-POINT integer arithmetic. The public recipe role is
# the fastText/DCLM-style learned quality gate (a linear classifier
# over hashed token features deciding keep/drop for a 100 TB corpus);
# the training rule is the classic delta rule (Widrow-Hoff / ADALINE)
# with a HARD sigmoid p = clamp(1/2 + s/4, 0, 1) — chosen over exp()
# deliberately: every quantity is integer micro-units combined with
# +,*,floor and exact dyadic divisions only, so fold order cannot
# perturb a sum and a SQL oracle reproduces training bit-for-bit
# (libm exp/ln differ across engines in the last ulp; IEEE +,*,/ do
# not). Weights live in micro-units (1e-6) as BIGINTs.
# ---------------------------------------------------------------------------

LP_MICRO = 1_000_000            # fixed-point scale: 1.0 == 1e6 micro
LP_HALF = LP_MICRO // 2         # hard-sigmoid intercept (p = 0.5 at s=0)
LP_SAT = 2 * LP_MICRO           # |margin| >= 2.0 saturates the hard sigmoid


def hashed_features(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", y_col: str = "y",
                    dim: int = 64, seed: str = "lp") -> DataFrame:
    """(id, _y, feat, x): LENGTH-NORMALIZED token frequencies in
    micro-units — x = floor(count * 1e6 / doc_tokens) — folded into
    ``dim`` md5 buckets (feature hashing: the model is <= dim+1
    weights regardless of vocabulary), plus one bias row (feat = dim,
    x = 1e6) per doc so empty docs still carry a row. Normalization
    makes margins length-invariant and bounded (sum of x per doc <=
    2e6 incl. bias), which is what keeps the hard sigmoid out of
    saturation lockup — with raw counts a 300-token doc's margin
    blows past the +-2.0 saturation band after one update and every
    gradient dies (measured on the fixture: training freezes at the
    majority class).

    The floor-of-double division is engine-exact: a/b for BIGINTs of
    this size is correctly rounded, and a non-integer quotient is at
    least 1/b > half-ulp away from an integer, so FLOOR cannot be
    perturbed by the rounding. One keyed aggregate + one per-doc
    window; everything else map-only."""
    d = docs.select(F.col(id_col), F.col(text_col), F.col(y_col))
    tok = d.select(F.col(id_col), F.col(y_col).alias("_y"),
                   F.explode(words(text_col)).alias("_w"))
    feat = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(seed), F.col("_w"))),
                           1, 15), 16, 10).cast("long"),
        F.lit(dim))
    fcnt = (tok.groupBy(F.col(id_col), F.col("_y"), feat.alias("feat"))
               .agg(F.count("*").alias("cnt")))
    tot = F.sum("cnt").over(
        Window.partitionBy(F.col(id_col), F.col("_y")))
    norm = (fcnt.withColumn("x", F.floor(F.col("cnt") * LP_MICRO / tot)
                                  .cast("long"))
                .drop("cnt"))
    bias = d.select(F.col(id_col), F.col(y_col).alias("_y"),
                    F.lit(dim).cast("long").alias("feat"),
                    F.lit(LP_MICRO).cast("long").alias("x"))
    return norm.unionByName(bias)


def _probe_margin(feats: DataFrame, w: list[int], id_col: str):
    """(id, _y, margin): fixed-point dot product against the weight
    vector — floor(sum(w_micro * x_micro) / 1e6), so margin stays in
    micro-units. The weights ride as ONE literal long-array (dim+1
    entries — codebook-sized, far under the ~4k-literal Catalyst
    analysis wall)."""
    arr = lit_array(w, "long")
    contrib = F.element_at(arr, (F.col("feat") + 1).cast("int")) * F.col("x")
    return (feats.groupBy(F.col(id_col), F.col("_y"))
                 .agg(F.floor(F.sum(contrib) / F.lit(float(LP_MICRO)))
                       .alias("margin")))


def _probe_errs(margins: DataFrame, id_col: str) -> DataFrame:
    """(id, _y, err, inside): hard-sigmoid probability in micro-units,
    its signed error vs the label, and the slope-active flag. All
    integer except one exact dyadic /4.0."""
    p = F.least(F.greatest(F.lit(LP_HALF)
                           + F.floor(F.col("margin") / F.lit(4.0)),
                           F.lit(0)),
                F.lit(LP_MICRO))
    return margins.select(
        F.col(id_col), F.col("_y"),
        (p - F.col("_y").cast("long") * LP_MICRO).alias("err"),
        ((F.col("margin") > -LP_SAT) & (F.col("margin") < LP_SAT))
        .alias("inside"))


def train_linear_probe(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", y_col: str = "y",
                       dim: int = 64, iters: int = 3,
                       lr_num: int = 1, lr_den: int = 1,
                       seed: str = "lp") -> list[int]:
    """Full-batch delta-rule training, returning the final weight list
    (dim+1 BIGINT micro-unit entries; index dim is the bias).

    Per iteration: one keyed aggregate (per-doc margin), one keyed
    join + one keyed aggregate (per-feature gradient, dim+1 cells,
    map-side partials), one dim+1-row collect — the model is driver
    metadata like an IVF codebook; the DATA is only ever streamed,
    twice per iteration. At 100 TB that is the standard full-batch GD
    cost (2*iters scans); the drop-in mitigation is hash-sampled
    mini-batches (ops/sampling.hash_sample), which change the
    estimator, not this plumbing. Portability: every per-element
    contribution is snapped to integer micro-units BEFORE summing
    (the house fold-order rule), the gradient sum stays BIGINT-exact
    (|g| <= 1e6 * n_docs — int64 holds past 10^12 docs), and the
    update floor(g*lr_num / (4.0*lr_den*n)) uses IEEE ops only, so
    the DuckDB oracle replays training to the last bit.

    The feature table persists HASH-PARTITIONED BY DOC ID (one
    up-front exchange): the per-doc margin aggregate, the error join
    and the scoring pass are then all partition-local — each GD
    iteration's only exchange is the dim+1-cell gradient aggregate
    (optimization r12, guide §2.4: establish the partitioning once,
    reuse it every pass)."""
    feats, n_docs = _persisted_feats(docs, id_col, text_col, y_col,
                                     dim, seed)
    w = _train_on_feats(feats, n_docs, id_col, iters, lr_num, lr_den,
                        dim)
    feats.unpersist()
    return w


def _persisted_feats(docs: DataFrame, id_col: str, text_col: str,
                     y_col: str, dim: int, seed: str
                     ) -> tuple[DataFrame, int]:
    """Build + persist the hashed feature table partitioned by doc id;
    returns (feats, n_docs). Callers that train AND score reuse the
    same persisted table for both (probe_calibration builds features
    once, not twice)."""
    feats = (hashed_features(docs, id_col, text_col, y_col, dim, seed)
             .repartition(F.col(id_col)).persist())
    n_docs = docs.count()
    return feats, n_docs


def _train_on_feats(feats: DataFrame, n_docs: int, id_col: str,
                    iters: int, lr_num: int, lr_den: int,
                    dim: int) -> list[int]:
    import math
    w = [0] * (dim + 1)
    denom = 4.0 * lr_den * n_docs
    for _ in range(iters):
        errs = _probe_errs(_probe_margin(feats, w, id_col), id_col)
        g = (feats.join(errs.select(id_col, "err", "inside"), id_col)
                  .groupBy("feat")
                  .agg(F.sum(F.when(F.col("inside"),
                                    F.floor(F.col("err") * F.col("x")
                                            / F.lit(float(LP_MICRO))))
                              .otherwise(F.lit(0)).cast("long"))
                        .alias("g"))
                  .collect())
        gmap = {int(r["feat"]): int(r["g"]) for r in g}
        w = [wi - math.floor(gmap.get(i, 0) * lr_num / denom)
             for i, wi in enumerate(w)]
    return w


def linear_probe_scores(docs: DataFrame, w: list[int],
                        id_col: str = "doc_id", text_col: str = "text",
                        y_col: str = "y", dim: int = 64,
                        seed: str = "lp",
                        feats: DataFrame | None = None) -> DataFrame:
    """(id, _y, margin, p_micro, pred): score docs against a trained
    weight list. One keyed aggregate; the model rides as a literal.
    Pass ``feats`` (a hashed_features table of the same docs) to skip
    rebuilding the features — a train-then-score caller already has
    the persisted table (optimization r12)."""
    if feats is None:
        feats = hashed_features(docs, id_col, text_col, y_col, dim, seed)
    m = _probe_margin(feats, w, id_col)
    p = F.least(F.greatest(F.lit(LP_HALF)
                           + F.floor(F.col("margin") / F.lit(4.0)),
                           F.lit(0)),
                F.lit(LP_MICRO))
    return m.select(F.col(id_col), F.col("_y"), F.col("margin"),
                    p.alias("p_micro"),
                    (p >= LP_HALF).cast("int").alias("pred"))


def calibration_bin_stats(scored: DataFrame, bins: int = 10) -> DataFrame:
    """(bin, n, n_pos, p_sum): ADDITIVE per-bin sufficient statistics
    of a reliability diagram over linear_probe_scores output — under a
    FROZEN weight vector every column is a plain sum, so stats fold
    across micro-batches exactly (the frozen_domain_stats property,
    applied to calibration). ≤ ``bins`` rows out of one keyed
    aggregate. Shared by the batch probe_calibration query and the
    streaming calibration-drift monitor — one derivation, two faces."""
    b = scored.select(
        # (p * bins) div SCALE, not p div (SCALE div bins): the latter
        # misallocates the top bins whenever bins does not divide the
        # scale evenly (e.g. bins=7). The product caps at bins only
        # for p_micro == LP_MICRO exactly — the least() folds it back.
        F.least(F.expr(f"(p_micro * {bins}) div {LP_MICRO}"),
                F.lit(bins - 1)).cast("long").alias("bin"),
        F.col("_y").cast("long").alias("y"), "p_micro")
    return b.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum("p_micro").cast("long").alias("p_sum"))


def calibration_from_bin_stats(stats: DataFrame) -> DataFrame:
    """(bin, n, n_pos, conf_micro, emp_micro, gap_micro): the derived
    reliability table — a pure integer function of the additive bin
    stats (mean confidence vs empirical positive rate and their |gap|,
    the n-weighted ECE terms)."""
    return (stats.select(
                "bin", "n", "n_pos",
                F.expr("CAST(p_sum div n AS BIGINT)").alias("conf_micro"),
                F.expr(f"CAST((n_pos * {LP_MICRO}) div n AS BIGINT)")
                 .alias("emp_micro"))
            .withColumn("gap_micro",
                        F.abs(F.col("conf_micro") - F.col("emp_micro"))
                         .cast("long"))
            .orderBy("bin"))
