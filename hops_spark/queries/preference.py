"""Preference/instruction-data queries — the RLHF-era data card over
the derived pair view (ops/preference: adjacent documents form pairs,
chosen = higher quality_score_ppm, reward = the exact-integer corpus
quality score). Public shape: Stiennon et al. 2020, Bai et al. 2022
(HH-RLHF), Touvron et al. 2023 (Llama 2 §3.1 — the length-bias audit
and preference-set dedup these queries implement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hops_spark.io.readers import load_table
from hops_spark.ops.preference import (BT_BIG, BT_ITERS, BT_SCALE,
                                       NEAR_DUP_PPM, bradley_terry_fit,
                                       cross_model_outcomes,
                                       fleiss_agreement, length_bias_audit,
                                       pair_judge_votes, pair_overlap,
                                       pairwise_win_matrix,
                                       preference_pairs,
                                       prompt_group_stats, scored_docs)
from hops_spark.queries.textops import _DUCK_WORDS, _duck_sw_list
from hops_spark.registry import register

# The quality-score + pair-view oracle chain, mirrored from
# ops/text.quality_score (the doc_quality expression) and
# ops/preference.preference_pairs. Shared by all three preference
# oracles so the derivation can never fork.
_PREF_CTES = f"""qf AS (
        SELECT doc_id, source, text, {_DUCK_WORDS} AS w,
               CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]',
                                          '', 'g')) AS BIGINT) AS n_punct
        FROM documents
    ), q AS (
        SELECT doc_id, source, text,
               CAST(len(w) AS BIGINT) AS n_words,
               greatest(len(w), 1)::BIGINT AS nw1,
               greatest(length(text), 1)::BIGINT AS nc1,
               n_punct,
               CAST(len(list_filter(w,
                    x -> list_contains({_duck_sw_list('en')}, x)))
                    AS BIGINT) AS n_sw,
               CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq
        FROM qf
    ), psc AS (
        SELECT doc_id, source, text, n_words, n_uniq,
               (least(n_words * 20000, 1000000)
                + (1000000 - least(((n_punct * 1000000) // nc1) * 5,
                                   1000000))
                + least(((n_sw * 1000000) // nw1) * 4, 1000000)
                + (n_uniq * 1000000) // nw1) AS score
        FROM q
    ), pr AS (
        SELECT a.doc_id // 2 AS pair_id, a.source,
               CASE WHEN a.score >= b.score THEN a.doc_id
                    ELSE b.doc_id END AS chosen_id,
               CASE WHEN a.score >= b.score THEN b.doc_id
                    ELSE a.doc_id END AS rejected_id,
               CASE WHEN a.score >= b.score THEN a.score
                    ELSE b.score END AS chosen_score,
               CASE WHEN a.score >= b.score THEN b.score
                    ELSE a.score END AS rejected_score,
               CASE WHEN a.score >= b.score THEN a.n_words
                    ELSE b.n_words END AS chosen_words,
               CASE WHEN a.score >= b.score THEN b.n_words
                    ELSE a.n_words END AS rejected_words,
               CASE WHEN a.score >= b.score THEN a.text
                    ELSE b.text END AS chosen_text,
               CASE WHEN a.score >= b.score THEN b.text
                    ELSE a.text END AS rejected_text
        FROM psc a JOIN psc b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 2 = 0
    )"""


@register(
    "response_length_bias",
    sql=f"""
    WITH {_PREF_CTES}
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN chosen_words > rejected_words
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_chosen_longer,
           CAST(sum(CASE WHEN chosen_words = rejected_words
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ties,
           CAST(CASE WHEN count(*) = sum(CASE WHEN chosen_words =
                          rejected_words THEN 1 ELSE 0 END) THEN 0
                ELSE (sum(CASE WHEN chosen_words > rejected_words
                          THEN 1 ELSE 0 END) * 1000000)
                     // (count(*) - sum(CASE WHEN chosen_words =
                          rejected_words THEN 1 ELSE 0 END))
                END AS BIGINT) AS chosen_longer_ppm,
           CAST(sum(chosen_words - rejected_words) AS BIGINT)
               AS word_delta_sum,
           CAST(sum(chosen_score - rejected_score) // count(*) AS BIGINT)
               AS mean_margin_ppm
    FROM pr GROUP BY source ORDER BY source
    """,
    doc="Response-length-bias audit of the preference set (Llama 2 "
        "§3.1 / Singhal et al. 2023: RLHF reward models latch onto "
        "length — a preference set where 'chosen' systematically "
        "means 'longer' trains a length heuristic, not a quality "
        "model): per source, the rate at which the chosen response is "
        "strictly longer (ppm over non-tied pairs, zero-guarded), the "
        "raw word-delta sum (undivided: it can be negative, and "
        "trunc-div vs floor-div diverge on negatives across engines) "
        "and the mean reward margin. One #sources-bounded keyed "
        "aggregate over the pair view. ops/preference.",
    tags=("text", "ml", "preference", "north-star"),
)
def response_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    return (length_bias_audit(preference_pairs(scored_docs(d)))
            .orderBy("source"))


@register(
    "preference_pair_overlap",
    sql=f"""
    WITH {_PREF_CTES}, ov AS (
        SELECT pair_id, source, chosen_id, rejected_id,
               CAST(len(list_intersect(list_distinct({{CW}}),
                                       list_distinct({{RW}})))
                    AS BIGINT) AS i,
               CAST(len(list_distinct(list_concat(
                        list_distinct({{CW}}), list_distinct({{RW}}))))
                    AS BIGINT) AS u
        FROM pr
    )
    SELECT pair_id, source, chosen_id, rejected_id,
           CAST(CASE WHEN u > 0 THEN (i * 1000000) // u ELSE 0 END
                AS BIGINT) AS jaccard_ppm,
           CAST(CASE WHEN (CASE WHEN u > 0 THEN (i * 1000000) // u
                           ELSE 0 END) >= {NEAR_DUP_PPM}
                     THEN 1 ELSE 0 END AS INT) AS near_dup
    FROM ov ORDER BY pair_id
    """.replace("{CW}", _DUCK_WORDS.replace("text", "chosen_text"))
       .replace("{RW}", _DUCK_WORDS.replace("text", "rejected_text")),
    doc="Within-pair chosen/rejected near-duplicate gate (Llama 2 "
        "§3.1 dedups preference pairs whose two responses are near-"
        "identical — they carry no preference signal and dilute the "
        "reward-model gradient): distinct-word Jaccard of the two "
        "responses in exact integer ppm plus the >= 0.6 flag. Pure "
        "per-row array arithmetic over the pair view — no join, no "
        "shuffle, trivially 100-TB-safe. ops/preference.pair_overlap.",
    tags=("text", "ml", "preference", "dedup"),
)
def preference_pair_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    return (pair_overlap(preference_pairs(scored_docs(d)))
            .orderBy("pair_id"))


@register(
    "prompt_group_stats",
    sql=f"""
    WITH {_PREF_CTES}, g AS (
        SELECT doc_id // 4 AS group_id, doc_id, n_words, score FROM psc
    ), a AS (
        SELECT group_id,
               CAST(count(*) AS BIGINT) AS n_responses,
               CAST(max(score) AS BIGINT) AS best_score,
               CAST(min(score) AS BIGINT) AS worst_score,
               CAST(sum(n_words) AS BIGINT) AS total_words
        FROM g GROUP BY group_id
    ), b AS (
        SELECT g.group_id, CAST(min(g.doc_id) AS BIGINT) AS best_doc_id
        FROM g JOIN a ON a.group_id = g.group_id AND g.score = a.best_score
        GROUP BY g.group_id
    )
    SELECT a.group_id, n_responses, best_score, worst_score,
           CAST(best_score - worst_score AS BIGINT) AS score_margin,
           best_doc_id, total_words
    FROM a JOIN b ON a.group_id = b.group_id
    ORDER BY a.group_id
    """,
    doc="Per-prompt response-group statistics (the K-responses-per-"
        "prompt shape reward-model training data ships in — Stiennon "
        "et al. 2020 collect 4-64 summaries per post): groups of four "
        "adjacent docs; emits response count, best/worst reward, "
        "margin, argmax response id (tie -> lower doc_id) and total "
        "words — the group-level spread a preference-data card "
        "reports (zero-margin groups are ranking noise). One keyed "
        "aggregate; the argmax is a struct-max, no window. "
        "ops/preference.prompt_group_stats.",
    tags=("text", "ml", "preference"),
)
def prompt_group_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    return (prompt_group_stats(scored_docs(d), group_size=4)
            .orderBy("group_id"))


# Cross-model outcome view: every different-source pair becomes a
# head-to-head between its two sources, canonicalized model_a < model_b,
# winner = higher score (tie -> even doc). Shared by the win-rate
# matrix and the Bradley-Terry oracle.
_XO_CTE = """xo AS (
        SELECT a.doc_id // 2 AS pair_id,
               least(a.source, b.source) AS model_a,
               greatest(a.source, b.source) AS model_b,
               CASE WHEN a.score >= b.score THEN a.source
                    ELSE b.source END AS winner_model
        FROM psc a JOIN psc b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 2 = 0 AND a.source <> b.source
    )"""


@register(
    "pairwise_winrate",
    sql=f"""
    WITH {_PREF_CTES}, {_XO_CTE}
    SELECT model_a, model_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN winner_model = model_a THEN 1 ELSE 0 END)
                AS BIGINT) AS wins_a,
           CAST(count(*) - sum(CASE WHEN winner_model = model_a
                                    THEN 1 ELSE 0 END) AS BIGINT)
               AS wins_b,
           CAST((sum(CASE WHEN winner_model = model_a THEN 1 ELSE 0 END)
                 * 1000000) // count(*) AS BIGINT) AS winrate_a_ppm
    FROM xo GROUP BY model_a, model_b ORDER BY model_a, model_b
    """,
    doc="Pairwise model win-rate matrix — the head-to-head table every "
        "reward-model / policy evaluation reports (Stiennon et al. "
        "2020 §3, Touvron et al. 2023 §3.4 report exactly these "
        "cross-policy win rates): each different-source pair is one "
        "outcome between its two sources ('models'), winner = the "
        "higher-reward response; one row per unordered model pair "
        "with the record and model_a's win rate in integer ppm. One "
        "keyed pair aggregation + one #models²-bounded aggregate — the "
        "matrix never exceeds #sources² rows regardless of corpus "
        "size. ops/preference.pairwise_win_matrix.",
    tags=("text", "ml", "preference", "north-star"),
)
def pairwise_winrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    return (pairwise_win_matrix(cross_model_outcomes(scored_docs(d)))
            .orderBy("model_a", "model_b"))


def _bt_iter_ctes(iters: int) -> str:
    """The Bradley-Terry minorize-maximize iteration unrolled as CTEs
    (the _lp_iter_ctes pattern): s{k} -> d{k} (per-model denominator)
    -> r{k} (raw update) -> s{k+1} (normalized to m * 1e6). Every
    operation is integer floor-division at BT_BIG scale — the literal
    replay of ops/preference.bradley_terry_fit's python loop."""
    parts = [f"""wm AS MATERIALIZED (
        SELECT model_a, model_b,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN winner_model = model_a THEN 1 ELSE 0
                        END) AS BIGINT) AS wa
        FROM xo GROUP BY model_a, model_b
    ), wins AS MATERIALIZED (
        SELECT model, CAST(sum(w) AS BIGINT) AS wins,
               CAST(sum(n) AS BIGINT) AS n_pairs
        FROM (SELECT model_a AS model, wa AS w, n FROM wm
              UNION ALL SELECT model_b, n - wa, n FROM wm)
        GROUP BY model
    ), mc AS (
        SELECT CAST(count(*) AS BIGINT) AS m FROM wins
    ), ps AS MATERIALIZED (
        SELECT model_a AS mi, model_b AS mj, n FROM wm
        UNION ALL SELECT model_b, model_a, n FROM wm
    ), s0 AS (
        SELECT model, CAST({BT_SCALE} AS BIGINT) AS s FROM wins
    )"""]
    for k in range(iters):
        parts.append(f""", d{k} AS (
        SELECT p.mi AS model,
               CAST(sum((p.n * {BT_BIG}) // greatest(si.s + sj.s, 1))
                    AS BIGINT) AS den
        FROM ps p JOIN s{k} si ON si.model = p.mi
                  JOIN s{k} sj ON sj.model = p.mj
        GROUP BY p.mi
    ), r{k} AS MATERIALIZED (
        SELECT w.model,
               CAST((w.wins * {BT_BIG}) // greatest(d.den, 1) AS BIGINT)
                   AS raw
        FROM wins w JOIN d{k} d ON d.model = w.model
    ), s{k + 1} AS (
        SELECT r.model,
               CAST((r.raw * m.m * {BT_SCALE})
                    // greatest((SELECT sum(raw) FROM r{k}), 1)
                    AS BIGINT) AS s
        FROM r{k} r CROSS JOIN mc m
    )""")
    return "".join(parts)


@register(
    "bradley_terry_strengths",
    sql=f"""
    WITH {_PREF_CTES}, {_XO_CTE}, {_bt_iter_ctes(BT_ITERS)}
    SELECT w.model, w.wins AS n_wins, w.n_pairs,
           s.s AS strength_micro
    FROM wins w JOIN s{BT_ITERS} s ON s.model = w.model
    ORDER BY w.model
    """,
    doc="Bradley-Terry model-strength fit over the pairwise outcomes "
        "(Bradley & Terry 1952; the Elo-style aggregate every "
        "multi-policy evaluation reduces its win-rate matrix to — "
        "Chatbot-Arena-shape): strengths s_i with P(i beats j) = "
        "s_i/(s_i+s_j), fitted by 8 rounds of Hunter 2004's "
        "minorize-maximize update s_i <- W_i / Σ_j n_ij/(s_i+s_j), "
        "renormalized to Σs = #models·1e6 each round. The heavy work "
        "is ONE corpus-proportional outcome aggregate; the iteration "
        "runs on the collected #models²-bounded matrix in exact "
        "integer arithmetic at 1e12 scale, replayed verbatim by the "
        "oracle's unrolled CTEs — identical micro values on both "
        "engines, no float anywhere. ops/preference.bradley_terry_fit.",
    tags=("text", "ml", "preference", "iterative", "north-star"),
)
def bradley_terry_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    wm = pairwise_win_matrix(cross_model_outcomes(scored_docs(d)))
    rows = wm.collect()     # #models²-bounded driver-side metadata
    s = bradley_terry_fit(
        [(r["model_a"], r["model_b"], r["wins_a"], r["wins_b"])
         for r in rows], iters=BT_ITERS)
    wins: dict[str, int] = {}
    pairs: dict[str, int] = {}
    for r in rows:
        wins[r["model_a"]] = wins.get(r["model_a"], 0) + r["wins_a"]
        wins[r["model_b"]] = wins.get(r["model_b"], 0) + r["wins_b"]
        pairs[r["model_a"]] = pairs.get(r["model_a"], 0) + r["n_pairs"]
        pairs[r["model_b"]] = pairs.get(r["model_b"], 0) + r["n_pairs"]
    return spark.createDataFrame(
        [(m, wins[m], pairs[m], s[m]) for m in sorted(s)],
        "model string, n_wins long, n_pairs long, strength_micro long"
    ).orderBy("model")


@register(
    "best_of_n_curve",
    sql=f"""
    WITH {_PREF_CTES}, grp AS (
        SELECT doc_id // 4 AS group_id,
               list_sort(list(score)) AS ss,
               count(*) AS nr
        FROM psc GROUP BY doc_id // 4
    ), cg AS (
        SELECT ss FROM grp WHERE nr = 4
    )
    SELECT CAST(1 AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(ss[1] + ss[2] + ss[3] + ss[4]) // (4 * count(*))
                AS BIGINT) AS best_of_k_mean_ppm
    FROM cg
    UNION ALL
    SELECT 2, CAST(count(*) AS BIGINT),
           CAST(sum(ss[2] + 2 * ss[3] + 3 * ss[4]) // (6 * count(*))
                AS BIGINT)
    FROM cg
    UNION ALL
    SELECT 4, CAST(count(*) AS BIGINT),
           CAST(sum(ss[4]) // count(*) AS BIGINT)
    FROM cg
    ORDER BY k
    """,
    doc="Exact best-of-k reward curve over the 4-response prompt "
        "groups — the rejection-sampling yield curve (Nakano et al. "
        "2021 WebGPT §4.2; Gao et al. 2023 plot E[max reward of k "
        "samples] vs k to locate reward-model overoptimization): the "
        "order-statistic identity E[max of k] = Σ s_(i)·C(i-1,k-1)/"
        "C(K,k) evaluated exactly in integers — per-group weighted "
        "numerators over the sorted 4-element score array (sort_array "
        "of a collected group, no window), summed corpus-wide, ONE "
        "division per k. Three rows certify every group's full order "
        "statistics. ops/preference.best_of_n_curve.",
    tags=("text", "ml", "preference", "north-star"),
)
def best_of_n_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.preference import best_of_n_curve
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    return best_of_n_curve(scored_docs(d), group_size=4, ks=(1, 2, 4))


@register(
    "bt_calibration",
    sql=f"""
    WITH {_PREF_CTES}, {_XO_CTE}, {_bt_iter_ctes(BT_ITERS)}
    SELECT w.model_a, w.model_b,
           CAST(w.n AS BIGINT) AS n_pairs,
           CAST((w.wa * 1000000) // w.n AS BIGINT) AS emp_ppm,
           CAST((sa.s * 1000000) // greatest(sa.s + sb.s, 1) AS BIGINT)
               AS pred_ppm,
           CAST(abs((w.wa * 1000000) // w.n
                    - (sa.s * 1000000) // greatest(sa.s + sb.s, 1))
                AS BIGINT) AS gap_ppm
    FROM wm w JOIN s{BT_ITERS} sa ON sa.model = w.model_a
              JOIN s{BT_ITERS} sb ON sb.model = w.model_b
    ORDER BY w.model_a, w.model_b
    """,
    doc="Bradley-Terry fit diagnostics — predicted vs empirical win "
        "rate per model pair (the model-eval reliability diagram; the "
        "goodness check Hunter 2004 / Chatbot-Arena-style reports run "
        "before trusting fitted strengths): pred_ppm = s_a·1e6 div "
        "(s_a+s_b) off the fitted integer strengths next to the "
        "observed rate and their |gap|. A pair with a large gap marks "
        "intransitivity the single-scalar model cannot express. The "
        "fitted strengths ride back as a broadcast literal map over "
        "the #models²-bounded matrix (localCheckpointed once — the "
        "bounded-frame re-derivation rule); the oracle replays fit "
        "AND diagnosis off the same unrolled CTE chain. "
        "ops/preference.bt_calibration.",
    tags=("text", "ml", "preference"),
)
def bt_calibration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.preference import bt_calibration
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    wm = pairwise_win_matrix(cross_model_outcomes(scored_docs(d)))
    wm = wm.localCheckpoint(eager=True)   # feeds the collect AND the join
    s = bradley_terry_fit(
        [(r["model_a"], r["model_b"], r["wins_a"], r["wins_b"])
         for r in wm.collect()], iters=BT_ITERS)
    return bt_calibration(wm, s).orderBy("model_a", "model_b")


def _pass_at_k_sql() -> str:
    from hops_spark.ops.preference import PASS_THRESHOLD_PPM, _choose
    K = 4
    faces = []
    for k in (1, 2, 4):
        denom = _choose(K, k)
        lad = "CASE c " + " ".join(
            f"WHEN {c} THEN {denom - _choose(K - c, k)}"
            for c in range(K + 1)) + " END"
        faces.append(
            f"""SELECT CAST({k} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST((sum({lad}) * 1000000) // ({denom} * count(*))
                AS BIGINT) AS pass_at_k_ppm
    FROM cg""")
    u = "\n    UNION ALL ".join(faces)
    return f"""
    WITH {_PREF_CTES}, grp AS (
        SELECT doc_id // {K} AS group_id,
               sum(CASE WHEN score >= {PASS_THRESHOLD_PPM}
                   THEN 1 ELSE 0 END) AS c,
               count(*) AS nr
        FROM psc GROUP BY doc_id // {K}
    ), cg AS (
        SELECT c FROM grp WHERE nr = {K}
    )
    {u}
    ORDER BY k
    """


@register(
    "pass_at_k",
    sql=_pass_at_k_sql(),
    doc="Exact pass@k over the 4-response prompt groups (Chen et al. "
        "2021 HumanEval §2.1 — the unbiased estimator every code/"
        "reasoning eval reports; a response 'passes' above the fixed "
        "reward gate): per group with c passing responses, pass@k = "
        "1 - C(K-c,k)/C(K,k), averaged EXACTLY in integers — the "
        "per-group numerator is a 5-way CASE ladder on c (both "
        "engines evaluate the identical literal table), summed "
        "corpus-wide with one division per k. One keyed aggregate; "
        "three rows. ops/preference.pass_at_k.",
    tags=("text", "ml", "preference", "eval", "north-star"),
)
def pass_at_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hops_spark.ops.preference import pass_at_k
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    return pass_at_k(scored_docs(d), group_size=4, ks=(1, 2, 4))


@register(
    "annotator_agreement",
    sql=f"""
    WITH {_PREF_CTES}, jv AS (
        SELECT a.doc_id // 2 AS pair_id, a.source,
               (CASE WHEN a.score >= b.score THEN 1 ELSE 0 END
                + CASE WHEN a.n_words >= b.n_words THEN 1 ELSE 0 END
                + CASE WHEN a.n_uniq >= b.n_uniq THEN 1 ELSE 0 END)
                   AS na
        FROM psc a JOIN psc b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 2 = 0
    ), ag AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CASE WHEN na IN (0, 3) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unanimous,
               CAST(sum(na * (na - 1) + (3 - na) * (2 - na)) AS BIGINT)
                   AS s_agree,
               CAST(sum(na) AS BIGINT) AS a_votes
        FROM jv GROUP BY source
    ), wide AS (
        SELECT source, n_pairs, n_unanimous, s_agree, a_votes,
               CAST(n_pairs AS HUGEINT) * 3 AS nk,
               CAST(a_votes AS HUGEINT) * a_votes
                 + (CAST(n_pairs AS HUGEINT) * 3 - a_votes)
                   * (CAST(n_pairs AS HUGEINT) * 3 - a_votes) AS sq
        FROM ag
    )
    SELECT source, n_pairs, n_unanimous,
           CAST((n_unanimous * 1000000) // n_pairs AS BIGINT)
               AS unanimous_ppm,
           CAST((s_agree * 1000000) // (n_pairs * 6) AS BIGINT)
               AS pbar_ppm,
           CAST((sq * 1000000) // (nk * nk) AS BIGINT) AS pe_ppm,
           CAST(CASE WHEN CAST(n_pairs AS HUGEINT) * 6 * (nk * nk - sq)
                          = 0 THEN 1000000
                ELSE ((CAST(s_agree AS HUGEINT) * nk * nk
                       - sq * n_pairs * 6
                       + CAST(n_pairs AS HUGEINT) * 6 * (nk * nk - sq))
                      * 1000000)
                     // (CAST(n_pairs AS HUGEINT) * 6 * (nk * nk - sq))
                     - 1000000 END AS BIGINT) AS kappa_ppm
    FROM wide ORDER BY source
    """,
    doc="Per-source inter-annotator agreement over a derived 3-judge "
        "view (Fleiss 1971 kappa; Stiennon et al. 2020 §3 weight "
        "preference data by labeler agreement — low-agreement slices "
        "are ranking noise): judges = reward, length, and "
        "lexical-diversity orderings of each pair (deterministic "
        "stand-ins; a real K-judge table feeds the same aggregate). "
        "Emits unanimity rate, mean pairwise agreement P-bar, chance "
        "agreement P-e, and Fleiss' kappa — all exact integer ppm. "
        "kappa can be negative, so it is evaluated as "
        "((num+den)·1e6) div den − 1e6 = floor(kappa·1e6): the shift "
        "keeps the numerator nonnegative (kappa >= -1/(K-1)), making "
        "Spark's truncating div and DuckDB's flooring // agree; sums "
        "of squares ride in DECIMAL(38,0)/HUGEINT (the Σcents² "
        "precedent). One pair aggregation + one #sources-bounded "
        "aggregate. "
        "ops/preference.fleiss_agreement.",
    tags=("text", "ml", "preference", "north-star"),
)
def annotator_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    return (fleiss_agreement(pair_judge_votes(scored_docs(d)), n_judges=3)
            .orderBy("source"))


@register(
    "preference_margin_deciles",
    sql=f"""
    WITH {_PREF_CTES}, mg AS (
        SELECT source, chosen_score - rejected_score AS margin
        FROM pr
    ), rk AS (
        SELECT source, margin,
               row_number() OVER (PARTITION BY source
                                  ORDER BY margin, source) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM mg
    )
    SELECT source, CAST(d.d AS BIGINT) AS decile,
           CAST(max(margin) AS BIGINT) AS margin_ppm
    FROM rk, LATERAL (SELECT unnest(range(1, 10)) AS d) d
    WHERE (d.d * n + 9) // 10 = rn
    GROUP BY source, d.d
    ORDER BY source, decile
    """,
    doc="Per-source reward-MARGIN deciles of the preference set (the "
        "difficulty curve reward-model training data ships with: a "
        "source whose lower deciles sit near zero contributes ranking "
        "noise, one whose margins are uniformly huge contributes "
        "nothing the model can't already separate — Stiennon et al. "
        "2020 §3 weight by inter-labeler agreement for exactly this "
        "reason). Exact deciles at ceiling rank (d*n+9) div 10 via "
        "ONE per-source window (partitioned — never a single-"
        "partition sort) over the pair view; integer ppm margins "
        "end-to-end. ops/preference.preference_pairs.",
    tags=("text", "ml", "preference"),
)
def preference_margin_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    mg = preference_pairs(scored_docs(d)).select(
        "source",
        (F.col("chosen_score") - F.col("rejected_score")).alias("margin"))
    w = Window.partitionBy("source").orderBy("margin", "source")
    ranked = (mg.withColumn("rn", F.row_number().over(w))
                .withColumn("n", F.count("*").over(
                    Window.partitionBy("source"))))
    hit = F.filter(F.sequence(F.lit(1), F.lit(9)),
                   lambda dd: ((dd * F.col("n") + 9) / 10).cast("long")
                   == F.col("rn"))
    return (ranked.select("source", "margin",
                          F.explode(hit).alias("decile"))
                  .groupBy("source", F.col("decile").cast("long")
                           .alias("decile"))
                  .agg(F.max("margin").cast("long").alias("margin_ppm"))
                  .orderBy("source", "decile"))
