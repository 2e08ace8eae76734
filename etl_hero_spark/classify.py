"""Multinomial Naive Bayes as pure DataFrame aggregation — the
canonical "train a model with ONE groupBy" classifier (extension
mandate: labeled-corpus classification, e.g. language ID from the
documents table's lang labels, quality-tier routing; the reference has
no model training at all).

Why NB fits Spark natively: the "trained model" IS two aggregation
results — per-(label, token) counts and per-label document counts.
Training a 100 TB corpus is one shuffle on (label, token); there is no
iteration, no driver-held parameter vector beyond broadcast scalars.
Scoring is a flat join of batch tokens against the count table with a
bounded label fan-out (labels are a handful; tokens x labels is the
dense grid add-alpha smoothing needs, because an unseen (token, label)
cell still contributes ln(alpha / (tot_l + alpha*V))).

Determinism: per-document log-score sums accumulate as DECIMAL so the
argmax is partition-order independent; score ties break to the
lexicographically LARGEST label (struct-max convention, pinned in
tests). A document with zero tokens yields no row — there is nothing
to score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_hero_spark.textops import tokens_expr

_DEC = "decimal(38,12)"


def nb_train(
    docs: DataFrame, label_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Train: returns (counts, priors) — the model as two persistable
    tables. counts: (label, _tok, _n) token occurrence counts per
    label; priors: (label, n_docs). Tokenization is the corpus
    convention (lowercased whitespace tokens, textops.tokens_expr).

    One corpus pass each; both tables are the mergeable-partial shape
    (counts from two corpus halves ADD), so incremental refresh is a
    union + re-aggregate, never a retrain."""
    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(tokens_expr(text_col)).alias("_tok"),
    ).withColumn("_tok", F.lower(F.col("_tok")))
    counts = toks.groupBy("label", "_tok").agg(
        F.count(F.lit(1)).alias("_n")
    )
    priors = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return counts, priors


def nb_classify(
    docs: DataFrame,
    counts: DataFrame,
    priors: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """Score a batch against a trained model and return
    (id, pred_label, log_score) — argmax_label of

        ln p(label) + sum_tok cnt_tok * ln( (c(tok,label) + alpha)
                                            / (tot_label + alpha * V) )

    V counts the model vocabulary (distinct training tokens); batch
    tokens absent from it entirely still contribute the alpha floor per
    label (a constant shift per token across labels — kept so scores
    are comparable across documents, and so the formula matches the
    textbook one a test reference implements directly).

    Plan: batch tokens fold to (doc, tok, cnt) once; the label grid is
    a broadcast cross join (|labels| rows); the model joins on
    (tok, label) LEFT so unseen cells smooth instead of dropping;
    per-doc sums accumulate in DECIMAL for an order-independent argmax
    (score ties -> largest label, the struct-max convention)."""
    label_stats = counts.groupBy("label").agg(
        F.sum("_n").cast("double").alias("_tot")
    )
    v_scalar = counts.agg(
        F.countDistinct("_tok").cast("double").alias("_v")
    )
    prior_log = (
        priors.crossJoin(
            F.broadcast(priors.agg(F.sum("n_docs").alias("_nd")))
        )
        .select(
            "label",
            F.log(F.col("n_docs") / F.col("_nd")).alias("_prior"),
        )
    )
    labels = (
        label_stats.join(prior_log, "label")
        .crossJoin(F.broadcast(v_scalar))
        .select("label", "_tot", "_prior", "_v")
    )
    doc_toks = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(tokens_expr(text_col)).alias("_tok"),
        )
        .withColumn("_tok", F.lower(F.col("_tok")))
        .groupBy("_id", "_tok")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    grid = doc_toks.crossJoin(F.broadcast(labels))
    scored = grid.join(counts, ["_tok", "label"], "left").select(
        "_id",
        "label",
        "_prior",
        (
            F.col("_cnt")
            * F.log(
                (F.coalesce(F.col("_n"), F.lit(0)) + F.lit(alpha))
                / (F.col("_tot") + F.lit(alpha) * F.col("_v"))
            )
        )
        .cast(_DEC)
        .alias("_term"),
    )
    per_label = scored.groupBy("_id", "label").agg(
        (F.first("_prior") + F.sum("_term").cast("double")).alias("_score")
    )
    # max(struct(score, label)) breaks score ties to the LARGEST
    # label — deterministic either way; convention pinned in tests
    best = per_label.groupBy("_id").agg(
        F.max(F.struct(F.col("_score"), F.col("label"))).alias("_g")
    )
    return best.select(
        F.col("_id").alias(id_col),
        F.col("_g.label").alias("pred_label"),
        F.round(F.col("_g._score"), 6).alias("log_score"),
    )


def nb_confusion(
    docs: DataFrame,
    counts: DataFrame,
    priors: DataFrame,
    id_col: str,
    label_col: str,
    text_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """Confusion matrix (true_label, pred_label, n_docs) of a labeled
    holdout against a trained model — the evaluation artifact."""
    preds = nb_classify(docs, counts, priors, id_col, text_col, alpha)
    truth = docs.select(
        F.col(id_col), F.col(label_col).alias("true_label")
    )
    return (
        truth.join(preds, id_col)
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_label", "pred_label")
    )
