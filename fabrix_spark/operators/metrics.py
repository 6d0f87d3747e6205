"""Distributed model-evaluation metrics — the post-scoring half of a
training pipeline, run over billions of scored rows where a
driver-side sklearn call is impossible.

AUC uses the rank-sum (Mann-Whitney U) identity: with ties counted
half, ``AUC = [Σ_s pos(s)·(2·neg_below(s) + neg_at(s))] / (2·P·N)``
over distinct score values ``s``. Grouping by score first means the
cumulative pass runs over |distinct scores| rows, and the running
count comes from :func:`rank.global_cumsum` — range-partitioned, no
single-reducer window. The numerator is an exact integer (doubled to
absorb the tie half), so the final single division is the only float
op and the result hash-matches any ANSI engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .rank import global_cumsum

__all__ = ["auc_one_vs_rest", "threshold_metrics"]


def auc_one_vs_rest(
    df: DataFrame, score_col: str, label_col: str, classes: list[int]
) -> DataFrame:
    """One-vs-rest ROC AUC per class, exact, in one pipeline:
    score-grouped class counts (shuffle on score) → distributed
    running totals over score order → one aggregate to per-class
    integer numerators → ``stack`` to (class, n_pos, n_neg, auc) rows.

    All classes share the single cumulative pass: for class ``c`` the
    negatives below a score are ``cum_total_below − cum_c_below``.
    Numerators are summed as DECIMAL(38,0) so 100 TB-scale
    ``count × count`` products cannot overflow int64.
    """
    s = F.col(score_col)
    g = df.groupBy(s.alias("__score")).agg(
        F.count("*").alias("__tot"),
        *[
            F.sum((F.col(label_col) == F.lit(c)).cast("long")).alias(f"__c{c}")
            for c in classes
        ],
    )
    cum = global_cumsum(
        g, [F.col("__score").asc()], ["__tot"] + [f"__c{c}" for c in classes]
    )
    # per-score contribution to the doubled U statistic of each class
    contribs = []
    for c in classes:
        pos_at = F.col(f"__c{c}")
        neg_at = F.col("__tot") - pos_at
        neg_below = (F.col("cum___tot") - F.col("__tot")) - (
            F.col(f"cum___c{c}") - pos_at
        )
        # Cast BEFORE the multiply: pos_at and the 2*neg_below+neg_at
        # factor are both int64 counts, so on tie-heavy scores at
        # billions of rows the long product wraps silently if the
        # decimal cast only happens afterwards.
        contribs.append(
            (
                pos_at.cast("decimal(38,0)")
                * (F.lit(2) * neg_below + neg_at).cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias(f"__u2_{c}")
        )
    per_score = cum.select("__tot", *[f"__c{c}" for c in classes], *contribs)
    agg = per_score.agg(
        F.sum("__tot").alias("__n"),
        *[F.sum(f"__c{c}").alias(f"__p{c}") for c in classes],
        *[F.sum(f"__u2_{c}").alias(f"__u{c}") for c in classes],
    )
    stack_args = ", ".join(
        f"{c}, __p{c}, __u{c}" for c in classes
    )
    stacked = agg.select(
        "__n",
        F.expr(
            f"stack({len(classes)}, {stack_args}) AS (cls, n_pos, __u2)"
        ),
    )
    n_neg = F.col("__n") - F.col("n_pos")
    auc = F.col("__u2").cast("double") / (
        F.lit(2.0) * F.col("n_pos").cast("double") * n_neg.cast("double")
    )
    return stacked.select(
        F.col("cls").cast("int").alias("cls"),
        F.col("n_pos").cast("long").alias("n_pos"),
        n_neg.cast("long").alias("n_neg"),
        auc.alias("auc"),
    )


def threshold_metrics(
    df: DataFrame, score_col: str, positive: Column, thresholds: list[float]
) -> DataFrame:
    """Confusion-matrix metrics at fixed score thresholds — ONE
    aggregate with map-side partials (4 conditional counts per
    threshold), then a ``stack`` to one row per threshold. No row
    expansion, no shuffle beyond the single reduce; precision, recall
    and F1 are single divisions of exact counts.
    """
    s = F.col(score_col)
    aggs = [F.sum(positive.cast("long")).alias("__pos"), F.count("*").alias("__n")]
    for i, t in enumerate(thresholds):
        pred = s >= F.lit(t)
        aggs.append(F.sum((pred & positive).cast("long")).alias(f"__tp{i}"))
        aggs.append(F.sum((pred & ~positive).cast("long")).alias(f"__fp{i}"))
    agg = df.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({t!r} AS DOUBLE), __tp{i}, __fp{i}" for i, t in enumerate(thresholds)
    )
    stacked = agg.select(
        "__pos",
        "__n",
        F.expr(f"stack({len(thresholds)}, {stack_args}) AS (threshold, tp, fp)"),
    )
    fn = F.col("__pos") - F.col("tp")
    tn = F.col("__n") - F.col("__pos") - F.col("fp")
    precision = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
    )
    recall = F.when(
        F.col("__pos") > 0, F.col("tp").cast("double") / F.col("__pos").cast("double")
    )
    f1 = F.when(
        F.lit(2) * F.col("tp") + F.col("fp") + fn > 0,
        (F.lit(2) * F.col("tp")).cast("double")
        / (F.lit(2) * F.col("tp") + F.col("fp") + fn).cast("double"),
    )
    return stacked.select(
        "threshold",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        tn.cast("long").alias("tn"),
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )
