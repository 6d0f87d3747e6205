"""Column profiling — the data-quality pass a pipeline runs before
trusting a new table.

One aggregation computes, for every column: null count, exact
distinct count, and min/max (rendered to strings so one long-format
frame covers heterogeneous types). Single shuffle; entirely
deterministic (no sampling), so it oracle-checks — unlike
``df.summary()``, whose quantiles are approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile", "histogram", "quantiles"]


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_value, max_value)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def histogram(df: DataFrame, col: str, n_bins: int = 10) -> DataFrame:
    """Equal-width histogram: two passes (min/max, then one
    aggregation on the bin index). Bin edges derive from exact min/max
    so the result is deterministic — no sampling, no rdd.histogram.
    Returns (bin, lo, hi, n) sorted by bin."""
    stats = df.agg(
        F.min(col).cast("double").alias("__lo"), F.max(col).cast("double").alias("__hi")
    )
    binned = df.select(F.col(col).cast("double").alias("__x")).crossJoin(
        F.broadcast(stats)
    )
    width = (F.col("__hi") - F.col("__lo")) / n_bins
    idx = F.least(
        F.lit(n_bins - 1),
        F.floor((F.col("__x") - F.col("__lo")) / width).cast("int"),
    )
    return (
        binned.withColumn("bin", idx)
        .groupBy("bin", "__lo", "__hi")
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(F.col("__lo") + F.col("bin") * (F.col("__hi") - F.col("__lo")) / n_bins, 6).alias("lo"),
            F.round(F.col("__lo") + (F.col("bin") + 1) * (F.col("__hi") - F.col("__lo")) / n_bins, 6).alias("hi"),
            "n",
        )
        .orderBy("bin")
    )


def quantiles(
    df: DataFrame, columns: list[str], probs: tuple[float, ...] = (0.25, 0.5, 0.75)
) -> DataFrame:
    """Exact linear-interpolation quantiles, long format: one row per
    (column, prob) with the value rounded to 6 dp. Spark's exact
    ``percentile`` matches DuckDB's ``quantile_cont`` bit-for-bit on
    the same data, so this oracle-checks (unlike ``approx_percentile``
    — at corpus scale where an exact single-group percentile would
    strain executor memory, the approximate sketch is the right tool;
    this is the profiling/validation variant)."""
    plist = ", ".join(str(p) for p in probs)
    aggs = [
        F.expr(f"percentile({c}, array({plist}))").alias(f"__q_{c}") for c in columns
    ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(float(pr)).alias("prob"),
                F.round(F.element_at(f"__q_{c}", i + 1), 6).alias("value"),
            )
            for c in columns
            for i, pr in enumerate(probs)
        ]
    )
    return wide.select(F.explode(rows).alias("q")).select("q.*")
