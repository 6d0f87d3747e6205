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

__all__ = ["profile"]


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
