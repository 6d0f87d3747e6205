"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow input so CPU-heavy per-row work (shingling,
    hashing, vector math) uses every core.

    Small parquet files are a single row-group → one input split → the
    whole explode/hash chain runs on one task, no matter how many
    executors exist. At real scale tables arrive with thousands of
    splits and this is a no-op (we only scatter when the input has
    fewer partitions than the target), so the extra shuffle exists
    exactly when it is cheap and never when it would hurt.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # plans that cannot cheaply expose partitioning
        return df
    if current >= target:
        return df
    return df.repartition(target)
