"""Bucketed tables — pre-shuffled storage for co-located joins.

The reference has no storage-level join optimization (it pushes joins
to the remote DB, SURVEY.md §2.3). On the lake, bucketing IS that
optimization: writing both sides bucketed by the join key with the
same bucket count lets every future equi-join and aggregation on that
key run with ZERO exchanges (verified by plan test) — the shuffle is
paid once at write time instead of per query. At 100 TB this is the
difference between re-shuffling the fact table on every join and
never shuffling it at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..frame import FxFrame

__all__ = ["write_bucketed", "read_table"]


def write_bucketed(
    fx: FxFrame | DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 64,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.
    Sorting within buckets additionally enables merge-join without a
    sort step and better min/max pruning."""
    df = fx.df if isinstance(fx, FxFrame) else fx
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.format(format).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str, index: str | None = None) -> FxFrame:
    return FxFrame(spark.table(table), index)
