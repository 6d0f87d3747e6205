"""File sources: CSV / Parquet / JSON with fabrix's reader/writer
option structs (SURVEY.md §2.6), delegating to ``spark.read`` /
``df.write`` so Catalyst keeps pushdown, pruning and schema handling.

Reference options: CsvReadOptions (fabrix/src/sources/csv/reader.rs:193-208),
ParquetReadOptions (parquet/reader.rs:134-141), JsonReadOptions
(json/reader.rs:48-54).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..frame import FxFrame
from ..types import ValueType, to_spark_type

__all__ = [
    "CsvReadOptions",
    "CsvWriteOptions",
    "ParquetReadOptions",
    "JsonReadOptions",
    "read_csv",
    "write_csv",
    "read_parquet",
    "write_parquet",
    "read_json",
    "write_json",
    "read_orc",
    "write_orc",
]


def _schema_from_dtypes(dtypes: dict[str, ValueType | str]) -> T.StructType:
    return T.StructType(
        [T.StructField(n, to_spark_type(v if isinstance(v, ValueType) else ValueType(v)), True) for n, v in dtypes.items()]
    )


@dataclass
class CsvReadOptions:
    """csv/reader.rs:193-208. ``skip_rows_after_header`` and positional
    ``projection`` are re-expressed relationally (Spark rows are
    unordered); ``ignore_parser_errors`` maps to DROPMALFORMED."""

    has_header: bool = True
    delimiter: str = ","
    comment_char: str | None = None
    n_rows: int | None = None
    dtypes: dict[str, ValueType | str] | None = None
    projection: list[str] | None = None
    ignore_parser_errors: bool = False
    row_count: str | None = None  # add a row-id column with this name
    index: str | None = None


@dataclass
class CsvWriteOptions:
    has_header: bool = True
    delimiter: str = ","


@dataclass
class ParquetReadOptions:
    """parquet/reader.rs:134-141. ``row_count`` adds a row-id column
    (distributed monotonically-increasing ids, not dense)."""

    n_rows: int | None = None
    columns: list[str] | None = None
    row_count: str | None = None
    index: str | None = None


@dataclass
class JsonReadOptions:
    """json/reader.rs:48-54. ``is_json=True`` = one JSON array
    (multiLine), False = NDJSON lines."""

    is_json: bool = False
    schema: dict[str, ValueType | str] | None = None
    n_rows: int | None = None
    projection: list[str] | None = None
    index: str | None = None


def read_csv(spark: SparkSession, path: str, options: CsvReadOptions | None = None) -> FxFrame:
    o = options or CsvReadOptions()
    reader = spark.read.option("header", o.has_header).option("sep", o.delimiter)
    if o.comment_char:
        reader = reader.option("comment", o.comment_char)
    reader = reader.option("mode", "DROPMALFORMED" if o.ignore_parser_errors else "PERMISSIVE")
    if o.dtypes:
        reader = reader.schema(_schema_from_dtypes(o.dtypes))
    else:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    if o.projection:
        df = df.select(*o.projection)  # column pruning reaches the scan
    if o.n_rows is not None:
        df = df.limit(o.n_rows)
    if o.row_count:
        from pyspark.sql import functions as _F

        df = df.withColumn(o.row_count, _F.monotonically_increasing_id())
    return FxFrame(df, o.index)


def write_csv(fx: FxFrame | DataFrame, path: str, options: CsvWriteOptions | None = None, mode: str = "overwrite") -> None:
    o = options or CsvWriteOptions()
    df = fx.df if isinstance(fx, FxFrame) else fx
    df.write.mode(mode).option("header", o.has_header).option("sep", o.delimiter).csv(path)


def read_parquet(spark: SparkSession, path: str, options: ParquetReadOptions | None = None) -> FxFrame:
    o = options or ParquetReadOptions()
    df = spark.read.parquet(path)
    if o.columns:
        df = df.select(*o.columns)
    if o.n_rows is not None:
        df = df.limit(o.n_rows)
    if o.row_count:
        from pyspark.sql import functions as _F

        df = df.withColumn(o.row_count, _F.monotonically_increasing_id())
    return FxFrame(df, o.index)


def write_parquet(fx: FxFrame | DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    df = fx.df if isinstance(fx, FxFrame) else fx
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_json(spark: SparkSession, path: str, options: JsonReadOptions | None = None) -> FxFrame:
    o = options or JsonReadOptions()
    reader = spark.read.option("multiLine", o.is_json)
    if o.schema:
        reader = reader.schema(_schema_from_dtypes(o.schema))
    df = reader.json(path)
    if o.projection:
        df = df.select(*o.projection)
    if o.n_rows is not None:
        df = df.limit(o.n_rows)
    return FxFrame(df, o.index)


def write_json(fx: FxFrame | DataFrame, path: str, mode: str = "overwrite", is_json: bool = False) -> None:
    df = fx.df if isinstance(fx, FxFrame) else fx
    if is_json:
        # single JSON array document — driver-side by definition
        import json as _json

        rows = [r.asDict(recursive=True) for r in df.collect()]
        with open(path, "w") as f:
            _json.dump(rows, f, default=str)
    else:
        df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str, options: ParquetReadOptions | None = None) -> FxFrame:
    """ORC reader — same column/limit/row-count option surface as
    parquet (Spark-native columnar format the reference lacks;
    capability superset per SURVEY.md §2.11)."""
    o = options or ParquetReadOptions()
    df = spark.read.orc(path)
    if o.columns:
        df = df.select(*o.columns)
    if o.n_rows is not None:
        df = df.limit(o.n_rows)
    if o.row_count:
        from pyspark.sql import functions as _F

        df = df.withColumn(o.row_count, _F.monotonically_increasing_id())
    return FxFrame(df, o.index)


def write_orc(fx: FxFrame | DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    df = fx.df if isinstance(fx, FxFrame) else fx
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
