"""Dispatcher / DynConn — cross-source ETL pump and keyed connections.

Reference: ``Dispatcher<Reader, Writer>`` holds ``Option<Fabrix>``
between a read and a write (fabrix/src/dispatcher/ds.rs:72-176); any
Reader×Writer combination works (csv→db, db→parquet,
db→transform→csv — fabrix/tests/dispatcher_tests.rs:21-156).
``DynConn`` is a concurrent keyed registry of live engines
(fabrix-dyn-conn/src/dc.rs:17-108).

On Spark the pump is just ``read → transform → write`` over a *lazy*
DataFrame — ``dispatch()`` moves no rows through the driver; the plan
streams source→sink on the executors. The stateful
read-then-write Dispatcher object is kept for API parity.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import SparkSession

from .frame import FxFrame

__all__ = ["Dispatcher", "DynConn", "dispatch"]

Reader = Callable[[SparkSession], FxFrame]
Writer = Callable[[FxFrame], Any]
Transform = Callable[[FxFrame], FxFrame]


def dispatch(
    spark: SparkSession,
    reader: Reader,
    writer: Writer,
    transform: Transform | None = None,
) -> Any:
    """One-shot pump: ``writer(transform(reader(spark)))``. The frame
    stays lazy end-to-end — Catalyst fuses read, transform and write
    into one job (pushdown through the transform where legal)."""
    fx = reader(spark)
    if transform is not None:
        fx = transform(fx)
    return writer(fx)


class Dispatcher:
    """Stateful Reader→frame→Writer pump (ds.rs:72-176 surface:
    ``read``/``write``/``has_data``/``fabrix``/``clean_data``)."""

    def __init__(self, spark: SparkSession, reader: Reader, writer: Writer):
        self.spark = spark
        self._reader = reader
        self._writer = writer
        self._fx: FxFrame | None = None

    def read(self) -> "Dispatcher":
        self._fx = self._reader(self.spark)
        return self

    @property
    def has_data(self) -> bool:
        return self._fx is not None

    def fabrix(self) -> FxFrame:
        if self._fx is None:
            raise ValueError("dispatcher holds no data; call read() first")
        return self._fx

    def transform(self, fn: Transform) -> "Dispatcher":
        self._fx = fn(self.fabrix())
        return self

    def write(self) -> Any:
        out = self._writer(self.fabrix())
        return out

    def clean_data(self) -> "Dispatcher":
        self._fx = None
        return self


class DynConn:
    """Keyed registry of live engines (dc.rs:17-108): any object —
    SqlExecutor, MongoExecutor, a SparkSession — under a string key.
    Spark pools JDBC connections per executor; this registry is
    driver-side bookkeeping like the reference's dashmap."""

    def __init__(self) -> None:
        self._conns: dict[str, Any] = {}

    def insert(self, key: str, engine: Any) -> None:
        self._conns[key] = engine

    def get(self, key: str) -> Any:
        if key not in self._conns:
            raise KeyError(f"no connection registered under {key!r}")
        return self._conns[key]

    def remove(self, key: str) -> Any:
        return self._conns.pop(key)

    def keys(self) -> list[str]:
        return list(self._conns)

    def __contains__(self, key: str) -> bool:
        return key in self._conns

    def __len__(self) -> int:
        return len(self._conns)
