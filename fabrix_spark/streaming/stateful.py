"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful streaming at all (SURVEY.md §2.7); these
are the idiomatic Spark extension: per-key state stored in the state
store, Arrow-batched pandas on the executors, watermark-driven
timeouts. State is partitioned by key — the shuffle is one
hash-exchange on the grouping key and state never concentrates on the
driver, so the operator scales with executors.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_totals", "stateful_sessionize", "stateful_rolling_zscore"]


def _quantize_half_up(v: float, quantize: int) -> int:
    """HALF_UP integer quantization matching Spark's ``F.round``
    (used by the batch twin ``operators.temporal.rolling_zscore``).
    ``F.round`` is decimal HALF_UP over the double's SHORTEST REPR
    (``BigDecimal.valueOf``), so we delegate to the exact twin
    ``operators.similarity._round_half_up`` — a naive binary
    ``floor(x + 0.5)`` diverges on repr-tie values like
    0.49999999999999994, and Python's built-in ``round()`` is
    half-to-even; either would break the stream==batch replay
    contract."""
    from fabrix_spark.operators.similarity import _round_half_up

    return _round_half_up(v * quantize)


def running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Cumulative per-key count/sum maintained across micro-batches —
    the minimal custom stateful aggregate. Emits the updated totals for
    every key seen in each batch (output mode: update)."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total_value": [total]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_sessionize(
    stream: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization with explicit state: a session closes
    when the event-time watermark passes last_seen + gap, then the
    finished session (start, end, n_events) is emitted exactly once.

    This is the hand-rolled equivalent of ``session_window`` — kept as
    the template for stateful logic session_window cannot express
    (e.g. carrying custom per-session aggregates).

    LATE-DATA CONTRACT: events whose time is older than the current
    watermark are DROPPED (same as the built-in ``session_window``
    aggregation). ``applyInPandasWithState`` does NOT filter late
    input itself — the watermark only drives timeouts — so without the
    explicit filter a late event would merge into (or, worse, reopen
    after flush as a phantom fragment of) a session the watermark
    already promised was final. Pinned by
    ``test_stateful_sessionize_drops_event_older_than_watermark``."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_ms", T.LongType()),
            T.StructField("last_ms", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(last_ms, unit="ms")],
                    "n_events": [n],
                }
            )
            return
        start_ms, last_ms, n = state.get if state.exists else (None, None, 0)
        # row order within a micro-batch group is arbitrary — gap
        # detection is only meaningful over time-sorted events. Rows
        # older than the watermark are dropped here (late-data
        # contract above); the engine does not pre-filter them.
        wm_ms = state.getCurrentWatermarkMs()
        ts_ms = sorted(
            t
            for pdf in pdfs
            for t in (pdf[ts_col].astype("int64") // 1_000_000).tolist()
            if t >= wm_ms
        )
        if not ts_ms:
            if state.exists:
                # keep the existing session armed; nothing to fold in
                state.setTimeoutTimestamp(
                    max(last_ms + gap_seconds * 1000, wm_ms + 1)
                )
            return
        for t in ts_ms:
            if last_ms is not None and t - last_ms > gap_seconds * 1000:
                # gap inside the batch: close the old session inline
                yield pd.DataFrame(
                    {
                        key_col: [key[0]],
                        "session_start": [pd.Timestamp(start_ms, unit="ms")],
                        "session_end": [pd.Timestamp(last_ms, unit="ms")],
                        "n_events": [n],
                    }
                )
                start_ms, n = t, 0
            if start_ms is None:
                start_ms = t
            last_ms = max(t, last_ms or t)
            n += 1
        state.update((start_ms, last_ms, n))
        # a timeout at-or-before the current watermark is rejected by
        # Spark; if this key's events already trail the watermark the
        # session is expired as-of now — fire on the next trigger
        state.setTimeoutTimestamp(
            max(last_ms + gap_seconds * 1000, state.getCurrentWatermarkMs() + 1)
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def stateful_rolling_zscore(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_rows: int = 10,
    quantize: int = 1_000_000,
    threshold: float = 3.0,
) -> DataFrame:
    """Streaming twin of ``operators.temporal.rolling_zscore``: per-key
    ring buffer of the last ``window_rows`` QUANTIZED values kept in
    the state store; every arriving event scores against that buffer
    BEFORE being folded into it (the strictly-preceding baseline —
    same formula, same exact integer moments as the batch operator, so
    for in-order delivery a replayed stream emits byte-identical
    anomalies to the batch pass — pinned by test). Emits only rows
    beyond ``threshold`` sigma (append mode). State is ``window_rows``
    longs per key — bounded regardless of stream length."""
    import math

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("n", T.LongType()),
            T.StructField("z", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("buf", T.ArrayType(T.LongType()))])

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        buf = list(state.get[0]) if state.exists else []
        ks, tss, vs, ns, zs = [], [], [], [], []
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        for _, row in rows.iterrows():
            v = float(row[value_col])
            q = _quantize_half_up(v, quantize)
            n = len(buf)
            if n > 1:
                s = float(sum(buf))
                ss = float(sum(x * x for x in buf))
                var = (ss - s * s / n) / n
                if var > 0:
                    z = (float(q) - s / n) / math.sqrt(var)
                    if abs(z) > threshold:
                        ks.append(key[0]), tss.append(row[ts_col])
                        vs.append(v), ns.append(n), zs.append(z)
            buf.append(q)
            if len(buf) > window_rows:
                buf = buf[-window_rows:]
        state.update((buf,))
        yield pd.DataFrame(
            {
                key_col: pd.Series(ks, dtype="int64"),
                ts_col: pd.Series(tss, dtype="datetime64[us]"),
                value_col: pd.Series(vs, dtype="float64"),
                "n": pd.Series(ns, dtype="int64"),
                "z": pd.Series(zs, dtype="float64"),
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
